package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden PageRank semantics transcribed from the reference's
  * conformance suite (`pagerank/calculator_test.go:35-139,174-195`):
  * per-vertex scores within ±0.01 of the analytic expectation and
  * Σ scores ≈ 1 — including the dead-end mass redistribution that
  * GraphX's built-in variant lacks. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(vs: Seq[String], es: Seq[(String, String)],
                    iters: Int = 50): Map[String, Double] = {
    val r = PageRank.run(vs.toDF("id"),
      es.toDF("src", "dst"), maxIter = iters, stopTol = Some(1e-6))
    r.scores.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
  }

  test("two isolated vertices split the mass evenly") {
    val m = ranks(Seq("a", "b"), Seq.empty)
    assert(math.abs(m("a") - 0.5) < 0.01)
    assert(math.abs(m("b") - 0.5) < 0.01)
    assert(math.abs(m.values.sum - 1.0) < 0.001)
  }

  test("star a->b, a->c: leaves share the fed mass equally") {
    val m = ranks(Seq("a", "b", "c"), Seq("a" -> "b", "a" -> "c"))
    assert(m("b") === m("c"))
    assert(m("b") > m("a"))
    assert(math.abs(m.values.sum - 1.0) < 0.001)
  }

  test("cycle a->b->c->a converges to uniform") {
    val m = ranks(Seq("a", "b", "c"),
      Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    Seq("a", "b", "c").foreach(v =>
      assert(math.abs(m(v) - 1.0 / 3) < 0.01, s"vertex $v -> ${m(v)}"))
    assert(math.abs(m.values.sum - 1.0) < 0.001)
  }

  test("dead-end sink: mass redistributed, sum still 1") {
    // a->c, b->c; c dangling. Without redistribution Σ < 1.
    val m = ranks(Seq("a", "b", "c"), Seq("a" -> "c", "b" -> "c"))
    assert(math.abs(m.values.sum - 1.0) < 0.001)
    assert(m("c") > m("a"))
    assert(m("a") === m("b"))
  }

  test("stopTol path is score-identical to the lazy fixed-iteration path") {
    // Guards the SAD-tracking branch (one first() per step): early-exit
    // must change WHEN the loop stops, never WHAT a step computes. Run
    // tracked to convergence, then re-run untracked for the same number
    // of iterations — bit-identical scores (same grid snap).
    val vs = Seq("a", "b", "c", "d").toDF("id")
    val es = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d")
      .toDF("src", "dst")
    val tracked = PageRank.run(vs, es, maxIter = 100,
      stopTol = Some(1e-9), gridSnap = Some(1e9))
    assert(tracked.iterations < 100) // actually early-exited
    val lazyRun = PageRank.run(vs, es, maxIter = tracked.iterations,
      stopTol = None, gridSnap = Some(1e9))
    val t = tracked.scores.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val l = lazyRun.scores.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(t === l) // exact equality, not approximate
  }

  test("convergence reports SAD below tolerance") {
    val r = PageRank.run(Seq("a", "b", "c").toDF("id"),
      Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst"),
      maxIter = 100, stopTol = Some(1e-6))
    assert(r.sad < 1e-6)
    assert(r.iterations < 100)
  }

  test("personalized: mass concentrates around the seed, Σ still 1") {
    // Two disconnected 2-cycles {a,b} and {c,d}; seed = a. ALL mass must
    // stay in the seed's component (teleport and dangling flow to a);
    // the other component's stationary score is exactly 0.
    val vs = Seq("a", "b", "c", "d").toDF("id")
    val es = Seq("a" -> "b", "b" -> "a", "c" -> "d", "d" -> "c")
      .toDF("src", "dst")
    val r = PageRank.run(vs, es, maxIter = 60, stopTol = Some(1e-9),
      seeds = Some(Seq("a").toDF("id")))
    val m = r.scores.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(m.values.sum - 1.0) < 1e-6)
    assert(m("c") == 0.0 && m("d") == 0.0)
    // a receives the teleport plus b's full out-flow: strictly above b
    assert(m("a") > m("b") && m("b") > 0.1)
  }

  test("personalized: dangling mass teleports to the seeds only") {
    // a -> c with c a sink; seed = a. c's absorbed mass must return to
    // a each step, never leak to b (isolated non-seed).
    val vs = Seq("a", "b", "c").toDF("id")
    val es = Seq("a" -> "c").toDF("src", "dst")
    val r = PageRank.run(vs, es, maxIter = 60, stopTol = Some(1e-9),
      seeds = Some(Seq("a").toDF("id")))
    val m = r.scores.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(m.values.sum - 1.0) < 1e-6)
    assert(m("b") == 0.0)
    assert(m("a") > m("c"))
  }

  test("uniform run is unchanged by the seeds refactor (regression)") {
    val vs = Seq("a", "b", "c").toDF("id")
    val es = Seq("a" -> "b", "b" -> "c").toDF("src", "dst")
    val m = PageRank.run(vs, es, maxIter = 5, stopTol = None,
        gridSnap = Some(1e9)).scores
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(m.values.sum - 1.0) < 1e-6)
    assert(m("c") > m("b") && m("b") > m("a"))
  }

  test("weighted: mass splits by weight; equal weights reduce to uniform") {
    val vs = Seq("a", "b", "c").toDF("id")
    // a feeds b 3x harder than c
    val es = Seq(("a", "b", 3L), ("a", "c", 1L)).toDF("src", "dst", "w")
    val r = PageRank.run(vs, es, maxIter = 1, stopTol = None,
      weightCol = Some("w"))
    val m = r.scores.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(m.values.sum - 1.0) < 1e-9)
    // after one step: b gets d·(1/3)·(3/4), c gets d·(1/3)·(1/4)
    val base = 0.15 / 3 + 0.85 * (2.0 / 3) / 3 // teleport + dangling b,c
    assert(math.abs(m("b") - (base + 0.85 * (1.0 / 3) * 0.75)) < 1e-9)
    assert(math.abs(m("c") - (base + 0.85 * (1.0 / 3) * 0.25)) < 1e-9)
    // equal weights ≡ unweighted
    val ew = Seq(("a", "b", 5L), ("b", "c", 5L)).toDF("src", "dst", "w")
    val got = PageRank.run(vs, ew, maxIter = 5, stopTol = None,
        gridSnap = Some(1e9), weightCol = Some("w")).scores
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val want = PageRank.run(vs,
        Seq("a" -> "b", "b" -> "c").toDF("src", "dst"),
        maxIter = 5, stopTol = None, gridSnap = Some(1e9)).scores
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(got == want)
  }

  test("weighted: non-positive weights are dropped (no probability leak)") {
    val vs = Seq("a", "b", "c").toDF("id")
    // a's only positive edge is to b; the zero edge to c must not make
    // a split mass with it (and a stays non-dangling via the b edge)
    val es = Seq(("a", "b", 2L), ("a", "c", 0L)).toDF("src", "dst", "w")
    val m = PageRank.run(vs, es, maxIter = 8, stopTol = None,
        weightCol = Some("w")).scores
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(m.values.sum - 1.0) < 1e-9)
    val only = PageRank.run(vs, Seq(("a", "b", 2L)).toDF("src", "dst", "w"),
        maxIter = 8, stopTol = None, weightCol = Some("w")).scores
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(m == only)
  }
}

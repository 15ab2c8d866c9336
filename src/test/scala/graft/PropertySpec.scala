package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks: algebraic laws of core primitives validated
  * against independent in-test reference implementations on
  * scalacheck-generated cases (fixed seed — deterministic, CI-stable).
  * One Spark pass per law, not one per case.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator exhausted"))

  test("zValue2 equals reference bit interleave on generated pairs") {
    def spread(x: Long): Long = {
      var v = x & 0x7FFFFFFFL
      v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    val g = Gen.zip(Gen.chooseNum(0L, 2147483647L),
      Gen.chooseNum(0L, 2147483647L))
    val xs = cases(g, 300, 7L)
    val got = xs.toDF("x", "y")
      .select(store.Layout.zValue2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    val want = xs.map { case (x, y) => spread(x) | (spread(y) << 1) }
    assert(got.toSeq === want)
    // monotone per dimension: fixing y, larger x ⇒ larger z
    val sortedX = xs.map(_._1).distinct.sorted
    val fixedY = 12345L
    val zs = sortedX.map(x => spread(x) | (spread(fixedY) << 1))
    assert(zs === zs.sorted)
  }

  test("Exact.cents/micros equal the floor(x·s + 0.5) reference and " +
    "are monotone") {
    val g = Gen.chooseNum(-100000.0, 100000.0)
    val xs = cases(g, 300, 11L)
    val got = xs.toDF("v")
      .select(util.Exact.cents(col("v")).as("c"),
        util.Exact.micros(col("v")).as("m"))
      .as[(Long, Long)].collect()
    xs.zip(got).foreach { case (v, (c, m)) =>
      assert(c === math.floor(v * 100d + 0.5d).toLong)
      assert(m === math.floor(v * 1000000d + 0.5d).toLong)
    }
    val sorted = xs.sorted.zip(got.toSeq.sortBy(_._1))
    sorted.sliding(2).foreach {
      case Seq((a, _), (b, _)) => assert(a <= b)
      case _ => ()
    }
  }

  test("coveredDuration matches a reference sweep on random interval " +
    "multisets and obeys its bounds") {
    def reference(iv: Seq[(Long, Long)]): Long = {
      val sorted = iv.filter(i => i._2 > i._1).sortBy(_._1)
      var covered = 0L; var curLo = 0L; var curHi = 0L; var open = false
      for ((lo, hi) <- sorted) {
        if (!open) { curLo = lo; curHi = hi; open = true }
        else if (lo > curHi) { covered += curHi - curLo; curLo = lo; curHi = hi }
        else curHi = math.max(curHi, hi)
      }
      if (open) covered += curHi - curLo
      covered
    }
    val gIv = for {
      lo <- Gen.chooseNum(0L, 1000L)
      len <- Gen.chooseNum(0L, 200L)
    } yield (lo, lo + len)
    val gKey = Gen.chooseNum(0, 19)
    val rows = cases(Gen.zip(gKey, gIv), 400, 13L)
      .map { case (k, (lo, hi)) => (s"k$k", lo, hi) }
    val got = operators.TimeSeries.coveredDuration(
        rows.toDF("k", "t0", "t1"), Seq("k"), "t0", "t1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val expect = reference(ivs.map(t => (t._2, t._3)))
      assert(got(k) === expect, s"key $k")
      val lens = ivs.map(t => t._3 - t._2)
      assert(got(k) <= lens.sum && got(k) >= (lens :+ 0L).max)
    }
  }

  test("temporal reach is a subset of plain reach and matches a " +
    "reference relaxation on random temporal graphs") {
    def reference(edges: Seq[(Long, Long, Long)],
                  seeds: Map[Long, Long], rounds: Int): Map[Long, Long] = {
      var arr = seeds
      for (_ <- 1 to rounds) {
        val msgs = edges.flatMap { case (s, d, t) =>
          arr.get(s).filter(t >= _).map(_ => d -> t)
        }.groupBy(_._1).map { case (d, ts) => d -> ts.map(_._2).min }
        arr = (arr.keySet ++ msgs.keySet).map { id =>
          id -> math.min(arr.getOrElse(id, Long.MaxValue),
            msgs.getOrElse(id, Long.MaxValue))
        }.toMap
      }
      arr
    }
    val gEdge = for {
      s <- Gen.chooseNum(0L, 30L); off <- Gen.chooseNum(1L, 30L)
      t <- Gen.chooseNum(0L, 50L)
    } yield (s, (s + off) % 31, t) // total generator, s != dst by shape
    val edges = cases(gEdge, 120, 17L)
    val seeds = Map(0L -> 0L, 7L -> 10L)
    val got = graph.TemporalReach.earliestArrival(
        edges.toDF("src", "dst", "ts"),
        seeds.toSeq.toDF("id", "arr"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(edges, seeds, 3))
    // time-respecting reach never exceeds timestamp-blind reach
    val blind = reference(edges.map { case (s, d, _) => (s, d, Long.MaxValue) }
      .map(e => (e._1, e._2, 0L)), seeds.map { case (k, _) => k -> 0L }, 3)
    assert(got.keySet.subsetOf(blind.keySet))
  }
}

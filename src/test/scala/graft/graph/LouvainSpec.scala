package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LouvainSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K3 collapses to one community in a single down round") {
    // v1 has no smaller target -> stays; v2, v3 take community 1
    // (S = 2m·1 − k_v·k_c = 6 − 4 = 2 > stay 0)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val m = labelsOf(Louvain.run(edges, rounds = 1))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("down round: pendant joins the triangle; c = cur correction " +
    "keeps the members home") {
    // m=4. v2's stay score uses the −k_v correction (S=6, only
    // candidate); v9 joins community 1 (S=1 > 0); v1 may not move up.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 9L))
      .toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("id", "lab")
    val m = labelsOf(Louvain.moveRound(edges, labels, allowUp = false))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L))
  }

  test("up round: the overloaded hub leaves for the pendant " +
    "(hand-checked ΔQ = +1/32)") {
    // S(1→9) = 2m·1 − k_1·tot_9 = 8 − 3 = 5 beats re-insert
    // S(1→cur) = 2m·2 − k_1·(tot_1 − k_1) = 16 − 12 = 4.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 9L))
      .toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("id", "lab")
    val m = labelsOf(Louvain.moveRound(edges, labels, allowUp = true))
    assert(m === Map(1L -> 9L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("two triangles with a bridge settle into the two natural " +
    "communities with positive modularity") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val lab = Louvain.run(edges, rounds = 4)
    val m = labelsOf(lab)
    assert(Set(m(1L), m(2L), m(3L)).size === 1, "left triangle together")
    assert(Set(m(4L), m(5L), m(6L)).size === 1, "right triangle together")
    assert(m(1L) !== m(4L), "bridge must not merge the triangles")
    val q = Communities.modularity(edges,
        lab.select(col("id"), col("lab").as("community")))
      .head().getAs[Long]("q_micros")
    assert(q > 300000L, s"modularity $q micros (expect 5/14 ≈ 357142)")
  }

  test("coarsen: communities contract, intra weight becomes self-loop") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "lab")
    val w = Louvain.coarsen(edges, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(w === Map((1L, 1L) -> 3L, (4L, 4L) -> 3L, (1L, 4L) -> 1L))
  }

  test("weighted round: a contracted dumbbell is stable (self-loops " +
    "count twice in degree)") {
    // two super-nodes with self-loop 3, bridge 1: W=7, k=7 each;
    // S(move) = 14·1 − 7·7 = −35 < S(stay) = 0 → both stay.
    val wed = Seq((1L, 1L, 3L), (4L, 4L, 3L), (1L, 4L, 1L))
      .toDF("src", "dst", "w")
    val labels = Seq((1L, 1L), (4L, 4L)).toDF("id", "lab")
    val down = labelsOf(Louvain.moveRoundWeighted(wed, labels,
      allowUp = false))
    val up = labelsOf(Louvain.moveRoundWeighted(wed, labels,
      allowUp = true))
    assert(down === Map(1L -> 1L, 4L -> 4L))
    assert(up === Map(1L -> 1L, 4L -> 4L))
  }

  test("weighted round: a light middle node merges into the heavier " +
    "down-label side") {
    // path A(self 2) — B — C(self 4), bridges w=1: k = (5, 2, 9),
    // 2W = 16. S(B→A) = 16·1 − 2·5 = 6 > stay 0 → B joins A;
    // S(C→B) = 16·1 − 9·2 = −2 < stay 0 → the heavy node stays.
    val wed = Seq((1L, 1L, 2L), (3L, 3L, 4L), (1L, 2L, 1L),
      (2L, 3L, 1L)).toDF("src", "dst", "w")
    val labels = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "lab")
    val m = labelsOf(Louvain.moveRoundWeighted(wed, labels,
      allowUp = false))
    assert(m(2L) === 1L)
    assert(m(1L) === 1L && m(3L) === 3L)
  }

  test("contracted move round agrees with the vertex-level move on the " +
    "lifted partition objective") {
    // full cycle smoke: 2 rounds -> coarsen -> 1 weighted round must
    // not split the settled triangles
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val lab2 = Louvain.run(edges, rounds = 4)
    val wed = Louvain.coarsen(edges, lab2)
    val init = wed.select(col("src").as("id"))
      .union(wed.select(col("dst").as("id")))
      .distinct().select(col("id"), col("id").as("lab"))
    val l3 = labelsOf(Louvain.moveRoundWeighted(wed, init,
      allowUp = false))
    // the two-community partition is locally optimal -> no merge
    assert(l3.values.toSet.size === 2)
  }

  test("deterministic across runs and partitionings") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val a = labelsOf(Louvain.run(edges, rounds = 3))
    val b = labelsOf(Louvain.run(edges.repartition(5), rounds = 3))
    assert(a === b)
  }

  private def qOf(edges: org.apache.spark.sql.DataFrame,
                  labels: org.apache.spark.sql.DataFrame): Long =
    graft.graph.Communities.modularity(edges,
        labels.select(col("id"), col("lab").as("community")))
      .select("q_micros").first().getLong(0)

  test("until-converged disagrees with fixed-2-rounds on a path and " +
      "wins on modularity") {
    // P8: pairwise merges keep paying off past round 2 — the fixture
    // where a fixed budget stops early and the converged run does not
    val p8 = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labC, trace) = Louvain.runConverged(p8, levels = 1,
      roundCap = 12)
    val lab2 = Louvain.run(p8, rounds = 2)
    assert(trace.head.rounds > 2 && trace.head.rounds < 12,
      s"expected genuine convergence below the cap, got $trace")
    assert(qOf(p8, labC) > qOf(p8, lab2),
      "converged labels must beat the fixed-2-round labels on Q")
    assert(trace.head.qMicros === qOf(p8, labC),
      "trace modularity must equal q139's operator on the labels")
  }

  test("zero-moves never fires on the path fixture (equal-gain " +
      "ping-pong at constant Q) - Q-stability is what terminates") {
    // the last two rounds of the converged run change NO modularity
    // but may still move labels; run 2 extra rounds from the converged
    // labels and pin that Q stays put while moves can continue
    val p8 = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labC, trace) = Louvain.runConverged(p8, levels = 1,
      roundCap = 12)
    val r = trace.head.rounds
    val next = Louvain.moveRound(p8, labC, allowUp = r % 2 == 1)
    assert(qOf(p8, next) === trace.head.qMicros,
      "post-convergence rounds must not change Q")
  }

  test("runConverged detects the level-2 fixpoint on planted cliques " +
      "and stops the hierarchy") {
    // two K4s joined by one weak bridge: level 1 recovers the cliques,
    // level 2 has nothing left to merge (bridge too weak) -> fixpoint
    val k4s = ((for {a <- 1 to 4; b <- 1 to 4 if a < b}
        yield (a.toLong, b.toLong)) ++
      (for {a <- 11 to 14; b <- 11 to 14 if a < b}
        yield (a.toLong, b.toLong)) :+ (4L, 11L)).toDF("src", "dst")
    val (lab, trace) = Louvain.runConverged(k4s, levels = 3,
      roundCap = 12)
    assert(trace.head.comms === 2L, s"cliques not recovered: $trace")
    assert(trace.size <= 2, s"fixpoint should stop the hierarchy: $trace")
    assert(trace.last.moved === 0L || trace.size == 1)
    assert(labelsOf(lab).values.toSet.size === 2)
  }
}

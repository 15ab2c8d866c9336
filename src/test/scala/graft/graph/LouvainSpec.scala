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
}

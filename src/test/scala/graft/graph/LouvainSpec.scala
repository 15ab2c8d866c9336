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

  test("deterministic across runs and partitionings") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val a = labelsOf(Louvain.run(edges, rounds = 3))
    val b = labelsOf(Louvain.run(edges.repartition(5), rounds = 3))
    assert(a === b)
  }
}

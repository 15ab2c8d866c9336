package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MisSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("src", "dst")

  /** Independence and maximality, the two defining MIS invariants. */
  private def assertValid(e: DataFrame, mis: DataFrame): Unit = {
    val sym = e.select("src", "dst")
      .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val flagged = sym
      .join(mis.select(col("id").as("src"), col("in_mis").as("m_src")), "src")
      .join(mis.select(col("id").as("dst"), col("in_mis").as("m_dst")), "dst")
    assert(flagged.filter(col("m_src") && col("m_dst")).count() == 0,
      "independence violated")
    val uncovered = mis.filter(!col("in_mis"))
      .join(flagged.filter(col("m_dst")).select("src").distinct(),
        col("id") === col("src"), "left_anti")
    assert(uncovered.count() == 0, "maximality violated")
  }

  test("star graph: either the hub alone or all leaves") {
    val e = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val mis = Mis.run(e)
    assertValid(e, mis)
    val members = mis.filter(col("in_mis")).select("id")
      .as[Long].collect().toSet
    assert(members == Set(0L) || members == Set(1L, 2L, 3L, 4L))
  }

  test("path and triangle invariants hold") {
    for (e <- Seq(edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
        edges((1L, 2L), (2L, 3L), (3L, 1L)))) {
      val mis = Mis.run(e)
      assertValid(e, mis)
      assert(mis.filter(col("in_mis")).count() >= 1)
    }
  }

  test("deterministic across reruns; covers disconnected components") {
    val e = edges((1L, 2L), (2L, 3L), (10L, 11L), (12L, 13L))
    val a = Mis.run(e).orderBy("id").collect().toSeq
    val b = Mis.run(e).orderBy("id").collect().toSeq
    assert(a == b)
    assertValid(e, Mis.run(e))
  }

  test("real co-purchase graph at sf0.001: valid MIS, all decided") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val e = li.select((col("l_orderkey") * 2).as("src"),
      (col("l_partkey") * 2 + 1).as("dst")).distinct()
    val mis = Mis.run(e)
    assertValid(e, mis)
    val n = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct().count()
    assert(mis.count() == n)
  }
}

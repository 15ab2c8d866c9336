package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColoringSpec extends SparkSpec {
  import spark.implicits._

  private def assertProper(colors: Map[String, Int],
                           es: Seq[(String, String)]): Unit =
    es.foreach { case (s, d) =>
      assert(colors(s) != colors(d), s"edge $s-$d shares color")
    }

  test("triangle gets three distinct colors") {
    val es = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val out = Coloring.run(Seq("a", "b", "c").toDF("id"),
      es.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assertProper(out, es)
    assert(out.values.toSet.size == 3)
  }

  test("path graph is properly colored with few colors") {
    val vs = (0 to 20).map(i => s"v$i")
    val es = (0 until 20).map(i => s"v$i" -> s"v${i + 1}")
    val out = Coloring.run(vs.toDF("id"), es.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assertProper(out, es)
    assert(out.values.max <= 2) // greedy needs ≤ Δ+1 = 3 colors (0-based)
  }

  test("pre-colored vertices are honoured") {
    val vs = Seq(("a", Some(7)), ("b", None), ("c", None))
      .toDF("id", "color")
    val es = Seq("a" -> "b", "b" -> "c")
    val out = Coloring.run(vs, es.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("a") == 7)
    assertProper(out, es)
  }

  test("distributed and driver-side finish produce identical colors") {
    val vs = (0 to 40).map(i => s"v$i")
    val es = (0 until 40).map(i => s"v$i" -> s"v${(i * 7 + 3) % 41}")
      .filter { case (a, b) => a != b }
    val dist = Coloring.run(vs.toDF("id"), es.toDF("src", "dst"),
        localFinishThreshold = 0) // force every round distributed
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val local = Coloring.run(vs.toDF("id"), es.toDF("src", "dst"),
        localFinishThreshold = 1000000) // force the in-memory path
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dist === local)
    assertProper(dist, es)
  }

  test("speculative strategy is proper, deterministic, honours pre-colors") {
    // random-ish graph: 60 vertices, ~180 hash-derived edges
    val es = (0 until 180).map { i =>
      val a = (i * 2654435761L % 60).toInt
      val b = ((i * 40503L + 7) % 60).toInt
      (s"v$a", s"v$b")
    }.filter { case (a, b) => a != b }
    val vs = (0 until 60).map(i => s"v$i")
    def spec() = Coloring.run(vs.toDF("id"), es.toDF("src", "dst"),
        localFinishThreshold = 0, speculative = true)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val c1 = spec()
    assert(c1.size == 60)
    assertProper(c1, es)
    assert(c1 == spec()) // deterministic across runs

    // pre-colored vertices keep their colors and block neighbours
    val pre = (("v0", Some(5)) +: vs.tail.map(v => (v, None: Option[Int])))
      .toDF("id", "color")
    val c2 = Coloring.run(pre, es.toDF("src", "dst"),
        localFinishThreshold = 0, speculative = true)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(c2("v0") == 5)
    assertProper(c2, es)
  }

  test("proper on the sf0.001 bipartite order-part graph") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val edges = li.select(
        concat(lit("o"), col("l_orderkey").cast("string")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
      .distinct()
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val colored = Coloring.run(verts, edges)
    val bad = edges
      .join(colored.withColumnRenamed("id", "src")
        .withColumnRenamed("color", "c1"), Seq("src"))
      .join(colored.withColumnRenamed("id", "dst")
        .withColumnRenamed("color", "c2"), Seq("dst"))
      .filter(col("c1") === col("c2")).count()
    assert(bad == 0L)
    assert(colored.filter(col("color").isNull).count() == 0L)
  }
}

package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = Triangles.count(edges.toDF("u", "v")).collect().head
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_triangles"))
  }

  test("K4 has 4 triangles, C5 has none") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(tri(k4) === (6L, 4L))
    val c5 = (0L to 4L).map(i => (i, (i + 1) % 5))
    assert(tri(c5) === (5L, 0L))
  }

  test("duplicate and reversed edges collapse before counting") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L))
    assert(tri(noisy) === (3L, 1L))
  }

  test("hub star plus one rim edge yields exactly one triangle") {
    // hub 0 connected to 1..20; one rim edge (5,6): triangle (0,5,6).
    // Degree orientation points rim->hub, so the hub fans out no wedges.
    val star = (1L to 20L).map(i => (0L, i)) :+ (5L, 6L)
    assert(tri(star) === (21L, 1L))
  }

  test("clusteringCoefficients: K4, star+chord, isolated-degree-1") {
    import spark.implicits._
    // K4 on 0..3 plus a pendant vertex 9 hanging off 0
    val edges = (for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (i, j)) :+ (0L, 9L)
    val out = graft.graph.Triangles.clusteringCoefficients(
        edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // K4 members: every pair of 0's K4-neighbours is connected; vertex
    // 0 additionally sees the pendant → d=4, t=3, c=2*3/(4*3)=0.5
    assert(out(0L) === ((4L, 3L, 0.5)))
    (1L to 3L).foreach(v => assert(out(v) === ((3L, 3L, 1.0))))
    assert(out(9L) === ((1L, 0L, 0.0))) // degree-1: defined as 0
  }

  test("property: matches brute force on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 25
      val edges = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.25
      } yield (i, j)).toSeq
      val adj = edges.toSet
      val brute = (for {
        a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
        if adj((a, b)) && adj((b, c)) && adj((a, c))
      } yield 1).size.toLong
      assert(tri(edges) === (edges.size.toLong, brute))
    }
  }
}

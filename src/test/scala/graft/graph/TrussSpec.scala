package graft.graph

import graft.SparkSpec

class TrussSpec extends SparkSpec {
  import spark.implicits._

  private def truss(es: Seq[(Long, Long)], k: Int, rounds: Int = 8,
                    earlyStop: Boolean = true): Map[(Long, Long), Long] =
    Truss.run(es.toDF("u", "v"), k, rounds, earlyStop)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  private val k4 = Seq[(Long, Long)](
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))

  test("K4 is a 4-truss: every edge in exactly two triangles") {
    val m = truss(k4, k = 4)
    assert(m.keySet.size == 6)
    assert(m.values.forall(_ == 2L))
  }

  test("a pendant triangle peels off the K4 core at k=4") {
    // triangle 4-5-6 hangs off vertex 4: each of its edges sits in one
    // triangle only → peeled; the K4 survives intact.
    val es = k4 ++ Seq[(Long, Long)]((4, 5), (4, 6), (5, 6))
    val m = truss(es, k = 4)
    assert(m.keySet == k4.toSet)
  }

  test("peeling cascades: two triangles sharing an edge vanish at k=4") {
    // shared edge (2,3) has support 2, the others 1 → round 1 leaves
    // only (2,3); round 2 finds it triangle-less → empty truss.
    val es = Seq[(Long, Long)]((1, 2), (1, 3), (2, 3), (2, 4), (3, 4))
    assert(truss(es, k = 4).isEmpty)
    assert(truss(es, k = 4, earlyStop = false).isEmpty)
  }

  test("orientation and duplicates are canonicalized away") {
    val messy = k4.map { case (u, v) => (v, u) } ++ k4
    assert(truss(messy, k = 4) == truss(k4, k = 4))
  }
}

package graft.graph

import graft.SparkSpec

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  private def micros(x: Double) = math.floor(x * 1e6 + 0.5).toLong

  private val inc = Seq(
    // order A (size 3), order B (size 2) — pair (1,2) shared by both
    ("A", 1L), ("A", 2L), ("A", 3L),
    ("B", 1L), ("B", 2L),
    // order C has one item: no wedges
    ("C", 7L),
    // order D is a size-5 hub: suppressed when cap < 5
    ("D", 1L), ("D", 2L), ("D", 4L), ("D", 5L), ("D", 6L)
  ).toDF("mid", "item")

  private def run(cap: Long) =
    LinkPrediction.adamicAdar(inc, cap, topN = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

  test("scores sum 1/ln(mid degree) per shared mid, micros-exact") {
    val m = run(cap = 4)
    assert(m((1L, 2L)) ==
      ((2L, micros(1.0 / math.log(3.0)) + micros(1.0 / math.log(2.0)))))
    assert(m((1L, 3L)) == ((1L, micros(1.0 / math.log(3.0)))))
    assert(m((2L, 3L)) == ((1L, micros(1.0 / math.log(3.0)))))
    assert(m.size == 3) // D suppressed, C wedge-free
  }

  test("hub mids beyond the cap contribute nothing; raising it adds them") {
    val m = run(cap = 5)
    val w5 = micros(1.0 / math.log(5.0))
    assert(m((1L, 2L))._1 == 3L)
    assert(m((4L, 5L)) == ((1L, w5)))
    assert(m((1L, 6L)) == ((1L, w5)))
    assert(m.size == 12) // 3 from A/B plus C(5,2)=10 from D, (1,2) shared
  }

  test("top-N is ordered by (score desc, u, v) deterministically") {
    val rows = LinkPrediction.adamicAdar(inc, 5, topN = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.length == 4)
    assert(rows.head._1 == 1L && rows.head._2 == 2L) // unique max
    val scores = rows.map(_._3)
    assert(scores.sameElements(scores.sortBy(-_)))
    // among equal scores, (u, v) ascending
    val ties = rows.filter(_._3 == rows(1)._3).map(t => (t._1, t._2))
    assert(ties.sameElements(ties.sorted))
  }
}

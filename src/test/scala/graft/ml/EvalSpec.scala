package graft.ml

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: (String, Long, Long)*): Map[String, Long] =
    Eval.groupedAuc(rows.toDF("g", "score", "y"), "g", "score", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("perfect ranking gives AUC = 1, inverted gives 0") {
    val m = auc(
      ("up", 1L, 0L), ("up", 2L, 0L), ("up", 3L, 1L), ("up", 4L, 1L),
      ("dn", 1L, 1L), ("dn", 2L, 1L), ("dn", 3L, 0L), ("dn", 4L, 0L))
    assert(m("up") === 1000000L)
    assert(m("dn") === 0L)
  }

  test("all-tied scores give exactly 0.5") {
    val m = auc(("t", 7L, 1L), ("t", 7L, 0L), ("t", 7L, 1L), ("t", 7L, 0L))
    assert(m("t") === 500000L)
  }

  test("hand-computed mixed case with a tie") {
    // scores: pos {3, 2}, neg {2, 1}. Pairs: (3>2)=1, (3>1)=1,
    // (2=2)=0.5, (2>1)=1 -> AUC = 3.5/4 = 0.875
    val m = auc(("m", 3L, 1L), ("m", 2L, 1L), ("m", 2L, 0L), ("m", 1L, 0L))
    assert(m("m") === 875000L)
  }

  test("single-class groups are dropped") {
    val m = auc(("onlypos", 1L, 1L), ("onlypos", 2L, 1L),
      ("ok", 1L, 0L), ("ok", 2L, 1L))
    assert(!m.contains("onlypos"))
    assert(m("ok") === 1000000L)
  }

  test("AUC is invariant to monotone score transforms") {
    val base = auc(("g", 10L, 1L), ("g", 5L, 0L), ("g", 8L, 1L),
      ("g", 3L, 0L), ("g", 6L, 0L))
    val squashed = auc(("g", 100L, 1L), ("g", 25L, 0L), ("g", 64L, 1L),
      ("g", 9L, 0L), ("g", 36L, 0L))
    assert(base("g") === squashed("g"))
  }
}

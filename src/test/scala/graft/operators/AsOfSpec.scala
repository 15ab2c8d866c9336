package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("each left row gets the latest right row at or before it") {
    val quotes = Seq((1L, 4L, 100.0), (1L, 9L, 200.0), (2L, 7L, 300.0))
      .toDF("k", "qts", "px")
    val trades = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 9L, "c"),
      (2L, 3L, "d")).toDF("k", "tts", "tag")
    val j = AsOf.join(trades, quotes, Seq("k"), "tts", "qts")
      .select("k", "tts", "tag", "r_qts", "r_px")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(j((1L, 5L, "a")) == (Some(4L), Some(100.0)))
    assert(j((1L, 10L, "b")) == (Some(9L), Some(200.0)))
    assert(j((1L, 9L, "c")) == (Some(9L), Some(200.0))) // >= ties match
    assert(j((2L, 3L, "d")) == (None, None)) // nothing precedes
  }

  test("all right columns come from the SAME row even when it has NULLs") {
    // latest preceding right row (ts=8) has a NULL in column a: per-
    // column carry would smuggle a=1 from the OLDER ts=5 row (tearing);
    // the struct carry must return (a=null, b="y", r_rts=8).
    val right = Seq((1L, 5L, Some(1), "x"), (1L, 8L, None, "y"))
      .toDF("k", "rts", "a", "b")
    val left = Seq((1L, 9L)).toDF("k", "lts")
    val r = AsOf.join(left, right, Seq("k"), "lts", "rts")
      .select("r_rts", "r_a", "r_b").head()
    assert(r.getLong(0) == 8L)
    assert(r.isNullAt(1))
    assert(r.getString(2) == "y")
  }

  test("matches a per-row scan oracle on a seeded dataset") {
    val rnd = new scala.util.Random(7)
    val right = (1 to 200).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(99)))
      .distinct
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq // unique ts
    val left = (1 to 100).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val got = AsOf.join(left.toDF("k", "ts", "rowid"),
        right.toDF("k", "rts", "v"), Seq("k"), "ts", "rts")
      .select("rowid", "r_v")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    left.foreach { case (k, ts, rowid) =>
      val expect = right.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(rowid) == expect, s"row $rowid key $k ts $ts")
    }
  }
}

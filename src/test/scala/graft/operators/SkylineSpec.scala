package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: dominated points drop, incomparable points stay") {
    val df = Seq((1L, 1L), (2L, 2L), (1L, 2L), (3L, 3L), (1L, 2L))
      .toDF("a", "b")
    val got = Skyline.skyline2d(df, col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 3L)))
  }

  test("matches brute-force dominance filter on real data") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(graft.util.Exact.cents(col("l_extendedprice")).as("lo"),
        col("l_quantity").cast("long").as("hi"))
    val fast = Skyline.skyline2d(li, col("lo"), col("hi"))
      .as[(Long, Long)].collect().toSet
    val pts = li.distinct()
    val brute = pts.as("p").join(pts.as("q"),
        col("q.lo") <= col("p.lo") && col("q.hi") >= col("p.hi") &&
          (col("q.lo") < col("p.lo") || col("q.hi") > col("p.hi")),
        "left_anti")
      .as[(Long, Long)].collect().toSet
    assert(fast == brute)
    assert(fast.nonEmpty)
  }

  test("single bucket and many buckets agree") {
    val df = Seq((5L, 1L), (4L, 2L), (3L, 3L), (2L, 4L), (1L, 5L),
      (6L, 6L), (7L, 5L)).toDF("a", "b")
    val one = Skyline.skyline2d(df, col("a"), col("b"), buckets = 1)
      .as[(Long, Long)].collect().toSet
    val many = Skyline.skyline2d(df, col("a"), col("b"), buckets = 64)
      .as[(Long, Long)].collect().toSet
    assert(one == many)
    assert(one == Set((1L, 5L), (6L, 6L)))
  }
}

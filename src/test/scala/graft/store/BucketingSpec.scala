package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the "reuse a partitioning across
  * stages" lever from the 100 TB posture: two tables bucketed by the
  * join key join WITHOUT any Exchange (shuffle) in the plan. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero shuffles") {
    val sf = "/root/testdata/sf0.001"
    // clean any leftovers from interrupted runs (dropped-table dirs linger)
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }

    graft.Tables.orders(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    graft.Tables.lineitem(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    // force the merge join (at test scale Spark would rightly broadcast;
    // the property under test is bucket co-location at fact×fact scale)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // bucketed scan-to-scan join: no shuffle on either join input
      val joinPart = plan.split("SortMergeJoin").last
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"join required a shuffle:\n$plan")
      assert(j.count() > 0)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("salting spreads a skewed key and preserves the join result") {
    import spark.implicits._
    val salt = 8
    // skewed fact: one hot key carries most rows
    val fact = (1 to 5000).map(i =>
      (if (i % 10 == 0) 999L else i.toLong % 50, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 999L).map(k => (k, s"d$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).count()

    val saltedFact = fact.withColumn("salt",
      pmod(xxhash64(col("v")), lit(salt)).cast("int"))
    val saltedDim = dim.withColumn("salt",
      explode(sequence(lit(0), lit(salt - 1))))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt")).count()

    assert(salted == plain)
  }
}

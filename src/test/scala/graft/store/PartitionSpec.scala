package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-invariance conformance (reference G11 + the suite at
  * `linkgraph/graph/graphtest/link.go:210-224`): the same rows are seen
  * exactly once regardless of partition count — uSearch splits the UUID
  * keyspace into N contiguous ranges; Spark's `repartitionByRange` is
  * the native equivalent. */
class PartitionSpec extends SparkSpec {
  import spark.implicits._

  test("repartitionByRange covers every row exactly once for any N") {
    val links = (1 to 100)
      .map(i => (f"${java.util.UUID.nameUUIDFromBytes(i.toString.getBytes)}",
        s"http://u$i"))
      .toDF("id", "url")
    for (n <- Seq(2, 10, 11, 19)) {
      val parts = links.repartitionByRange(n, col("id"))
      assert(parts.rdd.getNumPartitions == n)
      val seen = parts.select("url").as[String].collect()
      assert(seen.length == 100, s"n=$n lost rows")
      assert(seen.toSet.size == 100, s"n=$n duplicated rows")
    }
  }

  test("range partitions are contiguous and ordered (pruning-friendly)") {
    val links = (1 to 1000).map(i => (f"k$i%04d", i)).toDF("id", "v")
    val bounds = links.repartitionByRange(10, col("id"))
      .mapPartitions { it =>
        val ids = it.map(_.getString(0)).toSeq
        if (ids.isEmpty) Iterator.empty
        else Iterator((ids.min, ids.max, ids.size))
      }.collect().sortBy(_._1)
    bounds.sliding(2).foreach {
      case Array((_, max1, _), (min2, _, _)) => assert(max1 <= min2)
      case _ =>
    }
  }
}

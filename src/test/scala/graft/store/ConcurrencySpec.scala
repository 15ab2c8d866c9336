package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's concurrent-iterator canary
  * (`linkgraph/graph/graphtest/link.go:121-183`): N concurrent full
  * scans over the same store each see every row exactly once, within a
  * time bound. Spark's equivalent guarantee: concurrent jobs over one
  * cached DataFrame are isolated and complete. */
class ConcurrencySpec extends SparkSpec {

  test("10 concurrent scans each see every row exactly once, < 10 s") {
    val links = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey").cache()
    val expected = links.count()

    import scala.concurrent._
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val t0 = System.nanoTime()
    val counts = Await.result(
      Future.sequence((1 to 10).map { _ =>
        Future {
          val rows = links.collect().map(_.getLong(0))
          (rows.length.toLong, rows.distinct.length.toLong)
        }
      }), 30.seconds)
    val secs = (System.nanoTime() - t0) / 1e9
    counts.foreach { case (n, nd) =>
      assert(n == expected, "scan lost rows")
      assert(nd == expected, "scan duplicated rows")
    }
    assert(secs < 10.0, f"took $secs%.1f s")
    links.unpersist()
  }
}

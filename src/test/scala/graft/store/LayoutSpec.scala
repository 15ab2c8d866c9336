package graft.store

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits: hand-computed Morton codes") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (2147483647L, 0L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    // interleave(5=101, 3=011) = y1 x1 y0 x0 ... = 0b011011 = 27... compute:
    // x bits at even: 1,0,1 -> 010001; y bits at odd: 1,1 -> 001010;
    // z = 010001 | 101000? recompute: spread(5)=0b010001=17,
    // spread(3)=0b000101=5, z = 17 | (5<<1)=17|10=27
    // 31 one-bits spread to even positions 0..60 = 0x1555555555555555
    assert(rows.toSeq === Seq(0L, 1L, 2L, 3L, 27L,
      1537228672809129301L))
  }

  test("z-order layout prunes row groups on the second dimension too") {
    // sf0.01 events: 10k rows, user_id 0..149, one month of ts. A
    // ts-sorted (natural) layout prunes on time but reads EVERYTHING
    // for a user_id range; the z-clustered layout prunes on both.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val ev = Tables.events(spark, "/root/testdata/sf0.01")
        .select("event_id", "user_id", "ts")
      val day = expr("ts div 86400000000000")
      val zPath = "/tmp/graft_layout/z"
      val naturalPath = "/tmp/graft_layout/natural"
      Layout.zorderWrite(ev, col("user_id"), day, zPath,
        partitions = 1, rowGroupBytes = 16L * 1024)
      ev.orderBy("ts").coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 16L * 1024).parquet(naturalPath)

      def rowsScanned(path: String, f: Column): Long = {
        val df = spark.read.parquet(path).filter(f).select("event_id")
        df.collect()
        val scan = df.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s
        }.head
        scan.metrics("numOutputRows").value
      }

      val total = ev.count()
      val userRange = col("user_id") >= 10 && col("user_id") < 20
      val zScan = rowsScanned(zPath, userRange)
      val nScan = rowsScanned(naturalPath, userRange)
      // the z layout must actually skip row groups on user_id; the
      // time-sorted layout cannot (every group spans all users)
      assert(zScan < total / 2, s"z layout scanned $zScan of $total")
      assert(nScan == total, s"expected no pruning on natural, got $nScan")
      // and the z layout still prunes on the time dimension (predicate
      // on raw ts so it reaches the parquet reader)
      val jan1 = 1704067200000000000L
      val tsRange = col("ts") < lit(jan1 + 5L * 86400000000000L)
      val zDay = rowsScanned(zPath, tsRange)
      assert(zDay < total, s"z layout scanned $zDay of $total on ts range")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}

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

  test("zValueN: hand-computed 3-way interleave; agrees with zValue2 " +
      "at k=2 on the shared bit budget") {
    import spark.implicits._
    // k=3: bit i of column j lands at position 3i+j
    // x=1 (j=0) -> bit 0; y=1 (j=1) -> bit 1; z=1 (j=2) -> bit 2
    val row = Seq((1L, 1L, 1L)).toDF("x", "y", "z")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("z")))
        .as("zv")).as[Long].head()
    assert(row == 7L, s"(1,1,1) -> $row, expected 0b111")
    val row2 = Seq((2L, 0L, 1L)).toDF("x", "y", "z")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("z")))
        .as("zv")).as[Long].head()
    // x=2 -> bit 1 of j=0 -> position 3; z=1 -> position 2
    assert(row2 == 12L, s"(2,0,1) -> $row2, expected 0b1100")
    // k=2 zValueN ≡ zValue2 on values inside both budgets (31 bits)
    val both = spark.range(1000).select(
        (col("id") * 2654435761L % 1000000L).as("a"),
        (col("id") * 40503L % 1000000L).as("b"))
      .select(Layout.zValueN(Seq(col("a"), col("b"))).as("n"),
        Layout.zValue2(col("a"), col("b")).as("two"))
      .filter(col("n") =!= col("two")).count()
    assert(both == 0L, s"$both rows diverge between zValueN and zValue2")
  }

  test("3-dim z-order + versioned stats prune a box on ANY of the " +
      "three link-table dimensions") {
    val root = java.nio.file.Files
      .createTempDirectory("layout_z3").toString + "/links"
    // (src, dst, ts) in a 256^3 cube, 5 bits of entropy per dim used
    val links = spark.range(0L, 65536L).select(
      (col("id") * 2654435761L % 256L).as("src"),
      (col("id") * 40503L % 256L).as("dst"),
      (col("id") % 256L).as("ts"))
    Versioned.commitOverwrite(
      Layout.zorderN(links, Seq(col("src"), col("dst"), col("ts")),
        nFiles = 64), root,
      statsCols = Seq("src", "dst", "ts"))
    def keptFor(b: Map[String, (Long, Long)]) =
      Versioned.prunedFiles(root, b)._1.size
    // a 1/8-per-dim box must plan a small minority of the 64 files
    assert(keptFor(Map("src" -> (0L, 31L), "dst" -> (0L, 31L),
      "ts" -> (0L, 31L))) <= 8)
    // single-dimension ranges prune on EACH dimension independently
    assert(keptFor(Map("src" -> (0L, 31L))) < 64)
    assert(keptFor(Map("dst" -> (0L, 31L))) < 64)
    assert(keptFor(Map("ts" -> (0L, 31L))) < 64)
    // correctness: pruned scan ≡ full scan under the real predicate
    val pred = col("src") <= 31L && col("dst") <= 31L && col("ts") <= 31L
    val pruned = Versioned.readPruned(spark, root,
        Map("src" -> (0L, 31L), "dst" -> (0L, 31L), "ts" -> (0L, 31L)))
      .filter(pred).count()
    val full = Versioned.read(spark, root).filter(pred).count()
    assert(pruned == full && full > 0)
  }
}

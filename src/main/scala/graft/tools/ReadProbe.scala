package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-path microprobe: builds a 60-commit table once, then times
  * repeated pinned mid-history reads and latest reads, separating
  * relation CONSTRUCTION (driver-side: manifest, sidecar, footer work)
  * from job EXECUTION — the feedback loop for the versioned read
  * path's fixed costs. */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.hadoop.fs.file.impl",
        "graft.util.FastLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.util.TempDirs.scratch("readprobe")
    (1 to 60).foreach { i => graft.store.Versioned.commitAppend(
      spark.range((i-1)*1000L, i*1000L)
        .select(col("id"), (col("id")*7).as("v")), root) }
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[readprobe] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    (1 to 3).foreach { i =>
      val df = time(s"construct mid v30 #$i") {
        graft.store.Versioned.read(spark, root, 30) }
      time(s"count mid v30 #$i") { df.count() }
    }
    (1 to 3).foreach { i =>
      val df = time(s"construct latest #$i") {
        graft.store.Versioned.read(spark, root) }
      time(s"count latest #$i") { df.count() }
    }
    // Decompose: raw spark.read.parquet over the same 60 files vs the
    // facade — isolates graft metadata cost from Spark relation cost.
    val files = new java.io.File(s"$root/data").listFiles()
      .flatMap(d => d.listFiles.filter(_.getName.endsWith(".parquet")))
      .map(_.getAbsolutePath).toSeq
    println(s"[readprobe] n data files = ${files.size}")
    (1 to 3).foreach { i =>
      val df = time(s"raw spark.read 60f #$i") {
        spark.read.parquet(files: _*) }
      time(s"raw count #$i") { df.count() }
    }
    val schema = spark.read.parquet(files.head).schema
    (1 to 3).foreach { i =>
      val df = time(s"schema'd spark.read #$i") {
        spark.read.schema(schema).parquet(files: _*) }
      time(s"schema'd count #$i") { df.count() }
    }
    // Static-file-index construction: FileStatuses from one listStatus
    // per parent dir, relation built directly — no per-path glob/exists.
    import org.apache.hadoop.fs.{FileStatus, Path => HPath}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    import org.apache.spark.sql.types.StructType
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val statuses: Seq[FileStatus] = files.map(f =>
      fs.makeQualified(new HPath(f))).map(_.getParent).distinct
      .flatMap(d => fs.listStatus(d).toSeq)
      .filter(_.getPath.getName.endsWith(".parquet"))
    println(s"[readprobe] statuses = ${statuses.size}")
    class StaticIndex(ss: Seq[FileStatus]) extends FileIndex {
      override val rootPaths: Seq[HPath] = Seq(new HPath(root))
      override def partitionSchema: StructType = new StructType()
      override def listFiles(pf: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                             df: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
          : Seq[PartitionDirectory] =
        Seq(PartitionDirectory(InternalRow.empty, ss.toArray))
      override def inputFiles: Array[String] =
        ss.map(_.getPath.toString).toArray
      override def refresh(): Unit = ()
      override def sizeInBytes: Long = ss.map(_.getLen).sum
    }
    // Base-table relation construction cost in a warm session (the
    // per-query tax every bench query pays on Tables.read).
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 3).foreach { i =>
      time(s"Tables.lineitem construct #$i") {
        graft.Tables.lineitem(spark, sf) }
      time(s"Tables.orders+part+events construct #$i") {
        graft.Tables.orders(spark, sf); graft.Tables.part(spark, sf)
        graft.Tables.events(spark, sf) }
    }
    (1 to 3).foreach { i =>
      val df = time(s"static-index construct #$i") {
        spark.baseRelationToDataFrame(HadoopFsRelation(
          new StaticIndex(statuses), new StructType(), schema, None,
          new ParquetFileFormat, Map.empty[String, String])(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]))
      }
      time(s"static-index count #$i") { df.count() }
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Focused microbench for the versioned store's metadata protocol:
  * 60 commits, a pinned mid-history read, an overwrite-commit, vacuum —
  * phase-by-phase wall times (the canary times the same leg as one
  * block). Run: java -Xmx24g -cp ... graft.tools.VBench */
object VBench {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
    val b1 = if (sys.env.contains("VBENCH_FASTFS"))
      b.config("spark.hadoop.fs.file.impl",
        "graft.util.FastLocalFileSystem") else b
    sys.env.get("VBENCH_CONF").toSeq
      .flatMap(_.split(';')).filter(_.nonEmpty)
      .map(_.split("=", 2)).foreach {
        case Array(k, v) => b1.config(k, v)
        case bad => sys.error(
          s"VBENCH_CONF entry '${bad.mkString("=")}' is not k=v")
      }
    val spark = b1.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.util.TempDirs.scratch("vbench")
    val t0 = System.nanoTime()
    (1 to 60).foreach { i => graft.store.Versioned.commitAppend(
      spark.range((i-1)*1000L, i*1000L).select(col("id"), (col("id")*7).as("v")), root) }
    println(f"[vbench] 60 commits: ${(System.nanoTime()-t0)/1e9}%.1f s")
    val t1 = System.nanoTime()
    val mid = graft.store.Versioned.read(spark, root, 30).count()
    val t2 = System.nanoTime()
    println(f"[vbench] mid read: ${(t2-t1)/1e9}%.1f s (mid=$mid)")
    graft.store.Versioned.commitOverwrite(graft.store.Versioned.read(spark, root).repartition(4), root)
    val t3 = System.nanoTime()
    println(f"[vbench] overwrite: ${(t3-t2)/1e9}%.1f s")
    val (nDel, _) = graft.store.Versioned.vacuum(root, 61L)
    val t4 = System.nanoTime()
    println(f"[vbench] vacuum: ${(t4-t3)/1e9}%.1f s (nDel=$nDel)")
    val n = graft.store.Versioned.read(spark, root).count()
    println(f"[vbench] final read: ${(System.nanoTime()-t4)/1e9}%.1f s (n=$n)")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated SCC timing on the ScaleCanary graph (500k V / 5M E, 1k-hub
  * skew) — a single leg in a fresh JVM, for pre/post comparisons of the
  * edge-layout work without the canary's cross-leg memory pressure. */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nV = sys.env.getOrElse("GRAFT_CANARY_V", "500000").toLong
    val nE = sys.env.getOrElse("GRAFT_CANARY_E", "5000000").toLong
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietExpected()
    // identical generator to ScaleCanary's graph
    val edges = spark.range(nE).select(
        pmod(xxhash64(col("id"), lit(1)), lit(nV)).as("src"),
        when(pmod(xxhash64(col("id"), lit(2)), lit(10)) === 0,
          pmod(xxhash64(col("id"), lit(3)), lit(1000)))
          .otherwise(pmod(xxhash64(col("id"), lit(3)), lit(nV))).as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    val r = graft.graph.Scc.run(edges)
      .agg(countDistinct("scc"), count(lit(1))).first()
    println(f"[sccprobe] ${(System.nanoTime() - t0) / 1e9}%.1f s  " +
      s"components=${r.getLong(0)} vertices=${r.getLong(1)}")
    spark.stop()
  }
}

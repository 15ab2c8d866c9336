package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing harness for the iterative operators. */
object LoopBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.Tables.lineitem(spark, sfDir)
    val edges = li.select(
        concat(lit("o"), col("l_orderkey").cast("string")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
      .distinct()
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    println(s"V=${verts.count()} E=${edges.count()}")

    val t0 = System.nanoTime()
    val colored = graft.graph.Coloring.run(verts, edges)
    val histo = colored.groupBy("color").count().orderBy("color").collect()
    println(f"coloring total ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"colors=${histo.length}")
    spark.stop()
  }
}

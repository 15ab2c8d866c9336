package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing harness for the iterative operators. */
object LoopBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions).master(s"local[$cpus]")
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

    if (!args.contains("novec")) {
      // fold vs native dot product on a 500k x 64 synthetic corpus
      val vecs = spark.range(500000).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          d => (pmod(xxhash64(col("id") * 64 + d), lit(1000)) / 500.0 - 1.0)
            .cast("float")).as("embedding"))
        .localCheckpoint() // materialize so we time compute, not gen
      val q = (0 until 64).map(i => (i % 7 - 3) / 3.0f)
      def time(tag: String)(f: => Long): Unit = {
        val t = System.nanoTime()
        val n = f
        println(f"$tag: ${(System.nanoTime() - t) / 1e9}%.2f s ($n rows)")
      }
      val qc = array(q.map(lit(_)): _*)
      time("dot fold  ")(vecs.select(graft.ml.Similarity
        .dotFold(col("embedding"), qc).as("d")).filter(col("d") > 1e9).count())
      time("dot native")(vecs.select(graft.functions.VecFunctions
        .dotFF(col("embedding"), qc).as("d")).filter(col("d") > 1e9).count())
      time("cos fold  ")(vecs.select(graft.ml.Similarity
        .cosineFold(col("embedding"), qc).as("d")).filter(col("d") > 2).count())
      time("cos native")(vecs.select(graft.functions.VecFunctions
        .cosineFF(col("embedding"), qc).as("d")).filter(col("d") > 2).count())
    }

    if (!args.contains("nocolor")) {
      val t0 = System.nanoTime()
      val colored = graft.graph.Coloring.run(verts, edges)
      val histo = colored.groupBy("color").count().orderBy("color").collect()
      println(f"coloring total ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
        s"colors=${histo.length}")
    }
    spark.stop()
  }
}

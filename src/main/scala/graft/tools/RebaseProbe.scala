package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement tool for rebaseline forensics: times a set of
  * queries under BOTH materializations — the pre-round-7 `count()`
  * (which lets Catalyst's ColumnPruning delete expensive top-level
  * projections) and the honest `toRdd.foreach` Bench uses since round
  * 7 — so a query whose early-round baseline predates the switch can
  * be classified as a count()-era artifact (big gap between the two)
  * vs a genuine regression (no gap). Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.RebaseProbe q58_repetition_stats,..."
  */
object RebaseProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq).getOrElse(Nil)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "256k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietExpected()
    // warmup
    spark.range(100000).selectExpr("sum(id * 2)").collect()

    def best(run: () => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run()
        (System.nanoTime() - t0) / 1e9
      }.min

    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      def fresh() = q(spark, sfDir)
      val honest = best(() =>
        fresh().queryExecution.toRdd.foreach(_ => ()))
      spark.sharedState.cacheManager.clearCache()
      val counted = best(() => { fresh().count(); () })
      spark.sharedState.cacheManager.clearCache()
      println(f"$n%-32s honest=$honest%7.3f count=$counted%7.3f " +
        f"gap=${honest / math.max(counted, 1e-9)}%5.2fx")
    }
    spark.stop()
  }
}

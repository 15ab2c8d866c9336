package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profiler: runs one SparkEntry query (args(0), default
  * q11_pagerank) against SPARK_GRAFT_SF_DIR and dumps per-stage task
  * counts, wall/cpu time and shuffle bytes — the feedback loop for
  * judging whether an iterative plan is overhead-bound or work-bound. */
object ProfLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val qname = args.headOption.getOrElse("q11_pagerank")
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "256k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietExpected()

    @volatile var stages =
      List.empty[(Int, String, Int, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages ::= ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.numTasks, dur, si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
    })

    // Untimed warmup (mirrors Bench)
    graft.Tables.nation(spark, sfDir).groupBy("n_regionkey")
      .count().collect()

    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(qname)(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"== $qname total ${total}%.2f s, rows=$n ==")
    println(f"${"stage"}%-6s${"tasks"}%-7s${"wall_ms"}%-9s" +
      f"${"cpu_ms"}%-9s${"shuf_wr"}%-10sname")
    stages.sortBy(_._1).foreach { case (id, nm, nt, w, c, sw) =>
      if (w > 30) println(f"$id%-6d$nt%-7d$w%-9d$c%-9d$sw%-10d$nm")
    }
    val byTasks = stages.groupBy(_._3).view
      .mapValues(s => (s.size, s.map(_._4).sum)).toMap
    println("-- stages by task count: " + byTasks.toSeq.sortBy(_._1)
      .map { case (k, (cnt, ms)) => s"$k tasks x$cnt=${ms}ms" }
      .mkString(", "))
    spark.stop()
  }
}

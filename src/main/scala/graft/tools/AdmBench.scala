package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Focused microbench pricing streaming admission at the 500k-doc
  * canary scale, fresh-JVM tail-only (the in-canary legs sit mid-
  * session and drift): the q211 end-to-end gate (index rebuilt inside
  * the gate) vs q215's stored handoff (one-time staging + probe-only
  * batches). Run: java -Xmx24g -cp ... graft.tools.AdmBench */
object AdmBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietExpected()
    val nD = 500000L
    val docs = spark.range(nD).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(24)),
          i => concat(lit("w"), pmod(xxhash64(
            when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
              .otherwise(col("id")) * 131 + i, lit(7)), lit(5000)))),
          " ").as("text"))
      .localCheckpoint()
    def admDelta = spark.range(nD, nD + 5000).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(24)),
        i => concat(lit("w"), pmod(xxhash64(
          when(pmod(col("id"), lit(2)) === 0,
            pmod((col("id") - nD) * 100, lit(nD)))
            .otherwise(col("id")) * 131 + i, lit(7)), lit(5000)))),
        " ").as("text"))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[admbench] $tag%-38s ${(System.nanoTime()-t0)/1e9}%5.1f s"); r
    }
    val n1 = time("end-to-end admission (q211 shape)") {
      graft.streaming.Streams.nearDupAdmissionReplay(docs, admDelta,
        3, 12, 3, 0.5).filter(col("jaccard") >= 0.999).count()
    }
    time("stored staging") {
      graft.dedup.Dedup.stageAdmissionIndex(docs, "admbench",
        Long.MaxValue, force = true)
    }
    // forced restage per run: retire superseded index generations
    graft.store.Versioned.vacuum("/tmp/graft_admission_admbench",
      graft.store.Versioned.latestVersion("/tmp/graft_admission_admbench"))
    val n2 = time("stored probe (q215 shape)") {
      graft.streaming.Streams.nearDupAdmissionStoredReplay(docs, admDelta,
        "admbench", 0L, 3, 12, 3, 0.5)
        .filter(col("jaccard") >= 0.999).count()
    }
    println(s"[admbench] matches end=$n1 stored=$n2 (want 5000 both)")
    spark.stop()
  }
}

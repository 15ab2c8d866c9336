package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Ad-hoc stage timing for the minhash near-dup pipeline. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t) / 1e9}%.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val aug = docs.unionAll(docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz9 qq8 extra tail")).as("text")))

    val sh = Dedup.shingleTable(aug, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] shingles=${time("shingle materialize")(sh.count())}")
    val wide = time("minHashesWide build")(
      Dedup.minHashesWide(sh, 12, "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    println(s"[probe] wide=${time("minhash agg")(wide.count())}")
    val bands = Dedup.lshBandsWide(wide, 3, 12, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] bands=${time("bands")(bands.count())}")
    val cand = Dedup.lshCandidates(bands, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] cand=${time("candidates")(cand.count())}")
    val j = time("jaccard")(
      Dedup.jaccard(cand, sh, "doc_id").filter(col("jaccard") >= 0.5)
        .count())
    println(s"[probe] verified=$j")
    spark.stop()
  }
}

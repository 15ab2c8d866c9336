package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.Analyzer

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline surface built on top of the uSearch data model
  * (documents table, `textindexer/index/doc.go:10-28`).
  *
  * All hashing is engine-portable (`md5` hex prefix → 60-bit long) so
  * every operator is oracle-checkable in any SQL engine, and every shape
  * is shuffle-aware:
  *  - exact dedup: one hash-aggregation keyed by content hash;
  *  - MinHash/LSH: explode to shingles → per-(doc, hashfn) min — partial
  *    aggregation applies — band signatures, then a self-join **only
  *    within LSH buckets** (never the quadratic all-pairs);
  *  - SimHash: per-bit majority vote via explode(bits) + two hash aggs,
  *    candidate generation by 16-bit band buckets (Hamming ≤ k near-dups
  *    must collide on ≥ 1 of 4 bands when k ≤ 3·... pigeonhole over 4
  *    bands covers Hamming ≤ 3; wider radii take more/narrower bands).
  */
object Dedup {

  /** 60-bit portable hash: first 15 hex digits of md5, as a long.
    * DuckDB equivalent: `CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)`. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact duplicate groups: (content_hash, cnt, doc_ids) for groups with
    * more than one member. Canonical = min doc id kept first. */
  def exactDupGroups(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(col(idCol), portableHash(col(textCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))
      .filter(col("cnt") > 1)

  /** One row per (doc, shingle): distinct word n-grams. */
  def shingleTable(docs: DataFrame, n: Int, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(array_distinct(Analyzer.shingles(col(textCol), n)))
          .as("shingle"))

  /** MinHash signatures: `numHashes` independent min-hashes per doc.
    * Output: (id, j, mh) — long format, ready for banding. */
  def minHashes(docs: DataFrame, shingleN: Int, numHashes: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingleTable(docs, shingleN, idCol, textCol)
    val js = (0 until numHashes).map(lit(_))
    sh.select(col(idCol), explode(array(js: _*)).as("j"), col("shingle"))
      .select(col(idCol), col("j"),
        portableHash(concat(col("j"), lit(":"), col("shingle"))).as("h"))
      .groupBy(idCol, "j")
      .agg(min("h").as("mh"))
  }

  /** LSH band signatures: bands of `rowsPerBand` minhashes; signature =
    * md5 of the ordered minhash list. Output: (id, band, sig). */
  def lshBands(mh: DataFrame, rowsPerBand: Int,
               idCol: String = "doc_id"): DataFrame =
    mh.withColumn("band", (col("j") / rowsPerBand).cast("int"))
      .groupBy(idCol, "band")
      .agg(md5(concat_ws(",",
        transform(sort_array(collect_list(struct(col("j"), col("mh")))),
          s => s.getField("mh").cast("string")))).as("sig"))

  /** Candidate near-duplicate pairs (a < b) that share ≥ 1 LSH bucket. */
  def lshCandidates(bands: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val l = bands.select(col("band"), col("sig"), col(idCol).as("a"))
    val r = bands.select(col("band"), col("sig"), col(idCol).as("b"))
    l.join(r, Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact Jaccard similarity over shingle sets for given (a, b) pairs.
    * One shuffle keyed by shingle for the intersection, plus a broadcast
    * of per-doc set sizes. */
  def jaccard(pairs: DataFrame, shingles: DataFrame,
              idCol: String = "doc_id"): DataFrame = {
    val sizes = shingles.groupBy(idCol)
      .agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(shingles.select(col(idCol).as("a"), col("shingle")), Seq("a"))
      .join(shingles.select(col(idCol).as("b"), col("shingle")),
        Seq("b", "shingle"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("inter"))
    pairs.join(inter, Seq("a", "b"), "left")
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col(idCol).as("b"), col("sz").as("szb")), Seq("b"))
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"))
  }

  /** End-to-end MinHash near-dup detection: candidates via LSH, verified
    * with exact shingle Jaccard ≥ `threshold`. */
  def minHashNearDups(docs: DataFrame, shingleN: Int = 3,
                      numHashes: Int = 12, rowsPerBand: Int = 3,
                      threshold: Double = 0.6,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    // shingles feed both the signatures and the exact verify — cache one
    val sh = shingleTable(docs, shingleN, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val js = (0 until numHashes).map(lit(_))
    val mh = sh
      .select(col(idCol), explode(array(js: _*)).as("j"), col("shingle"))
      .select(col(idCol), col("j"),
        portableHash(concat(col("j"), lit(":"), col("shingle"))).as("h"))
      .groupBy(idCol, "j")
      .agg(min("h").as("mh"))
    val cand = lshCandidates(lshBands(mh, rowsPerBand, idCol), idCol)
    jaccard(cand, sh, idCol)
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash fingerprints (60-bit): per-bit majority over token hashes
    * weighted by term frequency. Output: (id, simhash). */
  def simHash(docs: DataFrame, bits: Int = 60, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(Analyzer.tokenize(col(textCol))).as("tok"))
      .groupBy(idCol, "tok")
      .agg(count(lit(1)).as("tf"))
      .withColumn("h", portableHash(col("tok")))
    val bitRows = tf.select(col(idCol),
        explode(sequence(lit(0), lit(bits - 1))).as("b"),
        col("tf"), col("h"))
      .withColumn("contrib",
        when(expr("shiftright(h, CAST(b AS INT))").bitwiseAND(1) === 1,
          col("tf")).otherwise(-col("tf")))
    bitRows.groupBy(idCol, "b")
      .agg(sum("contrib").as("s"))
      .groupBy(idCol)
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
        .otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup candidates: docs colliding on ≥1 of four 15-bit
    * bands (pigeonhole: any pair with Hamming distance ≤ 3 collides),
    * verified by exact Hamming ≤ `maxHamming`. */
  def simHashNearDups(sh: DataFrame, maxHamming: Int = 3,
                      idCol: String = "doc_id"): DataFrame = {
    val bands = sh.select(col(idCol), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("key",
        expr("shiftright(simhash, CAST(band * 15 AS INT))")
          .bitwiseAND(lit((1L << 15) - 1)))
    val l = bands.select(col("band"), col("key"), col(idCol).as("a"),
      col("simhash").as("ha"))
    val r = bands.select(col("band"), col("key"), col(idCol).as("b"),
      col("simhash").as("hb"))
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

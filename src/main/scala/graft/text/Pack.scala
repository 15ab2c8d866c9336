package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

import graft.dedup.Dedup

/** Sequence assembly for LLM training: GPT-style corpus packing
  * (concatenate everything in a total order, slice into fixed
  * token-budget sequences) and sliding-window token chunking for
  * context-length limits.
  */
object Pack {

  /** Global token offset of every document under the total order
    * `idCol`, plus its packed-sequence coordinates for a `budget`-token
    * context: `seq_id = offset div budget`, `seq_offset = offset mod
    * budget`. This is exactly the concat-then-chunk packing GPT-style
    * training uses — documents straddle sequence boundaries by design.
    *
    * A naive running total (`Window.orderBy` with no partition) is a
    * single-task plan — unusable at corpus scale. This is the classic
    * two-phase distributed prefix sum instead:
    *
    *   1. range-partition by `idCol` (partition i's ids all precede
    *      partition i+1's) and count tokens per row;
    *   2. aggregate one subtotal per partition — a driver action on
    *      #partitions rows, bounded regardless of corpus size — and
    *      prefix-scan those on the driver;
    *   3. broadcast the per-partition base offsets back and finish with
    *      a window partitioned BY the partition id, so the running sum
    *      parallelizes across partitions.
    *
    * The result is invariant to the partition count: offset = total
    * tokens before the doc in id order, however the range boundaries
    * fell.
    *
    * Contract: `idCol` must be unique — it IS the total order; rows
    * tying on it would make their relative offsets arbitrary.
    */
  def packedOffsets(docs: DataFrame, budget: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val counted = docs
      .select(col(idCol), Analyzer.tokenCount(col(textCol))
        .cast("long").as("n_tok"))
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
    // The cache is LOAD-BEARING for correctness, not just cost (same
    // contract as Dedup.minHashNearDups — the caller/bench cleans up):
    // the bases below are keyed by the __pid layout of THIS
    // materialization. Unpersisting before the returned frame runs
    // would let the range exchange re-sample its boundaries on
    // re-execution and silently pair rows with the wrong base.
    counted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subtotals = counted.groupBy("__pid")
      .agg(sum("n_tok").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix scan: partition pid starts after every earlier
    // partition's tokens (empty partitions simply never appear)
    val bases = subtotals
      .scanLeft((-1, 0L, 0L)) { case ((_, acc, prev), (pid, tot)) =>
        (pid, acc + prev, tot)
      }.drop(1).map { case (pid, base, _) => (pid, base) }.toSeq
    val spark = docs.sparkSession
    import spark.implicits._
    val baseDf = broadcast(bases.toDF("__pid", "__base"))
    val run = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    counted.join(baseDf, "__pid")
      .select(col(idCol), col("n_tok"),
        (col("__base") + coalesce(sum("n_tok").over(run), lit(0L)))
          .as("tok_offset"))
      // integral div — a double-valued `/` would silently lose
      // exactness past 2^53 total tokens, well inside 100 TB range
      .withColumn("seq_id", expr(s"tok_offset div $budget"))
      .withColumn("seq_offset", col("tok_offset") % budget)
  }

  /** Sliding-window token chunks: one row per (doc, chunk) with the
    * chunk's token start offset, its token count, and a portable hash
    * of its space-joined text (the hash keeps result sets narrow;
    * callers wanting the text re-slice from `start`). Chunk starts are
    * 0, stride, 2·stride, … while they fall inside the document; the
    * tail chunk may be shorter than `size`. Empty documents produce no
    * chunks.
    *
    * Pure per-row explode — embarrassingly parallel, rides inside the
    * scan stage, no shuffle at all.
    */
  def tokenChunks(docs: DataFrame, size: Int, stride: Int,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(size > 0 && stride > 0, "size/stride must be positive")
    // bind the token array once per row (single-element-array + transform
    // + flatten, same trick as Analyzer.shingles)
    val chunks = flatten(transform(array(Analyzer.tokenize(col(textCol))),
      toks => when(F.size(toks) > 0,
        transform(
          sequence(lit(0), F.size(toks) - 1, lit(stride)),
          s => struct(s.as("start"),
            F.size(slice(toks, s + 1, lit(size))).as("n_chunk_toks"),
            array_join(slice(toks, s + 1, lit(size)), " ").as("chunk"))))
        .otherwise(array().cast(
          "array<struct<start:int,n_chunk_toks:int,chunk:string>>"))))
    docs.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "ch")))
      .select(col(idCol), col("chunk_id"),
        col("ch.start").as("start"),
        col("ch.n_chunk_toks").as("n_chunk_toks"),
        Dedup.portableHash(col("ch.chunk")).as("chunk_hash"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood record linkage (Hernández & Stolfo 1995): sort
  * the corpus by a cheap blocking key, then compare only rows whose
  * ranks in that order are within a window `w` — candidate volume is
  * O(n·w) instead of the O(n²) cross product, and near-duplicates with
  * similar prefixes land adjacent.
  *
  * The global rank is NOT a single-task `Window.orderBy`: it reuses the
  * two-phase distributed prefix sum from [[graft.text.Pack.packedOffsets]]
  * (range-partition on the sort key, one #partitions-sized driver scan
  * of subtotals, then a per-partition window) — every stage parallel,
  * the driver never sees more than #partitions rows.
  */
object Neighborhood {

  /** Adds a 1-based global rank `rn` under the total order
    * (`keyCol`, `idCol`). `idCol` must be unique — it breaks key ties so
    * the rank (and therefore the candidate set) is deterministic.
    *
    * Note: the returned frame depends on a load-bearing persist of the
    * range-partitioned input (same contract as `Pack.packedOffsets` —
    * the per-partition bases are keyed to THIS materialization's range
    * boundaries); callers/bench clean the cache up after the action.
    *
    * Skew: rows tying on `keyCol` range-partition by the unique `idCol`
    * tie-break, so a hot key spreads across partitions rather than
    * pinning one executor.
    */
  def globalRank(df: DataFrame, keyCol: Column, idCol: String): DataFrame = {
    val keyed = df
      .withColumn("__key", keyCol)
      .repartitionByRange(col("__key"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    keyed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subtotals = keyed.groupBy("__pid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = subtotals
      .scanLeft((-1, 0L, 0L)) { case ((_, acc, prev), (pid, n)) =>
        (pid, acc + prev, n)
      }.drop(1).map { case (pid, base, _) => (pid, base) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val baseDf = broadcast(bases.toDF("__pid", "__base"))
    val w = Window.partitionBy("__pid").orderBy(col("__key"), col(idCol))
    keyed.join(baseDf, "__pid")
      .withColumn("rn", col("__base") + row_number().over(w))
      .drop("__pid", "__base", "__key")
  }

  /** Candidate pairs of the sorted-neighborhood method: all (a, b) with
    * rank(a) < rank(b) ≤ rank(a) + w − 1 under the (`keyCol`, `idCol`)
    * order. Each unordered pair appears exactly once, labelled by rank
    * order. The pairing is ONE equi-join on the rank (left side explodes
    * its w−1 target ranks first), so candidate volume is O(n·w) rows
    * however large the corpus — never a cross product.
    *
    * `payload` columns are carried through on both sides (suffixed
    * `_a` / `_b`) for the caller's verify step.
    */
  def sortedNeighborhoodPairs(df: DataFrame, keyCol: Column, idCol: String,
                              w: Int, payload: Seq[String]): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    val ranked = globalRank(df, keyCol, idCol)
    val leftCols =
      Seq(col(idCol).as("id_a"),
        explode(sequence(lit(1), lit(w - 1))).as("__off"),
        col("rn")) ++ payload.map(c => col(c).as(s"${c}_a"))
    val left = ranked.select(leftCols: _*)
      .withColumn("__target", col("rn") + col("__off"))
      .drop("rn", "__off")
    val rightCols =
      Seq(col(idCol).as("id_b"), col("rn").as("__target")) ++
        payload.map(c => col(c).as(s"${c}_b"))
    val right = ranked.select(rightCols: _*)
    left.join(right, "__target").drop("__target")
  }
}

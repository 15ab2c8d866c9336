package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the partial-aggregate merge
  * algebra Spark applies map-side, lifted to a first-class operator so
  * a STANDING aggregate table can absorb a delta batch without ever
  * rescanning the base (classic materialized-view maintenance, Blakeley
  * et al. 1986, restricted to the distributive aggregates).
  *
  * State per key: (n, sum_cents, min_cents, max_cents). Count/sum/min/
  * max are distributive and avg is algebraic over (n, sum), so
  *   state(base) ⊕ state(delta) == state(base ∪ delta)
  * with ⊕ = key-wise (sum, sum, min, max) — associative AND
  * commutative, so deltas can arrive in any order and batch grouping
  * never changes the result (q90's oracle recomputes from scratch and
  * hash-compares against the merge path).
  *
  * At 100 TB this is the difference between touching |delta| rows and
  * touching |base| rows per refresh: the state table is key-cardinality
  * sized, the merge is one keyed hash-agg over state ∪ state(delta).
  * Sums are kept in exact integer cents — merge order can never drift
  * a float.
  */
object Incremental {

  /** The aggregate state of `df` grouped by `keys`, over the integer-
    * cents measure `valueCents`. */
  def aggState(df: DataFrame, keys: Seq[String],
               valueCents: Column): DataFrame = {
    require(keys.nonEmpty, "need at least one grouping key")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(valueCents).as("sum_cents"),
        min(valueCents).as("min_cents"),
        max(valueCents).as("max_cents"))
  }

  /** Merge two state tables: key-wise ⊕. Keys present on one side only
    * pass through (their state merges with the identity). */
  def mergeState(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))

  /** Read the algebraic aggregates out of a state table: adds
    * avg_micros = (sum_cents / 100) / n, micros-snapped. */
  def readout(state: DataFrame): DataFrame =
    state.withColumn("avg_micros",
      graft.util.Exact.micros(
        col("sum_cents").cast("double") / lit(100.0)
          / col("n").cast("double")))
}

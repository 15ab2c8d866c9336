package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join.
  *
  * A shuffled equi-join sends every fact row with the same key to ONE
  * reducer; a Zipf-skewed key (the shape `q126_key_skew` /
  * [[graft.queries.PipelineQueries]]'s profiler measures) turns that
  * reducer into the stage straggler. Salting spreads each key over
  * `salts` sub-partitions: the fact side gets a deterministic salt in
  * `[0, salts)` derived from a row-unique column, the dimension side is
  * replicated `salts`× so every (key, salt) cell still finds its match.
  * Join output is IDENTICAL to the unsalted join — the salt only changes
  * the partitioning — which is exactly what the q130 oracle asserts by
  * running the plain join in DuckDB.
  *
  * Cost model at 100 TB: dim is replicated `salts`× (choose a dim that is
  * shuffle-joined but small enough that ×8 replication is cheap), fact is
  * never replicated, and the hottest key's reducer shrinks by `salts`×.
  * Spark's AQE skew-join splits oversized PARTITIONS the same way at
  * runtime, but cannot split a single oversized KEY GROUP inside a
  * partition — salting is the remedy for that case, which is why it
  * stays a first-class operator here. (Semantics per the standard
  * skew-mitigation pattern; the reference engine — uSearch — never joins
  * a skewed fact table, its graph fan-out is bounded per crawl pass.)
  */
object Salting {

  /** Inner equi-join of `fact` with `dim` on `factKey == dimKey`,
    * salt-spread over `salts` sub-partitions. `saltSrc` must be a
    * deterministic fact-side expression (a row id, NOT rand()) so the
    * join is reproducible. Emits fact.* plus dim's non-key columns.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     saltSrc: org.apache.spark.sql.Column,
                     salts: Int): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val f = fact.withColumn("__salt", pmod(saltSrc, lit(salts)).cast("int"))
    // sequence(0, salts-1) ascends for salts >= 1; explode replicates
    // each dim row exactly `salts` times.
    val d = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      // Force a shuffled join: broadcasting the dim would make the salt
      // pointless (broadcast joins never skew on the build side), and at
      // 100 TB the dim that NEEDS salting is one too big to broadcast.
      .hint("merge")
    f.join(d, f("__salt") === d("__salt") &&
        f.col(factKey) === d.col(dimKey))
      .drop("__salt", dimKey)
  }
}

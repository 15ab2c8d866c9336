package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot join/aggregation keys.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most sort-merge skew at runtime by splitting
  * oversized partitions, but it cannot split a SINGLE hot key's rows
  * across tasks for hash aggregation, and it never fires on joins that
  * were planned broadcast. Explicit salting is the portable fallback:
  *
  *  - [[saltedJoin]]: the fact side gets a deterministic per-row salt
  *    in [0, salt); the dim side is replicated once per salt value; the
  *    join key becomes (keys..., salt), spreading one hot key over
  *    `salt` shuffle partitions. Inner equi-join semantics are
  *    unchanged — every fact row still meets exactly its dim match.
  *  - [[twoStageAgg]]: decomposable aggregates (sum/count/min/max) run
  *    partial at (keys..., salt) then final at keys — the classic
  *    two-stage shuffle that caps any single reducer's input at
  *    1/salt of the hot key.
  *
  * Cost model: dim replication is salt×|dim| rows — choose salt ~
  * (hot-key rows / target partition rows), small (8-32); at 100 TB the
  * win is that the hottest reducer shrinks by that factor while total
  * shuffle volume grows only on the (small) dim side.
  */
object Skew {

  private val SaltCol = "__salt"

  /** Deterministic per-row salt: hash of the whole fact row, so the
    * assignment is stable across retries/replays (no rand() — a
    * nondeterministic salt recomputed by a task retry can disagree with
    * shuffle data a consumer already read). The flip side of
    * determinism: rows that are byte-identical necessarily share a
    * salt, so a hot key whose rows carry NO distinguishing column does
    * not spread — pre-aggregate exact duplicate rows first (they carry
    * no information a join could use) or keep a disambiguating column
    * in the frame when salting. */
  private def rowSalt(df: DataFrame, salt: Int): Column = {
    require(!df.columns.contains(SaltCol),
      s"input already has a $SaltCol column")
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
      lit(salt.toLong)).cast("int")
  }

  /** Inner equi-join on `keys` with the fact side salted `salt` ways
    * and the dim side replicated per salt value. Result columns =
    * standard `fact.join(dim, keys)` output (salt column dropped). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val saltedFact = fact.withColumn(SaltCol, rowSalt(fact, salt))
    val saltedDim = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, keys :+ SaltCol).drop(SaltCol)
  }

  /** Two-stage skew-safe aggregation: `partial` aggregates run at
    * (keys..., salt), then `merge` combines the partials at keys.
    * Caller supplies matching partial/merge pairs (e.g. count -> sum,
    * sum -> sum, min -> min). */
  def twoStageAgg(df: DataFrame, keys: Seq[String], salt: Int,
                  partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    df.withColumn(SaltCol, rowSalt(df, salt))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Explicit Bloom-filter runtime join pruning (Bloom 1970; the
  * semi-join-reduction strategy Spark itself applies adaptively via
  * `InjectRuntimeFilter`, materialized here with the engine-portable
  * 60-bit hash so the filtered result is oracle-checkable and the
  * filter itself is a first-class, reusable table).
  *
  * Use case at 100 TB: a selective predicate lands on a SMALL dimension
  * and the expensive side is a huge fact scan feeding a shuffle join.
  * Building the Bloom bit set from the dimension (bounded at
  * min(k * |dim|, mBits) rows — thousands, never data-scale) and
  * broadcasting it turns the fact-side pre-filter into a scan-stage
  * hash probe: rows that cannot join never enter the exchange. False
  * positives (rate ~ (1 - e^(-k n / m))^k) are culled by the real join
  * afterwards — the filter only ever REMOVES definite non-matches, so
  * correctness is unconditional.
  */
object RuntimeFilter {

  /** The k salted bit positions of `key` in an mBits-wide filter. */
  private[graft] def bitPositions(key: Column, k: Int, mBits: Int): Seq[Column] = {
    require(k > 0 && mBits > 0, s"k/mBits must be positive, got k=$k m=$mBits")
    (0 until k).map { i =>
      pmod(Dedup.portableHash(concat_ws("|", lit(i.toString), key)),
        lit(mBits.toLong))
    }
  }

  /** The Bloom filter of `key` over `small`, as the DISTINCT set-bit
    * table (one `bit` column) — at most min(k * |small|, mBits) rows,
    * always broadcastable by construction. */
  def bloomBits(small: DataFrame, key: Column, k: Int, mBits: Int): DataFrame =
    small.select(explode(array(bitPositions(key, k, mBits): _*)).as("bit"))
      .distinct()

  /** `big` restricted to rows whose key MAY be in the filter: one
    * broadcast left-semi join per hash function (a row passes only if
    * ALL k of its bit positions are set). Columns of `big` pass through
    * untouched; every probe is a scan-stage hash lookup against the
    * broadcast bit table — the big side never shuffles. */
  def probe(big: DataFrame, key: Column, bits: DataFrame,
            k: Int, mBits: Int): DataFrame =
    bitPositions(key, k, mBits).zipWithIndex.foldLeft(big) {
      case (df, (pos, i)) =>
        df.join(broadcast(bits.select(col("bit").as(s"__bloom_b$i"))),
          pos === col(s"__bloom_b$i"), "left_semi")
    }
}

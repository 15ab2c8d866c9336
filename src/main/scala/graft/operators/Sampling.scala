package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Deterministic sampling and dataset splitting.
  *
  * Training-data pipelines need samples and train/val/test splits that
  * are (a) reproducible run-to-run without seed plumbing, (b) stable
  * under repartitioning/retries, and (c) GROUP-stable: all rows of one
  * user/domain/document land in the same split, or near-duplicates leak
  * across the train/eval boundary. `df.sample()` gives none of these —
  * its outcome depends on partitioning. Hashing a caller-chosen key
  * gives all three: split membership is a pure function of the key.
  *
  * All predicates are codegen'd column expressions on the 60-bit
  * portable hash ([[Dedup.portableHash]]), so they ride inside the scan
  * stage (no shuffle, no UDF) and replicate exactly in any engine with
  * md5 — which is what lets q49 hash-match a DuckDB oracle.
  */
object Sampling {

  /** hash(domain|key) mod den, in [0, den) — the sampling coordinate.
    * The domain prefix decorrelates the operators: without it, a 50%
    * sample keyed like an 80/10/10 split would emit ONLY train rows
    * (both predicates would test the same hash value). */
  private def coord(domain: String, key: Column, den: Int): Column =
    pmod(Dedup.portableHash(concat_ws("|", lit(domain), key)),
      lit(den.toLong))

  /** Keep rows whose key hashes into the first `num` of `den` buckets
    * (a deterministic num/den Bernoulli sample, exact per key). */
  def hashSample(df: DataFrame, key: Column, num: Int,
                 den: Int = 100): DataFrame = {
    require(num >= 0 && num <= den, s"need 0 <= num <= den, got $num/$den")
    df.filter(coord("sample", key, den) < num)
  }

  /** Per-stratum sampling rates (percent of `den`): a row is kept when
    * its key hashes under its stratum's rate; strata absent from
    * `rates` get `defaultNum`. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Int], defaultNum: Int,
                           den: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultNum)) { case (acc, (value, num)) =>
      when(stratum === value, lit(num)).otherwise(acc)
    }
    df.filter(coord("sample", key, den) < rate)
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006): rank every row by u^(1/w) with u a hash-derived
    * uniform in (0, 1], keep the top k. Inclusion probability is
    * proportional-to-weight without replacement — the quality- or
    * length-weighted subsampling step of a training-data pipeline,
    * reproducible because u comes from the portable hash, not an RNG.
    *
    * Ranks are compared in the log domain (ln(u)/w is monotone in
    * u^(1/w)) so the only transcendental is ONE ln, and the score is
    * micros-snapped with the row key as tie-break — a total order both
    * engines agree on. Top-k is TakeOrderedAndProject: each partition
    * keeps k candidates, the driver merges k-sized heaps — no global
    * sort, no shuffle of the losers, scale-safe at any corpus size.
    *
    * Returns the selected rows plus their `ws_score_micros`. Rows with
    * weight <= 0 are excluded (zero-weight items are never sampled).
    */
  /** Deterministic global training shuffle: every row gets a shard
    * (key-hash mod `nShards`) and a reproducible POSITION within it
    * (hash order, key tie-break) — the pre-training "global shuffle +
    * fixed shards" step. The permutation is a pure function of the
    * keys: identical run-to-run, across engines, and under retries —
    * no RNG, no seed plumbing — so a training run's data order is an
    * auditable artifact (q218 fingerprints it cross-engine). Plan
    * shape: the hash and shard ride the scan stage; ONE exchange on
    * shard; position is an in-partition sort — no global sort, no
    * single-partition window, each shard orders independently, so the
    * op scales to any corpus. Output adds (shuffle_h, shard, pos).
    * The domain prefix decorrelates from sample/split hashing. */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("shuffle_h",
        Dedup.portableHash(concat_ws("|", lit("shuffle"), key)))
      .withColumn("shard", pmod(col("shuffle_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(Window.partitionBy("shard")
        .orderBy(col("shuffle_h"), key)).cast("long"))
  }

  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (Dedup.portableHash(concat_ws("|", lit("wsample"), key)) + 1)
      .cast("double") / lit(math.pow(2, 60))
    df.filter(weight > 0)
      .withColumn("ws_score_micros",
        graft.util.Exact.micros(log(u) / weight.cast("double")))
      .orderBy(col("ws_score_micros").desc, key)
      .limit(k)
  }

  /** Sample toward a TARGET MIXTURE — the domain-reweighting step of a
    * training-data recipe (cf. Xie et al. 2023, "DoReMi": domain
    * weights decide how much of each source enters the mix): given
    * per-stratum target weights and a total row budget, stratum `s`
    * keeps `rate_s = min(1, budget·w_s / n_s)` of its rows, chosen
    * deterministically by the portable hash. Oversubscribed strata
    * (fewer rows than their target share) keep everything — the
    * standard cap-at-availability rule; strata without a weight are
    * dropped (a recipe is also a domain filter).
    *
    * Scale shape: the per-stratum count table is #domains-sized — one
    * map-side-combinable agg, broadcast back onto the corpus; the
    * corpus itself never shuffles and the keep predicate rides in the
    * scan stage. Rates are computed in double precision on both
    * engines; keep weights exactly representable in binary (0.25,
    * 0.1875, …) when hash-exact oracle comparison matters. */
  def mixtureSample(df: DataFrame, key: Column, stratum: Column,
                    targetWeights: Map[String, Double], budget: Long,
                    den: Int = 1000000): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(targetWeights.values.forall(w => w >= 0 && w <= 1),
      "weights must be in [0, 1]")
    val w = targetWeights.foldLeft(lit(0.0)) { case (acc, (v, tw)) =>
      when(col("mx_stratum") === v, lit(tw)).otherwise(acc)
    }
    val rates = df.groupBy(stratum.as("mx_stratum"))
      .agg(count(lit(1)).as("mx_n"))
      .select(col("mx_stratum"),
        least(lit(den.toLong),
          floor(lit(budget.toDouble) * w * lit(den.toDouble) /
            col("mx_n").cast("double")).cast("long")).as("mx_num"))
      .filter(col("mx_num") > 0)
    df.join(broadcast(rates), stratum === col("mx_stratum"))
      .filter(coord("mixture", key, den) < col("mx_num"))
      .drop("mx_stratum", "mx_num")
  }

  /** Temperature-flattened mixing allocation (T5's §3.4.3 temperature
    * mixing / the multilingual-sampling rule of Conneau & Lample 2019):
    * split a row budget across strata proportionally to n_s^τ — τ < 1
    * upweights rare domains — with EXACT integer apportionment by the
    * largest-remainder (Hamilton) method: base_s = ⌊B·x_s / X⌋, then
    * the L = B − Σ base largest remainders get one extra (ties to the
    * smaller stratum label). x_s = micros(n_s^τ) is the only FP step,
    * snapped once; the apportionment itself is integer division and an
    * integer remainder rank — bit-reproducible, and Σ alloc = B always.
    *
    * alloc_s may exceed n_s for rare strata: that IS the temperature
    * semantics (rare domains repeat for multiple epochs — cf.
    * data-constrained scaling); cap at availability downstream if
    * repeats are unwanted.
    *
    * Scale: everything after the one corpus-sized count agg is
    * #strata-sized, including the remainder-rank window. */
  def temperatureAllocation(df: DataFrame, stratum: Column, budget: Long,
                            tau: Double): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val x = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n"))
      .select(col("stratum"), col("n"),
        graft.util.Exact.micros(pow(col("n").cast("double"), lit(tau)))
          .as("x"))
    val tot = x.agg(sum("x").as("xt"))
    // budget·x in DECIMAL(38,0): x is micros(n^τ) (up to ~1e6·n^τ), so a
    // production-scale token budget would overflow the LongType product
    // silently with ANSI off; decimal keeps base/rem exact at any scale
    // (div on decimals is still integral division → base stays BIGINT)
    val based = x.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n"),
        expr(s"CAST($budget AS DECIMAL(38,0)) * x div xt").as("base"),
        pmod(lit(budget).cast("decimal(38,0)") * col("x"), col("xt"))
          .as("rem"))
    val leftover = based.agg((lit(budget) - sum("base")).as("lft"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("stratum"))
    based.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(leftover))
      .select(col("stratum"), col("n"),
        (col("base") + when(col("rk") <= col("lft"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Group-stable split label ("train"/"val"/"test") from the key's
    * hash: the same key always gets the same label, so splitting by
    * user/domain/doc keeps correlated rows on one side of the eval
    * boundary. Percents are out of 100; test gets the remainder. */
  def splitLabel(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split $trainPct/$valPct")
    val c = coord("split", key, 100)
    when(c < trainPct, "train")
      .when(c < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Balanced (exactly-k-per-group) deterministic sample: every group
    * contributes its min(k, n) hash-smallest rows — the class-balanced
    * subsample of training pipelines (rate-based sampling leaves group
    * sizes proportional; this EQUALIZES them), reproducible across
    * runs and partitionings because rank order is (hash, key), never
    * arrival order. The rank-k filter plans WindowGroupLimit, so each
    * group is pre-pruned to k rows BEFORE the full sort would happen.
    * Adds `rank` (1-based within the group). */
  def balancedSample(df: DataFrame, groups: Seq[String], key: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groups.map(col): _*)
      .orderBy(coord("balance", key, 1 << 30), key)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}

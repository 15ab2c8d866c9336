package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan,
  * Albert & Kumara 2007, "Near linear time algorithm to detect
  * community structures in large-scale networks") — the standard
  * near-linear community primitive for link-graph analysis (the
  * reference's linkgraph/pagerank tier surfaces per-page authority;
  * communities surface per-CLUSTER structure: mirror groups, site
  * families, topical neighborhoods).
  *
  * Determinism (the paper's coin-flip tie rule is replaced, same spirit
  * as Coloring's token protocol):
  *  - every vertex votes for its own current label once (the common
  *    self-vote damping, which also kills the classic bipartite
  *    oscillation), each neighbor votes once;
  *  - new label = the most-voted label, ties to the SMALLEST label.
  * Fixed `rounds` supersteps, so the whole run is ONE lazy plan that a
  * SQL oracle can unroll round for round (zero driver actions).
  *
  * Superstep shape — identical scaling posture to PageRank's: one join
  * of the label table against the staticly-partitioned edge table
  * (shuffle ∝ labels, edges never move after the one-time layout), one
  * (id, lab)-keyed count (map-side combinable), one id-keyed argmax via
  * `max(struct(cnt, -lab))` — an ordinary hash-agg, NOT a window, so no
  * per-group sort anywhere. Lazy `localCheckpoint` generations bound
  * the plan depth exactly as in PageRank/Components.
  */
object Communities {

  /** Per-vertex community labels after `rounds` synchronous LPA steps.
    *
    * @param edges undirected edges, one row per (src, dst) pair in
    *              either orientation; symmetrized internally.
    * @return (id, community) — community = the elected label, which by
    *         the min-tie rule is always some member's vertex id.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // Lazy checkpoint: the symmetric edge table materializes once at
    // action time and every superstep generation reuses its blocks —
    // the KCore pattern, keeping the whole run a single lazy plan.
    // Partitioned AND sorted by the join key BEFORE the checkpoint
    // (LogicalRDD carries both through): each round's sort-merge join
    // then re-shuffles/re-sorts only the V-row label side — without
    // this, distinct's (src, dst) partitioning forced a full 2E-row
    // edge exchange + sort EVERY round (measured 5.5 → 3.5 s on q82's
    // 1M-edge graph at sf0.1).
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(false)

    val init = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
      .localCheckpoint(false)

    // Delegated to the generic BSP facade with fixed rounds (earlyStop
    // off → zero driver actions, one lazy plan): every vertex stays
    // active every round (`changed` = true — LPA is dense by nature),
    // so the facade's frontier filter folds away to the full table.
    Iterate.run(
      init,
      sendMsg = lab => und
        .join(lab.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("lab"))
        .unionAll(lab.select(col("id"), col("lab"))), // self-vote
      mergeMsg = raw => {
        // Lexicographic argmax (more votes wins, then smaller label)
        // as ONE packed decimal — max(struct(cnt, -lab)) planned as
        // SortAggregate (struct buffers are not HashAggregate-mutable),
        // i.e. a full sort of the vote stream with interpreted struct
        // comparisons EVERY round. v = cnt·2⁶³ + (2⁶³−1−lab) is
        // strictly monotone in the same order and exact (cnt ≤ V,
        // lab < 2⁶² ⇒ v < 2¹²⁶ < 10³⁸), so the elected label is
        // bit-identical and the agg is a codegen'd HashAggregate.
        val m = lit(new java.math.BigDecimal("9223372036854775808"))
          .cast("decimal(38,0)") // 2^63
        raw
          .groupBy("id", "lab").agg(count(lit(1)).as("cnt"))
          .groupBy("id")
          .agg(max(col("cnt").cast("decimal(38,0)") * m +
            (lit(Long.MaxValue) - col("lab")).cast("decimal(19,0)"))
            .as("w"))
          .select(col("id"),
            (lit(Long.MaxValue).cast("decimal(19,0)") - pmod(col("w"), m))
              .cast("long").as("lab"))
      },
      vprog = (_, newLab) => newLab.withColumn("changed", lit(true)),
      maxRounds = rounds,
      earlyStop = false)
      .select(col("id"), col("lab").as("community"))
  }

  /** Newman modularity of a vertex→community assignment over an
    * undirected graph — the quality score that turns community
    * detection from "some labels" into a measurable signal (compare
    * LPA round counts, compare against a null partition):
    *   Q = Σ_c [ m_c/m − (d_c/2m)² ]
    *     = Σ_c (4·m·m_c − d_c²) / (4m²)
    * with m = #undirected edges, m_c = intra-community edges, d_c =
    * Σ degree over c's members. The second form is EXACT integer
    * arithmetic end-to-end (DECIMAL(38,0) sums); the single final
    * divide runs on bit-identical operands, so the micros snap is
    * engine-portable.
    *
    * Shape at scale: degrees = one edge-keyed agg; intra-edges = two
    * label joins against the (broadcastable-when-small) label table +
    * one agg; community rollup = |communities| rows. No window, no
    * all-pairs anything. One summary row out.
    *
    * @param edges  one row per undirected edge (either orientation,
    *               no duplicates — the [[labelPropagation]] input
    *               contract after its internal symmetrization).
    * @param labels (id, community) covering every endpoint.
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val e = edges.select(col("src"), col("dst"))
    // degree counts both orientations; distinct input rows mean each
    // undirected edge contributes 1 to both endpoints
    val deg = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val lab = labels.select(col("id"), col("community"))
    val dc = deg.join(lab, "id")
      .groupBy("community").agg(sum(col("deg").cast(dec)).as("d_c"))
    val intra = e
      .join(lab.withColumnRenamed("id", "src")
        .withColumnRenamed("community", "c_src"), Seq("src"))
      .join(lab.withColumnRenamed("id", "dst")
        .withColumnRenamed("community", "c_dst"), Seq("dst"))
      .groupBy(col("c_src").as("community"))
      .agg(sum(when(col("c_src") === col("c_dst"), 1L).otherwise(0L))
        .cast(dec).as("m_c"))
    val m = e.agg(count(lit(1)).cast(dec).as("m"))
    val perC = dc.join(intra, Seq("community"), "left")
      .na.fill(0, Seq("m_c"))
      .crossJoin(m)
      .select(((lit(4).cast(dec) * col("m") * col("m_c")) -
        col("d_c") * col("d_c")).as("num"), col("m"))
    perC.groupBy()
      .agg(sum("num").as("q_num"), max("m").as("m"),
        count(lit(1)).as("n_communities"))
      .select(
        col("m").cast("long").as("m"),
        col("n_communities"),
        graft.util.Exact.micros(col("q_num").cast("double") /
          (lit(4).cast("decimal(38,0)") * col("m") * col("m"))
            .cast("double")).as("q_micros"))
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by min-label propagation — the clustering step
  * of a dedup pipeline (near-dup PAIRS → duplicate GROUPS with one
  * canonical member). Converges in O(diameter) rounds (dedup components
  * are near-cliques, so a handful).
  *
  * Scale design:
  *  - **delta-frontier propagation**: round k only sends labels that
  *    changed in round k-1. Bit-identical to full propagation (if a
  *    neighbour's label last changed in round j < k-1, its value already
  *    reached us in round j+1 and labels only decrease), but the edge
  *    join shrinks with the frontier instead of staying O(V) per round —
  *    at 100 TB most labels settle in 2-3 rounds and later rounds touch
  *    only the shrinking boundary.
  *  - the input pair pipeline (often an expensive minhash near-dup job)
  *    is persisted and materialized ONCE before the forward+reverse
  *    union references it twice.
  *  - lazy `localCheckpoint` per generation keeps the logical plan
  *    constant-size; with `earlyStop = false` the fixed round count
  *    builds one lazy plan with zero extra driver actions (the shape
  *    the unrolled SQL oracle checks).
  */
object Components {

  /** edges: (a, b) undirected pairs. Returns (id, component) where
    * component = min id reachable (within `maxRounds` hops).
    *
    * NOTE: this is an algorithm entry point, not a lazy operator — it
    * eagerly materializes its input once up front (the union below
    * references the pair pipeline twice, and Spark re-executes
    * duplicated plan subtrees; for a minhash near-dup input that double
    * run costs more than the whole propagation). */
  def run(edges: DataFrame, maxRounds: Int = 20,
          earlyStop: Boolean = true): DataFrame = {
    // Materialize the caller's pair pipeline exactly once: the union
    // below references it twice and Spark does not dedupe common plan
    // subtrees, so an unmaterialized upstream would run twice.
    val pairs = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    // Hash-partitioned by the join key, SORTED by it, and cached in that
    // layout (InMemoryRelation preserves both): each propagation round
    // then shuffles + sorts only the frontier — the edge table is never
    // re-shuffled nor re-sorted by the per-round sort-merge join.
    // Partition-count law as in PageRank: ~128k undirected edges per
    // partition between 4 and the cluster parallelism.
    val p = GraphUtil.partitionLaw(2 * nPairs, edges.sparkSession)
    val und = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .repartition(p, col("src"))
      .sortWithinPartitions("src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val init = und.select(col("src").as("id"))
      .distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(false)

    // Delegated to the generic BSP facade (round 0 frontier = every
    // vertex — its own label is "news"): one join + one checkpoint per
    // round; `changed` marks the next frontier so it is a free
    // projection of the same generation, and only frontier labels
    // travel over edges (min per receiver).
    Iterate.run(
      init,
      sendMsg = frontier => frontier
        .join(und.withColumnRenamed("src", "id"), Seq("id"))
        .select(col("dst").as("id"), col("component").as("cand")),
      mergeMsg = _.groupBy("id").agg(min("cand").as("cand")),
      vprog = (labels, msgs) => labels.join(msgs, Seq("id"), "left")
        .select(col("id"),
          when(col("cand") < col("component"), col("cand"))
            .otherwise(col("component")).as("component"),
          coalesce(col("cand") < col("component"), lit(false)).as("changed")),
      maxRounds = maxRounds,
      earlyStop = earlyStop)
  }
}

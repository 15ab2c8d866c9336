package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by min-label propagation — the clustering step
  * of a dedup pipeline (near-dup PAIRS → duplicate GROUPS with one
  * canonical member). Each round every vertex takes the minimum label
  * among itself and its neighbours; converges in O(diameter) rounds
  * (dedup components are near-cliques, so a handful).
  *
  * Same loop discipline as the other iterative operators: lazy
  * `localCheckpoint` per generation, optional fixed round count for a
  * fully-lazy single plan (used by the oracle-checked query).
  */
object Components {

  /** edges: (a, b) undirected pairs. Returns (id, component) where
    * component = min id reachable (within `maxRounds` hops). */
  def run(edges: DataFrame, maxRounds: Int = 20,
          earlyStop: Boolean = true): DataFrame = {
    val und = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = und.select(col("src").as("id"))
      .distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(false)

    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val next = labels
        .unionByName(und
          .join(labels.withColumnRenamed("id", "dst")
            .withColumnRenamed("component", "nlbl"), Seq("dst"))
          .select(col("src").as("id"), col("nlbl").as("component")))
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(false)
      if (earlyStop) {
        val changed = next
          .join(labels.withColumnRenamed("component", "prev"), Seq("id"))
          .filter(col("component") < col("prev"))
          .limit(1).count()
        if (changed == 0) done = true
      }
      labels = next
      round += 1
    }
    labels
  }
}

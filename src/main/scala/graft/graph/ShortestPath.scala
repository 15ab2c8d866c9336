package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Single-source shortest path — Bellman-Ford relaxation as a DataFrame
  * loop (reference G9, `shortestpath/path.go:145-197`: min-cost message
  * relax until no vertex improves; negative weights rejected).
  *
  * Distances are LongType so results are exact (and cross-engine
  * comparable). Each round is one shuffle (`groupBy(id).min`): the
  * frontier of known distances joins the edge table, candidate
  * distances union the previous state, and min wins. Vertices never
  * reached are absent from the result (infinite distance).
  */
object ShortestPath {

  /** edges: (src, dst, w: long ≥ 0). Runs `maxHops` relaxation rounds
    * (Bellman-Ford converges in ≤ |V|-1; callers bound it).
    *
    * With `earlyStop = false` the loop builds ONE lazy plan — zero
    * driver actions until the caller consumes the result (right for
    * small fixed hop counts); with `earlyStop = true` each round pays
    * one action to detect the fixed point and stop. */
  def run(edges: DataFrame, sourceId: String, maxHops: Int,
          earlyStop: Boolean = true, checkpointEvery: Int = 8): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val spark = edges.sparkSession
    import spark.implicits._

    var dist = Seq((sourceId, 0L)).toDF("id", "dist")
      .localCheckpoint(false)
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      val relaxed = dist
        .join(e.withColumnRenamed("src", "id"), Seq("id"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      // Lazy localCheckpoint: constant-size plan per round (the union
      // references `dist` twice — unchecked, the plan doubles per hop).
      val next = dist.union(relaxed)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint(false)
      if (earlyStop) {
        // Converged when no distance improved and no vertex appeared.
        val changed = next.join(dist.withColumnRenamed("dist", "prev"),
            Seq("id"), "left")
          .filter(col("prev").isNull || col("dist") < col("prev"))
          .limit(1).count()
        if (changed == 0) done = true
      }
      dist = next
      hop += 1
    }
    dist
  }
}

package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Semantic deduplication (SemDeDup, Abbas et al. 2023 — "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication"):
  * cluster the embedding space with a coarse quantizer, then inside each
  * cluster drop every vector that has a semantically near-identical
  * neighbor (cosine ≥ τ), keeping one canonical representative per
  * near-dup set.
  *
  * Keep rule: a vector is dropped iff some SMALLER-id vector of its
  * cluster is within τ. The paper keeps the member farthest from the
  * centroid; smallest-id is deterministic, engine-portable, and keeps
  * exactly one member of every near-dup chain (the minimum), which is
  * what the training-data pipeline needs.
  *
  * Scale shape: the pairwise cosine work is CLUSTER-LOCAL only — the
  * join is keyed on the cluster id, never the corpus-quadratic
  * all-pairs. Σ|cluster|² is the paper's own cost model; cluster count
  * grows with the corpus so the per-cluster population stays bounded
  * (k ≈ N/targetClusterSize). Inherent recall boundary, also the
  * paper's: a near-dup pair split across two clusters is not examined —
  * raise k (smaller clusters) for cost, lower it for recall.
  */
object SemDedup {

  /** Keep/drop decision per vector: (idCol, cluster, keep).
    * `centroids`: (cluster: long, centroid: array<double>) — fixed or
    * from [[Ivf.build]]; assignment is [[Ivf.assign]] (min squared L2,
    * ties to the smallest cluster id, one codegen'd expression).
    */
  def prune(emb: DataFrame, centroids: DataFrame, minCos: Double,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    // the assignment feeds both sides of the pair join AND the final
    // projection — persist or the nearest-centroid scan runs 3x
    val assigned = Ivf.assign(emb, centroids, idCol, vecCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val l = assigned.select(col("cluster"), col(idCol).as("a"),
      col(vecCol).as("va"))
    val r = assigned.select(col("cluster"), col(idCol).as("b"),
      col(vecCol).as("vb"))
    val dropped = l.join(r, Seq("cluster"))
      .filter(col("a") < col("b") &&
        Similarity.cosine(col("va"), col("vb")) >= minCos)
      .select(col("b").as(idCol))
      .distinct()
    assigned.select(col(idCol), col("cluster"))
      .join(dropped.withColumn("hit", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("hit").isNull.as("keep"))
  }
}

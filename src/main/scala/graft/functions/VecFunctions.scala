package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-facing vector functions backed by native codegen'd Catalyst
  * expressions (see `org.apache.spark.sql.graftvec.DotProductFF`). */
object VecFunctions {
  /** Codegen'd float-vector dot product (double accumulation,
    * left-to-right — bit-identical to the lambda fold). */
  def dotFF(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.VecBridge.dotFF(a, b)

  /** Whole sign-LSH signature (one bit per hyperplane) as a single
    * codegen'd expression; bit-identical to per-plane fold projections
    * but one small loop regardless of plane count. */
  def signProjection(v: Column, matrix: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftvec.VecBridge.signProjection(v, matrix)

  /** Nearest-centroid id by squared L2 (ties to earliest id), one
    * codegen'd expression; the IVF Lloyd/assign hot path. */
  def nearestCentroid(v: Column, clusterIds: Array[Long],
                      centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftvec.VecBridge
      .nearestCentroid(v, clusterIds, centroids)

  /** Cosine similarity on float vectors via the native dot. */
  def cosineFF(a: Column, b: Column): Column =
    dotFF(a, b) / (sqrt(dotFF(a, a)) * sqrt(dotFF(b, b)))
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Exact

/** Adamic-Adar link prediction / item-item similarity over an
  * incidence list (Adamic & Adar 2003; the inverse-log-frequency
  * weighting of item-based collaborative filtering).
  *
  * Input is the bipartite (mid, item) incidence — "order contains
  * part", "user follows account", or, for a unipartite graph, the
  * symmetrized adjacency (x, nbr) with x as mid. For every item pair
  * sharing a mid: score(a, b) = Σ_mid 1 / ln(deg(mid)) — common
  * neighbors discounted by how promiscuous the shared neighbor is.
  *
  * Hub suppression is part of the operator contract: mids with degree
  * > maxMidDegree are dropped BEFORE wedge enumeration (a mass hub
  * connects everything to everything at quadratic cost while its
  * 1/ln(deg) weight tends to zero — the standard production rule in
  * friend-of-friend / co-purchase recommenders). The oracle applies
  * the same cap, so results are exact under it.
  *
  * Shape: degree table (one hash-agg) → semi-join filter → self
  * equi-join on mid (wedge fan-out ≤ maxMidDegree per mid, so the
  * candidate volume is Σ min(deg, cap)² — linear in |incidence| with
  * the cap as knob) → pair-keyed hash-agg → TakeOrderedAndProject
  * top-N. Per-wedge weights micros-snap before the integer sum, so
  * scores are engine-exact.
  */
object LinkPrediction {

  /** Top-N item pairs by Adamic-Adar score:
    * (u, v, common, aa_micros), u < v, ordered by (score desc, u, v). */
  def adamicAdar(incidence: DataFrame, maxMidDegree: Long,
                 topN: Int, midCol: String = "mid",
                 itemCol: String = "item"): DataFrame = {
    require(maxMidDegree >= 2, "wedge centers need degree >= 2")
    val inc = incidence.select(col(midCol).as("mid"), col(itemCol).as("item"))
    val deg = inc.groupBy("mid").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= maxMidDegree)
    val mids = inc.join(deg, "mid")
    val wedges = mids.as("a").join(mids.as("b"),
        col("a.mid") === col("b.mid") && col("a.item") < col("b.item"))
      .select(col("a.item").as("u"), col("b.item").as("v"),
        col("a.deg").as("mid_deg"))
    wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("common"),
        sum(Exact.micros(lit(1.0) / log(col("mid_deg").cast("double"))))
          .as("aa_micros"))
      .orderBy(col("aa_micros").desc, col("u"), col("v"))
      .limit(topN)
  }
}

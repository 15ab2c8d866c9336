package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronized Louvain move phase (Blondel et al. 2008 §2): every
  * vertex evaluates the modularity gain of joining each neighboring
  * community and moves to the best one. Comparing ΔQ across target
  * communities only needs the c-dependent numerators —
  *
  *   S(v, c) = 2m·k_{v,c} − k_v·(Σtot_c − [c = cur(v)]·k_v)
  *
  * (ΔQ scaled by 2m² and shifted by terms constant in c; the [c = cur]
  * correction removes v's own degree from its community total, i.e. the
  * standard "remove v, then re-insert" bookkeeping) — so the argmax +
  * move decision is exact integer arithmetic, engine-reproducible and
  * SQL-replayable. Ties break to the smaller community label.
  *
  * Synchronized semantics: all vertices decide on the PREVIOUS round's
  * labels (sequential Louvain is visit-order-dependent — unreplayable
  * distributed). Naive synchronized moves oscillate: two vertices (or
  * two communities) happily swap membership forever — the classic
  * failure the distributed-Louvain literature patches (Lu et al. 2015's
  * minimum-label heuristic; Sotera DGA's alternating constraint). We
  * use the alternating-direction rule: odd rounds may only move DOWN
  * (target label < current), even rounds only UP. Each round's move
  * set is then acyclic in label order — a swap needs one move in each
  * direction — and any down-up round pair can express an arbitrary
  * move, so convergence quality is preserved while every round stays
  * deterministic.
  *
  * Scale: one neighbor-label join (keyed on the edge endpoint), one
  * (vertex, community) hash-agg, one community-total hash-agg per
  * round; the 2m scalar rides as a broadcast one-row frame. No
  * all-pairs stage. Overflow headroom: S is bounded by 2m·deg_max —
  * past ~2^62 (m ≳ 10^12 with large hubs) the scaled gain needs
  * DECIMAL(38,0); at that point switch the two products to decimal,
  * the algebra is unchanged.
  */
object Louvain {

  /** One synchronized move round. `edges`: canonical undirected edge
    * list (src, dst), no duplicates, no self-loops. `labels`:
    * (id, lab) covering every endpoint. `allowUp = false` permits only
    * targets with smaller labels than the current community (plus
    * staying), `true` only larger. Returns the new (id, lab). */
  def moveRound(edges: DataFrame, labels: DataFrame,
                allowUp: Boolean): DataFrame = {
    val e2 = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val deg = e2.groupBy(col("src").as("id")).agg(count(lit(1)).as("k"))
    val m2 = edges.agg((count(lit(1)) * 2).as("m2"))
    val lab = labels.select(col("id"), col("lab"))
    val tot = lab.join(deg, "id")
      .groupBy(col("lab").as("c")).agg(sum("k").as("tot"))
    // edges from v into each neighboring community under OLD labels
    val kvc = e2
      .join(lab.select(col("id").as("dst"), col("lab").as("c")), "dst")
      .groupBy(col("src").as("id"), col("c"))
      .agg(count(lit(1)).as("kvc"))
    // candidate set = neighbor communities ∪ the current community
    // (kvc = 0 when v has no neighbor at home)
    val cand = kvc
      .unionByName(lab.select(col("id"), col("lab").as("c"),
        lit(0L).as("kvc")))
      .groupBy("id", "c").agg(sum("kvc").as("kvc"))
    val cur = lab.join(deg, "id") // id, lab (current), k
    cand.join(cur, "id")
      .filter(if (allowUp) col("c") >= col("lab")
              else col("c") <= col("lab"))
      .join(tot, "c").crossJoin(broadcast(m2))
      .select(col("id"),
        struct(
          (col("m2") * col("kvc") - col("k") *
            (col("tot") - when(col("c") === col("lab"), col("k"))
              .otherwise(lit(0L)))).as("s"),
          (-col("c")).as("nc")).as("sc"))
      .groupBy("id").agg(max(col("sc")).as("b"))
      .select(col("id"), (-col("b.nc")).as("lab"))
  }

  /** `rounds` synchronized move rounds from singleton communities,
    * alternating down/up (odd rounds move down). */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    var lab = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct().select(col("id"), col("id").as("lab"))
    for (r <- 1 to rounds)
      lab = moveRound(edges, lab, allowUp = r % 2 == 0)
    lab
  }
}

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
    core(e2,
      e2.groupBy(col("src").as("id")).agg(count(lit(1)).as("k")),
      e2.agg(count(lit(1)).as("m2")), // e2 holds both orientations = 2m
      labels, allowUp)
  }

  /** Round body over precomputed round-invariants (both-orientation
    * edge list, degrees, the 2m scalar). */
  private def core(e2: DataFrame, deg: DataFrame, m2: DataFrame,
                   labels: DataFrame, allowUp: Boolean): DataFrame = {
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
    * alternating down/up (odd rounds move down). Each generation is a
    * lazy localCheckpoint: moveRound references the previous labels
    * four times (totals, neighbor counts, candidates, current), so an
    * un-cut lineage re-executes every earlier round 4× per reference —
    * exponential in round count (the q228 A/B: 19.0 s lazy-chained vs
    * 4.1 s checkpointed at sf0.1 for two rounds). */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    // round-invariants computed once: e2 is the only consumer of the
    // caller's (possibly expensive) edge derivation, and deg/m2 read
    // the checkpointed e2, never the source again
    val e2 = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(false)
    val deg = e2.groupBy(col("src").as("id")).agg(count(lit(1)).as("k"))
      .localCheckpoint(false)
    val m2 = e2.agg(count(lit(1)).as("m2"))
    var lab = deg.select(col("id"), col("id").as("lab"))
    for (r <- 1 to rounds)
      lab = core(e2, deg, m2, lab, allowUp = r % 2 == 0)
        .localCheckpoint(false)
    lab
  }
}

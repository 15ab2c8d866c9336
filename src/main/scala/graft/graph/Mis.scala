package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal independent set via Luby's algorithm (Luby 1986, "A simple
  * parallel algorithm for the maximal independent set problem"),
  * deterministic variant: static per-vertex priorities from a 64-bit
  * hash of the id, ties broken by id, so the (priority, id) order is a
  * strict total order and reruns are bit-identical.
  *
  * Per round, over the still-undecided subgraph:
  *   - a vertex whose (prio, id) is strictly smaller than every
  *     undecided neighbor's joins the MIS (adjacent simultaneous joins
  *     are impossible under a strict total order);
  *   - a vertex seeing a freshly-joined MIS neighbor becomes dominated
  *     (this takes precedence over the local-minimum test);
  *   - decided vertices leave the active frontier, so message volume
  *     tracks the shrinking undecided boundary — expected O(log V)
  *     rounds.
  *
  * Expressed through the generic [[Iterate]] BSP facade (the third
  * algorithm to delegate there, after connected components and label
  * propagation): the whole round is one sendMsg/mergeMsg/vprog triple,
  * and the facade supplies lineage truncation, sparse activation and
  * vote-to-halt.
  *
  * Correctness is characterized by two SQL-checkable invariants —
  * independence (no edge inside the set) and maximality (every
  * non-member has a member neighbor) — which is exactly what the q147
  * oracle asserts, mirroring the q13 coloring properness pattern.
  */
object Mis {

  /** @param edges directed pairs (src, dst); symmetrized internally.
    *              Self-loops must be absent — a self-looped vertex can
    *              neither join (it is its own neighbor) nor be
    *              dominated, so the MIS is undefined for it.
    * @return (id, in_mis) for every endpoint, deterministic. */
  def run(edges: DataFrame, maxRounds: Int = 200): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(false)

    // status: 0 = undecided, 1 = in MIS, 2 = dominated. `fresh` marks a
    // vertex that decided THIS round (a fresh MIS member must stay
    // active one more round to dominate its neighbors).
    val init = sym.select(col("src").as("id")).distinct()
      .select(col("id"), xxhash64(col("id")).as("prio"),
        lit(0).as("status"), lit(false).as("fresh"))
      .localCheckpoint(false)

    val result = Iterate.run(
      init = init,
      sendMsg = active => sym
        .join(active.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          when(col("status") === 0,
            struct(col("prio").as("p"), col("src").as("i"))).as("cand"),
          (col("status") === 1 && col("fresh")).as("mis_nbr")),
      mergeMsg = msgs => msgs.groupBy("id").agg(
        min(col("cand")).as("min_nbr"),
        max(col("mis_nbr")).as("any_mis")),
      vprog = (state, msgs) => {
        val j = state.join(msgs, Seq("id"), "left")
        val me = struct(col("prio").as("p"), col("id").as("i"))
        val next = when(col("status") =!= 0, col("status"))
          .when(coalesce(col("any_mis"), lit(false)), lit(2))
          .when(col("min_nbr").isNull || me < col("min_nbr"), lit(1))
          .otherwise(lit(0))
        j.select(col("id"), col("prio"), next.as("status"),
            (col("status") === 0 && next =!= 0).as("fresh"),
            (next === 0 || (col("status") === 0 && next =!= 0))
              .as("changed"))
      },
      maxRounds = maxRounds)

    result.select(col("id"), (col("status") === 1).as("in_mis"))
  }
}

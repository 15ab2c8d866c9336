package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy graph coloring with randomized-token symmetry breaking —
  * reference G10 (`color/color.go:133-200`): each round, every uncolored
  * vertex whose token is highest among its *uncolored* neighbours picks
  * the minimum color unused by any neighbour; undirectedness is imposed
  * by inserting reverse edges (`color.go:90-98`); pre-colored vertices
  * are honoured (`color.go:85-87`).
  *
  * Sparse-activation formulation (the BSP vote-to-halt analogue, and the
  * reason this scales): the loop never re-touches settled vertices —
  *  - `active` edges connect two *uncolored* vertices; every round they
  *    shrink by anti-join against the newly colored set;
  *  - each uncolored vertex accumulates the colors of its settled
  *    neighbours in a `forbidden` set, so messages flow only from newly
  *    colored vertices: total message volume is O(E) over the whole run,
  *    not O(E · rounds);
  *  - one driver action per round (the winner count);
  *  - every generation is truncated with a lazy `localCheckpoint` so the
  *    logical plan stays constant-size across rounds.
  * Tokens are deterministic (`xxhash64`, ties broken by id), so the
  * coloring is reproducible and always progresses.
  */
object Coloring {

  /** vertices: (id [, color]) — optional pre-colored rows; edges:
    * (src, dst), treated as undirected. Returns (id, color). */
  def run(vertices: DataFrame, edges: DataFrame,
          maxRounds: Int = 1000, foldEvery: Int = 8): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

    val hasColor = vertices.columns.contains("color")
    val init = vertices
      .select(col("id"),
        (if (hasColor) col("color") else lit(null)).cast("int").as("color"))
      .withColumn("token", abs(xxhash64(col("id"))))

    // mex(sorted distinct colors): fold left — acc+1 while acc == next.
    def mex(sortedColors: org.apache.spark.sql.Column) =
      aggregate(sortedColors, lit(0),
        (acc, c) => when(c === acc, acc + 1).otherwise(acc))

    val emptyInts = array().cast("array<int>")
    val preColored = init.filter(col("color").isNotNull)
      .select("id", "color")

    var uncolored = init.filter(col("color").isNull)
      .join(und
        .join(preColored.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(sort_array(collect_set(col("color"))).as("forbidden")),
        Seq("id"), "left")
      .select(col("id"), col("token"),
        coalesce(col("forbidden"), emptyInts).as("forbidden"))
      .localCheckpoint(false)

    var active = und
      .join(uncolored.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(uncolored.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .localCheckpoint(false)

    var remaining = uncolored.count()
    var doneParts: List[DataFrame] = List(preColored)
    var round = 0

    while (remaining > 0 && round < maxRounds) {
      // Winner rule: (token, id) beats every uncolored neighbour's.
      val nbrMax = active
        .join(uncolored.select(col("id").as("dst"),
          col("token").as("n_token")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(max(struct(col("n_token"), col("dst"))).as("max_nbr"))

      val winners = uncolored.join(nbrMax, Seq("id"), "left")
        .filter(col("max_nbr").isNull ||
          struct(col("token"), col("id")) > col("max_nbr"))
        .select(col("id"), mex(col("forbidden")).as("color"))
        .localCheckpoint(false)
      val nWon = winners.count() // the round's single driver action

      // Colors won this round flow into still-uncolored neighbours.
      val msgs = active
        .join(winners.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(collect_set(col("color")).as("new_forbidden"))

      uncolored = uncolored
        .join(winners.select(col("id")), Seq("id"), "left_anti")
        .join(msgs, Seq("id"), "left")
        .select(col("id"), col("token"),
          sort_array(array_union(col("forbidden"),
            coalesce(col("new_forbidden"), emptyInts))).as("forbidden"))
        .localCheckpoint(false)
      active = active
        .join(winners.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(winners.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .localCheckpoint(false)

      doneParts ::= winners
      if (doneParts.length >= foldEvery) {
        // keep the final union shallow: fold accumulated winner parts
        doneParts = List(doneParts.reduce(_ unionByName _)
          .localCheckpoint(false))
      }
      remaining -= nWon
      round += 1
    }
    doneParts.reduce(_ unionByName _).select("id", "color")
  }
}

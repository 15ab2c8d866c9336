package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy graph coloring with randomized-token symmetry breaking —
  * reference G10 (`color/color.go:133-200`): each round, every uncolored
  * vertex whose token is highest among its uncolored neighbours picks the
  * minimum color unused by any neighbour; undirectedness is imposed by
  * inserting reverse edges (`color.go:90-98`); pre-colored vertices are
  * honoured (`color.go:85-87`).
  *
  * Tokens are deterministic (`xxhash64(id)`), so the full coloring is
  * reproducible. Each round is two shuffles (neighbour max-token and
  * neighbour color-set aggregations); the winner set is chosen entirely
  * with DataFrame ops — the only non-codegen piece is the tiny
  * `mex` (minimum excluded color) computed over the neighbour color
  * array with `aggregate`, still a Catalyst expression.
  */
object Coloring {

  /** vertices: (id [, color]) — optional pre-colored rows; edges:
    * (src, dst), treated as undirected. Returns (id, color). */
  def run(vertices: DataFrame, edges: DataFrame,
          maxRounds: Int = 1000, checkpointEvery: Int = 8): DataFrame = {
    val undirected = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val hasColor = vertices.columns.contains("color")
    var state = vertices
      .select(col("id"),
        (if (hasColor) col("color") else lit(null)).cast("int").as("color"))
      .withColumn("token", abs(xxhash64(col("id"))))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var round = 0
    var remaining = state.filter(col("color").isNull).limit(1).count()
    while (remaining > 0 && round < maxRounds) {
      val nbr = undirected
        .join(state.select(col("id").as("dst"), col("color").as("n_color"),
          col("token").as("n_token")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(
          max(when(col("n_color").isNull, col("n_token"))).as("max_unc_token"),
          sort_array(collect_set(col("n_color"))).as("n_colors"))

      // mex(sorted distinct colors): fold left — acc+1 while acc == next.
      val mex = aggregate(col("n_colors"), lit(0),
        (acc, c) => when(c === acc, acc + 1).otherwise(acc))

      val next0 = state.join(nbr, Seq("id"), "left")
        .withColumn("color",
          when(col("color").isNotNull, col("color"))
            .when(col("max_unc_token").isNull ||
                  col("token") > col("max_unc_token"),
              coalesce(mex, lit(0)))
            .otherwise(lit(null)))
        .select("id", "color", "token")
      val next = (if ((round + 1) % checkpointEvery == 0)
                    next0.localCheckpoint()
                  else next0).persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before unpersisting the previous state
      state.unpersist()
      state = next
      round += 1
      remaining = state.filter(col("color").isNull).limit(1).count()
    }
    undirected.unpersist()
    state.select("id", "color")
  }
}

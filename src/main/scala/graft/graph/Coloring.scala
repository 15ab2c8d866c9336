package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy graph coloring with randomized-token symmetry breaking —
  * reference G10 (`color/color.go:133-200`): each round, every uncolored
  * vertex whose (token, id) is highest among its *uncolored* neighbours
  * picks the minimum color unused by any neighbour; undirectedness is
  * imposed by inserting reverse edges (`color.go:90-98`); pre-colored
  * vertices are honoured (`color.go:85-87`).
  *
  * Scale design:
  *  - sparse activation: settled vertices are never re-touched — their
  *    colors flow once into neighbours' `forbidden` sets (O(E) total
  *    message volume over the whole run);
  *  - the undirected edge table is cached once; per-round frames are
  *    derived from it by semi-joins against the shrinking uncolored set
  *    (no per-round edge materialization);
  *  - one driver action per round; generations are truncated with lazy
  *    `localCheckpoint` so the logical plan stays constant-size;
  *  - tail cutoff: Luby-style rounds shed a constant fraction per round,
  *    so after O(log V) rounds a tiny residual subgraph pays full
  *    cluster-job latency per round — once it fits comfortably on the
  *    driver (`localFinishThreshold` rows) the SAME round rule runs
  *    in-memory, producing bit-identical colors.
  * Tokens are deterministic (`xxhash64`, ties broken by id), so the
  * coloring is reproducible and always progresses.
  */
object Coloring {

  /** vertices: (id [, color]) — optional pre-colored rows; edges:
    * (src, dst), treated as undirected. Returns (id, color).
    *
    * The driver-side tail finish engages only when BOTH the residual
    * vertex count and the residual edge count fit their thresholds — a
    * dense residual can carry far more edges than vertices, and the
    * collect is bounded by the larger of the two. */
  def run(vertices: DataFrame, edges: DataFrame,
          maxRounds: Int = 1000,
          localFinishThreshold: Long = 150000,
          localFinishEdgeThreshold: Long = 2000000,
          foldEvery: Int = 8): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._

    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

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

    // Active edges: both endpoints uncolored, annotated with the dst's
    // token — shrinks monotonically by anti-join against each round's
    // winners, so per-round work tracks the live subgraph, not |E|.
    var active = und
      .join(uncolored.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(uncolored.select(col("id").as("dst"),
        col("token").as("n_token")), Seq("dst"))
      .localCheckpoint(false)

    var remaining = uncolored.count()
    var doneParts: List[DataFrame] = List(preColored)
    var round = 0
    var finishLocally = false

    // Residual edges with both endpoints still uncolored — `active`
    // tracks exactly this set, so the bound is one cheap count of an
    // already-materialized frame (no extra joins).
    def residualSmallEnough(): Boolean =
      remaining <= localFinishThreshold &&
        active.count() <= localFinishEdgeThreshold

    while (remaining > 0 && round < maxRounds && !finishLocally) {
      if (residualSmallEnough()) { finishLocally = true }
      else {
      val nbrMax = active
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
        .join(winners.withColumnRenamed("id", "wdst"),
          active("dst") === col("wdst"))
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
      if (doneParts.length >= foldEvery)
        doneParts = List(doneParts.reduce(_ unionByName _)
          .localCheckpoint(false))
      remaining -= nWon
      round += 1
      if (sys.env.contains("GRAFT_LOOP_DEBUG"))
        println(s"[coloring] round=$round won=$nWon remaining=$remaining")
      }
    }

    if (remaining > 0) {
      // ---- driver-side finish: same rule, in memory, bit-identical ----
      val vs = uncolored.select("id", "token", "forbidden")
        .as[(String, Long, Seq[Int])].collect()
      val ids = vs.map(_._1).toSet
      val es = und
        .join(uncolored.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(uncolored.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst").as[(String, String)].collect()
      if (sys.env.contains("GRAFT_LOOP_DEBUG"))
        println(s"[coloring] local finish: ${vs.length} vertices, " +
          s"${es.length} edges")

      val token = vs.map(v => v._1 -> v._2).toMap
      val forbidden = scala.collection.mutable.Map(
        vs.map(v => v._1 -> scala.collection.mutable.Set(v._3: _*)): _*)
      val nbrs = scala.collection.mutable.Map[String, List[String]]()
        .withDefaultValue(Nil)
      es.foreach { case (s, d) => nbrs(s) = d :: nbrs(s) }
      val unset = scala.collection.mutable.Set(ids.toSeq: _*)
      val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
      var guard = 0
      while (unset.nonEmpty && guard < maxRounds) {
        val winners = unset.iterator.filter { v =>
          nbrs(v).iterator.filter(unset.contains).forall { u =>
            val c = java.lang.Long.compare(token(v), token(u))
            c > 0 || (c == 0 && v > u)
          }
        }.toVector
        winners.foreach { v =>
          val f = forbidden(v)
          var c = 0
          while (f.contains(c)) c += 1
          out += ((v, c))
          unset -= v
          nbrs(v).foreach(u => forbidden.get(u).foreach(_ += c))
        }
        guard += 1
      }
      doneParts ::= out.toSeq.toDF("id", "color")
    }
    doneParts.reduce(_ unionByName _).select("id", "color")
  }
}

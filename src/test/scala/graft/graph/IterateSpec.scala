package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The generic BSP facade must support an algorithm the library does NOT
  * ship — here BFS depth from a source — and the delegating algorithms
  * must keep their exact round-5 semantics. */
class IterateSpec extends SparkSpec {

  import spark.implicits._

  test("user-authored BFS depth via Iterate.run (sparse frontier)") {
    // 1 → 2 → 3 → 4, plus 1 → 3 shortcut; BFS depths: 1:0, 2:1, 3:1, 4:2.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
      .toDF("src", "dst").localCheckpoint(false)
    val verts = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id"))).distinct()
    val init = verts
      .withColumn("depth", when(col("id") === 1L, 0L).otherwise(lit(null)))
      .localCheckpoint(false)

    val out = Iterate.run(
      init,
      sendMsg = frontier => frontier.filter(col("depth").isNotNull)
        .join(edges, col("id") === col("src"))
        .select(col("dst").as("id"), (col("depth") + 1L).as("cand")),
      mergeMsg = _.groupBy("id").agg(min("cand").as("cand")),
      vprog = (st, msgs) => st.join(msgs, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("depth"), col("cand")).as("depth"),
          (col("depth").isNull && col("cand").isNotNull).as("changed")),
      maxRounds = 10)

    val depths = out.as[(Long, Option[Long])].collect().toMap
    assert(depths === Map(1L -> Some(0L), 2L -> Some(1L),
      3L -> Some(1L), 4L -> Some(2L)))
  }

  test("early stop halts before maxRounds on a settled graph") {
    val edges = Seq((1L, 2L)).toDF("src", "dst").localCheckpoint(false)
    val init = Seq((1L, 1L), (2L, 2L)).toDF("id", "component")
      .localCheckpoint(false)
    var rounds = 0
    val out = Iterate.run(
      init,
      sendMsg = f => { rounds += 1
        f.join(edges, col("id") === col("src"))
          .select(col("dst").as("id"), col("component").as("cand")) },
      mergeMsg = _.groupBy("id").agg(min("cand").as("cand")),
      vprog = (st, m) => st.join(m, Seq("id"), "left")
        .select(col("id"),
          when(col("cand") < col("component"), col("cand"))
            .otherwise(col("component")).as("component"),
          coalesce(col("cand") < col("component"), lit(false)).as("changed")),
      maxRounds = 100)
    assert(out.as[(Long, Long)].collect().toMap === Map(1L -> 1L, 2L -> 1L))
    assert(rounds <= 3, s"early stop should bound rounds, ran $rounds")
  }

  test("vprog without a changed column is rejected") {
    val init = Seq((1L, 1L)).toDF("id", "v").localCheckpoint(false)
    intercept[IllegalArgumentException] {
      Iterate.run(init,
        sendMsg = identity, mergeMsg = identity,
        vprog = (st, _) => st, maxRounds = 1)
    }
  }
}

package graft.graph

import graft.SparkSpec
import graft.sketch.Sketches
import org.apache.spark.sql.functions._

class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], hops: Int) =
    HyperBall.run(edges.toDF("src", "dst"), p = 5, hops = hops)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("balls grow monotonically and saturate at the diameter") {
    // directed path 1→2→3→4: diameter 3.
    val m = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), hops = 4)
    val sums = (0 to 4).map(t => m(t.toLong)._2)
    assert(sums.zip(sums.tail).forall { case (a, b) => a <= b })
    assert(sums(0) < sums(3))            // still growing up to the diameter
    assert(sums(3) == sums(4))           // saturated past it
    assert(m(0L)._1 == 4L)               // every vertex has a ball
  }

  test("on a strongly connected graph the saturated ball IS the vertex-set sketch") {
    // triangle, both directions: at hop >= 1 every ball = V.
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L))
    val m = run(tri, hops = 2)
    assert(m(1L) == m(2L))
    // parity with the shared single-set estimator on the same hash input
    val est = Sketches.hllDistinct(
        Seq(1L, 2L, 3L).toDF("id"), col("id").cast("string"), p = 5)
      .select("est_micros").head.getLong(0)
    assert(m(1L)._2 == 3 * est)
  }

  test("hop 0 estimates a singleton per vertex") {
    val m = run(Seq((1L, 2L), (3L, 4L)), hops = 1)
    assert(m(0L)._1 == 4L)
    // linear-counting estimate of 1 element with m=32 is ~1.016e6 micros
    assert(m(0L)._2 > 4 * 900000L && m(0L)._2 < 4 * 1200000L)
  }
}

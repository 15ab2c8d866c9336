package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def z(x: Long, y: Long, bits: Int = 3): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits).as("z"))
      .as[Long].head()

  test("zValue interleaves bits: dimension 0 gets the low lane") {
    // x=5 (101), y=3 (011) → z bits x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0
    // → 0b011011 = 27
    assert(z(5, 3) == 27L)
    assert(z(0, 0) == 0L)
    assert(z(7, 7) == 63L) // all six bit positions set
    assert(z(1, 0) == 1L && z(0, 1) == 2L) // lane assignment
  }

  test("zValue clusters both dimensions (quadrant locality)") {
    // All points of the low quadrant [0,4)×[0,4) sort before any point
    // of the high quadrant [4,8)×[4,8) — the property row-group
    // pruning relies on.
    val lowMax = (for { x <- 0L until 4; y <- 0L until 4 } yield z(x, y)).max
    val highMin = (for { x <- 4L until 8; y <- 4L until 8 } yield z(x, y)).min
    assert(lowMax < highMin)
  }

  test("zOrderBy plans a range exchange + partition-local sort") {
    val df = spark.range(1000).select(
      (col("id") % 32).as("a"), (col("id") % 17).as("b"))
    val p = Layout.zOrderBy(df, Seq(col("a"), col("b")), bits = 8,
        numPartitions = Some(4))
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"), p.take(2000))
    // Sort prints as `Sort [...], <global>, 0` — must be partition-local
    assert(p.contains("Sort"), p.take(2000))
    assert(p.contains(", false, 0"), "sort must be partition-local: " +
      p.linesIterator.filter(_.contains("Sort")).mkString("\n"))
    assert(!p.contains(", true, 0"), "no global sort allowed: " +
      p.linesIterator.filter(_.contains("Sort")).mkString("\n"))
  }

  test("zValue rejects layouts that overflow a long") {
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a"), col("b")), bits = 32)
    }
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SyntheticSourceSpec extends SparkSpec {

  private def load(rows: Long, slices: Int): DataFrame =
    spark.read.format("graft.sources.Synthetic")
      .option("rows", rows.toString).option("slices", slices.toString)
      .load()

  test("generates the full deterministic range") {
    val df = load(1000, 4)
    assert(df.count() == 1000L)
    val r = df.filter(col("id") === 7L).collect().head
    assert(r.getLong(1) == 7L * 48271L % 2147483647L)
    assert(r.getString(2) == "c" + (7L * 48271L % 2147483647L % 8))
  }

  test("id range pushdown prunes input PARTITIONS at planning time") {
    val full = load(80000, 8)
    assert(full.queryExecution.toRdd.getNumPartitions == 8)
    // [0, 20000) covers exactly slices 0 and 1 of 8 × 10000
    val pruned = load(80000, 8).filter(col("id") < 20000L)
    assert(pruned.queryExecution.toRdd.getNumPartitions == 2,
      pruned.queryExecution.executedPlan.toString)
    assert(pruned.count() == 20000L)
    // intersected bounds: [30000, 50000) → slices 3 and 4
    val mid = load(80000, 8)
      .filter(col("id") >= 30000L && col("id") < 50000L)
    assert(mid.queryExecution.toRdd.getNumPartitions == 2)
    assert(mid.count() == 20000L)
    // contradiction plans ZERO partitions, still answers correctly
    val none = load(80000, 8)
      .filter(col("id") >= 50000L && col("id") < 10000L)
    assert(none.queryExecution.toRdd.getNumPartitions == 0)
    assert(none.count() == 0L)
  }

  test("non-id filters stay Spark-side and still evaluate correctly") {
    val df = load(1000, 4).filter(col("val") % 2 === 0)
    // the source must not have claimed the val filter (it only accepts
    // id bounds), so Spark evaluates it post-scan
    val expected = (0L until 1000L)
      .count(id => Synthetic.valueOf(id) % 2 == 0)
    assert(df.count() == expected.toLong)
    assert(df.queryExecution.toRdd.getNumPartitions == 4, "no pruning")
  }

  test("column pruning reaches the reader's scan schema") {
    // DSv2 explain renders the PRUNED output right on the BatchScan
    // node: `BatchScan synthetic(1000)[id#N]` — val/cat never planned.
    val p = load(1000, 2).select("id")
      .queryExecution.executedPlan.toString
    assert(p.contains("BatchScan synthetic(1000)[id#"), p)
    assert(!p.contains("val#") && !p.contains("cat#"), p)
  }

  test("COUNT/MIN/MAX push completely — a trillion-row count never " +
    "iterates a row") {
    val t0 = System.nanoTime()
    val df = load(1000000000000L, 32)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val r = df.collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.getLong(0) === 1000000000000L)
    assert(r.getLong(1) === 0L && r.getLong(2) === 999999999999L)
    assert(secs < 30, s"pushed aggregate took $secs s — it iterated")
    assert(df.queryExecution.executedPlan.toString.contains("PUSHED AGG"),
      df.queryExecution.executedPlan.toString.take(2000))
  }

  test("pushed aggregates compose with pushed id-range filters") {
    val r = load(1000000000000L, 32)
      .filter(col("id") >= 100 && col("id") < 2000000000L)
      .agg(count(lit(1)), min("id"), max("id")).collect().head
    assert(r.getLong(0) === 2000000000L - 100)
    assert(r.getLong(1) === 100L && r.getLong(2) === 1999999999L)
  }

  test("non-pushable aggregates still compute row-by-row correctly") {
    // sum(val) has no closed form here — the source must DECLINE and
    // the normal scan path must produce the exact answer
    val df = load(1000, 4).agg(sum("val").as("s"))
    assert(!df.queryExecution.executedPlan.toString.contains("PUSHED AGG"))
    val expected = (0L until 1000L).map(i => i * 48271L % 2147483647L).sum
    assert(df.collect().head.getLong(0) === expected)
  }
}

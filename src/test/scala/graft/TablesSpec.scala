package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema contract between the testdata parquet, the engine, and the DuckDB
  * oracles. The round-5 testdata regeneration silently changed `events.ts`
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false) and
  * broke 22 queries with opaque analysis errors; this spec exists so the next
  * regen fails ONE obvious test instead.
  */
class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] =
    Tables.read(spark, dir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events resolves with ts normalized to ns-since-epoch LONG") {
    assert(fields("events") === Map(
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("events.ts values land in the generator's January-2024 window (UTC)") {
    // Catches both scale mistakes (µs vs ns: off by 1000×) and timezone
    // mistakes (a non-UTC NTZ conversion shifts by whole hours): the data
    // starts within the first hour of 2024-01-01 UTC and ends before Feb 1.
    val r = Tables.events(spark, dir).agg(min("ts"), max("ts")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val jan1 = 1704067200000000000L // 2024-01-01T00:00:00Z as ns
    assert(lo >= jan1 && lo < jan1 + 3600L * 1000000000L, s"min ts = $lo")
    assert(hi > jan1 && hi < 1706745600000000000L, s"max ts = $hi") // < Feb 1
  }

  test("date columns resolve as NTZ timestamps the oracles exchange at µs/ms") {
    assert(fields("orders")("o_orderdate") === TimestampNTZType)
    assert(fields("lineitem")("l_shipdate") === TimestampNTZType)
  }

  test("all ten tables resolve to the schemas the oracles assume") {
    assert(fields("region") === Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields("nation") === Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(fields("customer") === Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(fields("supplier") === Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields("part") === Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assert(fields("orders") === Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    assert(fields("lineitem") === Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
    assert(fields("documents") === Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(fields("embeddings") === Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
  }

  test("ts literal predicates on normalized events push down to parquet") {
    // The TsLiteralPushdown rule must rewrite `unix_micros(cast(ts))*1000
    // cmp L` back onto the bare column; otherwise time-range scans read
    // every row group at 100 TB.
    val plan = Tables.events(spark, dir)
      .filter(col("ts") < lit(1704672000000000000L))
      .select("event_id").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), LessThan(ts,"), plan)
  }
}

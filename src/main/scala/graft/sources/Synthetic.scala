package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic-corpus generator — the
  * "make 10× data WITHOUT writing 10× parquet first" scale path for
  * canary runs, planned like a real table instead of a driver-side
  * `spark.range(...).select(...)` chain:
  *
  *   spark.read.format("graft.sources.Synthetic")
  *     .option("rows", 1000000).option("slices", 32).load()
  *
  * Schema: (id LONG, val LONG, cat STRING) with
  *   val = (id · 48271) mod 2147483647        (Lehmer MCG step —
  *         multiplication stays < 2⁶³ for any realistic id, so the
  *         SAME closed form runs overflow-free in DuckDB / any engine)
  *   cat = 'c' ∥ (val mod 8)
  *
  * The interesting part is what the CONNECTOR does, not the data:
  *  - **column pruning** (SupportsPushDownRequiredColumns): the reader
  *    materializes only requested fields — `.explain` shows
  *    `ReadSchema: struct<id:bigint>` for a count over one column;
  *  - **filter pushdown → PARTITION pruning** (SupportsPushDownFilters):
  *    `id` range predicates are accepted, intersected into [lo, hi),
  *    and whole input partitions outside the range are never planned —
  *    the DSv2 analogue of parquet row-group pruning, which is what
  *    makes a 1000-executor scan of a trillion-row synthetic corpus
  *    touch only the asked-for slice. Non-id filters are left to Spark
  *    (returned as postScanFilters) — the source never re-evaluates
  *    what Catalyst already codegens.
  *
  * Reference: the pipeline-source role (SURVEY §2.1 S10 — the
  * reference's `crawler/service.go:50-76` periodic frontier source),
  * generalized to a planned, partition-parallel Spark table.
  */
class Synthetic extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Synthetic.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      slices = Option(properties.get("slices")).map(_.toInt).getOrElse(8))
}

object Synthetic {
  val schema: StructType = StructType.fromDDL(
    "id BIGINT NOT NULL, val BIGINT NOT NULL, cat STRING NOT NULL")

  /** The Lehmer step — the single source of truth the readers use. */
  def valueOf(id: Long): Long = id * 48271L % 2147483647L

  /** DuckDB/ANSI rendering of the same closed form, for oracles. */
  def valueSql(idExpr: String): String = s"(($idExpr) * 48271) % 2147483647"
}

private class SyntheticTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = Synthetic.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, slices)
}

private class SyntheticScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = 0L           // inclusive
  private var hi = rows         // exclusive
  private var pushed = ArrayBuffer.empty[Filter]
  private var required: StructType = Synthetic.schema
  private var aggFns: Seq[String] = Nil

  // COUNT(*) / MIN(id) / MAX(id) over the (filter-pruned) id range have
  // CLOSED FORMS — hi−lo, lo, hi−1 — so the "scan" for a pushed
  // aggregate is O(1) arithmetic at planning time: a count over a
  // trillion-row synthetic corpus never iterates a row (the DSv2
  // analogue of parquet footer-statistics aggregate pushdown, and the
  // reason pushdown must run AFTER filter pushdown — Spark guarantees
  // that ordering in V2ScanRelationPushDown).
  private def supported(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val fns = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => "count"
      case m: Min => m.column match {
        case f: NamedReference if f.fieldNames.sameElements(Array("id")) => "min"
        case _ => return None
      }
      case m: Max => m.column match {
        case f: NamedReference if f.fieldNames.sameElements(Array("id")) => "max"
        case _ => return None
      }
      case _ => return None
    }
    Some(fns)
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    supported(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    supported(agg) match {
      case Some(fns) => aggFns = fns; true
      case None => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case _                                 => ()
    }
    pushed ++= accepted
    // id bounds are enforced EXACTLY by the readers, so accepted
    // filters need no Spark-side re-check; everything else does.
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    if (aggFns.nonEmpty) new SyntheticAggScan(math.max(lo, 0L),
      math.max(hi, lo), aggFns)
    else new SyntheticScan(rows, slices, lo, hi, required)
}

/** Completely-pushed aggregate: one partition, one row, zero row
  * iteration — every value is closed-form over the pruned [lo, hi). */
private class SyntheticAggScan(lo: Long, hi: Long, fns: Seq[String])
    extends Scan with Batch {
  private val empty = hi <= lo
  override def readSchema(): StructType = StructType(fns.zipWithIndex.map {
    case (f, i) => StructField(s"agg_$i", LongType,
      nullable = f != "count" && empty)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic PUSHED AGG [${fns.mkString(", ")}] range=[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory = {
    val row = InternalRow.fromSeq(fns.map {
      case "count" => if (empty) 0L else hi - lo
      case "min"   => if (empty) null else lo
      case "max"   => if (empty) null else hi - 1
    })
    new SingleRowReaderFactory(row)
  }
}

private class SingleRowReaderFactory(row: InternalRow)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

private class SyntheticScan(rows: Long, slices: Int, lo: Long, hi: Long,
                            required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic rows=$rows slices=$slices range=[$lo,$hi)"

  // Fixed slice boundaries (independent of pushdown!) so pruning is
  // observable: a slice whose [start, end) misses [lo, hi) is DROPPED
  // here, at planning time — fewer tasks, not just emptier ones.
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map { i =>
        val s = i * per
        SyntheticPartition(math.max(s, lo),
          math.min(math.min(s + per, rows), hi))
      }
      .filter(p => p.start < p.end)
      .map(p => p: InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

private case class SyntheticPartition(start: Long, end: Long)
    extends InputPartition

private class SyntheticReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SyntheticReader(p.asInstanceOf[SyntheticPartition], required)
}

private class SyntheticReader(p: SyntheticPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  // pruned projection: one closure per REQUESTED column, bound once
  private val fields: Array[Long => Any] = required.fields.map { f =>
    f.name match {
      case "id"  => (id: Long) => id
      case "val" => (id: Long) => Synthetic.valueOf(id)
      case "cat" => (id: Long) =>
        UTF8String.fromString("c" + (Synthetic.valueOf(id) % 8))
      case other => throw new IllegalArgumentException(s"no column $other")
    }
  }
  private var cur = p.start - 1

  override def next(): Boolean = { cur += 1; cur < p.end }
  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toIndexedSeq.map(_(cur)))
  override def close(): Unit = ()
}

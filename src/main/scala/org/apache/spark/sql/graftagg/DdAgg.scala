package org.apache.spark.sql.graftagg

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native DDSketch quantile aggregate — the one-pass, mergeable form of
  * `graft.sketch.Sketches.ddQuantiles` (Masson, Rim & Lee 2019):
  * logarithmic buckets with guaranteed relative error ≤ alpha, state
  * bounded at O(log_gamma(max/min)) counters regardless of input size.
  *
  * Buffer is a bucket→count map (~600 entries at alpha=1% over money
  * columns); merge adds counts — associative, order-independent, so
  * results are partitioning-invariant and share the DataFrame twin's
  * DuckDB oracle bit-for-bit (same micros-snap bucket rule, same rank
  * walk `floor(q/100·(n−1))+1`, same midpoint read-back
  * `2·γ^b/(γ+1)`).
  *
  * Returns array<struct(q_pct, bucket, est_micros)> — explode to rows.
  */
case class DdSketchAgg(
    child: Expression,
    alpha: Double,
    pcts: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
  with ExpectsInputTypes {

  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
  require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100))
  private val gamma = (1.0 + alpha) / (1.0 - alpha)
  private val lnGamma = math.log(gamma)

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q_pct", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("est_micros", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_dd_quantiles"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long],
                      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (d > 0) {
        // identical arithmetic to the DataFrame twin: micros-snap the
        // log ratio, then ceil of the back-scaled value
        val snapped = math.floor(math.log(d) / lnGamma * 1000000d + 0.5d)
        val bucket = math.ceil(snapped / 1000000.0).toLong
        buf.merge(bucket, 1L, (a, b) => a + b)
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long],
                     b: java.util.HashMap[Long, Long])
      : java.util.HashMap[Long, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val buckets = buf.entrySet().iterator()
    var entries = List.empty[(Long, Long)]
    while (buckets.hasNext) {
      val e = buckets.next(); entries = (e.getKey.longValue(),
        e.getValue.longValue()) :: entries
    }
    val sorted = entries.sortBy(_._1)
    val n = sorted.map(_._2).sum
    // A group whose inputs were all null or <= 0 has NO sketch: report
    // no quantiles (empty array) rather than fabricating bucket-0 rows
    // at est ~ 2/(gamma+1) — the DuckDB oracle filters x > 0 and omits
    // such groups entirely.
    if (n == 0L) return new GenericArrayData(Array.empty[Any])
    val rows = pcts.map { q =>
      val rank = math.floor(q / 100.0 * (n.toDouble - 1.0)).toLong + 1
      var cum = 0L
      var chosen = if (sorted.nonEmpty) sorted.last._1 else 0L
      val it = sorted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (b, c) = it.next(); cum += c
        if (cum >= rank) { chosen = b; found = true }
      }
      val est = 2.0 * math.pow(gamma, chosen.toDouble) / (gamma + 1.0)
      InternalRow(q, chosen,
        math.floor(est * 1000000d + 0.5d).toLong)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte])
      : java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val m = new java.util.HashMap[Long, Long](n * 2)
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DdSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

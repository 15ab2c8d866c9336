package org.apache.spark.sql.graftagg

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native k-minimum-values distinct-count aggregate — the one-pass,
  * mergeable form of `graft.sketch.Sketches.kmvDistinct` (Beyer et al.
  * 2007). State is the set of the k smallest DISTINCT 60-bit hashes
  * seen; merge is set-union-then-trim, which is associative and
  * order-independent, so the result is deterministic under any
  * partitioning — it shares q45's DuckDB oracle bit-for-bit.
  *
  * vs the DataFrame formulation (per-partition top-k then a global
  * re-sort): the aggregate needs no sort at all and carries at most
  * 8k bytes per group per partition through partial aggregation.
  * Estimator: exact count below k, else floor((k−1)·2^60 / kth_h) —
  * fixed-parenthesization IEEE like the twins.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes {

  require(k >= 2, s"k must be >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("k_used", LongType, nullable = false),
    StructField("kth_h", LongType, nullable = false),
    StructField("est_distinct", LongType, nullable = false)))
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // only admit hashes that can still be among the k smallest
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) buf.pollLast()
      ()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md5.digest(v.asInstanceOf[UTF8String].getBytes)
      var be = 0L
      var i = 0
      while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
      add(buf, be >>> 4) // top 60 bits = Dedup.portableHash
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val kUsed = buf.size.toLong
    val kth = if (buf.isEmpty) 0L else buf.last.longValue()
    val est =
      if (kUsed < k) kUsed
      else math.floor((k - 1).toDouble * math.pow(2.0, 60) /
        kth.toDouble).toLong
    InternalRow(kUsed, kth, est)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(storage: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

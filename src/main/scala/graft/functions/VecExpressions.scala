// Hosted in a subpackage of org.apache.spark.sql because the Catalyst
// extension seams this uses (ExpressionUtils.column, AbstractDataType)
// are private[sql] — the standard pattern for out-of-tree native
// expressions. Engine-facing API: graft.functions.VecFunctions.
package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, TypeCollection}

/** Native Catalyst expression for the similarity hot path: the dot
  * product of two `array<float>` columns, accumulated in double,
  * left-to-right — bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` fold (and to a chained
  * `+` in SQL), but codegen'd as one tight loop with no per-element
  * lambda invocation or boxing. At ANN brute-force scale (rows × dims
  * multiply-adds) the fold pays a HigherOrderFunction dispatch per
  * element; this pays one virtual call per ROW.
  *
  * This is the one place the engine drops below `functions._`
  * composition (SURVEY §4 found none *required* for parity — this is a
  * performance specialization; the fold remains the reference
  * implementation, asserted equal in VecExpressionsSpec).
  *
  * Contract (narrower than the fold): inputs must be equal-length
  * arrays with no null elements — mismatched lengths raise rather than
  * silently truncating (the fold would return NULL), and null elements
  * are undefined (the fold would propagate NULL). The engine's
  * embedding columns are fixed-width non-null, which is the only shape
  * the hot path serves.
  */
case class DotProductFF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_ff"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"dot_ff requires equal-length arrays, got $n and ${y.numElements()}")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_ff requires equal-length arrays, got " + $n + " and " +
         |    $y.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The whole sign-random-projection signature as ONE expression: for
  * each hyperplane p, bit p of the result is set iff
  * Σ_d (double)vec(d) · m(p)(d) > 0, accumulated left-to-right — term
  * for term the same IEEE ops, in the same order, as the per-plane
  * `aggregate(zip_with(cast, plane, _*_))` fold the DuckDB oracles
  * mirror, so bucket values are bit-identical.
  *
  * Why one expression instead of `planes` dot products OR'd together:
  * a 40+-term expression tree overflows whole-stage codegen's method
  * budget and drops the entire projection to interpreted evaluation —
  * a measured 5× regression on the near-pair pipeline. Here the matrix
  * rides along as a reference object and the generated code is one
  * small doubly-nested loop regardless of plane count. */
case class SignRandomProjection(child: Expression,
                                matrix: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_projection"

  private def dim: Int = if (matrix.isEmpty) 0 else matrix(0).length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) {
      throw new IllegalArgumentException(
        s"sign_projection: expected $dim-dim vector, got " +
          s"${x.numElements()}")
    }
    var bucket = 0L
    var p = 0
    while (p < matrix.length) {
      val row = matrix(p)
      var acc = 0.0
      var d = 0
      while (d < row.length) {
        acc += x.getFloat(d).toDouble * row(d)
        d += 1
      }
      if (acc > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($x.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "sign_projection: expected $dim-dim vector, got " +
         |    $x.numElements());
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $m.length; $p++) {
         |  double[] $row = $m[$p];
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $row.length; $d++) {
         |    $acc += (double) $x.getFloat($d) * $row[$d];
         |  }
         |  if ($acc > 0) $bucket |= 1L << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Nearest-centroid assignment as one expression: returns the id (from
  * `clusterIds`) of the centroid with the smallest squared L2 distance
  * to the vector, ties to the earliest (= smallest id, rows pre-sorted)
  * — exactly the `min(struct(dist, cluster))` argmin of the dataframe
  * formulation, with per-element double accumulation in the same
  * order, so assignments are bit-identical. Replaces a
  * crossJoin(corpus × k) + per-id window sort (k× the corpus shuffled
  * per Lloyd round) with a narrow codegen'd projection. */
case class NearestCentroid(child: Expression,
                           clusterIds: Array[Long],
                           centroids: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  // accepts float vectors (raw embeddings) AND double vectors (PQ
  // residuals / pre-widened frames); floats widen per element exactly,
  // so both paths accumulate in double with identical ordering
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = isFloat
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      var acc = 0.0
      var d = 0
      while (d < row.length) {
        val xi = if (f) x.getFloat(d).toDouble else x.getDouble(d)
        val diff = xi - row(d)
        acc += diff * diff
        d += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    clusterIds(best)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val ids = ctx.addReferenceObj("clusterIds", clusterIds, "long[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val row = ctx.freshName("row")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  double[] $row = $m[$c];
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $row.length; $d++) {
         |    double $diff = (double) $x.$get($d) - $row[$d];
         |    $acc += $diff * $diff;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |}
         |${ev.value} = $ids[$best];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VecBridge {
  def dotFF(a: Column, b: Column): Column =
    column(DotProductFF(expression(a), expression(b)))
  def signProjection(v: Column, matrix: Array[Array[Double]]): Column =
    column(SignRandomProjection(expression(v), matrix))
  def nearestCentroid(v: Column, clusterIds: Array[Long],
                      centroids: Array[Array[Double]]): Column =
    column(NearestCentroid(expression(v), clusterIds, centroids))
}

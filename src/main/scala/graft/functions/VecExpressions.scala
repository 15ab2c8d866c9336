// Hosted in a subpackage of org.apache.spark.sql because the Catalyst
// extension seams this uses (ExpressionUtils.column, AbstractDataType)
// are private[sql] — the standard pattern for out-of-tree native
// expressions. Engine-facing API: graft.functions.VecFunctions.
package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

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

object VecBridge {
  def dotFF(a: Column, b: Column): Column =
    column(DotProductFF(expression(a), expression(b)))
}

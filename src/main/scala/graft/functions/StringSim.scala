// Hosted alongside the vector expressions in a subpackage of
// org.apache.spark.sql because the Column/Expression bridge
// (ExpressionUtils.column) is private[sql]. Engine-facing API:
// graft.functions.StringFunctions.
package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd Catalyst expression.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (the correctness
  * oracle) exactly, empirically pinned in StringSimSpec:
  *   - either side empty → 0.0 (including both empty);
  *   - match window = max(len)/2 - 1 (integer division, floor 0);
  *   - transpositions = half the out-of-order matched characters;
  *   - Winkler prefix boost (scale 0.1, prefix capped at 4) applied
  *     only when the Jaro score exceeds the classic 0.7 threshold.
  *
  * The per-row arithmetic is a fixed sequence of IEEE-754 ops on small
  * integer-derived doubles, identical in both engines, so a micros snap
  * ([[graft.util.Exact.micros]]) is hash-stable cross-engine.
  *
  * Like Spark's own Levenshtein, codegen emits one static call per row
  * (no UDF serialization, stays inside whole-stage codegen).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.JaroWinklerImpl.jaroWinkler(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.jaroWinkler(" +
        s"$x.toString(), $y.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimBridge {
  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))
}

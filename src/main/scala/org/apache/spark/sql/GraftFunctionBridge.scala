package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Main-source bridge into the session's `private[sql]`
  * FunctionRegistry: lets the library register its NATIVE Catalyst
  * expressions (graft.functions.Registry) as SQL functions on an
  * ALREADY-BUILT session — the complement to the
  * `spark.sql.extensions=graft.plans.GraftExtensions` path, which only
  * helps when the session builder is ours. Same pattern as the
  * test-side GraftExtensionsProbe: `private[sql]` is package-scoped,
  * so a file in this package is the sanctioned seam.
  */
object GraftFunctionBridge {

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  def register(spark: SparkSession, fns: Seq[Description]): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fns.foreach { case (id, info, b) => reg.registerFunction(id, info, b) }
  }
}

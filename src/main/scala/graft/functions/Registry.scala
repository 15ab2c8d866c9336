package graft.functions

import org.apache.spark.sql.{GraftFunctionBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.graftvec.{DotProductFF, JaroWinkler}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** SQL-surface registration of the engine's native codegen expressions:
  * `spark.sql("SELECT graft_dot(a, b) …")` runs the SAME
  * whole-stage-codegen'd [[DotProductFF]] the DataFrame API uses — no
  * UDF wrapper, no serialization penalty, so the SQL and Column paths
  * have identical plans and identical 100 TB behavior.
  *
  * Two installation paths, same descriptions:
  *   - session build time: `spark.sql.extensions=graft.plans.
  *     GraftExtensions` (injectFunction);
  *   - post-hoc on an existing session: [[register]] (idempotent —
  *     re-registration replaces the same builder).
  */
object Registry {

  /** (identifier, info, builder) triples in the exact shape both
    * `SparkSessionExtensions.injectFunction` and the session
    * FunctionRegistry accept. */
  val functions: Seq[GraftFunctionBridge.Description] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFF].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(vecA, vecB)")
        // SQL array literals arrive as array<double>/array<decimal>;
        // cast to the float-array shape the native expression serves.
        DotProductFF(Cast(args(0), ArrayType(FloatType)),
          Cast(args(1), ArrayType(FloatType)))
      }),
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro_winkler(s1, s2)")
        JaroWinkler(args(0), args(1))
      }),
    (FunctionIdentifier("graft_hll_distinct"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graftagg.HllSketchAgg].getName,
        "graft_hll_distinct"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2,
          "graft_hll_distinct(expr[, p])")
        val p = args.lift(1).map {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"p must be an integer literal, got $other")
        }.getOrElse(10)
        org.apache.spark.sql.graftagg.HllSketchAgg(
          Cast(args(0), org.apache.spark.sql.types.StringType), p)
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graftagg.KmvSketchAgg].getName,
        "graft_kmv_distinct"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2,
          "graft_kmv_distinct(expr[, k])")
        val k = args.lift(1).map {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"k must be an integer literal, got $other")
        }.getOrElse(1024)
        org.apache.spark.sql.graftagg.KmvSketchAgg(
          Cast(args(0), org.apache.spark.sql.types.StringType), k)
          .toAggregateExpression()
      }))

  def register(spark: SparkSession): Unit =
    GraftFunctionBridge.register(spark, functions)
}

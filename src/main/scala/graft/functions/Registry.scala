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
      }))

  def register(spark: SparkSession): Unit =
    GraftFunctionBridge.register(spark, functions)
}

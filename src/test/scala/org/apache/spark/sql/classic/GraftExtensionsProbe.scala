package org.apache.spark.sql.classic

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only bridge into `private[sql]` extension machinery: specs cannot
  * build a second `SparkSession.builder().withExtensions(...)` session
  * (getOrCreate returns the shared test session and ignores extensions),
  * so this probe constructs a real extension-enabled classic session on
  * the existing SparkContext and exposes the built optimizer-rule list.
  */
object GraftExtensionsProbe {

  def optimizerRules(ext: SparkSessionExtensions,
                     s: org.apache.spark.sql.SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(s)

  /** A brand-new session with `ext` installed, sharing `sc` (and nothing
    * else) with the spec session — the closest a test can get to
    * `--conf spark.sql.extensions=…` on a fresh application.
    */
  def sessionWith(ext: SparkSessionExtensions,
                  sc: SparkContext): SparkSession = {
    // The 6-arg primary constructor is Scala-`private` but JVM-public
    // (Scala access is erased in bytecode), so plain reflection reaches it.
    val ctor = classOf[SparkSession].getConstructor(
      classOf[SparkContext], classOf[Option[_]], classOf[Option[_]],
      classOf[SparkSessionExtensions],
      classOf[scala.collection.immutable.Map[_, _]],
      classOf[scala.collection.immutable.Map[_, _]])
    ctor.newInstance(sc, None, None, ext,
      Map.empty[String, String], Map.empty[String, String])
  }
}

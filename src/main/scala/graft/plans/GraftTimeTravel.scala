package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.TimestampType

import graft.sources.{GraftDataSource, GraftDvRelation, GraftFileIndex}

/** SQL time travel BY NAME for graft tables:
  *
  *   `SELECT * FROM t VERSION AS OF 3`
  *   `SELECT * FROM t TIMESTAMP AS OF '2026-08-16 12:00:00'`
  *
  * Spark parses the `AS OF` suffix into [[RelationTimeTravel]] but only
  * resolves it for DSv2 tables; a DSv1 catalog table or temp view fails
  * analysis. This rule resolves the travel for graft relations: the
  * named table/view is mapped to its store root, and the relation is
  * re-created with the pinned `versionAsOf`/`timestampAsOf` option —
  * the exact read `spark.read.format("graft").option(...)` plans, so
  * file skipping and DV semantics are identical. Non-graft names fall
  * through untouched. */
class GraftTimeTravelRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def rootOfPlan(plan: LogicalPlan): Option[String] =
    plan.collectFirst {
      case lr: LogicalRelation if (lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.isInstanceOf[GraftFileIndex]
        case _: GraftDvRelation => true
        case _ => false
      }) =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.asInstanceOf[GraftFileIndex].root
          case dv: GraftDvRelation => dv.root
        }
    }

  /** Store root of a named graft relation: temp view holding a graft
    * relation, or a session-catalog table whose provider is graft. */
  private def rootFor(parts: Seq[String]): Option[String] = {
    val cat = session.sessionState.catalog
    val viewPlan =
      if (parts.length == 1) cat.getTempView(parts.head)
      else if (parts.length == 2 &&
        parts.head == session.sessionState.conf.globalTempDatabase)
        cat.getGlobalTempView(parts(1))
      else None
    viewPlan.flatMap(rootOfPlan).orElse {
      val ident = parts match {
        case Seq(t) => Some(TableIdentifier(t))
        case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
        case Seq("spark_catalog", db, t) =>
          Some(TableIdentifier(t, Some(db)))
        case _ => None
      }
      ident.filter(cat.tableExists).flatMap { id =>
        val meta = cat.getTableMetadata(id)
        if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) None
        else meta.storage.locationUri
          .map(u => new org.apache.hadoop.fs.Path(u).toString)
          .orElse(meta.storage.properties.collectFirst {
            case (k, v) if k.equalsIgnoreCase("path") => v })
      }
    }
  }

  /** Foldable timestamp expression → epoch millis (evaluated in the
    * session time zone, exactly as a literal comparison would be). */
  private def millisOf(e: Expression): Long = {
    require(e.foldable,
      s"TIMESTAMP AS OF expression must be a literal, got $e")
    val micros = Cast(e, TimestampType,
      Some(session.sessionState.conf.sessionLocalTimeZone)).eval()
    require(micros != null, s"TIMESTAMP AS OF evaluated to null: $e")
    micros.asInstanceOf[Long] / 1000L
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case tt @ RelationTimeTravel(ur: UnresolvedRelation, ts, ver) =>
        rootFor(ur.multipartIdentifier) match {
          case None => tt // not ours: DSv2 / error paths proceed as-is
          case Some(root) =>
            val opts = Map("path" -> root) ++
              ver.map("versionAsOf" -> _) ++
              ts.map(e => "timestampAsOf" -> millisOf(e).toString)
            val rel = new GraftDataSource()
              .createRelation(session.sqlContext, opts)
            val lr = session.baseRelationToDataFrame(rel)
              .queryExecution.analyzed
            SubqueryAlias(ur.multipartIdentifier.last, lr)
        }
    }
}

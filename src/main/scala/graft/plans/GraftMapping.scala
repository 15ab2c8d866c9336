package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.GraftFileIndex
import graft.store.Versioned

/** Presents schema-DDL (column-mapping) graft relations under their
  * LOGICAL column names.
  *
  * A `format("graft")` relation over a table with a schema-DDL state
  * scans in PHYSICAL space — the explicit physical read schema is what
  * lets files predating an `ADD COLUMNS` null-fill it, and what keeps
  * renamed columns reading the bytes written under their old names.
  * This rule wraps each such relation in a projection that aliases
  * every physical attribute to its logical name (null-literals for
  * added columns a stale relation misses), so queries, DML statements
  * and `DESCRIBE` all speak the names `ALTER TABLE` declared.
  *
  * Plan economics: the projection is pure aliasing — Catalyst pushes
  * predicates straight through it into the physical attributes (so
  * [[GraftFileIndex.listFiles]] receives sidecar-space probes and file
  * skipping keeps working across renames) and the scan stays a
  * vectorized `FileSourceScanExec` under whole-stage codegen. The
  * mapping is resolved FRESH per analysis from the versioned
  * `schemaddl` state, so a rename lands in long-lived views without
  * re-creating them. The rewritten relation's index is flagged
  * `mapped`, which stops the rule re-firing on the child inside its
  * own fixpoint (and tells [[GraftInsertRule]] the projection above it
  * is the mapping wrap, not a user view). */
class GraftMappingRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // InsertIntoStatement holds its TABLE outside the traversed
      // children (only the query is a child), so the wrap must be
      // applied to it explicitly or an INSERT target never maps —
      // and the statement would fall to Spark's generic file-source
      // insert (unlisted parquet = silent data loss)
      case i: org.apache.spark.sql.catalyst.plans.logical
          .InsertIntoStatement if i.table.resolved =>
        val wrapped = apply(i.table)
        if (wrapped eq i.table) i else i.copy(table = wrapped)
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[HadoopFsRelation] =>
        val fsrel = lr.relation.asInstanceOf[HadoopFsRelation]
        fsrel.location match {
          case gi: GraftFileIndex if !gi.mapped =>
            Versioned.schemaDdl(gi.root, gi.pinned.getOrElse(0L)) match {
              case Some(s)
                  if s.schema.fieldNames.toSeq !=
                    lr.output.map(_.name) =>
                val rel2 = fsrel.copy(
                  location = gi.asMapped)(session)
                val lr2 = lr.copy(relation = rel2)
                val byPhys
                    : Map[String, org.apache.spark.sql.catalyst
                      .expressions.AttributeReference] =
                  lr2.output.map(a => a.name -> a).toMap
                val projected: Seq[NamedExpression] =
                  s.schema.fields.toSeq.map { f =>
                    val p = s.physicalOf(f)
                    byPhys.get(p) match {
                      case Some(attr) if attr.name == f.name => attr
                      case Some(attr) => Alias(attr, f.name)()
                      case None =>
                        // a column added AFTER this relation was
                        // resolved: serve nulls rather than fail the
                        // stale plan
                        Alias(Literal(null, f.dataType), f.name)()
                    }
                  }
                Project(projected, lr2)
              case _ => lr
            }
          case _ => lr
        }
    }
}

package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertAction, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

import graft.sources.{GraftDvRelation, GraftFileIndex}
import graft.store.Versioned

/** SQL DML over `USING graft` relations, routed through the versioned
  * commit protocol: INSERT INTO / INSERT OVERWRITE / DELETE FROM /
  * UPDATE / MERGE INTO (the canonical upsert shape).
  *
  * Why a rule exists at all: without it, INSERT falls to Spark's
  * generic file-source path (DataSourceAnalysis →
  * InsertIntoHadoopFsRelationCommand), which writes parquet DIRECTLY
  * into the table directory — files no manifest lists, so the
  * "inserted" rows are invisible to every read while the statement
  * reports success (silent data loss). DELETE/UPDATE/MERGE on a DSv1
  * relation fail analysis outright. The rule intercepts the resolved
  * statements during MAIN resolution (post-hoc rules, where the
  * generic planner lives, run later) and rewrites each into a command
  * that commits through the manifest protocol — history, time travel,
  * CDC and conflict detection all behave exactly as the Scala API.
  *
  * Statement → commit mapping:
  *   - INSERT INTO → `commitAppend` (under the table's own partition
  *     layout — SQL has no partitionBy option to pass);
  *     INSERT OVERWRITE → `commitOverwrite`.
  *   - DELETE FROM → `commitDeleteVectors` when the table already
  *     carries tombstones (stay merge-on-read), else copy-on-write
  *     `commitDelete`.
  *   - UPDATE → `commitUpdate` (copy-on-write, pre-pruned).
  *   - MERGE INTO t USING s ON <equality of identically-named cols>
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  *     → `commitMerge(s, keys)`; any other merge shape fails loudly
  *     naming what IS supported.
  */
class GraftInsertRule extends Rule[LogicalPlan] {

  private def rootOf(table: LogicalPlan): Option[String] = table match {
    case s: SubqueryAlias => rootOf(s.child)
    case v: View => rootOf(v.child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case gi: GraftFileIndex => Some(gi.root)
        case _ => None
      }
      case dv: GraftDvRelation => Some(dv.root)
      case _ => None
    }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  /** The canonical-upsert keys of a MERGE, when the statement has
    * exactly that shape (UPDATE SET * / INSERT * actions arrive either
    * as star actions or already expanded to name-identical
    * assignments, depending on which resolution iteration sees them
    * first). */
  private def upsertKeys(m: MergeIntoTable): Seq[String] = {
    def sameNameAssigns(as: Seq[Assignment]): Boolean = as.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name == v.name
      case _ => false
    }
    val matchedOk = m.matchedActions match {
      case Seq(UpdateStarAction(None)) => true
      case Seq(UpdateAction(None, as, _)) => sameNameAssigns(as)
      case _ => false
    }
    val notMatchedOk = m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, as)) => sameNameAssigns(as)
      case _ => false
    }
    require(matchedOk && notMatchedOk &&
      m.notMatchedBySourceActions.isEmpty,
      "graft MERGE supports the canonical upsert only: WHEN MATCHED " +
        "THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * (no action " +
        "conditions, no NOT MATCHED BY SOURCE) - use the Scala API's " +
        "commitMerge/commitMergeOnRead for other shapes")
    conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name == b.name => a.name
      case other => throw new IllegalArgumentException(
        "graft MERGE needs an ON clause that is a conjunction of " +
          s"equalities between identically-named columns, got: $other")
    }.distinct
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case i: InsertIntoStatement if i.table.resolved &&
          i.query.resolved && rootOf(i.table).isDefined =>
        require(i.partitionSpec.isEmpty,
          "INSERT into a graft table takes no PARTITION spec: " +
            "partition values are ordinary columns of the row")
        require(i.userSpecifiedCols.isEmpty,
          "INSERT into a graft table does not support a column list " +
            "yet - provide every column positionally")
        GraftInsertCommand(rootOf(i.table).get, i.query,
          i.overwrite, i.table.schema)

      case d: DeleteFromTable if d.table.resolved &&
          d.condition.resolved && rootOf(d.table).isDefined =>
        GraftDeleteCommand(rootOf(d.table).get, d.condition)

      case u: UpdateTable if u.table.resolved &&
          u.assignments.forall(_.resolved) &&
          u.condition.forall(_.resolved) &&
          rootOf(u.table).isDefined =>
        val assigns = u.assignments.map {
          case Assignment(k: AttributeReference, v) => k.name -> v
          case a => throw new IllegalArgumentException(
            s"graft UPDATE assigns whole columns, got: ${a.key}")
        }
        GraftUpdateCommand(rootOf(u.table).get, assigns, u.condition)

      case m: MergeIntoTable if m.targetTable.resolved &&
          m.sourceTable.resolved && m.mergeCondition.resolved &&
          rootOf(m.targetTable).isDefined =>
        GraftMergeCommand(rootOf(m.targetTable).get, m.sourceTable,
          upsertKeys(m), m.targetTable.schema)
    }
}

/** INSERT: align the query's rows to the table schema positionally
  * (names from the table, ANSI casts to its types — a narrowing that
  * loses data throws, it never corrupts), then commit. */
case class GraftInsertCommand(root: String, query: LogicalPlan,
                              overwrite: Boolean,
                              tableSchema: StructType)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val rows = org.apache.spark.sql.GraftStreamBridge.ofRows(session,
      query)
    require(rows.schema.length == tableSchema.length,
      s"INSERT provides ${rows.schema.length} columns, table $root " +
        s"has ${tableSchema.length}")
    val aligned = rows.toDF(tableSchema.fieldNames.toSeq: _*)
      .select(tableSchema.fields.toSeq
        .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    val layout = Versioned.currentLayout(root)
    if (overwrite)
      Versioned.commitOverwrite(aligned, root, partitionBy = layout)
    else
      Versioned.commitAppend(aligned, root, partitionBy = layout)
    Nil
  }
}

private[plans] object GraftDml {
  /** Re-resolvable Column from a statement expression: attribute
    * references bound to the view's relation become bare names at RUN
    * time (the command must carry only RESOLVED expressions or
    * CheckAnalysis rejects the plan), so the commit's own fresh scan
    * resolves them again. */
  def asCol(e: Expression): Column =
    org.apache.spark.sql.GraftStreamBridge.columnOf(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

/** DELETE FROM: merge-on-read tombstones when the table already
  * carries them, copy-on-write rewrite otherwise. */
case class GraftDeleteCommand(root: String, condition: Expression)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val pred: Column = GraftDml.asCol(condition)
    if (Versioned.hasDeleteVectors(root))
      Versioned.commitDeleteVectors(session, root, pred)
    else Versioned.commitDelete(session, root, pred)
    Nil
  }
}

/** UPDATE ... SET ... WHERE ...: copy-on-write rewrite of only the
  * files holding a matched row. */
case class GraftUpdateCommand(root: String,
                              assignments: Seq[(String, Expression)],
                              condition: Option[Expression])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    Versioned.commitUpdate(session, root,
      condition.map(GraftDml.asCol).getOrElse(lit(true)),
      assignments.map { case (c, e) => c -> GraftDml.asCol(e) })
    Nil
  }
}

/** MERGE INTO (canonical upsert): keep-newest on the ON-clause keys. */
case class GraftMergeCommand(root: String, source: LogicalPlan,
                             keys: Seq[String],
                             tableSchema: StructType)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftStreamBridge.ofRows(session,
      source)
    val missing = tableSchema.fieldNames.filterNot(src.columns.contains)
    require(missing.isEmpty,
      s"MERGE source lacks table column(s) ${missing.mkString(", ")}")
    val aligned = src.select(tableSchema.fields.toSeq
      .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    Versioned.commitMerge(aligned, root, keys)
    Nil
  }
}

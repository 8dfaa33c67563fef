package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analysis-time rewrite (injected by [[graft.plans.GraftExtensions]], the
  * Delta `DeltaAnalysis` pattern): every manifest-table READ relation is
  * replaced by its full declarative plan — the vectorized parquet scan
  * over [[ManifestFileIndex]] plus, when the snapshot carries deletion
  * vectors, the `(_metadata.file_path, _metadata.row_index)` anti-join
  * against the tombstone union. Two relation shapes are rewritten:
  *
  *  - [[org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation]]
  *    over a [[ManifestTableV2]] — the SQL/catalog path
  *    (`SELECT … FROM graft.{dir}`), which would otherwise plan through
  *    the V1Scan Row-boundary fallback;
  *  - [[LogicalRelation]] over a [[ManifestDvRelation]] — the
  *    `spark.read.format("graft-manifest")` path on a dv table, which
  *    DSv1 can only express as a `PrunedFilteredScan` Row boundary.
  *
  * After the rewrite both shapes carry whole-stage codegen, manifest
  * file pruning, and parquet pushdown — dv tables included. The spliced
  * plan is re-aliased onto the original relation's attribute ids, so
  * operators above resolve unchanged.
  *
  * Write positions are left intact: `AppendData`/`OverwriteByExpression`
  * hold their target out-of-children (only the query subtree is walked),
  * and `DeleteFromTable` / `UpdateTable` / `MergeIntoTable` subtrees are
  * skipped whole so row-level commands keep the v2 relation their
  * resolution needs ([[ManifestTableV2.deleteWhere]]).
  */
class ManifestV2Rewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    // row-level SQL commands on manifest tables become merge-on-read
    // commits — the general-predicate path SupportsDelete's v1 Filter
    // translation cannot express (`k % 7 = 0` has no Filter form).
    // Subquery conditions stay on the default path (they reference other
    // plans a by-name re-resolution could not carry).
    case DeleteFromTable(ManifestTarget(t), cond)
        if !SubqueryExpression.hasSubquery(cond) =>
      GraftDeleteCommand(t, cond)
    case UpdateTable(ManifestTarget(t), assignments, cond)
        if !SubqueryExpression.hasSubquery(cond.getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)) &&
          assignments.forall(a => a.key.isInstanceOf[AttributeReference] &&
            !SubqueryExpression.hasSubquery(a.value)) =>
      GraftUpdateCommand(t, assignments, cond)
    case d: DeleteFromTable => d
    case u: UpdateTable => u
    case m: MergeIntoTable => m
    case rel: DataSourceV2Relation => rel.table match {
      case t: ManifestTableV2 => aliasTo(t.read(session).queryExecution.analyzed, rel.output)
      case _ => rel
    }
    case lr: LogicalRelation => lr.relation match {
      case dv: ManifestDvRelation =>
        aliasTo(ManifestStore.readVersion(session, dv.dir, dv.version, dv.dataSchema)
          .queryExecution.analyzed, lr.output)
      case _ => lr
    }
    case other => other.mapChildren(rewrite)
  }

  /** Splice `plan` where a relation with `target` attributes stood: a
    * Project of Aliases carrying the ORIGINAL exprIds, so references in
    * the operators above stay resolved.
    */
  private def aliasTo(plan: LogicalPlan, target: Seq[Attribute]): LogicalPlan = {
    require(plan.output.size == target.size,
      s"manifest rewrite arity mismatch: ${plan.output.size} vs ${target.size}")
    Project(plan.output.zip(target).map { case (src, tgt) =>
      Alias(src, tgt.name)(exprId = tgt.exprId, qualifier = tgt.qualifier,
        explicitMetadata = Some(tgt.metadata))
    }, plan)
  }
}

/** The write-target shape row-level commands carry: the (possibly
  * aliased) v2 relation over a [[ManifestTableV2]].
  */
private[sources] object ManifestTarget {
  def unapply(p: LogicalPlan): Option[ManifestTableV2] = p match {
    case SubqueryAlias(_, child) => unapply(child)
    case rel: DataSourceV2Relation => rel.table match {
      case t: ManifestTableV2 => Some(t)
      case _ => None
    }
    case _ => None
  }
}

private[sources] object ManifestRowLevel {
  /** An analysis-time condition re-keyed for a FRESH read of the same
    * table: attribute references become by-name lookups (the command
    * executes against its own scan, whose exprIds differ).
    */
  def byName(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.StreamingShim.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

/** SQL `DELETE FROM graft.{dir} WHERE <any predicate>` →
  * [[ManifestStore.deleteWhere]] merge-on-read tombstones. Runs at
  * execution (not analysis) time, like every mutation command.
  */
private[sources] case class GraftDeleteCommand(table: ManifestTableV2,
                                               condition: Expression)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (ManifestStore.deleteWhere(session, table.dir, table.schema,
        ManifestRowLevel.byName(condition)).isEmpty)
      throw new java.util.ConcurrentModificationException(
        s"DELETE FROM ${table.dir} lost a concurrent-commit race — retry")
    Seq.empty
  }
}

/** SQL `UPDATE graft.{dir} SET c = expr, … WHERE <any predicate>` →
  * [[ManifestStore.updateWhere]]: one atomic commit tombstoning the old
  * images and appending the updated copies — O(matched rows) write
  * amplification, exact CDC.
  */
private[sources] case class GraftUpdateCommand(table: ManifestTableV2,
                                               assignments: Seq[Assignment],
                                               condition: Option[Expression])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val set = assignments.map { a =>
      a.key.asInstanceOf[AttributeReference].name -> ManifestRowLevel.byName(a.value)
    }.toMap
    val cond = condition.map(ManifestRowLevel.byName)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    if (ManifestStore.updateWhere(session, table.dir, table.schema, cond, set).isEmpty)
      throw new java.util.ConcurrentModificationException(
        s"UPDATE ${table.dir} lost a concurrent-commit race — retry")
    Seq.empty
  }
}

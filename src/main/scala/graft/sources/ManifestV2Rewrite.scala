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
    case m: MergeIntoTable => rewriteMerge(m).getOrElse(m)
    case d: DeleteFromTable => d
    case u: UpdateTable => u
    case rel: DataSourceV2Relation => rel.table match {
      case t: ManifestTableV2 => aliasTo(t.read(session).queryExecution.analyzed, rel.output)
      case t: ManifestMetaTable => aliasTo(t.read(session).queryExecution.analyzed, rel.output)
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

  /** SQL `MERGE INTO graft.{dir} t USING src s ON t.k = s.k
    * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
    * (star or explicit full-row assignments, unconditional) — the
    * canonical keyed upsert — becomes ONE [[ManifestStore.upsertKeyedDv]]
    * commit: matched keys tombstone through deletion vectors, the source
    * batch appends, O(batch) write amplification. Shapes the upsert
    * cannot express (partial-row UPDATE, WHEN MATCHED DELETE, clause
    * conditions, NOT MATCHED BY SOURCE, schema evolution, multi-column
    * keys) return None and surface Spark's own unsupported-MERGE error —
    * never a silently different semantics.
    */
  private def rewriteMerge(m: MergeIntoTable): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo}
    import org.apache.spark.sql.catalyst.plans.logical.{InsertAction, InsertStarAction, UpdateAction, UpdateStarAction}
    val t = m.targetTable match {
      case ManifestTarget(t0) => t0
      case _ => return None
    }
    if (m.notMatchedBySourceActions.nonEmpty || m.withSchemaEvolution) return None
    val tgtOut = m.targetTable.outputSet
    val srcOut = m.sourceTable.outputSet
    // single-key equality, one side per table (either order)
    val keyCol = m.mergeCondition match {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if tgtOut.contains(l) && srcOut.contains(r) => l.name
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if srcOut.contains(l) && tgtOut.contains(r) => r.name
      case _ => return None
    }
    // full-row assignment map (target column name -> source-side expr);
    // None when the clause shape is anything else
    def fullRow(assigns: Seq[Assignment]): Option[Map[String, Expression]] = {
      val pairs = assigns.map {
        case Assignment(k: AttributeReference, v)
            if v.references.subsetOf(srcOut) => Some(k.name -> v)
        case _ => None
      }
      if (pairs.exists(_.isEmpty)) None
      else {
        val mp = pairs.flatten.toMap
        if (mp.size == assigns.size &&
            t.schema.fieldNames.forall(mp.contains)) Some(mp) else None
      }
    }
    // star = every target column from the same-named source column
    def star(): Option[Map[String, Expression]] = {
      val byName = m.sourceTable.output.groupBy(_.name)
      val pairs = t.schema.fieldNames.toSeq.map { n =>
        byName.get(n).collect { case Seq(a) => n -> (a: Expression) }
      }
      if (pairs.exists(_.isEmpty)) None else Some(pairs.flatten.toMap)
    }
    val up = m.matchedActions match {
      case Seq(UpdateStarAction(None)) => star()
      case Seq(UpdateAction(None, assigns, _)) => fullRow(assigns)
      case _ => None
    }
    val ins = m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => star()
      case Seq(InsertAction(None, assigns)) => fullRow(assigns)
      case _ => None
    }
    (up, ins) match {
      case (Some(u), Some(i))
          // upsert writes ONE row image for both outcomes: update and
          // insert must agree column by column
          if t.schema.fieldNames.forall(n => u(n).semanticEquals(i(n))) =>
        val tz = Some(conf.sessionLocalTimeZone)
        val batch = Project(t.schema.fields.toSeq.map { f =>
          Alias(Cast(u(f.name), f.dataType, tz), f.name)()
        }, m.sourceTable)
        Some(GraftMergeCommand(t, batch, keyCol))
      case _ => None
    }
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
    // stats planning for free: the convertible conjuncts of the SQL
    // predicate ARE implied bounds, so a clustered/bloomed table only
    // scans candidate files (`DELETE WHERE day = X` touches X's files,
    // not the lake)
    if (ManifestStore.deleteWhere(session, table.dir, table.schema,
        ManifestRowLevel.byName(condition),
        planRanges = ManifestRead.toRanges(Seq(condition))).isEmpty)
      throw new java.util.ConcurrentModificationException(
        s"DELETE FROM ${table.dir} lost a concurrent-commit race — retry")
    Seq.empty
  }
}

/** SQL MERGE (the canonical upsert shape) → one
  * [[ManifestStore.upsertKeyedDv]] commit. `batch` is the pre-analyzed
  * full-row projection of the MERGE source onto the target schema.
  */
private[sources] case class GraftMergeCommand(table: ManifestTableV2,
                                              batch: LogicalPlan,
                                              keyCol: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graft.StreamingShim.ofRows(session, batch)
    // MERGE updates EACH matched target row; the upsert rewrite emits one
    // image per key, so duplicate matched target keys must error rather
    // than silently collapse N rows to 1 (duplicate SOURCE keys already
    // error inside upsertKeyedDv)
    if (ManifestStore.upsertKeyedDv(session, table.dir, table.schema,
        df, keyCol, requireUniqueMatchedTarget = true).isEmpty)
      throw new java.util.ConcurrentModificationException(
        s"MERGE INTO ${table.dir} lost a concurrent-commit race — retry")
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
    if (ManifestStore.updateWhere(session, table.dir, table.schema, cond, set,
        planRanges = ManifestRead.toRanges(condition.toSeq)).isEmpty)
      throw new java.util.ConcurrentModificationException(
        s"UPDATE ${table.dir} lost a concurrent-commit race — retry")
    Seq.empty
  }
}

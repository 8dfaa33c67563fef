package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType

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
    // ADD CONSTRAINT … CHECK: Spark's own strategy runs the existing-row
    // validation scan and the alterTable call, matching on the v2
    // relation — splicing it out from underneath would leave the command
    // plan-less ("No plan for AddCheckConstraint")
    case ac: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint => ac
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

  /** SQL `MERGE INTO graft.{dir} t USING src s ON <cond> WHEN …` — the
    * FULL clause surface — compiles to one [[GraftMergeCommand]] running
    * [[ManifestStore.mergeRows]]: an atomic `merge-dv` commit (matched
    * rows tombstone through deletion vectors, update/insert images append
    * as fresh files). Supported: any number of `WHEN MATCHED [AND cond]
    * THEN UPDATE SET … | DELETE` (star or partial SET), `WHEN NOT MATCHED
    * [AND cond] THEN INSERT` (star or an explicit column list; unassigned
    * columns null-fill, the Delta convention),
    * `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE | DELETE`,
    * first-match-wins, arbitrary and multi-column ON conditions
    * (equality conjuncts become manifest pruning keys), and duplicate
    * matched TARGET keys (row-preserving, per standard MERGE; duplicate
    * matched SOURCE rows are a cardinality violation and error at
    * execution). Clause conditions and assignment values may carry
    * UNCORRELATED subqueries (scalar, EXISTS, single-column source-side
    * IN — see the rekeySub note below; Delta refuses all of these).
    * Refused (None → Spark's own unsupported-MERGE error, never silently
    * different semantics): nested-field assignment, subqueries in the ON
    * condition, correlated subqueries.
    *
    * Clause expressions re-key for the command's own fresh scan: target
    * attributes by their column name, source attributes under the `__s_`
    * prefix (the command projects its source frame the same way), so the
    * two sides can never collide whatever the user called them.
    */
  private def rewriteMerge(m: MergeIntoTable): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, InsertStarAction, MergeAction, UpdateAction, UpdateStarAction}
    val t = m.targetTable match {
      case ManifestTarget(t0) => t0
      case _ => return None
    }
    val tgtOut = m.targetTable.outputSet
    val srcOut = m.sourceTable.outputSet
    if (m.sourceTable.output.exists(a => a.name.startsWith("__s_") ||
        a.name.startsWith("__graft")) ||
        t.schema.fieldNames.exists(n => n.startsWith("__s_") ||
          n.startsWith("__graft"))) return None // helper-prefix collision
    // carried expressions stay RESOLVED (CheckAnalysis walks the command's
    // fields); the command re-keys them onto its fresh scans at RUN time.
    // Subqueries in the ON condition are refused — pruning-key derivation
    // and the staged join cannot carry them.
    def rekey(e: Expression): Option[Expression] =
      if (!e.resolved || SubqueryExpression.hasSubquery(e)) None else Some(e)
    // CLAUSE conditions and assignment values additionally admit
    // UNCORRELATED subqueries (round 13; Delta refuses these): each is a
    // runtime CONSTANT with respect to the merged rows, so it extracts
    // into a resolved placeholder attribute plus a carried plan —
    // scalar/EXISTS evaluate once at run time, `x IN (subquery)` pre-joins
    // the subquery into the staged source relation (the scalable form; x
    // must reference only SOURCE columns — a target-side IN belongs in
    // the source query). Correlated subqueries, multi-column IN, and
    // nested subqueries inside the IN probe still refuse.
    val subqs = scala.collection.mutable.ArrayBuffer.empty[MergeSubquery]
    def rekeySub(e: Expression): Option[Expression] = {
      if (!e.resolved) return None
      var ok = true
      val out = e.transformDown {
        case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery
            if s.outerAttrs.isEmpty && s.joinCond.isEmpty =>
          val nm = s"__graft_subq_${subqs.size}"
          subqs += MergeSubquery(nm, "scalar", s.plan, None, s.dataType)
          AttributeReference(nm, s.dataType)()
        case s: org.apache.spark.sql.catalyst.expressions.Exists
            if s.outerAttrs.isEmpty && s.joinCond.isEmpty =>
          val nm = s"__graft_subq_${subqs.size}"
          subqs += MergeSubquery(nm, "exists", s.plan, None,
            org.apache.spark.sql.types.BooleanType)
          AttributeReference(nm, org.apache.spark.sql.types.BooleanType)()
        case in @ org.apache.spark.sql.catalyst.expressions.InSubquery(values, lq)
            if lq.outerAttrs.isEmpty && lq.joinCond.isEmpty &&
              values.size == 1 && values.head.references.subsetOf(srcOut) &&
              !SubqueryExpression.hasSubquery(values.head) =>
          val nm = s"__graft_subq_${subqs.size}"
          subqs += MergeSubquery(nm, "in", lq.plan, Some(values.head),
            org.apache.spark.sql.types.BooleanType)
          AttributeReference(nm, org.apache.spark.sql.types.BooleanType)()
        case s: SubqueryExpression => ok = false; s
      }
      if (ok) Some(out) else None
    }
    val byName = m.sourceTable.output.groupBy(_.name)
    // WITH SCHEMA EVOLUTION: source-only columns WIDEN the target schema
    // (nullable adds — the only evolution the manifest admits); ambiguous
    // duplicate source names refuse. The star expansion below then covers
    // the widened shape. Without evolution the schema is the table's own.
    val evolved: StructType =
      if (!m.withSchemaEvolution) t.schema
      else m.sourceTable.output
        .filterNot(a => t.schema.fieldNames.contains(a.name))
        .filter(a => byName(a.name).size == 1)
        .foldLeft(t.schema)((s0, a) => s0.add(a.name, a.dataType, nullable = true))
    // star = every (possibly widened) target column from the same-named
    // source column; under evolution a target-only column is simply
    // OMITTED from the assignment map (update keeps it, insert
    // null-fills — the Delta convention), without evolution it refuses
    def star(): Option[Seq[(String, Expression)]] = {
      val pairs = evolved.fieldNames.toSeq.map { n =>
        byName.get(n) match {
          case Some(Seq(a)) => Some(Some(n -> (a: Expression)))
          case Some(_) => None // ambiguous duplicate source column
          case None if m.withSchemaEvolution => Some(None) // keep/null-fill
          case None => None
        }
      }
      if (pairs.exists(_.isEmpty)) None else Some(pairs.flatten.flatten)
    }
    // the widened columns' source expressions — appended to STAR-born
    // assignment sets under evolution (Spark pre-expands `SET *` /
    // `INSERT *` over the PRE-evolution target columns; the fromStar flag
    // and the full-coverage insert signature recover the star intent)
    val addedPairs: Seq[(String, Expression)] =
      if (!m.withSchemaEvolution) Nil
      else evolved.fieldNames.toSeq.filterNot(t.schema.fieldNames.contains)
        .flatMap(n => byName.get(n).collect { case Seq(a) => n -> (a: Expression) })
    def assignsOf(assigns: Seq[Assignment]): Option[Seq[(String, Expression)]] = {
      val pairs = assigns.map {
        case Assignment(k: AttributeReference, v) if tgtOut.contains(k) =>
          rekeySub(v).map(k.name -> _)
        case _ => None // nested-field or non-attribute assignment key
      }
      if (pairs.exists(_.isEmpty)) None else Some(pairs.flatten)
    }
    // a WHEN clause → (condition, set): set None = DELETE, Some = UPDATE/
    // INSERT assignments; None (outer) = unsupported shape
    def clauseOf(a: MergeAction): Option[ClauseSpec] = a match {
      case DeleteAction(c) =>
        c.map(rekeySub) match {
          case Some(None) => None
          case rc => Some(ClauseSpec(rc.flatten, None))
        }
      case UpdateAction(c, assigns, fromStar) =>
        (c.map(rekeySub), assignsOf(assigns)) match {
          case (Some(None), _) | (_, None) => None
          case (rc, Some(set)) =>
            val full = if (fromStar) set ++ addedPairs else set
            Some(ClauseSpec(rc.flatten, Some(full)))
        }
      case UpdateStarAction(c) =>
        (c.map(rekeySub), star()) match {
          case (Some(None), _) | (_, None) => None
          case (rc, Some(set)) => Some(ClauseSpec(rc.flatten, Some(set)))
        }
      case InsertAction(c, assigns) =>
        (c.map(rekeySub), assignsOf(assigns)) match {
          case (Some(None), _) | (_, None) => None
          case (rc, Some(set)) =>
            // a full-coverage insert under evolution carries the widened
            // columns too (the star signature; InsertAction has no flag)
            val full =
              if (set.map(_._1).toSet == t.schema.fieldNames.toSet)
                set ++ addedPairs
              else set
            Some(ClauseSpec(rc.flatten, Some(full)))
        }
      case InsertStarAction(c) =>
        (c.map(rekeySub), star()) match {
          case (Some(None), _) | (_, None) => None
          case (rc, Some(set)) => Some(ClauseSpec(rc.flatten, Some(set)))
        }
      case _ => None
    }
    def clauses(as: Seq[MergeAction]): Option[Seq[ClauseSpec]] = {
      val cs = as.map(clauseOf)
      if (cs.exists(_.isEmpty)) None else Some(cs.flatten)
    }
    val cond = rekey(m.mergeCondition).getOrElse(return None)
    val matched = clauses(m.matchedActions).getOrElse(return None)
    val notMatched = clauses(m.notMatchedActions).getOrElse(return None)
    val bySource = clauses(m.notMatchedBySourceActions).getOrElse(return None)
    if (notMatched.exists(_.set.isEmpty)) return None // NOT MATCHED DELETE
    // ON-condition equality conjuncts `t.col = <src expr>` become manifest
    // pruning keys (stats/partitions/blooms narrow the candidate files)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val equiKeys = conjuncts(m.mergeCondition).flatMap {
      case EqualTo(l: AttributeReference, r)
          if tgtOut.contains(l) && r.references.subsetOf(srcOut) =>
        rekey(r).map(l.name -> _)
      case EqualTo(l, r: AttributeReference)
          if tgtOut.contains(r) && l.references.subsetOf(srcOut) =>
        rekey(l).map(r.name -> _)
      case _ => None
    }
    Some(GraftMergeCommand(t, m.sourceTable, cond, matched, notMatched,
      bySource, equiKeys,
      evolveTo = if (m.withSchemaEvolution &&
        evolved.length > t.schema.length) Some(evolved) else None,
      clauseSubqueries = subqs.toSeq))
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
    // DELETE with no WHERE (or WHERE true): drop the whole file list as
    // one metadata commit — zero scan, rows time-travelable until vacuum
    if (condition == org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral) {
      ManifestStore.deleteAll(session, table.dir)
      return Seq.empty
    }
    // stats planning for free: the convertible conjuncts of the SQL
    // predicate ARE implied bounds, so a clustered/bloomed table only
    // scans candidate files (`DELETE WHERE day = X` touches X's files,
    // not the lake)
    if (ManifestStore.deleteWhere(session, table.dir, table.schema,
        ManifestRowLevel.byName(condition),
        planRanges = ManifestRead.toRanges(Seq(condition)),
        // predicate ≡ its ranges → partition-covered files drop whole,
        // zero scan (the SQL retention-delete shape)
        exactRanges = ManifestRead.rangesExact(Seq(condition))).isEmpty)
      throw new java.util.ConcurrentModificationException(
        s"DELETE FROM ${table.dir} lost a concurrent-commit race — retry")
    Seq.empty
  }
}

/** One compiled WHEN clause: re-keyed condition (None = unconditional)
  * and assignment list (None = DELETE), see
  * [[ManifestV2Rewrite.rewriteMerge]].
  */
private[sources] case class ClauseSpec(cond: Option[Expression],
                                       set: Option[Seq[(String, Expression)]])

/** One extracted UNCORRELATED subquery from a MERGE clause condition or
  * assignment value: `name` is the resolved placeholder attribute spliced
  * where the subquery stood, `plan` the analyzed subquery, `value` the IN
  * probe expression (source-side refs only; None for scalar/EXISTS).
  * Resolved ONCE per MERGE at run time — see [[GraftMergeCommand]].
  */
private[sources] case class MergeSubquery(name: String, kind: String,
                                          plan: LogicalPlan,
                                          value: Option[Expression],
                                          dataType: org.apache.spark.sql.types.DataType)

/** SQL MERGE (full clause surface) → one [[ManifestStore.mergeRows]]
  * `merge-dv` commit. Carried expressions stay resolved against the
  * original target/source relations (the analyzed plan must pass
  * CheckAnalysis); at run time they re-key onto the command's own fresh
  * scans ([[ManifestRowLevel.byName]]-style): source attributes — spotted
  * by exprId against `source.output` — become `__s_<name>` lookups, all
  * others become target-name lookups, and the source frame itself is
  * evaluated once projected onto the same `__s_` names, so the two sides
  * can never collide whatever the user called them.
  */
private[sources] case class GraftMergeCommand(table: ManifestTableV2,
                                              source: LogicalPlan,
                                              cond: Expression,
                                              matched: Seq[ClauseSpec],
                                              notMatched: Seq[ClauseSpec],
                                              bySource: Seq[ClauseSpec],
                                              equiKeys: Seq[(String, Expression)],
                                              evolveTo: Option[StructType] = None,
                                              clauseSubqueries: Seq[MergeSubquery] = Nil)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    // WITH SCHEMA EVOLUTION: widen first (idempotent metadata commit —
    // a lost race on identical widening is harmless), merge under the
    // widened schema
    val mergeSchema = evolveTo.map { w =>
      ManifestStore.evolveSchema(session, table.dir, w); w
    }.getOrElse(table.schema)
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    import org.apache.spark.sql.functions.{col, lit, when}
    import org.apache.spark.sql.graft.StreamingShim.{column, expressionOf, ofRows}
    val srcIds = AttributeSet(source.output)
    // placeholder-name → replacement expression, filled by the subquery
    // resolution below; rekeyed() substitutes these FIRST
    val repl = scala.collection.mutable.Map.empty[String, Expression]
    def rekeyed(e: Expression): org.apache.spark.sql.Column =
      column(e.transform {
        case a: AttributeReference if repl.contains(a.name) => repl(a.name)
        case a: AttributeReference if srcIds.contains(a) =>
          UnresolvedAttribute.quoted(s"__s_${a.name}")
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      })
    def clause(c: ClauseSpec): ManifestStore.MergeClause =
      ManifestStore.MergeClause(c.cond.map(rekeyed),
        c.set.map(_.map { case (n, e) => n -> rekeyed(e) }.toMap))
    var srcDf = ofRows(session, source).select(source.output.map(a =>
      column(a).as(s"__s_${a.name}")): _*)
    // resolve carried uncorrelated subqueries ONCE per MERGE — they are
    // constants with respect to the merged rows. Scalar/EXISTS evaluate
    // here (one job each); IN pre-joins the subquery into the staged
    // source relation and reduces to a boolean hit column with exact
    // three-valued IN semantics (empty set → FALSE even for a null probe;
    // null probe against a non-empty set → NULL; no hit but the set has a
    // null → NULL; else FALSE) — the scalable form: the subquery is
    // joined, never collected.
    clauseSubqueries.zipWithIndex.foreach { case (sq, i) => sq.kind match {
      case "scalar" =>
        val rows = ofRows(session, sq.plan).limit(2).collect()
        if (rows.length > 1) throw new IllegalStateException(
          s"[GRAFT_SCALAR_SUBQUERY] a scalar subquery in a MERGE clause of " +
            s"${table.dir} returned more than one row")
        repl(sq.name) = org.apache.spark.sql.catalyst.expressions.Literal
          .create(rows.headOption.map(_.get(0)).orNull, sq.dataType)
      case "exists" =>
        repl(sq.name) = org.apache.spark.sql.catalyst.expressions.Literal(
          !ofRows(session, sq.plan).isEmpty)
      case "in" =>
        val sub = ofRows(session, sq.plan).toDF("k")
        val st = sub.agg(
          org.apache.spark.sql.functions.count(lit(1)).as("n"),
          org.apache.spark.sql.functions.count(col("k")).as("nn")).head()
        val subEmpty = st.getLong(0) == 0L
        val hasNull = st.getLong(1) < st.getLong(0)
        val hitCol = s"__s_graft_subq_${i}_hit"
        val keyCol = s"__graft_subq_${i}_key"
        val probe = rekeyed(sq.value.get) // source-side refs → __s_ names
        if (!subEmpty) {
          val keyed = sub.where(col("k").isNotNull).distinct()
            .select(col("k").as(keyCol), lit(true).as(hitCol))
          srcDf = srcDf.join(keyed, probe === col(keyCol), "left").drop(keyCol)
        }
        repl(sq.name) = expressionOf(
          if (subEmpty) lit(false)
          else when(probe.isNull, lit(null).cast("boolean"))
            .when(col(hitCol).isNotNull, lit(true))
            .otherwise(if (hasNull) lit(null).cast("boolean") else lit(false)))
    }}
    if (ManifestStore.mergeRows(session, table.dir, mergeSchema,
        srcDf, rekeyed(cond), matched.map(clause),
        notMatched.map(clause), bySource.map(clause),
        equiKeys.map { case (n, e) => n -> rekeyed(e) }).isEmpty)
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing (the Deequ/expectations shape): a
  * rule suite evaluated in ONE pass, and referential-integrity checks as
  * anti-join counts. These are the admission gates a 100 TB ingest runs
  * before data is allowed near training: cheap, single-scan, and their
  * output is a small report table rather than a verdict-per-row.
  */
object Audit {

  /** Evaluate row-level rules in one aggregation pass: each rule is a
    * boolean `Column` predicate; a row VIOLATES a rule when the predicate
    * is not definitely true (`NOT coalesce(pred, false)` — a predicate
    * that evaluates to null, e.g. a range check on a null column, counts
    * as a violation; write `isNull || …` to exempt nulls explicitly).
    *
    * Scale: all rules fold into a single partially-aggregated scan —
    * adding a rule adds one sum slot, not a pass. The report is
    * |rules| rows.
    */
  def ruleAudit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    // slots are indexed by POSITION, not name: a dotted rule name inside
    // col() would parse as a struct-field access, and duplicate names
    // would alias ambiguously — the name appears only as an output literal
    val aggs = count(lit(1)).as("_n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"_v_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col("_n").as("n_rows"),
          col(s"_v_$i").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"),
        graft.functions.Portable.roundPortable(col("r.n_violations").cast("double") /
          col("r.n_rows").cast("double"), 6).as("violation_rate"))
  }

  /** [[refIntegrity]] for several edges sharing ONE child table: the
    * child is scanned ONCE, each parent's distinct key set left-joins in
    * (distinct ⇒ at most one match ⇒ row count preserved), and a single
    * aggregation counts every edge's orphans — for a fact table with k
    * FKs this is 1 scan instead of k (q90's lineitem carries three).
    * Small parents broadcast under AQE, making the whole report one
    * map-side pass over the child.
    */
  def refIntegrityShared(child: DataFrame,
                         edges: Seq[(String, String, DataFrame, String)])
      : DataFrame = {
    require(edges.nonEmpty, "at least one edge")
    val childKeys = edges.map(_._2).distinct
    val keyed = edges.zipWithIndex.foldLeft(child.select(childKeys.map(col): _*)) {
      case (acc, ((_, childKey, parent, parentKey), i)) =>
        acc.join(parent.select(col(parentKey).as(s"_pk$i")).distinct(),
          col(childKey) === col(s"_pk$i"), "left")
    }
    val aggs = count(lit(1)).as("_n") +: edges.zipWithIndex.map { case (_, i) =>
      coalesce(sum(when(col(s"_pk$i").isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"_o$i") // empty child: 0 orphans, not a NULL sum-of-nothing
    }
    keyed.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(edges.zipWithIndex.map { case ((name, _, _, _), i) =>
        struct(lit(name).as("edge"), col("_n").as("n_rows"),
          col(s"_o$i").as("n_orphans"))
      }: _*)).as("r"))
      .select(col("r.edge"), col("r.n_rows"), col("r.n_orphans"),
        // an EMPTY child table has n_rows = 0: the rate is undefined (NULL,
        // as the SQL division yields) — unguarded, ANSI mode would throw
        when(col("r.n_rows") > 0,
          graft.functions.Portable.roundPortable(col("r.n_orphans").cast("double") / col("r.n_rows").cast("double"), 6))
          .as("orphan_rate"))
  }

  /** Referential-integrity report: for each named edge (childKey must
    * exist in parentKey), the child row count, orphan count, and rate.
    * Each edge is a distinct-parent anti-join — the exact form; at corpus
    * scale the parent key set rides a broadcast when small and a shuffle
    * otherwise, and a bloom pre-filter ([[graft.operators.Merge]]'s
    * `historyDeltaBloom` pattern) can screen the child first when orphans
    * are rare. Report is |edges| rows.
    */
  def refIntegrity(edges: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(edges.nonEmpty, "at least one edge")
    edges.map { case (name, child, childKey, parent, parentKey) =>
      // one scan per edge: outer-join the distinct parent keys and count
      // rows + unmatched in a single aggregation (a separate anti-join
      // count would re-scan the child and join two 1-row aggregates —
      // which Catalyst folds into a nested-loop join)
      child.select(col(childKey).as("_ck"))
        .join(parent.select(col(parentKey).as("_pk")).distinct(),
          col("_ck") === col("_pk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(col("_pk").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_orphans")) // empty child: 0 orphans, not a NULL sum
        .select(lit(name).as("edge"), col("n_rows"), col("n_orphans"),
          when(col("n_rows") > 0, // empty child: NULL rate, not a throw
            graft.functions.Portable.roundPortable(col("n_orphans").cast("double") / col("n_rows").cast("double"), 6))
            .as("orphan_rate"))
    }.reduce(_ unionByName _)
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-boundary data-quality expectations for [[ManifestStore]] tables —
  * the contract layer between a pipeline and the tables it feeds (Delta
  * CHECK constraints / DLT expectations, re-expressed over the manifest
  * format). An [[Expectation]] is a named row predicate; a checked append
  * evaluates every expectation over the incoming batch and either refuses
  * the whole commit (`FailFast` — constraint semantics: the table can never
  * hold a violating row) or splits violators into a quarantine table
  * (`Quarantine` — dead-letter semantics: clean rows commit, violators land
  * in a sibling manifest table tagged with the expectations they failed,
  * preserving them for inspection/replay instead of silently dropping).
  *
  * Scale: one marker column per expectation, computed map-side; violation
  * counts are a single partially-aggregated pass collapsing to ONE row
  * (|expectations| longs); the split is two filters over the same marked
  * batch — no shuffle beyond what the writes themselves do, no
  * per-expectation scans. The quarantine table is an ordinary
  * [[ManifestStore]] table: same commit protocol, time travel, CDC.
  */
object Expectations {

  /** A named row-level expectation. `predicate` must hold for a row to be
    * admitted; NULL evaluates as a VIOLATION (three-valued logic would
    * otherwise wave unknowns through a quality gate).
    */
  final case class Expectation(name: String, predicate: Column)

  sealed trait OnViolation
  /** Refuse the whole commit if any row violates any expectation. */
  case object FailFast extends OnViolation
  /** Commit clean rows; append violators to the quarantine table. */
  case object Quarantine extends OnViolation

  /** Outcome of a checked append: the committed version for the clean rows
    * (None when FailFast refused, or when every row was quarantined and
    * nothing remained to commit), the per-expectation violation counts,
    * and the number of rows quarantined.
    */
  final case class CheckedCommit(version: Option[Long],
                                 violations: Map[String, Long],
                                 quarantined: Long)

  /** Thrown by FailFast: carries the per-expectation violation counts. */
  final class ExpectationViolation(val violations: Map[String, Long])
    extends RuntimeException(
      "expectations violated: " + violations.toSeq.sortBy(_._1)
        .map { case (n, c) => s"$n=$c" }.mkString(", "))

  private def markerCol(i: Int) = s"__exp_$i"

  /** Mark each row with one boolean per expectation (true = violated;
    * NULL predicate counts as violated).
    */
  private def marked(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    exps.zipWithIndex.foldLeft(df) { case (d, (e, i)) =>
      d.withColumn(markerCol(i), !coalesce(e.predicate, lit(false)))
    }

  /** Per-expectation violation counts over `df` — one partial-agg pass to
    * a single row. Exposed for monitoring (report-only mode: measure
    * violation rates without gating).
    */
  def violationCounts(df: DataFrame, exps: Seq[Expectation]): Map[String, Long] =
    countsOver(marked(df, exps), exps)._1

  /** One partial-agg pass over a marked batch → (per-expectation violation
    * counts, batch row count).
    */
  private def countsOver(m: DataFrame, exps: Seq[Expectation]): (Map[String, Long], Long) = {
    require(exps.nonEmpty, "at least one expectation")
    require(exps.map(_.name).distinct.size == exps.size, "duplicate expectation names")
    val row = m.agg(
      count(lit(1)).as("_n"),
      exps.indices.map(i =>
        sum(col(markerCol(i)).cast("long")).as(markerCol(i))): _*).head()
    (exps.zipWithIndex.map { case (e, i) =>
      e.name -> (if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1))
    }.toMap, row.getLong(0))
  }

  /** Append `df` to the manifest table at `dir` under `exps`.
    *
    * FailFast: any violation refuses the WHOLE batch with
    * [[ExpectationViolation]] — the table's invariant is never weakened,
    * and the caller decides whether to fix or quarantine.
    *
    * Quarantine: violating rows (any expectation) append to the manifest
    * table at `quarantineDir` (default `<dir>_quarantine`) with two audit
    * columns — `_failed_expectations` (comma-joined names, stable order)
    * and `_batch_label` (caller-supplied provenance, e.g. a run id) — and
    * the clean remainder commits normally.
    */
  def appendChecked(df: DataFrame, dir: String, exps: Seq[Expectation],
                    onViolation: OnViolation = FailFast,
                    quarantineDir: Option[String] = None,
                    batchLabel: String = ""): CheckedCommit = {
    // materialize the marked batch once: the counts pass, the two filtered
    // writes, and the quarantine count otherwise each recompute the
    // batch's whole upstream derivation
    val m = graft.functions.Par.materialize(marked(df, exps))
    val (counts, nRows) = countsOver(m, exps)
    if (counts.values.sum == 0L) {
      val clean = m.drop(exps.indices.map(markerCol): _*)
      val v = ManifestStore.append(clean, dir)
      return CheckedCommit(Some(v), counts, 0L)
    }
    onViolation match {
      case FailFast => throw new ExpectationViolation(counts)
      case Quarantine =>
        val anyViolated = exps.indices.map(i => col(markerCol(i)))
          .reduce(_ || _)
        val clean = m.filter(!anyViolated).drop(exps.indices.map(markerCol): _*)
        val failedNames = concat_ws(",", exps.zipWithIndex.map { case (e, i) =>
          when(col(markerCol(i)), lit(e.name))
        }: _*)
        val bad = m.filter(anyViolated)
          .withColumn("_failed_expectations", failedNames)
          .withColumn("_batch_label", lit(batchLabel))
          .drop(exps.indices.map(markerCol): _*)
        val qDir = quarantineDir.getOrElse(dir + "_quarantine")
        ManifestStore.append(bad, qDir)
        val badCount = bad.count()
        val version =
          if (badCount == nRows) None
          else Some(ManifestStore.append(clean, dir))
        CheckedCommit(version, counts, badCount)
    }
  }
}

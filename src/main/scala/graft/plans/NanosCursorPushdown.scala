package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: derive parquet-pushable predicates for nanosecond scans.
  *
  * TIMESTAMP(NANOS) parquet columns are read as raw Long nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and converted with
  * `timestamp_micros(ts div 1000)`. A cursor predicate on the *converted*
  * column — `timestamp_micros(ts div 1000) > TIMESTAMP '…'` — is opaque to
  * parquet filter pushdown, so every incremental pull degenerates to a full
  * scan. This rule infers the equivalent raw-column conjunct
  * (`ts > cursor_nanos`), which pushes into row-group/page pruning.
  *
  * The original predicate is kept and the derived one is ADDED as a
  * conjunct (the `InferFiltersFromConstraints` pattern): the derived bound
  * only has to be implied by the original, so correctness never depends on
  * the rewrite being tight. Bounds are exact for strictly-positive
  * (post-epoch, m >= 1 µs) literals, which is the guard under which `div`'s
  * truncation-toward-zero agrees with floor division. m = 0 is excluded:
  * micros(n) = 0 holds for n in [-999, 999] under truncation, so the
  * `>=`/`=` lower bound n > -1 would wrongly reject pre-epoch n in
  * [-999, -1] that the original predicate accepts:
  *
  *   micros(n) >  M  ⟺  n > 1000·M + 999
  *   micros(n) >= M  ⟺  n > 1000·M − 1
  *   micros(n) <  M  ⟺  n < 1000·M
  *   micros(n) <= M  ⟺  n < 1000·(M+1)
  */
object NanosCursorPushdown extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(<long attr> div 1000)` and yields the attr. */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case MicrosToTimestamp(IntegralDivide(a: AttributeReference, d, _))
          if a.dataType == LongType && d.foldable && isThousand(d.eval()) => Some(a)
      case _ => None
    }
    private def isThousand(v: Any): Boolean = v match {
      case l: Long => l == 1000L
      case i: Int => i == 1000
      case _ => false
    }
  }

  /** Timestamp literal in Catalyst = Long micros since epoch. m >= 1: at
    * m = 0 the derived `>=`/`=` lower bound is unsound for pre-epoch nanos
    * (see class doc).
    */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(m: Long, TimestampType) if m >= 1 && m < Long.MaxValue / 1000 - 1 =>
        Some(m)
      case _ => None
    }
  }

  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThan(MicrosOfNanos(a), TsLit(m)) => Some(GreaterThan(a, Literal(1000 * m + 999)))
    case GreaterThanOrEqual(MicrosOfNanos(a), TsLit(m)) => Some(GreaterThan(a, Literal(1000 * m - 1)))
    case LessThan(MicrosOfNanos(a), TsLit(m)) => Some(LessThan(a, Literal(1000 * m)))
    case LessThanOrEqual(MicrosOfNanos(a), TsLit(m)) => Some(LessThan(a, Literal(1000 * (m + 1))))
    case EqualTo(MicrosOfNanos(a), TsLit(m)) =>
      Some(And(GreaterThan(a, Literal(1000 * m - 1)), LessThan(a, Literal(1000 * (m + 1)))))
    // mirrored literal-on-left forms
    case GreaterThan(TsLit(m), MicrosOfNanos(a)) => Some(LessThan(a, Literal(1000 * m)))
    case GreaterThanOrEqual(TsLit(m), MicrosOfNanos(a)) => Some(LessThan(a, Literal(1000 * (m + 1))))
    case LessThan(TsLit(m), MicrosOfNanos(a)) => Some(GreaterThan(a, Literal(1000 * m + 999)))
    case LessThanOrEqual(TsLit(m), MicrosOfNanos(a)) => Some(GreaterThan(a, Literal(1000 * m - 1)))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val derived = existing.flatMap(derive)
        .filterNot(d => existing.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter((existing ++ derived).reduce(And), child)
  }
}

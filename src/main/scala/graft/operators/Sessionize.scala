package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event stream into sessions
  * wherever consecutive events are more than `gapSeconds` apart.
  *
  * The reference's change feed is exactly such a stream (per-entity rows
  * ordered by `updated_at`); session assembly is the standard first step of
  * behavioral / training-data aggregation over it.
  *
  * Scale design: one window pass — lag to flag session starts, running sum
  * to number them — is a single hash-partition shuffle on the key plus an
  * in-partition sort, the minimum any per-key ordered computation pays. No
  * self-join, no explode. Skewed keys (one user with millions of events)
  * sort within one partition; at that shape, pre-split by (key, day) and
  * stitch boundary sessions, or move to Structured Streaming's native
  * `session_window` which this operator mirrors semantically (same gap
  * rule), trading oracle-exact determinism for incremental state.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per-key session number, in time order) and
    * `is_session_start`. `tieCol` breaks timestamp ties so numbering is
    * total-ordered and replay-stable.
    */
  def byGap(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
            gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    val isStart = prev.isNull ||
      (unix_micros(col(tsCol)) - unix_micros(prev)) > gapSeconds * 1000000L
    df.withColumn("is_session_start", isStart)
      .withColumn("session_seq",
        sum(when(col("is_session_start"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: bounds, size, and an exact-decimal value sum —
    * the aggregation shape a feature pipeline derives from sessions.
    */
  def sessions(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
               gapSeconds: Long, valueCol: Option[String] = None): DataFrame = {
    val tagged = byGap(df, keys, tsCol, tieCol, gapSeconds)
    val aggs: Seq[Column] = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++
      valueCol.map(v => sum(col(v).cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .cast("double").as("sum_value"))
    tagged.groupBy((keys.map(col) :+ col("session_seq")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as built-ins, expressed as shuffle-minimal
  * compositions of native operators (no custom physical node needed — the
  * semantics decompose onto exchange + window / equi-join, which keeps both
  * inside whole-stage codegen and under AQE's control).
  *
  * The reference's feed is a timestamped change stream
  * (`services/mock_wms_api/app/main.py:221-241` serves rows ordered by
  * `updated_at`); correlating "state as of" and "activity within a window"
  * across such streams are the two standard temporal queries a warehouse
  * pipeline builds on top.
  */
object TimeJoin {

  /** Backward (inclusive) as-of join: attach to every left row the single
    * latest right row with the same `keys` and `right.tsCol <= left.tsCol`;
    * left rows with no prior right row survive with nulls (left-outer).
    * Ties on the right timestamp resolve to the largest `rightTie` value —
    * deterministic under duplicate timestamps.
    *
    * Scale design: the naive form is an inequality join (quadratic fan-out
    * per key, then a keep-latest window over the blown-up pairs). This
    * implementation never joins: tag both sides, union them, and take a
    * running `last(right_payload, ignoreNulls)` over a window sorted by
    * (ts, side, tie) within each key — ONE shuffle of |L|+|R| rows total,
    * the same exchange count as a plain groupBy. Right rows sort before
    * left rows at equal timestamps, which is what makes the bound
    * inclusive.
    *
    * `right` must carry `keys`, `tsCol`, `rightTie`, and `rightPayload`;
    * the payload columns are attached under their own names, so rename any
    * that would collide with `left`'s columns before calling.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, rightTie: String,
                   rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.intersect(leftCols).isEmpty,
      s"payload columns collide with left: ${rightPayload.intersect(leftCols)}")
    val reserved = Set("_tie", "_side", "_r", "_match")
    require(!leftCols.exists(reserved) && !rightPayload.exists(reserved),
      s"column names $reserved are reserved by asofBackward")
    val restCols = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    val tieType = right.schema(rightTie).dataType
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(tsCol), col(rightTie).cast(tieType).as("_tie"),
        lit(0).as("_side"), struct(rightPayload.map(col): _*).as("_r")) ++
        restCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(null).cast(tieType).as("_tie"),
        lit(1).as("_side"), lit(null).cast(rTagged.schema("_r").dataType).as("_r")) ++
        restCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Bounded range join: all (left, right) pairs with equal `keys` and
    * `right.rightTs` in the half-open window `(left.leftTs, left.leftTs +
    * windowSeconds]`. Column names of the two frames must be disjoint apart
    * from `keys`.
    *
    * Scale design: Spark plans a bare `l.key = r.key AND r.ts BETWEEN ...`
    * as an equi-join whose range predicate is a post-join filter — every
    * key's full |L|·|R| cross product materializes before filtering, which
    * dies on hot keys. Bucketizing the time axis at the window width bounds
    * the fan-out: each right point falls in exactly one bucket (no
    * duplicate pairs, no dedup pass), each left interval spans at most two
    * buckets (one `explode` of 2), and the join becomes a plain equi-join
    * on (keys, bucket) + exact residual filter. Candidate pairs shrink from
    * |L|·|R| per key to only those within ±1 window width — the same trick
    * as the shingle inverted index in NearDup, applied to time.
    */
  def pointsInWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key columns collide: $overlap")
    val wMicros = windowSeconds * 1000000L
    // pure Column arithmetic, no SQL-string interpolation (a column name
    // needing backticks would break expr() parsing): floor division via
    // (a - pmod(a, w)) / w — the subtraction makes the division exact, and
    // floor bucketing keeps the ±1-bucket adjacency the candidate join
    // relies on for any epoch sign
    def bucket(ts: String): org.apache.spark.sql.Column = {
      val m = unix_micros(col(ts))
      ((m - pmod(m, lit(wMicros))) / lit(wMicros)).cast("long")
    }
    val lb = left.withColumn("_b0", bucket(leftTs))
      .withColumn("_bucket", explode(array(col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    val rb = right.withColumn("_bucket", bucket(rightTs))
    lb.join(rb, keys :+ "_bucket")
      .filter(unix_micros(col(rightTs)) > unix_micros(col(leftTs)) &&
        unix_micros(col(rightTs)) <= unix_micros(col(leftTs)) + lit(wMicros))
      .drop("_bucket")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance: keep a grouped aggregate in step with a
  * changing base table by applying its change-data feed
  * ([[graft.sources.ManifestStore.changes]]) instead of recomputing from a
  * snapshot — the standard IVM discipline for the aggregates that are
  * SELF-MAINTAINABLE under deletes (count, sum, and anything derived from
  * them, e.g. avg = sum/count): an insert contributes +1/+x, a delete
  * −1/−x, and no base-table rescan is ever needed. min/max are NOT in this
  * family — a delete of the current extremum forces a per-key rescan — so
  * this operator deliberately does not offer them (maintain them as a
  * small top-k/heap sidecar or recompute per affected key).
  *
  * Scale shape: the feed batch collapses to one partial-aggregated delta
  * row per touched key (shuffle ∝ |touched keys|, map-side combined), then
  * one key-equality full-outer join against the state — which is the only
  * cost that grows with the view, and is exactly the join a bucketed /
  * manifest-committed state table co-locates. Keys whose count returns to
  * zero drop from the state, so a fully-retracted key leaves no tombstone.
  *
  * Sums ride DECIMAL(28,8): the delta is order-free (additions commute
  * exactly), so a maintained sum equals the recomputed sum bit-for-bit —
  * double addition would drift per maintenance step and make "maintained ≡
  * recomputed" unverifiable.
  */
object Ivm {

  /** One maintenance step: `state` (keys..., n_rows, total) advanced by a
    * CDC `feed` batch carrying `keys`, `valueCol`, and `_change_type`
    * (`insert` | `delete`). Either input may be empty; an empty state is
    * bootstrapped by the feed's inserts alone (maintenance from version 0
    * IS the initial build). Returns the new state.
    */
  def applyDelta(state: DataFrame, feed: DataFrame, keys: Seq[String],
                 valueCol: String): DataFrame = {
    val dec = "decimal(28,8)"
    // update_preimage/postimage (the shapes ManifestStore.changesKeyed
    // emits) are a retraction + re-assertion; any OTHER change type fails
    // loudly — an unmapped type silently dropping to a null sign would
    // corrupt the maintained view instead of erroring (round-4 advice)
    val sign = when(col("_change_type") === "insert", 1L)
      .when(col("_change_type") === "delete", -1L)
      .when(col("_change_type") === "update_postimage", 1L)
      .when(col("_change_type") === "update_preimage", -1L)
      .otherwise(raise_error(concat(
        lit("Ivm.applyDelta: unknown _change_type '"),
        col("_change_type"), lit("'"))))
    val delta = feed
      .select(keys.map(col) :+ sign.as("_s") :+ col(valueCol).as("_v"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_s")).as("_dn"),
        sum(col("_v").cast(dec) * col("_s")).as("_dt"))
    val s = state.select(keys.map(col) :+ col("n_rows") :+
      col("total").cast(dec).as("total"): _*)
    s.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("total"), lit(0).cast(dec)) +
          coalesce(col("_dt"), lit(0).cast(dec))).cast(dec).as("total")): _*)
      .filter(col("n_rows") > 0)
  }

  /** The recompute this maintenance must equal: the same aggregate from a
    * full snapshot. Exists so every consumer (and the spec) states the
    * equivalence against one canonical definition.
    */
  def recompute(snapshot: DataFrame, keys: Seq[String],
                valueCol: String): DataFrame =
    snapshot.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(28,8)")).as("total"))
}

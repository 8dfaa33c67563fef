package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Checkpointed consumption of a [[ManifestStore]] change feed: each follow
  * step hands the consumer exactly the versions committed since its last
  * acknowledged position, then advances the checkpoint — the incremental-
  * consumer loop (maintain a view, sync a replica, feed an index) without a
  * long-running streaming query.
  *
  * Delivery contract, same as the rest of the pipeline: AT-LEAST-ONCE from
  * the follower (a crash between `apply` and the checkpoint advance replays
  * the interval), EXACTLY-ONCE at any sink that is idempotent per interval.
  * The canonical exactly-once sink persists its state and the feed's
  * `to`-version in ONE atomic swap and skips intervals it has already
  * absorbed — see the IVM follow spec. The checkpoint is monotonic
  * (max-merge, like the watermark table) and per `consumer`, so independent
  * consumers follow one table at their own pace — PROVIDED each consumer
  * owns its own `checkpointDir` (or their steps are externally serialized).
  * A checkpoint advance is a read-modify-write over the whole checkpoint
  * table through [[StateStore.overwrite]]'s single-writer directory swap:
  * two consumers sharing one dir and advancing CONCURRENTLY can lose the
  * slower writer's row (checkpoint regression → interval replay — safe
  * only because delivery is at-least-once and sinks must be idempotent)
  * or fail the rename swap outright. One directory per consumer costs a
  * few bytes and removes the race entirely; a multi-writer checkpoint
  * table belongs in a [[ManifestStore]] (optimistic concurrency) instead.
  *
  * Scale: a follow step's planning cost is two manifest reads (checkpoint
  * row + current version); the data cost is the feed's — proportional to
  * what the followed commits touched, never to the table.
  */
object Cdc {

  private val ckSchema = StructType.fromDDL("consumer STRING, last_version BIGINT")

  /** The consumer's acknowledged position: every version ≤ this has been
    * applied (0 = nothing yet).
    */
  def lastProcessed(spark: SparkSession, checkpointDir: String,
                    consumer: String = "default"): Long =
    StateStore.read(spark, checkpointDir, ckSchema)
      .filter(col("consumer") === consumer)
      .select(col("last_version")).collect()
      .headOption.map(_.getLong(0)).getOrElse(0L)

  private def advance(spark: SparkSession, checkpointDir: String,
                      consumer: String, version: Long): Unit = {
    import spark.implicits._
    val incoming = Seq((consumer, version)).toDF("consumer", "last_version")
    val merged = StateStore.read(spark, checkpointDir, ckSchema)
      .unionByName(incoming)
      .groupBy(col("consumer"))
      .agg(max(col("last_version")).as("last_version")) // never regresses
    StateStore.overwrite(merged, checkpointDir)
  }

  /** One follow step: if the table has versions past the checkpoint, hand
    * `apply` the change feed `(from, to]` (plus the bounds), then advance
    * the checkpoint to `to`. Returns the processed interval, or None when
    * caught up. `apply` failing propagates WITHOUT advancing — the rerun
    * replays the same interval.
    */
  def followOnce(spark: SparkSession, dir: String, schema: StructType,
                 checkpointDir: String, consumer: String = "default")
                (apply: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = lastProcessed(spark, checkpointDir, consumer)
    val to = ManifestStore.currentSnapshot(spark, dir).map(_.version).getOrElse(0L)
    if (to <= from) None
    else {
      apply(ManifestStore.changes(spark, dir, from, to, schema), from, to)
      advance(spark, checkpointDir, consumer, to)
      Some((from, to))
    }
  }
}

package graft.operators

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.sources.{StateStore, TableStore}

/** Watermark control table (reference O-3/O-4;
  * `services/extractor/app/watermark_repo.py:18-64`, DDL `sql/init_dw.sql:2-9`).
  *
  * Semantics preserved exactly:
  *  - get: `last_success_time` for `(pipeline, entity)`, else the configured
  *    default epoch (`watermark_repo.py:38`).
  *  - upsert: `last_success_time = greatest(old, new)` — the watermark never
  *    moves backwards — but `last_success_run_id` is ALWAYS overwritten, even
  *    by a stale run. That quirk is asserted by the reference's own tests
  *    (`tests/integration/extractor/test_watermark_repo.py:48-65`), i.e. it is
  *    spec, so we replicate it (SURVEY.md §8 Q-4).
  */
class Watermark(spark: SparkSession, dir: String,
                store: TableStore = StateStore) {

  def table: DataFrame = store.read(spark, dir, Schemas.watermark)

  /** O-3 — read the saved watermark, falling back to `defaultStart`. */
  def get(pipeline: String, entity: String, defaultStart: Instant): Instant = {
    val row = table
      .filter(col("pipeline_name") === pipeline && col("entity") === entity)
      .select(col("last_success_time"))
      .collect()
    row.headOption.flatMap(r => Option(r.getTimestamp(0)).map(_.toInstant))
      .getOrElse(defaultStart)
  }

  /** O-4 — monotonic max-merge upsert of the watermark row. */
  def upsert(pipeline: String, entity: String, newWm: Instant, runId: String,
             now: Instant = Instant.now()): Unit = {
    import spark.implicits._
    val incoming = Seq((pipeline, entity, java.sql.Timestamp.from(newWm), runId,
      java.sql.Timestamp.from(now)))
      .toDF(Schemas.watermark.fieldNames.toIndexedSeq: _*)
    val merged = table.withColumn("_is_existing", lit(1))
      .unionByName(incoming.withColumn("_is_existing", lit(0)))
      .groupBy(col("pipeline_name"), col("entity"))
      .agg(
        // greatest(): the time never regresses (watermark_repo.py:53)...
        max(col("last_success_time")).as("last_success_time"),
        // ...but run_id/updated_at always take the newest write (Q-4).
        min_by(col("last_success_run_id"), col("_is_existing")).as("last_success_run_id"),
        min_by(col("updated_at"), col("_is_existing")).as("updated_at"))
    store.overwrite(merged, dir)
  }
}

package graft.pipeline

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Merge, Payload, RunLog}
import graft.sources.{Landing, StateStore, TableStore}

/** The staging run, wired as the reference's `services/staging/app/run.py:28-99`
  * (traced in SURVEY.md §3.2):
  *
  *   run-log start → landing read → payload+hash → history append (idempotent
  *   dedup) → latest upsert (newer-wins) → run-log success; failure → run-log
  *   failed + rethrow.
  *
  * Deviations, both recorded in SURVEY.md §8 as reference defects we fix:
  *  - Q-1: payload values are preserved (the reference nulls every
  *    non-timestamp scalar via a missing `return`).
  *  - Q-2: the empty-input branch genuinely early-returns instead of
  *    re-executing the load and double-logging success.
  */
final case class StagerConfig(landingRoot: String, stateRoot: String,
                              pipelineName: String = "wms_pipeline")

final case class StageResult(entity: String, runId: String, rowsIn: Long,
                             rowsInsertedHistory: Long, rowsUpsertedLatest: Long)

class Stager(spark: SparkSession, cfg: StagerConfig,
             store: TableStore = StateStore) {

  private val runLog = new RunLog(spark, s"${cfg.stateRoot}/pipeline_run_log", store)

  def historyDir(entity: String): String = s"${cfg.stateRoot}/stg_${entity}_history"
  def latestDir(entity: String): String = s"${cfg.stateRoot}/stg_$entity"

  def history(entity: String, like: DataFrame): DataFrame =
    store.read(spark, historyDir(entity), like.schema)
  def latest(entity: String, like: DataFrame): DataFrame =
    store.read(spark, latestDir(entity), like.schema)

  def run(entity: String, runId: String, now: Instant = Instant.now()): StageResult = {
    runLog.start(runId, cfg.pipelineName, entity, startedAt = now)
    try {
      val landed = Landing.read(spark, cfg.landingRoot, entity, runId)
      val rowsIn = landed.count()
      if (rowsIn == 0) { // Q-2 fix: true early return
        runLog.finishSuccess(runId, 0, 0, 0, endedAt = now)
        return StageResult(entity, runId, 0, 0, 0)
      }
      val records = Payload.withPayloadAndHash(landed)

      // O-11: append only rows whose (id, updated_at, payload_hash) is new.
      val hist = history(entity, records)
      val delta = Merge.historyDelta(hist, records)
      val nHist = delta.count()
      if (nHist > 0) store.append(delta, historyDir(entity))

      // O-12: newer-wins merge into the latest-state table.
      val cur = latest(entity, records)
      val nLatest = Merge.upsertDelta(cur, records).count()
      val merged = Merge.latestUpsert(cur, records)
      store.overwrite(merged, latestDir(entity))

      runLog.finishSuccess(runId, rowsIn, nHist, nLatest, endedAt = now)
      StageResult(entity, runId, rowsIn, nHist, nLatest)
    } catch {
      case e: Throwable =>
        runLog.finishFailed(runId, Option(e.getMessage).getOrElse(e.toString), endedAt = now)
        throw e
    }
  }
}

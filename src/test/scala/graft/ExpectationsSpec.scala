package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.{Expectations, ManifestStore}
import graft.sources.Expectations.{Expectation, FailFast, Quarantine}

/** Table-boundary expectations: FailFast refuses whole commits,
  * Quarantine splits violators into a sibling manifest table with audit
  * columns, and NULL predicates count as violations.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, score BIGINT, lang STRING")
  private val qSchema = StructType.fromDDL(
    "id BIGINT, score BIGINT, lang STRING, _failed_expectations STRING, _batch_label STRING")

  private def tmpDir(): String =
    Files.createTempDirectory("graft-expect").toString

  private val exps = Seq(
    Expectation("score_nonneg", $"score" >= 0),
    Expectation("lang_known", $"lang".isin("en", "de", "fr")))

  test("clean batch commits; counts all zero") {
    val dir = tmpDir()
    val r = Expectations.appendChecked(
      Seq((1L, 5L, "en"), (2L, 0L, "de")).toDF("id", "score", "lang"),
      dir, exps)
    assert(r.version === Some(1L) && r.quarantined === 0L)
    assert(r.violations === Map("score_nonneg" -> 0L, "lang_known" -> 0L))
    assert(ManifestStore.read(spark, dir, schema).count() === 2L)
  }

  test("FailFast refuses the whole batch and commits nothing") {
    val dir = tmpDir()
    val batch = Seq((1L, 5L, "en"), (2L, -1L, "en"), (3L, 1L, "xx"))
      .toDF("id", "score", "lang")
    val e = intercept[Expectations.ExpectationViolation] {
      Expectations.appendChecked(batch, dir, exps, FailFast)
    }
    assert(e.violations === Map("score_nonneg" -> 1L, "lang_known" -> 1L))
    assert(ManifestStore.read(spark, dir, schema).isEmpty)
  }

  test("Quarantine commits clean rows, dead-letters violators with audit columns") {
    val dir = tmpDir()
    // id 2 fails one expectation, id 3 fails BOTH (null lang counts too)
    val batch = Seq(
      (1L, 5L, "en"), (2L, -1L, "en"), (3L, -7L, null.asInstanceOf[String]))
      .toDF("id", "score", "lang")
    val r = Expectations.appendChecked(batch, dir, exps, Quarantine,
      batchLabel = "run-42")
    assert(r.version === Some(1L) && r.quarantined === 2L)
    assert(r.violations === Map("score_nonneg" -> 2L, "lang_known" -> 1L))
    assert(ManifestStore.read(spark, dir, schema)
      .as[(Long, Long, String)].collect().toSet === Set((1L, 5L, "en")))
    val q = ManifestStore.read(spark, dir + "_quarantine", qSchema)
      .select($"id", $"_failed_expectations", $"_batch_label")
      .as[(Long, String, String)].collect().toMap2
    assert(q(2L) === (("score_nonneg", "run-42")))
    assert(q(3L) === (("score_nonneg,lang_known", "run-42")))
  }

  test("all-violating batch quarantines everything and commits no version") {
    val dir = tmpDir()
    val r = Expectations.appendChecked(
      Seq((1L, -1L, "en")).toDF("id", "score", "lang"), dir, exps, Quarantine)
    assert(r.version === None && r.quarantined === 1L)
    assert(ManifestStore.currentSnapshot(spark, dir).isEmpty)
    assert(ManifestStore.read(spark, dir + "_quarantine", qSchema).count() === 1L)
  }

  test("violationCounts is report-only: measures without writing") {
    val dir = tmpDir()
    val batch = Seq((1L, -1L, "xx")).toDF("id", "score", "lang")
    val counts = Expectations.violationCounts(batch, exps)
    assert(counts === Map("score_nonneg" -> 1L, "lang_known" -> 1L))
    assert(ManifestStore.currentSnapshot(spark, dir).isEmpty)
  }

  private implicit class ToMap2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}

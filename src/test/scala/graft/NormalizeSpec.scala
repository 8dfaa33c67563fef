package graft

import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Dedup, Normalize}

/** Mirrors the behavioral contracts of the reference's
  * `tests/unit/extractor/test_normalize.py` (cited per-test).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val runId = "run-1"
  private val extractedAt = Instant.parse("2024-05-01T00:00:00Z")
  private val wmEffective = Instant.parse("2024-04-30T23:58:00Z")

  test("suffix convention: *_at → timestamp, *_date → date (test_normalize.py:59-113)") {
    val df = Seq(("2024-01-02T03:04:05", "2024-01-02")).toDF("updated_at", "po_date")
    val out = Normalize.parseTimeCols(df)
    assert(out.schema("updated_at").dataType == TimestampType)
    assert(out.schema("po_date").dataType == DateType)
    val r = out.head()
    assert(r.getTimestamp(0).toInstant == Instant.parse("2024-01-02T03:04:05Z"))
    assert(r.getDate(1).toString == "2024-01-02")
  }

  test("invalid time strings coerce to null, not error (normalize.py errors='coerce')") {
    val df = Seq(("not-a-time", "nope")).toDF("updated_at", "po_date")
    val r = Normalize.parseTimeCols(df).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("lines array flattens to lines_json and original is dropped (test_normalize.py:59-113)") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("a", Seq(Row("l1", 7L)), "x"),
        Row("b", null, "y")),
      StructType(Seq(
        StructField("id", StringType),
        StructField("lines", ArrayType(StructType(Seq(
          StructField("line_id", StringType), StructField("qty", LongType))))),
        StructField("note", StringType))))
    val out = Normalize.flattenNested(df)
    assert(out.columns.toSeq == Seq("id", "note", "lines_json"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(2) == """[{"line_id":"l1","qty":7}]""")
    assert(rows(1).isNullAt(2)) // null-preserving
  }

  test("missing required column raises (test_normalize.py:35-44)") {
    val df = Seq(("x")).toDF("id")
    val e = intercept[IllegalArgumentException](Normalize.requireFields(df))
    assert(e.getMessage.contains("updated_at"))
  }

  test("null required field raises with sample (test_normalize.py:47-56)") {
    val df = Seq(("a", "2024-01-01T00:00:00"), (null, "2024-01-01T00:00:00"))
      .toDF("id", "updated_at")
    val e = intercept[IllegalArgumentException](Normalize.requireFields(df))
    assert(e.getMessage.contains("null required fields"))
  }

  test("keep-last dedup on (id, updated_at): 3 rows → 2, latest arrival wins (test_normalize.py:60-82)") {
    // same (id, ts) twice with different note: the later-arriving note wins.
    val df = Seq(
      ("a", "2024-01-01T00:00:00", "first"),
      ("a", "2024-01-01T00:00:00", "second"),
      ("b", "2024-01-01T00:00:01", "only")).toDF("id", "updated_at", "note")
    val out = Normalize.normalizeRows(df, runId, extractedAt, wmEffective)
    assert(out.count() == 2)
    val a = out.filter($"id" === "a").head()
    assert(a.getAs[String]("note") == "second")
  }

  test("metadata columns injected (normalize.py:60-62)") {
    val df = Seq(("a", "2024-01-01T00:00:00")).toDF("id", "updated_at")
    val out = Normalize.normalizeRows(df, runId, extractedAt, wmEffective)
    val r = out.head()
    assert(r.getAs[String]("_run_id") == runId)
    assert(r.getAs[java.sql.Timestamp]("_extracted_at").toInstant == extractedAt)
    assert(r.getAs[java.sql.Timestamp]("_watermark_effective").toInstant == wmEffective)
  }

  test("empty input stays empty with full schema (test_normalize.py:12-21)") {
    val df = Seq.empty[(String, String)].toDF("id", "updated_at")
    val out = Normalize.normalizeRows(df, runId, extractedAt, wmEffective)
    assert(out.count() == 0)
    assert(out.columns.contains("_run_id"))
  }

  test("keepLastAgg ≡ keepLast under a total order") {
    val df = Seq(
      ("a", 1L, "x"), ("a", 3L, "y"), ("a", 2L, "z"), ("b", 9L, "w"))
      .toDF("id", "v", "payload")
    val viaWindow = Dedup.keepLast(df, Seq("id"), ordering = Seq($"v")).orderBy("id")
    val viaAgg = Dedup.keepLastAgg(df, Seq("id"), struct($"v")).orderBy("id")
    assert(viaWindow.collect().toSeq == viaAgg.collect().toSeq)
  }
}

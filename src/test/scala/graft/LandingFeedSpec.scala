package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Feed, StateMachine}
import graft.sources.Landing

/** Mirrors `tests/unit/extractor/test_writer_landing.py`,
  * `tests/unit/staging/test_reader_landing.py`, and the mock feed semantics
  * (M-1…M-5).
  */
class LandingFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String = Files.createTempDirectory("landing").toString

  private def sample = Seq(
    ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "r1",
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
    ("b", java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "r1",
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
    .toDF("id", "updated_at", "_run_id", "_extracted_at")

  test("landing write → hive layout; read round-trips (test_writer_landing.py:14-30)") {
    val root = tmpRoot()
    Landing.write(sample, root, "ib_receipts", "run1")
    assert(new java.io.File(s"$root/ib_receipts/run_id=run1").isDirectory)
    val back = Landing.read(spark, root, "ib_receipts", "run1")
    assert(back.count() == 2)
    assert(back.schema("updated_at").dataType.typeName == "timestamp")
  }

  test("landing write refuses overwrite (test_writer_landing.py:34-41)") {
    val root = tmpRoot()
    Landing.write(sample, root, "e", "run1")
    intercept[Exception](Landing.write(sample, root, "e", "run1"))
  }

  test("unknown format raises (test_writer_landing.py:8-11)") {
    intercept[IllegalArgumentException](Landing.write(sample, tmpRoot(), "e", "r", format = "json"))
  }

  test("CSV fallback re-coerces timestamps (test_reader_landing.py:17-38)") {
    val root = tmpRoot()
    Landing.write(sample, root, "e", "run1", format = "csv")
    val back = Landing.read(spark, root, "e", "run1")
    assert(back.schema("updated_at").dataType.typeName == "timestamp")
    assert(back.schema("_extracted_at").dataType.typeName == "timestamp")
  }

  test("missing run dir raises (test_reader_landing.py:41-44)") {
    intercept[java.io.FileNotFoundException](Landing.read(spark, tmpRoot(), "e", "nope"))
  }

  test("missing required columns raises (test_reader_landing.py:47-58)") {
    val root = tmpRoot()
    val bad = Seq(("a", 1)).toDF("id", "x")
    Landing.write(bad, root, "e", "run1")
    val e = intercept[IllegalArgumentException](Landing.read(spark, root, "e", "run1"))
    assert(e.getMessage.contains("updated_at"))
  }

  test("feed pagination: sorted, strict >, offset slicing (M-1…M-3, main.py:218-252)") {
    val df = (1 to 50).map(i => (f"id$i%03d", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")))
      .toDF("id", "updated_at")
    val cursor = lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:10"))
    val filtered = Feed.changedSince(df, cursor)
    assert(filtered.count() == 40) // strictly greater: :10 itself excluded
    val page2 = Feed.page(filtered, limit = 10, offset = 10).select("id").as[String].collect()
    assert(page2.head == "id021" && page2.length == 10)
    // keyset pagination reaches the same page boundary
    val seek = Feed.pageAfter(df, lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:20")),
      lit("id020"), limit = 10).select("id").as[String].collect()
    assert(seek.toSeq == page2.toSeq)
  }

  test("feed envelope: count is total filtered, not page size (M-4, main.py:231-234)") {
    val df = (1 to 30).map(i => (s"id$i", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")))
      .toDF("id", "updated_at")
    val filtered = Feed.changedSince(df, lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:05")))
    val env = Feed.envelope(filtered, limit = 10, offset = 0).head()
    assert(env.getAs[Long]("count") == 25)
    assert(env.getAs[Int]("limit") == 10)
  }

  test("status machines: chains advance, CANCELLED absorbing, unknown identity (M-5, main.py:185-207)") {
    val df = Seq("NEW", "PROCESSING", "FINISHED", "CANCELLED", "???").toDF("status")
    val ib = df.select(StateMachine.ibNextStatus($"status")).as[String].collect().toSeq
    assert(ib == Seq("PROCESSING", "FINISHED", "FINISHED", "CANCELLED", "???"))
    val ob = Seq("NEW", "PICKING", "PACKED", "CANCELLED").toDF("status")
      .select(StateMachine.obNextStatus($"status")).as[String].collect().toSeq
    assert(ob == Seq("READYTOPICK", "PICKED", "PACKED", "CANCELLED"))
  }
}

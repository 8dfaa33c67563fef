package graft

import java.nio.file.Files
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline._
import graft.sources.PagedFeed

/** End-to-end pipeline runs (SURVEY.md §3.1/§3.2) over local parquet state,
  * plus the paginated-feed client contracts from
  * `tests/unit/extractor/test_extract.py`.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** CDC-shaped source table: id, updated_at, status. */
  private def sourceDf(rows: (String, String, String)*): DataFrame =
    rows.map { case (i, t, st) => (i, ts(t), st) }.toDF("id", "updated_at", "status")

  private def mkPipeline(): (ExtractorConfig, Extractor, Stager) = {
    val root = Files.createTempDirectory("pipe").toString
    val cfg = ExtractorConfig(s"$root/landing", s"$root/state",
      defaultStart = Instant.parse("2024-01-01T00:00:00Z"))
    (cfg, new Extractor(spark, cfg), new Stager(spark, StagerConfig(s"$root/landing", s"$root/state")))
  }

  private def feedFrom(df: DataFrame): Instant => DataFrame =
    cursor => df.filter(col("updated_at") > lit(java.sql.Timestamp.from(cursor)))

  test("extract → stage end-to-end: history + latest populated, run logged") {
    val (cfg, ex, st) = mkPipeline()
    val src = sourceDf(
      ("a", "2024-02-01 10:00:00", "NEW"),
      ("b", "2024-02-01 11:00:00", "NEW"))
    val r1 = ex.runEntity("ib_receipts", "run1", feedFrom(src))
    assert(r1.rowsIn == 2)
    assert(r1.watermarkNew == Instant.parse("2024-02-01T11:00:00Z"))
    val s1 = st.run("ib_receipts", "run1")
    assert(s1.rowsInsertedHistory == 2 && s1.rowsUpsertedLatest == 2)
    assert(st.latest("ib_receipts", spark.emptyDataFrame).count() == 0 ||
      spark.read.parquet(st.latestDir("ib_receipts")).count() == 2)
  }

  test("incremental second run: only changed rows flow; latest reflects newest state") {
    val (cfg, ex, st) = mkPipeline()
    val v1 = sourceDf(("a", "2024-02-01 10:00:00", "NEW"), ("b", "2024-02-01 11:00:00", "NEW"))
    ex.runEntity("e", "run1", feedFrom(v1))
    st.run("e", "run1")
    // source evolves: a updated, c added; b unchanged
    val v2 = sourceDf(
      ("a", "2024-02-01 12:00:00", "PROCESSING"),
      ("b", "2024-02-01 11:00:00", "NEW"),
      ("c", "2024-02-01 12:30:00", "NEW"))
    val r2 = ex.runEntity("e", "run2", feedFrom(v2))
    // a (updated) + c (new) + b: b's 11:00:00 sits inside the 120 s lookback
    // behind the 11:00:00 watermark, so it is re-read (and deduped at staging).
    assert(r2.rowsIn == 3)
    val s2 = st.run("e", "run2")
    assert(s2.rowsInsertedHistory == 2 && s2.rowsUpsertedLatest == 2)
    val latest = spark.read.parquet(st.latestDir("e"))
    assert(latest.count() == 3)
    assert(latest.filter($"id" === "a").select("status").as[String].head() == "PROCESSING")
    val hist = spark.read.parquet(st.historyDir("e"))
    assert(hist.count() == 4) // a v1, b v1, a v2, c v1
  }

  test("full pipeline on the manifest backend: same results, versioned state") {
    import graft.sources.ManifestStore
    val root = Files.createTempDirectory("pipe-manifest").toString
    val cfg = ExtractorConfig(s"$root/landing", s"$root/state",
      defaultStart = Instant.parse("2024-01-01T00:00:00Z"))
    val store = ManifestStore.asTableStore
    val ex = new Extractor(spark, cfg, store)
    val st = new Stager(spark, StagerConfig(s"$root/landing", s"$root/state"), store)
    val v1 = sourceDf(("a", "2024-02-01 10:00:00", "NEW"), ("b", "2024-02-01 11:00:00", "NEW"))
    ex.runEntity("e", "run1", feedFrom(v1))
    st.run("e", "run1")
    val v2 = sourceDf(
      ("a", "2024-02-01 12:00:00", "PROCESSING"),
      ("b", "2024-02-01 11:00:00", "NEW"),
      ("c", "2024-02-01 12:30:00", "NEW"))
    ex.runEntity("e", "run2", feedFrom(v2))
    val s2 = st.run("e", "run2")
    assert(s2.rowsInsertedHistory == 2 && s2.rowsUpsertedLatest == 2)
    // results identical to the swap backend's (read back THROUGH the store)
    val latest = st.latest("e", sourceDf().select($"id", $"updated_at", $"status"))
    assert(latest.count() >= 3) // 3 ids + payload columns intact
    assert(latest.filter($"id" === "a").select("status").as[String].head() == "PROCESSING")
    // and the state tables are versioned: latest has one version per stage
    // run (overwrite), history one per non-empty append
    val latestVersions = ManifestStore.currentSnapshot(spark, st.latestDir("e")).get.version
    assert(latestVersions == 2L, s"latest at v$latestVersions")
    assert(ManifestStore.readVersion(spark, st.latestDir("e"), 1L,
      latest.schema).count() == 2) // time travel to the run1 state
  }

  test("staging rerun of the same run_id is idempotent (at-least-once extract, exactly-once effect)") {
    val (cfg, ex, st) = mkPipeline()
    ex.runEntity("e", "run1", feedFrom(sourceDf(("a", "2024-02-01 10:00:00", "NEW"))))
    val first = st.run("e", "run1")
    assert(first.rowsInsertedHistory == 1)
    val again = st.run("e", "run1")
    assert(again.rowsInsertedHistory == 0) // dedup: nothing new
    assert(again.rowsUpsertedLatest == 0)  // tie on updated_at: existing wins
    assert(spark.read.parquet(st.historyDir("e")).count() == 1)
  }

  test("lookback window re-reads late data; history dedup absorbs the overlap") {
    val (cfg, ex, st) = mkPipeline()
    val v1 = sourceDf(("a", "2024-02-01 10:00:00", "NEW"))
    ex.runEntity("e", "run1", feedFrom(v1))
    st.run("e", "run1")
    // run2 sees the same row again (inside the 120 s lookback) + a late row
    // that arrived with updated_at inside the lookback window.
    val v2 = sourceDf(
      ("a", "2024-02-01 10:00:00", "NEW"),           // replay, deduped at staging
      ("z", "2024-02-01 09:59:30", "NEW"))           // late arrival
    val r2 = ex.runEntity("e", "run2", feedFrom(v2))
    assert(r2.rowsIn == 2)
    val s2 = st.run("e", "run2")
    assert(s2.rowsInsertedHistory == 1) // only the late row is new
    assert(spark.read.parquet(st.latestDir("e")).count() == 2)
  }

  test("extractor refuses duplicate run_id (at-most-once landing per run)") {
    val (cfg, ex, _) = mkPipeline()
    val feed = feedFrom(sourceDf(("a", "2024-02-01 10:00:00", "NEW")))
    ex.runEntity("e", "run1", feed)
    intercept[Exception](ex.runEntity("e", "run1", feed))
  }

  test("empty incremental batch: watermark holds, staging logs success(0) and returns") {
    val (cfg, ex, st) = mkPipeline()
    ex.runEntity("e", "run1", feedFrom(sourceDf(("a", "2024-02-01 10:00:00", "NEW"))))
    st.run("e", "run1")
    val r2 = ex.runEntity("e", "run2", feedFrom(sourceDf())) // nothing changed
    assert(r2.rowsIn == 0)
    assert(r2.watermarkNew == r2.watermarkSaved)
    val s2 = st.run("e", "run2")
    assert(s2 == StageResult("e", "run2", 0, 0, 0))
  }

  test("failed staging run is recorded with status=failed and rethrown") {
    val (cfg, _, st) = mkPipeline()
    intercept[Exception](st.run("e", "missing-run"))
    val row = spark.read.parquet(s"${cfg.stateRoot}/pipeline_run_log")
      .filter($"run_id" === "missing-run").head()
    assert(row.getAs[String]("status") == "failed")
    assert(row.getAs[String]("error") != null)
  }

  // ---- PagedFeed client (test_extract.py contracts) ----

  private val feedSchema = StructType(Seq(
    StructField("id", StringType), StructField("updated_at", TimestampType)))

  private def mkRow(id: String, t: String) = Row(id, ts(t))

  test("pagination: multi-page concat with offset progression (test_extract.py:25-58)") {
    val all = (1 to 5).map(i => mkRow(s"id$i", f"2024-01-01 00:00:0$i"))
    var offsets = Seq.empty[Long]
    val rows = PagedFeed.fetchAll((_, limit, offset) => {
      offsets :+= offset
      PagedFeed.Page(all.slice(offset.toInt, offset.toInt + limit), all.size)
    }, Instant.EPOCH, limit = 2)
    assert(rows.size == 5)
    assert(offsets == Seq(0L, 2L, 4L)) // short page at 4 stops the loop
  }

  test("empty first page stops immediately (test_extract.py:61-76)") {
    val rows = PagedFeed.fetchAll((_, _, _) => PagedFeed.Page(Nil, 0), Instant.EPOCH)
    assert(rows.isEmpty)
  }

  test("runaway guard aborts at max offset (extract.py:86-87)") {
    val full = (1 to 500).map(i => mkRow(s"x$i", "2024-01-01 00:00:00")).toSeq
    val e = intercept[IllegalStateException](
      PagedFeed.fetchAll((_, _, _) => PagedFeed.Page(full, 1000000), Instant.EPOCH,
        limit = 500, maxOffset = 2000))
    assert(e.getMessage.contains("runaway"))
  }

  test("out-of-order feed raises (O-2, extract.py:17-27)") {
    val bad = Seq(mkRow("b", "2024-01-01 00:00:02"), mkRow("a", "2024-01-01 00:00:01"))
    intercept[IllegalStateException](
      PagedFeed.fetchAll((_, _, _) => PagedFeed.Page(bad, 2), Instant.EPOCH,
        tsIdx = 1, idIdx = 0))
  }

  test("retry: retryable errors retried with backoff, fatal ones not (http_client.py:19-58)") {
    var slept = Seq.empty[Long]
    var calls = 0
    val v = PagedFeed.withRetry(sleeper = ms => slept :+= ms) { () =>
      calls += 1
      if (calls < 3) throw new PagedFeed.RetryableFeedError("503") else 42
    }
    assert(v == 42 && calls == 3 && slept.size == 2)
    assert(slept(1) > slept(0) / 2) // exponential-ish growth with jitter
    intercept[RuntimeException](
      PagedFeed.withRetry(sleeper = _ => ())(() => throw new RuntimeException("fatal")))
  }

  test("retries exhausted → last retryable error surfaces") {
    var calls = 0
    intercept[PagedFeed.RetryableFeedError](
      PagedFeed.withRetry(maxRetries = 3, sleeper = _ => ()) { () =>
        calls += 1; throw new PagedFeed.RetryableFeedError("500")
      })
    assert(calls == 4) // initial + 3 retries
  }
}

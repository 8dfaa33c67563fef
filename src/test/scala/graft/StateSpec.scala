package graft

import java.nio.file.Files
import java.time.Instant
import org.apache.spark.sql.functions._
import graft.operators.{RunLog, Watermark}

/** Mirrors `tests/integration/extractor/test_watermark_repo.py` and the
  * run-log lifecycle of `pipeline_run_logs_repo.py`, with parquet state dirs
  * standing in for Postgres.
  */
class StateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("state").toString

  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private val t1 = Instant.parse("2024-01-02T00:00:00Z")
  private val t2 = Instant.parse("2024-01-03T00:00:00Z")

  test("watermark default when empty (test_watermark_repo.py:14-21)") {
    val wm = new Watermark(spark, tmpDir("wm"))
    assert(wm.get("p", "e", defaultStart = t0) == t0)
  }

  test("watermark first insert then read-back (test_watermark_repo.py:24-45,68-77)") {
    val wm = new Watermark(spark, tmpDir("wm"))
    wm.upsert("p", "e", t1, "run-1", now = t1)
    assert(wm.get("p", "e", defaultStart = t0) == t1)
  }

  test("greatest() keeps newer time but stale run overwrites run_id (test_watermark_repo.py:48-65, Q-4)") {
    val wm = new Watermark(spark, tmpDir("wm"))
    wm.upsert("p", "e", t2, "run-new", now = t1)
    wm.upsert("p", "e", t1, "run-stale", now = t2) // older watermark, later run
    assert(wm.get("p", "e", defaultStart = t0) == t2) // time did NOT regress
    val row = wm.table.filter($"pipeline_name" === "p").head()
    assert(row.getAs[String]("last_success_run_id") == "run-stale") // run_id DID
  }

  test("watermark rows are per (pipeline, entity)") {
    val wm = new Watermark(spark, tmpDir("wm"))
    wm.upsert("p", "e1", t1, "r1", now = t1)
    wm.upsert("p", "e2", t2, "r2", now = t1)
    assert(wm.get("p", "e1", t0) == t1)
    assert(wm.get("p", "e2", t0) == t2)
    assert(wm.table.count() == 2)
  }

  test("a reader racing the directory swap sees data, never a phantom-empty table") {
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("swap-race")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    graft.sources.StateStore.overwrite(df, dir)
    // simulate the mid-swap gap: dir renamed out (as overwrite does), a
    // writer thread completing the swap 150 ms later. Without the
    // in-flight-swap retry, read() returns an EMPTY table in the gap — for
    // a watermark that is a silent cursor reset and a full re-extract.
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir + ".old-racetest")
    assert(fs.rename(path, old))
    val writer = new Thread(() => { Thread.sleep(150); fs.rename(old, path): Unit })
    writer.start()
    val got = graft.sources.StateStore.read(spark, dir, df.schema)
    writer.join()
    assert(got.count() === 2, "reader hit the swap gap and saw a phantom-empty table")
  }

  test("run log lifecycle: running → success with counts (test_staging_repo.py:77-86)") {
    val rl = new RunLog(spark, tmpDir("rl"))
    rl.start("r1", "pipe", "e", startedAt = t0)
    assert(rl.table.filter($"run_id" === "r1").head().getAs[String]("status") == "running")
    rl.finishSuccess("r1", rowsIn = 10, rowsHist = 8, rowsLatest = 5, endedAt = t1)
    val row = rl.table.filter($"run_id" === "r1").head()
    assert(row.getAs[String]("status") == "success")
    assert(row.getAs[Long]("rows_inserted_history") == 8)
    assert(row.getAs[String]("error") == null)
  }

  test("run log start is ON CONFLICT DO NOTHING (pipeline_run_logs_repo.py:7-24)") {
    val rl = new RunLog(spark, tmpDir("rl"))
    rl.start("r1", "pipe", "e", startedAt = t0)
    rl.start("r1", "pipe", "e", startedAt = t2) // rerun keeps original started_at
    val rows = rl.table.filter($"run_id" === "r1").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[java.sql.Timestamp]("started_at").toInstant == t0)
  }

  test("run log failure truncates error to 4000 chars (pipeline_run_logs_repo.py:70)") {
    val rl = new RunLog(spark, tmpDir("rl"))
    rl.start("r1", "pipe", "e", startedAt = t0)
    rl.finishFailed("r1", "x" * 5000, endedAt = t1)
    val row = rl.table.filter($"run_id" === "r1").head()
    assert(row.getAs[String]("status") == "failed")
    assert(row.getAs[String]("error").length == 4000)
  }
}

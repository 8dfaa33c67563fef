package graft

import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{FeedRegistry, PagedFeed}

/** DataSource V2 feed connector: pushdown, partitioned scan, short name. */
class FeedSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("updated_at", TimestampType),
    StructField("status", StringType)))

  private def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d")

  /** 2400 rows, ordered by (updated_at, id); records observed cursors. */
  private def mkFeed(name: String): (Seq[Row], AtomicInteger, java.util.Set[String]) = {
    val all = (0 until 2400).map(i => Row(f"id$i%05d", ts(i), "NEW"))
    val calls = new AtomicInteger()
    val cursors = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    FeedRegistry.register(name, schema, (cursor, limit, offset) => {
      calls.incrementAndGet()
      cursors.add(cursor.map(_.toString).getOrElse("none"))
      val filtered = cursor match {
        case Some(c) => all.filter(_.getTimestamp(1).toInstant.isAfter(c))
        case None => all
      }
      PagedFeed.Page(filtered.slice(offset.toInt, offset.toInt + limit), filtered.size)
    })
    (all, calls, cursors)
  }

  test("full scan reads every row via the short name, partitioned by page range") {
    val (_, calls, _) = mkFeed("full")
    val df = spark.read.format("graft-feed")
      .option("feed", "full").option("pagesize", "100").option("pages_per_partition", "2")
      .load()
    assert(df.count() == 2400)
    // 2400 rows / (100×2 per partition) = 12 partitions + 1 planning probe;
    // each partition pulls 2 pages → ≥ 24 fetches. Mostly: parallelism happened.
    assert(df.rdd.getNumPartitions == 12)
    assert(calls.get() >= 25)
  }

  test("updated_at > cursor is pushed into the feed (PushedFilters visible, source sees cursor)") {
    val (_, _, cursors) = mkFeed("pushdown")
    val cutoff = java.sql.Timestamp.valueOf("2024-01-01 00:30:00")
    val df = spark.read.format("graft-feed").option("feed", "pushdown").load()
      .filter(col("updated_at") > lit(cutoff))
    val n = df.count()
    assert(n == all600(cutoff)) // strictly greater
    assert(cursors.contains("2024-01-01T00:30:00Z"), s"feed saw cursors: $cursors")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-feed"), plan.take(400))
  }

  private def all600(cutoff: java.sql.Timestamp): Long =
    (0 until 2400).count(i => ts(i).after(cutoff)).toLong

  test("residual filters still apply above the scan (pushdown is an optimization, not a contract)") {
    mkFeed("residual")
    val df = spark.read.format("graft-feed").option("feed", "residual").load()
      .filter(col("status") === "MISSING") // source ignores this predicate
    assert(df.count() == 0)
  }

  test("empty feed plans zero partitions") {
    FeedRegistry.register("empty", schema, (_, _, _) => PagedFeed.Page(Nil, 0))
    val df = spark.read.format("graft-feed").option("feed", "empty").load()
    assert(df.count() == 0)
  }

  test("unregistered feed fails with a clear message") {
    val e = intercept[Exception](
      spark.read.format("graft-feed").option("feed", "nope").load())
    assert(e.getMessage.contains("no registered feed"))
  }

  test("feed source composes with the extractor pipeline operators") {
    mkFeed("compose")
    val raw = spark.read.format("graft-feed").option("feed", "compose").load()
      .filter(col("updated_at") > lit(java.sql.Timestamp.valueOf("2024-01-01 00:35:00")))
    val normalized = graft.operators.Normalize.normalizeRows(raw, "run-x",
      Instant.parse("2024-02-01T00:00:00Z"), Instant.parse("2024-01-01T00:35:00Z"))
    assert(normalized.count() == raw.count())
    assert(normalized.columns.contains("_run_id"))
  }
}

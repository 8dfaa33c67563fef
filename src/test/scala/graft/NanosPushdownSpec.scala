package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.plans.NanosCursorPushdown

/** The nanos-cursor pushdown rule: derived predicates reach the parquet
  * scan and are exactly consistent with the original filter at µs/ns
  * boundaries.
  */
class NanosPushdownSpec extends SparkSpec {
  import spark.implicits._

  // nanos column values straddling the boundary t = 10:00:00.000001 (µs)
  private val microT = java.sql.Timestamp.valueOf("2024-01-01 10:00:00.000001")
  private val baseNs = microT.toInstant.getEpochSecond * 1000000000L + 1000L

  private def nanosTable(): String = {
    val dir = Files.createTempDirectory("nanos").toString + "/t"
    Seq(baseNs - 1000L, baseNs - 1L, baseNs, baseNs + 999L, baseNs + 1000L)
      .toDF("ts").write.parquet(dir)
    dir
  }

  private def converted(dir: String) =
    spark.read.parquet(dir).withColumn("tsc", timestamp_micros(expr("ts div 1000")))

  test("strict > at an exact µs boundary: rows at the cursor excluded, next µs included") {
    val df = converted(nanosTable()).filter(col("tsc") > lit(microT))
    // at cursor: baseNs, baseNs+999 (same µs) excluded; baseNs+1000 included
    assert(df.count() == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(s"GreaterThan(ts,${baseNs + 999}"), plan.take(600))
  }

  test(">=, <, <= and literal-on-left forms all stay exact") {
    val dir = nanosTable()
    def n(c: org.apache.spark.sql.Column): Long = converted(dir).filter(c).count()
    assert(n(col("tsc") >= lit(microT)) == 3)  // baseNs, +999, +1000
    assert(n(col("tsc") < lit(microT)) == 2)   // -1000, -1
    assert(n(col("tsc") <= lit(microT)) == 4)  // all but +1000? no: <=ts includes same µs
    assert(n(lit(microT) < col("tsc")) == 1)   // mirrored strict >
  }

  test("rule is idempotent (no conjunct accumulation across optimizer passes)") {
    val df = converted(nanosTable()).filter(col("tsc") > lit(microT))
    val once = NanosCursorPushdown(df.queryExecution.analyzed)
    val twice = NanosCursorPushdown(NanosCursorPushdown(df.queryExecution.analyzed))
    assert(once.toString == twice.toString)
  }

  test("epoch literal (m=0): >= keeps pre-epoch same-µs rows — no unsound rewrite") {
    val dir = Files.createTempDirectory("nanos0").toString + "/t"
    // nanos straddling epoch: micros(n) = 0 for all of [-999, 999] (div
    // truncates toward zero), so every one of these satisfies tsc >= epoch
    Seq(-999L, -1L, 0L, 999L, 1000L).toDF("ts").write.parquet(dir)
    val epoch = java.sql.Timestamp.from(java.time.Instant.EPOCH)
    val df = converted(dir).filter(col("tsc") >= lit(epoch))
    assert(df.count() == 5, "m=0 rewrite must not reject pre-epoch nanos in [-999,-1]")
    // and the rule must not have derived a bound for the epoch literal
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("> -1"), plan.take(600))
  }

  test("non-matching filters are untouched") {
    val df = converted(nanosTable()).filter(col("ts") > 5L) // plain long predicate
    assert(NanosCursorPushdown(df.queryExecution.analyzed).toString ==
      df.queryExecution.analyzed.toString)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TimeJoin

/** TimeJoin vs the brute-force definitions on fixtures designed to hit the
  * tie and boundary cases: duplicate timestamps on both sides, right rows
  * exactly at a left timestamp (inclusive bound), window-edge points, keys
  * with no matches at all.
  */
class TimeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000000L // µs, 2023-11-14T22:13:20Z

  private def ts(sec: Long): Timestamp = new Timestamp(base / 1000 + sec * 1000)

  // deterministic fixture: 40 keys, ~25 rows/side/key, second-granularity
  // offsets with intentional collisions (offsets drawn from a small range)
  private def fixture(seed: Long, n: Int): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val left = (1 to n).map { i =>
      (i.toLong, rnd.nextInt(40).toLong, ts(rnd.nextInt(2000).toLong), rnd.nextInt(100))
    }.toDF("l_id", "k", "ts", "payload")
    val right = (1 to n).map { i =>
      (i.toLong + 100000, rnd.nextInt(40).toLong, ts(rnd.nextInt(2000).toLong))
    }.toDF("r_id", "k", "ts")
    (left, right)
  }

  test("asofBackward equals brute-force inequality join + keep-latest") {
    val (left, right) = fixture(seed = 7, n = 1000)
    val got = TimeJoin.asofBackward(left,
      right.select(col("k"), col("ts"), col("r_id"), col("ts").as("r_ts")),
      keys = Seq("k"), tsCol = "ts", rightTie = "r_id",
      rightPayload = Seq("r_id", "r_ts"))

    val w = Window.partitionBy(col("l_id"))
      .orderBy(col("r.ts").desc_nulls_last, col("r_id").desc_nulls_last)
    val brute = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("l.l_id").as("l_id"), col("l.k").as("k"), col("l.ts").as("ts"),
        col("l.payload").as("payload"), col("r_id"), col("r.ts").as("r_ts"))

    assert(got.count() === left.count()) // exactly one output row per left row
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("asofBackward: inclusive bound, max-tie winner, null when no prior right") {
    val left = Seq((1L, 1L, ts(100)), (2L, 1L, ts(50)), (3L, 2L, ts(100)))
      .toDF("l_id", "k", "ts")
    // two right rows exactly at ts=100 (tie → larger r_id wins); none for k=2
    // at-or-before 100 except... none at all; k=1 at ts=60 covers l_id=2? no: 60>50
    val right = Seq((10L, 1L, ts(100)), (11L, 1L, ts(100)), (9L, 1L, ts(60)),
        (20L, 2L, ts(101)))
      .toDF("r_id", "k", "ts")
    val got = TimeJoin.asofBackward(left,
        right.select(col("k"), col("ts"), col("r_id")),
        keys = Seq("k"), tsCol = "ts", rightTie = "r_id", rightPayload = Seq("r_id"))
      .select("l_id", "r_id").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(11L)) // equal-ts rights visible, max tie wins
    assert(got(2L) === None)      // rights exist but all later than the left row
    assert(got(3L) === None)      // right at 101 is after 100: backward only
  }

  test("pointsInWindow equals the naive inequality join, boundaries exact") {
    val (left, right) = fixture(seed = 11, n = 1000)
    val r2 = right.select(col("k"), col("ts").as("r_ts"), col("r_id"))
    val got = TimeJoin.pointsInWindow(left, r2, keys = Seq("k"),
        leftTs = "ts", rightTs = "r_ts", windowSeconds = 300L)
      .select("l_id", "r_id")
    val naive = left.as("l").join(r2.as("r"),
        col("l.k") === col("r.k") && col("r_ts") > col("ts") &&
          col("r_ts") <= col("ts") + expr("INTERVAL 300 SECONDS"))
      .select("l_id", "r_id")
    assert(got.count() > 0, "fixture must produce matches")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // half-open: a right point exactly at left ts is excluded; at ts+w included
    val l1 = Seq((1L, 1L, ts(0))).toDF("l_id", "k", "ts")
    val r1 = Seq((10L, 1L, ts(0)), (11L, 1L, ts(300)), (12L, 1L, ts(301)))
      .toDF("r_id", "k", "r_ts2")
    val edge = TimeJoin.pointsInWindow(l1, r1, Seq("k"), "ts", "r_ts2", 300L)
      .select("r_id").as[Long].collect().toSet
    assert(edge === Set(11L))
  }

  test("pointsInWindow is exact across the epoch boundary (truncating div)") {
    // timestamps straddling 1970-01-01: `div` truncates toward zero, which
    // widens bucket 0 — the residual filter must keep results exact anyway
    def epochTs(sec: Long) = new Timestamp(sec * 1000)
    val left = (-20L to 20L).map(s => (s, 1L, epochTs(s * 60))).toDF("l_id", "k", "ts")
    val right = (-20L to 20L).map(s => (s + 1000, 1L, epochTs(s * 60 + 30)))
      .toDF("r_id", "k", "r_ts")
    val got = TimeJoin.pointsInWindow(left, right, Seq("k"), "ts", "r_ts", 150L)
      .select("l_id", "r_id")
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r_ts") > col("ts") &&
          col("r_ts") <= col("ts") + expr("INTERVAL 150 SECONDS"))
      .select("l_id", "r_id")
    assert(got.count() > 0)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("pointsInWindow produces no duplicate pairs from the bucket explode") {
    val (left, right) = fixture(seed = 13, n = 500)
    val r2 = right.select(col("k"), col("ts").as("r_ts"), col("r_id"))
    val pairs = TimeJoin.pointsInWindow(left, r2, Seq("k"), "ts", "r_ts", 600L)
      .select("l_id", "r_id")
    assert(pairs.count() === pairs.distinct().count())
  }
}

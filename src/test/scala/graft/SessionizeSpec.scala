package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  test("gap rule: split strictly-greater-than-gap, keep boundary-equal events") {
    // key 1: events at 0, 100, 100+gap (kept: == gap), then +gap+1 (split)
    val gap = 300L
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(100), 2L), (1L, ts(100 + gap), 3L),
      (1L, ts(100 + gap + gap + 1), 4L),
      (2L, ts(50), 5L)
    ).toDF("k", "ts", "id")
    val got = Sessionize.byGap(df, Seq("k"), "ts", "id", gap)
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("session invariants on a random stream: cover, order, separation") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 4000).map { i =>
      (rnd.nextInt(25).toLong, ts(rnd.nextInt(100000).toLong), i.toLong, rnd.nextDouble() * 10)
    }
    val df = rows.toDF("k", "ts", "id", "v")
    val sess = Sessionize.sessions(df, Seq("k"), "ts", "id", gapSeconds = 600L,
      valueCol = Some("v"))
    // every event lands in exactly one session
    assert(sess.agg(sum("n_events")).head().getLong(0) === 4000L)
    val perKey = sess.orderBy("k", "session_seq")
      .select("k", "session_seq", "session_start", "session_end")
      .as[(Long, Long, Timestamp, Timestamp)].collect().groupBy(_._1)
    perKey.values.foreach { ss =>
      ss.sliding(2).foreach {
        case Array((_, s1, _, e1), (_, s2, st2, _)) =>
          assert(s2 === s1 + 1) // dense numbering
          assert(st2.getTime - e1.getTime > 600000L) // separated by > gap
        case _ => ()
      }
      ss.foreach { case (_, _, st, en) => assert(!en.before(st)) }
    }
  }

  test("numbering is input-order independent (total order via tie column)") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(5000).toLong), i.toLong)
    }
    val a = Sessionize.byGap(rows.toDF("k", "ts", "id"), Seq("k"), "ts", "id", 120L)
      .select("k", "id", "session_seq")
    val b = Sessionize.byGap(
        rows.reverse.toDF("k", "ts", "id").repartition(7), Seq("k"), "ts", "id", 120L)
      .select("k", "id", "session_seq")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}

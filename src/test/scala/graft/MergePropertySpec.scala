package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Merge}

/** Property-style invariants for the merge/dedup operators (SURVEY.md §5:
  * "∀ permutations of duplicate rows, dedup result is invariant") over
  * seeded random batches with deliberate key/version collisions.
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new java.sql.Timestamp(1704067200000L + s * 1000L)

  private def randomBatch(seed: Int, n: Int = 12): List[(String, java.sql.Timestamp, String)] = {
    val r = new scala.util.Random(seed)
    List.fill(n)((
      Seq("a", "b", "c")(r.nextInt(3)),
      ts(r.nextInt(6)),
      r.alphanumeric.take(4).mkString))
  }

  test("keepLast under a total order is permutation-invariant") {
    (1 to 8).foreach { seed =>
      val rows = randomBatch(seed)
      val shuffled = new scala.util.Random(seed + 100).shuffle(rows)
      val ord = Seq(col("updated_at"), col("payload")) // total within key groups
      val r1 = Dedup.keepLast(rows.toDF("id", "updated_at", "payload"), Seq("id"), ord)
        .orderBy("id").collect().toSeq
      val r2 = Dedup.keepLast(shuffled.toDF("id", "updated_at", "payload"), Seq("id"), ord)
        .orderBy("id").collect().toSeq
      assert(r1 == r2, s"seed $seed not permutation-invariant")
    }
  }

  test("latestUpsert: unique keys; versions never regress; existing wins exact ties") {
    (1 to 8).foreach { seed =>
      val existing = Dedup.keepLast(
        randomBatch(seed).toDF("id", "updated_at", "payload"), Seq("id"),
        Seq(col("updated_at"), col("payload")))
      val incoming = randomBatch(seed + 50).toDF("id", "updated_at", "payload")
      val merged = Merge.latestUpsert(existing, incoming)
      val out = merged.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getString(2)))
      assert(out.map(_._1).distinct.length == out.length, s"seed $seed: duplicate keys")
      val exMap = existing.collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
      out.foreach { case (id, v, _) =>
        exMap.get(id).foreach(ev =>
          assert(!v.before(ev), s"seed $seed: $id regressed $v < $ev"))
      }
      val exFull = existing.collect().map(r =>
        (r.getString(0), r.getTimestamp(1)) -> r.getString(2)).toMap
      out.foreach { case (id, v, p) =>
        exFull.get((id, v)).foreach(ep =>
          assert(p == ep, s"seed $seed: tie on $id broke existing-wins"))
      }
    }
  }

  test("historyDelta: idempotent under arbitrary replays; no conflict-key dups") {
    (1 to 8).foreach { seed =>
      val batch = randomBatch(seed).toDF("id", "updated_at", "payload_hash")
      val empty = batch.limit(0)
      val applied = empty.unionByName(Merge.historyDelta(empty, batch))
      assert(Merge.historyDelta(applied, batch).count() == 0, s"seed $seed: not idempotent")
      assert(applied.groupBy("id", "updated_at", "payload_hash")
        .count().filter(col("count") > 1).count() == 0, s"seed $seed: dup conflict keys")
    }
  }
}

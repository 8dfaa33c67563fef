package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Ivm
import graft.sources.ManifestStore

/** Incremental view maintenance over the manifest CDC feed: a maintained
  * (count, sum) view must equal the full recompute at every version — the
  * invariant that makes "follow the feed" a safe replacement for
  * "rescan the table".
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, v DOUBLE")

  private def emptyState: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL("k BIGINT, n_rows BIGINT, total DECIMAL(28,8)"))

  private def norm(df: DataFrame): Set[(Long, Long, Double)] =
    df.select($"k", $"n_rows", $"total".cast("double"))
      .as[(Long, Long, Double)].collect().toSet

  test("maintained view equals recompute at every version of a mutating table") {
    val dir = Files.createTempDirectory("graft-ivm").toString
    ManifestStore.append(Seq((1L, 10.0), (1L, 5.0), (2L, 1.0)).toDF("k", "v"), dir) // v1
    ManifestStore.append(Seq((2L, 2.0), (3L, 7.0)).toDF("k", "v"), dir)             // v2
    ManifestStore.deleteRange(spark, dir, schema, "v", 5.0, 8.0)                    // v3
    ManifestStore.compact(spark, dir, schema)                                       // v4 (no-op feed)
    ManifestStore.overwrite(Seq((9L, 4.0)).toDF("k", "v"), dir)                     // v5

    var state = emptyState
    (1L to 5L).foreach { v =>
      state = Ivm.applyDelta(state,
        ManifestStore.changes(spark, dir, v - 1, v, schema), Seq("k"), "v")
      val expected = Ivm.recompute(
        ManifestStore.readVersion(spark, dir, v, schema), Seq("k"), "v")
      assert(norm(state) === norm(expected), s"maintained view diverged at v$v")
    }
    assert(norm(state) === Set((9L, 1L, 4.0)))
    // one-shot maintenance over the whole range = the same final view
    val oneShot = Ivm.applyDelta(emptyState,
      ManifestStore.changes(spark, dir, 0L, 5L, schema), Seq("k"), "v")
    assert(norm(oneShot) === norm(state))
  }

  test("checkpointed CDC follower: exactly-once IVM through crash and replay") {
    import graft.sources.{Cdc, StateStore}
    val base = Files.createTempDirectory("graft-cdc-follow")
    val dir = base.resolve("table").toString
    val ck = base.resolve("checkpoint").toString
    val viewDir = base.resolve("view").toString
    val viewSchema = StructType.fromDDL(
      "k BIGINT, n_rows BIGINT, total DECIMAL(28,8), _applied BIGINT")

    // the canonical exactly-once sink: state and the feed's to-version
    // persist in ONE atomic swap; an interval already absorbed is skipped
    def applyExactlyOnce(feed: DataFrame, to: Long): Unit = {
      val cur = StateStore.read(spark, viewDir, viewSchema)
      val applied = cur.agg(max($"_applied")).head
      if (applied.isNullAt(0) || applied.getLong(0) < to) {
        val next = Ivm.applyDelta(cur.drop("_applied"), feed, Seq("k"), "v")
          .withColumn("_applied", lit(to))
        StateStore.overwrite(next, viewDir)
      }
    }
    def view(): DataFrame = StateStore.read(spark, viewDir, viewSchema).drop("_applied")

    ManifestStore.append(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), dir) // v1
    ManifestStore.append(Seq((1L, 4.0)).toDF("k", "v"), dir)            // v2
    assert(Cdc.followOnce(spark, dir, schema, ck) {
      (feed, _, to) => applyExactlyOnce(feed, to)
    } === Some((0L, 2L)))
    assert(norm(view()) === norm(Ivm.recompute(
      ManifestStore.read(spark, dir, schema), Seq("k"), "v")))
    // caught up: no interval, no apply
    assert(Cdc.followOnce(spark, dir, schema, ck) { (_, _, _) =>
      fail("apply must not run when caught up")
    }.isEmpty)

    ManifestStore.append(Seq((3L, 9.0)).toDF("k", "v"), dir) // v3
    // crash AFTER the sink persisted but BEFORE the checkpoint advanced
    intercept[RuntimeException] {
      Cdc.followOnce(spark, dir, schema, ck) { (feed, _, to) =>
        applyExactlyOnce(feed, to)
        throw new RuntimeException("crash before checkpoint")
      }
    }
    assert(Cdc.lastProcessed(spark, ck) === 2L, "checkpoint must not advance on failure")
    // replay of (2, 3]: the sink skips the absorbed interval — no double count
    assert(Cdc.followOnce(spark, dir, schema, ck) {
      (feed, _, to) => applyExactlyOnce(feed, to)
    } === Some((2L, 3L)))
    assert(Cdc.lastProcessed(spark, ck) === 3L)
    assert(norm(view()) === Set((1L, 2L, 5.0), (2L, 1L, 2.0), (3L, 1L, 9.0)),
      "replay double-applied the interval")
  }

  test("property: maintained view equals recompute over random insert/delete feeds") {
    // pure applyDelta algebra, no table store: random batches mutate a
    // driver-side multiset oracle; after every batch the maintained view
    // must equal the recompute of the oracle — deletions always reference
    // live rows (a CDC feed never retracts what was not inserted)
    val rnd = new scala.util.Random(20260813L)
    var state = emptyState
    val live = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    (1 to 12).foreach { step =>
      val inserts = Seq.fill(rnd.nextInt(5)) {
        val row = (rnd.nextInt(6).toLong, (rnd.nextInt(40) + 1) / 4.0)
        live += row
        (row._1, row._2, "insert")
      }
      val deletes = Seq.fill(math.min(rnd.nextInt(4), live.size)) {
        val idx = rnd.nextInt(live.size)
        val row = live.remove(idx)
        (row._1, row._2, "delete")
      }
      val feed = rnd.shuffle(inserts ++ deletes)
      if (feed.nonEmpty) {
        state = Ivm.applyDelta(state,
          feed.toDF("k", "v", "_change_type"), Seq("k"), "v")
        // re-materialize per step: 12 chained lazy plans otherwise stack
        state = spark.createDataFrame(state.collect().toSeq.asJava, state.schema)
        val expected = Ivm.recompute(live.toSeq.toDF("k", "v"), Seq("k"), "v")
        assert(norm(state) === norm(expected), s"diverged at step $step")
      }
    }
  }

  test("full retraction drops the key; no tombstone rows linger") {
    val state = Seq((1L, 2L, BigDecimal(15.0)), (2L, 1L, BigDecimal(3.0)))
      .toDF("k", "n_rows", "total")
    val feed = Seq((1L, 10.0, "delete"), (1L, 5.0, "delete"), (3L, 2.0, "insert"))
      .toDF("k", "v", "_change_type")
    val out = norm(Ivm.applyDelta(state, feed, Seq("k"), "v"))
    assert(out === Set((2L, 1L, 3.0), (3L, 1L, 2.0)))
  }

  test("update_preimage/postimage pairs (changesKeyed shape) maintain the view") {
    val state = Seq((1L, 1L, BigDecimal(10.0))).toDF("k", "n_rows", "total")
    val feed = Seq((1L, 10.0, "update_preimage"), (1L, 4.0, "update_postimage"))
      .toDF("k", "v", "_change_type")
    assert(norm(Ivm.applyDelta(state, feed, Seq("k"), "v")) === Set((1L, 1L, 4.0)))
  }

  test("an unknown _change_type fails loudly instead of corrupting the view") {
    val state = Seq((1L, 1L, BigDecimal(10.0))).toDF("k", "n_rows", "total")
    val feed = Seq((1L, 1.0, "upsert")).toDF("k", "v", "_change_type")
    val ex = intercept[Exception] {
      Ivm.applyDelta(state, feed, Seq("k"), "v").collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("unknown _change_type"), msgs)
  }
}

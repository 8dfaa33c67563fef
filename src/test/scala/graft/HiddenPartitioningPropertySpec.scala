package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.{ManifestStore, PartitionSpec}

/** Randomized correctness fence for hidden partitioning
  * ([[graft.sources.PartitionSpec]]): for EVERY transform kind, random
  * data (nulls, pre-1970 instants, negative keys, multi-byte /
  * supplementary-character strings, empty strings) and random range /
  * point probes, the pruned conjunctive scan must return EXACTLY the
  * rows a full scan + filter returns. Pruning that drops a file holding
  * a matching row is a silent-wrong-answer bug — the worst class — so
  * the identity is checked row-for-row, not by counts. A soft
  * effectiveness counter asserts the machinery actually pruned something
  * across the run (a trivially-admit-everything implementation would
  * pass the identity but prune nothing).
  */
class HiddenPartitioningPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xC0FFEE)

  private def tmpDir(): String =
    Files.createTempDirectory("graft-hpp").toString

  private def ts(epochSec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epochSec))

  // epoch seconds spanning 1969-12-25 … 1970-02-08 (negative floors) and
  // a 2024 band — the ranges the day/hour floor arithmetic must not mis-bin
  private def randSec(): Long =
    if (rnd.nextBoolean()) -600000L + rnd.nextLong(4500000L)
    else 1704067200L + rnd.nextLong(2500000L)

  private val alphabet = Array("a", "b", "c", "ab", "😀", "日", "z")
  private def randStr(): String =
    (0 until rnd.nextInt(5)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
      .mkString

  /** One table, one transform, one typed column `k`; returns (dir, rows). */
  private def build(spec: String, ddl: String, rows: Seq[Any]): String = {
    val dir = tmpDir()
    ManifestStore.createEmpty(spark, dir, StructType.fromDDL(ddl),
      partitionCols = Seq(spec))
    val df = ddl match {
      case d if d.contains("TIMESTAMP") =>
        rows.asInstanceOf[Seq[Option[java.sql.Timestamp]]].zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("id", "k")
      case d if d.contains("STRING") =>
        rows.asInstanceOf[Seq[Option[String]]].zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("id", "k")
      case d if d.contains("DATE") =>
        rows.asInstanceOf[Seq[Option[java.sql.Date]]].zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("id", "k")
      case _ =>
        rows.asInstanceOf[Seq[Option[Long]]].zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toDF("id", "k")
    }
    // several appends → several files per partition value era
    df.filter(col("id") % 3 === 0).transform(d =>
      { ManifestStore.appendPartitioned(d, dir, Seq(spec)); d })
    df.filter(col("id") % 3 === 1).transform(d =>
      { ManifestStore.appendPartitioned(d, dir, Seq(spec)); d })
    df.filter(col("id") % 3 === 2).transform(d =>
      { ManifestStore.appendPartitioned(d, dir, Seq(spec)); d })
    dir
  }

  /** scanWhere(range) ≡ full read + filter, row for row. Returns kept/total
    * file counts for the effectiveness tally.
    */
  private def checkProbe(dir: String, ddl: String, lo: Any, hi: Any): (Int, Int) = {
    val schema = StructType.fromDDL(ddl)
    val got = ManifestStore.scanWhere(spark, dir, schema, Seq(("k", lo, hi)))
      .select("id").as[Long].collect().sorted.toSeq
    val want = ManifestStore.read(spark, dir, schema)
      .filter(col("k") >= lit(lo) && col("k") <= lit(hi))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === want,
      s"pruned scan diverged from full scan for k in [$lo, $hi]")
    val s0 = ManifestStore.currentSnapshot(spark, dir).get
    (ManifestStore.pruneFilesWhere(s0, Seq(("k", lo, hi))).size, s0.files.size)
  }

  test("pruned scans ≡ full scans under random transforms, data, probes") {
    var pruned = 0
    var probes = 0

    // days / hours over TIMESTAMP
    Seq("days(k)", "hours(k)").foreach { spec =>
      val rows: Seq[Option[java.sql.Timestamp]] =
        (0 until 120).map(_ => if (rnd.nextInt(10) == 0) None
          else Some(ts(randSec())))
      val dir = build(spec, "id BIGINT, k TIMESTAMP", rows)
      val vals = rows.flatten
      (0 until 12).foreach { _ =>
        val a = vals(rnd.nextInt(vals.size))
        val b = vals(rnd.nextInt(vals.size))
        val (lo, hi) = if (a.before(b)) (a, b) else (b, a)
        val (k, t) = checkProbe(dir, "id BIGINT, k TIMESTAMP", lo, hi)
        probes += 1; if (k < t) pruned += 1
      }
    }

    // months / years over TIMESTAMP — the random bands span
    // Dec-1969→Feb-1970 (negative calendar indexes across the epoch
    // month/year boundary) and Jan–Feb 2024 (a leap February), so range
    // probes cross month AND year edges
    Seq("months(k)", "years(k)").foreach { spec =>
      val rows: Seq[Option[java.sql.Timestamp]] =
        (0 until 120).map(_ => if (rnd.nextInt(10) == 0) None
          else Some(ts(randSec())))
      val dir = build(spec, "id BIGINT, k TIMESTAMP", rows)
      val vals = rows.flatten
      (0 until 12).foreach { _ =>
        val a = vals(rnd.nextInt(vals.size))
        val b = vals(rnd.nextInt(vals.size))
        val (lo, hi) = if (a.before(b)) (a, b) else (b, a)
        val (k, t) = checkProbe(dir, "id BIGINT, k TIMESTAMP", lo, hi)
        probes += 1; if (k < t) pruned += 1
      }
    }

    // months / years over DATE (epoch-day stat space; same calendar
    // edges expressed as days: 1969-11…1970-03 and 2023-12…2024-04)
    Seq("months(k)", "years(k)").foreach { spec =>
      def randDay(): Long =
        if (rnd.nextBoolean()) -40L + rnd.nextLong(81L)
        else 19690L + rnd.nextLong(120L)
      val rows: Seq[Option[java.sql.Date]] =
        (0 until 120).map(_ => if (rnd.nextInt(10) == 0) None
          else Some(java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(randDay()))))
      val dir = build(spec, "id BIGINT, k DATE", rows)
      val vals = rows.flatten
      (0 until 12).foreach { _ =>
        val a = vals(rnd.nextInt(vals.size))
        val b = vals(rnd.nextInt(vals.size))
        val (lo, hi) = if (a.before(b)) (a, b) else (b, a)
        val (k, t) = checkProbe(dir, "id BIGINT, k DATE", lo, hi)
        probes += 1; if (k < t) pruned += 1
      }
    }

    // bucket / integral truncate over BIGINT (negative keys included)
    Seq(s"bucket(${2 + rnd.nextInt(6)},k)",
        s"truncate(${Seq(3, 7, 10)(rnd.nextInt(3))},k)").foreach { spec =>
      val rows: Seq[Option[Long]] =
        (0 until 150).map(_ => if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextLong(201L) - 100L))
      val dir = build(spec, "id BIGINT, k BIGINT", rows)
      val vals = rows.flatten
      (0 until 12).foreach { i =>
        val a = vals(rnd.nextInt(vals.size))
        // alternate point probes (bucket's only prunable shape) and ranges
        val b = if (i % 2 == 0) a else vals(rnd.nextInt(vals.size))
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val (k, t) = checkProbe(dir, "id BIGINT, k BIGINT", lo, hi)
        probes += 1; if (k < t) pruned += 1
      }
    }

    // string truncate (multi-byte, supplementary, empty strings)
    Seq(1, 2, 4).foreach { w =>
      val rows: Seq[Option[String]] =
        (0 until 150).map(_ => if (rnd.nextInt(10) == 0) None
          else Some(randStr()))
      val dir = build(s"truncate($w,k)", "id BIGINT, k STRING", rows)
      val vals = rows.flatten.filter(_.nonEmpty)
      (0 until 12).foreach { i =>
        val a = vals(rnd.nextInt(vals.size))
        val b = if (i % 2 == 0) a else vals(rnd.nextInt(vals.size))
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        val (k, t) = checkProbe(dir, "id BIGINT, k STRING", lo, hi)
        probes += 1; if (k < t) pruned += 1
      }
    }

    assert(probes >= 80)
    assert(pruned > 0, "no probe pruned a single file — the transform " +
      "evidence is admitting everything")
  }
}

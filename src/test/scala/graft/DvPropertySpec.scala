package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestStore

/** Randomized invariants for the merge-on-read write family: against a
  * seeded reference Map the table must equal after ANY interleaving of
  * deleteWhere / updateWhere / upsertKeyedDv / append / compactSmall —
  * and countRows must equal the reference size at every step (the
  * per-file tombstone bookkeeping is exact under arbitrary op orders,
  * not just the hand-picked spec sequences).
  */
class DvPropertySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, v STRING")

  private def tmpDir(): String =
    Files.createTempDirectory("graft-dv-prop").toString

  test("random op interleavings match a reference map; counts stay exact") {
    (1 to 4).foreach { seed =>
      val r = new scala.util.Random(seed)
      val dir = tmpDir()
      val ref = scala.collection.mutable.Map[Long, String]()
      // seed table: two appends of disjoint key ranges
      def seedBatch(lo: Long, hi: Long) = {
        val rows = (lo until hi).map(k => k -> s"v$k")
        rows.foreach { case (k, v) => ref(k) = v }
        ManifestStore.append(rows.toDF("k", "v").repartition(2), dir)
      }
      seedBatch(0L, 40L)
      seedBatch(40L, 80L)

      (1 to 8).foreach { _ =>
        r.nextInt(5) match {
          case 0 => // deleteWhere on a random modulus class
            val m = 2 + r.nextInt(5); val c = r.nextInt(m)
            assert(ManifestStore.deleteWhere(spark, dir, schema,
              col("k") % m === c).isDefined)
            ref.keys.filter(_ % m == c).toSeq.foreach(ref.remove)
          case 1 => // updateWhere: tag a random range
            val lo = r.nextInt(80).toLong; val hi = lo + r.nextInt(20)
            assert(ManifestStore.updateWhere(spark, dir, schema,
              col("k") >= lo && col("k") <= hi,
              Map("v" -> concat(col("v"), lit("+")))).isDefined)
            ref.keys.filter(k => k >= lo && k <= hi).toSeq
              .foreach(k => ref(k) = ref(k) + "+")
          case 2 => // upsertKeyedDv: replace/insert a random key batch
            val ks = Seq.fill(1 + r.nextInt(4))(r.nextInt(100).toLong).distinct
            val batch = ks.map(k => k -> s"u$k")
            assert(ManifestStore.upsertKeyedDv(spark, dir, schema,
              batch.toDF("k", "v"), "k").isDefined)
            batch.foreach { case (k, v) => ref(k) = v }
          case 3 => // plain append of fresh keys
            val base = 1000L * (r.nextInt(90) + 1)
            val rows = (base until base + 5L).map(k => k -> s"a$k")
            rows.foreach { case (k, v) => ref(k) = v }
            ManifestStore.append(rows.toDF("k", "v").repartition(1), dir): Unit
          case 4 => // maintenance: compact the small files (materializes dvs)
            ManifestStore.compactSmall(spark, dir, schema): Unit
        }
        assert(ManifestStore.countRows(spark, dir) === Some(ref.size.toLong),
          s"seed $seed: countRows drifted from reference")
      }
      val got = ManifestStore.read(spark, dir, schema).as[(Long, String)]
        .collect().toMap
      assert(got === ref.toMap, s"seed $seed: table diverged from reference")
    }
  }

  test("random interleavings WITH restore: counts exact, full CDC replay converges") {
    (1 to 3).foreach { seed =>
      val r = new scala.util.Random(100 + seed)
      val dir = tmpDir()
      val ref = scala.collection.mutable.Map[Long, String]()
      // version -> reference state at that version (restore targets)
      val states = scala.collection.mutable.Map[Long, Map[Long, String]]()
      def record(): Unit = {
        val v = ManifestStore.currentSnapshot(spark, dir).get.version
        states(v) = ref.toMap
      }
      val rows0 = (0L until 60L).map(k => k -> s"v$k")
      rows0.foreach { case (k, v) => ref(k) = v }
      ManifestStore.append(rows0.toDF("k", "v").repartition(2), dir)
      record()

      (1 to 10).foreach { _ =>
        r.nextInt(5) match {
          case 0 =>
            val m = 2 + r.nextInt(4); val c = r.nextInt(m)
            assert(ManifestStore.deleteWhere(spark, dir, schema,
              col("k") % m === c).isDefined)
            ref.keys.filter(_ % m == c).toSeq.foreach(ref.remove)
          case 1 =>
            val ks = Seq.fill(1 + r.nextInt(4))(r.nextInt(80).toLong).distinct
            val batch = ks.map(k => k -> s"u$k")
            assert(ManifestStore.upsertKeyedDv(spark, dir, schema,
              batch.toDF("k", "v"), "k").isDefined)
            batch.foreach { case (k, v) => ref(k) = v }
          case 2 =>
            val base = 1000L * (r.nextInt(90) + 1)
            val rows = (base until base + 4L).map(k => k -> s"a$k")
            rows.foreach { case (k, v) => ref(k) = v }
            ManifestStore.append(rows.toDF("k", "v").repartition(1), dir): Unit
          case 3 =>
            ManifestStore.compactSmall(spark, dir, schema): Unit
          case 4 => // ROLL BACK to a random recorded version — the dv refs
            // may drop (resurrections) or come back (re-tombstones); the
            // reference rolls back with it
            val vs = states.keys.toSeq.sorted
            val target = vs(r.nextInt(vs.size))
            ManifestStore.restore(spark, dir, target)
            ref.clear()
            states(target).foreach { case (k, v) => ref(k) = v }
        }
        record()
        assert(ManifestStore.countRows(spark, dir) === Some(ref.size.toLong),
          s"seed $seed: countRows drifted from reference after a restore mix")
      }
      val got = ManifestStore.read(spark, dir, schema).as[(Long, String)]
        .collect().toMap
      assert(got === ref.toMap, s"seed $seed: table diverged (restore mix)")
      // the WHOLE change feed replays to the final state: inserts minus
      // deletes (multiset) — this is what the restore-over-dv pair diff
      // must keep true for any interleaving
      val cur = ManifestStore.currentSnapshot(spark, dir).get.version
      val feed = ManifestStore.changes(spark, dir, 0L, cur, schema)
      val replayed = feed.filter(col("_change_type") === "insert")
        .select("k", "v")
        .exceptAll(feed.filter(col("_change_type") === "delete").select("k", "v"))
        .as[(Long, String)].collect()
      assert(replayed.length === replayed.toSet.size,
        s"seed $seed: replay left duplicate live rows")
      assert(replayed.toMap === ref.toMap,
        s"seed $seed: CDC replay diverged from the table (restore mix)")
    }
  }
}

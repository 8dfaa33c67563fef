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
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestStore
import graft.sources.ManifestStore.MergeClause

/** Randomized invariants for DECLARED-partitioned tables under the full
  * round-9 write surface: against a seeded reference map the table must
  * equal after ANY interleaving of partitioned appends, canonical and
  * conditional MERGEs, partition-predicate and row-level DELETEs,
  * UPDATEs (including cross-partition moves), partial partition
  * overwrites, and restores — AND two structural invariants must hold at
  * every step: every live data file records its partition value (the
  * pruning contract row-level maintenance must never erode), and the
  * metadata COUNT(*) equals the reference size (tombstone bookkeeping
  * stays exact under partitioned layouts).
  */
class PartitionedOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, p STRING, v BIGINT")

  private def tmpDir(): String =
    Files.createTempDirectory("graft-part-prop").toString

  test("random partitioned-op interleavings match a reference map") {
    val parts = Vector("a", "b", "c")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(7000 + seed)
      val dir = tmpDir()
      val ref = scala.collection.mutable.Map[Long, (String, Long)]() // k -> (p, v)
      var nextK = 0L
      def freshRows(n: Int): Seq[(Long, String, Long)] = (1 to n).map { _ =>
        val k = nextK; nextK += 1
        (k, parts(rnd.nextInt(parts.size)), rnd.nextLong(100))
      }
      ManifestStore.createEmpty(spark, dir, schema, Seq("p"))
      val seedRows = freshRows(30)
      seedRows.foreach { case (k, p, v) => ref(k) = (p, v) }
      ManifestStore.appendPartitioned(seedRows.toDF("k", "p", "v"), dir, Seq("p"))

      def checkInvariants(step: String): Unit = {
        val s = ManifestStore.currentSnapshot(spark, dir).get
        assert(s.partitionCols === Seq("p"), s"$step: declaration lost")
        assert(s.files.forall(f => s.parts.get(f).exists(_.contains("p"))),
          s"$step: a live file lost its partition value (pruning erodes)")
        assert(ManifestStore.countRows(spark, dir) === Some(ref.size.toLong),
          s"$step: metadata count drifted from the reference")
        val got = ManifestStore.readLatest(spark, dir)
          .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
        assert(got === ref.toMap, s"$step: contents diverged")
      }

      (1 to 10).foreach { step =>
        rnd.nextInt(6) match {
          case 0 => // partitioned append of fresh keys
            val rows = freshRows(1 + rnd.nextInt(5))
            rows.foreach { case (k, p, v) => ref(k) = (p, v) }
            ManifestStore.appendPartitioned(rows.toDF("k", "p", "v"), dir, Seq("p"))
          case 1 => // canonical MERGE: updates sampled keys, inserts fresh
            val upd = ref.keys.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(5)
              .map(k => (k, parts(rnd.nextInt(parts.size)), rnd.nextLong(100)))
            val ins = freshRows(rnd.nextInt(3))
            val batch = upd ++ ins
            if (batch.nonEmpty) {
              batch.foreach { case (k, p, v) => ref(k) = (p, v) }
              val src = batch.toDF("k", "p", "v").select(
                col("k").as("__s_k"), col("p").as("__s_p"), col("v").as("__s_v"))
              val star = Seq(MergeClause(None, Some(Map(
                "k" -> col("__s_k"), "p" -> col("__s_p"), "v" -> col("__s_v")))))
              assert(ManifestStore.mergeRows(spark, dir, schema, src,
                col("k") === col("__s_k"), star, star,
                equiKeys = Seq("k" -> col("__s_k"))).nonEmpty)
            }
          case 2 => // conditional MERGE: delete evens among matched, bump odds
            val keys = ref.keys.toSeq.sorted.filter(_ => rnd.nextBoolean()).take(6)
            if (keys.nonEmpty) {
              keys.foreach { k =>
                if (k % 2 == 0) ref.remove(k): Unit
                else ref.get(k).foreach { case (p, v) => ref(k) = (p, v + 1000) }
              }
              val src = keys.map(k => Tuple1(k)).toDF("k")
                .select(col("k").as("__s_k"))
              assert(ManifestStore.mergeRows(spark, dir, schema, src,
                col("k") === col("__s_k"),
                Seq(MergeClause(Some(col("k") % 2 === 0), None),
                  MergeClause(None, Some(Map("v" -> (col("v") + 1000))))),
                Nil, equiKeys = Seq("k" -> col("__s_k"))).nonEmpty)
            }
          case 3 => // partition-predicate DELETE (whole-file drop path)
            val p = parts(rnd.nextInt(parts.size))
            ref.filterInPlace { case (_, (rp, _)) => rp != p }
            assert(ManifestStore.deleteWhere(spark, dir, schema,
              col("p") === p, planRanges = Seq(("p", p, p)),
              exactRanges = true).nonEmpty)
          case 4 => // UPDATE moving sampled rows to another partition
            val dst = parts(rnd.nextInt(parts.size))
            ref.mapValuesInPlace { case (k, (p, v)) =>
              if (k % 5 == step % 5) (dst, v) else (p, v) }
            assert(ManifestStore.updateWhere(spark, dir, schema,
              col("k") % 5 === (step % 5),
              Map("p" -> lit(dst))).nonEmpty)
          case 5 => // partial partition overwrite: rebuild one partition
            val p = parts(rnd.nextInt(parts.size))
            val rows = freshRows(2).map { case (k, _, v) => (k, p, v) }
            ref.filterInPlace { case (_, (rp, _)) => rp != p }
            rows.foreach { case (k, pp, v) => ref(k) = (pp, v) }
            ManifestStore.overwritePartitions(rows.toDF("k", "p", "v"),
              dir, Seq("p"), Map("p" -> p)): Unit
        }
        checkInvariants(s"seed $seed step $step")
      }
      // restore to the seed state: contents roll back, declaration stays
      ManifestStore.restore(spark, dir, 2L): Unit
      ref.clear()
      seedRows.foreach { case (k, p, v) => ref(k) = (p, v) }
      checkInvariants(s"seed $seed restore")
    }
  }
}

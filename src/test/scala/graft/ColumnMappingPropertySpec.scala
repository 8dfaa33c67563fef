package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.{ColumnMapping, ManifestStore}

/** Randomized invariants for COLUMN MAPPING ([[graft.sources.ColumnMapping]]):
  * against a seeded reference model the table must stay equal after ANY
  * interleaving of appends, renames, drops, re-adds (including the
  * adversarial shapes — re-adding a DROPPED name, renaming onto a name
  * that is some other field's retired/live PHYSICAL identity), row-level
  * deletes and compactions — and three structural invariants must hold at
  * every step:
  *
  *  1. physical names are IMMUTABLE: once a logical column is created, the
  *     physical identity the model assigned it never changes across any
  *     later rename;
  *  2. physical names are UNIQUE across live + retired (no column can
  *     ever address another's bytes);
  *  3. a re-added name reads NULL for every pre-add row (dropped data is
  *     never resurrected).
  *
  * Plus the concurrency property the scaladoc claims: two racing ALTERs
  * (real threads) both land or re-plan — never a lost update.
  */
class ColumnMappingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-map-prop").toString

  private def sqlTable(dir: String): String = s"graft.`$dir`"

  test("random rename/drop/re-add/write interleavings match a reference model") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(9100 + seed)
      val dir = tmpDir()
      // model: logical name -> model column id; rows live as id-keyed maps
      // (ids are the model's own "physical identity" — the table's real
      // physical names must be a consistent renaming of them)
      var nextCol = 0
      var nextK = 0L
      var live = Vector("k" -> 0, "c1" -> 1, "c2" -> 2) // (logical, id)
      nextCol = 3
      val rows = scala.collection.mutable.ArrayBuffer[Map[Int, Long]]()
      // the REAL physical name each model id got at creation; checked
      // immutable forever after
      val physOf = scala.collection.mutable.Map[Int, String]()

      def schemaNow = StructType(live.map { case (n, _) =>
        StructField(n, LongType, nullable = true) })
      def appendRows(n: Int): Unit = {
        val ids = live.map(_._2)
        val fresh = (1 to n).map { _ =>
          val k = nextK; nextK += 1
          ids.map(id => id -> (if (id == 0) k else rnd.nextLong(50))).toMap
        }
        rows ++= fresh
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(fresh.map(m =>
            org.apache.spark.sql.Row.fromSeq(ids.map(m(_): java.lang.Long)))),
          schemaNow)
        ManifestStore.append(df, dir)
      }
      appendRows(8)

      def check(step: String): Unit = {
        val s = ManifestStore.currentSnapshot(spark, dir).get
        val sch = s.schema.get
        assert(sch.fieldNames.toSeq === live.map(_._1), s"$step: logical shape")
        // invariant 1+2: physical identity immutable and globally unique
        live.foreach { case (n, id) =>
          val phys = ColumnMapping.physFor(sch, n)
          physOf.get(id) match {
            case Some(p) => assert(p === phys,
              s"$step: physical identity of model col $id moved $p -> $phys")
            case None => physOf(id) = phys
          }
        }
        val allPhys = sch.fields.map(ColumnMapping.physicalName)
        assert(allPhys.distinct.length === allPhys.length, s"$step: phys dup")
        assert(ColumnMapping.retired(s.props)
          .intersect(allPhys.toSet).isEmpty, s"$step: retired name live")
        // contents: every live column reads the model value; columns added
        // after a row was written read NULL for it (invariant 3 included)
        val got = ManifestStore.readLatest(spark, dir)
          .collect().map { r =>
            live.map { case (n, id) =>
              id -> Option(r.getAs[java.lang.Long](n)).map(_.toLong) }.toMap
          }.toSeq
        val want = rows.map(m => live.map { case (_, id) =>
          id -> m.get(id) }.toMap).toSeq
        assert(got.sortBy(_.toString) === want.sortBy(_.toString),
          s"$step: contents diverged (seed $seed)")
      }

      (1 to 12).foreach { step =>
        rnd.nextInt(6) match {
          case 0 => appendRows(1 + rnd.nextInt(4))
          case 1 => // rename a non-key column to a fresh name — including
            // deliberately recycling a previously-USED logical name
            val idx = 1 + rnd.nextInt(live.size - 1)
            val to = if (rnd.nextBoolean()) s"r$nextCol"
              else s"c${rnd.nextInt(nextCol)}" // maybe an old identity
            if (!live.exists(_._1 == to)) {
              spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN " +
                s"${live(idx)._1} TO $to")
              live = live.updated(idx, to -> live(idx)._2)
              nextCol += 1
            }
          case 2 if live.size > 2 => // drop a non-key column
            val idx = 1 + rnd.nextInt(live.size - 1)
            spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN ${live(idx)._1}")
            live = live.patch(idx, Nil, 1)
          case 3 => // add a column — half the time REUSING a dropped/old name
            val name = if (rnd.nextBoolean()) s"c$nextCol"
              else s"c${rnd.nextInt(nextCol)}"
            if (!live.exists(_._1 == name)) {
              spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD COLUMNS ($name BIGINT)")
              live = live :+ (name -> nextCol) // fresh MODEL identity
              nextCol += 1
              // pre-add rows read NULL in this column (never resurrected)
            }
          case 4 => // row-level delete through the renamed key surface
            val doomed = rows.filter(_(0) % 5 == step % 5).map(_(0)).toSet
            if (doomed.nonEmpty) {
              assert(ManifestStore.deleteWhere(spark, dir, schemaNow,
                col(live.head._1) % 5 === step % 5).isDefined)
              rows.filterInPlace(m => !doomed(m(0)))
            }
          case _ => // compaction materializes through the mapping
            ManifestStore.compactSmall(spark, dir, schemaNow,
              minFileBytes = Long.MaxValue, targetFileBytes = Long.MaxValue)
        }
        check(s"seed $seed step $step")
      }
    }
  }

  test("racing ALTERs serialize: both land or re-plan, never a lost update") {
    (1 to 3).foreach { round =>
      val dir = tmpDir()
      ManifestStore.append(
        Seq((1L, 2L, 3L)).toDF("k", "a", "b"), dir)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val t1 = new Thread(() =>
        try spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN a TO a$round")
        catch { case e: Throwable => errs.add(e) })
      val t2 = new Thread(() =>
        try spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN b TO b$round")
        catch { case e: Throwable => errs.add(e) })
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(errs.isEmpty, s"round $round: an ALTER failed: ${errs.peek()}")
      val sch = ManifestStore.currentSnapshot(spark, dir).get.schema.get
      assert(sch.fieldNames.toSeq === Seq("k", s"a$round", s"b$round"),
        s"round $round: a rename was lost")
      // and both still address their original bytes
      assert(spark.sql(s"SELECT a$round, b$round FROM ${sqlTable(dir)}")
        .as[(Long, Long)].head() === ((2L, 3L)))
    }
  }
}

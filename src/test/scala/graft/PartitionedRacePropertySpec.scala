package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.sources.ManifestStore

/** Randomized REAL-THREAD races on a TRANSFORM-PARTITIONED table (the
  * MergeRacePropertySpec discipline applied to the hidden-partitioning
  * write path — round-10 verdict task 5): concurrent SQL INSERTs
  * (hash-clustered per-partition files), whole-day retention DELETEs
  * (metadata-only file drops), compactSmall (partition-aware rewrite),
  * and partition-spec EVOLUTION flipping `days(ts)` ↔ `hours(ts)` under
  * all of them. Each appended batch owns its own UTC day and key range,
  * so the reference model is exact regardless of interleaving.
  *
  * Properties that must hold after quiesce:
  *  1. no lost rows — surviving rows ≡ appended batches minus
  *     successfully-deleted days, exactly;
  *  2. whole-day DELETEs stay metadata-only across BOTH layout
  *     generations (day files and hour files both prove containment in a
  *     day range) — zero dv sidecars at quiesce;
  *  3. every live file still carries a derived partition value (appends,
  *     compaction and evolution never erode the layout);
  *  4. pruned scans ≡ full scans — a day probe through the manifest
  *     FileIndex returns exactly the owning batch's rows.
  */
class PartitionedRacePropertySpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-prace").toString

  private def causeChain(t: Throwable): Seq[Throwable] =
    if (t == null) Nil else t +: causeChain(t.getCause)

  // batch b owns UTC day 19700 + b and keys [b*10, b*10 + 5)
  private def dayOf(b: Long): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(19700L + b)

  test("appends + day DELETEs + compact + spec evolution: exact survivors") {
    (1 to 2).foreach { seed =>
      val dir = tmpDir()
      spark.sql(s"CREATE TABLE graft.`$dir` (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")

      val appended = new ConcurrentLinkedQueue[Long]()
      val deleted = new ConcurrentLinkedQueue[Long]()
      val errors = new ConcurrentLinkedQueue[Throwable]()
      val deadline = System.currentTimeMillis() + 6000

      def loop(name: String)(body: scala.util.Random => Unit): Thread = {
        val t = new Thread(() => {
          val r = new scala.util.Random(seed * 977 + name.hashCode)
          try while (System.currentTimeMillis() < deadline) body(r)
          catch { case e: Throwable => errors.add(e): Unit }
        }, name)
        t.start(); t
      }

      val nextBatch = new java.util.concurrent.atomic.AtomicLong(0L)
      val appender = loop("appender") { _ =>
        val b = nextBatch.getAndIncrement()
        val d = dayOf(b)
        val values = (0 until 5).map(i =>
          s"(${b * 10 + i}, TIMESTAMP '$d ${"%02d".format(3 * i + 2)}:15:00')")
        spark.sql(s"INSERT INTO graft.`$dir` VALUES ${values.mkString(", ")}")
        appended.add(b)
        Thread.sleep(60)
      }
      val deleter = loop("deleter") { r =>
        Thread.sleep(200)
        val done = appended.toArray(Array.empty[java.lang.Long])
        val cand = done.filterNot(b => deleted.contains(b))
        if (cand.nonEmpty) {
          val b = cand(r.nextInt(cand.length)).longValue()
          // whole-day retention shape on the SOURCE column — abort on a
          // lost race is the deleteWhere contract, not a failure
          try {
            spark.sql(s"DELETE FROM graft.`$dir` " +
              s"WHERE date(ts) = DATE '${dayOf(b)}'")
            deleted.add(b): Unit
          } catch {
            case e: Throwable if causeChain(e).exists(
              _.isInstanceOf[java.util.ConcurrentModificationException]) => ()
          }
        }
      }
      val schema =
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, ts TIMESTAMP")
      val compactor = loop("compactor") { _ =>
        Thread.sleep(350)
        try ManifestStore.compactSmall(spark, dir, schema): Unit
        catch { case _: java.util.ConcurrentModificationException => () }
      }
      val evolver = loop("evolver") { r =>
        Thread.sleep(450)
        val spec = if (r.nextBoolean()) "hours(ts)" else "days(ts)"
        ManifestStore.setPartitionSpec(spark, dir, Seq(spec)): Unit
      }
      Seq(appender, deleter, compactor, evolver).foreach(_.join(30000))
      assert(errors.isEmpty, s"seed $seed: racing thread failed: " +
        s"${Option(errors.peek()).map(causeChain(_).mkString(" <- "))}")

      val live = appended.toArray(Array.empty[java.lang.Long])
        .map(_.longValue()).toSet --
        deleted.toArray(Array.empty[java.lang.Long]).map(_.longValue()).toSet
      val snap = ManifestStore.currentSnapshot(spark, dir).get

      // 2. whole-day deletes never needed a dv, in either generation
      assert(snap.dvs.isEmpty,
        s"seed $seed: day DELETEs must stay metadata-only, got ${snap.dvs}")
      // 3. the layout never erodes: every live file derives days or hours
      assert(snap.files.forall(f => snap.parts.get(f).exists(p =>
        p.contains("days(ts)") || p.contains("hours(ts)"))),
        s"seed $seed: a live file lost its derived partition value")

      // 1. exact survivors
      val got = spark.sql(s"SELECT k FROM graft.`$dir`")
        .as[Long].collect().toSet
      val expect = live.flatMap(b => (0 until 5).map(i => b * 10 + i))
      assert(got === expect, s"seed $seed: survivors diverged " +
        s"(missing ${expect -- got}, extra ${got -- expect})")

      // 4. pruned scan ≡ full scan on random day probes across both
      // generations (the SQL scan runs through the manifest FileIndex)
      val r = new scala.util.Random(seed)
      val probes = appended.toArray(Array.empty[java.lang.Long])
        .map(_.longValue())
      (1 to 5).foreach { _ =>
        if (probes.nonEmpty) {
          val b = probes(r.nextInt(probes.length))
          val d = dayOf(b)
          val n = spark.sql(s"SELECT count(*) FROM graft.`$dir` WHERE " +
            s"ts BETWEEN TIMESTAMP '$d 00:00:00' AND " +
            s"TIMESTAMP '$d 23:59:59.999999'").as[Long].head()
          assert(n === (if (live(b)) 5L else 0L),
            s"seed $seed: day probe $d expected ${if (live(b)) 5 else 0}, got $n")
          // and the metadata pruner agrees file-by-file with the files'
          // OWN recorded generation
          val loMs = d.toEpochDay * 86400000L
          val kept = ManifestStore.pruneFiles(snap, "ts",
            new java.sql.Timestamp(loMs),
            new java.sql.Timestamp(loMs + 86399999L))
          kept.foreach { f =>
            val p = snap.parts(f)
            val ok = p.get("days(ts)").forall(_ == (19700L + b).toString) &&
              p.get("hours(ts)").forall { h =>
                val hv = h.toLong; hv >= (19700L + b) * 24 && hv < (19701L + b) * 24
              }
            assert(ok, s"seed $seed: pruner kept out-of-day file $f -> $p")
          }
        }
      }
    }
  }

  test("where-filtered CDF stream under INSERT ∥ DELETE ∥ evolution: admitted ≡ the slice of each commit") {
    // the round-11 row-exactness property (static predicates, static
    // table) composed with the op mix above: a `where`-sliced change-feed
    // stream tails the table WHILE appends land, whole days get
    // retention-deleted, and the partition spec flips generations —
    // admitted inserts must be exactly the slice of every appended batch,
    // admitted deletes exactly the slice of every successful DELETE, and
    // the data-neutral evolution/compaction commits must emit NOTHING
    (1 to 2).foreach { seed =>
      val dir = tmpDir()
      spark.sql(s"CREATE TABLE graft.`$dir` (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
      // the slice: batches 1..3's days (fixed, mid-range — appends keep
      // producing out-of-slice days past batch 3)
      val w = s"ts BETWEEN TIMESTAMP '${dayOf(1)} 00:00:00' AND " +
        s"TIMESTAMP '${dayOf(3)} 23:59:59.999999'"
      val sliceBatches = Set(1L, 2L, 3L)
      val schema =
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, ts TIMESTAMP")
      val qn = s"where_race_$seed"
      val stream = spark.readStream.format("graft-manifest")
        .schema(schema)
        .option("startingVersion", "earliest")
        .option("readChangeFeed", "true")
        .option("where", w)
        .load(dir)
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", Files.createTempDirectory("ckpt-wr").toString)
        .start()

      val appended = new ConcurrentLinkedQueue[Long]()
      val deleted = new ConcurrentLinkedQueue[Long]()
      val errors = new ConcurrentLinkedQueue[Throwable]()
      val deadline = System.currentTimeMillis() + 4000
      def loop(name: String)(body: scala.util.Random => Unit): Thread = {
        val t = new Thread(() => {
          val r = new scala.util.Random(seed * 1409 + name.hashCode)
          try while (System.currentTimeMillis() < deadline) body(r)
          catch { case e: Throwable => errors.add(e): Unit }
        }, name)
        t.start(); t
      }
      val nextBatch = new java.util.concurrent.atomic.AtomicLong(0L)
      val appender = loop("appender") { _ =>
        val b = nextBatch.getAndIncrement()
        val d = dayOf(b)
        val values = (0 until 5).map(i =>
          s"(${b * 10 + i}, TIMESTAMP '$d ${"%02d".format(3 * i + 2)}:15:00')")
        spark.sql(s"INSERT INTO graft.`$dir` VALUES ${values.mkString(", ")}")
        appended.add(b)
        Thread.sleep(60)
      }
      val deleter = loop("deleter") { r =>
        Thread.sleep(250)
        val done = appended.toArray(Array.empty[java.lang.Long])
        val cand = done.filterNot(b => deleted.contains(b))
        if (cand.nonEmpty) {
          val b = cand(r.nextInt(cand.length)).longValue()
          try {
            spark.sql(s"DELETE FROM graft.`$dir` " +
              s"WHERE date(ts) = DATE '${dayOf(b)}'")
            deleted.add(b): Unit
          } catch {
            case e: Throwable if causeChain(e).exists(
              _.isInstanceOf[java.util.ConcurrentModificationException]) => ()
          }
        }
      }
      val evolver = loop("evolver") { r =>
        Thread.sleep(400)
        // calendar generations included: the stream's file pruning and
        // byte slicing must survive months(ts) layouts too (a month
        // wholly contains the slice's days, so month evidence keeps the
        // slice files and the row filter stays exact)
        val spec = r.nextInt(3) match {
          case 0 => "days(ts)"
          case 1 => "hours(ts)"
          case _ => "months(ts)"
        }
        ManifestStore.setPartitionSpec(spark, dir, Seq(spec)): Unit
      }
      try {
        Seq(appender, deleter, evolver).foreach(_.join(30000))
        assert(errors.isEmpty, s"seed $seed: racing thread failed: " +
          s"${Option(errors.peek()).map(causeChain(_).mkString(" <- "))}")
        stream.processAllAvailable()
      } finally stream.stop()

      val rows = spark.table(qn)
        .select($"k", $"_change_type").as[(Long, String)].collect()
      def keysOf(bs: Set[Long]) = bs.flatMap(b => (0 until 5).map(b * 10 + _))
      val wantIns = keysOf(appended.toArray(Array.empty[java.lang.Long])
        .map(_.longValue()).toSet & sliceBatches)
      val wantDel = keysOf(deleted.toArray(Array.empty[java.lang.Long])
        .map(_.longValue()).toSet & sliceBatches)
      val gotIns = rows.filter(_._2 == "insert").map(_._1).toSet
      val gotDel = rows.filter(_._2 == "delete").map(_._1).toSet
      assert(gotIns === wantIns, s"seed $seed: sliced inserts diverged " +
        s"(missing ${wantIns -- gotIns}, phantom ${gotIns -- wantIns})")
      assert(gotDel === wantDel, s"seed $seed: sliced deletes diverged " +
        s"(missing ${wantDel -- gotDel}, phantom ${gotDel -- wantDel})")
      // and nothing else leaked through (no duplicate emissions, no rows
      // from evolution commits)
      assert(rows.length === wantIns.size + wantDel.size,
        s"seed $seed: ${rows.length} rows for ${wantIns.size} inserts + " +
          s"${wantDel.size} deletes")
    }
  }

  test("full maintenance mix: bounded compaction ∥ bounded migration ∥ spec flips ∥ INSERTs ∥ where-CDF") {
    // every maintenance lever AT ONCE (round-12 VERDICT task 6): bounded
    // compactSmall bites, a bounded migrate_layout drain, partition-spec
    // flips across all three generations, concurrent SQL INSERTs, and a
    // where-sliced CDF stream tailing the table throughout. Post-quiesce:
    //  1. row multiset exact (no lost/duplicated rows from any rewrite);
    //  2. CDF replay ≡ the appends exactly (every maintenance commit is
    //     data-neutral — zero emitted rows);
    //  3. per-file spec consistency: every live file carries a derived
    //     value under one of the declared generations;
    //  4. no orphans: after a REAL vacuum (keep 1 version, retain 0) the
    //     table still reads exactly and every data file on disk is live;
    //  5. the sliced stream admitted exactly its slice of every append.
    (1 to 2).foreach { seed =>
      val dir = tmpDir()
      spark.sql(s"CREATE TABLE graft.`$dir` (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
      val schema =
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, ts TIMESTAMP")
      val w = s"ts BETWEEN TIMESTAMP '${dayOf(1)} 00:00:00' AND " +
        s"TIMESTAMP '${dayOf(3)} 23:59:59.999999'"
      val sliceBatches = Set(1L, 2L, 3L)
      val qn = s"mix_race_$seed"
      val stream = spark.readStream.format("graft-manifest")
        .schema(schema)
        .option("startingVersion", "earliest")
        .option("readChangeFeed", "true")
        .option("where", w)
        .load(dir)
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", Files.createTempDirectory("ckpt-mix").toString)
        .start()

      val appended = new ConcurrentLinkedQueue[Long]()
      val errors = new ConcurrentLinkedQueue[Throwable]()
      val deadline = System.currentTimeMillis() + 6000
      def loop(name: String)(body: scala.util.Random => Unit): Thread = {
        val t = new Thread(() => {
          val r = new scala.util.Random(seed * 2287 + name.hashCode)
          try while (System.currentTimeMillis() < deadline) body(r)
          catch { case e: Throwable => errors.add(e): Unit }
        }, name)
        t.start(); t
      }
      val nextBatch = new java.util.concurrent.atomic.AtomicLong(0L)
      val appender = loop("appender") { _ =>
        val b = nextBatch.getAndIncrement()
        val d = dayOf(b)
        val values = (0 until 5).map(i =>
          s"(${b * 10 + i}, TIMESTAMP '$d ${"%02d".format(3 * i + 2)}:15:00')")
        spark.sql(s"INSERT INTO graft.`$dir` VALUES ${values.mkString(", ")}")
        appended.add(b)
        Thread.sleep(60)
      }
      // tiny byte bounds force MANY bites — the drain protocol under race
      val compactor = loop("compactor") { _ =>
        Thread.sleep(250)
        try ManifestStore.compactSmall(spark, dir, schema,
          maxInputBytes = Some(1L << 16)): Unit
        catch { case _: java.util.ConcurrentModificationException => () }
      }
      val migrator = loop("migrator") { _ =>
        Thread.sleep(300)
        try ManifestStore.migrateLayout(spark, dir, schema,
          maxBytes = Some(1L << 16)): Unit
        catch { case _: java.util.ConcurrentModificationException => () }
      }
      val evolver = loop("evolver") { r =>
        Thread.sleep(400)
        val spec = r.nextInt(3) match {
          case 0 => "days(ts)"
          case 1 => "hours(ts)"
          case _ => "months(ts)"
        }
        ManifestStore.setPartitionSpec(spark, dir, Seq(spec)): Unit
      }
      try {
        Seq(appender, compactor, migrator, evolver).foreach(_.join(30000))
        assert(errors.isEmpty, s"seed $seed: racing thread failed: " +
          s"${Option(errors.peek()).map(causeChain(_).mkString(" <- "))}")
        stream.processAllAvailable()
      } finally stream.stop()

      val allB = appended.toArray(Array.empty[java.lang.Long])
        .map(_.longValue()).toSet
      def keysOf(bs: Set[Long]) = bs.flatMap(b => (0 until 5).map(b * 10 + _))
      val expect = keysOf(allB)

      // 1. exact row multiset (count catches duplicates, set catches loss)
      val got = spark.sql(s"SELECT k FROM graft.`$dir`").as[Long].collect()
      assert(got.length === expect.size && got.toSet === expect,
        s"seed $seed: rows diverged under the maintenance mix")

      // 2. CDF replay ≡ the appends: every maintenance commit data-neutral
      val snap = ManifestStore.currentSnapshot(spark, dir).get
      val cdf = ManifestStore.changes(spark, dir, 0L, snap.version, schema)
        .select($"k", $"_change_type").as[(Long, String)].collect()
      assert(cdf.forall(_._2 == "insert"),
        s"seed $seed: maintenance leaked non-insert CDF rows")
      assert(cdf.map(_._1).toSet === expect && cdf.length === expect.size,
        s"seed $seed: CDF replay diverged from the appends")

      // 3. per-file spec consistency across the three generations
      val gens = Set("days(ts)", "hours(ts)", "months(ts)")
      assert(snap.files.forall(f => snap.parts.get(f).exists(p =>
        p.keySet.exists(gens) && p.values.forall(v =>
          scala.util.Try(v.toLong).isSuccess))),
        s"seed $seed: a live file lost its derived partition value")

      // 4. no orphans after a REAL vacuum: the table still reads exactly,
      // and every parquet on disk is in the live set
      ManifestStore.vacuum(spark, dir, keepVersions = 1, retainMillis = 0L)
      val after = spark.sql(s"SELECT k FROM graft.`$dir`").as[Long].collect()
      assert(after.length === expect.size && after.toSet === expect,
        s"seed $seed: vacuum touched live data")
      val liveSet = ManifestStore.currentSnapshot(spark, dir).get.files.toSet
      val onDisk = {
        def walk(d: java.io.File): Seq[java.io.File] =
          Option(d.listFiles()).toSeq.flatten.flatMap(f =>
            if (f.isDirectory) walk(f) else Seq(f))
        walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
          .map(f => new java.io.File(dir).toPath.relativize(f.toPath).toString)
          .filterNot(_.startsWith("_manifest"))
      }
      val orphans = onDisk.filterNot(liveSet.contains)
      assert(orphans.isEmpty, s"seed $seed: orphaned data files: $orphans")

      // 5. the sliced stream admitted exactly its slice of every append
      val streamed = spark.table(qn)
        .select($"k", $"_change_type").as[(Long, String)].collect()
      val wantIns = keysOf(allB & sliceBatches)
      assert(streamed.forall(_._2 == "insert") &&
        streamed.map(_._1).toSet === wantIns &&
        streamed.length === wantIns.size,
        s"seed $seed: sliced stream diverged under the maintenance mix")
    }
  }
}

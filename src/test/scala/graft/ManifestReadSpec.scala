package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestStore

/** The READ half of `format("graft-manifest")` ([[graft.sources.ManifestRead]]):
  * `spark.read.format("graft-manifest")` must serve exactly what
  * [[ManifestStore.read]]/`readVersion`/`readTag` compute — latest and
  * time-travel (versionAsOf / timestampAsOf / tag) — through a NATIVE
  * vectorized parquet scan whose file listing comes from the manifest,
  * with manifest-stat/partition/bloom data skipping visible in the scan's
  * numFiles metric, and an exact dv-aware fallback once tombstones exist.
  */
class ManifestReadSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, v STRING")

  private def tmpDir(): String =
    Files.createTempDirectory("graft-read").toString

  private def strideDf(start: Int) =
    (start until 300 by 3).map(i => (i.toLong, s"s$i")).toDF("k", "v").repartition(1)

  private def readFmt(dir: String): DataFrame =
    spark.read.format("graft-manifest").load(dir)

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  /** Files the executed plan actually read (FileSourceScanExec metric). */
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }
    assert(scans.nonEmpty, "expected a native FileSourceScanExec")
    scans.sum
  }

  test("load() round-trips the latest snapshot through the native scan") {
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir)
    ManifestStore.append(strideDf(1), dir)
    assert(rows(readFmt(dir)) === rows(ManifestStore.readLatest(spark, dir)))
    // the scan is the native parquet path (codegen'd, vectorized)
    assert(filesRead(readFmt(dir)) === 2L)
    // schema came from the manifest, no caller StructType
    assert(readFmt(dir).schema.fieldNames.toSeq === Seq("k", "v"))
    // write half unchanged: the same format round-trips its own output
    strideDf(2).write.format("graft-manifest").mode("append").save(dir)
    assert(rows(readFmt(dir)).size === 300)
  }

  test("manifests record per-file byte sizes; every lineage path carries them") {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir)
    ManifestStore.append(strideDf(1), dir)
    val f = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def snap(d: String) = ManifestStore.currentSnapshot(spark, d).get
    val s = snap(dir)
    assert(s.files.nonEmpty && s.files.forall(s.sizes.contains))
    s.files.foreach { rel =>
      assert(s.sizes(rel) === f.getFileStatus(new Path(dir, rel)).getLen,
        s"recorded size of $rel diverges from the filesystem")
    }
    // carried through a metadata-only commit (delete-dv), restored by
    // restore, rewritten files get fresh sizes from compaction
    ManifestStore.deleteWhere(spark, dir, schema, col("k") % 7 === 0)
    assert(snap(dir).files.forall(snap(dir).sizes.contains))
    val vDel = snap(dir).version
    ManifestStore.compact(spark, dir, schema, numFiles = 1)
    val sc = snap(dir)
    assert(sc.files.size === 1 && sc.files.forall(sc.sizes.contains))
    ManifestStore.restore(spark, dir, vDel)
    assert(snap(dir).files.forall(snap(dir).sizes.contains))
    // clones rekey sizes with the files
    val dst = tmpDir()
    ManifestStore.cloneShallow(spark, dir, dst)
    val scl = snap(dst)
    assert(scl.files.nonEmpty && scl.files.forall(scl.sizes.contains))
    // and the read path's FileIndex plans from them (no re-stat): the
    // native scan still reads the right bytes
    assert(rows(readFmt(dst)) === rows(ManifestStore.read(spark, dir, schema)))
  }

  test("versionAsOf / timestampAsOf / tag time-travel") {
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir)
    val v1 = ManifestStore.currentSnapshot(spark, dir).get.version
    ManifestStore.tag(spark, dir, "first", v1)
    Thread.sleep(20)
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    ManifestStore.overwrite(Seq((9999L, "z")).toDF("k", "v"), dir)

    val expected1 = (0 until 300 by 3).map(i => (i.toLong, s"s$i")).toSet
    assert(rows(spark.read.format("graft-manifest")
      .option("versionAsOf", v1.toString).load(dir)) === expected1)
    assert(rows(spark.read.format("graft-manifest")
      .option("timestampAsOf", cut.toString).load(dir)) === expected1)
    assert(rows(spark.read.format("graft-manifest")
      .option("tag", "first").load(dir)) === expected1)
    assert(rows(readFmt(dir)) === Set(9999L -> "z"))
    // a bad tag / too-early timestamp fail loudly, not empty
    intercept[NoSuchElementException] {
      spark.read.format("graft-manifest").option("tag", "nope").load(dir)
    }
    intercept[NoSuchElementException] {
      spark.read.format("graft-manifest").option("timestampAsOf", "5").load(dir)
    }
  }

  test("filters skip files via manifest stats and blooms in the native scan") {
    val dir = tmpDir()
    // three files with DISJOINT key ranges: stats prune ranges exactly
    ManifestStore.append((0L until 100L).map(i => (i, s"a$i")).toDF("k", "v").repartition(1), dir)
    ManifestStore.append((100L until 200L).map(i => (i, s"b$i")).toDF("k", "v").repartition(1), dir)
    ManifestStore.append((200L until 300L).map(i => (i, s"c$i")).toDF("k", "v").repartition(1), dir)

    val point = readFmt(dir).filter(col("k") === 150L)
    assert(rows(point) === Set(150L -> "b150"))
    assert(filesRead(point) === 1L, "point lookup must prune to one file by stats")

    val range = readFmt(dir).filter(col("k") >= 150L && col("k") < 250L)
    assert(range.count() === 100L)
    assert(filesRead(range) === 2L, "range must prune the disjoint file")

    // one-sided bound prunes too (long sentinel space)
    val tail = readFmt(dir).filter(col("k") >= 250L)
    assert(tail.count() === 50L)
    assert(filesRead(tail) === 1L)

    // string equality prunes via blooms on an unclustered column
    ManifestStore.buildBlooms(spark, dir, Seq("v"))
    val bloomed = readFmt(dir).filter(col("v") === "a42")
    assert(rows(bloomed) === Set(42L -> "a42"))
    assert(filesRead(bloomed) === 1L, "bloom must prune the string point probe")

    // IN prunes per VALUE (union of each value's admitted files), not by
    // its min/max envelope — "a42" and "c242" must read exactly two files
    val inq = readFmt(dir).filter(col("v").isin("a42", "c242"))
    assert(rows(inq) === Set(42L -> "a42", 242L -> "c242"))
    assert(filesRead(inq) === 2L, "IN must prune per value via blooms")
    // an integer IN spanning two files likewise skips the third by stats
    val inK = readFmt(dir).filter(col("k").isin(10L, 110L))
    assert(rows(inK) === Set(10L -> "a10", 110L -> "b110"))
    assert(filesRead(inK) === 2L, "IN must prune per value via range stats")
  }

  test("one-sided string ranges prune files on a string-clustered table") {
    val dir = tmpDir()
    // two files with DISJOINT string ranges for v
    ManifestStore.append(Seq((1L, "apple"), (2L, "banana"), (3L, "cherry"))
      .toDF("k", "v").repartition(1), dir)
    ManifestStore.append(Seq((4L, "xray"), (5L, "yam"), (6L, "zebra"))
      .toDF("k", "v").repartition(1), dir)

    // col >= lit with no upper bound: strings have no max sentinel value,
    // so this shape pruned NOTHING before Unbounded ranges existed
    val hi = readFmt(dir).filter(col("v") >= "xray")
    assert(rows(hi) === Set(4L -> "xray", 5L -> "yam", 6L -> "zebra"))
    assert(filesRead(hi) === 1L, "one-sided string lower bound must prune")
    val lo = readFmt(dir).filter(col("v") < "d")
    assert(lo.count() === 3L)
    assert(filesRead(lo) === 1L, "one-sided string upper bound must prune")
    // the FileIndex agrees with the store-level pruner
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(ManifestStore.pruneFilesWhere(snap,
      Seq(("v", "xray", ManifestStore.Unbounded))).size === 1)
  }

  test("non-finite double literals never prune away matching rows") {
    val dir = tmpDir()
    val dSchema = StructType.fromDDL("k BIGINT, x DOUBLE")
    // one file whose x values are ALL -Infinity (stats min=max=-Inf), one
    // file that CONTAINS NaN next to finite values, one plain finite file
    ManifestStore.append(Seq((1L, Double.NegativeInfinity),
      (2L, Double.NegativeInfinity)).toDF("k", "x").repartition(1), dir)
    ManifestStore.append(Seq((3L, Double.NaN), (4L, 10.0))
      .toDF("k", "x").repartition(1), dir)
    ManifestStore.append(Seq((5L, 100.0), (6L, 200.0))
      .toDF("k", "x").repartition(1), dir)

    // Spark SQL: NaN = NaN is TRUE — a NaN literal must not become a
    // (NaN, NaN) stat range whose comparisons prune every file
    assert(readFmt(dir).filter(col("x") === Double.NaN)
      .select("k").as[Long].collect().toSet === Set(3L))
    // x < 0 must keep the all--Infinity file (a finite sentinel like
    // Double.MinValue would prove it "disjoint")
    assert(readFmt(dir).filter(col("x") < 0.0)
      .select("k").as[Long].collect().toSet === Set(1L, 2L))
    // and an Infinity literal itself is refused for pruning, not mis-ranged
    assert(readFmt(dir).filter(col("x") < Double.PositiveInfinity).count() === 5L)
    // sanity: finite predicates still work — NaN orders ABOVE every value
    // in Spark SQL, so x >= 100 matches {NaN, 100, 200} (the NaN file
    // wrote no parquet double stats, so no stat range can prune it)
    val fin = readFmt(dir).filter(col("x") >= 100.0)
    assert(fin.select("k").as[Long].collect().toSet === Set(3L, 5L, 6L))
    assert(ManifestStore.currentSnapshot(spark, dir).get.files.size === 3)
  }

  test("conflicting time-travel options are rejected loudly") {
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir)
    val v1 = ManifestStore.currentSnapshot(spark, dir).get.version
    ManifestStore.tag(spark, dir, "first", v1)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-manifest")
        .option("versionAsOf", v1.toString).option("tag", "first").load(dir)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-manifest")
        .option("timestampAsOf", System.currentTimeMillis().toString)
        .option("tag", "first").load(dir)
    }
    // a single specifier still works
    assert(rows(spark.read.format("graft-manifest")
      .option("tag", "first").load(dir)).size === 100)
  }

  test("partitioned tables prune on manifest partition values") {
    val dir = tmpDir()
    ManifestStore.appendPartitioned(
      (0L until 300L).map(i => (i, s"p${i % 3}", s"s$i")).toDF("k", "part", "v"),
      dir, Seq("part"))
    val one = readFmt(dir).filter(col("part") === "p1")
    assert(one.count() === 100L)
    val all = filesRead(readFmt(dir))
    assert(filesRead(one) * 3 <= all * 1 + 2,
      s"partition filter must prune ~2/3 of ${all} files")
    // partition columns live IN the files: full rows come back
    assert(one.select("k", "part", "v").where(col("k") === 1L)
      .as[(Long, String, String)].collect().toSeq === Seq((1L, "p1", "s1")))
  }

  test("df.write.partitionBy routes through the partitioned manifest writer") {
    val dir = tmpDir()
    (0L until 300L).map(i => (i, s"p${i % 3}", s"s$i")).toDF("k", "part", "v")
      .write.format("graft-manifest").partitionBy("part").mode("append").save(dir)
    val s = ManifestStore.currentSnapshot(spark, dir).get
    // per-file partition values recorded -> metadata pruning works
    assert(s.parts.nonEmpty && s.parts.values.forall(_.contains("part")))
    val one = readFmt(dir).filter(col("part") === "p1")
    assert(one.count() === 100L)
    assert(filesRead(one) < filesRead(readFmt(dir)))
    // overwrite + partitionBy is refused loudly
    intercept[IllegalArgumentException] {
      (0L until 3L).map(i => (i, "p0", "x")).toDF("k", "part", "v")
        .write.format("graft-manifest").partitionBy("part")
        .mode("overwrite").save(dir)
    }
  }

  test("deletion vectors: reads stay exact through the dv fallback") {
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir)
    ManifestStore.append(strideDf(1), dir)
    val vPre = ManifestStore.currentSnapshot(spark, dir).get.version
    ManifestStore.deleteWhere(spark, dir, schema, col("k") % 7 === 0)
    val expect = (0 until 300).filter(i => i % 3 < 2)
      .map(_.toLong).filterNot(_ % 7 == 0)
      .map(i => (i, s"s$i")).toSet
    assert(rows(readFmt(dir)) === expect)
    // pushed filters and prunes are applied INSIDE the delegated plan
    assert(rows(readFmt(dir).filter(col("k") > 200L)) ===
      expect.filter(_._1 > 200L))
    assert(readFmt(dir).select("v").distinct().count() === expect.size.toLong)
    assert(readFmt(dir).count() === expect.size.toLong)
    // time travel to the pre-dv version returns to the native scan
    val pre = spark.read.format("graft-manifest")
      .option("versionAsOf", vPre.toString).load(dir)
    assert(filesRead(pre) === 2L)
    // compaction materializes tombstones -> native path again, same rows
    ManifestStore.compact(spark, dir, schema, numFiles = 1)
    assert(rows(readFmt(dir)) === expect)
    assert(filesRead(readFmt(dir)) === 1L)
  }

  test("streaming SOURCE: new commits arrive per micro-batch, offsets are versions") {
    val dir = tmpDir()
    val out = s"${tmpDir()}/out"
    val cp = tmpDir()
    ManifestStore.append(Seq((1L, "pre")).toDF("k", "v"), dir)
    // default floor: the pre-existing commit does NOT stream
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("msrc")
      .option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      assert(spark.table("msrc").count() === 0L)
      ManifestStore.append(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), dir)
      q.processAllAvailable()
      assert(spark.table("msrc").as[(Long, String)].collect().toSet ===
        Set(2L -> "b", 3L -> "c"))
      ManifestStore.append(Seq((4L, "d")).toDF("k", "v"), dir)
      q.processAllAvailable()
      assert(spark.table("msrc").count() === 3L)
    } finally q.stop()

    // startingVersion=earliest replays the whole retained lineage
    val q2 = spark.readStream.format("graft-manifest")
      .option("startingVersion", "earliest").load(dir)
      .writeStream.format("memory").queryName("msrc2")
      .option("checkpointLocation", tmpDir()).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("msrc2").as[(Long, String)].collect().toSet ===
        Set(1L -> "pre", 2L -> "b", 3L -> "c", 4L -> "d"))
    } finally q2.stop()

    // startingTimestamp floors at the version current at that instant:
    // everything already committed is skipped, later commits stream
    Thread.sleep(20)
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    val q3 = spark.readStream.format("graft-manifest")
      .option("startingTimestamp", cut.toString).load(dir)
      .writeStream.format("memory").queryName("msrc3")
      .option("checkpointLocation", tmpDir()).start()
    try {
      q3.processAllAvailable()
      assert(spark.table("msrc3").count() === 0L)
      ManifestStore.append(Seq((5L, "e")).toDF("k", "v"), dir)
      q3.processAllAvailable()
      assert(spark.table("msrc3").as[(Long, String)].collect().toSet ===
        Set(5L -> "e"))
    } finally q3.stop()
    val _ = out
  }

  test("streaming source row mode refuses retractions; CDF mode streams them") {
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir)
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("mrow")
      .option("checkpointLocation", tmpDir()).start()
    try {
      ManifestStore.append(Seq((1000L, "x")).toDF("k", "v"), dir)
      q.processAllAvailable()
      assert(spark.table("mrow").count() === 1L)
      // a delete-dv commit retracts rows: the row stream must FAIL loudly
      ManifestStore.deleteWhere(spark, dir, schema, col("k") === 1000L)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("readChangeFeed") ||
        Option(ex.getCause).exists(_.getMessage.contains("readChangeFeed")))
    } finally q.stop()

    // CDF mode streams the same commit as tagged delete rows
    val q2 = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true")
      .option("startingVersion", "earliest").load(dir)
      .writeStream.format("memory").queryName("mcdf")
      .option("checkpointLocation", tmpDir()).start()
    try {
      q2.processAllAvailable()
      val byType = spark.table("mcdf").groupBy(col("_change_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType("insert") === 101L) // 100 stride + the x row
      assert(byType("delete") === 1L)
      val del = spark.table("mcdf").filter(col("_change_type") === "delete")
        .select("k", "_commit_op").as[(Long, String)].head()
      assert(del === (1000L, "delete-dv"))
    } finally q2.stop()

    // ignoreChanges: inserts flow, the retraction is (explicitly) dropped
    val q3 = spark.readStream.format("graft-manifest")
      .option("ignoreChanges", "true")
      .option("startingVersion", "earliest").load(dir)
      .writeStream.format("memory").queryName("mign")
      .option("checkpointLocation", tmpDir()).start()
    try {
      q3.processAllAvailable()
      assert(spark.table("mign").count() === 101L)
    } finally q3.stop()
  }

  test("streaming source: merge-dv commits refuse in row mode, stream via CDF") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    def merge(): Unit = {
      val src = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
        .select(col("k").as("__s_k"), col("v").as("__s_v"))
      assert(ManifestStore.mergeRows(spark, dir, schema, src,
        col("k") === col("__s_k"),
        Seq(ManifestStore.MergeClause(None, Some(Map("v" -> col("__s_v"))))),
        Seq(ManifestStore.MergeClause(None,
          Some(Map("k" -> col("__s_k"), "v" -> col("__s_v"))))),
        equiKeys = Seq("k" -> col("__s_k"))).nonEmpty)
    }
    // row mode: a merge can retract rows → refuse with guidance
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("mmrow")
      .option("checkpointLocation", tmpDir()).start()
    try {
      merge()
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("readChangeFeed") ||
        Option(ex.getCause).exists(_.getMessage.contains("readChangeFeed")))
    } finally q.stop()
    // CDF mode: the same commit streams as tagged delete + insert rows
    val q2 = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true")
      .option("startingVersion", "earliest").load(dir)
      .writeStream.format("memory").queryName("mmcdf")
      .option("checkpointLocation", tmpDir()).start()
    try {
      q2.processAllAvailable()
      val mergeRows = spark.table("mmcdf")
        .filter(col("_commit_op") === "merge-dv")
        .select("k", "v", "_change_type").as[(Long, String, String)]
        .collect().toSet
      assert(mergeRows === Set((2L, "b", "delete"), (2L, "B", "insert"),
        (3L, "c", "insert")))
    } finally q2.stop()
  }

  test("manifest-to-manifest streaming: source + exactly-once sink round-trip") {
    val src = tmpDir()
    val dst = tmpDir()
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v"), src)
    val q = spark.readStream.format("graft-manifest")
      .option("startingVersion", "earliest").load(src)
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", tmpDir())
      .option("appId", "relay").start(dst)
    try {
      q.processAllAvailable()
      ManifestStore.append(Seq((2L, "b")).toDF("k", "v"), src)
      q.processAllAvailable()
      assert(rows(ManifestStore.read(spark, dst, schema)) ===
        Set(1L -> "a", 2L -> "b"))
    } finally q.stop()
  }

  test("maxVersionsPerTrigger chunks a backlog and survives a restart") {
    val dir = tmpDir()
    val cp = tmpDir()
    (1 to 6).foreach(i => ManifestStore.append(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir))
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft-manifest")
        .option("startingVersion", "earliest")
        .option("maxVersionsPerTrigger", "2").load(dir)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batchSizes.synchronized { batchSizes += b.count() }: Unit
        }
        .start()
    val q = run()
    try {
      q.processAllAvailable()
      // 6 commits of 1 row, 2 commits per trigger -> 3 batches of 2 rows
      assert(batchSizes.synchronized(batchSizes.toSeq).filter(_ > 0) ===
        Seq(2L, 2L, 2L))
    } finally q.stop()
    // restart on the same checkpoint: no replay, no offset regression,
    // new commits keep chunking
    (7 to 10).foreach(i => ManifestStore.append(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir))
    batchSizes.synchronized(batchSizes.clear())
    val q2 = run()
    try {
      q2.processAllAvailable()
      assert(batchSizes.synchronized(batchSizes.toSeq).filter(_ > 0) ===
        Seq(2L, 2L))
    } finally q2.stop()
  }

  test("maxBytesPerTrigger chunks a backlog by commit bytes and survives a restart") {
    val dir = tmpDir()
    val cp = tmpDir()
    (1 to 6).foreach(i => ManifestStore.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").repartition(1), dir))
    // per-commit cost from the manifest's own recorded sizes (1 fresh
    // file per append; all six are near-identical single-row files)
    val per = ManifestStore.readManifest(spark, dir, 1L).sizes.values.sum
    assert(per > 0L, "appends must record sizes for byte admission")
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    def run(maxBytes: Long, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft-manifest")
        .option("startingVersion", "earliest")
        .option("maxBytesPerTrigger", maxBytes.toString).load(dir)
        .writeStream.option("checkpointLocation", checkpoint)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batchSizes.synchronized { batchSizes += b.count() }: Unit
        }
        .start()
    // cap ~2.5 commits -> batches of 2 commits each (soft max stops
    // BEFORE the third would exceed)
    val q = run(per * 5 / 2, cp)
    try {
      q.processAllAvailable()
      assert(batchSizes.synchronized(batchSizes.toSeq).filter(_ > 0) ===
        Seq(2L, 2L, 2L))
    } finally q.stop()
    // restart on the same checkpoint: no replay, new commits keep chunking
    (7 to 10).foreach(i => ManifestStore.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").repartition(1), dir))
    batchSizes.synchronized(batchSizes.clear())
    val q2 = run(per * 5 / 2, cp)
    try {
      q2.processAllAvailable()
      assert(batchSizes.synchronized(batchSizes.toSeq).filter(_ > 0) ===
        Seq(2L, 2L))
    } finally q2.stop()
    // progress guarantee: a cap below any single commit still streams,
    // one commit per batch
    batchSizes.synchronized(batchSizes.clear())
    val q3 = run(1L, tmpDir())
    try {
      q3.processAllAvailable()
      assert(batchSizes.synchronized(batchSizes.toSeq).filter(_ > 0) ===
        Seq.fill(10)(1L))
    } finally q3.stop()
  }

  test("byte admission charges data-neutral commits zero, not their rewritten size") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v").repartition(1), dir) // v1
    ManifestStore.append(Seq((2L, "b")).toDF("k", "v").repartition(1), dir) // v2
    ManifestStore.compact(spark, dir, schema)                               // v3
    ManifestStore.append(Seq((3L, "c")).toDF("k", "v").repartition(1), dir) // v4
    val per = ManifestStore.readManifest(spark, dir, 1L).sizes.values.sum
    assert(per > 0L)
    // cap = 1.5 appends: the compact's rewritten output (~2 appends of
    // bytes, zero fresh rows) must NOT pin it to its own batch — charged
    // 0, it packs with v2; only genuinely fresh rows consume budget
    val src = new graft.sources.ManifestSource(spark, dir, schema,
      startingVersion = 0L, readChangeFeed = true, ignoreChanges = false,
      maxVersionsPerTrigger = None, maxBytesPerTrigger = Some(per * 3 / 2))
    def next(): Long = src.getOffset.map(_.json.toLong).getOrElse(-1L)
    assert(next() === 1L, "v1 alone (v2 would exceed the cap)")
    assert(next() === 3L, "v2 + zero-cost compact in one batch")
    assert(next() === 4L)
    assert(next() === -1L, "backlog drained")
  }

  test("CDF stream drives Ivm: maintained aggregate tracks appends AND deletes") {
    import graft.operators.Ivm
    val dir = tmpDir()
    val stateDir = tmpDir()
    val stateSchema = StructType.fromDDL(
      "cat STRING, n_rows BIGINT, total DECIMAL(28,8)")
    def cat(i: Long) = s"c${i % 3}"
    ManifestStore.append(
      (0L until 30L).map(i => (i, cat(i))).toDF("k", "cat"), dir)
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true")
      .option("startingVersion", "earliest").load(dir)
      .writeStream.option("checkpointLocation", tmpDir())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // production pairs this with a version-stamped idempotent swap
        // (IvmSpec's crash-and-replay schedule); the test path is linear
        val state = ManifestStore.read(spark, stateDir, stateSchema)
        val next = Ivm.applyDelta(state, batch.toDF(), Seq("cat"), "k")
        ManifestStore.overwrite(next, stateDir): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      ManifestStore.append(
        (30L until 40L).map(i => (i, cat(i))).toDF("k", "cat"), dir)
      q.processAllAvailable()
      val tableSchema = StructType.fromDDL("k BIGINT, cat STRING")
      ManifestStore.deleteWhere(spark, dir, tableSchema, col("k") % 5 === 0L)
      q.processAllAvailable()
      // the maintained view equals a from-scratch recompute of the table
      val maintained = ManifestStore.read(spark, stateDir, stateSchema)
        .as[(String, Long, BigDecimal)].collect().toSet
      val recomputed = Ivm.recompute(
        ManifestStore.read(spark, dir, tableSchema), Seq("cat"), "k")
        .as[(String, Long, BigDecimal)].collect().toSet
      assert(maintained === recomputed)
      // 40 rows minus the 8 multiples of 5 (.toSeq: two groups share n_rows=11)
      assert(maintained.toSeq.map(_._2).sum === 32L)
    } finally q.stop()
  }

  test("autoCompact sink folds small-file maintenance into the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmpDir()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", tmpDir())
      .option("appId", "auto-c")
      .option("autoCompact", "true")
      .option("autoCompactEvery", "4")
      .start(dir)
    try {
      (1 to 8).foreach { i =>
        mem.addData((i.toLong, s"v$i"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val s = ManifestStore.currentSnapshot(spark, dir).get
    // two compactions (after batches 4 and 8) folded the micro-batch
    // files: far fewer files than commits, nothing lost
    assert(s.files.size < 8, s"expected compacted file count, got ${s.files.size}")
    assert(ManifestStore.history(spark, dir)
      .filter(col("op") === "compact").count() >= 1L)
    assert(rows(ManifestStore.read(spark, dir, schema)) ===
      (1 to 8).map(i => i.toLong -> s"v$i").toSet)
  }

  test("streaming sink output reads back through the same format") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmpDir()
    val cp = tmpDir()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", cp)
      .option("appId", "read-spec")
      .start(dir)
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(readFmt(dir)) === Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("streaming sink honors a DECLARED partitioned target without partitionBy") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir() + "/decl"
    ManifestStore.createEmpty(spark, dir,
      StructType.fromDDL("k BIGINT, part STRING"), Seq("part"))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "part").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", tmpDir())
      .option("appId", "decl-sink")
      .start(dir) // NO partitionBy — the table's declaration routes it
    try {
      mem.addData((1L, "p0"), (2L, "p1"))
      q.processAllAvailable()
    } finally q.stop()
    val s = ManifestStore.currentSnapshot(spark, dir).get
    assert(s.files.nonEmpty && s.files.forall(f =>
      s.parts.get(f).exists(_.contains("part"))),
      "declared partition columns must route the sink's hive-layout append")
  }

  test("streaming sink partitionBy records partition values, stays idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir()
    val cp = tmpDir()
    val mem = MemoryStream[(Long, String, String)]
    def run() = mem.toDF().toDF("k", "part", "v").writeStream
      .format("graft-manifest")
      .option("checkpointLocation", cp)
      .option("appId", "part-sink")
      .partitionBy("part")
      .start(dir)
    val q = run()
    try {
      mem.addData((1L, "p0", "a"), (2L, "p1", "b"))
      q.processAllAvailable()
      mem.addData((3L, "p0", "c"))
      q.processAllAvailable()
    } finally q.stop()
    val s = ManifestStore.currentSnapshot(spark, dir).get
    // hive layout + per-file partition values recorded, op is the
    // idempotent stream key
    assert(s.op.startsWith("stream:part-sink:"))
    assert(s.files.nonEmpty && s.files.forall(_.contains("__p_part=")))
    assert(s.parts.nonEmpty && s.files.forall(f =>
      s.parts.get(f).exists(_.contains("part"))))
    // partition columns stay IN the files: full rows come back, and the
    // partition filter prunes by metadata value alone
    val all = spark.read.format("graft-manifest").load(dir)
    assert(all.as[(Long, String, String)].collect().toSet ===
      Set((1L, "p0", "a"), (2L, "p1", "b"), (3L, "p0", "c")))
    val p0 = all.filter(col("part") === "p0")
    assert(p0.count() === 2L)
    assert(filesRead(p0) < filesRead(all))
    // restart on the same checkpoint: committed batches replay-skip
    val before = s.version
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(ManifestStore.currentSnapshot(spark, dir).get.version === before)
  }

  test("graft_changes TVF: SQL access to the change feed, bounds inclusive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf").toString
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v"), dir)     // v1
    ManifestStore.append(Seq((2L, "b")).toDF("k", "v"), dir)     // v2
    ManifestStore.deleteWhere(spark, dir,
      ManifestStore.currentSnapshot(spark, dir).get.schema.get,
      col("k") === 1L)                                           // v3
    // inclusive both ends: versions 2..3 = the second insert + the delete
    val feed = spark.sql(s"SELECT k, v, _change_type, _commit_version " +
      s"FROM graft_changes('$dir', 2, 3)")
      .as[(Long, String, String, Long)].collect().toSet
    assert(feed === Set((2L, "b", "insert", 2L), (1L, "a", "delete", 3L)))
    // to-bound defaults to the current version
    assert(spark.sql(s"SELECT count(*) FROM graft_changes('$dir', 1)")
      .as[Long].head() === 3L)
    // the feed composes with plain SQL (aggregate over change types)
    assert(spark.sql(
      s"""SELECT _change_type, count(*) AS n
         FROM graft_changes('$dir', 1) GROUP BY _change_type""")
      .as[(String, Long)].collect().toMap
      === Map("insert" -> 2L, "delete" -> 1L))
    // refusals: version 0, missing table
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('$dir', 0)").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('$dir/nope', 1)").collect()
    }
  }
}

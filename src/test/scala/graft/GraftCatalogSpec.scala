package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, RDDScanExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestStore

/** The SQL surface over manifest tables ([[graft.sources.GraftCatalog]]):
  * `graft.{dir}` identifiers must serve the whole lifecycle — CREATE /
  * INSERT / INSERT OVERWRITE / SELECT / time travel / DELETE — through
  * the same commits the DataFrame API makes, and SELECTs must plan the
  * NATIVE manifest scan (pruned, codegen'd) via [[graft.sources.ManifestV2Rewrite]],
  * deletion-vector tables included (no Row-boundary RDD scan anywhere).
  */
object GraftCatalogSpec {
  /** Shared evaluation counter for the single-evaluation overwrite test
    * (local mode: executor threads share the JVM, so a static counter
    * sees every UDF invocation).
    */
  val evalCount = new java.util.concurrent.atomic.AtomicLong(0L)
}

class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, v STRING")

  private def tmpDir(): String =
    Files.createTempDirectory("graft-cat").toString

  private def sqlTable(dir: String): String = s"graft.`$dir`"

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  /** Executed-plan audit: every scan is a native file scan — the rewrite
    * worked if NO RDD scan (the DSv1/V1Scan Row boundary) appears. Walks
    * through AQE wrappers (AdaptiveSparkPlanExec and its query stages are
    * leaf-like nodes hiding the real tree).
    */
  private def assertNativeScan(df: DataFrame, clue: String): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val all = nodes(df.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[RDDScanExec]),
      s"$clue: Row-boundary RDDScanExec leaked into ${all.map(_.nodeName)}")
    // count only the MANIFEST-planned data scans — a dv table also scans
    // its (tiny) tombstone sidecars through a plain parquet relation
    val files = all.collect {
      case s: FileSourceScanExec
          if s.relation.location.getClass.getSimpleName == "ManifestFileIndex" =>
        s.metrics("numFiles").value
    }
    assert(files.nonEmpty, s"$clue: expected a ManifestFileIndex-planned scan")
    files.sum
  }

  test("SELECT plans the native pruned scan through the catalog") {
    val dir = tmpDir()
    ManifestStore.append((0L until 100L).map(i => (i, s"a$i")).toDF("k", "v").repartition(1), dir)
    ManifestStore.append((100L until 200L).map(i => (i, s"b$i")).toDF("k", "v").repartition(1), dir)
    ManifestStore.append((200L until 300L).map(i => (i, s"c$i")).toDF("k", "v").repartition(1), dir)

    val all = spark.sql(s"SELECT * FROM ${sqlTable(dir)}")
    assert(rows(all) === rows(ManifestStore.readLatest(spark, dir)))
    assert(assertNativeScan(all, "full select") === 3L)

    // manifest stat pruning reaches the SQL path: one file of three
    val tail = spark.sql(s"SELECT * FROM ${sqlTable(dir)} WHERE k >= 250")
    assert(tail.count() === 50L)
    assert(assertNativeScan(tail, "pruned select") === 1L)
    // and projection prunes columns in the scan
    val proj = spark.sql(s"SELECT v FROM ${sqlTable(dir)} WHERE k = 150")
    assert(proj.as[String].collect().toSeq === Seq("b150"))
  }

  test("VERSION AS OF / TIMESTAMP AS OF / tag time-travel in SQL") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val v1 = ManifestStore.currentSnapshot(spark, dir).get.version
    ManifestStore.tag(spark, dir, "release", v1)
    Thread.sleep(20)
    val cutMs = System.currentTimeMillis()
    Thread.sleep(20)
    ManifestStore.overwrite(Seq((9L, "z")).toDF("k", "v"), dir)

    val expected1 = Set(1L -> "a", 2L -> "b")
    assert(rows(spark.sql(
      s"SELECT * FROM ${sqlTable(dir)} VERSION AS OF $v1")) === expected1)
    // non-digit VERSION AS OF resolves as a TAG name
    assert(rows(spark.sql(
      s"SELECT * FROM ${sqlTable(dir)} VERSION AS OF 'release'")) === expected1)
    val iso = java.time.Instant.ofEpochMilli(cutMs).toString
    assert(rows(spark.sql(
      s"SELECT * FROM ${sqlTable(dir)} TIMESTAMP AS OF '$iso'")) === expected1)
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) === Set(9L -> "z"))
  }

  test("CREATE TABLE / INSERT INTO / INSERT OVERWRITE / CTAS") {
    val dir = tmpDir() + "/t1"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, v STRING)")
    assert(spark.sql(s"SELECT * FROM ${sqlTable(dir)}").count() === 0L)
    intercept[Exception] { // second create refuses
      spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, v STRING)")
    }
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} SELECT k + 10, v FROM ${sqlTable(dir)}")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Set(1L -> "a", 2L -> "b", 11L -> "a", 12L -> "b"))
    // the commits are ordinary manifest versions: DataFrame API sees them
    assert(rows(ManifestStore.readLatest(spark, dir)).size === 4)

    spark.sql(s"INSERT OVERWRITE ${sqlTable(dir)} VALUES (7, 'seven')")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) === Set(7L -> "seven"))

    // CTAS: create + append in one statement
    val dir2 = tmpDir() + "/t2"
    spark.sql(s"CREATE TABLE ${sqlTable(dir2)} AS SELECT * FROM ${sqlTable(dir)}")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir2)}")) === Set(7L -> "seven"))

  }

  test("CREATE TABLE PARTITIONED BY routes writes through partition recording") {
    val dir = tmpDir() + "/pt"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'x'), (2, 'x'), " +
      "(3, 'y'), (4, 'z')")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.partitionCols === Seq("p"),
      "declared partition columns must persist in the manifest")
    assert(snap.parts.nonEmpty && snap.files.forall(f =>
      snap.parts.get(f).exists(_.contains("p"))),
      "every data file must record its partition value")
    // a partition predicate prunes to exactly that partition's files
    val q = spark.sql(s"SELECT k FROM ${sqlTable(dir)} WHERE p = 'y'")
    assert(q.as[Long].collect().toSeq === Seq(3L))
    val yFiles = snap.parts.count(_._2.get("p").contains("y")).toLong
    assert(assertNativeScan(q, "partition-pruned select") === yFiles)
    // INSERT OVERWRITE keeps the routing and replaces the table
    spark.sql(s"INSERT OVERWRITE ${sqlTable(dir)} VALUES (9, 'w'), (10, 'w')")
    val snap2 = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap2.op === "overwrite")
    assert(snap2.files.forall(f => snap2.parts.get(f).exists(_.get("p").contains("w"))))
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")
      .select("k", "p")) === Set(9L -> "w", 10L -> "w"))
    // CTAS PARTITIONED BY: create + partitioned append in one statement
    val dir2 = tmpDir() + "/pt2"
    spark.sql(s"CREATE TABLE ${sqlTable(dir2)} PARTITIONED BY (p) AS " +
      s"SELECT * FROM ${sqlTable(dir)}")
    val snap3 = ManifestStore.currentSnapshot(spark, dir2).get
    assert(snap3.partitionCols === Seq("p"))
    assert(snap3.files.forall(f => snap3.parts.get(f).exists(_.contains("p"))))
    // DESCRIBE surfaces the declared partitioning
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED ${sqlTable(dir)}")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("p"), desc)
    // unsupported transforms and non-integral/string identity columns
    // refuse (years/months/days/hours/bucket/truncate are the supported
    // hidden transforms — see HiddenPartitioningSpec)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmpDir()}/t3` (k BIGINT, " +
        "ts TIMESTAMP) PARTITIONED BY (weeks(ts))")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmpDir()}/t4` (k BIGINT, d DOUBLE) " +
        "PARTITIONED BY (d)")
    }
  }

  test("INSERT OVERWRITE PARTITION replaces exactly the matching partition") {
    val dir = tmpDir() + "/ptow"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'x'), (2, 'x'), " +
      "(3, 'y'), (4, 'z')")
    val vBefore = ManifestStore.currentSnapshot(spark, dir).get.version
    // the backfill shape: one atomic commit swaps partition x's files
    spark.sql(s"INSERT OVERWRITE ${sqlTable(dir)} PARTITION (p = 'x') " +
      "VALUES (11), (12)")
    assert(rows(spark.sql(s"SELECT k, p FROM ${sqlTable(dir)}")) ===
      Set(11L -> "x", 12L -> "x", 3L -> "y", 4L -> "z"))
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.version === vBefore + 1, "partial overwrite must be ONE commit")
    assert(snap.op === "overwrite")
    assert(snap.files.forall(f => snap.parts.get(f).exists(_.contains("p"))))
    // untouched partitions time-travel intact; replaced partition restores
    assert(rows(spark.sql(
      s"SELECT k, p FROM ${sqlTable(dir)} VERSION AS OF $vBefore")) ===
      Set(1L -> "x", 2L -> "x", 3L -> "y", 4L -> "z"))
    // rows outside the target partition refuse loudly (no silent leak)
    val e = intercept[Exception] {
      ManifestStore.overwritePartitions(
        spark.sql("SELECT CAST(9 AS BIGINT) AS k, 'OTHER' AS p"),
        dir, Seq("p"), Map("p" -> "y"))
    }
    assert(e.getMessage.toLowerCase.contains("partition"), e.getMessage)
    // and so does a non-partition overwrite predicate
    intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE ${sqlTable(dir)} " +
        "REPLACE WHERE k > 100 VALUES (7, 'x')")
    }
  }

  test("partition-covered SQL DELETE drops whole files as a pure manifest edit") {
    val dir = tmpDir() + "/ptd"
    val sch2 = StructType.fromDDL("k BIGINT, p STRING")
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'x'), (2, 'x'), " +
      "(3, 'y'), (4, 'y'), (5, 'z')")
    val before = ManifestStore.currentSnapshot(spark, dir).get
    // predicate ≡ its range and every x-file is partition-covered: the
    // commit drops files, writes NO tombstones, scans nothing
    spark.sql(s"DELETE FROM ${sqlTable(dir)} WHERE p = 'x'")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.op === "delete-dv")
    assert(snap.dvs.isEmpty, "whole-partition delete must not tombstone")
    assert(snap.files.size < before.files.size, "files must drop from the list")
    assert(rows(spark.sql(s"SELECT k, p FROM ${sqlTable(dir)}")) ===
      Set(3L -> "y", 4L -> "y", 5L -> "z"))
    // CDC reports the dropped files' rows as ordinary deletes
    val feed = ManifestStore.changes(spark, dir, before.version, snap.version,
      sch2).filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().toSet
    assert(feed === Set(1L, 2L))
    // a predicate outside the exact-range language (modulo) never drops
    // whole files — the dv path handles it row-level
    spark.sql(s"DELETE FROM ${sqlTable(dir)} WHERE p = 'y' AND k % 2 = 1")
    val snap2 = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap2.dvs.nonEmpty, "non-exact predicate must tombstone, not drop")
    assert(rows(spark.sql(s"SELECT k, p FROM ${sqlTable(dir)}")) ===
      Set(4L -> "y", 5L -> "z"))
  }

  test("stat-covered SQL DELETE drops whole files of a clustered table") {
    val dir = tmpDir()
    // key-clustered shape: one file per contiguous k range
    ManifestStore.append((1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), dir)
    ManifestStore.append((11L to 20L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), dir)
    ManifestStore.append((21L to 30L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1), dir)
    val before = ManifestStore.currentSnapshot(spark, dir).get
    // the retention shape: null-free footer bounds prove the first two
    // files wholly covered — they drop with zero scan and zero sidecars
    spark.sql(s"DELETE FROM ${sqlTable(dir)} WHERE k <= 20")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.files.size === before.files.size - 2)
    assert(snap.dvs.isEmpty, "stat-covered files must drop, not tombstone")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      (21L to 30L).map(i => i -> s"v$i").toSet)
    // a bound cutting THROUGH a file keeps the dv path for it
    spark.sql(s"DELETE FROM ${sqlTable(dir)} WHERE k >= 25")
    val snap2 = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap2.files === snap.files, "partially-covered file must stay")
    assert(snap2.dvs.nonEmpty)
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      (21L to 24L).map(i => i -> s"v$i").toSet)
    // null rows never drop with a file: nulls match no range predicate
    val dir2 = tmpDir()
    ManifestStore.append(Seq((Some(1L), "a"), (Some(2L), "b"),
      (None: Option[Long], "n")).toDF("k", "v").coalesce(1), dir2)
    spark.sql(s"DELETE FROM graft.`$dir2` WHERE k <= 5")
    assert(spark.sql(s"SELECT v FROM graft.`$dir2`").as[String]
      .collect().toSeq === Seq("n"),
      "the null-k row must survive a k-range delete")
  }

  test("row-level writes on a PARTITIONED BY table keep partition values") {
    val dir = tmpDir() + "/ptm"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'x'), (2, 'x'), " +
      "(3, 'y'), (4, 'z')")
    def allParted(clue: String): ManifestStore.Snapshot = {
      val s = ManifestStore.currentSnapshot(spark, dir).get
      assert(s.files.forall(f => s.parts.get(f).exists(_.contains("p"))),
        s"$clue: every live file must record its partition value")
      s
    }
    // canonical MERGE: staged images land hive-partitioned
    Seq((2L, "x"), (9L, "y")).toDF("k", "p").createOrReplaceTempView("ptm_src")
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING ptm_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(allParted("canonical merge").op === "merge-dv")
    // general-path MERGE (conditional clause) partitions its images too
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING ptm_src s ON t.k = s.k " +
      "WHEN MATCHED AND t.k = 9 THEN UPDATE SET k = t.k + 100")
    allParted("conditional merge")
    // UPDATE that MOVES a row across partitions records the new value
    spark.sql(s"UPDATE ${sqlTable(dir)} SET p = 'w' WHERE k = 1")
    val snap = allParted("update")
    assert(snap.files.exists(f => snap.parts.get(f).exists(_.get("p").contains("w"))))
    assert(rows(spark.sql(s"SELECT k, p FROM ${sqlTable(dir)}")) ===
      Set(1L -> "w", 2L -> "x", 3L -> "y", 4L -> "z", 109L -> "y"))
    // partition pruning still exact after the maintenance churn
    val q = spark.sql(s"SELECT k FROM ${sqlTable(dir)} WHERE p = 'z'")
    assert(q.as[Long].collect().toSeq === Seq(4L))
    val zFiles = snap.parts.count(_._2.get("p").contains("z")).toLong
    assert(assertNativeScan(q, "post-merge partition prune") === zFiles)
  }

  test("DELETE FROM tombstones via dv; SQL reads on dv tables stay codegen'd") {
    val dir = tmpDir()
    ManifestStore.append((0L until 100L).map(i => (i, s"a$i")).toDF("k", "v").repartition(1), dir)
    ManifestStore.append((100L until 200L).map(i => (i, s"b$i")).toDF("k", "v").repartition(1), dir)

    spark.sql(s"DELETE FROM ${sqlTable(dir)} WHERE k % 7 = 0")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.op === "delete-dv", "SQL DELETE must be a merge-on-read commit")
    assert(snap.dvs.nonEmpty)

    val expect = (0L until 200L).filterNot(_ % 7 == 0).map(i =>
      (i, (if (i < 100) "a" else "b") + i)).toSet
    // the dv table's SQL read: byte-identical to readVersion, and the
    // executed plan is the declarative scan+anti-join — NO RDD scan node
    val df = spark.sql(s"SELECT * FROM ${sqlTable(dir)}")
    assert(rows(df) === expect)
    assert(rows(df) === rows(ManifestStore.readVersion(spark, dir, snap.version, schema)))
    assertNativeScan(df, "dv table via catalog")
    // ... and the format() path gets the same rewrite on dv tables
    val fmt = spark.read.format("graft-manifest").load(dir)
    assert(rows(fmt) === expect)
    assertNativeScan(fmt, "dv table via format read")
    // file pruning still applies under the anti-join
    val pruned = spark.sql(s"SELECT * FROM ${sqlTable(dir)} WHERE k >= 150")
    assert(pruned.count() === expect.count(_._1 >= 150).toLong)
    assert(assertNativeScan(pruned, "pruned dv select") <= 2L)

    // DELETE with no WHERE empties the table as ONE metadata commit:
    // every file drops from the list, nothing is scanned or tombstoned
    spark.sql(s"DELETE FROM ${sqlTable(dir)}")
    assert(spark.sql(s"SELECT * FROM ${sqlTable(dir)}").count() === 0L)
    val emptied = ManifestStore.currentSnapshot(spark, dir).get
    assert(emptied.op === "delete-dv" && emptied.files.isEmpty,
      "unconditional DELETE must drop the file list, not tombstone rows")
  }

  test("UPDATE rewrites matched rows as one tombstone+append commit") {
    val dir = tmpDir()
    ManifestStore.append((0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"), dir)
    spark.sql(s"UPDATE ${sqlTable(dir)} SET v = concat(v, '!') WHERE k % 5 = 0")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.op === "update-dv", "SQL UPDATE must be the merge-on-read commit")
    val expect = (0L until 20L).map(i =>
      (i, if (i % 5 == 0) s"v$i!" else s"v$i")).toSet
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) === expect)
    // unconditional UPDATE touches every row
    spark.sql(s"UPDATE ${sqlTable(dir)} SET k = k + 100")
    assert(spark.sql(s"SELECT min(k) FROM ${sqlTable(dir)}")
      .as[Long].head() === 100L)
  }

  private def sortedRows(df: DataFrame): Seq[(Long, String)] =
    df.as[(Long, String)].collect().toSeq
      .sortBy(r => (r._1, Option(r._2).getOrElse("")))

  test("MERGE INTO upserts as one atomic merge-dv commit") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir)
    Seq((2L, "B2"), (4L, "d")).toDF("k", "v").createOrReplaceTempView("m_src")
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING m_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Set(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"))
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.op === "merge-dv", "SQL MERGE must be one atomic commit")
    assert(snap.dvs.nonEmpty, "matched rows must tombstone, not rewrite")
    // explicit full-row assignments are the same shape
    Seq((4L, "D4"), (5L, "e")).toDF("k", "v").createOrReplaceTempView("m_src2")
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING m_src2 s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Set(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "D4", 5L -> "e"))
    // WHEN MATCHED DELETE removes matched rows, leaves the rest in place
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING m_src2 s ON t.k = s.k " +
      "WHEN MATCHED THEN DELETE")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Set(1L -> "a", 2L -> "B2", 3L -> "c"))
    // and the staging copies are cleaned up — only data/manifest entries
    val fsDir = new java.io.File(dir)
    assert(!fsDir.listFiles().exists(_.getName.startsWith("tmp-merge-")),
      "merge staging dirs must be dropped after the commit")
  }

  test("MERGE clause conditions and values carry uncorrelated subqueries") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir)
    Seq((1L, "A1"), (2L, "B1"), (9L, "i")).toDF("k", "v")
      .createOrReplaceTempView("sq_src")
    Seq(("A1"), ("zz")).toDF("allow").createOrReplaceTempView("sq_allow")
    // IN-subquery clause condition: only source rows whose v is in the
    // allow list update; the rest of the matched set stays
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING sq_src s ON t.k = s.k " +
      "WHEN MATCHED AND s.v IN (SELECT allow FROM sq_allow) THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Set(1L -> "A1", 2L -> "b", 3L -> "c", 9L -> "i"))
    // scalar subquery in an assignment VALUE + EXISTS in a condition
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING sq_src s ON t.k = s.k " +
      "WHEN MATCHED AND EXISTS (SELECT 1 FROM sq_allow WHERE allow = 'zz') " +
      "THEN UPDATE SET v = (SELECT max(allow) FROM sq_allow)")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Set(1L -> "zz", 2L -> "zz", 3L -> "c", 9L -> "zz"))
    // NOT IN three-valued semantics: a NULL in the subquery result makes
    // NOT IN unknown (never true) — no row may update
    Seq(Some("A1"), None).toDF("allow").createOrReplaceTempView("sq_null")
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING sq_src s ON t.k = s.k " +
      "WHEN MATCHED AND s.v NOT IN (SELECT allow FROM sq_null) " +
      "THEN UPDATE SET v = 'nope'")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Set(1L -> "zz", 2L -> "zz", 3L -> "c", 9L -> "zz"),
      "NOT IN against a null-bearing set is UNKNOWN for every probe")
    // empty subquery set: IN → false for every probe (even null), NOT IN
    // → true
    spark.sql("SELECT allow FROM sq_allow WHERE false")
      .createOrReplaceTempView("sq_empty")
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING sq_src s ON t.k = s.k " +
      "WHEN MATCHED AND s.v NOT IN (SELECT allow FROM sq_empty) " +
      "THEN UPDATE SET v = concat(t.v, '!')")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Set(1L -> "zz!", 2L -> "zz!", 3L -> "c", 9L -> "zz!"))
    // a scalar subquery returning >1 row errors loudly at execution
    val em = intercept[Exception] {
      spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING sq_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = (SELECT allow FROM sq_allow)")
    }
    assert(causeChainContains(em, "GRAFT_SCALAR_SUBQUERY") ||
      causeChainContains(em, "MORE_THAN_ONE_ROW"), em.toString)
    // correlated subqueries still refuse (no silent semantics change)
    val ec = intercept[Exception] {
      spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING sq_src s ON t.k = s.k " +
        "WHEN MATCHED AND s.v IN (SELECT allow FROM sq_allow WHERE allow = t.v) " +
        "THEN UPDATE SET *")
    }
    assert(ec.getMessage != null, ec.toString)
  }

  private def causeChainContains(e: Throwable, needle: String): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(t => Option(t.getMessage).exists(_.contains(needle)))

  test("MERGE preserves duplicate matched TARGET rows (row-level, not keyed)") {
    val dir = tmpDir()
    ManifestStore.append(
      Seq((1L, "a"), (2L, "b1"), (2L, "b2")).toDF("k", "v"), dir)
    // source key 2 matches TWO target rows: standard MERGE updates each,
    // preserving multiplicity (a keyed upsert would collapse them)
    Seq((2L, "B"), (9L, "i")).toDF("k", "v").createOrReplaceTempView("m_dup_src")
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING m_dup_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(sortedRows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Seq(1L -> "a", 2L -> "B", 2L -> "B", 9L -> "i"))
  }

  test("MERGE errors on cardinality violation (one target row, two source rows)") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val vBefore = ManifestStore.currentSnapshot(spark, dir).get.version
    Seq((2L, "x"), (2L, "y")).toDF("k", "v").createOrReplaceTempView("m_card_src")
    val e = intercept[Exception] {
      spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING m_card_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e.getMessage.toLowerCase.contains("cardinality"), e.getMessage)
    assert(ManifestStore.currentSnapshot(spark, dir).get.version === vBefore,
      "a refused MERGE must not commit")
    // two source rows that match NO target row both insert — no violation
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING " +
      "(SELECT k + 100 AS k, v FROM m_card_src) s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(sortedRows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Seq(1L -> "a", 2L -> "b", 102L -> "x", 102L -> "y"))
  }

  test("MERGE conditional clauses: first-match-wins, partial SET, null-fill INSERT") {
    val dir = tmpDir()
    ManifestStore.append(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v"), dir)
    Seq((1L, "del"), (2L, "up"), (3L, "up"), (200L, "big"), (5L, "new"))
      .toDF("k", "v").createOrReplaceTempView("m_cond_src")
    spark.sql(s"""MERGE INTO ${sqlTable(dir)} t USING m_cond_src s ON t.k = s.k
      WHEN MATCHED AND s.v = 'del' THEN DELETE
      WHEN MATCHED AND t.k % 2 = 0 THEN UPDATE SET v = concat(t.v, '+', s.v)
      WHEN NOT MATCHED AND s.k > 100 THEN INSERT (k) VALUES (s.k)
      WHEN NOT MATCHED THEN INSERT *""")
    // k=1 deleted; k=2 matched+even → partial update keeps k; k=3 matched
    // but odd and not 'del' → NO clause applies, row stays untouched;
    // k=200 inserts with v null-filled; k=5 inserts whole row
    assert(sortedRows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Seq(2L -> "b+up", 3L -> "c", 4L -> "d", 5L -> "new", 200L -> null))
  }

  test("MERGE NOT MATCHED BY SOURCE updates/deletes the source-less rows") {
    val dir = tmpDir()
    ManifestStore.append(
      Seq((1L, "a"), (2L, "b"), (30L, "c"), (40L, "d")).toDF("k", "v"), dir)
    Seq((2L, "B"), (7L, "g")).toDF("k", "v").createOrReplaceTempView("m_bs_src")
    spark.sql(s"""MERGE INTO ${sqlTable(dir)} t USING m_bs_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.k < 10 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    // k=1 source-less and <10 → deleted; k=2 matched → updated; k=30/40
    // source-less → marked stale; k=7 unmatched source → inserted
    assert(sortedRows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) ===
      Seq(2L -> "B", 7L -> "g", 30L -> "stale", 40L -> "stale"))
  }

  test("MERGE multi-column ON keys and null-key source rows") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k1 BIGINT, k2 BIGINT, v STRING)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 10, 'a'), (1, 20, 'b'), (2, 10, 'c')")
    Seq((Some(1L), Some(10L), "A"), (Some(1L), Some(99L), "n1"),
      (None: Option[Long], Some(10L), "nullk"))
      .toDF("k1", "k2", "v").createOrReplaceTempView("m_mc_src")
    spark.sql(s"""MERGE INTO ${sqlTable(dir)} t USING m_mc_src s
      ON t.k1 = s.k1 AND t.k2 = s.k2
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    // (1,10) updates; (1,99) inserts; null k1 matches nothing → inserts
    val got = spark.sql(s"SELECT * FROM ${sqlTable(dir)}")
      .as[(Option[Long], Option[Long], String)].collect().toSet
    assert(got === Set(
      (Some(1L), Some(10L), "A"), (Some(1L), Some(20L), "b"),
      (Some(2L), Some(10L), "c"), (Some(1L), Some(99L), "n1"),
      (None, Some(10L), "nullk")))
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the target with source columns") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir)
    Seq((2L, "B", 20L), (4L, "d", 40L)).toDF("k", "v", "extra")
      .createOrReplaceTempView("m_evo_src")
    spark.sql(s"MERGE WITH SCHEMA EVOLUTION INTO ${sqlTable(dir)} t " +
      "USING m_evo_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.schema.get.fieldNames.toSeq === Seq("k", "v", "extra"),
      "the source-only column must widen the schema")
    val got = spark.sql(s"SELECT * FROM ${sqlTable(dir)}")
      .as[(Long, String, Option[Long])].collect().toSet
    // untouched rows null-fill the new column; matched/inserted carry it
    assert(got === Set((1L, "a", None), (2L, "B", Some(20L)),
      (3L, "c", None), (4L, "d", Some(40L))))
    // a second evolved merge with the SAME shape is a plain widened merge
    Seq((1L, "A", 10L)).toDF("k", "v", "extra")
      .createOrReplaceTempView("m_evo_src2")
    spark.sql(s"MERGE WITH SCHEMA EVOLUTION INTO ${sqlTable(dir)} t " +
      "USING m_evo_src2 s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql(s"SELECT extra FROM ${sqlTable(dir)} WHERE k = 1")
      .as[Option[Long]].head() === Some(10L))
    // WITHOUT the keyword a type-conflicting source column still refuses
    Seq((1L, 99L)).toDF("k", "v").createOrReplaceTempView("m_evo_bad")
    intercept[Exception] {
      spark.sql(s"MERGE WITH SCHEMA EVOLUTION INTO ${sqlTable(dir)} t " +
        "USING m_evo_bad s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *")
    }
  }

  test("MERGE commit feeds CDF: tombstoned preimages + fresh images") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val v1 = ManifestStore.currentSnapshot(spark, dir).get.version
    Seq((2L, "B"), (3L, "c")).toDF("k", "v").createOrReplaceTempView("m_cdf_src")
    spark.sql(s"MERGE INTO ${sqlTable(dir)} t USING m_cdf_src s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val v2 = ManifestStore.currentSnapshot(spark, dir).get.version
    val feed = ManifestStore.changes(spark, dir, v1, v2, schema)
      .select("k", "v", "_change_type").as[(Long, String, String)]
      .collect().toSet
    assert(feed === Set((2L, "b", "delete"), (2L, "B", "insert"),
      (3L, "c", "insert")))
  }

  test("ALTER TABLE ADD COLUMNS widens as a metadata-only schema commit") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val filesBefore = ManifestStore.currentSnapshot(spark, dir).get.files
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD COLUMNS (note STRING)")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.op === "schema")
    assert(snap.files === filesBefore, "schema evolution must move no data")
    assert(snap.schema.get.fieldNames.toSeq === Seq("k", "v", "note"))
    // pre-evolution rows null-fill; writes against the widened schema land
    assert(spark.sql(s"SELECT * FROM ${sqlTable(dir)} WHERE note IS NULL")
      .count() === 2L)
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (3, 'c', 'hello')")
    assert(spark.sql(s"SELECT note FROM ${sqlTable(dir)} WHERE k = 3")
      .as[String].head() === "hello")
    // type changes still refuse (stored bytes would reinterpret)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN k TYPE INT")
    }
  }

  test("CALL procedures run the maintenance family from SQL") {
    val dir = tmpDir()
    (1 to 4).foreach(i => ManifestStore.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").repartition(1), dir))
    val v4 = ManifestStore.currentSnapshot(spark, dir).get.version

    // create_tag defaults to the current version; VERSION AS OF resolves it
    assert(spark.sql(s"CALL graft.create_tag('$dir', 'rel')")
      .as[Long].head() === v4)
    spark.sql(s"INSERT OVERWRITE ${sqlTable(dir)} VALUES (99, 'z')")
    assert(rows(spark.sql(
      s"SELECT * FROM ${sqlTable(dir)} VERSION AS OF 'rel'")).size === 4)

    // restore rolls back as a new commit and returns it
    val restored = spark.sql(s"CALL graft.restore('$dir', $v4)").as[Long].head()
    assert(restored > v4)
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")).size === 4)

    // compact squashes the 4 append files into one
    spark.sql(s"CALL graft.compact('$dir', 1)")
    assert(ManifestStore.currentSnapshot(spark, dir).get.files.size === 1)
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")).size === 4)

    // blooms commit a metadata-only version
    spark.sql(s"CALL graft.build_blooms('$dir', 'v')")
    assert(ManifestStore.currentSnapshot(spark, dir).get.blooms.nonEmpty)

    // clone forks zero-copy; named args bind through Spark's own machinery
    val dst = tmpDir() + "/fork"
    spark.sql(s"CALL graft.clone(target => '$dst', table => '$dir')")
    assert(rows(spark.sql(s"SELECT * FROM graft.`$dst`")).size === 4)

    // dry-run counts what a real vacuum would reclaim without touching
    // a byte — same listing, same liveness proof
    val versionsBefore = ManifestStore.history(spark, dir).count()
    val (dm, _) = spark.sql(
      s"CALL graft.vacuum('$dir', keep_versions => 1, retain_hours => 0.0, " +
        "dry_run => true)").as[(Int, Int)].head()
    assert(dm > 0)
    assert(ManifestStore.history(spark, dir).count() === versionsBefore,
      "dry run must not drop manifests")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")).size === 4)

    // the real run reclaims exactly what the dry run predicted
    val (m, _) = spark.sql(
      s"CALL graft.vacuum('$dir', keep_versions => 1, retain_hours => 0.0)")
      .as[(Int, Int)].head()
    assert(m === dm, "vacuum must reclaim what its dry run predicted")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")).size === 4)
    // tagged snapshot survives vacuum (the durable pin)
    assert(rows(spark.sql(
      s"SELECT * FROM ${sqlTable(dir)} VERSION AS OF 'rel'")).size === 4)
    assert(spark.sql(s"CALL graft.drop_tag('$dir', 'rel')").as[Boolean].head())

    // unknown procedure fails loudly (our available-set message rides in
    // the cause of Spark's FAILED_TO_LOAD_ROUTINE)
    val e = intercept[Exception] { spark.sql(s"CALL graft.nope('$dir')") }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(5).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("FAILED_TO_LOAD_ROUTINE") || msgs.contains("vacuum"), msgs)
  }

  test("metadata tables: history / tags / files as plain SQL relations") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v").repartition(1), dir)
    ManifestStore.append(Seq((2L, "b")).toDF("k", "v").repartition(1), dir)
    ManifestStore.deleteWhere(spark, dir, schema, col("k") === 1L)
    ManifestStore.tag(spark, dir, "rel", 2L)

    val hist = spark.sql(
      s"SELECT version, op, n_rows FROM graft.`$dir`.history ORDER BY version")
      .as[(Long, String, Long)].collect().toSeq
    assert(hist.map(_._2) === Seq("append", "append", "delete-dv"))
    assert(hist.last._3 === 1L, "history must count live rows minus tombstones")

    assert(spark.sql(s"SELECT * FROM graft.`$dir`.tags")
      .as[(String, Long)].collect().toSeq === Seq(("rel", 2L)))

    val files = spark.sql(s"SELECT * FROM graft.`$dir`.files")
      .as[(String, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(files.size === 2)
    assert(files.forall(f => f._2.exists(_ > 0) && f._3.contains(1L)))
    assert(files.count(_._4.contains(1L)) === 1, "one file carries the tombstone")
    // a missing table is NoSuchTable, not an empty metadata frame
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`${tmpDir()}/absent`.history").collect()
    }
  }

  test("partitions metadata table summarizes the live layout per value") {
    val dir = tmpDir() + "/ptmeta"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'x'), (2, 'x'), (3, 'y')")
    // modulo keeps the delete on the dv path (an exact-range predicate
    // would drop the single-row file whole and leave nothing to count)
    spark.sql(s"DELETE FROM ${sqlTable(dir)} WHERE k % 2 = 0")
    val parts = spark.sql(s"SELECT partition, rows, dv_deleted FROM " +
      s"graft.`$dir`.partitions ORDER BY partition")
      .as[(String, Long, Long)].collect().toSeq
    assert(parts.map(_._1) === Seq("p=x", "p=y"))
    assert(parts.find(_._1 == "p=x").get._2 === 2L) // physical rows
    assert(parts.find(_._1 == "p=x").get._3 === 1L) // one tombstoned
    assert(parts.find(_._1 == "p=y").get._3 === 0L)
  }

  test("TRUNCATE TABLE empties as one metadata commit; schema+partitioning survive") {
    val dir = tmpDir() + "/trunc"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'x'), (2, 'y')")
    val vData = ManifestStore.currentSnapshot(spark, dir).get.version
    spark.sql(s"TRUNCATE TABLE ${sqlTable(dir)}")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.files.isEmpty)
    assert(snap.schema.get.fieldNames.toSeq === Seq("k", "p"))
    assert(snap.partitionCols === Seq("p"), "declared partitioning survives")
    assert(spark.sql(s"SELECT * FROM ${sqlTable(dir)}").count() === 0L)
    // rows stay time-travelable until vacuum
    assert(spark.sql(s"SELECT * FROM ${sqlTable(dir)} VERSION AS OF $vData")
      .count() === 2L)
    // the table is immediately writable with the surviving layout
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (9, 'z')")
    val after = ManifestStore.currentSnapshot(spark, dir).get
    assert(after.files.forall(f => after.parts.get(f).exists(_.contains("p"))))
  }

  test("atomic CTAS and CREATE OR REPLACE redefine the table in one commit") {
    val dir = tmpDir() + "/cor"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} AS SELECT CAST(1 AS BIGINT) " +
      "AS k, 'a' AS v")
    val v1 = ManifestStore.currentSnapshot(spark, dir).get
    assert(v1.version === 1L && v1.op === "create-as",
      "atomic CTAS must be ONE commit, not create + append")
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)}")) === Set(1L -> "a"))
    // CREATE OR REPLACE redefines the table — schema, partitioning,
    // properties — in one atomic overwrite commit
    spark.sql(s"CREATE OR REPLACE TABLE ${sqlTable(dir)} " +
      "PARTITIONED BY (p) TBLPROPERTIES ('gen' = '2') AS " +
      "SELECT CAST(7 AS BIGINT) AS id, 'x' AS p")
    val v2 = ManifestStore.currentSnapshot(spark, dir).get
    assert(v2.version === v1.version + 1 && v2.op === "overwrite")
    assert(v2.schema.get.fieldNames.toSeq === Seq("id", "p"))
    assert(v2.partitionCols === Seq("p"))
    assert(v2.props === Map("gen" -> "2"))
    assert(v2.files.forall(f => v2.parts.get(f).exists(_.contains("p"))))
    assert(spark.sql(s"SELECT id FROM ${sqlTable(dir)} WHERE p = 'x'")
      .as[Long].collect().toSeq === Seq(7L))
    // prior generation stays time-travelable under ITS schema
    assert(rows(spark.sql(s"SELECT * FROM ${sqlTable(dir)} VERSION AS OF 1")) ===
      Set(1L -> "a"))
    // REPLACE TABLE demands existence
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE graft.`${tmpDir()}/absent-r` AS SELECT 1 AS x")
    }
    // plain CTAS on an existing table still refuses
    intercept[Exception] {
      spark.sql(s"CREATE TABLE ${sqlTable(dir)} AS SELECT 1 AS x")
    }
  }

  test("restore preserves declared partitioning and the property bag") {
    val dir = tmpDir() + "/restp"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('team' = 'data')")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'x')")
    val vGood = ManifestStore.currentSnapshot(spark, dir).get.version
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (2, 'y')")
    spark.sql(s"CALL graft.restore('$dir', $vGood)")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.partitionCols === Seq("p"),
      "a data rollback must not wipe the declared partition columns")
    assert(snap.props === Map("team" -> "data"),
      "a data rollback must not wipe the property bag")
    // and the restored table still routes writes through the layout
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (3, 'z')")
    val after = ManifestStore.currentSnapshot(spark, dir).get
    assert(after.files.forall(f => after.parts.get(f).exists(_.contains("p"))))
  }

  test("TBLPROPERTIES: create-time bag, SET/UNSET, carry, stream-neutral") {
    val dir = tmpDir() + "/props"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('team' = 'data', 'pii' = 'false')")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'a')")
    // the bag survives data commits
    assert(ManifestStore.currentSnapshot(spark, dir).get.props ===
      Map("team" -> "data", "pii" -> "false"))
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} SET TBLPROPERTIES " +
      "('pii' = 'true', 'retention' = '30d')")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} UNSET TBLPROPERTIES ('team')")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.op === "properties")
    assert(snap.props === Map("pii" -> "true", "retention" -> "30d"))
    // DESCRIBE surfaces user props alongside (never instead of) the facts
    val props = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty, dir)).properties()
    assert(props.get("retention") === "30d")
    assert(props.get("numRows") === "1", "facts stay engine-truthful")
    // SHOW TBLPROPERTIES renders the bag
    val shown = spark.sql(s"SHOW TBLPROPERTIES ${sqlTable(dir)}")
      .as[(String, String)].collect().toMap
    assert(shown.get("retention").contains("30d") &&
      shown.get("pii").contains("true"), shown.toString)
    // engine-maintained keys refuse on SET
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} SET TBLPROPERTIES ('numRows' = '0')")
    }
    // the properties commit is data-neutral: a ROW-mode stream passes it
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("props_row")
      .option("checkpointLocation", Files.createTempDirectory("cp").toString)
      .start()
    try {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} SET TBLPROPERTIES ('a' = 'b')")
      spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (2, 'b')")
      q.processAllAvailable()
      assert(spark.table("props_row").count() === 1L)
    } finally q.stop()
    // clone carries the bag
    val dst = tmpDir() + "/props-clone"
    ManifestStore.cloneShallow(spark, dir, dst)
    assert(ManifestStore.currentSnapshot(spark, dst).get.props
      .get("retention").contains("30d"))
  }

  test("DESCRIBE EXTENDED surfaces snapshot facts as table properties") {
    val dir = tmpDir()
    ManifestStore.append((0L until 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2), dir)
    val props = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty, dir)).properties()
    assert(props.get("version") === "1")
    assert(props.get("numFiles") === "2")
    assert(props.get("numRows") === "10")
    assert(props.get("sizeBytes").toLong > 0L)
    // and the SQL surface renders them
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED ${sqlTable(dir)}")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("numFiles") && desc.contains("graft-manifest"), desc)
  }

  test("CREATE/CTAS refuse smuggled graft.* TBLPROPERTIES (ALTER's wall)") {
    // a 'graft.check.x' through TBLPROPERTIES would surface as a
    // never-validated constraint enforced on every write; a bogus
    // 'graft.cluster' would break later compaction — same refusal ALTER
    // SET TBLPROPERTIES enforces
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmpDir()}/p1` (k BIGINT) " +
        "TBLPROPERTIES ('graft.check.x' = 'k < 0')")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`${tmpDir()}/p2` " +
        "TBLPROPERTIES ('graft.cluster' = 'nope') AS SELECT 1L AS k")
    }
    // ordinary user properties still land
    val dir = tmpDir() + "/p3"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT) " +
      "TBLPROPERTIES ('team' = 'data-eng')")
    assert(ManifestStore.currentSnapshot(spark, dir).get.props("team")
      === "data-eng")
  }

  test("partial partition overwrite evaluates its source exactly once") {
    val dir = tmpDir() + "/ptonce"
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'y'), (2, 'z')")
    // a NONDETERMINISTIC source evaluated twice (probe + write) could
    // pass the row-leak probe yet write different rows — the guard must
    // judge exactly the rows that land, i.e. ONE evaluation
    GraftCatalogSpec.evalCount.set(0L)
    val tagged = udf { k: Long =>
      GraftCatalogSpec.evalCount.incrementAndGet(); "y"
    }.asNondeterministic()
    val src = spark.range(10).select(col("id").as("k"),
      tagged(col("id")).as("p"))
    ManifestStore.overwritePartitions(src, dir, Seq("p"), Map("p" -> "y"))
    assert(GraftCatalogSpec.evalCount.get() === 10L,
      s"source evaluated ${GraftCatalogSpec.evalCount.get()} times — " +
        "the leak guard must run inside the single write")
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)} WHERE p = 'y'")
      .as[Long].head() === 10L)
    // the in-write guard still refuses out-of-partition rows, atomically
    val vBefore = ManifestStore.currentSnapshot(spark, dir).get.version
    val e = intercept[Exception] {
      ManifestStore.overwritePartitions(
        spark.sql("SELECT CAST(9 AS BIGINT) AS k, 'OTHER' AS p"),
        dir, Seq("p"), Map("p" -> "y"))
    }
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: all(t.getCause)
    assert(all(e).exists(_.contains("GRAFT_PARTITION_LEAK")), e.toString)
    assert(ManifestStore.currentSnapshot(spark, dir).get.version === vBefore,
      "a refused overwrite must not commit")
  }

  test("DROP TABLE / table RENAME / narrowing ALTER refuse loudly on path tables") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v"), dir)
    intercept[Exception] { spark.sql(s"DROP TABLE ${sqlTable(dir)}") }
    // TYPE changes refuse (column RENAME/DROP are supported via mapping)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN k TYPE INT")
    }
    // and a missing table is NoSuchTable, not an empty frame
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`${tmpDir()}/absent`").collect()
    }
  }
}

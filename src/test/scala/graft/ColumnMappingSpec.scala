package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.{ColumnMapping, ManifestStore}

/** Column mapping (Delta `columnMapping.mode = name` re-derived for the
  * manifest format — [[graft.sources.ColumnMapping]]): `ALTER TABLE …
  * RENAME COLUMN` and `DROP COLUMN` must be METADATA-ONLY commits that
  * leave every data file, footer stat, bloom and partition path untouched
  * — and every read/write/DML/pruning/CDF path must speak the user's
  * logical names while the files keep their immutable physical ones.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-map").toString

  private def sqlTable(dir: String): String = s"graft.`$dir`"

  private def snap(dir: String) =
    ManifestStore.currentSnapshot(spark, dir).get

  test("RENAME COLUMN is metadata-only; reads, inserts and time travel line up") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val before = snap(dir)
    val preVersion = before.version

    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN v TO label")
    val after = snap(dir)
    assert(after.op === "schema")
    assert(after.files === before.files, "rename must move no data")
    assert(after.schema.get.fieldNames.toSeq === Seq("k", "label"))
    // the physical identity is pinned in field metadata
    assert(ColumnMapping.physFor(after.schema.get, "label") === "v")

    // reads speak the new name over the OLD files
    assert(spark.sql(s"SELECT k, label FROM ${sqlTable(dir)} ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    // user-facing schema carries no mapping internals
    assert(!spark.table(sqlTable(dir)).schema.fields
      .exists(_.metadata.contains(ColumnMapping.PhysicalKey)))

    // INSERT after the rename writes the PHYSICAL name into new files, so
    // old and new files stay one coherent column
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (3, 'c')")
    assert(spark.sql(s"SELECT label FROM ${sqlTable(dir)} WHERE k = 3")
      .as[String].head() === "c")
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)} WHERE label >= 'a'")
      .as[Long].head() === 3L)
    val newFile = snap(dir).files.filterNot(after.files.contains).head
    assert(snap(dir).stats(newFile).contains("v"),
      "fresh files must record stats under the physical name")

    // time travel: the pre-rename version still answers to its era's name
    val old = spark.sql(
      s"SELECT * FROM ${sqlTable(dir)} VERSION AS OF $preVersion")
    assert(old.columns.toSeq === Seq("k", "v"))
    assert(old.as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))

    // DataFrame API sees the same logical shape
    assert(ManifestStore.readLatest(spark, dir).columns.toSeq
      === Seq("k", "label"))
  }

  test("renamed column keeps stats/bloom pruning and DataFrame range scans") {
    val dir = tmpDir()
    // two well-separated key clusters → two files with disjoint k bounds
    ManifestStore.append((1L to 50L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1), dir)
    ManifestStore.append((1000L to 1050L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN k TO id")

    // catalog scan prunes on the RENAMED column (filter on logical name
    // reaches the physical stats through the scan's own physical attrs)
    val pruned = spark.sql(
      s"SELECT * FROM ${sqlTable(dir)} WHERE id >= 1000")
    assert(pruned.count() === 51L)

    // DataFrame pruning APIs accept the logical name
    val s = snap(dir)
    assert(ManifestStore.pruneFiles(s, "id", 1000L, 2000L).size === 1)
    val scanned = ManifestStore.rangeScan(spark, dir, s.schema.get,
      "id", 1000L, 2000L)
    assert(scanned.count() === 51L)
    assert(scanned.columns.contains("id"))

    // blooms build under the logical name, key physically, and probe back
    ManifestStore.buildBlooms(spark, dir, Seq("id"))
    val s2 = snap(dir)
    assert(s2.blooms.values.forall(_.contains("k")),
      "bloom keys must be physical")
    assert(ManifestStore.pruneFilesIn(s2, "id", Seq(1010L)).size === 1)

    // deleteRange plans on the logical name (whole-file drop still proves)
    assert(ManifestStore.deleteRange(spark, dir, s2.schema.get,
      "id", 1000L, 2000L).isDefined)
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)}")
      .as[Long].head() === 50L)
  }

  test("DROP COLUMN is metadata-only; a re-added name never resurrects data") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "v", "score"), dir)
    val before = snap(dir)

    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN score")
    val after = snap(dir)
    assert(after.files === before.files, "drop must move no data")
    assert(after.schema.get.fieldNames.toSeq === Seq("k", "v"))
    assert(ColumnMapping.retired(after.props) === Set("score"))
    assert(spark.table(sqlTable(dir)).columns.toSeq === Seq("k", "v"))

    // time travel still sees the dropped column's data
    assert(spark.sql(
      s"SELECT score FROM ${sqlTable(dir)} VERSION AS OF ${before.version}")
      .as[Double].collect().sorted.toSeq === Seq(10.0, 20.0))

    // re-ADD the same name: fresh physical identity, old bytes stay dead
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD COLUMNS (score DOUBLE)")
    val readded = snap(dir).schema.get
    assert(ColumnMapping.physFor(readded, "score") === "score_2")
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)} " +
      "WHERE score IS NULL").as[Long].head() === 2L,
      "re-added column must read NULL, not the dropped column's data")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (3, 'c', 33.0)")
    assert(spark.sql(s"SELECT sum(score) FROM ${sqlTable(dir)}")
      .as[Double].head() === 33.0)
  }

  test("DML (UPDATE / DELETE / MERGE) works over renamed columns") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "v", "w"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN v TO name")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN k TO id")

    spark.sql(s"UPDATE ${sqlTable(dir)} SET name = 'B' WHERE id = 2")
    spark.sql(s"DELETE FROM ${sqlTable(dir)} WHERE id = 3")
    assert(spark.sql(s"SELECT id, name FROM ${sqlTable(dir)} ORDER BY id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "B")))

    Seq((2L, "bb", 2.5), (4L, "d", 4.0)).toDF("id", "name", "w")
      .createOrReplaceTempView("map_src")
    spark.sql(
      s"""MERGE INTO ${sqlTable(dir)} t USING map_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql(s"SELECT id, name FROM ${sqlTable(dir)} ORDER BY id")
      .as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "bb"), (4L, "d")))

    // CDF over the mapped table reports logical columns
    val v = snap(dir).version
    val feed = ManifestStore.changes(spark, dir, v - 1, v,
      snap(dir).schema.get)
    assert(feed.columns.take(3).toSeq === Seq("id", "name", "w"))
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet === Set(2L, 4L))
  }

  test("renamed PARTITION column: layout, pruning and partial overwrite hold") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, region STRING) " +
      "USING graft PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (1, 'eu'), (2, 'us')")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN region TO zone")

    // declared partitioning reports the LOGICAL name
    val table = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty, dir))
    assert(table.partitioning().map(_.references()(0).fieldNames()(0)).toSeq
      === Seq("zone"))

    // INSERT after rename routes through the SAME physical layout
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (3, 'eu')")
    val s = snap(dir)
    assert(s.parts.values.forall(_.keySet === Set("region")),
      "partition values must stay keyed by the physical name")

    // pruning by the renamed column touches only matching partitions
    assert(ManifestStore.pruneFiles(s, "zone", "eu", "eu").size
      < s.files.size)
    assert(spark.sql(s"SELECT k FROM ${sqlTable(dir)} WHERE zone = 'eu'")
      .as[Long].collect().toSet === Set(1L, 3L))

    // partial partition overwrite under the new name
    spark.sql(s"INSERT OVERWRITE ${sqlTable(dir)} " +
      "PARTITION (zone = 'eu') VALUES (7)")
    assert(spark.sql(s"SELECT k, zone FROM ${sqlTable(dir)} ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((2L, "us"), (7L, "eu")))

    // .partitions metadata table renders the logical name
    val parts = spark.sql(s"SELECT partition FROM ${sqlTable(dir)}.partitions")
      .as[String].collect().toSet
    assert(parts === Set("zone=eu", "zone=us"), parts.toString)
  }

  test("rename-back normalizes to the trivial mapping; refusals stay loud") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN v TO w")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN w TO v")
    assert(ColumnMapping.trivial(snap(dir).schema.get),
      "v→w→v must drop the now-redundant mapping metadata")

    // refusals: rename onto an existing name; drop the only remaining
    // column; drop a declared partition column; reserved property
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN v TO k")
    }
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN v")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN k")
    }
    val pdir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(pdir)} (k BIGINT, p STRING) " +
      "USING graft PARTITIONED BY (p)")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(pdir)} DROP COLUMN p")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} " +
        s"SET TBLPROPERTIES ('${ColumnMapping.RetiredProp}' = 'x')")
    }
  }

  test("compaction, upserts and CTAS stay coherent on a mapped table") {
    val dir = tmpDir()
    (1 to 3).foreach(i => ManifestStore.append(
      Seq((i.toLong, s"v$i")).toDF("k", "v").repartition(1), dir))
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN v TO label")

    // keyed dv upsert through the DataFrame API, logical names
    val schema = snap(dir).schema.get
    assert(ManifestStore.upsertKeyedDv(spark, dir, schema,
      Seq((2L, "V2"), (9L, "v9")).toDF("k", "label"), "k").isDefined)
    assert(ManifestStore.readLatest(spark, dir)
      .as[(Long, String)].collect().toSet
      === Set((1L, "v1"), (2L, "V2"), (3L, "v3"), (9L, "v9")))

    // compaction materializes through the mapping (reads logical, writes
    // physical) and the compacted table still answers to logical names
    assert(ManifestStore.compactSmall(spark, dir, schema,
      minFileBytes = Long.MaxValue, targetFileBytes = Long.MaxValue).isDefined)
    assert(spark.sql(s"SELECT label FROM ${sqlTable(dir)} WHERE k = 9")
      .as[String].head() === "v9")
    val cs = snap(dir)
    val cFile = cs.files.head
    assert(cs.stats(cFile).contains("v"),
      "compacted files keep writing the physical column name")

    // CTAS from the mapped table: the NEW table starts with a TRIVIAL
    // mapping (logical names are its physical ones)
    val dst = tmpDir() + "/ctas"
    spark.sql(s"CREATE TABLE ${sqlTable(dst)} USING graft AS " +
      s"SELECT k, label FROM ${sqlTable(dir)}")
    val ds = snap(dst)
    assert(ColumnMapping.trivial(ds.schema.get))
    assert(ds.files.forall(f => ds.stats(f).contains("label")),
      "CTAS files must carry the new table's own (logical) names")
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dst)} WHERE label IS NOT NULL")
      .as[Long].head() === 4L)
  }

  test("streaming source follows a mapped table; schema evolution composes") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN v TO txt")
    // widening append with a NEW column against the mapped table: the new
    // column's physical name is itself (no collision), carried fields
    // keep their mapping
    ManifestStore.append(Seq((2L, "b", 5L)).toDF("k", "txt", "n"), dir)
    val s = snap(dir)
    assert(s.schema.get.fieldNames.toSeq === Seq("k", "txt", "n"))
    assert(ColumnMapping.physFor(s.schema.get, "txt") === "v")
    assert(ColumnMapping.physFor(s.schema.get, "n") === "n")
    assert(ManifestStore.readLatest(spark, dir)
      .select("k", "txt", "n").as[(Long, String, Option[Long])]
      .collect().toSet === Set((1L, "a", None), (2L, "b", Some(5L))))

    // adding a column whose name collides with a RETIRED physical gets a
    // fresh identity even on the WRITE path (no ALTER involved)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN n")
    ManifestStore.append(Seq((3L, "c", "fresh")).toDF("k", "txt", "n"), dir)
    val s2 = snap(dir)
    assert(ColumnMapping.physFor(s2.schema.get, "n") === "n_2")
    assert(spark.sql(s"SELECT n FROM ${sqlTable(dir)} WHERE k = 3")
      .as[String].head() === "fresh")
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)} WHERE n IS NULL")
      .as[Long].head() === 2L)
  }

  test("catalog scan PRUNES FILES on a renamed column (plan-level proof)") {
    val dir = tmpDir()
    ManifestStore.append((1L to 50L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1), dir)
    ManifestStore.append((1000L to 1050L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN k TO id")
    // the filter names the LOGICAL column; it must push through the
    // logical->physical alias into the ManifestFileIndex and prune to ONE
    // file (physical stat keys match the physical scan attributes)
    val df = spark.sql(s"SELECT id FROM ${sqlTable(dir)} WHERE id >= 1000")
    df.collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val scans = nodes(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec
          if s.relation.location.getClass.getSimpleName == "ManifestFileIndex" =>
        s.metrics("numFiles").value
    }
    assert(scans.nonEmpty, "expected the native manifest scan")
    assert(scans.sum === 1L,
      s"renamed-column filter did not prune (scanned ${scans.sum} files)")
  }

  test("restore crosses mapping eras exactly; stream reads logical columns") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val v1 = snap(dir).version
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN v TO w")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN w")
    assert(snap(dir).schema.get.fieldNames.toSeq === Seq("k"))
    assert(ColumnMapping.retired(snap(dir).props) === Set("v"))

    // restore to the pre-rename era: the old schema (and its trivial
    // mapping) come back; the PROPERTY BAG stays current by restore's
    // documented carry-forward rule, so "v" stays burned in the retired
    // set even though the restored field v is live again — conservative
    // and safe (a live field is addressed by the schema, never by
    // freshPhysical; burned names are simply never handed out again)
    ManifestStore.restore(spark, dir, v1)
    val rs = snap(dir)
    assert(rs.schema.get.fieldNames.toSeq === Seq("k", "v"))
    assert(ColumnMapping.trivial(rs.schema.get))
    assert(ColumnMapping.retired(rs.props) === Set("v"),
      "restore carries the CURRENT property bag (burned names stay burned)")
    assert(ManifestStore.readLatest(spark, dir).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b")))
    // the restored live column keeps working for writes…
    ManifestStore.append(Seq((3L, "c")).toDF("k", "v"), dir)
    assert(spark.sql(s"SELECT v FROM ${sqlTable(dir)} WHERE k = 3")
      .as[String].head() === "c")
    // …and a FUTURE evolution never hands the burned name out as a fresh
    // physical identity (drop again, add again → v_2)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN v")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD COLUMNS (v STRING)")
    assert(ColumnMapping.physFor(snap(dir).schema.get, "v") === "v_2")

    // streaming source over a mapped table delivers LOGICAL columns
    val dir2 = tmpDir()
    ManifestStore.append(Seq((1L, "x")).toDF("k", "v"), dir2)
    spark.sql(s"ALTER TABLE ${sqlTable(dir2)} RENAME COLUMN v TO label")
    ManifestStore.append(Seq((2L, "y")).toDF("k", "label"), dir2)
    val out = tmpDir()
    val q = spark.readStream.format("graft-manifest")
      .option("startingVersion", "0").load(dir2)
      .writeStream.format("memory").queryName("map_stream")
      .option("checkpointLocation", out + "/cp").start()
    try {
      q.processAllAvailable()
      val got = spark.table("map_stream")
      assert(got.columns.toSeq.take(2) === Seq("k", "label"))
      assert(got.select("k", "label").as[(Long, String)].collect().toSet
        === Set((1L, "x"), (2L, "y")))
    } finally q.stop()
  }
}

package graft

import java.nio.file.Files

import graft.sources.{ColumnMapping, ManifestStore}

/** Declarative clustering (`CLUSTER BY` — the liquid-clustering UX):
  * CREATE/ALTER declare the Z-order dimensions once, as the
  * engine-managed `graft.cluster` property (immutable PHYSICAL names, so
  * renames can't orphan it), and every un-parameterized maintenance pass
  * — `CALL graft.compact_small(t)`, the streaming sink's autoCompact —
  * Z-orders by them with no per-call argument. Existing files are never
  * rewritten by the DECLARATION itself (a property-only commit); the
  * next compaction materializes the clustering.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-clus").toString

  private def sqlTable(dir: String): String = s"graft.`$dir`"

  private def snap(dir: String) =
    ManifestStore.currentSnapshot(spark, dir).get

  test("CREATE … CLUSTER BY: maintenance self-clusters, pruning tightens") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, v STRING) " +
      "USING graft CLUSTER BY (k)")
    assert(snap(dir).props("graft.cluster") === "k")

    // DESCRIBE-level surface: the transform round-trips
    val table = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty, dir))
    assert(table.partitioning().map(_.name()).toSeq === Seq("cluster_by"))

    // four single-file appends, each covering the WHOLE key space —
    // every file's k-bounds admit every probe, the un-clustered worst
    // case (REPARTITION(1) keeps range()'s per-partition split from
    // accidentally pre-clustering the inserts)
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO ${sqlTable(dir)} " +
        s"SELECT /*+ REPARTITION(1) */ id * 4 + $i, " +
        s"concat('v', id) FROM range(0, 100)")
    }
    val before = snap(dir)
    assert(ManifestStore.pruneFiles(before, "k", 0L, 39L).size
      === before.files.size, "pre-compaction: every file admits the range")

    // declared clustering kicks in with NO per-call Z-order argument
    assert(spark.sql(s"CALL graft.compact_small('$dir', 32, 0)")
      .as[Long].head() > 0L)
    val after = snap(dir)
    assert(after.files.size > 1, "target size 0 → multiple outputs")
    assert(ManifestStore.pruneFiles(after, "k", 0L, 39L).size
      < after.files.size,
      "compacted outputs must carry tight k-bounds (clustered)")
    // contents unchanged
    assert(spark.sql(s"SELECT count(*), sum(k) FROM ${sqlTable(dir)}")
      .as[(Long, Long)].head() === ((400L, (0L until 400L).sum)))
  }

  test("ALTER CLUSTER BY re-points; NONE drops; unknown column refuses") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (a BIGINT, b BIGINT) " +
      "USING graft CLUSTER BY (a)")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} CLUSTER BY (b)")
    assert(snap(dir).props("graft.cluster") === "b")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} CLUSTER BY NONE")
    assert(!snap(dir).props.contains("graft.cluster"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} CLUSTER BY (nope)")
    }
    intercept[Exception] { // direct property writes stay refused
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} " +
        "SET TBLPROPERTIES ('graft.cluster' = 'a')")
    }
  }

  test("clustering follows a RENAMED column (physical identity held)") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, v STRING) " +
      "USING graft CLUSTER BY (k)")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO ${sqlTable(dir)} SELECT id * 3 + $i, 'x' " +
        "FROM range(0, 60)")
    }
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN k TO id")
    // the property still names the immutable physical column; the
    // maintenance pass translates back to the logical frame and clusters
    assert(snap(dir).props("graft.cluster") === "k")
    assert(ManifestStore.compactSmall(spark, dir, snap(dir).schema.get,
      minFileBytes = Long.MaxValue, targetFileBytes = 1L).isDefined)
    val s = snap(dir)
    assert(s.files.size > 1)
    assert(ManifestStore.pruneFiles(s, "id", 0L, 29L).size < s.files.size,
      "clustering must survive the rename")
    // CTAS with CLUSTER BY carries the declaration too
    val dst = tmpDir() + "/ctas"
    spark.sql(s"CREATE TABLE ${sqlTable(dst)} USING graft CLUSTER BY (id) " +
      s"AS SELECT id, v FROM ${sqlTable(dir)}")
    assert(snap(dst).props("graft.cluster") === "id")
  }

  test("DROP COLUMN removes the column from the declared CLUSTER BY set") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} (k BIGINT, v BIGINT, w STRING) " +
      "USING graft CLUSTER BY (k, v)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} SELECT id, id * 2, 'x' " +
      "FROM range(0, 50)")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN v")
    // the SAME commit that retires v's physical name drops it from
    // graft.cluster — a dead physical name left there would wedge every
    // later compact_small / autoCompact on an unresolvable column
    assert(snap(dir).props("graft.cluster") === "k")
    assert(ManifestStore.compactSmall(spark, dir, snap(dir).schema.get,
      minFileBytes = Long.MaxValue, targetFileBytes = 1L).isDefined,
      "maintenance must keep working after the drop")
    // dropping the LAST cluster column clears the property entirely
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP COLUMN k")
    assert(!snap(dir).props.contains("graft.cluster"))
    assert(ManifestStore.compactSmall(spark, dir, snap(dir).schema.get,
      minFileBytes = Long.MaxValue, targetFileBytes = 1L).isDefined)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestStore

/** SQL CHECK constraints (Spark 4's DSv2 constraint surface,
  * `TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT`): `ALTER TABLE …
  * ADD CONSTRAINT name CHECK (expr)` validates EXISTING rows, records the
  * predicate as an engine-managed `graft.check.<name>` property, and from
  * then on EVERY row-bearing write path (INSERT, DataFrame append,
  * UPDATE, MERGE, streaming) refuses violating rows with a named error —
  * Delta's CHECK-constraint discipline on the manifest format.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-check").toString

  private def sqlTable(dir: String): String = s"graft.`$dir`"

  /** Accepts BOTH violation markers: Spark's own DSv2 enforcement fires
    * first on SQL writes (the table reports enforced constraints —
    * `[CHECK_CONSTRAINT_VIOLATION]`, SQLSTATE 23001); the store's
    * choke-point gate (`GRAFT_CHECK_VIOLATION`) backstops DataFrame-API
    * appends and the DML engines' image writes, which never pass through
    * Spark's write analysis.
    */
  private def violates[T](body: => T): Unit = {
    val e = intercept[Exception](body)
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: all(t.getCause)
    assert(all(e).exists(s => s.contains("GRAFT_CHECK_VIOLATION") ||
      s.contains("CHECK_CONSTRAINT_VIOLATION")),
      s"expected a CHECK violation, got: $e")
  }

  test("ADD CONSTRAINT validates existing rows and gates every write path") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert(ManifestStore.currentSnapshot(spark, dir).get
      .props("graft.check.v_pos") === "v > 0")

    // INSERT: valid lands, violating refuses and commits NOTHING
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (3, 30)")
    val vBefore = ManifestStore.currentSnapshot(spark, dir).get.version
    violates(spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (4, -4)"))
    assert(ManifestStore.currentSnapshot(spark, dir).get.version === vBefore,
      "a refused INSERT must not commit")
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)}")
      .as[Long].head() === 3L)

    // DataFrame append enforces too (same choke point)
    violates(ManifestStore.append(Seq((5L, 0L)).toDF("k", "v"), dir))
    // NULL passes, per ANSI CHECK
    ManifestStore.append(Seq((6L, Option.empty[Long])).toDF("k", "v"), dir)

    // UPDATE: a SET that would break the constraint refuses
    violates(spark.sql(s"UPDATE ${sqlTable(dir)} SET v = -1 WHERE k = 1"))
    spark.sql(s"UPDATE ${sqlTable(dir)} SET v = 11 WHERE k = 1")
    assert(spark.sql(s"SELECT v FROM ${sqlTable(dir)} WHERE k = 1")
      .as[Long].head() === 11L)

    // MERGE: violating update/insert images refuse (canonical AND
    // general clause paths share the enforcement)
    Seq((2L, -2L), (9L, 90L)).toDF("k", "v").createOrReplaceTempView("c_src")
    violates(spark.sql(
      s"""MERGE INTO ${sqlTable(dir)} t USING c_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *"""))
    violates(spark.sql(
      s"""MERGE INTO ${sqlTable(dir)} t USING c_src s ON t.k = s.k
         WHEN MATCHED AND s.v < 0 THEN UPDATE SET v = s.v"""))

    // DESCRIBE-level surface: Table.constraints() reports it
    val table = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty, dir))
    val cons = table.constraints()
    assert(cons.map(_.name()).toSeq === Seq("v_pos"))

    // DROP CONSTRAINT lifts the gate
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP CONSTRAINT v_pos")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (7, -7)")
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)} WHERE v < 0")
      .as[Long].head() === 1L)
    intercept[Exception] { // dropping twice without IF EXISTS is loud
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP CONSTRAINT v_pos")
    }
  }

  test("ADD CONSTRAINT refuses when existing rows violate; namespace is guarded") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, -5L)).toDF("k", "v"), dir)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT p CHECK (v > 0)")
    }
    assert(!ManifestStore.currentSnapshot(spark, dir).get.props
      .contains("graft.check.p"), "a failed ADD must record nothing")
    // the engine-managed namespace refuses direct property writes
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} " +
        "SET TBLPROPERTIES ('graft.check.p' = 'v > 0')")
    }
    // multi-column predicates work; constraints compose
    ManifestStore.deleteAll(spark, dir)
    ManifestStore.append(Seq((1L, 5L)).toDF("k", "v"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT both CHECK (v > k)")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT cap CHECK (v < 100)")
    violates(spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (9, 5)"))
    violates(spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (9, 200)"))
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (9, 50)")
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)}")
      .as[Long].head() === 2L)
  }

  test("constraints survive TYPE widening of the constrained column") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} AS SELECT " +
      "CAST(1 AS BIGINT) AS k, CAST(10 AS INT) AS v")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT pos CHECK (v > 0)")
    // widening the constrained column is fine (the predicate resolves
    // against the widened type) and the gate still holds for long-era
    // values on both sides of the bound
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN v TYPE BIGINT")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (2, ${Int.MaxValue.toLong + 1})")
    violates(spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (3, ${Long.MinValue})"))
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)}")
      .as[Long].head() === 2L)
  }

  test("constraints survive rename eras and gate the streaming sink") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, 10L)).toDF("k", "v"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT pos CHECK (v > 0)")
    // rename the CONSTRAINED column: the predicate references the OLD
    // logical name and would silently stop resolving — the engine must
    // refuse the rename instead (Delta refuses too)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN v TO w")
    }
    // renaming an UNRELATED column is fine and the gate still holds
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN k TO id")
    violates(ManifestStore.append(Seq((2L, -1L)).toDF("id", "v"), dir))

    // streaming sink rides the same choke point
    val src = tmpDir()
    ManifestStore.append(Seq((5L, -50L)).toDF("id", "v"), src)
    val q = spark.readStream.format("graft-manifest")
      .option("startingVersion", "0").load(src)
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", tmpDir() + "/cp")
      .option("path", dir).start()
    val err = intercept[Exception] { q.processAllAvailable() }
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: all(t.getCause)
    assert((all(err) ++ Option(err.getMessage)).mkString
      .contains("GRAFT_CHECK_VIOLATION"))
    q.stop()
  }

  test("subset-schema appends evaluate checks against the reader's fill") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, 10L)).toDF("k", "v"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT v_pos CHECK (v > 0)")
    // a batch OMITTING the constrained column is legal (mergeSchemas
    // null-fills) and must not fail resolution: readers see NULL for v,
    // NULL passes per ANSI CHECK
    ManifestStore.append(Seq(Tuple1(2L)).toDF("k"), dir)
    assert(spark.sql(s"SELECT count(*) FROM ${sqlTable(dir)} WHERE v IS NULL")
      .as[Long].head() === 1L)

    // with an EXISTS_DEFAULT, the omitted column reads the ADD-time
    // constant — the check must judge THAT value, not NULL: a default
    // satisfying the constraint admits the batch…
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD COLUMNS (tier BIGINT DEFAULT 5)")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT tier_pos " +
      "CHECK (tier > 0)")
    ManifestStore.append(Seq((3L, 30L)).toDF("k", "v"), dir)
    // …and a constraint the fill CANNOT satisfy refuses the subset batch
    // (rows would be written whose read-back image violates the check)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP CONSTRAINT tier_pos")
    spark.sql(s"DELETE FROM ${sqlTable(dir)} WHERE tier IS NULL OR tier >= 5")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (4, 40, 1)")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT tier_small " +
      "CHECK (tier < 3)")
    violates(ManifestStore.append(Seq((5L, 50L)).toDF("k", "v"), dir))
    // mixed-reference check (present + omitted column) uses the fill for
    // the omitted side: 5 (tier fill) > v=100 → false → refused
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} DROP CONSTRAINT tier_small")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD CONSTRAINT v_gt_tier " +
      "CHECK (v > tier)")
    ManifestStore.append(Seq((6L, 60L)).toDF("k", "v"), dir) // 60 > 5 fill
    violates(ManifestStore.append(Seq((7L, 2L)).toDF("k", "v"), dir)) // 2 < 5
  }
}

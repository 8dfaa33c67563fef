package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.util.{ResolveDefaultColumns => RDC}

import graft.sources.ManifestStore

/** Column DEFAULT values (DSv2 `SUPPORT_COLUMN_DEFAULT_VALUE`): `CREATE
  * TABLE (… DEFAULT expr)` and `ALTER TABLE ADD COLUMNS (… DEFAULT expr)`
  * record Spark's CURRENT_DEFAULT / EXISTS_DEFAULT metadata in the
  * manifest schema. INSERT-side injection (partial column lists, the
  * DEFAULT keyword) is Spark's own analysis against the reported schema;
  * read-side existence-fill — rows written BEFORE the column existed read
  * the ADD-time default instead of null — is the parquet reader consuming
  * EXISTS_DEFAULT from the scan schema, which the store must preserve
  * through the column-mapping seams.
  */
class DefaultValueSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-def").toString

  private def sqlTable(dir: String): String = s"graft.`$dir`"

  test("CREATE with DEFAULT: partial INSERT and the DEFAULT keyword inject") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} " +
      "(k BIGINT, v BIGINT DEFAULT 7, s STRING DEFAULT 'x') USING graft")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} (k) VALUES (1)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (3, 30, 'y')")
    assert(spark.sql(s"SELECT k, v, s FROM ${sqlTable(dir)} ORDER BY k")
      .as[(Long, Long, String)].collect().toSeq
      === Seq((1L, 7L, "x"), (2L, 7L, "x"), (3L, 30L, "y")))
  }

  test("ADD COLUMNS with DEFAULT: pre-evolution rows read the default, not null") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val filesBefore = ManifestStore.currentSnapshot(spark, dir).get.files
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD COLUMNS (n BIGINT DEFAULT 9)")
    val snap = ManifestStore.currentSnapshot(spark, dir).get
    assert(snap.files === filesBefore, "defaults are metadata-only")
    val f = snap.schema.get("n")
    assert(f.metadata.getString(RDC.CURRENT_DEFAULT_COLUMN_METADATA_KEY) === "9")
    assert(f.metadata.getString(RDC.EXISTS_DEFAULT_COLUMN_METADATA_KEY) === "9")

    // the EXISTS fill: pre-evolution files have no column 'n' — they must
    // read 9 (the ADD-time constant), not null
    assert(spark.sql(s"SELECT k, n FROM ${sqlTable(dir)} ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 9L), (2L, 9L)))
    // and the DataFrame path reads the same
    assert(ManifestStore.readLatest(spark, dir).select("k", "n")
      .as[(Long, Long)].collect().toSet === Set((1L, 9L), (2L, 9L)))

    // future INSERTs inject the current default on omission
    spark.sql(s"INSERT INTO ${sqlTable(dir)} (k, v) VALUES (3, 'c')")
    assert(spark.sql(s"SELECT n FROM ${sqlTable(dir)} WHERE k = 3")
      .as[Long].head() === 9L)
  }

  test("SET DEFAULT changes future INSERTs only; history keeps the ADD-time fill") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD COLUMNS (n BIGINT DEFAULT 5)")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN n SET DEFAULT 6")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} (k, v) VALUES (2, 'b')")
    // row 1 predates the column → ADD-time EXISTS fill (5); row 2 omitted
    // the column after SET DEFAULT 6 → 6. A changed default never
    // rewrites history.
    assert(spark.sql(s"SELECT k, n FROM ${sqlTable(dir)} ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 5L), (2L, 6L)))
    // DROP DEFAULT: omission goes back to null
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN n DROP DEFAULT")
    spark.sql(s"INSERT INTO ${sqlTable(dir)} (k, v) VALUES (3, 'c')")
    assert(spark.sql(s"SELECT n FROM ${sqlTable(dir)} WHERE k = 3")
      .as[Option[Long]].head().isEmpty)
  }

  test("defaults compose with column mapping (rename keeps the fill)") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a")).toDF("k", "v"), dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ADD COLUMNS (n BIGINT DEFAULT 4)")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN n TO m")
    // the renamed column still fills pre-evolution rows from
    // EXISTS_DEFAULT (the physical scan schema preserves the key), and
    // new INSERTs still inject the current default
    assert(spark.sql(s"SELECT m FROM ${sqlTable(dir)} WHERE k = 1")
      .as[Long].head() === 4L)
    spark.sql(s"INSERT INTO ${sqlTable(dir)} (k, v) VALUES (2, 'b')")
    assert(spark.sql(s"SELECT m FROM ${sqlTable(dir)} WHERE k = 2")
      .as[Long].head() === 4L)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{ColumnMapping, ManifestStore}

/** `ALTER TABLE ALTER COLUMN … TYPE` as a METADATA-ONLY commit for the
  * lossless widenings the parquet vectorized reader serves natively
  * (byte/short/int→long, byte/short/int/float→double —
  * [[ManifestStore.widens]]): old files' INT32/FLOAT pages read under the
  * widened schema with no rewrite, stats stay valid (they already live in
  * the long/double stat space), and [[ManifestStore]]'s write planner
  * upcasts narrower incoming batches so post-widen appends land typed as
  * declared. Lossy/narrowing shapes refuse.
  */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-widen").toString

  private def sqlTable(dir: String): String = s"graft.`$dir`"

  private def snap(dir: String) =
    ManifestStore.currentSnapshot(spark, dir).get

  test("int→long widening is metadata-only; both eras read and prune") {
    val dir = tmpDir()
    // int32 era: two well-separated files for the pruning check
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} AS SELECT " +
      "CAST(id AS INT) AS k, CAST(id * 2 AS INT) AS v " +
      "FROM range(1, 51)")
    val before = snap(dir)
    assert(before.schema.get("k").dataType === IntegerType)

    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN k TYPE BIGINT")
    val after = snap(dir)
    assert(after.op === "schema")
    assert(after.files === before.files, "widening must move no data")
    assert(after.schema.get("k").dataType === LongType)
    assert(after.schema.get("v").dataType === IntegerType, "only k widened")

    // old INT32 pages read under the widened schema, exactly
    assert(spark.sql(s"SELECT sum(k) FROM ${sqlTable(dir)}")
      .as[Long].head() === (1L to 50L).sum)
    // long-era insert (a value beyond int range proves the point)
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES (${Int.MaxValue.toLong + 7}, 9)")
    assert(spark.sql(s"SELECT max(k) FROM ${sqlTable(dir)}")
      .as[Long].head() === Int.MaxValue.toLong + 7)

    // stats pruning on the widened column: int-era file bounds still
    // prune against long probes (the stat space was "long" all along)
    val s = snap(dir)
    assert(ManifestStore.pruneFiles(s, "k", Int.MaxValue.toLong, Long.MaxValue)
      .size < s.files.size, "int-era files must prune out of a long range")
    // time travel: the pre-widen version still reads as INT
    assert(spark.sql(
      s"SELECT k FROM ${sqlTable(dir)} VERSION AS OF ${before.version}")
      .schema("k").dataType === IntegerType)
  }

  test("float→double widening preserves exact values; floats render exact stats") {
    val dir = tmpDir()
    Seq((1L, 0.1f), (2L, 2.5f)).toDF("k", "x").write
      .format("graft-manifest").save(dir)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN x TYPE DOUBLE")
    // every float is exactly a double — the widened read must see the
    // float's true value, not its shortest decimal rendering
    val got = spark.sql(s"SELECT x FROM ${sqlTable(dir)} WHERE k = 1")
      .as[Double].head()
    assert(got === 0.1f.toDouble && got > 0.1d)
    // and the float-era footer stats were recorded at the exact double
    // value (Float.toString would understate the max and wrongly prune a
    // probe at the exact widened value)
    val s = snap(dir)
    assert(ManifestStore.pruneFiles(s, "x", 0.1f.toDouble, 1.0).nonEmpty,
      "a probe at the exact widened float value must keep the file")
  }

  test("narrower batches upcast on write after widening (DataFrame + SQL)") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} AS SELECT " +
      "CAST(1 AS INT) AS k, CAST(10 AS INT) AS v")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN v TYPE BIGINT")
    // DataFrame-API append with the OLD (int) shape: planWrite upcasts
    ManifestStore.append(Seq((2, 20)).toDF("k", "v"), dir)
    assert(snap(dir).schema.get("v").dataType === LongType,
      "an int batch must not narrow the declared long column")
    assert(spark.sql(s"SELECT sum(v) FROM ${sqlTable(dir)}")
      .as[Long].head() === 30L)
    // a WIDER batch against a narrower table still refuses (explicit
    // ALTER first — no silent schema takeover from a write)
    intercept[Exception] {
      ManifestStore.append(Seq((3L, 30L, "x")).toDF("k", "v", "w")
        .select(col("k").cast("double").as("k"), col("v"), col("w")), dir)
    }
  }

  test("widening composes with column mapping; lossy shapes refuse") {
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} AS SELECT " +
      "CAST(5 AS INT) AS n, 'a' AS s")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} RENAME COLUMN n TO m")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN m TYPE BIGINT")
    val sch = snap(dir).schema.get
    assert(sch("m").dataType === LongType)
    assert(ColumnMapping.physFor(sch, "m") === "n",
      "widening must keep the physical identity")
    assert(spark.sql(s"SELECT m FROM ${sqlTable(dir)}").as[Long].head() === 5L)

    // refusals: narrowing, lossy, non-numeric
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN m TYPE INT")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN m TYPE DOUBLE")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN s TYPE BIGINT")
    }
    // comment + DROP NOT NULL ride the same exact-schema commit; adding
    // NOT NULL refuses (old files can't prove it)
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN s COMMENT 'tag'")
    assert(snap(dir).schema.get("s").getComment().contains("tag"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN s SET NOT NULL")
    }
  }

  test("decimal precision widening is metadata-only across physical eras") {
    // DECIMAL(p,s) → DECIMAL(p+k,s): the money-column evolution. Parquet
    // stores p≤9 as INT32, p≤18 as INT64, p>18 as FLBA — the widened
    // read schema must serve ALL THREE physical encodings losslessly,
    // so this test widens 8,2 → 12,2 → 22,2 and inserts an era at each
    // precision, asserting exact values and sums across every era
    // without a file rewrite.
    val dir = tmpDir()
    spark.sql(s"CREATE TABLE ${sqlTable(dir)} AS SELECT " +
      "CAST(1 AS BIGINT) AS k, CAST(123456.78 AS DECIMAL(8,2)) AS amt")
    val files0 = snap(dir).files
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN amt TYPE DECIMAL(12,2)")
    assert(snap(dir).files === files0, "widening must not rewrite files")
    assert(snap(dir).schema.get("amt").dataType ===
      org.apache.spark.sql.types.DecimalType(12, 2))
    // INT64-decimal era: a value exceeding DECIMAL(8,2)
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES " +
      "(2, CAST(9876543210.99 AS DECIMAL(12,2)))")
    spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN amt TYPE DECIMAL(22,2)")
    // FLBA era: beyond 18 digits
    spark.sql(s"INSERT INTO ${sqlTable(dir)} VALUES " +
      "(3, CAST(12345678901234567890.12 AS DECIMAL(22,2)))")
    val rows = spark.sql(s"SELECT k, CAST(amt AS STRING) " +
      s"FROM ${sqlTable(dir)} ORDER BY k").as[(Long, String)].collect().toSeq
    assert(rows === Seq(1L -> "123456.78", 2L -> "9876543210.99",
      3L -> "12345678901234567890.12"), rows.toString)
    assert(spark.sql(s"SELECT CAST(sum(amt) AS STRING) FROM ${sqlTable(dir)}")
      .as[String].head() === "12345678911111234557.89")

    // a NARROW-decimal batch upcasts on write (planWrite), keeping the
    // file type uniform at the declared precision
    graft.sources.ManifestStore.append(
      spark.sql("SELECT CAST(4 AS BIGINT) AS k, " +
        "CAST(0.01 AS DECIMAL(8,2)) AS amt"), dir)
    assert(spark.sql(s"SELECT CAST(amt AS STRING) FROM ${sqlTable(dir)} " +
      "WHERE k = 4").as[String].head() === "0.01")

    // refusals: scale change (reinterprets unscaled ints), narrowing,
    // decimal→double (lossy)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN amt TYPE DECIMAL(24,4)")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN amt TYPE DECIMAL(10,2)")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE ${sqlTable(dir)} ALTER COLUMN amt TYPE DOUBLE")
    }
  }
}

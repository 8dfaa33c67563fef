package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}
import org.apache.hadoop.fs.Path

/** Hive-partitioned landing zone (reference O-13/O-14;
  * `services/extractor/app/writer_landing.py:16-55`,
  * `services/staging/app/reader_landing.py:5-26`).
  *
  * Layout: `landing_root/<entity>/run_id=<run_id>/part-*.{parquet|csv}` —
  * the `run_id=` directory is literal Hive partition syntax
  * (`writer_landing.py:29-35`), so a whole-entity read gets partition
  * discovery and partition PRUNING on `run_id` for free: staging reads
  * exactly one run's files, never a directory scan of cold runs.
  *
  * Idempotence: the write hard-fails if the destination already exists
  * (`writer_landing.py:38-39`) — at-most-once landing per run_id; Spark's
  * FileOutputCommitter supplies the write-to-tmp + atomic-rename the
  * reference hand-rolls (`writer_landing.py:42-52`).
  */
object Landing {

  def runDir(root: String, entity: String, runId: String): String =
    s"$root/$entity/run_id=$runId"

  /** Bucketed canonical table — the co-located-join layout. Writing history
    * / latest bucketed (and sorted) by the merge key means every downstream
    * keyed operation — the O-11 anti-join, the O-12 upsert merge, fact-to-
    * fact joins — reads both sides already hash-distributed on the key:
    * Spark plans the join with ZERO exchanges (asserted in `BucketingSpec`).
    * At 100 TB that deletes the largest shuffle in the pipeline; the price
    * is paid once at write time, amortized over every later run.
    *
    * Bucketing metadata lives in the session catalog (`saveAsTable`), the
    * standard Spark mechanism; `buckets` should be sized so one bucket's
    * rows fit an executor's memory at the target scale (e.g. 4096 buckets
    * for a 10 TB table → ~2.5 GB/bucket).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: String = "errorifexists"): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** O-13 — write one run's batch. `numFiles` controls output parallelism:
    * the reference writes a single `part-000` file; at scale leave this at
    * the natural partitioning (0 = don't coalesce).
    */
  def write(df: DataFrame, root: String, entity: String, runId: String,
            format: String = "parquet", numFiles: Int = 1): Unit = {
    require(Seq("parquet", "csv").contains(format),
      s"unsupported landing format: $format (writer_landing.py:26-27 allows parquet|csv)")
    val out = if (numFiles > 0) df.coalesce(numFiles) else df
    val writer = out.write.mode("errorifexists")
    format match {
      case "parquet" => writer.parquet(runDir(root, entity, runId))
      case "csv" => writer.option("header", "true").csv(runDir(root, entity, runId))
    }
  }

  /** O-14 — read one run back, validating required columns and re-coercing
    * the timestamp columns (`reader_landing.py:17-24`). Prefers parquet,
    * falls back to CSV (`reader_landing.py:10-15`).
    */
  def read(spark: SparkSession, root: String, entity: String, runId: String,
           required: Seq[String] = graft.model.Schemas.stagingRequired): DataFrame = {
    val dir = new Path(runDir(root, entity, runId))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) throw new java.io.FileNotFoundException(dir.toString)
    val hasParquet = fs.listStatus(dir).exists(_.getPath.getName.endsWith(".parquet"))
    val df =
      if (hasParquet) spark.read.parquet(dir.toString)
      else spark.read.option("header", "true").option("inferSchema", "true").csv(dir.toString)
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(s"landing missing columns: ${missing.mkString(", ")}")
    // Re-coerce the three pipeline timestamp columns (CSV round-trips them
    // as strings) — reader_landing.py:22-24.
    val tsCols = Seq("updated_at", "_extracted_at", "_watermark_effective")
      .filter(df.columns.contains)
      .filter(c => df.schema(c).dataType != TimestampType)
    if (tsCols.isEmpty) df
    else df.withColumns(tsCols.map(c => c -> col(c).cast(TimestampType)).toMap)
  }

  /** Whole-entity scan across all runs (partition-discovered `run_id`). */
  def readEntity(spark: SparkSession, root: String, entity: String): DataFrame =
    spark.read.option("basePath", s"$root/$entity").parquet(s"$root/$entity")
}

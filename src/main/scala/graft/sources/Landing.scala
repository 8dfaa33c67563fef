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

  /** Z-order clustering value for multi-dimensional data skipping. Each
    * column is bucketed by its value's position between driver-sampled
    * `approxQuantile` fences (rank-normalization — Z-order on raw values
    * degenerates when ranges differ by orders of magnitude), then the
    * bucket bits are interleaved into one Morton value. Write with
    * `repartitionByRange(zorderValue(...))` + sort-within-partitions and
    * every file's parquet min/max footprint is tight in EVERY listed
    * dimension — point/range predicates on ANY of them skip most files,
    * where a linear sort only serves its leading column. The quantile
    * sample is driver-side and bounded (same posture as the IVF trainer);
    * fences are broadcast as literals inside the expression.
    */
  def zorderValue(df: DataFrame, cols: Seq[String], bits: Int = 12): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col => c}
    val nBuckets = 1 << bits
    // ONE quantile pass for all dimensions (the per-column overload scans
    // the table once per column), over double-cast projections so
    // timestamp/date dimensions — the natural time+key clustering — work
    // like the bucket expression below, which compares in double space too
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // loud on non-castable dimensions: a string key would cast to all
    // nulls, approxQuantile would return EMPTY fences, and that dimension
    // would silently collapse to bucket 0 for every row (no pruning)
    cols.foreach { n =>
      val dt = df.schema(n).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.DateType,
        s"z-order column '$n' must be numeric/timestamp/date, got ${dt.catalogString}")
    }
    val castNames = cols.indices.map(i => s"_zq$i")
    val casted = df.select(cols.zip(castNames).map { case (n, a) =>
      c(n).cast("double").as(a)
    }: _*)
    val fences = casted.stat.approxQuantile(castNames.toArray, probs, 0.001).toSeq
    val buckets = cols.zip(fences).map { case (name, f) =>
      // binary-search-equivalent as a literal fence array: count of fences
      // <= value = bucket index. aggregate over a literal array is tiny
      // (evaluated once per row over nBuckets-1 doubles) — acceptable for
      // writes; a native expression is the next step if profiled hot.
      org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.array(f.map(org.apache.spark.sql.functions.lit): _*),
        org.apache.spark.sql.functions.lit(0),
        (acc, fence) => acc + org.apache.spark.sql.functions
          .when(c(name).cast("double") >= fence, 1).otherwise(0))
    }
    graft.plans.GraftFunctions.interleaveBits(df, buckets, bits)
  }

  /** Cluster `df` on the Z-order of `cols` into `numFiles` range buckets
    * and write parquet — the layout step that buys multi-dimensional
    * min/max pruning on the landed data.
    */
  def writeZOrdered(df: DataFrame, dir: String, cols: Seq[String],
                    numFiles: Int, bits: Int = 12): Unit = {
    val z = zorderValue(df, cols, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("errorifexists").parquet(dir)
  }

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

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.Path

/** Storage contract for the pipeline's control/state tables. Two
  * implementations: [[StateStore]] (directory swap via rename — local
  * FS/HDFS) and [[ManifestStore.asTableStore]] (manifest-committed — object
  * stores, snapshot isolation, time travel). Every pipeline component takes
  * a `TableStore` so the backend is a deployment choice, not a code change.
  */
trait TableStore {
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame
  def overwrite(df: DataFrame, dir: String): Unit
  def append(df: DataFrame, dir: String): Unit
}

/** Small keyed parquet datasets used as control/state tables (the role
  * Postgres plays in the reference: watermark, run log, history, latest).
  *
  * Writes follow the reference's write-to-tmp + atomic-rename discipline
  * (`services/extractor/app/writer_landing.py:11-13,42-52`) lifted to
  * directory level: write `<dir>.tmp-<nonce>`, then swap. Readers never see
  * a PARTIAL dataset — but the swap is two renames (out, then in), so a
  * reader racing the writer can hit the gap where the directory is absent
  * and would otherwise read an EMPTY table (for a watermark that means a
  * silent cursor reset and a full re-extract). [[read]] therefore detects
  * an in-flight swap (an `.old-`/`.tmp-` sibling) and briefly retries
  * before concluding the table is genuinely empty. That NARROWS the
  * single-writer/concurrent-reader race to the instants between the final
  * existence check and Spark's own file listing (where a racing swap
  * surfaces as a loud missing-path error, not a silent empty read); a
  * reader that must never observe the swap at all — and any concurrent
  * WRITERS or object stores — should use [[ManifestStore.asTableStore]],
  * whose manifest commit has no such gap.
  *
  * These tables are intentionally tiny (control metadata) or append-mostly
  * (history); reads of control tables are driver-cheap and never in a hot
  * loop.
  */
object StateStore extends TableStore {

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (!fs.exists(path) && swapInFlight(fs, path) && attempt < 20) {
      Thread.sleep(50)
      attempt += 1
    }
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** A sibling `.old-`/`.tmp-` directory means an [[overwrite]] swap is
    * mid-flight (or a crashed writer left its rollback source — in which
    * case the bounded retry lapses and the caller sees the table as it is).
    */
  private def swapInFlight(fs: org.apache.hadoop.fs.FileSystem, path: Path): Boolean = {
    val parent = path.getParent
    parent != null && fs.exists(parent) && fs.listStatus(parent).exists { s =>
      val n = s.getPath.getName
      n.startsWith(path.getName + ".old-") || n.startsWith(path.getName + ".tmp-")
    }
  }

  /** Atomically replace `dir` with the contents of `df`. */
  def overwrite(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val old = new Path(dir + ".old-" + java.util.UUID.randomUUID().toString.take(8))
    // Control tables are small by construction; one file keeps the swap cheap.
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(path)) {
      if (!fs.rename(path, old)) throw new java.io.IOException(s"swap-out failed: $dir")
    }
    if (!fs.rename(tmp, path)) {
      // Roll back so readers still see the old data.
      if (fs.exists(old)) fs.rename(old, path)
      throw new java.io.IOException(s"swap-in failed: $dir")
    }
    fs.delete(old, true)
  }

  /** Append `df` to `dir` (history-style append-only datasets). */
  def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)
}

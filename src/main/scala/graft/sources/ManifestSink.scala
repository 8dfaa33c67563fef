package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SQLContext, SaveMode}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, SchemaRelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `format("graft-manifest")` — the [[ManifestStore]] table format as a
  * first-class Spark data sink.
  *
  * Batch:
  * {{{
  * df.write.format("graft-manifest").mode("append").save(dir)
  * }}}
  * maps SaveMode onto manifest commits (append/overwrite/error/ignore).
  *
  * Streaming:
  * {{{
  * stream.writeStream.format("graft-manifest")
  *   .option("checkpointLocation", cp).option("appId", "ingest-1")
  *   .start(dir)
  * }}}
  * Every micro-batch commits through [[ManifestStore.appendIdempotent]]
  * keyed by (`appId`, batchId) — a replayed batch (sink crashed after the
  * manifest commit but before the checkpoint advanced) is recognized by
  * the lineage's `stream:` op high water and SKIPPED, so an
  * at-least-once stream becomes exactly-once table delivery without the
  * hand-rolled foreachBatch dedup every ad-hoc sink reimplements.
  *
  * Reads:
  * {{{
  * spark.read.format("graft-manifest").load(dir)                     // latest
  * spark.read.format("graft-manifest").option("versionAsOf", 7).load(dir)
  * spark.read.format("graft-manifest").option("timestampAsOf", ts).load(dir)
  * spark.read.format("graft-manifest").option("tag", "release").load(dir)
  * }}}
  * served through [[ManifestFileIndex]] (native vectorized parquet scan,
  * manifest-stat data skipping) or the dv-aware fallback — see
  * [[ManifestRead]] for the two-path design.
  */
class ManifestSinkProvider extends StreamSinkProvider with StreamSourceProvider
    with CreatableRelationProvider with RelationProvider
    with SchemaRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("Path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest needs a table path — .save(dir) / .start(dir)"))

  /** Streaming READ ([[ManifestSource]]): schema from the manifest or the
    * caller, plus the CDF columns when `readChangeFeed` is on.
    */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val dir = pathOf(parameters ++ ci)
    val base = schema.orElse(
      ManifestStore.currentSnapshot(sqlContext.sparkSession, dir).flatMap(_.schema))
      .getOrElse(throw new IllegalStateException(
        s"manifest table $dir records no schema — pass one via .schema(...)"))
    val out =
      if (ci.get("readchangefeed").exists(_.toBoolean))
        StructType(base.fields.toSeq ++ Seq(
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("_commit_op",
            org.apache.spark.sql.types.StringType)))
      else base
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val dir = pathOf(parameters ++ ci)
    val dataSchema = schema.orElse(
      ManifestStore.currentSnapshot(spark, dir).flatMap(_.schema))
      .getOrElse(throw new IllegalStateException(
        s"manifest table $dir records no schema — pass one via .schema(...)"))
    // internal floor is EXCLUSIVE; the option names the first version
    // INCLUDED (Delta's startingVersion convention). startingTimestamp
    // floors at the newest version committed at-or-before the instant —
    // commits after it stream.
    val starting = ci.get("startingversion") match {
      case Some("earliest") => 0L
      case Some(v) => math.max(v.toLong - 1, 0L)
      case None => ci.get("startingtimestamp") match {
        case Some(ts) =>
          ManifestStore.versionAsOf(spark, dir,
            ManifestRead.parseTsMillis(ts)).getOrElse(0L)
        case None => // new commits only: floor at the stream-start version
          ManifestStore.currentSnapshot(spark, dir).map(_.version).getOrElse(0L)
      }
    }
    new ManifestSource(spark, dir, dataSchema, starting,
      readChangeFeed = ci.get("readchangefeed").exists(_.toBoolean),
      ignoreChanges = ci.get("ignorechanges").exists(_.toBoolean),
      maxVersionsPerTrigger = ci.get("maxversionspertrigger").map { v =>
        val k = v.toLong
        require(k > 0, s"maxVersionsPerTrigger must be positive (got $k)")
        k
      },
      maxBytesPerTrigger = ci.get("maxbytespertrigger").map { v =>
        val b = v.toLong
        require(b > 0, s"maxBytesPerTrigger must be positive (got $b)")
        b
      },
      where = ci.get("where").map(_.trim).filter(_.nonEmpty))
  }

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-manifest sink is append-only (got $outputMode) — aggregate " +
        "maintenance belongs in foreachBatch upserts or Ivm")
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    new ManifestSink(pathOf(parameters ++ ci), ci.getOrElse("appid", "default"),
      autoCompact = ci.get("autocompact").exists(_.toBoolean),
      autoCompactEvery = ci.get("autocompactevery").map(_.toInt).getOrElse(16),
      partitionCols = partitionColumns)
  }

  /** `spark.read.format("graft-manifest").load(dir)` — snapshot resolved
    * from the time-travel options, schema from the manifest (self-
    * describing table).
    */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    readRelation(sqlContext, parameters, userSchema = None)

  /** Same with an explicit schema (pre-schema-recording tables, column
    * subsets under the widening-only evolution rule).
    */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String],
                              schema: StructType): BaseRelation =
    readRelation(sqlContext, parameters, userSchema = Some(schema))

  private def readRelation(sqlContext: SQLContext,
                           parameters: Map[String, String],
                           userSchema: Option[StructType]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val dir = pathOf(parameters ++ ci)
    val snap = ManifestRead.resolveSnapshot(spark, dir, ci).getOrElse(
      ManifestStore.Snapshot(0L, Nil, "none"))
    val schema = userSchema.orElse(snap.schema).getOrElse(
      throw new IllegalStateException(
        s"manifest table $dir records no schema — pass one via .schema(...)"))
    val dvFiles = snap.files.flatMap(snap.dvs.get).flatMap(_.files)
    // column mapping: a renamed/dropped-column table's files spell
    // PHYSICAL names a bare HadoopFsRelation cannot alias (DSv1 returns
    // the relation itself, no Project above it) — route through the
    // delegating relation, which the GraftExtensions rewrite re-splices
    // into the declarative readVersion plan (aliased scan, no Row
    // boundary with the extensions installed)
    val mapped = !ColumnMapping.trivial(
      ColumnMapping.resolve(schema, snap.schema))
    if (dvFiles.isEmpty && !mapped)
      // native path: vectorized parquet scan over the manifest's file
      // list with stat/partition/bloom data skipping in listFiles
      HadoopFsRelation(
        location = new ManifestFileIndex(spark, dir, snap, schema),
        partitionSchema = StructType(Nil),
        dataSchema = schema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = ci)(spark)
    else new ManifestDvRelation(spark, dir, snap.version, schema)
  }

  override def createRelation(sqlContext0: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val dir = pathOf(parameters)
    // df.write.partitionBy(...) reaches a v1 source as the JSON-encoded
    // __partition_columns option — decode and route appends through the
    // hive-layout manifest writer (per-file partition values recorded for
    // metadata pruning)
    val partCols = parameters
      .get(org.apache.spark.sql.execution.datasources.DataSourceUtils.PARTITIONING_COLUMNS_KEY)
      .map(org.apache.spark.sql.execution.datasources.DataSourceUtils.decodePartitioningColumns)
      .getOrElse(Nil)
    def appendAny(): Unit =
      if (partCols.isEmpty) ManifestStore.append(data, dir): Unit
      else ManifestStore.appendPartitioned(data, dir, partCols): Unit
    mode match {
      case SaveMode.Append => appendAny()
      case SaveMode.Overwrite =>
        require(partCols.isEmpty,
          "partitionBy with overwrite is not supported — overwrite replaces " +
            "the whole table; append partitioned batches instead")
        ManifestStore.overwrite(data, dir)
      case SaveMode.ErrorIfExists =>
        if (ManifestStore.currentSnapshot(data.sparkSession, dir).isDefined)
          throw new IllegalStateException(s"manifest table $dir already has commits")
        appendAny()
      case SaveMode.Ignore =>
        if (ManifestStore.currentSnapshot(data.sparkSession, dir).isEmpty)
          appendAny()
    }
    new BaseRelation {
      override def sqlContext: SQLContext = sqlContext0
      override def schema: StructType = data.schema
    }
  }
}

/** The streaming sink instance: one per (query run, path).
  *
  * `autoCompact=true` runs [[ManifestStore.compactSmall]] every
  * `autoCompactEvery` committed batches (default 16): streaming
  * micro-batches are the table format's small-file factory, and folding
  * the incremental OPTIMIZE into the sink keeps the debt bounded without
  * a separate maintenance job. Safe by construction: compactSmall
  * commits through the optimistic protocol (a concurrent append survives
  * the rewrite; a lost race aborts the compaction, never the data), the
  * `compact` op is CDC-data-neutral so downstream manifest STREAMS see
  * nothing, and a compaction failure never fails the batch.
  */
class ManifestSink(dir: String, appId: String,
                   autoCompact: Boolean = false,
                   autoCompactEvery: Int = 16,
                   partitionCols: Seq[String] = Nil)
    extends Sink with org.apache.spark.internal.Logging {

  private var committed = 0L

  /** Consecutive autoCompact failures — observable (and test-assertable)
    * evidence when compaction keeps losing: a permissions problem or a
    * perpetual OCC loser must not look like a working option while
    * small-file debt grows unbounded.
    */
  @volatile private[sources] var compactFailures = 0L

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    val spark = data.sparkSession
    // the micro-batch Dataset is streaming-tagged — the engine refuses a
    // plain .write/.rdd on it. Its QueryExecution, though, is the already-
    // planned batch over exactly this micro-batch's data: lift the
    // InternalRow RDD out (copying — the scan reuses row buffers) and
    // rebuild an ordinary batch frame over it.
    val schema = data.schema
    val internal = data.queryExecution.toRdd.map(_.copy())
    val rows = internal.mapPartitions { it =>
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(schema)
      it.map(ir => conv(ir).asInstanceOf[Row])
    }
    val plain = spark.createDataFrame(rows, schema)
    if (!plain.isEmpty) {
      // .partitionBy(...) on the stream writer routes through the
      // hive-layout idempotent append: per-file partition values recorded
      // for metadata pruning, same stream:<appId>:<batchId> replay skip.
      // A DECLARED-partitioned target (CREATE TABLE … PARTITIONED BY)
      // keeps its layout even when the stream writer names no columns.
      val pcols =
        if (partitionCols.nonEmpty) partitionCols
        else {
          // declared partitionCols are PHYSICAL; the incoming micro-batch
          // speaks logical names — translate for the routing check (the
          // store re-translates at its own boundary, identity both ways
          // on unmapped tables). Entries may be TRANSFORM specs
          // (`days(ts)` — [[PartitionSpec]]): only the INNER column
          // translates, and the batch must carry the SOURCE column, not
          // the rendered spec — a plain-name check here would silently
          // route a transform-partitioned stream to the unpartitioned
          // append and erode pruning on every micro-batch.
          val snap0 = ManifestStore.currentSnapshot(spark, dir)
          val declared = snap0.map(_.partitionCols).getOrElse(Nil)
          val declaredLogical = snap0.flatMap(_.schema) match {
            case Some(ss) => declared.map(
              PartitionSpec.mapCol(_, ColumnMapping.logicalFor(ss, _)))
            case None => declared
          }
          if (declaredLogical.nonEmpty && declaredLogical.forall(s =>
              plain.columns.contains(PartitionSpec.sourceCol(s))))
            declaredLogical
          else Nil
        }
      if (pcols.isEmpty)
        ManifestStore.appendIdempotent(plain, dir, appId, batchId): Unit
      else
        ManifestStore.appendPartitionedIdempotent(plain, dir, pcols,
          appId, batchId): Unit
      committed += 1
      if (autoCompact && committed % autoCompactEvery == 0)
        try {
          ManifestStore.compactSmall(spark, dir, schema): Unit
          compactFailures = 0L
        } catch {
          case scala.util.control.NonFatal(e) => // never fail the batch —
            // but never hide the failure either: a persistently losing
            // compaction (permissions, basename collision, OCC starvation)
            // must be visible before small-file debt compounds
            compactFailures += 1
            logWarning(s"autoCompact on $dir failed " +
              s"($compactFailures consecutive) — batches keep committing, " +
              s"small-file debt is growing: ${e.getMessage}", e)
        }
    }
  }

  override def name(): String = s"graft-manifest[$dir]"
}

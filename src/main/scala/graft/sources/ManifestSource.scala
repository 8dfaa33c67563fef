package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** `readStream.format("graft-manifest")` — a manifest table as a
  * Structured Streaming SOURCE, closing the loop the sink opened: the
  * same table one pipeline maintains (appends, streaming sink commits,
  * MERGEs) is another pipeline's input stream.
  *
  * {{{
  * spark.readStream.format("graft-manifest")
  *   .option("startingVersion", "0")        // default: stream-start version
  *   .load(dir)                             // rows of appended data
  *
  * spark.readStream.format("graft-manifest")
  *   .option("readChangeFeed", "true")      // CDF rows: data + _change_type
  *   .load(dir)                             //   + _commit_version/_commit_op
  * }}}
  *
  * Offsets ARE manifest versions — the lineage is already a durable,
  * totally-ordered log, so the source needs no state of its own: batch
  * `(start, end]` is exactly [[ManifestStore.changes]] over those
  * versions, metadata-planned (an append commit costs one scan of only
  * its fresh files — the hot path stays proportional to the batch, never
  * the table). Replays after a crash re-read the same immutable versions:
  * deterministic batches, end-to-end exactly-once against an idempotent
  * sink.
  *
  * Semantics (the Delta streaming-source discipline):
  *  - default mode emits appended ROWS and REFUSES a commit that removed
  *    or rewrote rows (overwrite/delete/MERGE/restore) — a row stream
  *    has no way to express a retraction, and silently dropping it
  *    corrupts downstream state. `ignoreChanges=true` opts into
  *    emitting such commits' inserted rows anyway (deletes skipped).
  *  - `readChangeFeed=true` emits the full row-level feed (insert AND
  *    delete rows, tagged) — the lossless mode for [[graft.operators.Ivm]]
  *    -style incremental maintenance.
  *  - `startingVersion` floors the first batch: absent, streaming begins
  *    AFTER the version current at stream start (new commits only);
  *    `"0"`/`"earliest"` replays the whole retained lineage first.
  *  - `maxVersionsPerTrigger` bounds each micro-batch to that many
  *    commits (admission control): replaying a deep backlog proceeds in
  *    bounded chunks instead of one giant batch — Delta's
  *    `maxFilesPerTrigger` at the commit granularity the manifest
  *    lineage natively provides.
  *  - `maxBytesPerTrigger` bounds each micro-batch by the admitted
  *    commits' FRESH data bytes (from the per-file sizes the manifests
  *    record — zero data-plane I/O to plan): the natural admission
  *    control when commit sizes are heterogeneous (a backlog of ten tiny
  *    commits and one 100 GB backfill chunks by cost, not count).
  *    Soft max (Delta semantics): a single commit larger than the cap
  *    still streams — alone — so progress is guaranteed. Composes with
  *    `maxVersionsPerTrigger` (both caps apply).
  *
  *    Known v1-wrapper interaction (measured, round 13): under
  *    `Trigger.AvailableNow` Spark wraps a v1 `Source` and snapshots its
  *    FIRST `getOffset` as the drain target — with a per-trigger cap
  *    set, that snapshot is the CAPPED offset, so each AvailableNow run
  *    drains exactly one capped batch and terminates (the Kafka v1
  *    source had the same flaw; Spark fixed it for v2 sources via
  *    SupportsTriggerAvailableNow). Until this source grows a v2
  *    MicroBatchStream form: use AvailableNow WITHOUT per-trigger caps
  *    (full drain, one batch per commit group), or a continuous trigger
  *    with the caps (bounded batches, drains fully).
  *  - `where` — a SQL predicate over the table's columns, applied INSIDE
  *    the source (`.option("where", "ts >= '2024-01-10'")`): rows are
  *    filtered exactly (same result as `.filter` downstream, which the
  *    RDD boundary under [[getBatch]] cannot push through), and the
  *    predicate prunes at the FILE level on both planes — the batch scan
  *    reads only files whose manifest evidence (stats, identity
  *    partition values, `days(ts)`-style hidden-transform values) admits
  *    a match, and `maxBytesPerTrigger` charges only those files' bytes,
  *    so a stream tailing one day/tenant of a 100 TB firehose admits
  *    commits at the rate of ITS slice, not the table's.
  */
class ManifestSource(spark: SparkSession, dir: String,
                     dataSchema: StructType,
                     startingVersion: Long,
                     readChangeFeed: Boolean,
                     ignoreChanges: Boolean,
                     maxVersionsPerTrigger: Option[Long] = None,
                     maxBytesPerTrigger: Option[Long] = None,
                     where: Option[String] = None) extends Source {

  /** The `where` predicate resolved against the table schema, rendered as
    * conjunctive ranges for the metadata pruners ([[admitByBytes]]'s
    * byte charge). Resolution runs once, on the ANALYZED plan of a probe
    * frame (the optimizer would fold a filter over an empty relation
    * away) — unconvertible conjuncts simply don't prune, the row filter
    * still applies them exactly.
    */
  private[graft] val whereRanges: Seq[(String, Any, Any)] = where.toSeq.flatMap { w =>
    val probe = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dataSchema)
      .filter(org.apache.spark.sql.functions.expr(w))
    probe.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.flatMap { c =>
      // the analyzed tree still carries RuntimeReplaceable sugar (BETWEEN
      // et al. — the optimizer would rewrite them, but it would also fold
      // the empty probe away): unwrap to the replacement, then inline its
      // `With` common-subexpression form (RewriteWithExpression's job)
      // back to the plain conjuncts the range planners understand.
      // Scoping: a ref defined in an OUTER With is left in place by the
      // inner With's pass — transformUp reaches the outer With next and
      // resolves it there. Implicit casts of untyped literals
      // (`ts >= '2024-01-10'` analyzes to `ts >= CAST(str AS TIMESTAMP)`)
      // are folded to typed literals so toRanges sees the shape it
      // matches. Any surprise shape degrades to "no pruning" (Try) — the
      // row filter alone is still exact.
      import org.apache.spark.sql.catalyst.expressions.{Cast,
        CommonExpressionDef, CommonExpressionRef, Literal,
        RuntimeReplaceable, With}
      scala.util.Try {
        val plain = c.transformUp {
          case r: RuntimeReplaceable => r.replacement
        }.transformUp {
          case w: With =>
            val defs = w.defs.map { case CommonExpressionDef(child, id) =>
              id -> child
            }.toMap
            w.child.transformUp {
              case ref: CommonExpressionRef if defs.contains(ref.id) =>
                defs(ref.id)
            }
        }.transformUp {
          case cast: Cast if cast.foldable => Literal(cast.eval(), cast.dataType)
        }
        ManifestRead.toRanges(Seq(plain))
      }.getOrElse(Nil)
    }
  }

  /** The physical QueryExecution of the most recent [[getBatch]] — an
    * observability/test seam: the micro-batch's file-scan metrics
    * (numFiles after `where` pruning) live behind the RDD boundary the
    * streaming engine sees, unreachable from the StreamingQuery.
    */
  @volatile private[graft] var lastBatchExecution
    : Option[org.apache.spark.sql.execution.QueryExecution] = None

  /** Highest version this instance has planned or replayed — the rate
    * limiter's floor. Monotonic; getBatch syncs it to the engine's
    * checkpointed end on restart (MicroBatchExecution re-initializes v1
    * sources by replaying the last logged batch), so a limited getOffset
    * can never fall behind what the checkpoint already committed.
    */
  @volatile private var plannedV: Long = startingVersion

  /** Ops that publish NO fresh rows — compaction rewrites existing rows,
    * blooms/schema/create are metadata-only (`files = Nil` or carried).
    * ONE classifier feeds both row-mode safety ([[appendSafe]]) and the
    * byte-budget charge ([[admitByBytes]] charges them 0), so a future
    * data-neutral op added here stays consistent in both places.
    */
  private def dataNeutral(op: String): Boolean =
    op == "compact" || op == "bloom" || op == "schema" || op == "create" ||
      op == "properties" || op.startsWith("set-partition-spec:")

  /** Ops that cannot remove or rewrite rows: safe in row mode — appends
    * plus the data-neutral set; `tag`s never commit; everything else
    * (overwrite, delete, delete-dv, update-dv, upsert-dv, merge-dv,
    * restore:N, clone:…) can retract rows.
    */
  private def appendSafe(op: String): Boolean =
    dataNeutral(op) || op == "append" || op == "create-as" ||
      op.startsWith("stream:") // create-as is version 1: nothing to retract

  override val schema: StructType =
    if (readChangeFeed) StructType(dataSchema.fields.toSeq ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType, nullable = false),
      StructField("_commit_op", StringType)))
    else dataSchema

  override def getOffset: Option[Offset] = {
    val cur = ManifestStore.currentSnapshot(spark, dir).map(_.version).getOrElse(0L)
    // admission control: a backlog replays maxVersionsPerTrigger commits
    // per micro-batch instead of one giant batch — bounded state, bounded
    // task counts, steady progress over a 100 TB history
    val vCap = maxVersionsPerTrigger match {
      case Some(k) => math.min(cur, plannedV + k)
      case None => cur
    }
    val v = maxBytesPerTrigger match {
      case Some(maxB) => admitByBytes(vCap, maxB)
      case None => vCap
    }
    if (v <= startingVersion || v <= plannedV) None
    else { plannedV = math.max(plannedV, v); Some(LongOffset(v)) }
  }

  /** Byte-bounded admission: walk candidate versions `(plannedV, vCap]`,
    * summing each commit's FRESH files' recorded byte sizes, and stop
    * BEFORE the version that would push the batch past `maxB` — always
    * admitting at least one (an oversized commit streams alone).
    * Metadata-plane only: one manifest JSON per candidate, costs bounded
    * by the admission, never the backlog. Files without a recorded size
    * (pre-sizes writers) count 0 — admission degrades toward the version
    * cap, never blocks. An unreadable mid-walk manifest stops admission
    * at the last good version (the next trigger retries).
    */
  private def admitByBytes(vCap: Long, maxB: Long): Long = {
    var admitted = plannedV
    var bytes = 0L
    var prevFiles: Set[String] =
      if (plannedV <= 0L) Set.empty
      else scala.util.Try(ManifestStore.readManifest(spark, dir, plannedV)
        .files.toSet).getOrElse(Set.empty)
    var v = plannedV + 1
    var stop = false
    while (v <= vCap && !stop) {
      scala.util.Try(ManifestStore.readManifest(spark, dir, v)).toOption match {
        case None => stop = true
        case Some(s) =>
          val fresh = s.files.filterNot(prevFiles)
          // data-neutral ops rewrite or touch files without adding rows —
          // charging their full rewritten output would pin every trigger
          // around a large compact to one-version batches; they cost 0
          // against the byte budget (same classifier appendSafe builds on:
          // no fresh rows can flow from them). With a `where` predicate,
          // fresh files PROVABLY disjoint from it (manifest evidence)
          // charge 0 too — the scan won't read them, so the budget
          // shouldn't count them.
          val charged =
            if (whereRanges.isEmpty) fresh
            else ManifestStore.pruneFilesWhere(s.copy(files = fresh),
              whereRanges)
          val b = if (dataNeutral(s.op)) 0L
            else charged.map(f => s.sizes.getOrElse(f, 0L)).sum
          if (admitted > plannedV && bytes + b > maxB) stop = true
          else {
            admitted = v; bytes += b; prevFiles = s.files.toSet; v += 1
          }
      }
    }
    admitted
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(asVersion).getOrElse(startingVersion)
    val to = asVersion(end)
    plannedV = math.max(plannedV, to) // restart sync: never plan below this
    val feed0 = ManifestStore.changes(spark, dir, from, to, dataSchema)
    // the `where` predicate applies INSIDE the batch plan, where the scan
    // is still declarative: it pushes into changes()' underlying manifest
    // scans, whose FileIndex prunes files from the same stats/partition/
    // transform evidence batch queries use (in CDF mode it filters both
    // insert and delete rows — the change feed OF the filtered stream)
    val feed = where match {
      case Some(w) => feed0.filter(org.apache.spark.sql.functions.expr(w))
      case None => feed0
    }
    val out =
      if (readChangeFeed) feed
      else {
        // row mode: refuse silent retractions BEFORE any scan — one
        // metadata read per version in the batch
        if (!ignoreChanges) {
          val unsafe = ((from + 1) to to).flatMap { v =>
            scala.util.Try(ManifestStore.readManifest(spark, dir, v).op)
              .toOption.filterNot(appendSafe).map(op => s"v$v:$op")
          }
          require(unsafe.isEmpty,
            s"manifest stream on $dir hit non-append commits ${unsafe.mkString(", ")} — " +
              "a row stream cannot express retractions; restart with " +
              "option(\"readChangeFeed\", \"true\") (lossless) or " +
              "option(\"ignoreChanges\", \"true\") (emit inserts, drop deletes)")
        }
        feed.filter(col("_change_type") === lit("insert"))
          .select(dataSchema.fieldNames.toIndexedSeq.map(col): _*)
      }
    // MicroBatchExecution requires the batch frame streaming-tagged; the
    // plan underneath is the ordinary batch plan changes() built. Rows
    // are COPIED off the scan's reused row buffers (same discipline as
    // ManifestSink.addBatch) — a LogicalRDD consumer may buffer them.
    lastBatchExecution = Some(out.queryExecution)
    org.apache.spark.sql.graft.StreamingShim.streamingDf(
      spark, out.queryExecution.toRdd.map(_.copy()), out.schema)
  }

  private def asVersion(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()

  override def toString: String = s"ManifestSource[$dir]"
}

package graft.sources

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Manifest-backed table: the object-store-safe successor to
  * [[StateStore]]'s directory swap.
  *
  * [[StateStore.overwrite]] relies on directory-rename atomicity, which
  * holds on local FS/HDFS but not on S3-class stores (rename = copy+delete,
  * and readers can observe the gap). This store never renames data: data
  * files are immutable and write-once under unique names, and the ONLY
  * commit point is publishing a manifest — a JSON file listing the exact
  * data files of one table version:
  *
  * {{{
  * <dir>/_manifests/v00000042.json   // {"version":42,"files":[...],"op":"append"}
  * <dir>/d-<nonce>/part-*.parquet    // immutable data, never renamed
  * }}}
  *
  * Properties (the same core protocol as Delta/Iceberg, minimal form):
  *  - **Atomic commit**: `vNNNNNNNN.json` is claimed with create-exclusive
  *    (`O_EXCL`) — the true test-and-set on local FS/HDFS. On S3 the same
  *    slot-claim is a conditional `PUT If-None-Match:*`; the filesystem
  *    hook is [[publish]], one call. Readers skip an unparseable top
  *    manifest (mid-write or crashed writer), so a claim is never a lock.
  *  - **Optimistic concurrency**: two writers racing to version N+1 — one
  *    wins the slot, the loser re-reads the new latest snapshot and retries
  *    on top of it (append re-bases automatically; overwrite just bumps).
  *  - **Snapshot isolation**: a reader resolves the latest manifest once;
  *    the files it pins are immutable and survive later commits, so a long
  *    job reads one consistent version end to end. Old versions stay
  *    readable ([[readVersion]] — time travel) until [[vacuum]].
  *
  * Intended for the pipeline's control/state tables (watermark, run log,
  * latest, history) where the reference used Postgres transactions
  * (`services/staging/app/staging_repo.py:18-23` batches in one txn);
  * history appends map to `append`, latest/watermark swaps to `overwrite`.
  *
  * On top of the core protocol, manifests carry per-file column stats,
  * exact row counts, and the table schema — enabling stats-skipped scans
  * ([[rangeScan]], [[lookup]]), metadata-only [[countRows]],
  * self-describing [[readLatest]] with widening-only schema evolution,
  * stats-planned writes ([[deleteRange]], [[upsertKeyed]] — the MERGE
  * shape), maintenance ([[compactSmall]], optionally Z-order clustered),
  * wall-clock time travel ([[versionAsOf]]), and a row-level change-data
  * feed ([[changes]], [[changesKeyed]]) consumed incrementally via
  * [[Cdc.followOnce]] + [[graft.operators.Ivm]].
  */
object ManifestStore {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.ManifestStore")

  /** Open-bound marker for the pruning range APIs: a `(column, lo, hi)`
    * range with `Unbounded` on one side is a one-sided predicate
    * (`col >= lo` / `col <= hi`) and prunes on the bounded side alone.
    * This is what lets ONE-SIDED STRING ranges prune (strings have no
    * max sentinel value) and keeps double ranges exact at ±Infinity
    * (a finite fake sentinel like Double.MinValue would wrongly prune a
    * file whose values are all -Infinity).
    */
  case object Unbounded

  /** `deltaChain` is the version's distance from its nearest FULL
    * manifest (0 = this version's file is itself a checkpoint) — the
    * write side consults it to decide when a commit must checkpoint
    * instead of appending another delta (see [[publishLoop]]).
    */
  final case class Snapshot(version: Long, files: Seq[String], op: String,
                            stats: Map[String, Map[String, ColStats]] = Map.empty,
                            rows: Map[String, Long] = Map.empty,
                            schema: Option[StructType] = None,
                            parts: Map[String, Map[String, String]] = Map.empty,
                            blooms: Map[String, Map[String, BloomIndex]] = Map.empty,
                            dvs: Map[String, DvRef] = Map.empty,
                            sizes: Map[String, Long] = Map.empty,
                            partitionCols: Seq[String] = Nil,
                            props: Map[String, String] = Map.empty,
                            deltaChain: Int = 0) {

    /** Stat bounds parsed into their primitive space ONCE per Snapshot
      * instance (`(typ, min, max)` — Long/Double/String by typ). The
      * manifest stores bounds as strings; parsing them inside every
      * [[statsAdmit]] probe would cost files × conjuncts string parses
      * per planned query — and [[pruneFilesIn]] probes per VALUE, so an
      * IN-list lookup on a million-file table would re-parse millions of
      * times. Driver-only planning state; excluded from case-class
      * equality (not a constructor field).
      */
    @transient lazy val typedStats: Map[String, Map[String, (String, Any, Any)]] =
      stats.map { case (rel, cols) =>
        rel -> cols.flatMap { case (c, cs) =>
          (cs.min, cs.max) match {
            case (Some(mn), Some(mx)) => scala.util.Try[(String, Any, Any)](cs.typ match {
              case "long" => ("long", mn.toLong, mx.toLong)
              case "double" => ("double", mn.toDouble, mx.toDouble)
              case "string" => ("string", mn, mx)
              case other => (other, mn, mx)
            }).toOption.map(c -> _)
            case _ => None
          }
        }
      }
  }

  /** A data file's DELETION VECTOR state: `files` are the dv parquet
    * sidecars (rows `(f: file name, i: row index)`) whose tombstones apply
    * to it, `deleted` the file's total tombstoned rows (for the
    * metadata-only COUNT(*)). Merge-on-read deletes ([[deleteWhere]])
    * append tombstones here instead of rewriting data files — the
    * GDPR-point-delete shape for a 100 TB table where [[deleteRange]]'s
    * copy-on-write would rewrite terabytes to drop kilobytes. Readers
    * anti-join `(_metadata.file_path name, _metadata.row_index)` against
    * the live dv union; rewrites (compaction, MERGE, deleteRange partials)
    * read through the same logical view, so their outputs MATERIALIZE the
    * deletions and the rewritten files' dv entries drop out of the
    * lineage with them.
    */
  final case class DvRef(files: Seq[String], deleted: Long)

  /** Helper-column names for the dv row-identity join — namespaced so they
    * can never collide with a user schema.
    */
  private val dvNameCol = "__graft_dv_file"
  private val dvIdxCol = "__graft_dv_idx"

  /** Per-file bloom filter over one column's values — the point-lookup
    * companion to min/max [[ColStats]]: range stats prune a key-CLUSTERED
    * table well, but on a table whose key arrives unclustered (every
    * append covers the whole key space) min/max admit every file and a
    * `key = v` lookup scans the lake. A bloom answers "can this file
    * contain v?" probabilistically — no false negatives (a kept bit is
    * proof of possible presence; pruning on a clear bit is always safe),
    * a ~1% false-positive rate at the default 10 bits/key (k = 5).
    *
    * Hashing is the repo's PORTABLE md5 discipline (BASELINE.md): both the
    * executor-side build ([[buildBlooms]]) and the driver-side probe
    * ([[BloomIndex.contains]]) derive the k bit positions from the same
    * md5 hex of the value's canonical string (`CAST(col AS STRING)` ≡
    * JVM `toString` for the permitted long/int/string column types), so
    * build and probe agree bit-for-bit with no engine-private hash.
    * `words` is the bitset as little-endian 64-bit words.
    */
  final case class BloomIndex(bits: Int, k: Int, words: Array[Long]) {
    def contains(canonical: String): Boolean = {
      val hex = BloomIndex.md5Hex(canonical)
      var i = 0
      while (i < k) {
        val pos = Integer.parseInt(hex.substring(6 * i, 6 * i + 6), 16) % bits
        if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  object BloomIndex {
    /** Lowercase md5 hex — byte-identical to Spark SQL's `md5()`. */
    private[sources] def md5Hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
      val sb = new StringBuilder(32)
      d.foreach(b => sb.append(f"${b & 0xff}%02x"))
      sb.toString
    }
  }

  /** Per-file column statistics harvested from the parquet footer at commit
    * time (metadata-only — no data read). `min`/`max` are the column's
    * primitive-space bounds rendered as strings with a type tag
    * (`long` | `double` | `string`); `None` bounds mean "unknown" and make
    * the file un-prunable, never wrong. Oversized string bounds (> 64
    * chars) are dropped rather than truncated: a truncated upper bound
    * would UNDERSTATE the file's max and prune a file that matches
    * (Iceberg solves this with increment-on-truncate; dropping is the
    * simple safe choice).
    */
  final case class ColStats(typ: String, min: Option[String],
                            max: Option[String], nullCount: Long)

  /** [[TableStore]] view: the drop-in object-store-safe backend for every
    * pipeline component (committed versions are discarded by the interface;
    * use the typed methods directly when you need them).
    */
  object asTableStore extends TableStore {
    override def read(spark: SparkSession, dir: String,
                      schema: StructType): DataFrame =
      ManifestStore.read(spark, dir, schema)
    override def overwrite(df: DataFrame, dir: String): Unit =
      ManifestStore.overwrite(df, dir): Unit
    override def append(df: DataFrame, dir: String): Unit =
      ManifestStore.append(df, dir): Unit
  }

  private val manifestName: Regex = raw"v(\d{8})\.json".r
  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = new Path(dir, "_manifests")

  private def manifestPath(dir: String, version: Long) =
    new Path(manifestDir(dir), f"v$version%08d.json")

  private def tagsDir(dir: String) = new Path(manifestDir(dir), "tags")

  private def tagPath(dir: String, name: String) = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"tag name '$name' must be [A-Za-z0-9][A-Za-z0-9._-]*")
    new Path(tagsDir(dir), s"$name.json")
  }

  /** Pin `version` under a NAMED tag — the release-discipline primitive
    * ("the snapshot run 2024-07-01 trained on"): a tag resolves through
    * [[readTag]] for the table's lifetime, and [[vacuum]] treats every
    * tagged version as live — its manifest is never dropped and its data
    * files never collected, however old — so a tag is a durable pin, not a
    * bookmark that silently dangles once retention passes. Tags are
    * create-only unless `retag` (mirroring the immutable-snapshot
    * discipline); deleting the tag releases the pin at the next vacuum.
    */
  def tag(spark: SparkSession, dir: String, name: String, version: Long,
          retag: Boolean = false): Unit = {
    val f = fs(spark, dir)
    val p = tagPath(dir, name)
    require(f.exists(manifestPath(dir, version)),
      s"cannot tag version $version: no such manifest")
    if (!retag && f.exists(p))
      throw new IllegalStateException(s"tag '$name' already exists (use retag)")
    f.mkdirs(tagsDir(dir))
    val body = s"""{"name":"$name","version":$version,""" +
      s""""created_ms":${System.currentTimeMillis()}}"""
    // stage + rename: a reader never sees a half-written tag body
    val tmp = new Path(tagsDir(dir), s".$name.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p)) {
      f.delete(tmp, false)
      throw new IllegalStateException(s"tag '$name' rename failed")
    }
  }

  /** All tags of a table: name → pinned version. Unreadable/half-written
    * tag files are skipped (same reader resilience as manifests).
    */
  def tags(spark: SparkSession, dir: String): Map[String, Long] = {
    val f = fs(spark, dir)
    val td = tagsDir(dir)
    if (!f.exists(td)) return Map.empty
    f.listStatus(td).toSeq
      .filter(s => s.getPath.getName.endsWith(".json"))
      .flatMap { s =>
        scala.util.Try {
          val body = readFully(f, s.getPath)
          val v = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
            .map(_.group(1).toLong).get
          s.getPath.getName.stripSuffix(".json") -> v
        }.toOption
      }.toMap
  }

  /** The version a tag pins, if the tag exists and parses. */
  def tagVersion(spark: SparkSession, dir: String, name: String): Option[Long] =
    tags(spark, dir).get(name)

  /** Time travel by tag name. Throws if the tag does not exist. */
  def readTag(spark: SparkSession, dir: String, name: String,
              schema: StructType): DataFrame = {
    val v = tagVersion(spark, dir, name).getOrElse(
      throw new NoSuchElementException(s"no tag '$name'"))
    readVersion(spark, dir, v, schema)
  }

  /** Drop a tag (releases its vacuum pin). Returns whether it existed. */
  def deleteTag(spark: SparkSession, dir: String, name: String): Boolean =
    fs(spark, dir).delete(tagPath(dir, name), false)

  private def readFully(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Latest committed snapshot, or None for an empty/uninitialized table.
    *
    * Reader resilience: the newest manifest may be mid-write (create is the
    * atomic *claim*; the body lands within the same call but a reader can
    * race the microseconds between) or left corrupt by a crashed writer. An
    * unparseable top manifest is skipped and the previous version serves —
    * a later commit shadows the corpse, so no writer ever blocks on it.
    */
  def currentSnapshot(spark: SparkSession, dir: String): Option[Snapshot] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) return None
    val versions = f.listStatus(md).toSeq.flatMap(s => s.getPath.getName match {
      case manifestName(v) => Some(v.toLong)
      case _ => None
    })
    versions.sorted.reverse.iterator
      .map(v => scala.util.Try(readManifest(spark, dir, v)))
      .collectFirst { case scala.util.Success(s) => s }
  }

  /** Parsed-snapshot cache — the metadata analog of the file-pruning work:
    * a committed manifest version is IMMUTABLE (create is the atomic
    * claim; nothing ever rewrites a version file), so its parse is pure
    * and can serve every subsequent read of that version. Without it,
    * every `read`/`readAnyOf`/`currentSnapshot` re-parses the full JSON —
    * ∝ total files per CALL, which the round-13 admission probe measured
    * as a per-batch metadata term on a 64k-file postings table (a 45 MB
    * manifest, parsed several times per admission).
    *
    * Hits are validated against the manifest file's (length, mtime) taken
    * BEFORE the cached read: the claim-then-body write means a racing
    * reader can see a partial file, but a partial body fails JSON parse
    * and is never cached, and a body landing after the stat changes the
    * stat — the next call re-reads. The snapshot objects are immutable,
    * so sharing across sessions is safe.
    *
    * Boundary (the immutable-version contract, stated): an EXTERNAL actor
    * that deletes a table directory and recreates the SAME version number
    * with a byte-length-identical body within one mtime tick of the
    * original write would be served the prior parse. No library operation
    * can do this — versions are create-only, vacuum drops old versions
    * without reuse, restore/overwrite always claim a NEW version — so the
    * exposure requires rewriting table history in place, which the format
    * forbids independently of this cache. (Realistic dir reuse — tests,
    * redeploys — changes length or lands in a later tick; spec-covered.)
    *
    * Bounded two ways: entry count (LRU) and total WEIGHT in file entries
    * — one 64k-file snapshot retains tens of MB of parsed maps, so a
    * count-only cap could pin GBs. Over-weight evicts eldest-first.
    */
  private val snapCacheMax = 16
  private val snapCacheMaxWeight = 131072L // total cached file entries
  private val snapCache =
    new java.util.LinkedHashMap[String, (Long, Long, Snapshot)](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long, Snapshot)]): Boolean =
        size() > snapCacheMax
    }
  private def snapCacheTrim(): Unit = {
    var weight = 0L
    snapCache.values().forEach(v => weight += v._3.files.size.toLong max 1L)
    val it = snapCache.entrySet().iterator()
    // never evict down to empty: the most-recent (last in access order)
    // entry survives even if it alone exceeds the weight cap — the
    // hugest table keeps exactly one cached snapshot
    while (weight > snapCacheMaxWeight && snapCache.size() > 1 && it.hasNext) {
      val e = it.next()
      weight -= e.getValue._3.files.size.toLong max 1L
      it.remove()
    }
  }

  private def snapCacheGet(key: String,
                           st: org.apache.hadoop.fs.FileStatus): Option[Snapshot] =
    snapCache.synchronized {
      snapCache.get(key) match {
        case (len, mt, s) if len == st.getLen && mt == st.getModificationTime =>
          Some(s)
        case _ => None
      }
    }

  private def snapCachePut(key: String, st: org.apache.hadoop.fs.FileStatus,
                           snap: Snapshot): Unit =
    snapCache.synchronized {
      snapCache.put(key, (st.getLen, st.getModificationTime, snap)): Unit
      snapCacheTrim()
    }

  /** Test hook: drop every cached parse so a spec can prove the COLD
    * reconstruction path (delta chains resolved from disk, not from the
    * write-side's warm entries).
    */
  private[graft] def snapCacheClear(): Unit =
    snapCache.synchronized(snapCache.clear())

  /** Resolve `version` to its full [[Snapshot]]. A version file is either
    * a FULL manifest (checkpoint — the complete state, parseable alone)
    * or a DELTA carrying only the commit's adds/removes/metadata patches
    * plus an explicit `base` pointer to the snapshot it was computed
    * against (see [[publishLoop]]). Deltas resolve iteratively: walk the
    * base chain DOWN until a checkpoint or a cached snapshot, then fold
    * the deltas forward, caching every intermediate — so a warm reader
    * pays one small parse per new version, and a cold reader pays one
    * checkpoint parse plus the (bounded) chain of small deltas, never
    * more. The base pointer names the version the WRITER actually based
    * on (not `version - 1`): a crashed writer's unparseable corpse is
    * never anyone's base, so chains skip corpses by construction.
    */
  def readManifest(spark: SparkSession, dir: String, version: Long): Snapshot = {
    val f = fs(spark, dir)
    // walk down: collect unresolved delta roots (ends oldest-first)
    var pending = List.empty[(Long, com.fasterxml.jackson.databind.JsonNode,
      org.apache.hadoop.fs.FileStatus)]
    var cur = version
    var base: Snapshot = null
    while (base == null) {
      val p = manifestPath(dir, cur)
      val st = f.getFileStatus(p) // missing version throws, as f.open did
      snapCacheGet(p.toString, st) match {
        case Some(s) => base = s
        case None =>
          val root = mapper.readTree(readFully(f, p))
          if (root.hasNonNull("base")) {
            val b = root.path("base").asLong()
            require(b < cur, s"manifest v$cur at $dir claims base v$b — " +
              "a base must be an earlier version")
            pending ::= (cur, root, st)
            cur = b
          } else {
            base = parseSnapshot(root)
            snapCachePut(p.toString, st, base)
          }
      }
    }
    // fold forward, oldest delta first
    var snap = base
    pending.foreach { case (v, root, st) =>
      require(snap.version == root.path("base").asLong(),
        s"delta v$v at $dir resolved against v${snap.version}, " +
          s"expected v${root.path("base").asLong()}")
      snap = applyDelta(snap, root)
      snapCachePut(manifestPath(dir, v).toString, st, snap)
    }
    snap
  }

  private def parseSnapshot(root: com.fasterxml.jackson.databind.JsonNode): Snapshot = {
    val files = (0 until root.path("files").size()).map(root.path("files").get(_).asText())
    val statsNode = root.path("stats")
    val stats = if (statsNode.isMissingNode) Map.empty[String, Map[String, ColStats]]
    else statsNode.properties().asScala.iterator.map { e =>
      e.getKey -> e.getValue.properties().asScala.iterator.map { c =>
        val v = c.getValue
        c.getKey -> ColStats(v.path("t").asText(),
          Option(v.get("min")).filterNot(_.isNull).map(_.asText()),
          Option(v.get("max")).filterNot(_.isNull).map(_.asText()),
          v.path("nulls").asLong())
      }.toMap
    }.toMap
    val rowsNode = root.path("rows")
    val rows = if (rowsNode.isMissingNode) Map.empty[String, Long]
    else rowsNode.properties().asScala.iterator
      .map(e => e.getKey -> e.getValue.asLong()).toMap
    val schemaNode = root.path("schema")
    val schema =
      if (schemaNode.isMissingNode) None
      else Some(org.apache.spark.sql.types.DataType.fromJson(schemaNode.asText())
        .asInstanceOf[StructType])
    val partsNode = root.path("parts")
    val parts = if (partsNode.isMissingNode) Map.empty[String, Map[String, String]]
    else partsNode.properties().asScala.iterator.map { e =>
      e.getKey -> e.getValue.properties().asScala.iterator
        .map(c => c.getKey -> c.getValue.asText()).toMap
    }.toMap
    val bloomsNode = root.path("blooms")
    val blooms = if (bloomsNode.isMissingNode) Map.empty[String, Map[String, BloomIndex]]
    else bloomsNode.properties().asScala.iterator.map { e =>
      e.getKey -> e.getValue.properties().asScala.iterator.map { c =>
        val v = c.getValue
        val raw = java.util.Base64.getDecoder.decode(v.path("b64").asText())
        val bb = java.nio.ByteBuffer.wrap(raw)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val words = new Array[Long](raw.length / 8)
        bb.asLongBuffer().get(words)
        c.getKey -> BloomIndex(v.path("m").asInt(), v.path("k").asInt(), words)
      }.toMap
    }.toMap
    val dvsNode = root.path("dvs")
    val dvs = if (dvsNode.isMissingNode) Map.empty[String, DvRef]
    else dvsNode.properties().asScala.iterator.map { e =>
      val v = e.getValue
      val fl = (0 until v.path("files").size())
        .map(v.path("files").get(_).asText())
      e.getKey -> DvRef(fl, v.path("deleted").asLong())
    }.toMap
    val sizesNode = root.path("sizes")
    val sizes = if (sizesNode.isMissingNode) Map.empty[String, Long]
    else sizesNode.properties().asScala.iterator
      .map(e => e.getKey -> e.getValue.asLong()).toMap
    val pcolsNode = root.path("partitionCols")
    val pcols = if (pcolsNode.isMissingNode) Nil
    else (0 until pcolsNode.size()).map(pcolsNode.get(_).asText())
    val propsNode = root.path("props")
    val props = if (propsNode.isMissingNode) Map.empty[String, String]
    else propsNode.properties().asScala.iterator
      .map(e => e.getKey -> e.getValue.asText()).toMap
    Snapshot(root.path("version").asLong(), files, root.path("op").asText(),
      stats, rows, schema, parts, blooms, dvs, sizes, pcols, props)
  }

  /** One file's complete per-file manifest metadata, as carried by a
    * delta's `add`/`patch` entries. REPLACE-ALL semantics per rel: an
    * entry states the file's entire metadata after the commit — an absent
    * field means the file has none (so a patch can both set and clear).
    */
  private final case class FileMeta(rel: String,
                                    stats: Option[Map[String, ColStats]],
                                    rows: Option[Long],
                                    size: Option[Long],
                                    parts: Option[Map[String, String]],
                                    blooms: Option[Map[String, BloomIndex]],
                                    dv: Option[DvRef])

  private def parseColStats(node: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, ColStats] =
    node.properties().asScala.iterator.map { c =>
      val v = c.getValue
      c.getKey -> ColStats(v.path("t").asText(),
        Option(v.get("min")).filterNot(_.isNull).map(_.asText()),
        Option(v.get("max")).filterNot(_.isNull).map(_.asText()),
        v.path("nulls").asLong())
    }.toMap

  private def parseBloomCols(node: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, BloomIndex] =
    node.properties().asScala.iterator.map { c =>
      val v = c.getValue
      val raw = java.util.Base64.getDecoder.decode(v.path("b64").asText())
      val bb = java.nio.ByteBuffer.wrap(raw)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val words = new Array[Long](raw.length / 8)
      bb.asLongBuffer().get(words)
      c.getKey -> BloomIndex(v.path("m").asInt(), v.path("k").asInt(), words)
    }.toMap

  private def parseFileMeta(e: com.fasterxml.jackson.databind.JsonNode): FileMeta =
    FileMeta(e.path("f").asText(),
      stats = Option(e.get("stats")).map(parseColStats),
      rows = Option(e.get("rows")).map(_.asLong()),
      size = Option(e.get("size")).map(_.asLong()),
      parts = Option(e.get("parts")).map(_.properties().asScala.iterator
        .map(c => c.getKey -> c.getValue.asText()).toMap),
      blooms = Option(e.get("blooms")).map(parseBloomCols),
      dv = Option(e.get("dv")).map { v =>
        DvRef((0 until v.path("files").size())
          .map(v.path("files").get(_).asText()), v.path("deleted").asLong())
      })

  /** Apply a DELTA manifest body to the snapshot it was computed against.
    * `remove` drops files (and all their per-file metadata); `add`
    * appends new files IN ORDER with their metadata; `patch` replaces a
    * SURVIVING file's metadata wholesale (dv appends, bloom builds).
    * Schema/partitionCols/props are recorded in full in every delta (they
    * are small and commit-scoped rules like props-compose already applied
    * on the write side), so they come from the delta alone.
    */
  private def applyDelta(base: Snapshot,
                         root: com.fasterxml.jackson.databind.JsonNode): Snapshot = {
    val rm = root.path("remove")
    val removed = (0 until rm.size()).map(rm.get(_).asText()).toSet
    def entries(name: String): Seq[FileMeta] = {
      val n = root.path(name)
      (0 until n.size()).map(i => parseFileMeta(n.get(i)))
    }
    val adds = entries("add")
    val patches = entries("patch")
    val files = base.files.filterNot(removed) ++ adds.map(_.rel)
    def upd[T](baseMap: Map[String, T], get: FileMeta => Option[T]): Map[String, T] = {
      var m = if (removed.isEmpty) baseMap else baseMap -- removed
      (adds.iterator ++ patches.iterator).foreach { e =>
        get(e) match {
          case Some(v) => m = m.updated(e.rel, v)
          case None => m -= e.rel
        }
      }
      m
    }
    val schemaNode = root.path("schema")
    val schema =
      if (schemaNode.isMissingNode) None
      else Some(org.apache.spark.sql.types.DataType.fromJson(schemaNode.asText())
        .asInstanceOf[StructType])
    val pcolsNode = root.path("partitionCols")
    val pcols = if (pcolsNode.isMissingNode) Nil
    else (0 until pcolsNode.size()).map(pcolsNode.get(_).asText())
    val propsNode = root.path("props")
    val props = if (propsNode.isMissingNode) Map.empty[String, String]
    else propsNode.properties().asScala.iterator
      .map(e => e.getKey -> e.getValue.asText()).toMap
    Snapshot(root.path("version").asLong(), files, root.path("op").asText(),
      stats = upd(base.stats, _.stats), rows = upd(base.rows, _.rows),
      schema = schema, parts = upd(base.parts, _.parts),
      blooms = upd(base.blooms, _.blooms), dvs = upd(base.dvs, _.dv),
      sizes = upd(base.sizes, _.size), partitionCols = pcols, props = props,
      deltaChain = base.deltaChain + 1)
  }

  /** Delta-chain cap: a commit whose previous snapshot already carries
    * this many deltas writes a FULL manifest (checkpoint) instead. Per-
    * table override via the `graft.checkpoint.interval` property. The
    * trade: commit metadata cost drops from ∝ total table files to
    * ∝ touched files for interval−1 of every interval commits, while a
    * cold read pays at most one checkpoint parse + interval−1 small
    * deltas (the warm path pays neither — the snapshot cache serves the
    * base).
    */
  private[sources] val checkpointIntervalProp = "graft.checkpoint.interval"
  private def checkpointInterval(props: Map[String, String]): Int =
    props.get(checkpointIntervalProp)
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .map(v => math.max(1, math.min(10000, v))).getOrElse(20)

  /** The latest version under the manifest-recorded schema — the
    * self-describing read: no caller-supplied StructType, pre-evolution
    * files null-fill the widened columns. Fails only when the table is
    * empty or predates schema recording (older writer) — then the caller
    * must know the schema and use [[read]].
    */
  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val snap = currentSnapshot(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed version at $dir"))
    val schema = snap.schema.getOrElse(throw new IllegalStateException(
      s"manifest v${snap.version} at $dir records no schema (older writer) — " +
        "use read(spark, dir, schema)"))
    readSnapshot(spark, dir, snap, schema)
  }

  /** DataFrame of the latest version (empty frame with `schema` if none). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    currentSnapshot(spark, dir) match {
      case Some(s) => readSnapshot(spark, dir, s, schema)
      case None => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }

  /** The file subset of `snap` that can contain rows with
    * `column ∈ [lo, hi]` — manifest-stats data skipping. A file is kept
    * unless its recorded bounds PROVE it disjoint from the range; missing
    * stats keep the file (safe, never wrong). `lo`/`hi` are compared in
    * the column's primitive stat space: pass Long/Int for `long` columns
    * (timestamps: microseconds since epoch), Double for `double`, String
    * for `string`.
    *
    * A file carrying an explicit PARTITION value for `column`
    * ([[appendPartitioned]]) is decided by that value alone — exact
    * min = max knowledge recorded at the metadata layer, so whole
    * partitions prune even when footer stats are absent (oversized string
    * bounds, stat-less writers). A null-partition file
    * (`__HIVE_DEFAULT_PARTITION__`) is always kept — conservative, never
    * wrong.
    */
  def pruneFiles(snap: Snapshot, column: String, lo: Any, hi: Any): Seq[String] =
    pruneFilesPhys(snap, physFor(snap, column), lo, hi)

  /** [[pruneFiles]] in PHYSICAL column currency — what the scan-side
    * planners call ([[ManifestFileIndex.listFiles]]'s filters reference
    * the physical scan output; public entry points translate logical →
    * physical once and delegate here). On unmapped tables the two
    * currencies coincide and the public forms are pure pass-throughs.
    */
  private[sources] def pruneFilesPhys(snap: Snapshot, column: String,
                                      lo: Any, hi: Any): Seq[String] =
    snap.files.filter { rel =>
      partitionAdmits(snap, rel, column, lo, hi).getOrElse {
        statsAdmit(snap, rel, column, lo, hi)
      } && transformAdmits(snap, rel, column, lo, hi) &&
        bloomAdmits(snap, rel, column, lo, hi)
    }

  /** Logical column → the name recorded in file-level metadata. */
  private def physFor(snap: Snapshot, column: String): String =
    snap.schema.map(s => ColumnMapping.physFor(s, column)).getOrElse(column)

  /** The file subset that can satisfy EVERY range of a conjunctive
    * predicate (`column ∈ [lo, hi]` per entry) — the composite planner for
    * the commonest real scan shape (partition + time range + key range):
    * a file survives only if every range admits it, each decided by its
    * partition value when recorded, else footer stats.
    */
  def pruneFilesWhere(snap: Snapshot, ranges: Seq[(String, Any, Any)]): Seq[String] =
    pruneFilesWherePhys(snap,
      snap.schema.map(s => ColumnMapping.physRanges(s, ranges)).getOrElse(ranges))

  /** [[pruneFilesWhere]] in physical currency (see [[pruneFilesPhys]]). */
  private[sources] def pruneFilesWherePhys(snap: Snapshot,
                                           ranges: Seq[(String, Any, Any)]): Seq[String] =
    snap.files.filter { rel =>
      ranges.forall { case (column, lo, hi) =>
        (partitionAdmits(snap, rel, column, lo, hi)
          .getOrElse(statsAdmit(snap, rel, column, lo, hi))) &&
          transformAdmits(snap, rel, column, lo, hi) &&
          bloomAdmits(snap, rel, column, lo, hi)
      }
    }

  /** Bloom evidence for a POINT predicate (`lo` and `hi` canonicalize to
    * the same value): a file whose bloom proves the value absent is
    * dropped. Ranges, files without a bloom for `column`, and types
    * blooms don't cover all admit — independent, conjunctive evidence on
    * top of partition values and footer stats, never a replacement.
    */
  private def bloomAdmits(snap: Snapshot, rel: String, column: String,
                          lo: Any, hi: Any): Boolean =
    snap.blooms.get(rel).flatMap(_.get(column)) match {
      case None => true
      case Some(b) => canonicalProbe(snap, column, lo) match {
        case Some(c) if canonicalProbe(snap, column, hi).contains(c) =>
          b.contains(c)
        case _ => true
      }
    }

  /** The probe value's canonical string in the repo's portable-md5 space:
    * integral columns render as the decimal string `CAST(col AS STRING)`
    * produces (probe Ints/Timestamps coerce through [[toLong]] first, the
    * same coercion the stat pruners use), strings are themselves. `None`
    * for column types blooms don't cover — the caller must keep the file.
    */
  private def canonicalProbe(snap: Snapshot, column: String, v: Any): Option[String] =
    if (v == Unbounded) None // open bound: no point probe, keep the file
    else snap.schema.flatMap(_.fields.find(f =>
        ColumnMapping.physicalName(f) == column)) // physical currency here
      .flatMap(_.dataType.typeName match {
        case "long" | "integer" | "short" | "byte" =>
          scala.util.Try(toLong(v).toString).toOption
        case "string" => Some(v.toString)
        case _ => None
      })

  /** Conjunctive range read: scans only the files [[pruneFilesWhere]]
    * keeps, then applies the exact row-level conjunction — identical
    * results to a full scan + filter, minus the I/O for every file some
    * range proves irrelevant.
    */
  def scanWhere(spark: SparkSession, dir: String, schema: StructType,
                ranges: Seq[(String, Any, Any)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    currentSnapshot(spark, dir) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some(s) =>
        val kept = pruneFilesWhere(s, ranges)
        ranges.foldLeft(readSnapshot(spark, dir, s.copy(files = kept), schema)) {
          case (df, (column, lo, hi)) =>
            val withLo = if (lo == Unbounded) df else df.filter(col(column) >= lit(lo))
            if (hi == Unbounded) withLo else withLo.filter(col(column) <= lit(hi))
        }
    }
  }

  /** Some(decision) when `rel` records a partition value for `column`;
    * None → fall through to footer stats. Values compare in the TABLE
    * SCHEMA's primitive space (the schema travels in the manifest).
    */
  private def partitionAdmits(snap: Snapshot, rel: String, column: String,
                              lo: Any, hi: Any): Option[Boolean] =
    snap.parts.get(rel).flatMap(_.get(column)).map { v =>
      if (v == hiveNullPartition) true // null matches nothing provable: keep
      else snap.schema.flatMap(s => s.fields.find(f =>
          ColumnMapping.physicalName(f) == column))
        .map(_.dataType.typeName) match {
        case Some("long" | "integer" | "short" | "byte") =>
          (lo == Unbounded || v.toLong >= toLong(lo)) &&
            (hi == Unbounded || v.toLong <= toLong(hi))
        case Some("string") =>
          (lo == Unbounded || !utf8Lt(v, lo.toString)) &&
            (hi == Unbounded || !utf8Lt(hi.toString, v)) // lo <= v <= hi
        case _ => true // unknown partition type: keep, never wrong
      }
    }

  /** HIDDEN-PARTITION-TRANSFORM evidence for a range probe on `column`:
    * a file whose recorded `days(column)` / `hours(column)` value lies
    * outside the transformed probe range — or whose `bucket(n, column)`
    * value differs from the probe value's bucket on a POINT probe — is
    * dropped. Conjunctive with (never a replacement for) footer stats
    * and identity partition values; files without a transform entry for
    * `column`, null partitions, and unparseable values all admit (safe).
    * Monotonic transforms (days/hours/months/years, integral/string
    * truncate) translate range endpoints exactly:
    * lo ≤ x ≤ hi ⇒ t(lo) ≤ t(x) ≤ t(hi).
    */
  private def transformAdmits(snap: Snapshot, rel: String, column: String,
                              lo: Any, hi: Any): Boolean =
    snap.parts.get(rel).forall(_.forall { case (k, v) =>
      val sp = PartitionSpec.parse(k)
      if (sp.isIdentity || sp.col != column || v == hiveNullPartition) true
      else {
        val dt = snap.schema.flatMap(_.fields.find(f =>
          ColumnMapping.physicalName(f) == column)).map(_.dataType)
        val rec = scala.util.Try(v.toLong).toOption
        (sp.kind, dt, rec) match {
          case (PartitionSpec.Days | PartitionSpec.Hours |
                PartitionSpec.Months | PartitionSpec.Years, Some(d), Some(r))
              if d == org.apache.spark.sql.types.TimestampType ||
                d == org.apache.spark.sql.types.DateType =>
            def ord(x: Any): Option[Long] =
              scala.util.Try(PartitionSpec.probeOrd(sp, d, toLong(x))).toOption
            (lo == Unbounded || ord(lo).forall(r >= _)) &&
              (hi == Unbounded || ord(hi).forall(r <= _))
          case (PartitionSpec.Bucket(n), _, Some(r))
              if lo != Unbounded && hi != Unbounded =>
            canonicalProbe(snap, column, lo) match {
              case Some(c) if canonicalProbe(snap, column, hi).contains(c) =>
                r == PartitionSpec.bucketOf(c, n)
              case _ => true // range probe: buckets carry no order
            }
          case (PartitionSpec.Truncate(w),
                Some(org.apache.spark.sql.types.StringType), _) =>
            // monotonic on strings: x ≤ y ⇒ prefix_w(x) ≤ prefix_w(y),
            // so truncate(lo) ≤ recorded-prefix ≤ truncate(hi)
            def pfx(x: Any): String = PartitionSpec.truncateStr(x.toString, w)
            (lo == Unbounded || !utf8Lt(v, pfx(lo))) &&
              (hi == Unbounded || !utf8Lt(pfx(hi), v))
          case (PartitionSpec.Truncate(_), Some(d), Some(r))
              if Set("long", "integer", "short", "byte")(d.typeName) =>
            // monotonic interval floor: floorDiv(x, w)·w
            def ord(x: Any): Option[Long] =
              scala.util.Try(PartitionSpec.probeOrd(sp, d, toLong(x))).toOption
            (lo == Unbounded || ord(lo).forall(r >= _)) &&
              (hi == Unbounded || ord(hi).forall(r <= _))
          case _ => true
        }
      }
    })

  /** [[partitionWhollyIn]] for transform partitions: a recorded
    * `days`/`hours` value `r` proves every row's source column lies in
    * `[r·unit, (r+1)·unit)` (DATE days: exactly day `r`; months/years:
    * the calendar interval `[start(r), start(r+1))`), so the file is
    * wholly inside `[lo, hi]` iff that interval is — AND proves the
    * source column null-free (a null derives null and lands in the hive
    * default partition, never here). Buckets prove nothing (collisions).
    */
  private def transformWhollyIn(snap: Snapshot, rel: String, column: String,
                                lo: Any, hi: Any): Boolean =
    snap.parts.get(rel).exists(_.exists { case (k, v) =>
      val sp = PartitionSpec.parse(k)
      sp.col == column && !sp.isIdentity && v != hiveNullPartition && {
        val dt = snap.schema.flatMap(_.fields.find(f =>
          ColumnMapping.physicalName(f) == column)).map(_.dataType)
        val rec = scala.util.Try(v.toLong).toOption
        (sp.kind, dt, rec) match {
          case (PartitionSpec.Days, Some(org.apache.spark.sql.types.DateType),
                Some(r)) =>
            scala.util.Try(
              (lo == Unbounded || r >= toLong(lo)) &&
                (hi == Unbounded || r <= toLong(hi))).getOrElse(false)
          case (PartitionSpec.Months | PartitionSpec.Years,
                Some(org.apache.spark.sql.types.DateType), Some(r)) =>
            // r proves every row's day in [start(r), start(r+1)); the
            // calendar inverse throws on domain overflow → Try → false.
            scala.util.Try {
              def start(i: Long): Long =
                if (sp.kind == PartitionSpec.Months)
                  PartitionSpec.monthStartEpochDay(i)
                else PartitionSpec.yearStartEpochDay(i)
              (lo == Unbounded || start(r) >= toLong(lo)) &&
                (hi == Unbounded ||
                  Math.subtractExact(start(Math.addExact(r, 1L)), 1L) <=
                    toLong(hi))
            }.getOrElse(false)
          case (PartitionSpec.Months | PartitionSpec.Years,
                Some(org.apache.spark.sql.types.TimestampType), Some(r)) =>
            // same proof in micros: [start(r)·day, start(r+1)·day − 1].
            scala.util.Try {
              def startUs(i: Long): Long = Math.multiplyExact(
                if (sp.kind == PartitionSpec.Months)
                  PartitionSpec.monthStartEpochDay(i)
                else PartitionSpec.yearStartEpochDay(i),
                PartitionSpec.MicrosPerDay)
              (lo == Unbounded || startUs(r) >= toLong(lo)) &&
                (hi == Unbounded ||
                  Math.subtractExact(startUs(Math.addExact(r, 1L)), 1L) <=
                    toLong(hi))
            }.getOrElse(false)
          case (PartitionSpec.Days | PartitionSpec.Hours,
                Some(org.apache.spark.sql.types.TimestampType), Some(r)) =>
            val unit = if (sp.kind == PartitionSpec.Days)
              PartitionSpec.MicrosPerDay else PartitionSpec.MicrosPerHour
            // exact ops: plain Long * / + wrap SILENTLY, so the Try would
            // never fire and a recorded value near the micros domain edge
            // would falsely prove containment → metadata-dropping a file
            // with surviving rows. Math.*Exact throws → Try → false
            // (unprovable), the stated conservative contract.
            scala.util.Try(
              (lo == Unbounded ||
                Math.multiplyExact(r, unit) >= toLong(lo)) &&
                (hi == Unbounded ||
                  Math.subtractExact(Math.multiplyExact(
                    Math.addExact(r, 1L), unit), 1L) <= toLong(hi)))
              .getOrElse(false)
          case (PartitionSpec.Truncate(w), Some(d), Some(r))
              if Set("long", "integer", "short", "byte")(d.typeName) =>
            // r proves every row in [r, r+w-1] and the column null-free;
            // string truncate proves only a PREFIX (no finite upper
            // bound on the strings sharing it) — strings stay false.
            // addExact: a truncate partition over hash-like bigints can
            // record r near Long.MaxValue, where r+w-1 wraps negative
            // and would falsely prove containment.
            scala.util.Try(
              (lo == Unbounded || r >= toLong(lo)) &&
                (hi == Unbounded ||
                  Math.addExact(r, (w - 1).toLong) <= toLong(hi)))
              .getOrElse(false)
          case _ => false
        }
      }
    })

  /** True iff `rel` records a non-null partition value for `column` that
    * PROVABLY lies inside `[lo, hi]` — the whole-file-covered proof for
    * delete planning. Unprovable (unknown type, missing schema, null
    * partition) is false: never drop without proof.
    */
  private def partitionWhollyIn(snap: Snapshot, rel: String, column: String,
                                lo: Any, hi: Any): Boolean =
    snap.parts.get(rel).flatMap(_.get(column)).exists { v =>
      v != hiveNullPartition &&
        (snap.schema.flatMap(_.fields.find(f =>
            ColumnMapping.physicalName(f) == column))
          .map(_.dataType.typeName) match {
          case Some("long" | "integer" | "short" | "byte") =>
            (lo == Unbounded || v.toLong >= toLong(lo)) &&
              (hi == Unbounded || v.toLong <= toLong(hi))
          case Some("string") =>
            (lo == Unbounded || !utf8Lt(v, lo.toString)) &&
              (hi == Unbounded || !utf8Lt(hi.toString, v))
          case _ => false
        })
    }

  /** True iff `rel`'s FOOTER stats prove every row's `column` lies inside
    * `[lo, hi]` AND the column is null-free in the file — the stat-space
    * whole-file-covered proof ([[partitionWhollyIn]]'s sibling, for
    * key-CLUSTERED tables: `DELETE WHERE day <= cutoff` drops whole
    * files of a day-clustered lake with zero scan). The null-free demand
    * is load-bearing: min/max say nothing about null rows, which do NOT
    * match a range predicate and must not be dropped with the file. Long
    * and string stat spaces only — double stat ordering around NaN/−0.0
    * is not worth trusting for an irreversible drop. Unprovable = false.
    */
  private def statsWhollyIn(snap: Snapshot, rel: String, column: String,
                            lo: Any, hi: Any): Boolean =
    snap.stats.get(rel).flatMap(_.get(column)).exists(_.nullCount == 0L) &&
      (snap.typedStats.get(rel).flatMap(_.get(column)) match {
        case Some(("long", mn: Long, mx: Long)) =>
          scala.util.Try((lo == Unbounded || mn >= toLong(lo)) &&
            (hi == Unbounded || mx <= toLong(hi))).getOrElse(false)
        case Some(("string", mn: String, mx: String)) =>
          (lo == Unbounded || !utf8Lt(mn, lo.toString)) && // mn >= lo
            (hi == Unbounded || !utf8Lt(hi.toString, mx)) // mx <= hi
        case _ => false
      })

  private def statsAdmit(snap: Snapshot, rel: String, column: String,
                         lo: Any, hi: Any): Boolean =
      snap.typedStats.get(rel).flatMap(_.get(column)) match {
        // each side checks independently; Unbounded admits its side
        case Some(("long", mn: Long, mx: Long)) =>
          (hi == Unbounded || mn <= toLong(hi)) &&
            (lo == Unbounded || mx >= toLong(lo))
        case Some(("double", mn: Double, mx: Double)) =>
          (hi == Unbounded || mn <= toDouble(hi)) &&
            (lo == Unbounded || mx >= toDouble(lo))
        case Some(("string", mn: String, mx: String)) =>
          (hi == Unbounded || !utf8Lt(hi.toString, mn)) && // mn <= hi
            (lo == Unbounded || !utf8Lt(mx, lo.toString))  // lo <= mx
        case _ => true
      }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    case d: java.sql.Date => d.toLocalDate.toEpochDay // DATE stat space
    case other => other.toString.toLong
  }

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case other => other.toString.toDouble
  }

  /** Range read with manifest-stats file skipping: scans only the files
    * [[pruneFiles]] keeps, then applies the exact row-level `[lo, hi]`
    * filter — identical results to a full scan + filter, minus the I/O for
    * files the manifest proves irrelevant. On a timestamp column pass
    * `java.sql.Timestamp` bounds (pruned via their microsecond encoding).
    * This is the scan shape a 100 TB time-ordered state table needs:
    * incremental consumers read "rows since the watermark" and skip every
    * file the bounds rule out — commit-time-clustered tables prune to the
    * newest few files without any partitioning scheme.
    */
  def rangeScan(spark: SparkSession, dir: String, schema: StructType,
                column: String, lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    currentSnapshot(spark, dir) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some(s) =>
        val kept = pruneFiles(s, column, lo, hi)
        val base = readSnapshot(spark, dir, s.copy(files = kept), schema)
        val withLo = if (lo == Unbounded) base else base.filter(col(column) >= lit(lo))
        if (hi == Unbounded) withLo else withLo.filter(col(column) <= lit(hi))
    }
  }

  /** The file subset that can contain ANY of `values` in `column` — the
    * point-lookup companion of [[pruneFiles]]: each value keeps only files
    * whose bounds admit it, and the union over values is the scan set. On
    * a key-clustered table (zorderCols compaction, commit-time clustering)
    * this is how `key IN (...)` fetches touch a handful of files instead
    * of the lake. Missing stats keep a file — safe, never wrong.
    */
  def pruneFilesIn(snap: Snapshot, column: String, values: Seq[Any]): Seq[String] =
    pruneFilesInPhys(snap, physFor(snap, column), values)

  /** [[pruneFilesIn]] in physical currency (see [[pruneFilesPhys]]). */
  private[sources] def pruneFilesInPhys(snap: Snapshot, column: String,
                                        values: Seq[Any]): Seq[String] =
    values.flatMap(v => pruneFilesPhys(snap, column, v, v)).distinct

  /** Point-lookup read: rows whose `column` equals one of `values`,
    * scanning only the files [[pruneFilesIn]] keeps. Results are identical
    * to a full scan + IN-filter, minus the pruned I/O.
    */
  def lookup(spark: SparkSession, dir: String, schema: StructType,
             column: String, values: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    currentSnapshot(spark, dir) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some(s) =>
        val kept = pruneFilesIn(s, column, values)
        readSnapshot(spark, dir, s.copy(files = kept), schema)
          .filter(col(column).isin(values.map(lit): _*))
    }
  }

  /** [[pruneFilesIn]] for a LARGE integral probe set — the batched planner
    * behind index-admission reads, where one batch probes thousands of
    * keys at once and the per-value × per-file walk above would cost
    * |values|·|files| driver work. Each evidence kind is consulted ONCE
    * per file with any-of semantics (a file survives unless an evidence
    * kind proves EVERY probe value absent):
    *  - identity partition value: recorded v ∈ probe set;
    *  - `bucket(n)` / integral `truncate(w)` transform value: recorded
    *    ordinal ∈ the probe set's transformed ordinals (precomputed once
    *    per declared spec);
    *  - manifest min-max stats: some probe value ∈ [min, max] (one binary
    *    search over the sorted probe set).
    * Any-of is deliberately one step weaker than the exact
    * OR-of-per-value-conjunctions (a file could pass stats on one value
    * and partition evidence on another) — weaker only ever KEEPS extra
    * files, at O(|files|·log|values|) instead of O(|files|·|values|).
    * Empty probe sets and non-integral columns keep every file: the
    * caller's row-level equality join stays the single source of truth,
    * this planner only shrinks its I/O.
    */
  def pruneFilesAnyOf(snap: Snapshot, column: String,
                      values: Array[Long]): Seq[String] = {
    if (values.isEmpty) return snap.files
    val phys = physFor(snap, column)
    val integral = snap.schema.flatMap(_.fields.find(f =>
        ColumnMapping.physicalName(f) == phys))
      .exists(f => Set("long", "integer", "short", "byte")(f.dataType.typeName))
    if (!integral) return snap.files
    val sorted = values.distinct.sorted
    def containsValue(v: Long): Boolean =
      java.util.Arrays.binarySearch(sorted, v) >= 0
    // transformed probe-ordinal set per declared transform spec, computed
    // once (specs repeat across every file of a generation)
    val ordCache = scala.collection.mutable.Map.empty[String, Option[java.util.HashSet[java.lang.Long]]]
    def ordsFor(specStr: String, sp: PartitionSpec.Spec): Option[java.util.HashSet[java.lang.Long]] =
      ordCache.getOrElseUpdate(specStr, sp.kind match {
        case PartitionSpec.Bucket(n) =>
          val s = new java.util.HashSet[java.lang.Long]()
          sorted.foreach(v => s.add(PartitionSpec.bucketOf(v.toString, n)))
          Some(s)
        case PartitionSpec.Truncate(w) =>
          val s = new java.util.HashSet[java.lang.Long]()
          sorted.foreach(v => s.add(Math.floorDiv(v, w.toLong) * w))
          Some(s)
        case _ => None // identity handled inline; calendar: not integral
      })
    snap.files.filter { rel =>
      val partOk = snap.parts.get(rel).forall(_.forall { case (k, v) =>
        val sp = scala.util.Try(PartitionSpec.parse(k)).getOrElse(
          PartitionSpec.Spec(PartitionSpec.Identity, k))
        if (sp.col != phys || v == hiveNullPartition) true
        else if (sp.isIdentity)
          scala.util.Try(v.toLong).toOption.forall(containsValue)
        else ordsFor(k, sp) match {
          case Some(ords) =>
            scala.util.Try(v.toLong).toOption.forall(ords.contains)
          case None => true
        }
      })
      val statOk = snap.typedStats.get(rel).flatMap(_.get(phys)) match {
        case Some(("long", mn: Long, mx: Long)) =>
          val i = java.util.Arrays.binarySearch(sorted, mn)
          val from = if (i >= 0) i else -i - 1
          from < sorted.length && sorted(from) <= mx
        case _ => true
      }
      partOk && statOk
    }
  }

  /** Read restricted to [[pruneFilesAnyOf]]'s kept files — a SUPERSET
    * read (kept files may hold non-probe rows): the caller's equality
    * join / semi filter supplies the exact row predicate. This is the
    * scan shape index admission wants — metadata shrinks the I/O, the
    * join stays the row-level truth — so unlike [[lookup]] no `isin`
    * filter is attached (a million-key `isin` would not codegen).
    */
  def readAnyOf(spark: SparkSession, dir: String, schema: StructType,
                column: String, values: Array[Long]): DataFrame =
    currentSnapshot(spark, dir) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some(s) =>
        readSnapshot(spark, dir,
          s.copy(files = pruneFilesAnyOf(s, column, values)), schema)
    }

  /** Build per-file [[BloomIndex]]es for `columns` and commit them as a
    * metadata-only version (op = `bloom`, no data files written) — the
    * maintenance pass that makes `key = v` lookups on an UNCLUSTERED table
    * prune files the way min/max stats never can (every append covering
    * the key space admits every file by range). INCREMENTAL: only files
    * missing a bloom for some requested column are scanned — the steady-
    * state cost after each append batch is one scan of that batch's files,
    * independent of table size (the same admission discipline as the
    * near-dup index). Rewritten files (compaction, MERGE) drop their
    * blooms and are picked up by the next pass.
    *
    * Sizing: one shared bit width per pass — the next power of two ≥
    * `bitsPerKey ×` the largest scanned file's row count, clamped to
    * [256, 2^20] bits (≤ 128 KiB per file·column in the manifest; at the
    * 10 bits/key default the false-positive rate is ~1%, degrading
    * gracefully if a file outgrows the clamp). The driver materializes
    * ≤ files × columns × bits/64 bitset words from the build scan —
    * metadata-bounded control plane, like the footer-stats harvest; a
    * bulk backfill over millions of files should batch by file range.
    *
    * Columns must be integral or string (the canonical-string hash
    * space); rows with a NULL value hash nothing — a value probe can
    * never match a null row. Returns the committed version (the current
    * one if every file already has its blooms).
    */
  def buildBlooms(spark: SparkSession, dir: String, columns: Seq[String],
                  bitsPerKey: Int = 10): Long = {
    import org.apache.spark.sql.functions._
    require(columns.nonEmpty, "buildBlooms needs at least one column")
    val snap = currentSnapshot(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed version at $dir"))
    val schema = snap.schema.getOrElse(throw new IllegalStateException(
      s"manifest v${snap.version} at $dir records no schema — blooms need it"))
    columns.foreach { c =>
      val t = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no column '$c' in table schema"))
        .dataType.typeName
      require(Set("long", "integer", "short", "byte", "string")(t),
        s"bloom column '$c' must be integral or string (got $t)")
    }
    // blooms key by PHYSICAL column (file-level artifact, immune to
    // renames); user columns arrive logical and translate once here
    val physCols = columns.map(c => ColumnMapping.physFor(schema, c))
    val todo = snap.files.filterNot(rel =>
      physCols.forall(c => snap.blooms.get(rel).exists(_.contains(c))))
    if (todo.isEmpty) return snap.version
    // rows map back to manifest entries by parquet file NAME (globally
    // unique: every commit writes under a fresh d-<nonce>/ prefix and part
    // files carry task UUIDs) — immune to URI-escaping drift between
    // input_file_name() and the manifest's hive-escaped relative paths
    val nameToRel = todo.map(rel => rel.substring(rel.lastIndexOf('/') + 1) -> rel).toMap
    require(nameToRel.size == todo.size,
      s"duplicate parquet file names across $dir — cannot key blooms by name")
    val maxRows = todo.flatMap(snap.rows.get).foldLeft(1L)(math.max)
    val k = 5
    var bits = 256
    while (bits < bitsPerKey.toLong * maxRows && bits < (1 << 20)) bits <<= 1
    val paths = todo.map(new Path(dir, _).toString)
    val base = spark.read.schema(ColumnMapping.physicalSchema(schema))
      .parquet(paths: _*)
      .withColumn("__file", substring_index(input_file_name(), "/", -1))
    // one md5 per (row, column); k 24-bit slices of the hex are the k
    // bit positions — the identical derivation BloomIndex.contains probes
    val hashed = physCols.map { c =>
      base.filter(col(c).isNotNull)
        .select(col("__file"), lit(c).as("__col"),
          md5(col(c).cast("string")).as("__h"))
    }.reduce(_ union _)
    val wordRows = hashed
      .select(col("__file"), col("__col"),
        explode(array((0 until k).map(lit): _*)).as("__i"), col("__h"))
      .select(col("__file"), col("__col"),
        (conv(expr("substring(__h, __i * 6 + 1, 6)"), 16, 10)
          .cast("long") % bits).as("__pos"))
      .groupBy(col("__file"), col("__col"),
        expr("CAST(__pos DIV 64 AS INT)").as("__w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(__pos % 64 AS INT)))").as("__word"))
      .collect()
    val acc = scala.collection.mutable.Map[(String, String), Array[Long]]()
    wordRows.foreach { r =>
      val rel = nameToRel(r.getString(0))
      val arr = acc.getOrElseUpdate((rel, r.getString(1)), new Array[Long](bits / 64))
      arr(r.getInt(2)) |= r.getLong(3)
    }
    // ship ONLY the freshly-built columns; publishLoop merges them into
    // each file's existing per-column map against the snapshot CURRENT at
    // publish time (not this stale planning one), so concurrent bloom
    // builds on other columns compose. A scanned file with no rows for a
    // column gets the all-zero bloom (provably contains nothing — prunes
    // every probe, correctly)
    val fresh = todo.map { rel =>
      rel -> physCols.map(c =>
        c -> BloomIndex(bits, k,
          acc.getOrElse((rel, c), new Array[Long](bits / 64)))).toMap
    }.toMap
    publishLoop(spark, dir, "bloom", Nil, (prev, _) => prev,
      freshBlooms = fresh)
  }

  /** Time travel: the table exactly as of `version`. */
  def readVersion(spark: SparkSession, dir: String, version: Long,
                  schema: StructType): DataFrame =
    readSnapshot(spark, dir, readManifest(spark, dir, version), schema)

  /** DESCRIBE HISTORY: one row per committed version still on disk —
    * (version, op, commit wall-clock millis from the manifest's publish
    * instant, file count, exact live row count when every file recorded
    * one — tombstones subtracted — else null, total tombstoned rows).
    * Driver-side metadata only (one JSON read per manifest, no Spark
    * jobs); versions whose manifests were vacuumed are absent, half-
    * written manifests skipped — the audit surface for "what happened to
    * this table and when".
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    val rows: Seq[(Long, String, Long, Int, Option[Long], Long)] =
      if (!f.exists(md)) Nil
      else f.listStatus(md).toSeq.flatMap { s =>
        s.getPath.getName match {
          case manifestName(v) => scala.util.Try {
            val snap = readManifest(spark, dir, v.toLong)
            val deleted = snap.files.flatMap(snap.dvs.get).map(_.deleted).sum
            val nRows =
              if (snap.files.forall(snap.rows.contains))
                Some(snap.files.map(snap.rows).sum - deleted)
              else None
            (snap.version, snap.op, s.getModificationTime,
              snap.files.size, nRows, deleted)
          }.toOption
          case _ => None
        }
      }.sortBy(_._1)
    rows.toDF("version", "op", "commit_ms", "n_files", "n_rows", "n_dv_deleted")
  }

  /** ROLL BACK the table to `version` — as a NEW commit whose manifest
    * re-references that snapshot's files, stats, partition values, blooms
    * and deletion vectors verbatim (Delta's RESTORE): no data moves, the
    * rolled-back versions stay time-travelable, and [[changes]] reports
    * the restore as the exact row-level diff between the current and
    * restored states (an incremental consumer follows a rollback like any
    * other commit). Only meaningful within the vacuum retention or under
    * a tag pin: vacuum may already have collected a dropped version's
    * data files even though its manifest parses. Returns the new version.
    */
  def restore(spark: SparkSession, dir: String, version: Long): Long = {
    val snap = readManifest(spark, dir, version)
    // OCC: pin the version observed when the restore was planned. If a
    // concurrent append/delete claims the next slot first, republishing
    // the planned file list would silently discard that commit's rows —
    // abort loudly instead (same discipline as compact/deleteWhere).
    val cur = currentSnapshot(spark, dir)
    val planned = math.max(maxClaimedVersion(fs(spark, dir), dir),
      cur.map(_.version).getOrElse(0L))
    // restore restores DATA; the declared partition columns (immutable
    // since create) and the CURRENT property bag carry forward — wiping
    // either on a data rollback would be a silent metadata loss
    publishExternal(spark, dir, op = s"restore:$version", files = snap.files,
      stats = snap.stats, rows = snap.rows, schema = snap.schema,
      parts = snap.parts, blooms = snap.blooms, dvs = snap.dvs,
      firstVersionOnly = false, expectVersion = Some(planned + 1),
      sizes = snap.sizes,
      partitionCols = cur.map(_.partitionCols).getOrElse(snap.partitionCols),
      props = cur.map(_.props).getOrElse(snap.props))
  }

  /** Metadata-only `COUNT(*)`: the table's exact row count from the
    * manifest's per-file counts — zero data I/O, zero Spark jobs. `None`
    * when any current file predates row-count recording (an append through
    * an older writer): the honest answer is "unknown", never a partial sum.
    * The Delta/Iceberg metadata-query fast path; at 100 TB this turns the
    * most common sanity query from a full scan into one JSON read.
    */
  def countRows(spark: SparkSession, dir: String): Option[Long] =
    currentSnapshot(spark, dir).flatMap { s =>
      if (s.files.forall(s.rows.contains))
        Some(s.files.map(r =>
          s.rows(r) - s.dvs.get(r).map(_.deleted).getOrElse(0L)).sum)
      else None
    }

  /** Time travel by wall clock: the newest version whose manifest was
    * published at or before `tsMillis` (epoch millis), `None` if the table
    * had no committed version yet. Based on manifest modification times —
    * the publish instant on local FS and HDFS, the PUT time on object
    * stores; like Delta's `timestampAsOf`, it inherits the store's clock,
    * so cross-writer skew blurs at clock-resolution, never corrupts (the
    * returned version is always a real committed snapshot).
    */
  def versionAsOf(spark: SparkSession, dir: String, tsMillis: Long): Option[Long] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) return None
    f.listStatus(md).toSeq.flatMap(st => st.getPath.getName match {
      case manifestName(v) if st.getModificationTime <= tsMillis => Some(v.toLong)
      case _ => None
    }).maxOption
  }

  /** Expose each row's physical identity: the parquet file's NAME
    * (globally unique — every commit writes under a fresh `d-<nonce>/`
    * prefix and part files carry task UUIDs) and its `row_index` within
    * that file. This pair is what deletion vectors tombstone.
    */
  /** Dv row identity is the parquet BASENAME: enforce uniqueness across
    * the WHOLE snapshot's file list before any dv sidecar is written, not
    * just the pruned candidate subset — a basename collision between a
    * candidate and a non-candidate file (possible for publishExternal/
    * clone-sourced file lists that don't carry UUID part names) would let
    * one file's tombstones silently anti-join away the other file's rows
    * at read time.
    */
  private def requireUniqueBasenames(snap: Snapshot, dir: String): Unit = {
    val names = snap.files.map(r => r.substring(r.lastIndexOf('/') + 1))
    require(names.distinct.size == names.size,
      s"duplicate parquet file names across $dir — dv row identity needs " +
        "unique names across the entire snapshot")
  }

  private def withRowIds(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, substring_index}
    // basename via substring_index, not regexp_extract("[^/]+$"): this
    // projection runs on EVERY row of every dv-aware read (the row-identity
    // key of the tombstone anti-join), and the regex engine is the single
    // most expensive per-row expression in that pipeline; last-separator
    // substring is byte-scan codegen. Identical value: both return the
    // segment after the last '/', and the whole string when no '/' occurs.
    df.withColumn(dvNameCol,
        substring_index(col("_metadata.file_path"), "/", -1))
      .withColumn(dvIdxCol, col("_metadata.row_index"))
  }

  /** The dv sidecar rows `(f, i)` keyed for the row-identity join. */
  private def readDvPairs(spark: SparkSession, dir: String,
                          dvFiles: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(dvFiles.map(new Path(dir, _).toString): _*)
      .select(col("f").as(dvNameCol), col("i").as(dvIdxCol))
  }

  private def readSnapshot(spark: SparkSession, dir: String, s: Snapshot,
                           schema0: StructType): DataFrame = {
    // column mapping: the scan speaks PHYSICAL (file) names; the output
    // aliases back to the logical schema. `resolve` fills mapping metadata
    // a bare caller-supplied schema lacks from the snapshot's own record;
    // on the (overwhelmingly common) trivial mapping every seam below is
    // the identity — no extra Project, byte-identical plans.
    val schema = ColumnMapping.resolve(schema0, s.schema)
    if (s.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        ColumnMapping.stripMapping(schema))
    else {
      // merge-on-read: anti-join the live files' tombstones. The dv union
      // is sized by what deletes touched, not the table — AQE broadcasts
      // it; the no-dv path (every append-only and freshly-compacted
      // table) stays the plain scan with zero overhead.
      val dvFiles = s.files.flatMap(s.dvs.get).flatMap(_.files).distinct
      // manifest-planned native scan on BOTH paths: the FileIndex lists
      // from the manifest (sizes recorded at commit → zero per-file stat
      // RPCs) and prunes files against the query's own filters with the
      // manifest's stats/partition values/blooms — every
      // ManifestStore.read shares the `graft-manifest` read path
      val base = manifestScan(spark, dir, s, ColumnMapping.physicalSchema(schema))
      if (dvFiles.isEmpty) ColumnMapping.aliasToLogical(base, schema)
      else
        // merge-on-read stays one declarative tree: the vectorized
        // parquet scan (with `_metadata.file_path`/`row_index` row
        // identity) anti-joined against the dv union — whole-stage
        // codegen and file pruning survive tombstones. Filters above
        // push into the anti-join's LEFT side, so listFiles still prunes;
        // tombstones of pruned files simply never match.
        withRowIds(base)
          .join(readDvPairs(spark, dir, dvFiles), Seq(dvNameCol, dvIdxCol), "left_anti")
          .select(ColumnMapping.logicalCols(schema): _*)
    }
  }

  /** The live rows of `files` with the dv row-identity columns exposed —
    * LOGICAL columns plus ([[dvNameCol]], [[dvIdxCol]]): the shared scan
    * every row-level writer plans its tombstones/images from. The scan
    * itself reads physical names; predicates the caller applies see
    * logical ones.
    */
  private def readFilesWithRowIds(spark: SparkSession, dir: String,
                                  snap: Snapshot, files: Seq[String],
                                  schema0: StructType,
                                  applyDvs: Boolean = true): DataFrame = {
    val schema = ColumnMapping.resolve(schema0, snap.schema)
    val ided = ColumnMapping.aliasToLogical(
      withRowIds(spark.read.schema(ColumnMapping.physicalSchema(schema))
        .parquet(files.map(new Path(dir, _).toString): _*)),
      schema, keep = Seq(dvNameCol, dvIdxCol))
    val dvFiles =
      if (!applyDvs) Nil
      else files.flatMap(snap.dvs.get).flatMap(_.files).distinct
    if (dvFiles.isEmpty) ided
    else ided.join(readDvPairs(spark, dir, dvFiles),
      Seq(dvNameCol, dvIdxCol), "left_anti")
  }

  /** The native vectorized scan over one pinned snapshot's file list,
    * planned by [[ManifestFileIndex]] (manifest listing, stat/partition/
    * bloom pruning, zero-RPC statuses from recorded sizes).
    */
  private def manifestScan(spark: SparkSession, dir: String, s: Snapshot,
                           schema: StructType): DataFrame = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    spark.baseRelationToDataFrame(HadoopFsRelation(
      location = new ManifestFileIndex(spark, dir, s, schema),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark))
  }

  /** Change-data-feed: the row-level changes the table underwent in versions
    * `(fromVersion, toVersion]`, as `schema`'s columns plus `_change_type`
    * (`insert` | `delete`), `_commit_version`, and `_commit_op`. An update
    * surfaces as delete + insert (this log has no key knowledge — pair them
    * downstream on the table's key if needed). `fromVersion = 0` means
    * "since before the first commit". This is what lets an incremental
    * consumer follow a maintained table exactly — apply the feed and its
    * state equals `readVersion(toVersion)` — without rescanning snapshots.
    *
    * Planned from the manifest lineage, costed by what each commit touched:
    *  - `append` (removed nothing): inserts = a scan of ONLY that version's
    *    fresh files — metadata-planned, no diff job, the streaming/
    *    incremental hot path stays proportional to the batch.
    *  - `compact` (full [[compact]] and [[compactSmall]] both commit under
    *    it): data-neutral by construction — the rewrite commits exactly
    *    the rows it read, and a concurrent overwrite aborts it — so the
    *    feed emits nothing and costs nothing.
    *  - `overwrite` / `delete` / anything else: an exact multiset diff
    *    (`exceptAll` both ways) over only the files the commit added or
    *    dropped — a whole-file drop (deleteRange's stats-planned fast
    *    path) reads just the dropped files; a partial rewrite reads the
    *    old and new versions of the touched files, never the whole table.
    *
    * Vacuum interaction: versions older than the retention window lose
    * their dropped files; `changes` over a vacuumed range fails at scan
    * time rather than under-reporting — keep `fromVersion` within the
    * vacuum retention, as any CDC consumer must.
    */
  def changes(spark: SparkSession, dir: String, fromVersion: Long,
              toVersion: Long, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromVersion >= 0 && fromVersion <= toVersion,
      s"bad change range ($fromVersion, $toVersion]")
    def empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    def snap(v: Long): Snapshot =
      if (v == 0L) Snapshot(0L, Nil, "none") else readManifest(spark, dir, v)
    def tag(df: DataFrame, t: String, v: Long, op: String): DataFrame = df
      .withColumn("_change_type", lit(t))
      .withColumn("_commit_version", lit(v))
      .withColumn("_commit_op", lit(op))
    val perVersion = ((fromVersion + 1) to toVersion).map { v =>
      val cur = snap(v)
      val prev = snap(v - 1)
      val prevSet = prev.files.toSet
      val curSet = cur.files.toSet
      val added = cur.files.filterNot(prevSet)
      val removed = prev.files.filterNot(curSet)
      // LOGICAL state of a file set at a version (its dv tombstones
      // applied): a removed file's prior rows exclude what was already
      // dv-deleted, so a rewrite after merge-on-read deletes never
      // re-reports them
      def rdL(s: Snapshot, fl: Seq[String]): DataFrame =
        if (fl.isEmpty) empty else readSnapshot(spark, dir, s.copy(files = fl), schema)
      // dv sidecars this commit ADDED per file (a delete-dv commit;
      // file-list commits never change dv refs in the same version)
      val dvAdded = cur.files.flatMap { rel =>
        val now = cur.dvs.get(rel).map(_.files.toSet).getOrElse(Set.empty)
        val before = prev.dvs.get(rel).map(_.files.toSet).getOrElse(Set.empty)
        val fresh = now -- before
        if (fresh.isEmpty) None else Some(rel -> fresh)
      }
      // tombstoned rows of a dv-writing commit: physical rows of the
      // touched files matching the FRESH sidecar pairs (disjoint from
      // prior tombstones by the live-rows-only construction)
      def tombstoned: DataFrame = {
        val touched = dvAdded.map(_._1)
        val freshDv = dvAdded.flatMap(_._2).distinct
        // raw physical rows (prior tombstones NOT applied — the fresh
        // pairs are disjoint from them by construction), logical columns
        readFilesWithRowIds(spark, dir, cur, touched, schema, applyDvs = false)
          .join(readDvPairs(spark, dir, freshDv), Seq(dvNameCol, dvIdxCol), "left_semi")
          .select(schema.fieldNames.toIndexedSeq
            .map(org.apache.spark.sql.functions.col): _*)
      }
      val (ins, del) =
        if (cur.op == "compact") (empty, empty)
        else if (cur.op == "delete-dv" && dvAdded.nonEmpty)
          // one delete commit can BOTH tombstone rows and drop
          // wholly-covered files from the list: report both populations
          (empty, if (removed.isEmpty) tombstoned
            else tombstoned.unionAll(rdL(prev, removed)))
        else if ((cur.op == "update-dv" || cur.op == "upsert-dv" ||
            cur.op == "merge-dv") && dvAdded.nonEmpty)
          // one commit, both sides: deletes are the tombstoned originals,
          // inserts the freshly-written updated copies / batch rows
          (rdL(cur, added), tombstoned)
        else if (removed.isEmpty) (rdL(cur, added), empty)
        else if (added.isEmpty) (empty, rdL(prev, removed))
        else (rdL(cur, added).exceptAll(rdL(prev, removed)),
          rdL(prev, removed).exceptAll(rdL(cur, added)))
      // SHARED files whose dv refs changed in a non-dv-op commit — the
      // flagship is restore over delete-dv commits: the file list is
      // unchanged (added/removed empty above) yet tombstones were dropped
      // (rows logically resurrected) or re-added. Diff at PAIR granularity
      // (sidecar sets can intersect across restore branches): pairs
      // leaving a file's dv union are inserts, pairs joining it deletes.
      // dv-op commits are excluded — their fresh sidecars are already
      // exact via `tombstoned` above.
      val isDvOp = cur.op == "delete-dv" || cur.op == "update-dv" ||
        cur.op == "upsert-dv" || cur.op == "merge-dv"
      val dvChanged =
        if (cur.op == "compact" || isDvOp) Nil
        else cur.files.filter(prevSet).flatMap { rel =>
          val now = cur.dvs.get(rel).map(_.files.toSet).getOrElse(Set.empty)
          val before = prev.dvs.get(rel).map(_.files.toSet).getOrElse(Set.empty)
          if (now == before) None else Some((rel, before, now))
        }
      val (dvIns, dvDel) =
        if (dvChanged.isEmpty) (empty, empty)
        else {
          import org.apache.spark.sql.functions.col
          import org.apache.spark.sql.types.{LongType, StringType, StructField}
          def pairDf(fl: Seq[String]): DataFrame =
            if (fl.isEmpty) spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row],
              StructType(Seq(StructField(dvNameCol, StringType),
                StructField(dvIdxCol, LongType))))
            else readDvPairs(spark, dir, fl)
          val beforeDv = dvChanged.flatMap(_._2).distinct
          val nowDv = dvChanged.flatMap(_._3).distinct
          val resurrected = pairDf(beforeDv).exceptAll(pairDf(nowDv))
          val freshTombs = pairDf(nowDv).exceptAll(pairDf(beforeDv))
          // physical rows of only the touched files; the semi-join keys on
          // (basename, row_index) so pairs of untouched files drop out
          val base = readFilesWithRowIds(spark, dir, cur,
            dvChanged.map(_._1), schema, applyDvs = false)
          def rowsOf(p: DataFrame): DataFrame =
            base.join(p, Seq(dvNameCol, dvIdxCol), "left_semi")
              .select(schema.fieldNames.toIndexedSeq.map(col): _*)
          (rowsOf(resurrected), rowsOf(freshTombs))
        }
      tag(ins.unionAll(dvIns), "insert", v, cur.op)
        .unionAll(tag(del.unionAll(dvDel), "delete", v, cur.op))
    }
    perVersion.reduceOption(_ unionAll _)
      .getOrElse(tag(empty, "insert", 0L, "none").limit(0))
  }

  /** [[changes]] refined with key knowledge — the Delta-CDF-style change
    * classification: within one commit, a delete whose key also inserted
    * becomes `update_preimage` and the insert `update_postimage`; keys
    * that only inserted or only deleted keep `insert` / `delete`. This is
    * what lets a consumer distinguish "row replaced" from "row removed,
    * unrelated row added" — the upsert/SCD2/replica cases.
    *
    * Cost on top of [[changes]]: one window over (commit, key) counting
    * each side's presence — a single shuffle of the feed (which is sized
    * by what the commits touched, not the table). Multiplicity caveat: on
    * tables without key uniqueness, ANY co-occurrence of both sides marks
    * the whole key's rows as an update (the log records no row pairing);
    * key-unique tables — everything [[upsertKeyed]] maintains — get the
    * exact 1:1 pre/postimage.
    */
  def changesKeyed(spark: SparkSession, dir: String, fromVersion: Long,
                   toVersion: Long, schema: StructType,
                   keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lit, sum, when}
    val feed = changes(spark, dir, fromVersion, toVersion, schema)
    val w = Window.partitionBy(col("_commit_version"), col(keyCol))
    val nIns = sum(when(col("_change_type") === "insert", 1L).otherwise(0L)).over(w)
    val nDel = sum(when(col("_change_type") === "delete", 1L).otherwise(0L)).over(w)
    feed
      .withColumn("_change_type",
        when(col("_change_type") === "delete" && nIns > 0 && col(keyCol).isNotNull,
          lit("update_preimage"))
          .when(col("_change_type") === "insert" && nDel > 0 && col(keyCol).isNotNull,
            lit("update_postimage"))
          .otherwise(col("_change_type")))
  }

  /** ALTER TABLE ADD COLUMNS: publish a METADATA-ONLY commit (op =
    * `schema`, file list untouched) whose recorded schema is the previous
    * one widened by `newSchema` under the same widening-only rule every
    * write uses ([[mergeSchemas]] refuses narrowing/type changes) —
    * pre-evolution files null-fill the new columns on read, no data
    * rewrite. Returns the committed version.
    */
  def evolveSchema(spark: SparkSession, dir: String,
                   newSchema: StructType): Long =
    publishLoop(spark, dir, "schema", Nil, (prevFiles, _) => prevFiles,
      dfSchema = Some(newSchema))

  /** ALTER TABLE RENAME/DROP COLUMN: publish a METADATA-ONLY `schema`
    * commit whose recorded schema is `newSchema` VERBATIM (no widening
    * merge — a rename/drop is deliberately non-widening), parking
    * `retire`'s physical names in the [[ColumnMapping.RetiredProp]]
    * property so a later ADD of the same name can never resurrect the
    * dropped bytes. The caller derives `newSchema` from a snapshot whose
    * schema serializes to `baseSchemaJson`; the guard re-checks that base
    * against every publish attempt's own snapshot and aborts on drift
    * (ConcurrentModificationException — the caller re-plans), so two
    * racing ALTERs serialize instead of last-writer-clobbering.
    */
  private[sources] def alterColumnsExact(spark: SparkSession, dir: String,
                                         baseSchemaJson: String,
                                         newSchema: StructType,
                                         retire: Seq[String] = Nil): Long =
    publishLoop(spark, dir, "schema", Nil, (prevFiles, _) => prevFiles,
      dfSchema = Some(newSchema), schemaExact = true,
      // retired physical names also leave the declared CLUSTER BY set in
      // the SAME commit — a dead physical name left in `graft.cluster`
      // would wedge every later compact_small / autoCompact pass on an
      // unresolvable column
      propsUpdate = p => {
        val p1 = ColumnMapping.withRetired(p, retire)
        p1.get(GraftCatalog.clusterProp) match {
          case Some(cs) if retire.nonEmpty =>
            val kept = cs.split(",").toSeq.map(_.trim)
              .filter(_.nonEmpty).filterNot(retire.contains)
            if (kept.isEmpty) p1 - GraftCatalog.clusterProp
            else p1 + (GraftCatalog.clusterProp -> kept.mkString(","))
          case _ => p1
        }
      },
      guard = Some { prev =>
        if (!prev.schema.map(_.json).contains(baseSchemaJson))
          throw new java.util.ConcurrentModificationException(
            s"table schema at $dir changed under ALTER COLUMN — re-plan " +
              "against the current definition")
      })

  /** CREATE TABLE: publish version 1 of an EMPTY table carrying only the
    * recorded schema (op = `create`, no data files) — the catalog-level
    * "table exists with this shape" commit `spark.sql("CREATE TABLE ...")`
    * needs before any INSERT lands. Refuses a table that already has
    * commits (the catalog maps that to TableAlreadyExistsException).
    */
  def createEmpty(spark: SparkSession, dir: String, schema0: StructType,
                  partitionCols: Seq[String] = Nil,
                  props: Map[String, String] = Map.empty): Long = {
    val schema = ColumnMapping.stripMapping(schema0) // new tables start trivial
    validatePartitionSpecs(schema, partitionCols, s"CREATE $dir")
    publishExternal(spark, dir, op = "create", files = Nil,
      stats = Map.empty, rows = Map.empty, schema = Some(schema),
      parts = Map.empty, partitionCols = partitionCols, props = props)
  }

  /** PARTITION-SPEC EVOLUTION (Iceberg's ALTER-time spec change,
    * re-derived for the manifest): one METADATA-ONLY commit replaces the
    * DECLARED partition spec — `days(ts)` → `hours(ts)`, add/drop a
    * `bucket`, or `Nil` to stop partitioning — without rewriting a byte
    * of data. Sound because the layout is per-file, not per-table: every
    * file records its own `spec-string → derived value` map
    * ([[Snapshot.parts]]), and every pruning/containment proof
    * ([[transformWhollyIn]], [[partitionWhollyIn]], the FileIndex
    * evidence walk) consults the FILE's recorded entries, never the
    * table-level declaration — so pre-evolution files keep pruning under
    * the spec that wrote them, post-evolution files prune under the new
    * one, and a predicate on the shared SOURCE column prunes both
    * generations in one scan.
    *
    * The declaration only ROUTES writes: the next INSERT/MERGE/stream
    * batch derives the new spec's values; [[compact]] is the migration
    * path (rewrites survivors under the current spec). Writers that
    * planned against an older snapshot commit files laid out by the old
    * spec — never wrong, only old-layout (their files carry their own
    * values). One loud wall stands, unchanged: a PARTIAL partition
    * overwrite ([[overwritePartitions]]) refuses files that lack the
    * filter key's recorded value, so INSERT OVERWRITE PARTITION cannot
    * silently duplicate rows across spec generations — compact first,
    * exactly the message it raises.
    *
    * `specs` use LOGICAL column names (the user's view; stored physical
    * like every declaration), validated against the current schema both
    * at planning and — via the publish guard — against the attempt's
    * snapshot, so a concurrent DROP COLUMN cannot race a spec onto a
    * column that no longer exists. Time travel is exact: each version
    * reads under its own recorded declaration.
    */
  def setPartitionSpec(spark: SparkSession, dir: String,
                       specs: Seq[String]): Long = {
    val snap = currentSnapshot(spark, dir).getOrElse(
      throw new IllegalStateException(s"no manifest table at $dir"))
    val schema = snap.schema.getOrElse(throw new IllegalStateException(
      s"manifest v${snap.version} at $dir records no schema (older " +
        "writer) — partition-spec evolution needs the recorded schema"))
    validatePartitionSpecs(schema, specs, s"SET PARTITION SPEC $dir")
    val specsP = specs.map(PartitionSpec.mapCol(_,
      ColumnMapping.physFor(schema, _)))
    publishLoop(spark, dir, s"set-partition-spec:${specsP.mkString(",")}",
      fresh = Nil, combine = (cur, _) => cur,
      guard = Some { s =>
        val sch = s.schema.getOrElse(schema)
        specsP.foreach { raw =>
          val sp = PartitionSpec.parse(raw)
          val f = sch.fields.find(f => ColumnMapping.physicalName(f) == sp.col)
            .getOrElse(throw new java.util.ConcurrentModificationException(
              s"partition-spec column '${sp.col}' vanished from $dir while " +
                "the evolution commit was planned — re-plan against the " +
                "current schema"))
          PartitionSpec.validate(sp, f.dataType, s"SET PARTITION SPEC $dir")
        }
      },
      pcolsUpdate = _ => specsP)
  }

  /** Rewrite the table's CURRENT contents under the CURRENT declared
    * partition spec — the optional DATA-migration half of
    * [[setPartitionSpec]] (which is metadata-only: old files keep their
    * old layout, still correctly pruned by their own recorded values). A
    * full-snapshot rewrite like [[compact]] — same whole-read, same
    * abort-on-concurrent-commit guard, same data-neutral "compact" op
    * (rows are relocated, never changed, so CDF reports nothing and
    * streaming charges 0 bytes) — but through the hive-partitioned
    * writer, so every output file derives and records the current spec's
    * values. Like compact, a whole-table op: on a 100 TB table, migrate
    * incrementally instead (new writes land in the new layout; retention
    * DELETEs age the old one out).
    */
  def rewriteLayout(spark: SparkSession, dir: String,
                    schema: StructType): Long = {
    val snap = currentSnapshot(spark, dir).getOrElse(
      throw new IllegalStateException(s"no manifest table at $dir"))
    val cur = readSnapshot(spark, dir, snap, schema)
    val guard: Option[Snapshot => Unit] = Some { prev =>
      if (prev.files != snap.files || prev.dvs != snap.dvs)
        throw new java.util.ConcurrentModificationException(
          s"snapshot changed under rewriteLayout on $dir — retry, or " +
            "let incremental writes migrate the layout")
    }
    if (snap.partitionCols.isEmpty)
      commit(cur.coalesce(1), dir, "compact", (_, fresh) => fresh,
        guard = guard)
    else appendPartitioned(cur, dir, snap.partitionCols, op = "compact",
      combine = (_, fresh) => fresh, guard = guard)
  }

  /** INCREMENTAL layout migration — [[rewriteLayout]] bounded to the files
    * that actually need it: rewrites only files whose RECORDED layout does
    * not derive every field of the CURRENT declared spec (pre-evolution
    * generations), optionally capped at `maxBytes` of input per call, each
    * call ONE optimistic commit. The 100 TB migration shape rewriteLayout's
    * own scaladoc defers to: a cron of bounded calls walks the old
    * generation day by day while writes continue, instead of one
    * whole-table rewrite holding a snapshot-wide abort guard.
    *
    * Selection: a file is OLD-GENERATION iff the current spec's rendered
    * fields are not all present in its recorded per-file values
    * ([[Snapshot.parts]]) — files carrying a SUPERSET (a later spec
    * dropped a field) still prune under every declared field and are left
    * alone; an unpartitioned declaration has nothing to derive, so
    * migration is always a no-op there. Candidates are taken in sorted
    * order (deterministic convergence) while cumulative recorded size
    * stays within `maxBytes`, always admitting at least one — an
    * oversized file migrates alone, so progress is guaranteed.
    *
    * Concurrency (the [[compactSmall]] rules, same data-neutral "compact"
    * op — rows relocate, CDF reports nothing, streams charge 0 bytes):
    * the commit re-bases on concurrent APPENDs (their files are not in
    * the migrated set and pass through); a concurrent rewrite/DELETE that
    * removed a migrated file, or new deletion vectors on one, abort with
    * None — the rows were dropped or already rewritten, and swapping in
    * our copy would resurrect them. Returns None (nothing old-generation,
    * or aborted) or (version, filesRewritten, filesRemaining) — remaining
    * counts the old-generation files this bounded call did not reach.
    */
  /** First-fit prefix of `items` whose summed `sizeOf` stays within
    * `cap`, always admitting the FIRST item (an oversized head must not
    * stall a bounded maintenance walk) — the one capped-selection rule
    * [[migrateLayout]] and the bounded [[compactSmall]] share. The
    * admitted-count test (not `acc == 0`) keeps zero-byte heads from
    * admitting everything after them.
    */
  private def takeBounded[T](items: Seq[T], cap: Long)(sizeOf: T => Long): Seq[T] = {
    var acc = 0L
    var taken = 0
    items.takeWhile { it =>
      val sz = sizeOf(it)
      val take = taken == 0 || acc + sz <= cap
      if (take) { acc += sz; taken += 1 }
      take
    }
  }

  def migrateLayout(spark: SparkSession, dir: String, schema: StructType,
                    maxBytes: Option[Long] = None): Option[(Long, Int, Int)] =
    migrateLayout(spark, dir, schema, maxBytes, () => ())

  /** [[migrateLayout]] with the race-injection seam ([[compactSmall]]'s
    * pattern): `midFlight` runs after the migrated set is fixed and
    * before the commit.
    */
  private[graft] def migrateLayout(spark: SparkSession, dir: String,
                                   schema: StructType, maxBytes: Option[Long],
                                   midFlight: () => Unit): Option[(Long, Int, Int)] = {
    val snap = currentSnapshot(spark, dir).getOrElse(return None)
    val want = snap.partitionCols.map(c => PartitionSpec.parse(c).render).toSet
    if (want.isEmpty) return None // nothing to derive under no declaration
    val oldGen = snap.files.filterNot(rel =>
      want.subsetOf(snap.parts.getOrElse(rel, Map.empty[String, String]).keySet))
      .sorted
    if (oldGen.isEmpty) return None
    val f = fs(spark, dir)
    val selected = maxBytes match {
      case None => oldGen
      case Some(cap) =>
        takeBounded(oldGen, cap)(rel => snap.sizes.getOrElse(rel,
          f.getFileStatus(new Path(dir, rel)).getLen))
    }
    val selectedSet = selected.toSet
    val cur = readSnapshot(spark, dir, snap.copy(files = selected), schema)
    midFlight()
    val combine = (prev: Seq[String], fresh: Seq[String]) => {
      if (!selectedSet.forall(prev.contains))
        throw new java.util.ConcurrentModificationException(
          s"snapshot changed under migrateLayout on $dir — a concurrent " +
            "commit rewrote or dropped a migrating file; retry")
      prev.filterNot(selectedSet.contains) ++ fresh
    }
    try {
      val v = appendPartitioned(cur, dir, snap.partitionCols, op = "compact",
        combine = combine, guard = Some(dvUnchangedGuard(snap, selected)))
      Some((v, selected.size, oldGen.size - selected.size))
    } catch { case _: java.util.ConcurrentModificationException => None }
  }

  /** Each declared partition field (identity name or transform spec)
    * names a schema column of a transform-compatible type — validated at
    * declaration so a bad layout fails before the first write. Two
    * ambiguity classes refuse LOUDLY here instead of silently
    * re-interpreting:
    *  - a declared field that parses as a transform while the schema
    *    ALSO has a column literally named the full spec string (Spark
    *    permits backtick-quoted names containing parentheses): without
    *    the refusal, `PARTITIONED BY (days(ts))` on a table carrying a
    *    column named `days(ts)` would silently partition by the days
    *    TRANSFORM of the sibling `ts` instead of identity on the named
    *    column;
    *  - a function-shaped field naming a transform the engine does not
    *    implement (a typo like `week(ts)`) — these would otherwise fall
    *    through to identity parsing and die on the misleading "not in
    *    schema"; the refusal lists the supported transforms instead.
    */
  private def validatePartitionSpecs(schema: StructType, partitionCols: Seq[String],
                                     where: String): Unit =
    partitionCols.foreach { c =>
      val sp = PartitionSpec.parse(c)
      if (!sp.isIdentity && schema.fields.exists(_.name == c))
        throw new IllegalArgumentException(
          s"ambiguous partition field '$c': it parses as the " +
            s"${sp.render} transform but the schema also has a column " +
            s"literally named '$c' — rename that column (transform spec " +
            s"strings are reserved in partition declarations); $where")
      val FnShape = """([A-Za-z_][A-Za-z0-9_]*)\s*\(.*\)""".r
      if (sp.isIdentity && !schema.fields.exists(_.name == c)) c match {
        case FnShape(fn) =>
          throw new IllegalArgumentException(
            s"unknown partition transform '$fn' in '$c' — supported: " +
              s"years(ts), months(ts), days(ts), hours(ts), " +
              s"bucket(n,col), truncate(w,col); $where")
        case _ =>
      }
      val f = schema.fields.find(_.name == sp.col).getOrElse(
        throw new IllegalArgumentException(
          s"partition column '${sp.col}' not in schema"))
      PartitionSpec.validate(sp, f.dataType, where)
    }

  /** Replace the table contents with `df`. Returns the committed version. */
  def overwrite(df: DataFrame, dir: String): Long =
    commit(df, dir, "overwrite", (_, fresh) => fresh)

  /** TRUNCATE: one metadata-only `overwrite` commit with an empty file
    * list — rows stay time-travelable until [[vacuum]], the recorded
    * schema and declared partition columns carry forward, zero data I/O.
    */
  def truncate(spark: SparkSession, dir: String): Long =
    publishLoop(spark, dir, "overwrite", Nil, (_, _) => Nil)

  /** Write `df`'s data files under the table WITHOUT publishing — the
    * staged half of an atomic CTAS/REPLACE ([[publishStaged]] publishes,
    * [[GraftStagedTable]] orchestrates). Returns the relative file list
    * (and per-file partition values for the partitioned variant). Staged
    * files are invisible until published and vacuum-collectable if
    * abandoned.
    */
  private[sources] def stageData(df: DataFrame, dir: String)
      : (Seq[String], Map[String, Map[String, String]]) = {
    val spark = df.sparkSession
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val dataRel = s"d-$nonce"
    df.write.mode("error").parquet(new Path(dir, dataRel).toString)
    val f = fs(spark, dir)
    (f.listStatus(new Path(dir, dataRel)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .sorted.map(n => s"$dataRel/$n"), Map.empty)
  }

  /** [[stageData]]'s hive-partitioned sibling. */
  private[sources] def stagePartitioned(df: DataFrame, dir: String,
                                        partitionCols: Seq[String])
      : (Seq[String], Map[String, Map[String, String]]) = {
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    writeHivePartitioned(df, dir, s"d-$nonce", partitionCols)
  }

  /** Publish previously-staged files as ONE commit: `create = true` is
    * the atomic CTAS (version 1 only, op `create-as` — append-safe for
    * streams, byte-charged unlike the empty `create`); `create = false`
    * is REPLACE/CREATE-OR-REPLACE (op `overwrite`): the table is
    * REDEFINED — schema, declared partitioning and properties are the
    * new definition verbatim (no widening merge; that is the point of
    * REPLACE), prior contents stay time-travelable until vacuum.
    */
  private[sources] def publishStaged(spark: SparkSession, dir: String,
                                     schema0: StructType,
                                     files: Seq[String],
                                     parts: Map[String, Map[String, String]],
                                     partitionCols: Seq[String],
                                     props: Map[String, String],
                                     create: Boolean): Long = {
    // a CREATE/REPLACE defines a FRESH table shape: mapping metadata a
    // CTAS query might have inherited is stripped (new definitions start
    // with the trivial mapping; the staged files were written with the
    // query's own logical names)
    val schema = ColumnMapping.stripMapping(schema0)
    validatePartitionSpecs(schema, partitionCols, s"CREATE/REPLACE $dir")
    val hc = spark.sparkContext.hadoopConfiguration
    val meta = files.map(r => r -> footerMeta(hc, dir, r)).toMap
    publishExternal(spark, dir,
      op = if (create) "create-as" else "overwrite", files = files,
      stats = meta.view.mapValues(_._1).toMap,
      rows = meta.view.mapValues(_._2).toMap,
      schema = Some(schema), parts = parts,
      firstVersionOnly = create,
      sizes = meta.view.mapValues(_._3).toMap,
      partitionCols = partitionCols, props = props)
  }

  /** ALTER TABLE SET/UNSET TBLPROPERTIES: one metadata-only `properties`
    * commit updating the user property bag the manifest carries. The
    * update applies against each publish attempt's own snapshot, so
    * concurrent property edits compose (no lost updates). Data-neutral:
    * streaming sources classify it with compact/bloom/schema.
    */
  def setProperties(spark: SparkSession, dir: String,
                    set: Map[String, String],
                    unset: Seq[String] = Nil): Long =
    publishLoop(spark, dir, "properties", Nil, (prev, _) => prev,
      propsUpdate = p => p ++ set -- unset)

  /** Unconditional DELETE: drop every file from the list as one
    * metadata commit — [[truncate]]'s row-level-semantics sibling,
    * committed under the delete op so CDC reports the dropped files'
    * live rows as deletes (a truncate/overwrite is a retraction the
    * streaming row mode refuses; so is this — both are loud).
    */
  def deleteAll(spark: SparkSession, dir: String): Long =
    publishLoop(spark, dir, "delete-dv", Nil, (_, _) => Nil)

  /** Append `df` to the table. Returns the committed version. Concurrent
    * appends both land: the slot loser re-bases on the winner's snapshot.
    */
  def append(df: DataFrame, dir: String): Long =
    commit(df, dir, "append", (prev, fresh) => prev ++ fresh)

  /** Idempotent streaming-batch append, keyed by (appId, batchId): commits
    * under op `stream:<appId>:<batchId>`; a batch at or below the app's
    * committed high water is SKIPPED (returns None) — so an at-least-once
    * micro-batch replay (sink crash after commit, before checkpoint)
    * becomes exactly-once table delivery, the Delta `txnAppId`/`txnVersion`
    * discipline. One writer per appId (the streaming engine runs one
    * instance of a query); concurrent DIFFERENT appIds interleave safely
    * through the normal optimistic protocol.
    */
  def appendIdempotent(df: DataFrame, dir: String, appId: String,
                       batchId: Long): Option[Long] = {
    require(!appId.contains(":"), "appId must not contain ':'")
    if (batchId <= streamBatchHighWater(df.sparkSession, dir, appId)) None
    else Some(commit(df, dir, s"stream:$appId:$batchId", (prev, fresh) => prev ++ fresh))
  }

  /** The highest batchId `appId` has committed to this table (−1 if none):
    * the newest manifest whose op carries the app's stream key — later
    * commits by the same app always carry later batchIds, so the first hit
    * walking the lineage downward is the high water. Cost: one JSON read
    * per non-matching newer commit, bounded by the retention window.
    */
  def streamBatchHighWater(spark: SparkSession, dir: String, appId: String): Long = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) return -1L
    val versions = f.listStatus(md).toSeq.flatMap(s => s.getPath.getName match {
      case manifestName(v) => Some(v.toLong)
      case _ => None
    }).sorted.reverse
    val prefix = s"stream:$appId:"
    versions.iterator
      .flatMap(v => scala.util.Try(readManifest(spark, dir, v).op).toOption)
      .collectFirst { case op if op.startsWith(prefix) =>
        op.stripPrefix(prefix).toLong }
      .getOrElse(-1L)
  }

  /** Hive value escaped by Spark's partitioned writer for a null value. */
  private val hiveNullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Append `df` hive-partitioned on `partitionCols`: data files land under
    * `d-<nonce>/<col>=<value>/…` with ONE partition value per file, and the
    * manifest records that value explicitly per file — the reference's
    * hive-layout discipline (writer_landing.py:29 `run_id=`) lifted to the
    * table-format layer. [[pruneFiles]] (and through it [[rangeScan]],
    * [[lookup]], [[deleteRange]], [[upsertKeyed]]) then prunes whole
    * partitions from the METADATA value alone — exact, independent of
    * parquet footer stats (which drop oversized string bounds).
    *
    * The partition columns stay IN the data files (the writer partitions on
    * hidden clones), so reads, schema evolution, CDC, and compaction are
    * oblivious to the layout: a partitioned and an unpartitioned file can
    * share a lineage, each pruned by whatever knowledge its manifest entry
    * carries. Partition columns must be integral or string (the types whose
    * hive path round-trip is exact); nulls land in the hive default
    * partition and stay un-prunable (kept by every scan — safe).
    */
  def appendPartitioned(df: DataFrame, dir: String,
                        partitionCols: Seq[String]): Long =
    appendPartitioned(df, dir, partitionCols, op = "append")

  /** [[appendPartitioned]]'s whole-table-replace sibling: one atomic
    * `overwrite` commit whose file list is exactly the hive-partitioned
    * fresh write, per-file partition values recorded for pruning — what
    * `INSERT OVERWRITE` on a PARTITIONED-BY catalog table runs.
    */
  def overwritePartitioned(df: DataFrame, dir: String,
                           partitionCols: Seq[String]): Long =
    appendPartitioned(df, dir, partitionCols, op = "overwrite",
      combine = (_, fresh) => fresh)

  /** PARTIAL partition overwrite — Delta's `replaceWhere` / SQL
    * `INSERT OVERWRITE t PARTITION (col = v)` for declared-partitioned
    * tables: ONE atomic commit that drops every previous file whose
    * RECORDED partition values match all of `partitionFilter` and lands
    * `df` hive-partitioned in their place — the backfill shape ("replace
    * one day of a date-partitioned 100 TB table") at metadata cost
    * proportional to the replaced partition.
    *
    * Strictness, both directions:
    *  - every incoming row must satisfy the filter (checked with one
    *    cheap pre-write probe — Delta's replaceWhere validation): rows
    *    outside the target partition would silently leak into it;
    *  - every PREVIOUS file must carry recorded values for the filtered
    *    columns (true for any file written through the partitioned
    *    writer): a value-less file might hold matching rows the drop
    *    could not prove, so the overwrite refuses rather than
    *    under-delete.
    */
  def overwritePartitions(df: DataFrame, dir: String,
                          partitionCols: Seq[String],
                          partitionFilter: Map[String, String]): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    require(partitionFilter.nonEmpty, "empty partition filter — use overwrite")
    val spark = df.sparkSession
    // column mapping: translate pcols and filter keys to PHYSICAL once
    // (recorded per-file values are physical); the row-leak probe below
    // runs BEFORE the physical rename, in the frame's own logical names
    val snapSchema = currentSnapshot(spark, dir).flatMap(_.schema)
    def phys(c: String): String =
      snapSchema.map(ColumnMapping.physFor(_, c)).getOrElse(c)
    val pcolsP = partitionCols.map(PartitionSpec.mapCol(_, phys))
    val filterP = partitionFilter.map { case (c, v) => phys(c) -> v }
    require(filterP.keySet.subsetOf(pcolsP.toSet),
      s"partition filter keys ${partitionFilter.keys.mkString(",")} must be " +
        s"declared partition columns (${partitionCols.mkString(",")})")
    // row-leak guard ENFORCED INSIDE THE ONE WRITE (the enforceChecks
    // raise_error shape), not as a separate pre-write probe: a
    // nondeterministic source (rand(), re-read external data) evaluated
    // twice could pass a probe yet write different rows — the guard must
    // judge exactly the rows that land in files
    val inTarget = partitionFilter.map { case (c, v) =>
      col(c).cast("string") <=> lit(v)
    }.reduce(_ && _)
    import org.apache.spark.sql.functions.{raise_error, when}
    val guarded = df.filter(when(inTarget, lit(true)).otherwise(raise_error(lit(
      "[GRAFT_PARTITION_LEAK] INSERT OVERWRITE PARTITION data carries rows " +
        "outside the target partition — they would silently leak; fix the " +
        "query or use a whole-table overwrite"))))
    val (dfP, _) = planWrite(spark, dir, guarded)
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val (fresh, freshParts) =
      writeHivePartitioned(dfP, dir, s"d-$nonce", pcolsP)
    // the guard runs before combine on EVERY publish attempt with the
    // attempt's own snapshot — stash it so the drop set is judged against
    // exactly the file list combine receives (re-reading inside combine
    // could see a newer snapshot and mis-prove partition membership)
    var planned: Option[Snapshot] = None
    publishLoop(spark, dir, "overwrite", fresh, (prev, fr) => {
      val parts = planned.map(_.parts).getOrElse(Map.empty)
      prev.filterNot { rel =>
        val recorded = parts.getOrElse(rel, Map.empty)
        filterP.forall { case (c, v) =>
          recorded.get(c) match {
            case Some(rv) => rv == v
            case None => throw new IllegalStateException(
              s"file $rel records no partition value for '$c' — a partial " +
                "partition overwrite cannot prove it holds no matching " +
                "rows; compact/rewrite it through the partitioned writer " +
                "first")
          }
        }
      } ++ fr
    }, dfSchema = Some(df.schema), freshParts = freshParts,
      guard = Some(s => planned = Some(s)))
  }

  /** [[appendPartitioned]] committed as an idempotent STREAMING batch —
    * the partitioned sibling of [[appendIdempotent]]: same
    * `stream:<appId>:<batchId>` lineage key and replay-skip, with the
    * hive layout and per-file partition values recorded for metadata
    * pruning. This is what the streaming sink's `partitionBy` runs.
    */
  def appendPartitionedIdempotent(df: DataFrame, dir: String,
                                  partitionCols: Seq[String], appId: String,
                                  batchId: Long): Option[Long] = {
    require(!appId.contains(":"), "appId must not contain ':'")
    if (batchId <= streamBatchHighWater(df.sparkSession, dir, appId)) None
    else Some(appendPartitioned(df, dir, partitionCols,
      op = s"stream:$appId:$batchId"))
  }

  private def appendPartitioned(df: DataFrame, dir: String,
                                partitionCols: Seq[String], op: String,
                                combine: (Seq[String], Seq[String]) => Seq[String]
                                  = (prev, fresh) => prev ++ fresh,
                                guard: Option[Snapshot => Unit] = None): Long = {
    require(partitionCols.nonEmpty, "appendPartitioned needs partition columns")
    val spark = df.sparkSession
    // column mapping: files + partition paths spell physical names. pcols
    // arrive logical (DataFrame API) or already-physical (catalog routes
    // snap.partitionCols) — physFor is the identity for both on unmapped
    // tables and maps logical → physical on mapped ones.
    val snap = currentSnapshot(spark, dir)
    val (dfP, dfSchema) = planWrite(spark, dir, df)
    val pcolsP = snap.flatMap(_.schema) match {
      case Some(ss) =>
        partitionCols.map(PartitionSpec.mapCol(_, ColumnMapping.physFor(ss, _)))
      case None => partitionCols
    }
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val (fresh, freshParts) =
      writeHivePartitioned(dfP, dir, s"d-$nonce", pcolsP)
    publishLoop(spark, dir, op, fresh, combine,
      dfSchema = Some(dfSchema), freshParts = freshParts, guard = guard)
  }

  /** Write `df` hive-partitioned under `dir/dataRel` and return the
    * (relative file list, per-file partition values) a manifest commit
    * records — the shared data-plane step of [[appendPartitioned]],
    * [[overwritePartitioned]], and the row-level writers' fresh files on
    * declared-partitioned tables ([[mergeRows]], [[updateWhere]],
    * [[upsertKeyedDv]]).
    *
    * Layout notes: the writer partitions on hidden CLONES (`__p_<col>`)
    * so the real columns stay in the files — readers of explicit leaf
    * paths see the full row without partition inference, and
    * un-partitioned commits can share the lineage. Spark's partitioned
    * writer reuses part-file names across partition directories (task N
    * writes `part-0000N-…` into every partition it holds rows for), but
    * deletion-vector row identity keys on the BASENAME snapshot-wide
    * ([[requireUniqueBasenames]]) — repeats are de-collided by renaming
    * with a stable counter prefix. Renames happen BEFORE any manifest
    * references the files, so the never-rename commit protocol is intact
    * (the data is invisible until the manifest lands); on a
    * rename-by-copy object store this costs one extra copy per
    * colliding file.
    */
  private def writeHivePartitioned(df: DataFrame, dir: String, dataRel: String,
                                   partitionCols: Seq[String])
      : (Seq[String], Map[String, Map[String, String]]) = {
    import org.apache.spark.sql.functions.col
    // entries are identity column names OR transform specs (`days(ts)`,
    // `bucket(8, k)` — [[PartitionSpec]]); each derives ONE partition
    // value per file, recorded under its rendered spec string
    val specs = partitionCols.map(PartitionSpec.parse)
    specs.foreach { sp =>
      val f = df.schema.fields.find(_.name == sp.col).getOrElse(
        throw new IllegalArgumentException(
          s"partition column '${sp.col}' not in schema"))
      PartitionSpec.validate(sp, f.dataType, s"write to $dir")
    }
    val spark = df.sparkSession
    // identity clones keep the readable `__p_<col>` path segment;
    // transform clones index (`__p_t<i>`) — a spec string is not a safe
    // path segment. The clone→spec map recovers the manifest key below.
    val clones = specs.zipWithIndex.map { case (sp, i) =>
      if (sp.isIdentity) s"__p_${sp.col}" else s"__p_t$i"
    }
    val keyByClone = clones.zip(specs.map(_.render)).toMap
    // string-valued transform clones hex-encode into the path (opaque
    // `__p_tN=` segments; ASCII-safe on POSIX-locale JVMs and
    // byte-mangling object stores) and decode back to the TRUE value for
    // the manifest below — pruning never sees the encoding
    val hexKeys = specs.zip(clones).collect {
      case (sp, cl) if PartitionSpec.pathHexEncoded(
          sp, df.schema(sp.col).dataType) => keyByClone(cl)
    }.toSet
    val cloned = specs.zip(clones).foldLeft(df) { case (d, (sp, cl)) =>
      val dt = df.schema(sp.col).dataType
      val raw = PartitionSpec.valueColumn(sp, col(sp.col), dt)
      d.withColumn(cl,
        if (PartitionSpec.pathHexEncoded(sp, dt))
          org.apache.spark.sql.functions.hex(raw) else raw)
    }
    // OPTIMIZED WRITE for transform layouts (the Delta discipline): a
    // hidden-partitioned table is the high-cardinality shape (30 days ×
    // 8 buckets = 240 values), where the default task-parallel write
    // emits tasks × values small files per commit. Hash-clustering the
    // rows on the derived partition values first lands ONE file per
    // partition value per commit — the steady state the per-file
    // partition metadata is designed around (compactSmall's partition-
    // aware grouping handles the tail). A hot partition serializes into
    // one writer task — the same tradeoff Delta's optimized writes make;
    // identity-only layouts (typically a handful of values) keep the
    // task-parallel write and their existing plans.
    // the clustering exchange carries an EXPLICIT partition count: a bare
    // repartition(cols) is AQE-coalescible, and a small commit's few MB
    // coalesce to ONE task that then opens every partition value's writer
    // serially (measured: 104 values ≈ 2.5 s single-task per q153 INSERT —
    // per-writer open cost dominates small bytes). With the count pinned to
    // the session parallelism the value-hash still lands each value in
    // exactly one task (one file per value per commit, as before); tasks
    // just open their writers in parallel. n is the cluster-sized session
    // setting, not a local constant.
    val shaped =
      if (specs.exists(!_.isIdentity)) {
        val n = spark.sessionState.conf.numShufflePartitions
        cloned.repartition(n, clones.map(col): _*)
      } else cloned
    shaped.write.mode("error").partitionBy(clones: _*)
      .parquet(new Path(dir, dataRel).toString)
    val f = fs(spark, dir)
    def walk(p: Path): Seq[Path] = f.listStatus(p).toSeq.flatMap { s =>
      if (s.isDirectory) walk(s.getPath)
      else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath) else Nil
    }
    val base = new Path(dir, dataRel)
    val baseUri = f.makeQualified(base).toUri
    val freshRaw = walk(base)
      .map(p => s"$dataRel/${baseUri.relativize(f.makeQualified(p).toUri).getPath}")
      .sorted
    val seen = scala.collection.mutable.Set.empty[String]
    val fresh = freshRaw.map { rel =>
      val slash = rel.lastIndexOf('/')
      val (parent, name) = (rel.substring(0, slash), rel.substring(slash + 1))
      if (seen.add(name)) rel
      else {
        var i = 1
        while (!seen.add(s"u$i-$name")) i += 1
        val renamed = s"$parent/u$i-$name"
        require(f.rename(new Path(dir, rel), new Path(dir, renamed)),
          s"failed to de-collide partitioned part file $rel")
        renamed
      }
    }
    // parse each file's partition values back out of its hive path,
    // keyed by the declared spec (identity: the plain column name)
    val freshParts = fresh.map { rel =>
      rel -> rel.split("/").toSeq.init.flatMap { seg =>
        seg.split("=", 2) match {
          case Array(k, v) if keyByClone.contains(k) =>
            val key = keyByClone(k)
            val value = unescapeHive(v)
            val decoded =
              if (hexKeys(key) && value != hiveNullPartition)
                PartitionSpec.fromHexUtf8(value)
              else value
            Some(key -> decoded)
          case _ => None
        }
      }.toMap
    }.filter(_._2.nonEmpty).toMap
    (fresh, freshParts)
  }

  /** Invert Spark's hive path escaping (`%XX` per escaped byte). */
  private def unescapeHive(v: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '%' && i + 2 < v.length + 1 && i + 3 <= v.length)
        { sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar); i += 3 }
      else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Per-file column bounds from the parquet FOOTER — a metadata-only read
    * (one footer RPC per file, no data pages). Row-group stats are merged;
    * a column missing stats in ANY row group gets `None` bounds (file
    * stays un-prunable). Only top-level primitive columns are recorded:
    * INT32/INT64 (and INT64-micros timestamps) as `long`, FLOAT/DOUBLE as
    * `double`, UTF-8 BINARY as `string`. String bounds compare in unsigned
    * UTF-8 byte order — the order parquet computed them in. Commit calls
    * this once per fresh file on the driver; a bulk-backfill over millions
    * of existing files should distribute the footer reads instead.
    */
  private def footerStats(conf: org.apache.hadoop.conf.Configuration,
                          dir: String, rel: String): Map[String, ColStats] =
    footerMeta(conf, dir, rel)._1

  /** [[footerStats]] plus the file's exact row count (the block row counts
    * summed) — both from the one footer read.
    */
  private def footerMeta(conf: org.apache.hadoop.conf.Configuration,
                         dir: String, rel: String): (Map[String, ColStats], Long, Long) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val inputFile = HadoopInputFile.fromPath(new Path(dir, rel), conf)
    // open with options built over the SHARED conf: the no-options
    // ParquetFileReader.open(InputFile) overload constructs a fresh
    // `new Configuration()` whose first property read re-parses the Hadoop
    // XML defaults from the classpath jars — measured as ~40% of q153's
    // driver-gap samples (one full XML parse + jar scan PER COMMITTED
    // FILE; a 104-partition INSERT paid it 104 times). The shared conf's
    // properties are already loaded, so this build is a cheap wrap.
    val reader = ParquetFileReader.open(inputFile,
      org.apache.parquet.HadoopReadOptions.builder(conf, new Path(dir, rel)).build())
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val perCol = scala.collection.mutable.LinkedHashMap[String,
        (String, Option[(String, String)], Long)]() // typ, merged bounds, nulls
      for (b <- blocks; cc <- b.getColumns.asScala) {
        val path = cc.getPath.toArray
        if (path.length == 1) {
          val name = path(0)
          val pt = cc.getPrimitiveType
          val logical = Option(pt.getLogicalTypeAnnotation)
          val typ = pt.getPrimitiveTypeName match {
            case INT32 | INT64 => Some("long")
            case FLOAT | DOUBLE => Some("double")
            case BINARY
              if logical.exists(_.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]) =>
              Some("string")
            case _ => None
          }
          typ.foreach { t =>
            val st = cc.getStatistics
            val bounds: Option[(String, String)] =
              if (st == null || !st.hasNonNullValue) None
              else t match {
                case "string" =>
                  val mn = new String(st.getMinBytes, StandardCharsets.UTF_8)
                  val mx = new String(st.getMaxBytes, StandardCharsets.UTF_8)
                  if (mn.length > 64 || mx.length > 64) None else Some((mn, mx))
                case _ =>
                  // FLOAT bounds render through their EXACT double value:
                  // Float.toString's shortest form ("0.1") parses as a
                  // double BELOW (double)0.1f, understating the max — a
                  // probe at the exact widened value would wrongly prune
                  def s(v: Any): String = v match {
                    case f: java.lang.Float => f.doubleValue().toString
                    case other => other.toString
                  }
                  Some((s(st.genericGetMin), s(st.genericGetMax)))
              }
            val nulls = if (st != null && st.isNumNullsSet) st.getNumNulls else 0L
            perCol.get(name) match {
              case None => perCol(name) = (t, bounds, nulls)
              case Some((t0, b0, n0)) =>
                val merged = for (x <- b0; y <- bounds) yield t0 match {
                  case "long" =>
                    (math.min(x._1.toLong, y._1.toLong).toString,
                      math.max(x._2.toLong, y._2.toLong).toString)
                  case "double" =>
                    (math.min(x._1.toDouble, y._1.toDouble).toString,
                      math.max(x._2.toDouble, y._2.toDouble).toString)
                  case _ =>
                    (if (utf8Lt(x._1, y._1)) x._1 else y._1,
                      if (utf8Lt(x._2, y._2)) y._2 else x._2)
                }
                perCol(name) = (t0, merged, n0 + nulls)
            }
          }
        }
      }
      // byte size from the SAME file status the footer open already paid
      // for — recorded in the manifest so readers never re-stat the lake
      (perCol.map { case (n, (t, b, nulls)) =>
        n -> ColStats(t, b.map(_._1), b.map(_._2), nulls)
      }.toMap, blocks.map(_.getRowCount).sum, inputFile.getLength)
    } finally reader.close()
  }

  /** Unsigned UTF-8 byte-order less-than — parquet's string stat order. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def commit(df: DataFrame, dir: String, op: String,
                     combine: (Seq[String], Seq[String]) => Seq[String],
                     maxAttempts: Int = 10,
                     guard: Option[Snapshot => Unit] = None): Long = {
    val spark = df.sparkSession
    // column mapping: files spell physical names. `planWrite` renames the
    // logical frame and pre-assigns fresh physical names to evolution-added
    // columns (a re-added name must never resurrect a dropped column's
    // data) — identity on unmapped tables. Stale-mapping races are safe by
    // construction: physical names are immutable once assigned, so a
    // concurrent rename/drop cannot invalidate what we write; a concurrent
    // conflicting ADD is refused by mergeSchemas's collision check.
    val (dfP, dfSchema) = planWrite(spark, dir, df)
    // 1. write the new data files once, under a unique never-renamed prefix
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val dataRel = s"d-$nonce"
    dfP.write.mode("error").parquet(new Path(dir, dataRel).toString)
    val f = fs(spark, dir)
    val fresh = f.listStatus(new Path(dir, dataRel)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .sorted.map(n => s"$dataRel/$n")
    publishLoop(spark, dir, op, fresh, combine, maxAttempts, Some(dfSchema),
      guard = guard)
  }

  /** The data-file write plan for a logical frame against `dir`'s current
    * mapping: (frame with physical column names, the frame's LOGICAL
    * schema with mapping metadata attached) — the second half is what the
    * manifest records via [[mergeSchemas]]. Columns the table doesn't know
    * yet (widening evolution in the same commit) get a fresh physical name
    * when their logical name collides with a live or retired physical one.
    */
  /** CHECK constraints recorded as `graft.check.<name>` properties —
    * enforced on every row-bearing write through [[enforceChecks]].
    */
  private def checkConstraints(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq.collect {
      case (k, sql) if k.startsWith("graft.check.") =>
        k.stripPrefix("graft.check.") -> sql
    }.sortBy(_._1)

  /** Wrap a LOGICAL frame with the table's CHECK constraints: a violating
    * row fails the write with a named error (raise_error inside the
    * filter — codegen'd, zero cost when no row violates and a pure
    * identity when the table declares no constraints). NULL predicates
    * pass, per ANSI CHECK. Rows already in the table satisfy every
    * recorded constraint by induction (ADD CONSTRAINT validated them),
    * so rewrites (compaction, survivors) re-check at negligible cost.
    *
    * A SUBSET-SCHEMA batch (legal — [[mergeSchemas]] null-fills omitted
    * prior columns) may omit columns a constraint references; the
    * constraint must then evaluate against what READERS of the written
    * rows will see — the column's EXISTS_DEFAULT when one is recorded,
    * NULL otherwise — so the omitted columns are temporarily added as
    * those fill literals (and dropped again after the filters), instead
    * of failing resolution on a batch that is perfectly valid.
    */
  private def enforceChecks(df: DataFrame, snap: Option[Snapshot]): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, raise_error, when}
    val checks = checkConstraints(snap.map(_.props).getOrElse(Map.empty))
    if (checks.isEmpty) return df
    val missing = snap.flatMap(_.schema).map(ColumnMapping.stripMapping)
      .map(_.fields.toSeq.filterNot(f => df.columns.contains(f.name)))
      .getOrElse(Nil)
    val filled = missing.foldLeft(df) { (d, f) =>
      import org.apache.spark.sql.catalyst.util.{ResolveDefaultColumns => RDC}
      // the same fill value the parquet reader serves for a file missing
      // this column (internal-value existence default, else null)
      val fill = org.apache.spark.sql.catalyst.expressions.Literal(
        RDC.getExistenceDefaultValue(f), f.dataType)
      d.withColumn(f.name, org.apache.spark.sql.graft.StreamingShim.column(fill))
    }
    val checked = checks.foldLeft(filled) { case (d, (name, sql)) =>
      val p = expr(sql)
      d.filter(when(p || p.isNull, lit(true)).otherwise(raise_error(lit(
        s"[GRAFT_CHECK_VIOLATION] CHECK constraint '$name' ($sql) " +
          "violated by a written row"))))
    }
    if (missing.isEmpty) checked
    else checked.select(df.columns.toIndexedSeq.map(col): _*)
  }

  private def planWrite(spark: SparkSession, dir: String,
                        df0: DataFrame): (DataFrame, StructType) = {
    val snap = currentSnapshot(spark, dir)
    val df = enforceChecks(df0, snap)
    val snapSchema = snap.flatMap(_.schema)
    snapSchema match {
      case None => (df, df.schema)
      case Some(ss) =>
        val props = snap.map(_.props).getOrElse(Map.empty)
        val byName = ss.fields.map(f => f.name -> f).toMap
        // a batch column NARROWER than the table's (widened) type upcasts
        // losslessly here, so files always carry the declared type and
        // mergeSchemas' exact-type rule holds (the [[widens]] lattice)
        val resolved = StructType(df.schema.fields.map { f =>
          byName.get(f.name) match {
            case Some(tf) =>
              val typed =
                if (f.dataType != tf.dataType && widens(f.dataType, tf.dataType))
                  f.copy(dataType = tf.dataType)
                else f
              ColumnMapping.withPhysical(typed, ColumnMapping.physicalName(tf))
            case None =>
              ColumnMapping.withPhysical(f,
                ColumnMapping.freshPhysical(f.name, ss, props))
          }
        })
        val needsCast = df.schema.fields.zip(resolved.fields)
          .exists { case (a, b) => a.dataType != b.dataType }
        if (!needsCast && ColumnMapping.trivial(resolved)) (df, df.schema)
        else {
          import org.apache.spark.sql.functions.col
          val out = df.select(df.columns.toIndexedSeq.map { c =>
            val rf = resolved.fields(df.columns.indexOf(c))
            val cast = if (df.schema(c).dataType != rf.dataType)
              col(c).cast(rf.dataType) else col(c)
            cast.as(ColumnMapping.physicalName(rf))
          }: _*)
          (out, resolved)
        }
    }
  }

  /** Widening-only schema evolution rule: columns present in both must
    * keep their exact type (a type CHANGE would silently corrupt old
    * files' reads — refused at commit, the table-format contract);
    * batch-only columns append as nullable additions; prior-only columns
    * stay (old readers keep working, new files null-fill them on read).
    *
    * Nullability only ever WIDENS (Delta's column-add semantics): a prior
    * column the incoming batch omits becomes nullable — the new files
    * null-fill it, so advertising the old non-nullable flag would hand the
    * optimizer a license to elide isNull checks over genuinely null data —
    * and a column nullable on either side stays nullable.
    */
  /** LOSSLESS type promotions the parquet vectorized reader serves
    * natively (probed on this Spark: INT32 pages read under a LongType /
    * DoubleType read schema, FLOAT under DoubleType) — the set behind
    * `ALTER TABLE ALTER COLUMN … TYPE` as a METADATA-ONLY commit and
    * behind [[planWrite]]'s automatic upcast of narrower incoming
    * batches. Long→double and double→float are LOSSY and refused;
    * decimal/date promotions are out of scope.
    */
  private[graft] def widens(from: org.apache.spark.sql.types.DataType,
                            to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
      // DECIMAL(p,s) → DECIMAL(p+k,s): same scale, more precision — the
      // money-column evolution (amounts outgrowing DECIMAL(10,2)).
      // Lossless by construction (every (p,s) value is a (p+k,s) value)
      // and METADATA-ONLY: the vectorized parquet reader serves old
      // INT32/INT64/FLBA decimal pages under a wider same-scale read
      // schema natively (probed on this Spark in TypeWideningSpec,
      // including across the INT32→INT64→FLBA physical boundaries).
      // Scale changes refuse — they reinterpret the stored unscaled
      // integers.
      case (d1: DecimalType, d2: DecimalType) =>
        d2.scale == d1.scale && d2.precision > d1.precision
      case _ => false
    }
  }

  private[graft] def mergeSchemas(prev: StructType, next: StructType,
                                  prevProps: Map[String, String] = Map.empty): StructType = {
    val byName = next.fields.map(f => f.name -> f).toMap
    prev.fields.foreach { p =>
      byName.get(p.name).foreach { n =>
        require(n.dataType == p.dataType,
          s"schema evolution cannot change column '${p.name}' from " +
            s"${p.dataType.simpleString} to ${n.dataType.simpleString}")
      }
    }
    val prevNames = prev.fieldNames.toSet
    val carried = prev.fields.map { p =>
      byName.get(p.name) match {
        // the PREV field wins wholesale (its mapping metadata included —
        // a write's own resolved metadata can only restate it)
        case Some(n) => p.copy(nullable = p.nullable || n.nullable)
        case None    => p.copy(nullable = true) // new files null-fill it
      }
    }
    val appended = next.fields.filterNot(f => prevNames(f.name))
      .map(_.copy(nullable = true))
    // column-mapping collision backstop: an appended column's PHYSICAL
    // name must never equal a live or retired physical one (it would
    // address another column's bytes in old files / resurrect dropped
    // data). [[planWrite]] pre-assigns fresh names against its planning
    // snapshot; this re-check runs per publish attempt, so a lost race
    // against a concurrent rename/drop/add fails loudly instead of
    // corrupting — the caller's OCC retry (or the user) re-plans.
    val taken = ColumnMapping.takenPhysical(prev, prevProps)
    appended.foreach { f =>
      val phys = ColumnMapping.physicalName(f)
      require(!taken(phys),
        s"schema evolution cannot add column '${f.name}': physical name " +
          s"'$phys' already belongs to a live or dropped column — re-plan " +
          "the write against the current table state")
    }
    StructType(carried ++ appended)
  }

  /** Serialize the bloom entries of `files` into the manifest body —
    * shared by [[publishLoop]] (lineage carry) and [[publishExternal]]
    * (clone rekey).
    */
  private def writeBloomsNode(body: com.fasterxml.jackson.databind.node.ObjectNode,
                              files: Seq[String],
                              blooms: Map[String, Map[String, BloomIndex]]): Unit = {
    val written = files.flatMap(rel => blooms.get(rel).filter(_.nonEmpty).map(rel -> _))
    if (written.nonEmpty) {
      val node = body.putObject("blooms")
      written.foreach { case (rel, cols) =>
        val fNode = node.putObject(rel)
        cols.foreach { case (c, b) =>
          val bb = java.nio.ByteBuffer.allocate(b.words.length * 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.words.foreach(bb.putLong)
          val cn = fNode.putObject(c)
          cn.put("m", b.bits)
          cn.put("k", b.k)
          cn.put("b64", java.util.Base64.getEncoder.encodeToString(bb.array())): Unit
        }
      }
    }
  }

  /** Serialize the dv refs of `files` into the manifest body. */
  private def writeDvsNode(body: com.fasterxml.jackson.databind.node.ObjectNode,
                           files: Seq[String],
                           dvs: Map[String, DvRef]): Unit = {
    val written = files.flatMap(rel => dvs.get(rel).filter(_.files.nonEmpty).map(rel -> _))
    if (written.nonEmpty) {
      val node = body.putObject("dvs")
      written.foreach { case (rel, ref) =>
        val n = node.putObject(rel)
        val arr = n.putArray("files")
        ref.files.foreach(arr.add)
        n.put("deleted", ref.deleted): Unit
      }
    }
  }

  /** The snapshot a COLD PARSE of a full manifest for this state would
    * yield: per-file maps restricted to the committed file list, empty
    * inner maps and empty dv refs dropped (the serializers never write
    * them, so a parse never returns them). Both manifest serializers and
    * the delta diff work from this normal form — it is what makes
    * "reconstructed snapshot == written snapshot" hold field-for-field.
    */
  private def normalizedSnapshot(version: Long, files: Seq[String], op: String,
                                 stats: Map[String, Map[String, ColStats]],
                                 rows: Map[String, Long],
                                 schema: Option[StructType],
                                 parts: Map[String, Map[String, String]],
                                 blooms: Map[String, Map[String, BloomIndex]],
                                 dvs: Map[String, DvRef],
                                 sizes: Map[String, Long],
                                 pcols: Seq[String],
                                 props: Map[String, String]): Snapshot =
    Snapshot(version, files, op,
      stats = files.iterator.flatMap(r =>
        stats.get(r).filter(_.nonEmpty).map(r -> _)).toMap,
      rows = files.iterator.flatMap(r => rows.get(r).map(r -> _)).toMap,
      schema = schema,
      parts = files.iterator.flatMap(r =>
        parts.get(r).filter(_.nonEmpty).map(r -> _)).toMap,
      blooms = files.iterator.flatMap(r =>
        blooms.get(r).filter(_.nonEmpty).map(r -> _)).toMap,
      dvs = files.iterator.flatMap(r =>
        dvs.get(r).filter(_.files.nonEmpty).map(r -> _)).toMap,
      sizes = files.iterator.flatMap(r => sizes.get(r).map(r -> _)).toMap,
      partitionCols = pcols, props = props)

  /** Serialize a normalized snapshot as a FULL manifest (checkpoint) —
    * the classic single-manifest body, unchanged on disk since v1 so
    * every existing table keeps parsing.
    */
  private def fullBodyOf(s: Snapshot): String = {
    val body = mapper.createObjectNode()
    body.put("version", s.version)
    body.put("op", s.op)
    val arr = body.putArray("files")
    s.files.foreach(arr.add)
    val statsNode = body.putObject("stats")
    s.files.foreach { rel =>
      s.stats.get(rel).filter(_.nonEmpty).foreach { cols =>
        val fNode = statsNode.putObject(rel)
        cols.foreach { case (c, cs) =>
          val cn = fNode.putObject(c)
          cn.put("t", cs.typ)
          cs.min.foreach(cn.put("min", _))
          cs.max.foreach(cn.put("max", _))
          cn.put("nulls", cs.nullCount): Unit
        }
      }
    }
    val rowsNode = body.putObject("rows")
    s.files.foreach(rel => s.rows.get(rel).foreach(rowsNode.put(rel, _)))
    val sizesNode = body.putObject("sizes")
    s.files.foreach(rel => s.sizes.get(rel).foreach(sizesNode.put(rel, _)))
    s.schema.foreach(sc => body.put("schema", sc.json))
    val partsWritten = s.files.flatMap(rel =>
      s.parts.get(rel).filter(_.nonEmpty).map(rel -> _))
    if (partsWritten.nonEmpty) {
      val partsNode = body.putObject("parts")
      partsWritten.foreach { case (rel, kvs) =>
        val n = partsNode.putObject(rel)
        kvs.foreach { case (k, v) => n.put(k, v): Unit }
      }
    }
    writeBloomsNode(body, s.files, s.blooms)
    writeDvsNode(body, s.files, s.dvs)
    if (s.partitionCols.nonEmpty) {
      val pArr = body.putArray("partitionCols")
      s.partitionCols.foreach(pArr.add)
    }
    if (s.props.nonEmpty) {
      val prNode = body.putObject("props")
      s.props.toSeq.sorted.foreach { case (k, v) => prNode.put(k, v): Unit }
    }
    mapper.writeValueAsString(body)
  }

  /** One file's complete per-file metadata as a delta `add`/`patch` entry
    * — the write half of [[parseFileMeta]]'s replace-all contract.
    */
  private def writeFileEntry(arr: com.fasterxml.jackson.databind.node.ArrayNode,
                             rel: String, s: Snapshot): Unit = {
    val e = arr.addObject()
    e.put("f", rel)
    s.stats.get(rel).filter(_.nonEmpty).foreach { cols =>
      val n = e.putObject("stats")
      cols.foreach { case (c, cs) =>
        val cn = n.putObject(c)
        cn.put("t", cs.typ)
        cs.min.foreach(cn.put("min", _))
        cs.max.foreach(cn.put("max", _))
        cn.put("nulls", cs.nullCount): Unit
      }
    }
    s.rows.get(rel).foreach(e.put("rows", _))
    s.sizes.get(rel).foreach(e.put("size", _))
    s.parts.get(rel).filter(_.nonEmpty).foreach { kvs =>
      val n = e.putObject("parts")
      kvs.foreach { case (k, v) => n.put(k, v): Unit }
    }
    s.blooms.get(rel).filter(_.nonEmpty).foreach { cols =>
      val n = e.putObject("blooms")
      cols.foreach { case (c, b) =>
        val bb = java.nio.ByteBuffer.allocate(b.words.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.words.foreach(bb.putLong)
        val cn = n.putObject(c)
        cn.put("m", b.bits)
        cn.put("k", b.k)
        cn.put("b64", java.util.Base64.getEncoder.encodeToString(bb.array())): Unit
      }
    }
    s.dvs.get(rel).foreach { ref =>
      val n = e.putObject("dv")
      val fArr = n.putArray("files")
      ref.files.foreach(fArr.add)
      n.put("deleted", ref.deleted): Unit
    }
  }

  /** Bloom maps compare by CONTENT: BloomIndex carries an Array, whose
    * case-class equality is reference identity — structural == would call
    * every carried bloom "changed" and every commit would patch them all.
    */
  private def bloomColsEq(a: Option[Map[String, BloomIndex]],
                          b: Option[Map[String, BloomIndex]]): Boolean = (a, b) match {
    case (None, None) => true
    case (Some(x), Some(y)) =>
      x.size == y.size && x.forall { case (c, bi) =>
        y.get(c).exists(o => o.bits == bi.bits && o.k == bi.k &&
          java.util.Arrays.equals(o.words, bi.words))
      }
    case _ => false
  }

  /** Serialize `next` as a DELTA against `prev`, or None when a full
    * manifest is the better (or only correct) form:
    *   - the survivors' relative order changed — a delta expresses
    *     exactly drop-in-place + append-at-tail, nothing else;
    *   - the commit touched most of the table (overwrite, truncate, full
    *     compaction) — the delta would be no smaller than a checkpoint,
    *     and checkpointing resets the chain for free.
    * Surviving files whose per-file metadata changed (dv appends, bloom
    * builds) become `patch` entries carrying the file's COMPLETE new
    * metadata. Schema/partitionCols/props are recorded in full — they are
    * bytes-small and make every delta self-contained for the table-level
    * planes.
    */
  private def serializeDelta(prev: Snapshot, next: Snapshot): Option[String] = {
    val nextSet = next.files.toSet
    val prevSet = prev.files.toSet
    val removed = prev.files.filterNot(nextSet)
    val removedSet = removed.toSet
    val adds = next.files.filterNot(prevSet)
    if (prev.files.filterNot(removedSet) ++ adds != next.files) return None
    // eq-first per plane: the incremental write-side construction
    // structure-shares surviving entries with prev, so the common case
    // is reference identity — the scan costs ∝ files but with a
    // hash-lookup constant, no deep compares
    def refEq[T](a: Option[T], b: Option[T])(cmp: (T, T) => Boolean): Boolean =
      (a, b) match {
        case (None, None) => true
        case (Some(x), Some(y)) =>
          (x.asInstanceOf[AnyRef] eq y.asInstanceOf[AnyRef]) || cmp(x, y)
        case _ => false
      }
    def metaEq(rel: String): Boolean =
      refEq(prev.stats.get(rel), next.stats.get(rel))(_ == _) &&
        prev.rows.get(rel) == next.rows.get(rel) &&
        prev.sizes.get(rel) == next.sizes.get(rel) &&
        refEq(prev.parts.get(rel), next.parts.get(rel))(_ == _) &&
        refEq(prev.dvs.get(rel), next.dvs.get(rel))(_ == _) &&
        refEq(prev.blooms.get(rel), next.blooms.get(rel))(
          (x, y) => bloomColsEq(Some(x), Some(y)))
    val patches = next.files.filter(r => prevSet(r) && !metaEq(r))
    if (adds.size + removed.size + patches.size >= next.files.size) return None
    val body = mapper.createObjectNode()
    body.put("version", next.version)
    body.put("op", next.op)
    body.put("base", prev.version)
    if (removed.nonEmpty) {
      val a = body.putArray("remove")
      removed.foreach(a.add)
    }
    if (adds.nonEmpty) {
      val a = body.putArray("add")
      adds.foreach(writeFileEntry(a, _, next))
    }
    if (patches.nonEmpty) {
      val a = body.putArray("patch")
      patches.foreach(writeFileEntry(a, _, next))
    }
    next.schema.foreach(sc => body.put("schema", sc.json))
    if (next.partitionCols.nonEmpty) {
      val pArr = body.putArray("partitionCols")
      next.partitionCols.foreach(pArr.add)
    }
    if (next.props.nonEmpty) {
      val prNode = body.putObject("props")
      next.props.toSeq.sorted.foreach { case (k, v) => prNode.put(k, v): Unit }
    }
    Some(mapper.writeValueAsString(body))
  }

  /** The optimistic slot-claim loop, separated from the data write so ops
    * that only DROP files (a delete whose matches cover whole files) can
    * commit with `fresh = Nil` and no data job at all.
    */
  private def publishLoop(spark: SparkSession, dir: String, op: String,
                          fresh: Seq[String],
                          combine: (Seq[String], Seq[String]) => Seq[String],
                          maxAttempts: Int = 10,
                          dfSchema: Option[StructType] = None,
                          freshParts: Map[String, Map[String, String]] = Map.empty,
                          freshBlooms: Map[String, Map[String, BloomIndex]] = Map.empty,
                          freshDvDeltas: Map[String, DvRef] = Map.empty,
                          guard: Option[Snapshot => Unit] = None,
                          propsUpdate: Map[String, String] => Map[String, String]
                            = identity,
                          schemaExact: Boolean = false,
                          pcolsUpdate: Seq[String] => Seq[String]
                            = identity): Long = {
    val f = fs(spark, dir)
    // harvest footer stats ONCE per fresh file (outside the retry loop —
    // lost races re-publish the manifest, never re-read footers)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val freshMeta = fresh.map(r => r -> footerMeta(hadoopConf, dir, r)).toMap
    val freshStats = freshMeta.view.mapValues(_._1).toMap
    val freshRows = freshMeta.view.mapValues(_._2).toMap
    val freshSizes = freshMeta.view.mapValues(_._3).toMap
    // 2. claim the next version slot; on a lost race, re-base and retry —
    //    only the manifest publish repeats, never the data write
    var attempt = 0
    while (attempt < maxAttempts) {
      // Read the claimed high-water mark BEFORE resolving the snapshot: in
      // the other order a slot claimed between the two reads would make
      // this writer base its file list on the older snapshot while
      // versioning past the newer one — silently dropping the newer
      // commit's files from the lineage.
      val claimed = maxClaimedVersion(f, dir)
      val prev = currentSnapshot(spark, dir)
      val prevV = prev.map(_.version).getOrElse(0L)
      if (claimed > prevV && attempt < maxAttempts - 2) {
        // a slot exists above the newest parseable snapshot. With atomic
        // publish (local FS / conditional PUT) that cannot happen; on a
        // backend with a claim-then-write window it is an in-flight
        // publish — wait briefly for the body rather than re-base on the
        // stale snapshot. Only the final attempts advance past it (crashed
        // writer's corpse), so a corpse delays commits, never loses them.
        Thread.sleep(20L << math.min(attempt, 4))
        attempt += 1
      } else {
        // conflict guard against the CURRENT snapshot (re-read each
        // attempt): a writer whose plan depends on more than the file list
        // (dv refs) re-validates here and aborts loudly on interference
        guard.foreach(g => g(prev.getOrElse(Snapshot(0L, Nil, "none"))))
        val version = math.max(claimed, prevV) + 1
        val files = combine(prev.map(_.files).getOrElse(Nil), fresh)
        // stats travel with the lineage: surviving files keep the bounds
        // their adding commit harvested, fresh files add theirs
        val carried = prev.map(_.stats).getOrElse(Map.empty) ++ freshStats
        // exact per-file row counts (same footer read as the stats): the
        // metadata-only COUNT(*) path; carried through commits like stats
        val carriedRows = prev.map(_.rows).getOrElse(Map.empty) ++ freshRows
        // per-file byte sizes (same footer open): the read path's
        // FileIndex plans splits and sizeInBytes with zero re-stat RPCs
        val carriedSizes = prev.map(_.sizes).getOrElse(Map.empty) ++ freshSizes
        // the table schema travels in the manifest (self-describing table):
        // widened by each commit under the widening-only evolution rule;
        // a drop-only commit (fresh = Nil) carries the previous schema.
        // `schemaExact` (ALTER RENAME/DROP COLUMN) records dfSchema
        // VERBATIM — the caller's guard proves the base schema unchanged,
        // so the non-widening edit cannot clobber a concurrent evolution
        val tableSchema = (prev.flatMap(_.schema), dfSchema) match {
          case (_, Some(n)) if schemaExact => Some(n)
          case (Some(p), Some(n)) =>
            Some(mergeSchemas(p, n, prev.map(_.props).getOrElse(Map.empty)))
          case (p, n) => n.orElse(p)
        }
        // explicit per-file partition values travel with the lineage like
        // stats: surviving partitioned files keep theirs, fresh files add
        // theirs; rewritten files (compaction, MERGE) simply drop out
        val carriedParts = prev.map(_.parts).getOrElse(Map.empty) ++ freshParts
        // blooms travel with the lineage like stats: surviving files keep
        // theirs, rewritten files (compaction, MERGE) drop out and stay
        // un-bloomed (= un-prunable, safe) until the next buildBlooms pass.
        // Merge per-FILE maps against prev INSIDE the retry loop (not the
        // caller's planning snapshot): concurrent buildBlooms runs on
        // different columns compose instead of the later one dropping the
        // earlier one's columns for shared files
        val prevBlooms = prev.map(_.blooms).getOrElse(Map.empty)
        val carriedBlooms = prevBlooms ++ freshBlooms.map { case (rel, cols) =>
          rel -> (prevBlooms.getOrElse(rel, Map.empty) ++ cols)
        }
        // dv refs: carried like stats; deltas APPEND to the current ref
        // (the deleteWhere guard proves the base unchanged, so append is
        // exact); rewritten files drop their entries with themselves
        val prevDvs = prev.map(_.dvs).getOrElse(Map.empty)
        val carriedDvs = prevDvs ++ freshDvDeltas.map { case (rel, d) =>
          val ex = prevDvs.getOrElse(rel, DvRef(Nil, 0L))
          rel -> DvRef(ex.files ++ d.files, ex.deleted + d.deleted)
        }
        // declared table-level partition columns travel with the lineage
        // (the catalog routes writes by them); pcolsUpdate applies INSIDE
        // the retry loop against the attempt's own snapshot — the
        // partition-spec-evolution commit ([[setPartitionSpec]]) composes
        // with concurrent writers instead of last-writer-dropping.
        // propsUpdate likewise, so concurrent SET/UNSET compose.
        val pcols = pcolsUpdate(prev.map(_.partitionCols).getOrElse(Nil))
        val props = propsUpdate(prev.map(_.props).getOrElse(Map.empty))
        // the committed snapshot, NORMALIZED exactly as a cold parse of
        // its serialized form yields it (per-file maps restricted to the
        // file list, empty inner maps dropped) — the single state both
        // serializers and the delta diff work from. Built INCREMENTALLY
        // from prev when it exists: the carried maps structure-share with
        // prev's, so dropping the removed rels and vetting only the
        // CHANGED keys costs ∝ the commit, where a rebuild-from-scratch
        // costs ∝ total table files per commit — the residual in-memory
        // half of the metadata term the delta bodies remove on disk.
        // Equivalence with the from-scratch form: prev is normalized, so
        // its surviving entries need no re-vetting; only fresh/changed
        // keys can introduce out-of-list or empty entries.
        val next = prev match {
          case Some(p) =>
            val filesSet = files.toSet
            val removed = p.files.filterNot(filesSet)
            def inc[T](carriedM: Map[String, T], changedKeys: Iterable[String],
                       keep: T => Boolean): Map[String, T] = {
              var r = if (removed.isEmpty) carriedM else carriedM -- removed
              changedKeys.foreach { k =>
                r.get(k) match {
                  case Some(v) if !filesSet(k) || !keep(v) => r -= k
                  case _ =>
                }
              }
              r
            }
            Snapshot(version, files, op,
              stats = inc(carried, freshStats.keys, (_: Map[String, ColStats]).nonEmpty),
              rows = inc(carriedRows, freshRows.keys, (_: Long) => true),
              schema = tableSchema,
              parts = inc(carriedParts, freshParts.keys,
                (_: Map[String, String]).nonEmpty),
              blooms = inc(carriedBlooms, freshBlooms.keys,
                (_: Map[String, BloomIndex]).nonEmpty),
              dvs = inc(carriedDvs, freshDvDeltas.keys,
                (_: DvRef).files.nonEmpty),
              sizes = inc(carriedSizes, freshSizes.keys, (_: Long) => true),
              partitionCols = pcols, props = props)
          case None =>
            normalizedSnapshot(version, files, op, carried, carriedRows,
              tableSchema, carriedParts, carriedBlooms, carriedDvs,
              carriedSizes, pcols, props)
        }
        // delta-or-checkpoint: a delta body carries only the commit's own
        // adds/removes/patches + an explicit base pointer; fall back to a
        // full manifest when the chain hits the checkpoint interval, the
        // commit rewrote most of the table, or the survivors' ORDER
        // changed (a delta can only express drop-in-place + append)
        val body = prev
          .filter(_.deltaChain + 1 < checkpointInterval(props))
          .flatMap(p => serializeDelta(p, next))
          .getOrElse(fullBodyOf(next))
        if (publish(f, dir, version, body)) return version
        attempt += 1
      }
    }
    throw new java.io.IOException(
      s"manifest commit on $dir lost $maxAttempts straight races — aborting")
  }

  /** Zero-copy fork: commit a NEW table at `dstDir` whose v1 manifest
    * references `srcDir`'s data files IN PLACE (as fully-qualified URIs) —
    * Delta's SHALLOW CLONE, the experimentation primitive ("try the new
    * dedup threshold against yesterday's 100 TB snapshot") at metadata
    * cost: no data moves, stats/row-counts/schema/partition values carry
    * over, and the clone then lives its own life — appends land as
    * dst-local files, compaction/MERGE rewrite referenced source files
    * into dst-local ones, vacuum on the CLONE never touches source data
    * (foreign URIs match no local directory walk).
    *
    * The classic shallow-clone hazard — vacuum on the SOURCE collecting
    * files a clone still references — is closed structurally: the clone
    * first pins its source version under an auto-generated source tag
    * (`clone-<nonce>`, recorded in the clone's `op` string), and [[vacuum]]
    * keeps every tagged version whole. Dropping the clone = deleting its
    * directory + [[deleteTag]] on the source to release the pin.
    *
    * Cloning a CLONE pins only the intermediate (whose files are mostly
    * foreign references): the chain's tags must stay alive as long as any
    * descendant does — release pins leaf-to-root when dismantling a clone
    * lineage.
    */
  def cloneShallow(spark: SparkSession, srcDir: String, dstDir: String,
                   version: Option[Long] = None): Long = {
    val srcFs = fs(spark, srcDir)
    val snap = version.map(readManifest(spark, srcDir, _))
      .orElse(currentSnapshot(spark, srcDir))
      .getOrElse(throw new IllegalStateException(s"no committed version at $srcDir"))
    require(maxClaimedVersion(fs(spark, dstDir), dstDir) == 0L,
      s"clone target $dstDir already has commits")
    // pin FIRST: between this tag and the dst commit the clone is
    // over-protected, never under-protected
    val tagName = s"clone-${java.util.UUID.randomUUID().toString.take(12)}"
    tag(spark, srcDir, tagName, snap.version)
    val srcBase = srcFs.makeQualified(new Path(srcDir))
    val rekey = snap.files.map(rel => rel -> new Path(srcBase, rel).toString).toMap
    publishExternal(spark, dstDir,
      op = s"clone:$srcDir@${snap.version}#$tagName",
      files = snap.files.map(rekey),
      stats = snap.stats.flatMap { case (k, v) => rekey.get(k).map(_ -> v) },
      rows = snap.rows.flatMap { case (k, v) => rekey.get(k).map(_ -> v) },
      schema = snap.schema,
      parts = snap.parts.flatMap { case (k, v) => rekey.get(k).map(_ -> v) },
      blooms = snap.blooms.flatMap { case (k, v) => rekey.get(k).map(_ -> v) },
      dvs = snap.dvs.flatMap { case (k, v) =>
        // dv sidecars rekey to absolute source URIs like the data files
        rekey.get(k).map(_ -> v.copy(files = v.files.map(r =>
          new Path(srcBase, r).toString)))
      },
      sizes = snap.sizes.flatMap { case (k, v) => rekey.get(k).map(_ -> v) },
      partitionCols = snap.partitionCols, props = snap.props)
  }

  /** Publish a manifest with EXTERNALLY-supplied content (no footer
    * harvesting, no previous-snapshot merge) as the FIRST version of an
    * empty table — the clone commit path. Same claim/publish discipline
    * as [[publishLoop]].
    */
  private def publishExternal(spark: SparkSession, dir: String, op: String,
                              files: Seq[String],
                              stats: Map[String, Map[String, ColStats]],
                              rows: Map[String, Long],
                              schema: Option[StructType],
                              parts: Map[String, Map[String, String]],
                              blooms: Map[String, Map[String, BloomIndex]] = Map.empty,
                              dvs: Map[String, DvRef] = Map.empty,
                              firstVersionOnly: Boolean = true,
                              maxAttempts: Int = 10,
                              expectVersion: Option[Long] = None,
                              sizes: Map[String, Long] = Map.empty,
                              partitionCols: Seq[String] = Nil,
                              props: Map[String, String] = Map.empty): Long = {
    val f = fs(spark, dir)
    var attempt = 0
    while (attempt < maxAttempts) {
      val version = math.max(maxClaimedVersion(f, dir),
        currentSnapshot(spark, dir).map(_.version).getOrElse(0L)) + 1
      require(!firstVersionOnly || version == 1L,
        s"external publish into non-empty table $dir")
      // caller pinned the slot it planned for (restore): a concurrent
      // commit advancing the table past it must abort, not be shadowed
      expectVersion.foreach { e =>
        if (version != e) throw new java.util.ConcurrentModificationException(
          s"table $dir advanced to slot $version while a v$e commit was " +
            "planned — replan against the current snapshot")
      }
      // always a FULL manifest: external publishes (CTAS/REPLACE, restore,
      // clone) redefine the table or re-reference an old state wholesale —
      // a delta would be no smaller, and an arbitrary file ORDER is only
      // expressible in the full form
      val body = fullBodyOf(normalizedSnapshot(version, files, op, stats,
        rows, schema, parts, blooms, dvs, sizes, partitionCols, props))
      if (publish(f, dir, version, body)) return version
      attempt += 1
    }
    throw new java.io.IOException(
      s"manifest commit on $dir lost $maxAttempts straight races — aborting")
  }

  private def maxClaimedVersion(f: FileSystem, dir: String): Long = {
    val md = manifestDir(dir)
    if (!f.exists(md)) return 0L
    f.listStatus(md).toSeq.flatMap(s => s.getPath.getName match {
      case manifestName(v) => Some(v.toLong)
      case _ => None
    }).foldLeft(0L)(math.max)
  }

  /** Atomically publish `vNNNNNNNN.json` through the pluggable
    * [[ManifestPublisher]] seam — claim + body in one indivisible step
    * (see the trait doc for why, and for the object-store port contract).
    * False = lost race, caller re-bases.
    */
  private def publish(f: FileSystem, dir: String, version: Long, body: String): Boolean = {
    val pub = publisherOverride.getOrElse(ManifestPublisher.default(f))
    pub.publish(f, manifestPath(dir, version), body.getBytes(StandardCharsets.UTF_8))
  }

  /** Backend override for the slot claim — the object-store port point.
    * Production S3/GCS deployments install their conditional-PUT publisher
    * here once per JVM; tests install racing fakes. None → scheme-based
    * default ([[ManifestPublisher.default]]).
    */
  @volatile private[graft] var publisherOverride: Option[ManifestPublisher] = None

  /** Rewrite the current contents as one fresh version with `numFiles`
    * output files — the maintenance pass for append-heavy tables whose
    * manifests accumulate one small file per commit (every streaming
    * micro-batch, every incremental run). Readers are never disturbed: the
    * compacted version commits through the same optimistic protocol, old
    * versions remain time-travelable until [[vacuum]]. Returns the new
    * version.
    */
  def compact(spark: SparkSession, dir: String, schema: StructType,
              numFiles: Int = 1): Long = currentSnapshot(spark, dir) match {
    case None =>
      commit(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema),
        dir, "compact", (_, fresh) => fresh)
    case Some(snap) =>
      val cur = readSnapshot(spark, dir, snap, schema)
      // op "compact", not "overwrite": the manifest records this commit as
      // data-neutral, which lets [[changes]] skip it without a diff job.
      // The full rewrite replaces the ENTIRE file list, so ANY commit
      // landing after the read must abort it: a concurrent append's rows
      // would be silently dropped, and a concurrent deleteWhere's
      // tombstones silently resurrected (the output was read before
      // them). compactSmall is the concurrent-append-tolerant form.
      commit(cur.coalesce(math.max(1, numFiles)), dir, "compact",
        (_, fresh) => fresh,
        guard = Some { prev =>
          if (prev.files != snap.files || prev.dvs != snap.dvs)
            throw new java.util.ConcurrentModificationException(
              s"snapshot changed under compact on $dir — retry, or use " +
                "compactSmall for concurrent-append-tolerant maintenance")
        })
  }

  /** Incremental OPTIMIZE: rewrite only the current snapshot's files
    * smaller than `minFileBytes` into ~`targetFileBytes` outputs, leaving
    * right-sized files untouched — on a 100 TB table the full-rewrite
    * [[compact]] is not an option, and 99% of the small-file debt from
    * streaming micro-batches lives in the newest commits anyway.
    *
    * Concurrency: the rewrite commits through the optimistic protocol
    * with `combine = (prev minus compacted-smalls) ++ fresh`, evaluated
    * against the snapshot AT COMMIT TIME — an append that lands mid-
    * compaction re-bases this commit and its files survive (they are not
    * in the compacted-small set). Rows are therefore never lost or
    * duplicated: exactly the small files read are the ones removed.
    * Returns None (nothing to do: fewer than 2 small files) or the new
    * version.
    *
    * `maxInputBytes` bounds ONE call's rewrite to that much small-file
    * INPUT (whole partition groups, deterministic walk, always ≥ 1 group
    * so an oversized group cannot stall the debt) — the 100 TB form, like
    * [[migrateLayout]]: months of micro-batch debt drain one bounded
    * optimistic commit at a time, and repeated calls converge to None.
    * Two fine-print clauses of that drain protocol: (a) None also covers
    * a CONCURRENT-CONFLICT abort (same as migrateLayout's NULL) —
    * conflicts are transient, so a drain loop that wants certainty
    * re-calls after a None and treats two consecutive Nones as drained;
    * (b) convergence needs `targetFileBytes ≥ 2 × minFileBytes` (each
    * multi-file group's outputs are then ≥ targetFileBytes/2 ≥
    * minFileBytes and leave the debt set) — with a smaller target a
    * group can re-enter the small set each call and the loop rewrites
    * it forever.
    */
  def compactSmall(spark: SparkSession, dir: String, schema: StructType,
                   minFileBytes: Long = 32L * 1024 * 1024,
                   targetFileBytes: Long = 128L * 1024 * 1024,
                   zorderCols: Seq[String] = Nil,
                   maxInputBytes: Option[Long] = None): Option[Long] =
    compactSmall(spark, dir, schema, minFileBytes, targetFileBytes, () => (),
      zorderCols, maxInputBytes)

  /** [[compactSmall]] with a race-injection seam: `midFlight` runs after
    * the small-file set is fixed and before the commit — the window a
    * concurrent writer's commit can land in. Spec-only entry point for
    * deterministically exercising the append-survives / overwrite-aborts
    * conflict rules.
    */
  private[graft] def compactSmall(spark: SparkSession, dir: String,
                                  schema: StructType, minFileBytes: Long,
                                  targetFileBytes: Long,
                                  midFlight: () => Unit): Option[Long] =
    compactSmall(spark, dir, schema, minFileBytes, targetFileBytes, midFlight,
      Nil, None)

  private[graft] def compactSmall(spark: SparkSession, dir: String,
                                  schema: StructType, minFileBytes: Long,
                                  targetFileBytes: Long,
                                  midFlight: () => Unit,
                                  zorderCols0: Seq[String],
                                  maxInputBytes: Option[Long]): Option[Long] = {
    // convergence fine-print (b) in the scaladoc, surfaced at runtime: a
    // warning, not a require — deliberate one-shot uses (e.g. minFileBytes
    // = MaxValue to force-compact everything once) are legitimate; only
    // REPEATED drain loops risk non-termination, and the SQL procedure
    // enforces the precondition hard at its surface.
    if (minFileBytes <= Long.MaxValue / 2 && targetFileBytes < 2 * minFileBytes)
      log.warn(s"compactSmall on $dir: targetFileBytes=$targetFileBytes < " +
        s"2*minFileBytes=${2 * minFileBytes} — rewritten groups can re-enter " +
        "the small set, so a repeat-until-None drain loop may never converge")
    val f = fs(spark, dir)
    val snap = currentSnapshot(spark, dir).getOrElse(return None)
    // no explicit Z-order columns → the table's DECLARED clustering
    // (CREATE/ALTER … CLUSTER BY, stored as immutable physical names in
    // the graft.cluster property) — every un-parameterized maintenance
    // pass (CALL compact_small, streaming autoCompact) self-clusters
    val zorderCols: Seq[String] =
      if (zorderCols0.nonEmpty) zorderCols0
      else snap.props.get("graft.cluster").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        .map(c => snap.schema match {
          case Some(ss) => ColumnMapping.logicalFor(ss, c)
          case None => c
        })
    // manifest-recorded sizes first (zero RPCs); stat only pre-sizes files
    val sized = snap.files.map { rel =>
      rel -> snap.sizes.getOrElse(rel,
        f.getFileStatus(new Path(dir, rel)).getLen)
    }
    val small = sized.filter(_._2 < minFileBytes)
    // PARTITION-AWARE grouping: rewriting across partition boundaries
    // would erase the per-file partition values pruneFiles/deleteRange
    // plan on (a mixed-partition output can only carry footer stats), so
    // each partition-value group compacts to its own outputs, which keep
    // the group's partition entry. Unpartitioned files form one group
    // (empty value map) — the pre-partitioning behavior. Singleton groups
    // gain nothing from a rewrite and are left alone, which also means
    // compaction never consolidates ACROSS partitions — the deliberate
    // tradeoff that preserves pruning metadata.
    val allGroups = small
      .groupBy(s => snap.parts.getOrElse(s._1, Map.empty[String, String]))
      .filter(_._2.size >= 2).toSeq
    if (allGroups.isEmpty) return None // nothing to gain from a rewrite
    // bounded form: walk the groups in a deterministic order (smallest
    // member path — stable across retries against the same snapshot) and
    // take whole groups while their summed INPUT stays under the cap; the
    // first group is always taken so one oversized partition's debt still
    // drains. Unselected groups wait for the next call — each call is one
    // optimistic commit, so a 100 TB backlog compacts in bounded bites.
    val groups = maxInputBytes match {
      case None => allGroups
      case Some(cap) =>
        takeBounded(allGroups.sortBy(_._2.map(_._1).min), cap)(_._2.map(_._2).sum)
    }
    val smallSet = groups.flatMap(_._2.map(_._1)).toSet
    midFlight()
    val freshAll = Seq.newBuilder[String]
    val freshParts = Map.newBuilder[String, Map[String, String]]
    groups.foreach { case (partVals, files) =>
      val nOut = math.max(1, math.ceil(files.map(_._2).sum.toDouble
        / targetFileBytes).toInt)
      // LOGICAL read (dv tombstones applied): compaction materializes
      // merge-on-read deletes; the dv guard below aborts if new tombstones
      // land on these files after this read
      val raw = readSnapshot(spark, dir,
        snap.copy(files = files.map(_._1)), schema)
      // zorderCols turns the rewrite into OPTIMIZE ZORDER BY: the squashed
      // rows are Morton-clustered (Landing.zorderValue's rank-normalized
      // interleave) and range-partitioned on the z-value, so the compacted
      // files' manifest stats become tight in EVERY listed dimension — the
      // maintenance pass that makes pruneFiles/rangeScan/deleteRange/
      // upsertKeyed progressively cheaper as a table ages, instead of
      // inheriting whatever clustering the micro-batches arrived with
      val df =
        if (zorderCols.isEmpty) raw.coalesce(nOut)
        else {
          val z = Landing.zorderValue(raw, zorderCols)
          raw.withColumn("_z", z)
            .repartitionByRange(nOut, org.apache.spark.sql.functions.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
        }
      val nonce = java.util.UUID.randomUUID().toString.take(12)
      val dataRel = s"d-$nonce"
      ColumnMapping.toPhysical(df, ColumnMapping.resolve(schema, snap.schema))
        .write.mode("error").parquet(new Path(dir, dataRel).toString)
      val fresh = f.listStatus(new Path(dir, dataRel)).toSeq
        .map(_.getPath.getName).filter(_.endsWith(".parquet"))
        .sorted.map(n => s"$dataRel/$n")
      freshAll ++= fresh
      if (partVals.nonEmpty) fresh.foreach(r => freshParts += r -> partVals)
    }
    // combine runs against the snapshot at commit time (re-based on lost
    // races). A concurrent APPEND is fine — its files are not in the
    // compacted set and pass through untouched. A concurrent OVERWRITE (or
    // competing compaction) that removed any compacted-small file means
    // those rows were deliberately dropped or already rewritten — swapping
    // in our rewrite would resurrect them, so the compaction aborts
    // instead (Delta's conflict rule for OPTIMIZE vs overwrite).
    try Some(publishLoop(spark, dir, "compact", freshAll.result(),
      { (prev, fresh) =>
        if (!smallSet.forall(prev.contains))
          throw new java.util.ConcurrentModificationException(
            "snapshot changed under compaction")
        prev.filterNot(smallSet.contains) ++ fresh
      }, dfSchema = Some(schema), freshParts = freshParts.result(),
      guard = Some(dvUnchangedGuard(snap, smallSet))))
    catch { case _: java.util.ConcurrentModificationException => None }
  }

  /** Targeted delete of rows with `column ∈ [lo, hi]` — the GDPR/retention
    * write shape, planned from manifest stats so a 100 TB table rewrites
    * only the files that can contain matches:
    *
    *  - files whose bounds are DISJOINT from the range keep their identity
    *    (no read, no write — the overwhelming majority on a clustered
    *    table);
    *  - files whose bounds lie ENTIRELY inside the range and hold no nulls
    *    are dropped from the manifest outright (provably all-matching; no
    *    data job — a whole-partition retention drop costs one manifest
    *    publish);
    *  - only genuinely PARTIAL files are read, anti-filtered, rewritten.
    *
    * Null rows never match a range predicate and are always kept (which is
    * why an all-in-bounds file with nulls still rewrites). The delete
    * applies to the snapshot it planned against: a concurrent append's
    * rows land untouched (they postdate the snapshot); a concurrent
    * overwrite/compaction that removed any planned file aborts with None,
    * like [[compactSmall]]. Returns the new version, or None when no file
    * could contain a match or the commit was aborted; old versions
    * time-travel until
    * [[vacuum]] (the deleted rows remain readable there — run vacuum to
    * destroy them physically).
    */
  def deleteRange(spark: SparkSession, dir: String, schema: StructType,
                  column: String, lo: Any, hi: Any): Option[Long] = {
    import org.apache.spark.sql.functions.{col, lit}
    val snap = currentSnapshot(spark, dir).getOrElse(return None)
    val touched = pruneFiles(snap, column, lo, hi)
    if (touched.isEmpty) return None
    val pcol = physFor(snap, column) // file-level metadata keys by physical
    val dropWhole = touched.filter { rel =>
      // a recorded PARTITION value inside the range proves every row
      // matches (one value per file, nulls live in the hive default
      // partition) — whole partitions drop as pure manifest edits even
      // when footer stats are absent
      partitionWhollyIn(snap, rel, pcol, lo, hi) ||
      (snap.stats.get(rel).flatMap(_.get(pcol)) match {
        case Some(ColStats(typ, Some(mn), Some(mx), nulls)) if nulls == 0L =>
          // each side checks independently; Unbounded admits its side
          // (an open-ended range trivially contains that side)
          typ match {
            case "long" =>
              (lo == Unbounded || mn.toLong >= toLong(lo)) &&
                (hi == Unbounded || mx.toLong <= toLong(hi))
            case "double" =>
              (lo == Unbounded || mn.toDouble >= toDouble(lo)) &&
                (hi == Unbounded || mx.toDouble <= toDouble(hi))
            case "string" =>
              (lo == Unbounded || !utf8Lt(mn, lo.toString)) &&
                (hi == Unbounded || !utf8Lt(hi.toString, mx))
            case _ => false
          }
        case _ => false
      })
    }.toSet
    val partial = touched.filterNot(dropWhole.contains)
    val gone = dropWhole ++ partial
    val abort = { (prev: Seq[String]) =>
      if (!touched.forall(prev.contains))
        throw new java.util.ConcurrentModificationException(
          "snapshot changed under deleteRange")
    }
    try {
      if (partial.isEmpty)
        Some(publishLoop(spark, dir, "delete", Nil, { (prev, _) =>
          abort(prev); prev.filterNot(gone.contains)
        }))
      else {
        // LOGICAL read of the partial files (their dv tombstones applied):
        // the rewrite materializes prior merge-on-read deletes instead of
        // resurrecting them, and the dv guard aborts if a concurrent
        // deleteWhere tombstoned these files after planning
        // one-sided ranges carry the Unbounded marker, which has no lit()
        // form — build only the present bounds (mirrors readRange)
        val inRange = {
          val withLo = if (lo == Unbounded) lit(true)
            else col(column) >= lit(lo)
          if (hi == Unbounded) withLo
          else withLo && col(column) <= lit(hi)
        }
        val survivors =
          readSnapshot(spark, dir, snap.copy(files = partial), schema)
            .filter(!inRange || col(column).isNull)
        Some(commit(survivors, dir, "delete", { (prev, fresh) =>
          abort(prev); prev.filterNot(gone.contains) ++ fresh
        }, guard = Some(dvUnchangedGuard(snap, partial))))
      }
    } catch { case _: java.util.ConcurrentModificationException => None }
  }

  /** A [[publishLoop]] guard proving the dv refs of `files` did not change
    * since `planned` — the conflict rule for every rewrite that READ those
    * files' logical rows: a concurrent [[deleteWhere]] tombstone landing
    * after the read would be silently resurrected by the rewrite, so the
    * commit aborts instead and the caller retries against the new state.
    */
  private def dvUnchangedGuard(planned: Snapshot,
                               files: Iterable[String]): Snapshot => Unit = {
    val basis = files.map(r => r -> planned.dvs.getOrElse(r, DvRef(Nil, 0L))).toMap
    prev => basis.foreach { case (rel, ref) =>
      if (prev.dvs.getOrElse(rel, DvRef(Nil, 0L)) != ref)
        throw new java.util.ConcurrentModificationException(
          s"deletion vectors changed under rewrite on $rel")
    }
  }

  /** MERGE-ON-READ delete: tombstone every current row matching
    * `predicate` in a deletion-vector sidecar instead of rewriting data
    * files — the point-delete shape ([[deleteRange]] is its copy-on-write
    * sibling for contiguous ranges). One logical scan finds the doomed
    * `(file, row_index)` pairs; the commit is then metadata-only: data
    * files keep their identity, stats, partition values and blooms, and
    * the table's write amplification for deleting k rows is O(k), not
    * O(files touched × file size). Readers pay one anti-join against the
    * dv union until compaction materializes the deletions away.
    *
    * Contracts: only LIVE rows tombstone (the scan applies existing dvs,
    * so repeated deletes never double-count and [[countRows]] stays
    * exact); a concurrent commit that rewrites or re-tombstones a touched
    * file aborts with None (the caller retries — same OCC discipline as
    * [[upsertKeyed]]); [[changes]] reports exactly the tombstoned rows as
    * row-level deletes; time travel to a pre-delete version still sees
    * the rows. Returns the new version, Some(current) when nothing
    * matched, None on a lost conflict.
    */
  def deleteWhere(spark: SparkSession, dir: String, schema: StructType,
                  predicate: Column,
                  planRanges: Seq[(String, Any, Any)] = Nil,
                  exactRanges: Boolean = false): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    val snap = currentSnapshot(spark, dir).getOrElse(return None)
    if (snap.files.isEmpty) return Some(snap.version)
    // stats planning: `planRanges` are conjunctive bounds the caller
    // asserts the predicate IMPLIES (`user_id = x` → (("user_id", x, x)))
    // — files the manifest (stats, partition values, blooms) proves
    // outside them cannot hold a match and are not scanned, so a planned
    // point delete on a clustered/bloomed 100 TB table touches a handful
    // of files. Empty = scan everything (arbitrary predicate).
    val cand0 =
      if (planRanges.isEmpty) snap.files else pruneFilesWhere(snap, planRanges)
    if (cand0.isEmpty) return Some(snap.version)
    // whole-file drops: when the caller asserts the predicate is EXACTLY
    // the conjunction of `planRanges` (`exactRanges`, e.g. SQL
    // `DELETE WHERE day = X`), a file PROVEN to hold only matching rows —
    // by its recorded partition value ([[partitionWhollyIn]]) or by
    // null-free footer bounds inside every range ([[statsWhollyIn]], the
    // key-clustered retention shape) — needs no scan at all: it drops
    // from the file list as a pure manifest edit, the [[deleteRange]]
    // O(metadata) discipline generalized to SQL predicates. The
    // remainder takes the dv scan below.
    val (droppedWhole, cand) =
      if (!exactRanges || planRanges.isEmpty) (Seq.empty[String], cand0)
      else {
        val rangesP = snap.schema
          .map(s => ColumnMapping.physRanges(s, planRanges))
          .getOrElse(planRanges)
        cand0.partition(rel => rangesP.forall { case (c, lo, hi) =>
          partitionWhollyIn(snap, rel, c, lo, hi) ||
            transformWhollyIn(snap, rel, c, lo, hi) ||
            statsWhollyIn(snap, rel, c, lo, hi) })
      }
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    var deltas = Map.empty[String, DvRef]
    if (cand.nonEmpty) {
      requireUniqueBasenames(snap, dir)
      val nameToRel = cand.map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
      // live rows only: row ids exposed, existing tombstones anti-joined
      val live = readFilesWithRowIds(spark, dir, snap, cand, schema)
      val doomed = live.filter(predicate)
        .select(col(dvNameCol).as("f"), col(dvIdxCol).cast("long").as("i"))
      val dvRel = s"d-dv-$nonce"
      doomed.write.mode("error").parquet(new Path(dir, dvRel).toString)
      val parts = f.listStatus(new Path(dir, dvRel)).toSeq
        .map(_.getPath.getName).filter(_.endsWith(".parquet"))
        .sorted.map(n => s"$dvRel/$n")
      // per-file tombstone counts from the (tiny) sidecar just written
      val counts = spark.read.parquet(new Path(dir, dvRel).toString)
        .groupBy(col("f")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      if (counts.isEmpty) f.delete(new Path(dir, dvRel), true): Unit
      else deltas = counts.map { case (name, n) =>
        nameToRel(name) -> DvRef(parts, n) }
    }
    if (deltas.isEmpty && droppedWhole.isEmpty) return Some(snap.version)
    val droppedSet = droppedWhole.toSet
    val guard = dvUnchangedGuard(snap, deltas.keys ++ droppedWhole)
    val fileGuard: Snapshot => Unit = { prev =>
      (deltas.keys ++ droppedWhole).foreach { rel =>
        if (!prev.files.contains(rel))
          throw new java.util.ConcurrentModificationException(
            s"file $rel rewritten under deleteWhere")
      }
      guard(prev)
    }
    try Some(publishLoop(spark, dir, "delete-dv", Nil,
      (prev, _) => prev.filterNot(droppedSet),
      freshDvDeltas = deltas, guard = Some(fileGuard)))
    catch { case _: java.util.ConcurrentModificationException =>
      // the orphaned sidecar is unreferenced; vacuum collects it
      None
    }
  }

  /** MERGE-ON-READ update: rewrite every current row matching `predicate`
    * with `set`'s column expressions — as ONE atomic commit that
    * tombstones the originals ([[deleteWhere]]'s sidecar mechanics) and
    * appends the updated copies as fresh files. Write amplification is
    * O(matched rows), not O(touched files × file size): the untouched
    * 99% of a hot file's rows stay where they are, keeping their stats,
    * partition values and blooms — the "fix one column on k scattered
    * rows of a 100 TB table" shape copy-on-write MERGE handles worst.
    *
    * `set` maps column names (existing columns only) to their new value
    * expressions, evaluated against the old row. `planRanges` prunes
    * candidate files like [[deleteWhere]]. [[changes]] reports the commit
    * as exact row-level delete (old image) + insert (new image) —
    * [[changesKeyed]] pairs them into update_pre/postimage on a key.
    * Same OCC discipline: concurrent rewrites or tombstones on touched
    * files abort with None. Returns Some(current) when nothing matched.
    */
  def updateWhere(spark: SparkSession, dir: String, schema: StructType,
                  predicate: Column, set: Map[String, Column],
                  planRanges: Seq[(String, Any, Any)] = Nil): Option[Long] = {
    import org.apache.spark.sql.functions.col
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    set.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"SET column '$c' is not in the table schema (no implicit column adds)"))
    val f = fs(spark, dir)
    val snap = currentSnapshot(spark, dir).getOrElse(return None)
    if (snap.files.isEmpty) return Some(snap.version)
    val cand =
      if (planRanges.isEmpty) snap.files else pruneFilesWhere(snap, planRanges)
    if (cand.isEmpty) return Some(snap.version)
    requireUniqueBasenames(snap, dir)
    val nameToRel = cand.map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
    def liveIded = readFilesWithRowIds(spark, dir, snap, cand, schema)
    // 1. tombstone sidecar for the old images
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val dvRel = s"d-dv-$nonce"
    liveIded.filter(predicate)
      .select(col(dvNameCol).as("f"), col(dvIdxCol).cast("long").as("i"))
      .write.mode("error").parquet(new Path(dir, dvRel).toString)
    val parts = f.listStatus(new Path(dir, dvRel)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .sorted.map(n => s"$dvRel/$n")
    val counts = spark.read.parquet(new Path(dir, dvRel).toString)
      .groupBy(col("f")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) {
      f.delete(new Path(dir, dvRel), true)
      return Some(snap.version)
    }
    // 2. fresh files with the new images (immutable inputs: this second
    // scan selects exactly the rows the sidecar tombstoned); a
    // declared-partitioned table keeps its layout and per-file partition
    // values so pruning survives sustained row-level maintenance
    val dataRel = s"d-$nonce"
    val updated0 = enforceChecks(
      liveIded.filter(predicate).withColumns(set)
        .select(schema.fieldNames.toIndexedSeq.map(col): _*), Some(snap))
    // fresh images write under physical names (snap.partitionCols already
    // IS physical — the declared list is fixed at creation)
    val updated = ColumnMapping.toPhysical(updated0,
      ColumnMapping.resolve(schema, snap.schema))
    val (freshFiles, freshParts) =
      if (snap.partitionCols.nonEmpty)
        writeHivePartitioned(updated, dir, dataRel, snap.partitionCols)
      else {
        updated.write.mode("error").parquet(new Path(dir, dataRel).toString)
        (f.listStatus(new Path(dir, dataRel)).toSeq
          .map(_.getPath.getName).filter(_.endsWith(".parquet"))
          .sorted.map(n => s"$dataRel/$n"),
          Map.empty[String, Map[String, String]])
      }
    val deltas = counts.map { case (name, n) => nameToRel(name) -> DvRef(parts, n) }
    val guard = dvUnchangedGuard(snap, deltas.keys)
    val fileGuard: Snapshot => Unit = { prev =>
      deltas.keys.foreach { rel =>
        if (!prev.files.contains(rel))
          throw new java.util.ConcurrentModificationException(
            s"file $rel rewritten under updateWhere")
      }
      guard(prev)
    }
    try Some(publishLoop(spark, dir, "update-dv", freshFiles,
      (prev, fresh) => prev ++ fresh, dfSchema = Some(schema),
      freshParts = freshParts, freshDvDeltas = deltas,
      guard = Some(fileGuard)))
    catch { case _: java.util.ConcurrentModificationException => None }
  }

  /** Keyed copy-on-write upsert — the MERGE write shape: every batch row
    * replaces the current row carrying the same key, or inserts if the key
    * is new. Planned from manifest stats like [[deleteRange]]: only files
    * whose key bounds overlap the batch's key range are read, anti-joined
    * on key against the batch (the batch side is small — AQE broadcasts
    * it), and rewritten together with the batch; every other file keeps
    * its identity untouched — on a key-clustered 100 TB table an
    * incremental upsert rewrites a handful of files, never the table.
    *
    * Semantics and contracts:
    *  - the batch must be key-unique (checked with one small aggregate on
    *    the batch side; a batch with two rows for one key has no defined
    *    winner);
    *  - null keys never match an existing row (SQL join semantics) — a
    *    null-key batch row always inserts;
    *  - concurrency is strict: ANY commit landing between planning and
    *    publish aborts with None (a concurrent append could carry the same
    *    key, and silently keeping both would corrupt key-uniqueness — the
    *    caller retries, like Delta's serializable MERGE);
    *  - the replaced rows time-travel until [[vacuum]], and
    *    [[changes]] reports the upsert as exact row-level delete + insert
    *    (rewritten-but-unchanged rows cancel in its diff).
    */
  def upsertKeyed(spark: SparkSession, dir: String, schema: StructType,
                  batch: DataFrame, keyCol: String): Option[Long] =
    upsertKeyed(spark, dir, schema, batch, keyCol, () => ())

  /** [[upsertKeyed]] with the spec-only race-injection seam (see
    * [[compactSmall]]'s midFlight).
    */
  private[graft] def upsertKeyed(spark: SparkSession, dir: String,
                                 schema: StructType, batch: DataFrame,
                                 keyCol: String,
                                 midFlight: () => Unit): Option[Long] = {
    import org.apache.spark.sql.functions.{col, count => fcount, lit, max => fmax, min => fmin}
    // null keys are excluded from the duplicate guard: a null key matches
    // nothing (documented semantics below), so any number of null-key rows
    // is a legal batch of pure inserts, not a duplicate-key conflict
    val dupKeys = batch.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(fcount(lit(1)).as("_n"))
      .filter(col("_n") > 1).limit(1).count()
    require(dupKeys == 0L, s"upsert batch has duplicate keys on $keyCol")
    val snap = currentSnapshot(spark, dir).getOrElse {
      return Some(commit(batch, dir, "upsert", (_, fresh) => fresh))
    }
    // batch key bounds for stats pruning (nulls excluded — they match
    // nothing); files without recorded bounds are conservatively touched
    val b = batch.agg(fmin(col(keyCol)), fmax(col(keyCol))).head
    val touched =
      if (b.isNullAt(0)) Seq.empty // all-null-key batch: pure insert
      else pruneFiles(snap, keyCol, b.get(0), b.get(1))
    midFlight()
    val touchedSet = touched.toSet
    val abort = { (prev: Seq[String]) =>
      if (prev != snap.files)
        throw new java.util.ConcurrentModificationException(
          "snapshot changed under upsertKeyed")
    }
    try {
      val fresh =
        if (touched.isEmpty) batch
        else readSnapshot(spark, dir, snap.copy(files = touched), schema)
          .join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
          .unionByName(batch)
      Some(commit(fresh, dir, "upsert", { (prev, freshFiles) =>
        abort(prev); prev.filterNot(touchedSet.contains) ++ freshFiles
      }, guard = Some(dvUnchangedGuard(snap, touched))))
    } catch { case _: java.util.ConcurrentModificationException => None }
  }

  /** MERGE-ON-READ keyed upsert — [[upsertKeyed]]'s deletion-vector
    * sibling: rows whose key the batch replaces TOMBSTONE in a sidecar
    * and the batch appends as fresh files, one atomic `upsert-dv` commit.
    * Write amplification is O(batch), independent of how many files the
    * batch's keys scatter across — the daily-increment shape for an
    * UNCLUSTERED 100 TB latest-state table, where the copy-on-write form
    * would rewrite nearly every file (each one holds a few of the batch's
    * keys). The tradeoff is the read-side anti-join until compaction;
    * key-clustered tables should prefer [[upsertKeyed]], whose rewrite
    * keeps files tight.
    *
    * Same contracts as [[upsertKeyed]]: key-unique batch, null keys
    * always insert, strict OCC (any concurrent commit aborts with None —
    * an interleaved append could carry a duplicate key), exact
    * [[changes]] (old images delete, batch rows insert;
    * [[changesKeyed]] pairs them). Stats/bloom pruning narrows the
    * key-probe scan, not correctness.
    */
  def upsertKeyedDv(spark: SparkSession, dir: String, schema: StructType,
                    batch: DataFrame, keyCol: String): Option[Long] = {
    import org.apache.spark.sql.functions.{col, count => fcount, lit, max => fmax, min => fmin}
    val dupKeys = batch.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(fcount(lit(1)).as("_n"))
      .filter(col("_n") > 1).limit(1).count()
    require(dupKeys == 0L, s"upsert batch has duplicate keys on $keyCol")
    val f = fs(spark, dir)
    val snap = currentSnapshot(spark, dir).getOrElse {
      return Some(commit(batch, dir, "upsert-dv", (_, fresh) => fresh))
    }
    val b = batch.agg(fmin(col(keyCol)), fmax(col(keyCol))).head
    val cand =
      if (b.isNullAt(0)) Seq.empty // all-null-key batch: pure insert
      else pruneFiles(snap, keyCol, b.get(0), b.get(1))
    requireUniqueBasenames(snap, dir)
    val nameToRel = cand.map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
    val abort: Snapshot => Unit = { prev =>
      if (prev.files != snap.files || prev.dvs != snap.dvs)
        throw new java.util.ConcurrentModificationException(
          "snapshot changed under upsertKeyedDv")
    }
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    var deltas = Map.empty[String, DvRef]
    if (cand.nonEmpty) {
      // live rows in candidate files whose key the batch carries
      val live = readFilesWithRowIds(spark, dir, snap, cand, schema)
      val dvRel = s"d-dv-$nonce"
      live.join(batch.select(col(keyCol)).filter(col(keyCol).isNotNull),
          Seq(keyCol), "left_semi")
        .select(col(dvNameCol).as("f"), col(dvIdxCol).cast("long").as("i"))
        .write.mode("error").parquet(new Path(dir, dvRel).toString)
      val parts = f.listStatus(new Path(dir, dvRel)).toSeq
        .map(_.getPath.getName).filter(_.endsWith(".parquet"))
        .sorted.map(n => s"$dvRel/$n")
      val counts = spark.read.parquet(new Path(dir, dvRel).toString)
        .groupBy(col("f")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      if (counts.isEmpty) f.delete(new Path(dir, dvRel), true)
      else deltas = counts.map { case (name, n) =>
        nameToRel(name) -> DvRef(parts, n)
      }
    }
    val dataRel = s"d-$nonce"
    val (batchP, batchSchema) = planWrite(spark, dir, batch)
    val (freshFiles, freshParts) =
      if (snap.partitionCols.nonEmpty &&
          snap.partitionCols.forall(s =>
            batchP.columns.contains(PartitionSpec.sourceCol(s))))
        writeHivePartitioned(batchP, dir, dataRel, snap.partitionCols)
      else {
        batchP.write.mode("error").parquet(new Path(dir, dataRel).toString)
        (f.listStatus(new Path(dir, dataRel)).toSeq
          .map(_.getPath.getName).filter(_.endsWith(".parquet"))
          .sorted.map(n => s"$dataRel/$n"),
          Map.empty[String, Map[String, String]])
      }
    try Some(publishLoop(spark, dir, "upsert-dv", freshFiles,
      (prev, fresh) => prev ++ fresh, dfSchema = Some(batchSchema),
      freshParts = freshParts, freshDvDeltas = deltas, guard = Some(abort)))
    catch { case _: java.util.ConcurrentModificationException => None }
  }

  /** One WHEN clause of a general [[mergeRows]]: `cond = None` means
    * unconditional; `set = None` means DELETE; `set = Some(m)` means
    * UPDATE (matched / not-matched-by-source clauses; unassigned columns
    * keep their current value) or INSERT (not-matched clauses; unassigned
    * columns null-fill, the Delta convention). Clause conditions and set
    * values are Columns over the TARGET columns by their own names and
    * the SOURCE columns under the `__s_` prefix (the caller renames its
    * source frame; [[GraftMergeCommand]] does this for SQL).
    */
  final case class MergeClause(cond: Option[Column],
                               set: Option[Map[String, Column]])

  /** General SQL-MERGE execution — the full clause surface the canonical
    * [[upsertKeyedDv]] upsert cannot express: conditional clauses
    * (`WHEN MATCHED AND …`), partial-row UPDATE, `WHEN MATCHED … DELETE`,
    * multi-column / arbitrary ON conditions, and
    * `WHEN NOT MATCHED BY SOURCE`. Semantics are standard MERGE
    * (SQL:2003 + the Delta/Spark conventions):
    *
    *  - per target row, clauses evaluate FIRST-MATCH-WINS in declaration
    *    order; a matched row no clause accepts stays untouched in place;
    *  - duplicate TARGET rows matching one source row each update/delete
    *    independently (multiplicity preserved — not a keyed collapse);
    *  - a target row matched by MORE THAN ONE source row while any
    *    matched clause exists is a cardinality violation and errors
    *    before anything commits (nondeterministic winner otherwise —
    *    Delta's multipleSourceRowMatchingTargetRow discipline);
    *  - ON-condition null semantics are join semantics: null keys match
    *    nothing (insert as not-matched, retain as not-matched-by-source).
    *
    * Execution shape (scale notes): the source query is STAGED to parquet
    * once — stable row identity, one evaluation, and every subsequent
    * join probes the staged copy. Matched pairs `(live ⋈ src)` are staged
    * too, so the cardinality check, tombstone write, per-clause update
    * images, and the insert anti-join all read a batch-sized parquet
    * instead of re-scanning the table. Candidate files prune by the
    * manifest stats/partitions/blooms on `equiKeys` (the ON condition's
    * target-column = source-expression conjuncts) — UNLESS
    * not-matched-by-source clauses exist, which must see every live row
    * and disable pruning by construction. Tombstones land as deletion
    * vectors, fresh images as new files, ONE atomic `merge-dv` commit:
    * write amplification is O(touched rows), never O(files × file size).
    *
    * Concurrency is strict like [[upsertKeyedDv]]: the plan's
    * matched/not-matched classification depends on the whole snapshot, so
    * ANY commit landing between planning and publish aborts with None
    * (caller retries). Returns Some(current) when no clause touched a row.
    */
  def mergeRows(spark: SparkSession, dir: String, schema: StructType,
                source: DataFrame, cond: Column,
                matched: Seq[MergeClause],
                notMatched: Seq[MergeClause],
                bySource: Seq[MergeClause] = Nil,
                equiKeys: Seq[(String, Column)] = Nil): Option[Long] =
    mergeRows(spark, dir, schema, source, cond, matched, notMatched,
      bySource, equiKeys, () => ())

  /** [[mergeRows]] with the spec-only race-injection seam (see
    * [[compactSmall]]'s midFlight): runs after the matched join is staged,
    * before any tombstone/image write.
    */
  private[graft] def mergeRows(spark: SparkSession, dir: String,
                               schema: StructType,
                               source: DataFrame, cond: Column,
                               matched: Seq[MergeClause],
                               notMatched: Seq[MergeClause],
                               bySource: Seq[MergeClause],
                               equiKeys: Seq[(String, Column)],
                               midFlight: () => Unit): Option[Long] = {
    import org.apache.spark.sql.functions.{coalesce, col, count => fcount, lit, max => fmax, min => fmin, when}
    require(matched.nonEmpty || notMatched.nonEmpty || bySource.nonEmpty,
      "MERGE needs at least one WHEN clause")
    require(notMatched.forall(_.set.isDefined),
      "NOT MATCHED clauses must INSERT (DELETE has nothing to delete)")
    require(source.columns.forall(_.startsWith("__s_")),
      "mergeRows source columns must be __s_-prefixed (rename before calling)")
    val f = fs(spark, dir)
    val snap = currentSnapshot(spark, dir).getOrElse(
      throw new IllegalStateException(s"no manifest table at $dir to MERGE into"))
    val nonce = java.util.UUID.randomUUID().toString.take(12)
    val stageDir = new Path(dir, s"tmp-merge-$nonce")
    val srcRidF = "__s_graft_rid_file"
    val srcRidI = "__s_graft_rid_idx"
    // read a just-written stage dir, tolerating the 0-part-files shape an
    // AQE-emptied write produces (schema comes from the caller)
    def readStage(p: Path, s: StructType): DataFrame = {
      val parts = if (f.exists(p)) f.listStatus(p).toSeq
        .map(_.getPath).filter(_.getName.endsWith(".parquet")) else Nil
      if (parts.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
      else spark.read.schema(s).parquet(p.toString)
    }
    // CANONICAL-UPSERT image elision: when the clause lattice is exactly
    // one unconditional full-row UPDATE plus one unconditional full-row
    // INSERT assigning the SAME plain source column per target column
    // (type-identical), every source row's image lands in the table
    // verbatim — matched rows as the update image, the rest as inserts.
    // The source then stages DIRECTLY as the commit's fresh data files
    // (write amplification 1× batch, the upsertKeyedDv bound, instead of
    // stage + image rewrite = 2×), and the matched join stages only the
    // two row identities. The ON condition and pruning keys must touch
    // only the staged columns for the re-derived __s_ views to be exact.
    def plainSrc(c: Column): Option[String] =
      org.apache.spark.sql.graft.StreamingShim.expressionOf(c) match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if u.nameParts.length == 1 && u.nameParts.head.startsWith("__s_") =>
        Some(u.nameParts.head)
      case _ => None
    }
    def srcRefs(c: Column): Seq[String] =
      org.apache.spark.sql.graft.StreamingShim.expressionOf(c).collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if u.nameParts.length == 1 && u.nameParts.head.startsWith("__s_") =>
        u.nameParts.head
    }
    val canonicalMap: Option[Map[String, String]] =
      (matched, notMatched, bySource) match {
        case (Seq(MergeClause(None, Some(u))), Seq(MergeClause(None, Some(i))), Nil)
            if u.size == schema.fields.length &&
              i.size == schema.fields.length &&
              schema.fieldNames.forall(n => u.contains(n) && i.contains(n)) =>
          val pairs = schema.fields.toSeq.map { fd =>
            (plainSrc(u(fd.name)), plainSrc(i(fd.name))) match {
              case (Some(a), Some(b))
                  if a == b && source.schema.fields
                    .exists(s => s.name == a && s.dataType == fd.dataType) =>
                Some(fd.name -> a)
              case _ => None
            }
          }
          val mapped = pairs.flatten.map(_._2).toSet
          if (pairs.exists(_.isEmpty) ||
              mapped.size != schema.fields.length || // distinct source cols
              !(srcRefs(cond) ++ equiKeys.flatMap(k => srcRefs(k._2)))
                .forall(mapped)) None
          else Some(pairs.flatten.toMap)
        case _ => None
      }
    val dataRel = s"d-$nonce"
    // column mapping: fresh images and the canonical staging write under
    // PHYSICAL names (snap.partitionCols already is physical); every scan
    // below aliases back to logical so clause/ON expressions see the
    // user's names
    val rs = ColumnMapping.resolve(schema, snap.schema)
    try {
      // 1. stage the source ONCE: stable (file, idx) row identity for the
      // insert anti-join, single evaluation of an arbitrary source query.
      // Canonical shape stages the IMAGES straight into the data dir the
      // commit will reference; otherwise the raw __s_ frame stages to the
      // scratch dir.
      val pcols = snap.partitionCols
      val srcPath =
        if (canonicalMap.isDefined) new Path(dir, dataRel)
        else new Path(stageDir, "src")
      // canonical staging lands as the commit's data files — on a
      // declared-partitioned table through the hive-partitioned writer,
      // so sustained MERGE maintenance never erodes partition pruning
      var stagedFiles = Seq.empty[String]
      var stagedParts = Map.empty[String, Map[String, String]]
      canonicalMap match {
        case Some(mp) =>
          val img = ColumnMapping.toPhysical(enforceChecks(
            source.select(schema.fields.toIndexedSeq.map(fd =>
              col(mp(fd.name)).as(fd.name)): _*), Some(snap)), rs)
          if (pcols.nonEmpty) {
            val (fl, fp) = writeHivePartitioned(img, dir, dataRel, pcols)
            stagedFiles = fl; stagedParts = fp
          } else {
            img.write.mode("error").parquet(srcPath.toString)
            stagedFiles = f.listStatus(srcPath).toSeq
              .map(_.getPath.getName).filter(_.endsWith(".parquet"))
              .sorted.map(n => s"$dataRel/$n")
          }
        case None => source.write.mode("error").parquet(srcPath.toString)
      }
      val srcHasParts =
        if (canonicalMap.isDefined) stagedFiles.nonEmpty
        else f.listStatus(srcPath).toSeq
          .exists(_.getPath.getName.endsWith(".parquet"))
      val src =
        if (!srcHasParts) { // AQE-emptied write: no files to derive ids from
          import org.apache.spark.sql.types.{LongType, StringType, StructField}
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(
            source.schema.fields.toSeq :+ StructField(srcRidF, StringType) :+
              StructField(srcRidI, LongType)))
        } else canonicalMap match {
          case Some(mp) => // re-derive the __s_ view from the staged images
            schema.fields.foldLeft(
              readFilesWithRowIds(spark, dir, snap, stagedFiles, schema,
                applyDvs = false)
                .withColumnRenamed(dvNameCol, srcRidF)
                .withColumnRenamed(dvIdxCol, srcRidI)) { (d, fd) =>
              d.withColumnRenamed(fd.name, mp(fd.name))
            }
          case None => // scratch staging: written/read with __s_ names, unmapped
            withRowIds(spark.read.schema(source.schema).parquet(srcPath.toString))
              .withColumnRenamed(dvNameCol, srcRidF)
              .withColumnRenamed(dvIdxCol, srcRidI)
        }
      // 2. candidate files: equi-conjunct bounds prune via the manifest —
      // except under by-source clauses, which must see every live row. An
      // all-null equi key matches nothing: zero candidates.
      val cand: Seq[String] =
        if (snap.files.isEmpty) Nil
        else if (bySource.nonEmpty || equiKeys.isEmpty) snap.files
        else {
          val aggs = equiKeys.zipWithIndex.flatMap { case ((_, sc), i) =>
            Seq(fmin(sc).as(s"__lo$i"), fmax(sc).as(s"__hi$i")) }
          val b = src.agg(aggs.head, aggs.tail: _*).head
          val ranges = equiKeys.indices.flatMap { i =>
            if (b.isNullAt(2 * i)) None
            else Some((equiKeys(i)._1, b.get(2 * i), b.get(2 * i + 1)))
          }
          if (ranges.size < equiKeys.size) Nil
          else pruneFilesWhere(snap, ranges)
        }
      requireUniqueBasenames(snap, dir)
      val nameToRel = cand.map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
      def liveCand: DataFrame =
        readFilesWithRowIds(spark, dir, snap, cand, schema)
      // 3. matched pairs staged once: cardinality check, tombstones,
      // update images, and the insert anti-join all probe this batch-sized
      // parquet instead of re-joining against the table. The canonical
      // shape needs only the two row identities (its images are the
      // staged source itself) — stage those four columns, nothing else.
      val mPath = new Path(stageDir, "matched")
      val mdf: Option[DataFrame] = if (cand.isEmpty) None else {
        val joined0 = liveCand.join(src, cond, "inner")
        val joined =
          if (canonicalMap.isDefined)
            joined0.select(col(dvNameCol), col(dvIdxCol),
              col(srcRidF), col(srcRidI))
          else joined0
        joined.write.mode("error").parquet(mPath.toString)
        Some(readStage(mPath, joined.schema))
      }
      midFlight()
      if (matched.nonEmpty) mdf.foreach { m =>
        val dup = m.groupBy(col(dvNameCol), col(dvIdxCol))
          .agg(fcount(lit(1)).as("_n")).filter(col("_n") > 1).limit(1).count()
        if (dup > 0L) throw new UnsupportedOperationException(
          s"MERGE cardinality violation on $dir: a target row matched more " +
            "than one source row, so the applied update/delete would be " +
            "nondeterministic — deduplicate the source on the ON keys")
      }
      // first-match-wins clause index (-1 = no clause applies); a clause
      // condition evaluating NULL does not apply, per SQL
      def actionOf(clauses: Seq[MergeClause]): Column =
        coalesce(clauses.zipWithIndex.map { case (c, i) =>
          when(c.cond.getOrElse(lit(true)), lit(i)) } :+ lit(-1): _*)
      def images(df: DataFrame, clauses: Seq[MergeClause],
                 defaults: String => Column): Seq[DataFrame] = {
        val acted = df.withColumn("__graft_act", actionOf(clauses))
        clauses.zipWithIndex.collect { case (MergeClause(_, Some(set)), i) =>
          acted.filter(col("__graft_act") === i)
            .select(schema.fields.toIndexedSeq.map { fd =>
              set.getOrElse(fd.name, defaults(fd.name))
                .cast(fd.dataType).as(fd.name)
            }: _*)
        }
      }
      def tombOf(df: DataFrame, clauses: Seq[MergeClause]): DataFrame =
        df.withColumn("__graft_act", actionOf(clauses))
          .filter(col("__graft_act") >= 0)
          .select(col(dvNameCol).as("f"), col(dvIdxCol).cast("long").as("i"))
      val mTomb = if (matched.isEmpty) None else mdf.map(tombOf(_, matched))
      val mImages = if (matched.isEmpty || canonicalMap.isDefined) Nil
        else mdf.toSeq.flatMap(images(_, matched, col))
      // 4. inserts: source rows no live row matched (anti-join on the
      // staged source's row identity — batch-sized both sides). The
      // canonical shape already staged every source row as data.
      val insImages: Seq[DataFrame] =
        if (notMatched.isEmpty || canonicalMap.isDefined) Nil else {
        val unmatched = mdf match {
          case Some(m) => src.join(m.select(col(srcRidF), col(srcRidI)),
            Seq(srcRidF, srcRidI), "left_anti")
          case None => src
        }
        images(unmatched, notMatched,
          n => lit(null).cast(schema(n).dataType))
      }
      // 5. by-source: live rows no source row matched (pruning is off in
      // this mode, so `cand` covers the whole table). "Unmatched" is
      // exactly "absent from the staged matched pairs", so the anti-join
      // probes the staged TARGET row ids — a hash anti on two columns
      // with a batch-sized build side, whatever shape the ON condition
      // has (re-evaluating a non-equi cond here would plan a nested-loop
      // join against the table)
      val (bsTomb, bsImages) = if (bySource.isEmpty || cand.isEmpty) (None, Nil)
        else {
          val matchedIds = mdf.get.select(col(dvNameCol), col(dvIdxCol))
          val only = liveCand.join(matchedIds,
            Seq(dvNameCol, dvIdxCol), "left_anti")
          (Some(tombOf(only, bySource)), images(only, bySource, col))
        }
      // 6. tombstone sidecar + fresh image files, one atomic commit
      var deltas = Map.empty[String, DvRef]
      val dvRel = s"d-dv-$nonce"
      (mTomb.toSeq ++ bsTomb.toSeq).reduceOption(_ unionAll _).foreach { t =>
        t.write.mode("error").parquet(new Path(dir, dvRel).toString)
        val parts = f.listStatus(new Path(dir, dvRel)).toSeq
          .map(_.getPath.getName).filter(_.endsWith(".parquet"))
          .sorted.map(n => s"$dvRel/$n")
        val counts = spark.read.parquet(new Path(dir, dvRel).toString)
          .groupBy(col("f")).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        if (counts.isEmpty) { f.delete(new Path(dir, dvRel), true): Unit }
        else deltas = counts.map { case (name, n) =>
          nameToRel(name) -> DvRef(parts, n)
        }
      }
      var freshFiles = Seq.empty[String]
      var freshParts = Map.empty[String, Map[String, String]]
      if (canonicalMap.isDefined) {
        // the staged images ARE the fresh data; duplicate matched TARGET
        // rows (N target rows sharing one source row) each take the same
        // image, so replicate it N−1 extra times — row-preserving MERGE
        freshFiles = stagedFiles
        freshParts = stagedParts
        mdf.foreach { m =>
          import org.apache.spark.sql.functions.{explode, sequence}
          val dups = m.groupBy(col(srcRidF), col(srcRidI))
            .agg(fcount(lit(1)).as("__graft_n")).filter(col("__graft_n") > 1)
          if (dups.limit(1).count() > 0) {
            val srcImg = readFilesWithRowIds(spark, dir, snap, stagedFiles,
                schema, applyDvs = false)
              .withColumnRenamed(dvNameCol, srcRidF)
              .withColumnRenamed(dvIdxCol, srcRidI)
            val extraRel = s"d-x-$nonce"
            val extra = ColumnMapping.toPhysical(
              srcImg.join(dups, Seq(srcRidF, srcRidI))
                .withColumn("__graft_rep",
                  explode(sequence(lit(2L), col("__graft_n"))))
                .select(schema.fieldNames.toIndexedSeq.map(col): _*), rs)
            if (pcols.nonEmpty) {
              val (fl, fp) = writeHivePartitioned(extra, dir, extraRel, pcols)
              freshFiles = freshFiles ++ fl; freshParts = freshParts ++ fp
            } else {
              extra.write.mode("error").parquet(new Path(dir, extraRel).toString)
              freshFiles = freshFiles ++ f.listStatus(new Path(dir, extraRel))
                .toSeq.map(_.getPath.getName).filter(_.endsWith(".parquet"))
                .sorted.map(n => s"$extraRel/$n")
            }
          }
        }
      } else {
        (mImages ++ bsImages ++ insImages).reduceOption(_ unionAll _).foreach { df0 =>
          val df = ColumnMapping.toPhysical(enforceChecks(df0, Some(snap)), rs)
          if (pcols.nonEmpty) {
            val (fl, fp) = writeHivePartitioned(df, dir, dataRel, pcols)
            freshFiles = fl; freshParts = fp
          } else {
            df.write.mode("error").parquet(new Path(dir, dataRel).toString)
            freshFiles = f.listStatus(new Path(dir, dataRel)).toSeq
              .map(_.getPath.getName).filter(_.endsWith(".parquet"))
              .sorted.map(n => s"$dataRel/$n")
          }
        }
      }
      if (deltas.isEmpty && freshFiles.isEmpty) return Some(snap.version)
      val abort: Snapshot => Unit = { prev =>
        if (prev.files != snap.files || prev.dvs != snap.dvs)
          throw new java.util.ConcurrentModificationException(
            "snapshot changed under mergeRows")
      }
      try Some(publishLoop(spark, dir, "merge-dv", freshFiles,
        (prev, fresh) => prev ++ fresh, dfSchema = Some(schema),
        freshParts = freshParts, freshDvDeltas = deltas, guard = Some(abort)))
      catch { case _: java.util.ConcurrentModificationException => None }
    } finally {
      // the staged source/matched copies are never referenced by a
      // manifest; drop them eagerly (vacuum would collect them anyway)
      try { f.delete(stageDir, true): Unit }
      catch { case _: java.io.IOException => () }
    }
  }

  /** Drop versions older than the latest `keepVersions`, then delete every
    * data file no surviving manifest references AND older than
    * `retainMillis`. Returns (manifests, data files) deleted.
    *
    * The retention window is what makes vacuum safe against IN-FLIGHT
    * commits: [[commit]] writes data files BEFORE publishing the manifest
    * that references them, so a freshly-written part file under `d-<nonce>`
    * is unreferenced for a moment — a concurrent vacuum without the window
    * would delete it and the commit would then publish a manifest pointing
    * at missing files (the Delta/Iceberg retention rule; their default is
    * 7 days, ours 24 h — state tables commit far more often than they're
    * vacuumed). Pass `retainMillis = 0` only when no writer can be active.
    * Readers of vacuumed versions lose time travel — the retention
    * contract, same as any table format.
    *
    * `dryRun = true` plans and COUNTS exactly what a real run would
    * delete — same listing, same liveness proof, same retention cutoff —
    * without touching a byte: the operational "what would this reclaim
    * and is my retention window right?" check before the irreversible
    * run (Delta's `VACUUM ... DRY RUN`).
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 2,
             retainMillis: Long = 24L * 3600 * 1000,
             dryRun: Boolean = false): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the current version")
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) return (0, 0)
    val cutoff = System.currentTimeMillis() - retainMillis
    val versions = f.listStatus(md).toSeq.flatMap(s => s.getPath.getName match {
      case manifestName(v) => Some(v.toLong)
      case _ => None
    }).sorted
    // tagged versions are LIVE whatever their age: their manifests stay,
    // their files count toward the live set — a tag is a durable pin
    val tagged = tags(spark, dir).values.toSet
    val (dropCand, keepTail) = versions.splitAt(math.max(0, versions.size - keepVersions))
    val keep = dropCand.filter(tagged) ++ keepTail
    // a kept version may be a DELTA whose reconstruction walks base
    // pointers past the keep window: retain every manifest its chain
    // needs (dropping a base would make the kept version unreadable on a
    // cold start). Chain-needed manifests are kept but do NOT make their
    // file lists live — time travel outside retention already contracts
    // that a parseable old manifest's data may be gone.
    val keepSet = keep.toSet
    def baseOf(v: Long): Option[Long] = scala.util.Try {
      val root = mapper.readTree(readFully(f, manifestPath(dir, v)))
      if (root.hasNonNull("base")) Some(root.path("base").asLong()) else None
    }.toOption.flatten.filter(_ < v)
    val chainNeeded = scala.collection.mutable.Set.empty[Long]
    keep.foreach { kv =>
      var b = baseOf(kv)
      while (b.exists(x => !keepSet(x) && !chainNeeded(x))) {
        chainNeeded += b.get
        b = baseOf(b.get)
      }
    }
    val drop = dropCand.filterNot(tagged).filterNot(chainNeeded)
    // Read every KEPT manifest; if any fails (crashed writer's half-write
    // OR a transient store error), data-file deletion is skipped entirely
    // this run. Folding a failed read into an empty file list would remove
    // that version's files from the live set and vacuum would delete data
    // a kept — possibly CURRENT — snapshot still references; skipping
    // costs nothing (the next vacuum retries) and old-manifest dropping
    // below stays safe either way (readers fall back within the keep
    // window, never to a dropped version).
    val reads = keep.map(v => scala.util.Try {
      val s = readManifest(spark, dir, v)
      // dv sidecars referenced by a live manifest are live data too
      s.files ++ s.dvs.values.flatMap(_.files)
    })
    val allKeptReadable = reads.forall(_.isSuccess)
    val live = reads.flatMap(_.getOrElse(Seq.empty)).toSet
    var dataDeleted = 0
    if (allKeptReadable) f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("d-"))
      .foreach { d =>
        // walk the whole d-* subtree: partitioned commits
        // (appendPartitioned) nest files under <col>=<value>/ dirs, and a
        // one-level listing would neither vacuum their orphans nor SEE
        // their live files when deciding the dir is empty below
        // tolerate subtrees vanishing mid-walk: a committer renaming its
        // attempt dir between our parent listing and the child listing is
        // normal concurrency, not an error
        def walkParquet(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
          scala.util.Try(f.listStatus(p).toSeq).getOrElse(Nil).flatMap { s =>
            if (s.isDirectory) walkParquet(s.getPath)
            else if (s.getPath.getName.endsWith(".parquet")) Seq(s) else Nil
          }
        val baseUri = f.makeQualified(d.getPath).toUri
        // files under a _temporary/ committer staging area are IN-FLIGHT,
        // not orphans: a task can write its attempt parquet and then sit
        // past a short retention window before commitTask under load —
        // deleting it fails the writer's own job commit (the race the
        // property suite caught). They collect only past a 24 h floor
        // (genuinely crashed writers), whatever retention the caller set.
        val stagingCutoff = System.currentTimeMillis() -
          math.max(retainMillis, 24L * 3600 * 1000)
        var liveRemain = false
        walkParquet(d.getPath).foreach { file =>
          val rel = s"${d.getPath.getName}/" +
            baseUri.relativize(f.makeQualified(file.getPath).toUri).getPath
          val fileCutoff =
            if (rel.split('/').contains("_temporary")) stagingCutoff else cutoff
          if (!live.contains(rel) && file.getModificationTime < fileCutoff) {
            if (!dryRun) f.delete(file.getPath, false): Unit
            dataDeleted += 1
          } else liveRemain = true
        }
        // delete an emptied d-* dir only past the retention cutoff AND with
        // no parquet file anywhere in its subtree AND no _temporary/
        // committer staging area. The last check is load-bearing beyond
        // the mod-time guard: a writer that created the dir more than the
        // retention window ago but has not landed its FIRST task file yet
        // (slow task scheduling under load) presents an old, parquet-empty
        // dir that contains only _temporary/ — the walk sees nothing to
        // keep, and a recursive delete would rip the staging area out from
        // under the committing writer (observed as the committer's
        // FileNotFoundException on its own task path). A crashed writer's
        // abandoned _temporary ages out differently: its task parquet
        // files ARE collected individually above once past retention; only
        // the empty directory skeleton persists — a zero-byte leak, the
        // safe trade.
        if (!dryRun && d.getModificationTime < cutoff && !liveRemain &&
            walkParquet(d.getPath).isEmpty &&
            !f.exists(new Path(d.getPath, "_temporary")))
          f.delete(d.getPath, true) // only bookkeeping files left
      }
    if (!dryRun) drop.foreach(v => f.delete(manifestPath(dir, v), false): Unit)
    (drop.size, dataDeleted)
  }
}

package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-maintenance as SQL stored procedures (`CALL graft.proc(...)`,
  * Spark 4's DSv2 `ProcedureCatalog` — the Iceberg procedure surface):
  *
  * {{{
  * CALL graft.vacuum('/lake/t', 2, 24.0)       -- keep 2 versions, 24 h retention
  * CALL graft.compact('/lake/t', 1)            -- full rewrite to n files
  * CALL graft.compact_small('/lake/t')         -- incremental OPTIMIZE
  * CALL graft.restore('/lake/t', 7)            -- roll back as a new commit
  * CALL graft.create_tag('/lake/t', 'rel1')    -- pin current (or a given) version
  * CALL graft.drop_tag('/lake/t', 'rel1')
  * CALL graft.build_blooms('/lake/t', 'k,v')   -- point-lookup pruning index
  * CALL graft.clone('/lake/t', '/lake/fork')   -- zero-copy shallow clone
  * }}}
  *
  * Each is a thin SQL binding over the corresponding [[ManifestStore]]
  * operation (same OCC commits, same safety rules) and returns its result
  * as one row. Parameters use Spark's own default-value binding, so
  * trailing args are optional and named args (`keep_versions => 1`) work.
  */
object GraftProcedures {

  /** Table schema resolved from the manifest (self-describing tables). */
  private def schemaOf(spark: SparkSession, dir: String): StructType =
    ManifestStore.currentSnapshot(spark, dir).flatMap(_.schema).getOrElse(
      throw new IllegalArgumentException(
        s"no manifest table (or no recorded schema) at $dir"))

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def in(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def utf8(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  /** An optional byte-bound argument: SQL NULL and -1 both mean
    * "unbounded" (InternalRow.getLong reads a NULL slot as 0, which would
    * otherwise become the TIGHTEST bound), and the long arg is taken as
    * RAW BYTES. */
  private def bytesArg(args: InternalRow, i: Int): Option[Long] =
    if (args.isNullAt(i)) None else Some(args.getLong(i)).filter(_ >= 0)

  /** [[bytesArg]] with the long arg in MEBIBYTES, saturating instead of
    * wrapping on the ×2²⁰ (a huge "effectively unbounded" request must
    * not overflow negative and become one-group-per-call). */
  private def mbToBytes(args: InternalRow, i: Int): Option[Long] =
    bytesArg(args, i).map(mb =>
      if (mb > Long.MaxValue / (1024L * 1024)) Long.MaxValue
      else mb * 1024L * 1024)

  /** One procedure: `ps` ins, `out` row schema, `fn(spark, args)` → one
    * result row (scala values; strings converted).
    */
  private def proc(pname: String, ps: Seq[ProcedureParameter], out: StructType)
                  (fn: (SparkSession, InternalRow) => Seq[Any]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = s"graft manifest-table $pname"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = pname
        override def description(): String = s"graft manifest-table $pname"
        override def parameters(): Array[ProcedureParameter] = ps.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): JIterator[Scan] = {
          val spark = SparkSession.active
          val row = fn(spark, input)
          val scan: Scan = new LocalScan {
            override def readSchema(): StructType = out
            override def rows(): Array[InternalRow] =
              Array(new GenericInternalRow(row.map(utf8).toArray))
          }
          java.util.List.of(scan).iterator()
        }
      }
    }

  val all: Map[String, UnboundProcedure] = Map(
    "vacuum" -> proc("vacuum",
      Seq(in("table", StringType), in("keep_versions", IntegerType, "2"),
        in("retain_hours", DoubleType, "24.0"),
        in("dry_run", BooleanType, "false")),
      StructType.fromDDL("manifests_deleted INT, data_files_deleted INT")) {
      (spark, args) =>
        val (m, d) = ManifestStore.vacuum(spark, args.getUTF8String(0).toString,
          keepVersions = args.getInt(1),
          retainMillis = (args.getDouble(2) * 3600 * 1000).toLong,
          dryRun = args.getBoolean(3))
        Seq(m, d)
    },

    "compact" -> proc("compact",
      Seq(in("table", StringType), in("num_files", IntegerType, "1")),
      StructType.fromDDL("version BIGINT")) { (spark, args) =>
      val dir = args.getUTF8String(0).toString
      Seq(ManifestStore.compact(spark, dir, schemaOf(spark, dir), args.getInt(1)))
    },

    // max_input_mb bounds ONE call's rewrite to that much small-file
    // input (whole partition groups, ≥ 1 per call) — the 100 TB form:
    // repeat until version comes back NULL, each call one optimistic
    // commit, like migrate_layout (and like it, NULL also covers a
    // transient concurrent-conflict abort — re-call to distinguish).
    // -1 or SQL NULL = unbounded; needs target ≥ 2×min to converge
    // (see ManifestStore.compactSmall).
    "compact_small" -> proc("compact_small",
      Seq(in("table", StringType), in("min_file_mb", IntegerType, "32"),
        in("target_file_mb", IntegerType, "128"), in("zorder", StringType, "''"),
        in("max_input_mb", LongType, "-1")),
      StructType.fromDDL("version BIGINT")) { (spark, args) =>
      val dir = args.getUTF8String(0).toString
      val zo = args.getUTF8String(3).toString
      // convergence precondition of the bounded drain protocol (see
      // ManifestStore.compactSmall's scaladoc): with target < 2×min a
      // multi-file group's outputs can re-enter the small set every call
      // and a repeat-until-None loop never terminates — refuse loudly at
      // the user-facing surface instead of looping forever
      // target 0 stays a deliberate one-shot escape hatch ("one output per
      // group"); the core still logs the convergence warning for it
      require(args.getInt(2) == 0 || args.getInt(2) >= 2 * args.getInt(1),
        s"compact_small: target_file_mb (${args.getInt(2)}) must be >= " +
          s"2 * min_file_mb (${args.getInt(1)}) or a repeated drain loop " +
          "may never converge (rewritten groups can re-enter the small set); " +
          "pass target_file_mb = 0 for a deliberate one-shot full-group rewrite")
      Seq(ManifestStore.compactSmall(spark, dir, schemaOf(spark, dir),
        minFileBytes = args.getInt(1) * 1024L * 1024,
        targetFileBytes = args.getInt(2) * 1024L * 1024,
        zorderCols = if (zo.isEmpty) Nil
          else zo.split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty),
        maxInputBytes = mbToBytes(args, 4))
        .map(Long.box).orNull) // null = nothing to compact (< 2 small files)
    },

    "restore" -> proc("restore",
      Seq(in("table", StringType), in("version", LongType)),
      StructType.fromDDL("version BIGINT")) { (spark, args) =>
      Seq(ManifestStore.restore(spark, args.getUTF8String(0).toString, args.getLong(1)))
    },

    "create_tag" -> proc("create_tag",
      Seq(in("table", StringType), in("name", StringType),
        in("version", LongType, "-1")), // -1 = the current version
      StructType.fromDDL("version BIGINT")) { (spark, args) =>
      val dir = args.getUTF8String(0).toString
      val v =
        if (args.getLong(2) >= 0) args.getLong(2)
        else ManifestStore.currentSnapshot(spark, dir).map(_.version).getOrElse(
          throw new IllegalArgumentException(s"no manifest table at $dir"))
      ManifestStore.tag(spark, dir, args.getUTF8String(1).toString, v)
      Seq(v)
    },

    "drop_tag" -> proc("drop_tag",
      Seq(in("table", StringType), in("name", StringType)),
      StructType.fromDDL("dropped BOOLEAN")) { (spark, args) =>
      Seq(ManifestStore.deleteTag(spark, args.getUTF8String(0).toString,
        args.getUTF8String(1).toString))
    },

    "build_blooms" -> proc("build_blooms",
      Seq(in("table", StringType), in("columns", StringType),
        in("bits_per_key", IntegerType, "10")),
      StructType.fromDDL("version BIGINT")) { (spark, args) =>
      Seq(ManifestStore.buildBlooms(spark, args.getUTF8String(0).toString,
        args.getUTF8String(1).toString.split(",").toIndexedSeq
          .map(_.trim).filter(_.nonEmpty),
        bitsPerKey = args.getInt(2)))
    },

    "clone" -> proc("clone",
      Seq(in("table", StringType), in("target", StringType),
        in("version", LongType, "-1")), // -1 = latest
      StructType.fromDDL("version BIGINT")) { (spark, args) =>
      Seq(ManifestStore.cloneShallow(spark, args.getUTF8String(0).toString,
        args.getUTF8String(1).toString,
        version = Some(args.getLong(2)).filter(_ >= 0)))
    },

    // `CALL graft.set_partition_spec('/dir', 'hours(ts), bucket(16, k)')` —
    // ALTER-time partition-spec evolution ([[ManifestStore.setPartitionSpec]]):
    // one metadata-only commit redeclares the layout for FUTURE writes;
    // existing files keep pruning under the spec that wrote them (the
    // layout is per-file). '' = stop partitioning. Spark's ALTER TABLE
    // grammar has no partitioning clause, so the procedure is the SQL
    // surface for it (Iceberg needs a parser extension for the same).
    "set_partition_spec" -> proc("set_partition_spec",
      Seq(in("table", StringType), in("spec", StringType)),
      StructType.fromDDL("version BIGINT")) { (spark, args) =>
      Seq(ManifestStore.setPartitionSpec(spark,
        args.getUTF8String(0).toString,
        splitSpecs(args.getUTF8String(1).toString)))
    },

    // `CALL graft.rewrite_layout('/dir')` — the optional data-migration
    // half of set_partition_spec: one compact-style full rewrite of the
    // current contents through the partitioned writer, so every file
    // derives the CURRENT spec's values. Whole-table op; at scale use
    // migrate_layout below (bounded, incremental, retry-friendly).
    "rewrite_layout" -> proc("rewrite_layout",
      Seq(in("table", StringType)),
      StructType.fromDDL("version BIGINT")) { (spark, args) =>
      val dir = args.getUTF8String(0).toString
      Seq(ManifestStore.rewriteLayout(spark, dir, schemaOf(spark, dir)))
    },

    // `CALL graft.migrate_layout('/dir', max_bytes => 10737418240)` — the
    // 100 TB migration path ([[ManifestStore.migrateLayout]]): each call
    // rewrites up to max_bytes of OLD-GENERATION files (recorded layout
    // missing a current-spec field) in one optimistic commit; repeat until
    // files_remaining = 0. -1 = unbounded (all old-generation files in one
    // call). version is NULL when there was nothing to migrate or a
    // concurrent conflict aborted the call (retry).
    "migrate_layout" -> proc("migrate_layout",
      Seq(in("table", StringType), in("max_bytes", LongType, "-1")),
      StructType.fromDDL(
        "version BIGINT, files_rewritten INT, files_remaining INT")) {
      (spark, args) =>
        val dir = args.getUTF8String(0).toString
        ManifestStore.migrateLayout(spark, dir, schemaOf(spark, dir),
          maxBytes = bytesArg(args, 1)) match {
          // Seq[Any]: unadorned Seq(v, done, left) would unify on Long and
          // silently WIDEN the Int counts, breaking the declared INT row
          case Some((v, done, left)) => Seq[Any](v, done, left)
          case None => Seq[Any](null, 0, 0)
        }
    })

  /** Split a declared spec list on TOP-LEVEL commas only — `bucket(16, k),
    * days(ts)` is two fields, the comma inside `bucket(...)` is not a
    * separator.
    */
  private[sources] def splitSpecs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }
}

package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Attribute, Cast => CCast, EqualTo => CEqualTo, Expression, GreaterThan => CGreaterThan, GreaterThanOrEqual => CGreaterThanOrEqual, In => CIn, LessThan => CLessThan, LessThanOrEqual => CLessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, Filter, PrunedFilteredScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** The READ half of `format("graft-manifest")` — the table-format analog
  * of the reference's landing read (`services/staging/app/reader_landing.py:5-26`
  * reads back exactly what the landing write published; here the manifest
  * is the publication):
  *
  * {{{
  * spark.read.format("graft-manifest").load(dir)                    // latest
  * spark.read.format("graft-manifest").option("versionAsOf", 7).load(dir)
  * spark.read.format("graft-manifest").option("timestampAsOf", "2026-08-14T10:00:00Z").load(dir)
  * spark.read.format("graft-manifest").option("tag", "release-1").load(dir)
  * }}}
  *
  * Scale design — two paths, picked by what the pinned snapshot needs:
  *
  *  - **No deletion vectors** (every append-only and freshly-compacted
  *    table): a native [[HadoopFsRelation]] over [[ManifestFileIndex]].
  *    The scan IS Spark's vectorized parquet scan — whole-stage codegen,
  *    predicate pushdown to row groups, column pruning — and file listing
  *    comes from the manifest, never a directory walk. `listFiles`
  *    translates the query's data filters into conjunctive ranges and
  *    prunes with the manifest's per-file stats, partition values, and
  *    blooms ([[ManifestStore.pruneFilesWhere]]) — so
  *    `spark.read.format("graft-manifest").load(dir).where($"ts" >= X)`
  *    skips every file the metadata proves irrelevant, the 100 TB
  *    incremental-scan shape, with zero API beyond vanilla `spark.read`.
  *
  *  - **Deletion vectors present**: the snapshot's logical view is a scan
  *    MINUS tombstones ([[ManifestStore.readVersion]]'s anti-join), which
  *    a file-listing relation cannot express. A [[PrunedFilteredScan]]
  *    delegates to that DataFrame with the pushed filters and column
  *    prunes applied INSIDE it (so parquet still sees them); the one cost
  *    is the Row materialization at the DSv1 boundary — bounded, dv
  *    tables are the minority, and compaction returns a table to the
  *    native path.
  */
private[sources] object ManifestRead {

  /** Resolve which committed version the options pin. At most ONE of
    * versionAsOf / timestampAsOf / tag may be set — two specifiers that
    * disagree would silently read an unintended snapshot under any
    * priority rule, so conflicting options fail loudly (Delta's
    * discipline). `params` pre-lowercased.
    */
  def resolveSnapshot(spark: SparkSession, dir: String,
                      params: Map[String, String]): Option[ManifestStore.Snapshot] = {
    val pinned = Seq("versionasof", "timestampasof", "tag").filter(params.contains)
    require(pinned.size <= 1,
      s"conflicting time-travel options ${pinned.mkString(", ")} on $dir — " +
        "set at most one of versionAsOf / timestampAsOf / tag")
    params.get("versionasof").map(v => ManifestStore.readManifest(spark, dir, v.toLong))
      .orElse(params.get("timestampasof").map { ts =>
        val millis = parseTsMillis(ts)
        val v = ManifestStore.versionAsOf(spark, dir, millis).getOrElse(
          throw new NoSuchElementException(
            s"no version at $dir committed at or before $ts"))
        ManifestStore.readManifest(spark, dir, v)
      })
      .orElse(params.get("tag").map { t =>
        val v = ManifestStore.tagVersion(spark, dir, t).getOrElse(
          throw new NoSuchElementException(s"no tag '$t' at $dir"))
        ManifestStore.readManifest(spark, dir, v)
      })
      .orElse(ManifestStore.currentSnapshot(spark, dir))
  }

  /** Epoch millis from digits, ISO instant, or UTC date/datetime. */
  def parseTsMillis(ts: String): Long =
    if (ts.forall(_.isDigit)) ts.toLong
    else scala.util.Try(java.time.Instant.parse(ts).toEpochMilli).getOrElse {
      val local = scala.util.Try(
        java.time.LocalDateTime.parse(ts.replace(' ', 'T'))).getOrElse(
        java.time.LocalDate.parse(ts).atStartOfDay())
      local.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

  /** Catalyst literal value → the manifest stat space (`toString`-stable
    * long/double/string). None = not representable, no pruning on it.
    * Non-finite floating literals are REFUSED: Spark SQL orders NaN above
    * every value and treats NaN = NaN as true, semantics the min/max stat
    * comparisons (where NaN compares false everywhere) would invert into
    * wrongly pruning files that DO hold matching rows — the same reason
    * Spark's own ParquetFilters refuses NaN pushdown. ±Infinity literals
    * are likewise excluded; open-ended ranges carry
    * [[ManifestStore.Unbounded]] instead of a sentinel value, so e.g.
    * `x < 0` keeps a file whose values are all -Infinity.
    */
  private def statValue(v: Any): Option[Any] = v match {
    case null => None
    case s: UTF8String => Some(s.toString)
    case l: Long => Some(l)
    case i: Int => Some(i)
    case s: Short => Some(s.toInt)
    case b: Byte => Some(b.toInt)
    case d: Double => if (d.isNaN || d.isInfinite) None else Some(d)
    case f: Float => if (f.isNaN || f.isInfinite) None else Some(f.toDouble)
    case _ => None
  }

  /** Data filters → conjunctive `(column, lo, hi)` ranges for
    * [[ManifestStore.pruneFilesWhere]]. Unconvertible conjuncts are
    * simply not pruned on — row-level filtering still applies them, so
    * the translation can only keep too much, never too little.
    */
  def toRanges(filters: Seq[Expression]): Seq[(String, Any, Any)] =
    filters.flatMap(splitConjuncts)
      .map(e => normalizeDateTrunc(normalizeTsDateCast(e, exact = false)))
      .flatMap(splitConjuncts).map(normalizeStrictBounds).flatMap {
      case CEqualTo(a: Attribute, Literal(v, _)) =>
        statValue(v).map(sv => (a.name, sv, sv))
      case CEqualTo(Literal(v, _), a: Attribute) =>
        statValue(v).map(sv => (a.name, sv, sv))
      case CGreaterThan(a: Attribute, Literal(v, _)) => loRange(a.name, v)
      case CGreaterThanOrEqual(a: Attribute, Literal(v, _)) => loRange(a.name, v)
      case CLessThan(a: Attribute, Literal(v, _)) => hiRange(a.name, v)
      case CLessThanOrEqual(a: Attribute, Literal(v, _)) => hiRange(a.name, v)
      case CGreaterThan(Literal(v, _), a: Attribute) => hiRange(a.name, v)
      case CGreaterThanOrEqual(Literal(v, _), a: Attribute) => hiRange(a.name, v)
      case CLessThan(Literal(v, _), a: Attribute) => loRange(a.name, v)
      case CLessThanOrEqual(Literal(v, _), a: Attribute) => loRange(a.name, v)
      case CIn(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        // IN prunes by its value ENVELOPE [min, max] — coarser than
        // per-value bloom probes but conjunctive-safe
        val svs = vs.collect { case Literal(v, _) => statValue(v) }.flatten
        if (svs.size == vs.size) Some((a.name, minOf(svs), maxOf(svs))) else None
      case _ => None
    }

  /** True iff the conjunction of `filters` is EXACTLY the predicate
    * [[toRanges]] renders — every conjunct an equality or INCLUSIVE bound
    * between an attribute and a stat-typed literal, where "inclusive"
    * includes discrete strict bounds ([[normalizeStrictBounds]]) and
    * UTC date-cast comparisons ([[normalizeTsDateCast]]); IN,
    * continuous-domain strict bounds, and every other shape are
    * envelopes, not equivalences. A caller holding
    * this proof may treat "file wholly inside every range" as "every row
    * matches the predicate" — the whole-file delete planning
    * ([[ManifestStore.deleteWhere]] `exactRanges`).
    */
  def rangesExact(filters: Seq[Expression]): Boolean =
    filters.flatMap(splitConjuncts)
      .map(e => normalizeDateTrunc(normalizeTsDateCast(e, exact = true)))
      .flatMap(splitConjuncts).map(normalizeStrictBounds).forall {
      case CEqualTo(_: Attribute, Literal(v, _)) => statValue(v).isDefined
      case CEqualTo(Literal(v, _), _: Attribute) => statValue(v).isDefined
      case CGreaterThanOrEqual(_: Attribute, Literal(v, _)) => statValue(v).isDefined
      case CLessThanOrEqual(_: Attribute, Literal(v, _)) => statValue(v).isDefined
      case CGreaterThanOrEqual(Literal(v, _), _: Attribute) => statValue(v).isDefined
      case CLessThanOrEqual(Literal(v, _), _: Attribute) => statValue(v).isDefined
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** `CAST(ts AS DATE)` (SQL `date(ts)` / `to_date(ts)`) compared to a
    * DATE literal is the commonest time-series predicate users write
    * against a timestamp column — and under a UTC session zone the cast
    * is a monotone floor whose preimage is an EXACT micros range, so the
    * comparison rewrites to plain inclusive bounds on the timestamp
    * attribute and every downstream pruner fires as if the user had
    * written the range by hand: footer stats, `days(ts)`/`hours(ts)`
    * hidden-partition evidence, and (via [[rangesExact]]) whole-file
    * metadata DELETE planning. A non-UTC cast zone leaves the predicate
    * untouched — translating across an offset would mis-bin boundary
    * instants and prune files that hold matching rows. `year(x)` over a
    * DATE attribute, or over a TIMESTAMP attribute through the implicit
    * UTC cast, translates the same way (monotone; proleptic-Gregorian
    * year bounds from java.time, matching Spark's calendar).
    *
    * `exact = true` (the whole-file delete proof) skips the IN rewrite:
    * `date(ts) IN (d1, d3)` renders only its [d1, d3] ENVELOPE, and
    * treating that as exact would drop whole files whose days lie
    * BETWEEN the listed values.
    */
  private def normalizeTsDateCast(e: Expression, exact: Boolean): Expression = {
    val MicrosPerDay = 86400000000L
    def start(d: Long): Expression =
      Literal(d * MicrosPerDay, org.apache.spark.sql.types.TimestampType)
    def end(d: Long): Expression =
      Literal((d + 1L) * MicrosPerDay - 1L, org.apache.spark.sql.types.TimestampType)
    object TsDate {
      def unapply(x: Expression): Option[Attribute] = x match {
        case c: CCast if c.dataType == org.apache.spark.sql.types.DateType =>
          c.child match {
            case a: Attribute
                if a.dataType == org.apache.spark.sql.types.TimestampType &&
                  c.timeZoneId.exists(z => scala.util.Try(
                    java.time.ZoneId.of(z).normalized() ==
                      java.time.ZoneOffset.UTC).getOrElse(false)) => Some(a)
            case _ => None
          }
        case _ => None
      }
    }
    object DateLit {
      // same day-domain guard as yearDays: day·micros (and the ±1-day
      // neighbours the strict-bound rewrites take) must stay in Long. A
      // representable extreme DATE literal (constant-folded date_add
      // beyond ~year ±292278) would otherwise wrap to a WRONG micros
      // bound — e.g. `date(ts) < <huge date>` (true for all rows)
      // translating to `ts <= <negative>` prunes every file, and via
      // rangesExact the wrong range would feed whole-file DELETE
      // planning. Out of domain → no extraction → predicate untouched.
      private val dayLim = Long.MaxValue / MicrosPerDay - 1
      def unapply(x: Expression): Option[Long] = x match {
        case Literal(d: Int, org.apache.spark.sql.types.DateType)
            if d.toLong >= -dayLim && d.toLong <= dayLim => Some(d.toLong)
        case _ => None
      }
    }
    // `year(x)` is monotone too: over a DATE attribute directly, over a
    // TIMESTAMP attribute through the implicit UTC cast the analyzer
    // inserts (`Year(Cast(ts AS DATE))` — the TsDate guard applies).
    // Left = timestamp attribute (micros bounds), Right = date attribute
    // (epoch-day bounds).
    object YearOf {
      def unapply(x: Expression): Option[Either[Attribute, Attribute]] = x match {
        case org.apache.spark.sql.catalyst.expressions.Year(TsDate(a)) =>
          Some(Left(a))
        case org.apache.spark.sql.catalyst.expressions.Year(a: Attribute)
            if a.dataType == org.apache.spark.sql.types.DateType =>
          Some(Right(a))
        case _ => None
      }
    }
    object YearLit {
      def unapply(x: Expression): Option[Int] = x match {
        case Literal(y: Int, org.apache.spark.sql.types.IntegerType) => Some(y)
        case _ => None
      }
    }
    // year bounds in epoch DAYS (proleptic Gregorian, matching Spark);
    // None when the year arithmetic leaves LocalDate's domain — the
    // predicate then stays untouched, never a wrong range
    def yearDays(y: Int): Option[(Long, Long)] = scala.util.Try {
      (java.time.LocalDate.of(y, 1, 1).toEpochDay,
        java.time.LocalDate.of(y + 1, 1, 1).toEpochDay - 1L)
    }.toOption.filter { case (s, t) =>
      // day·micros must stay in Long (and Int for DATE bounds): years
      // beyond ±~292k leave the timestamp domain — predicate untouched
      val lim = Long.MaxValue / MicrosPerDay - 1
      s >= -lim && t <= lim
    }
    def yearBounds(k: Either[Attribute, Attribute],
                   loY: Option[Int], hiY: Option[Int]): Option[Expression] = {
      def dayLo(y: Int) = yearDays(y).map(_._1)
      def dayHi(y: Int) = yearDays(y).map(_._2)
      val a = k.fold(identity, identity)
      def bound(day: Long, lower: Boolean): Expression = k match {
        case Left(_) =>
          val lit =
            if (lower) start(day)
            else Literal((day + 1L) * MicrosPerDay - 1L,
              org.apache.spark.sql.types.TimestampType)
          if (lower) CGreaterThanOrEqual(a, lit) else CLessThanOrEqual(a, lit)
        case Right(_) =>
          val lit = Literal(day.toInt, org.apache.spark.sql.types.DateType)
          if (lower) CGreaterThanOrEqual(a, lit) else CLessThanOrEqual(a, lit)
      }
      (loY, hiY) match {
        case (Some(l), Some(h)) => for (lo <- dayLo(l); hi <- dayHi(h))
          yield CAnd(bound(lo, lower = true), bound(hi, lower = false))
        case (Some(l), None) => dayLo(l).map(bound(_, lower = true))
        case (None, Some(h)) => dayHi(h).map(bound(_, lower = false))
        case _ => None
      }
    }
    e match {
      case CEqualTo(YearOf(k), YearLit(y)) =>
        yearBounds(k, Some(y), Some(y)).getOrElse(e)
      case CEqualTo(YearLit(y), YearOf(k)) =>
        yearBounds(k, Some(y), Some(y)).getOrElse(e)
      case CGreaterThanOrEqual(YearOf(k), YearLit(y)) =>
        yearBounds(k, Some(y), None).getOrElse(e)
      case CGreaterThan(YearOf(k), YearLit(y)) =>
        yearBounds(k, Some(y + 1), None).getOrElse(e)
      case CLessThanOrEqual(YearOf(k), YearLit(y)) =>
        yearBounds(k, None, Some(y)).getOrElse(e)
      case CLessThan(YearOf(k), YearLit(y)) =>
        yearBounds(k, None, Some(y - 1)).getOrElse(e)
      case CGreaterThanOrEqual(YearLit(y), YearOf(k)) =>
        yearBounds(k, None, Some(y)).getOrElse(e)
      case CGreaterThan(YearLit(y), YearOf(k)) =>
        yearBounds(k, None, Some(y - 1)).getOrElse(e)
      case CLessThanOrEqual(YearLit(y), YearOf(k)) =>
        yearBounds(k, Some(y), None).getOrElse(e)
      case CLessThan(YearLit(y), YearOf(k)) =>
        yearBounds(k, Some(y + 1), None).getOrElse(e)
      case CEqualTo(TsDate(a), DateLit(d)) =>
        CAnd(CGreaterThanOrEqual(a, start(d)), CLessThanOrEqual(a, end(d)))
      case CEqualTo(DateLit(d), TsDate(a)) =>
        CAnd(CGreaterThanOrEqual(a, start(d)), CLessThanOrEqual(a, end(d)))
      case CGreaterThanOrEqual(TsDate(a), DateLit(d)) =>
        CGreaterThanOrEqual(a, start(d))
      case CGreaterThan(TsDate(a), DateLit(d)) =>
        CGreaterThanOrEqual(a, start(d + 1))
      case CLessThanOrEqual(TsDate(a), DateLit(d)) =>
        CLessThanOrEqual(a, end(d))
      case CLessThan(TsDate(a), DateLit(d)) =>
        CLessThanOrEqual(a, end(d - 1))
      case CGreaterThanOrEqual(DateLit(d), TsDate(a)) =>
        CLessThanOrEqual(a, end(d))
      case CGreaterThan(DateLit(d), TsDate(a)) =>
        CLessThanOrEqual(a, end(d - 1))
      case CLessThanOrEqual(DateLit(d), TsDate(a)) =>
        CGreaterThanOrEqual(a, start(d))
      case CLessThan(DateLit(d), TsDate(a)) =>
        CGreaterThanOrEqual(a, start(d + 1))
      case CIn(TsDate(a), vs) if !exact && vs.nonEmpty &&
          vs.forall { case DateLit(_) => true; case _ => false } =>
        val ds = vs.collect { case DateLit(d) => d }
        CAnd(CGreaterThanOrEqual(a, start(ds.min)),
          CLessThanOrEqual(a, end(ds.max)))
      case other => other
    }
  }

  /** `col IN (...)` value sets for per-value pruning: unlike the range
    * envelope [[toRanges]] keeps, each value probes stats/partition/bloom
    * individually and the union is the scan set ([[ManifestStore.pruneFilesIn]])
    * — on a bloomed or clustered key this is the handful-of-files path.
    */
  def toInSets(filters: Seq[Expression]): Seq[(String, Seq[Any])] =
    filters.flatMap(splitConjuncts).flatMap {
      case CIn(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val svs = vs.collect { case Literal(v, _) => statValue(v) }.flatten
        if (svs.size == vs.size) Some((a.name, svs)) else None
      case CEqualTo(a: Attribute, Literal(v, _)) =>
        statValue(v).map(sv => (a.name, Seq(sv)))
      case CEqualTo(Literal(v, _), a: Attribute) =>
        statValue(v).map(sv => (a.name, Seq(sv)))
      case _ => None
    }

  /** `date_trunc(unit, ts)` compared to a TIMESTAMP literal — the shape
    * BI tools generate for every time-bucketed chart — is a monotone
    * floor for EVERY unit, so each comparison translates to exact micros
    * bounds on the timestamp attribute (UTC cast zone required, as in
    * [[normalizeTsDateCast]]): fixed-width units by integer arithmetic,
    * calendar units (year/quarter/month/week) through java.time's
    * proleptic Gregorian. An equality against an UNALIGNED literal is
    * unsatisfiable — left untouched (the row filter returns empty; never
    * guess a range). Unknown units and domain-edge arithmetic leave the
    * predicate untouched.
    */
  private def normalizeDateTrunc(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.TruncTimestamp
    import org.apache.spark.sql.types.{StringType, TimestampType}
    val MicrosPerDay = 86400000000L
    def utcZone(z: Option[String]): Boolean = z.exists(s => scala.util.Try(
      java.time.ZoneId.of(s).normalized() == java.time.ZoneOffset.UTC)
      .getOrElse(false))
    object Trunc {
      def unapply(x: Expression): Option[(Attribute, String)] = x match {
        case t @ TruncTimestamp(Literal(f: UTF8String, StringType),
            a: Attribute, _)
            if a.dataType == TimestampType && utcZone(t.timeZoneId) =>
          Some((a, f.toString.toUpperCase(java.util.Locale.ROOT)))
        case _ => None
      }
    }
    object TsLit {
      def unapply(x: Expression): Option[Long] = x match {
        case Literal(v: Long, TimestampType) => Some(v)
        case _ => None
      }
    }
    // (floor-aligned, next-aligned) around `micros` for `unit`
    def floorNext(micros: Long, unit: String): Option[(Long, Long)] = {
      val fixed: Map[String, Long] = Map(
        "DAY" -> MicrosPerDay, "DD" -> MicrosPerDay,
        "HOUR" -> 3600000000L, "MINUTE" -> 60000000L,
        "SECOND" -> 1000000L, "MILLISECOND" -> 1000L)
      fixed.get(unit) match {
        case Some(u) => scala.util.Try {
          val fl = Math.floorDiv(micros, u) * u
          (fl, Math.addExact(fl, u))
        }.toOption
        case None => scala.util.Try {
          val d = java.time.Instant
            .ofEpochSecond(Math.floorDiv(micros, 1000000L),
              Math.floorMod(micros, 1000000L) * 1000L)
            .atOffset(java.time.ZoneOffset.UTC).toLocalDate
          val (flD, nxD) = unit match {
            case "YEAR" | "YYYY" | "YY" =>
              val f = java.time.LocalDate.of(d.getYear, 1, 1)
              (f, f.plusYears(1))
            case "QUARTER" =>
              val f = java.time.LocalDate.of(d.getYear,
                ((d.getMonthValue - 1) / 3) * 3 + 1, 1)
              (f, f.plusMonths(3))
            case "MON" | "MONTH" | "MM" =>
              val f = d.withDayOfMonth(1)
              (f, f.plusMonths(1))
            case "WEEK" => // Spark's date_trunc WEEK floors to Monday
              val f = d.minusDays(d.getDayOfWeek.getValue - 1L)
              (f, f.plusDays(7))
          }
          (Math.multiplyExact(flD.toEpochDay, MicrosPerDay),
            Math.multiplyExact(nxD.toEpochDay, MicrosPerDay))
        }.toOption
      }
    }
    def lit(v: Long): Expression = Literal(v, TimestampType)
    // the four bound shapes, all EXACT (see each derivation inline)
    def ge(a: Attribute, t: Long, u: String) = floorNext(t, u).map {
      case (fl, nx) => CGreaterThanOrEqual(a, lit(if (fl == t) t else nx)) }
    def gt(a: Attribute, t: Long, u: String) = floorNext(t, u).map {
      case (_, nx) => CGreaterThanOrEqual(a, lit(nx)) }
    def le(a: Attribute, t: Long, u: String) = floorNext(t, u).map {
      case (_, nx) => CLessThanOrEqual(a, lit(nx - 1)) }
    def lt(a: Attribute, t: Long, u: String) = floorNext(t, u).map {
      case (fl, nx) =>
        CLessThanOrEqual(a, lit(if (fl == t) t - 1 else nx - 1)) }
    def eq(a: Attribute, t: Long, u: String) = floorNext(t, u).flatMap {
      case (fl, nx) =>
        if (fl == t) Some(CAnd(CGreaterThanOrEqual(a, lit(t)),
          CLessThanOrEqual(a, lit(nx - 1))))
        else None // unaligned equality: unsatisfiable, leave untouched
    }
    e match {
      case CEqualTo(Trunc(a, u), TsLit(t)) => eq(a, t, u).getOrElse(e)
      case CEqualTo(TsLit(t), Trunc(a, u)) => eq(a, t, u).getOrElse(e)
      case CGreaterThanOrEqual(Trunc(a, u), TsLit(t)) => ge(a, t, u).getOrElse(e)
      case CGreaterThan(Trunc(a, u), TsLit(t)) => gt(a, t, u).getOrElse(e)
      case CLessThanOrEqual(Trunc(a, u), TsLit(t)) => le(a, t, u).getOrElse(e)
      case CLessThan(Trunc(a, u), TsLit(t)) => lt(a, t, u).getOrElse(e)
      case CGreaterThanOrEqual(TsLit(t), Trunc(a, u)) => le(a, t, u).getOrElse(e)
      case CGreaterThan(TsLit(t), Trunc(a, u)) => lt(a, t, u).getOrElse(e)
      case CLessThanOrEqual(TsLit(t), Trunc(a, u)) => ge(a, t, u).getOrElse(e)
      case CLessThan(TsLit(t), Trunc(a, u)) => gt(a, t, u).getOrElse(e)
      case other => other
    }
  }

  /** A STRICT bound against a DISCRETE-domain literal is equivalent to
    * the inclusive bound one step tighter — `ts < X` ≡ `ts <= X-1µs`,
    * `k > 5` ≡ `k >= 6` — for timestamps (micros), dates (days), and
    * integrals. This matters twice: [[toRanges]] prunes one stat value
    * tighter, and [[rangesExact]] can accept the normalized inclusive
    * form, making `DELETE WHERE ts < cutoff` (and the `date(ts) <= d`
    * retention shape, which Spark's own optimizer rewrites into a strict
    * timestamp bound) a whole-file metadata edit instead of a dv scan.
    * Continuous domains (double/float/string) never rewrite — there is
    * no "one step". Bounds already at the domain edge (`< MinValue`)
    * stay as-is: unsatisfiable either way, and the decrement would wrap.
    */
  private def normalizeStrictBounds(e: Expression): Expression = {
    import org.apache.spark.sql.types._
    def bounds(dt: DataType): Option[(Long, Long)] = dt match {
      case TimestampType | LongType => Some((Long.MinValue, Long.MaxValue))
      case DateType | IntegerType => Some((Int.MinValue.toLong, Int.MaxValue.toLong))
      case ShortType => Some((Short.MinValue.toLong, Short.MaxValue.toLong))
      case ByteType => Some((Byte.MinValue.toLong, Byte.MaxValue.toLong))
      case _ => None
    }
    object Disc {
      def unapply(x: Expression): Option[(Long, Long, Long, Long => Literal)] =
        x match {
          case l @ Literal(v, dt) => bounds(dt).flatMap { case (mn, mx) =>
            (v match {
              case n: Long => Some(n)
              case n: Int => Some(n.toLong)
              case n: Short => Some(n.toLong)
              case n: Byte => Some(n.toLong)
              case _ => None
            }).map { n =>
              val mk = (y: Long) => Literal(dt match {
                case TimestampType | LongType => y
                case DateType | IntegerType => y.toInt
                case ShortType => y.toShort
                case ByteType => y.toByte
              }, dt)
              (n, mn, mx, mk)
            }
          }
          case _ => None
        }
    }
    e match {
      case CLessThan(a: Attribute, Disc(v, mn, _, mk))
          if a.dataType == e.children(1).dataType && v != mn =>
        CLessThanOrEqual(a, mk(v - 1))
      case CGreaterThan(a: Attribute, Disc(v, _, mx, mk))
          if a.dataType == e.children(1).dataType && v != mx =>
        CGreaterThanOrEqual(a, mk(v + 1))
      case CLessThan(Disc(v, _, mx, mk), a: Attribute) // v < a ≡ a >= v+1
          if a.dataType == e.children(0).dataType && v != mx =>
        CGreaterThanOrEqual(a, mk(v + 1))
      case CGreaterThan(Disc(v, mn, _, mk), a: Attribute) // v > a ≡ a <= v-1
          if a.dataType == e.children(0).dataType && v != mn =>
        CLessThanOrEqual(a, mk(v - 1))
      case other => other
    }
  }

  /** One-sided ranges carry [[ManifestStore.Unbounded]] on the open side —
    * type-independent, so string columns prune on `col >= lit` too (no
    * string max-sentinel problem), and float ranges stay exact at ±Inf.
    */
  private def loRange(col: String, v: Any) =
    statValue(v).map(sv => (col, sv, ManifestStore.Unbounded: Any))

  private def hiRange(col: String, v: Any) =
    statValue(v).map(sv => (col, ManifestStore.Unbounded: Any, sv))

  private def minOf(vs: Seq[Any]): Any = vs.reduce { (a, b) =>
    (a, b) match {
      case (x: Long, y: Long) => if (x <= y) x else y
      case (x: Int, y: Int) => if (x <= y) x else y
      case (x: Double, y: Double) => if (x <= y) x else y
      case (x: String, y: String) => if (x <= y) x else y
      case _ => a
    }
  }

  private def maxOf(vs: Seq[Any]): Any = vs.reduce { (a, b) =>
    (a, b) match {
      case (x: Long, y: Long) => if (x >= y) x else y
      case (x: Int, y: Int) => if (x >= y) x else y
      case (x: Double, y: Double) => if (x >= y) x else y
      case (x: String, y: String) => if (x >= y) x else y
      case _ => a
    }
  }

  /** DSv1 pushed filter → Column for the dv fallback's INNER DataFrame.
    * None = can't translate; Spark re-applies every filter above the scan
    * anyway (this relation declares nothing handled), so translation is
    * an I/O optimization with no correctness weight.
    */
  def filterToColumn(f: Filter): Option[Column] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.sources._
    f match {
      case _: AlwaysTrue => Some(org.apache.spark.sql.functions.lit(true))
      case _: AlwaysFalse => Some(org.apache.spark.sql.functions.lit(false))
      case EqualTo(a, v) => Some(col(a) === v)
      case GreaterThan(a, v) => Some(col(a) > v)
      case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
      case LessThan(a, v) => Some(col(a) < v)
      case LessThanOrEqual(a, v) => Some(col(a) <= v)
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case Or(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case Not(c) => filterToColumn(c).map(!_)
      case _ => None
    }
  }
}

/** [[FileIndex]] over one pinned manifest snapshot: the file list comes
  * from the manifest (no directory walk — on an object store, no LIST at
  * all beyond one status per file), is immutable for the relation's
  * lifetime (snapshot isolation: concurrent commits never change what
  * this scan reads), and `listFiles` prunes with the manifest's per-file
  * stats / partition values / blooms against the query's data filters.
  *
  * Partition columns live IN the data files ([[ManifestStore.appendPartitioned]]
  * writes hidden path clones), so `partitionSchema` is empty and every
  * query column is a data column — partition pruning happens here via the
  * manifest's recorded partition values, not via Spark's path inference.
  */
private[sources] class ManifestFileIndex(spark: SparkSession, dir: String,
                                         snap: ManifestStore.Snapshot,
                                         dataSchema: StructType) extends FileIndex {

  private val root = new Path(dir)
  private val fsys = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // zero-RPC when the manifest recorded byte sizes (every commit since
  // the sizes field): FileStatus is synthesized from (path, size) — the
  // immutable write-once files need no modtime/block detail for split
  // planning. Files from pre-sizes manifests fall back to one
  // getFileStatus each, once per relation.
  private lazy val statusByRel: Map[String, FileStatus] =
    snap.files.map { rel =>
      val p = fsys.makeQualified(absPath(rel))
      rel -> (snap.sizes.get(rel) match {
        case Some(len) =>
          new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p)
        case None => fsys.getFileStatus(p)
      })
    }.toMap

  private def absPath(rel: String): Path = {
    val p = new Path(rel)
    if (p.isAbsolute || rel.contains("://")) p else new Path(root, rel)
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // filters reference this relation's output = the PHYSICAL schema, so
    // the pruning probes run in physical currency (stats/partition/bloom
    // keys are physical by the mapping invariant) — no translation here
    val ranges = ManifestRead.toRanges(dataFilters)
    val ranged =
      if (ranges.isEmpty) snap.files
      else ManifestStore.pruneFilesWherePhys(snap, ranges)
    // IN / equality sets prune per VALUE on top of the range envelope:
    // each value probes stats/partition values/blooms, union per set,
    // intersect across conjuncts
    val inSets = ManifestRead.toInSets(dataFilters)
    val kept = inSets.foldLeft(ranged) { case (fs, (c, vs)) =>
      val admitted = ManifestStore.pruneFilesInPhys(snap, c, vs).toSet
      fs.filter(admitted)
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(statusByRel).toArray))
  }

  override def inputFiles: Array[String] =
    snap.files.map(r => absPath(r).toString).toArray

  override def refresh(): Unit = () // immutable snapshot: nothing to refresh

  override def sizeInBytes: Long = statusByRel.values.map(_.getLen).sum
}

/** The dv fallback: correct logical view (tombstones anti-joined) with
  * pushed filters and column pruning applied inside the delegated plan.
  */
private[sources] class ManifestDvRelation(spark: SparkSession, val dir: String,
                                          val version: Long, val dataSchema: StructType)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext
  override def schema: StructType = dataSchema

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    import org.apache.spark.sql.functions.col
    val base = ManifestStore.readVersion(spark, dir, version, dataSchema)
    val filtered = filters.toIndexedSeq.flatMap(ManifestRead.filterToColumn)
      .foldLeft(base)(_ filter _)
    // exact contract: emitted rows carry requiredColumns in order — an
    // empty projection (count(*) pushdown) yields zero-column rows
    filtered.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }
}

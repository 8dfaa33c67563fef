package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, pmod, unix_micros, crc32, datediff, to_date}
import org.apache.spark.sql.types._

/** Iceberg-style HIDDEN PARTITIONING for manifest tables: a declared
  * partition field is either a plain IDENTITY column or a TRANSFORM of a
  * source column — `years(ts)`, `months(ts)`, `days(ts)`, `hours(ts)`,
  * `bucket(n, key)`, `truncate(w, key)` — recorded
  * in the manifest's `partitionCols` as its rendered spec string and per
  * file as one derived partition VALUE. The user never materializes or
  * filters on a derived column: writes compute the value from the source
  * column, and reads prune files from ordinary predicates ON THE SOURCE
  * COLUMN (`ts BETWEEN a AND b`, `key = v`) via the transform's
  * monotonicity (days/hours) or point mapping (bucket). This is the
  * reference's hand-rolled `run_id=` landing layout
  * (`services/staging/app/writer_landing.py:29-35`) generalized: the
  * transform lives in table metadata, not in every producer's code.
  *
  * Spec strings double as the manifest serialization — parentheses cannot
  * appear in a (physical) column name the engine assigns, so parsing is
  * unambiguous and identity columns remain plain names (full backward
  * compatibility with pre-transform manifests).
  *
  * Transform semantics (all UTC, timezone-independent):
  *  - `days(ts)`: floor(micros-since-epoch / 86 400 000 000) for
  *    TIMESTAMP; the epoch-day value itself for DATE.
  *  - `hours(ts)`: floor(micros / 3 600 000 000), TIMESTAMP only.
  *  - `bucket(n, c)`: crc32(canonical string of c) mod n — the repo's
  *    portable-hash discipline (like the md5 blooms): the executor-side
  *    derivation (`crc32(CAST(c AS STRING))`) and the driver-side probe
  *    (java.util.zip.CRC32 over the same UTF-8 bytes) agree bit-for-bit
  *    with no engine-private hash. Integral/string sources only (the
  *    types whose canonical string is engine-stable).
  *  - `truncate(w, c)`: for strings the first w UNICODE CODE POINTS
  *    (Spark's `substring` and the driver probe both count code points,
  *    so the two agree on supplementary characters); for integrals
  *    `floorDiv(c, w) · w` (the width-w interval floor). Both are
  *    MONOTONIC in their column's ordering (a string prefix never sorts
  *    past a longer string it prefixes; the interval floor never sorts
  *    past its argument), so range predicates on the source column
  *    translate to exact endpoint prunes — the domain/URL-prefix layout
  *    a text corpus shards by, with day-style pruning.
  *
  *  - `months(ts)` / `years(ts)`: months (years) since 1970-01 in the
  *    proleptic Gregorian calendar — `months(2024-03-07T10:00Z) = 650`,
  *    `years(1969-12-31) = -1`. The executor derivation goes through the
  *    UTC epoch-DAY first (`date_add(epoch, floorDiv(micros, day))`) so
  *    it is session-timezone-independent like days/hours, and the driver
  *    probe uses `java.time.LocalDate` — the same proleptic Gregorian
  *    calendar Spark 3+ uses, so the two agree on every instant
  *    including pre-1970 (negative indexes) and leap days. Both are
  *    MONOTONIC in the source column, so range predicates (and the
  *    `year(x)`/`date_trunc` rewrites in [[ManifestRead]]) prune
  *    exactly; the driver-side interval inverses
  *    ([[monthStartEpochDay]]/[[yearStartEpochDay]]) give containment
  *    proofs for whole-partition metadata deletes. Calendar edges that
  *    overflow `LocalDate`'s domain throw into the callers' `Try` —
  *    conservatively "no prune"/"unprovable", never wrong.
  */
private[graft] object PartitionSpec {

  sealed trait Kind
  case object Identity extends Kind
  case object Days extends Kind
  case object Hours extends Kind
  case object Months extends Kind
  case object Years extends Kind
  final case class Bucket(n: Int) extends Kind
  final case class Truncate(w: Int) extends Kind

  final case class Spec(kind: Kind, col: String) {
    def render: String = kind match {
      case Identity => col
      case Days => s"days($col)"
      case Hours => s"hours($col)"
      case Months => s"months($col)"
      case Years => s"years($col)"
      case Bucket(n) => s"bucket($n,$col)"
      case Truncate(w) => s"truncate($w,$col)"
    }
    def isIdentity: Boolean = kind == Identity
  }

  val MicrosPerDay: Long = 86400000000L
  val MicrosPerHour: Long = 3600000000L

  private val DaysRe = """days\(([^()]+)\)""".r
  private val HoursRe = """hours\(([^()]+)\)""".r
  private val MonthsRe = """months\(([^()]+)\)""".r
  private val YearsRe = """years\(([^()]+)\)""".r
  private val BucketRe = """bucket\((\d+),\s*([^()]+)\)""".r
  private val TruncateRe = """truncate\((\d+),\s*([^()]+)\)""".r

  def parse(s: String): Spec = s match {
    case DaysRe(c) => Spec(Days, c.trim)
    case HoursRe(c) => Spec(Hours, c.trim)
    case MonthsRe(c) => Spec(Months, c.trim)
    case YearsRe(c) => Spec(Years, c.trim)
    case BucketRe(n, c) => Spec(Bucket(n.toInt), c.trim)
    case TruncateRe(w, c) => Spec(Truncate(w.toInt), c.trim)
    case c => Spec(Identity, c)
  }

  /** The SOURCE column a declared partition field derives from. */
  def sourceCol(s: String): String = parse(s).col

  /** Rewrite the inner column name (logical ↔ physical translation). */
  def mapCol(s: String, f: String => String): String = {
    val sp = parse(s)
    sp.copy(col = f(sp.col)).render
  }

  /** Source-column types each transform admits — refusal is loud at
    * declaration AND at write (a manifest hand-edited to an invalid
    * combination must not silently mis-derive).
    */
  def validate(spec: Spec, dt: DataType, where: String): Unit = spec.kind match {
    case Identity =>
      require(Set("long", "integer", "short", "byte", "string")(dt.typeName),
        s"partition column '${spec.col}' has type ${dt.typeName} — only " +
          s"integral/string columns partition by identity (their hive " +
          s"path round-trip is exact); $where")
    case Days =>
      require(dt == TimestampType || dt == DateType,
        s"days(${spec.col}) needs a TIMESTAMP or DATE column, got " +
          s"${dt.typeName}; $where")
    case Hours =>
      require(dt == TimestampType,
        s"hours(${spec.col}) needs a TIMESTAMP column, got ${dt.typeName}; " +
          where)
    case Months | Years =>
      require(dt == TimestampType || dt == DateType,
        s"${spec.render} needs a TIMESTAMP or DATE column, got " +
          s"${dt.typeName}; $where")
    case Bucket(n) =>
      require(n > 0, s"bucket(${spec.col}) needs a positive bucket count")
      require(Set("long", "integer", "short", "byte", "string")(dt.typeName),
        s"bucket($n, ${spec.col}) needs an integral/string column " +
          s"(portable canonical string), got ${dt.typeName}; $where")
    case Truncate(w) =>
      require(w > 0, s"truncate(${spec.col}) needs a positive width")
      require(Set("long", "integer", "short", "byte", "string")(dt.typeName),
        s"truncate($w, ${spec.col}) needs an integral/string column, " +
          s"got ${dt.typeName}; $where")
  }

  /** The derived partition value as a Column — what the hive-partitioned
    * writer clones and partitions by. NULL source values derive NULL and
    * land in the hive default partition (kept by every scan — safe).
    *
    * days/hours use exact integer floor arithmetic: `us - pmod(us, unit)`
    * is an exact multiple of `unit`, so the division is exact in double
    * and the cast back to long is the true floor quotient — no
    * truncate-toward-zero error on pre-1970 instants.
    */
  def valueColumn(spec: Spec, c: Column, dt: DataType): Column = spec.kind match {
    case Identity => c
    case Days if dt == DateType =>
      datediff(c, to_date(lit("1970-01-01")))
    case Days => floorDiv(unix_micros(c), MicrosPerDay)
    case Hours => floorDiv(unix_micros(c), MicrosPerHour)
    case Months =>
      val d = utcDate(c, dt)
      ((org.apache.spark.sql.functions.year(d) - lit(1970)) * lit(12) +
        org.apache.spark.sql.functions.month(d) - lit(1)).cast("long")
    case Years =>
      (org.apache.spark.sql.functions.year(utcDate(c, dt)) - lit(1970))
        .cast("long")
    case Bucket(n) => pmod(crc32(c.cast("string").cast("binary")), lit(n.toLong))
    case Truncate(w) if dt == StringType =>
      org.apache.spark.sql.functions.substring(c, 1, w) // code points
    case Truncate(w) =>
      val cl = c.cast("long")
      cl - pmod(cl, lit(w.toLong)) // = floorDiv(c, w) * w, exact
  }

  private def floorDiv(us: Column, unit: Long): Column = {
    // `us - pmod(us, unit)` is exactly divisible by `unit`, but Spark's
    // `/` is DOUBLE division: beyond 2^53 (timestamps past ~year 2255,
    // e.g. 9999-12-31 sentinels) the quotient could round off by a day
    // and a containment proof over the recorded value would mislabel a
    // boundary row into the adjacent partition. DECIMAL(38,0) division
    // keeps every representable micros value exact (the true quotient has
    // ≤ 19 digits, well inside precision 38), so the executor derivation
    // matches Math.floorDiv across the full TIMESTAMP domain.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    ((us - pmod(us, lit(unit))).cast(dec) / lit(unit).cast(dec)).cast("long")
  }

  /** The source instant's UTC calendar DATE as a Column — for TIMESTAMP
    * via the epoch-day floor (session-timezone-independent, exactly
    * `floorDiv(micros, day)` like the days() transform), for DATE the
    * column itself. `year`/`month` over a DATE are timezone-free, so
    * months/years derive identically on every executor configuration.
    */
  private def utcDate(c: Column, dt: DataType): Column =
    if (dt == DateType) c
    else org.apache.spark.sql.functions.date_add(
      to_date(lit("1970-01-01")),
      floorDiv(unix_micros(c), MicrosPerDay).cast("int"))

  /** Driver-side transform of a PROBE value already coerced to the stat
    * space (Long micros for TIMESTAMP sources, Long epoch-days for DATE
    * sources) — must agree exactly with [[valueColumn]].
    */
  def probeOrd(spec: Spec, dt: DataType, statValue: Long): Long = spec.kind match {
    case Days if dt == DateType => statValue
    case Days => Math.floorDiv(statValue, MicrosPerDay)
    case Hours => Math.floorDiv(statValue, MicrosPerHour)
    case Months | Years =>
      // LocalDate is Spark 3+'s own proleptic Gregorian; ofEpochDay
      // throws outside ±~365M-year domain → callers' Try → no prune.
      val day = if (dt == DateType) statValue
                else Math.floorDiv(statValue, MicrosPerDay)
      val d = java.time.LocalDate.ofEpochDay(day)
      val m = (d.getYear - 1970L) * 12L + (d.getMonthValue - 1)
      if (spec.kind == Months) m else d.getYear - 1970L
    case Truncate(w) => Math.floorDiv(statValue, w.toLong) * w
    case _ => throw new IllegalArgumentException(
      s"probeOrd is for monotonic transforms, got ${spec.render}")
  }

  /** First epoch-day of month index `m` (months since 1970-01) — the
    * interval inverse for months() containment proofs: a recorded value
    * `m` proves every row's source day lies in
    * `[monthStartEpochDay(m), monthStartEpochDay(m+1))`. Throws via
    * `LocalDate.of` when the year leaves its ±999,999,999 domain —
    * callers Try→unprovable (never a silent wrap).
    */
  def monthStartEpochDay(m: Long): Long = {
    val y = Math.addExact(1970L, Math.floorDiv(m, 12L))
    java.time.LocalDate.of(Math.toIntExact(y),
      Math.floorMod(m, 12L).toInt + 1, 1).toEpochDay
  }

  /** First epoch-day of year index `y` (years since 1970) — [[monthStartEpochDay]]'s
    * years() sibling.
    */
  def yearStartEpochDay(y: Long): Long =
    java.time.LocalDate.of(
      Math.toIntExact(Math.addExact(1970L, y)), 1, 1).toEpochDay

  /** Driver-side `truncate(w, c)` of a STRING probe — the first w Unicode
    * CODE POINTS, matching Spark's `substring(c, 1, w)` (UTF8String counts
    * code points, not UTF-16 code units) on supplementary characters too.
    */
  def truncateStr(s: String, w: Int): String =
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))

  /** True when the transform derives a STRING partition value (today:
    * `truncate` over a string column). Those values hex-encode into the
    * hive path segment (see [[ManifestStore.writeHivePartitioned]]) —
    * transform clones are opaque `__p_tN=` segments anyway, and raw
    * non-ASCII values would break on POSIX-locale JVMs and byte-mangling
    * object stores; the manifest records the DECODED true value, so
    * pruning never sees the encoding. Long-valued transforms
    * (days/hours/bucket, integral truncate) render as ASCII digits and
    * stay readable in the path.
    */
  def pathHexEncoded(spec: Spec, dt: DataType): Boolean = spec.kind match {
    case Truncate(_) => dt == StringType
    case _ => false
  }

  /** Invert Spark's `hex(str)` — hex digits back to the UTF-8 string. */
  def fromHexUtf8(h: String): String = {
    require(h.length % 2 == 0, s"odd-length hex partition value: $h")
    val bytes = new Array[Byte](h.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Driver-side bucket of a canonical value string — crc32 over UTF-8
    * bytes mod n, matching `pmod(crc32(CAST(c AS STRING)), n)` exactly.
    */
  def bucketOf(canonical: String, n: Int): Long = {
    val crc = new java.util.zip.CRC32()
    crc.update(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Math.floorMod(crc.getValue, n.toLong)
  }
}

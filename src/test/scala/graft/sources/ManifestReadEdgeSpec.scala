package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Domain-edge behavior of [[ManifestRead]]'s predicate translation —
  * unit-level because Spark's own optimizer (cast unwrapping, ANSI
  * constant folding) throws on these extreme literals before a SQL query
  * would reach the manifest FileIndex; the translation seam itself must
  * still never render a WRAPPED bound: via [[ManifestRead.rangesExact]]
  * a wrong range would feed whole-file DELETE planning (silent data
  * loss), and via [[ManifestRead.toRanges]] it would prune files whose
  * rows match (`date(ts) < <huge date>` — true for all rows — wrapping
  * to `ts <= <negative>`).
  */
class ManifestReadEdgeSpec extends graft.SparkSpec {

  private val MicrosPerDay = 86400000000L
  private val ts = AttributeReference("ts", TimestampType)()
  private def dcast = Cast(ts, DateType, Some("UTC"))

  test("extreme DATE literal leaves date(ts) untranslated — never wraps") {
    // ~2.0e9 epoch days (year ~5.4M) — far past Long.MaxValue/MicrosPerDay
    val huge = Literal(2000000000, DateType)
    val hugeNeg = Literal(-2000000000, DateType)
    assert(ManifestRead.toRanges(Seq(LessThan(dcast, huge))).isEmpty,
      "out-of-micros-domain upper bound must not translate")
    assert(ManifestRead.toRanges(Seq(GreaterThan(dcast, hugeNeg))).isEmpty,
      "out-of-micros-domain lower bound must not translate")
    assert(ManifestRead.toRanges(Seq(EqualTo(dcast, huge))).isEmpty)
    // the exact-range proof (whole-file DELETE planning) must refuse too
    assert(!ManifestRead.rangesExact(Seq(LessThanOrEqual(dcast, huge))),
      "a wrapped bound must never count as an exact range")
    assert(!ManifestRead.rangesExact(Seq(EqualTo(dcast, huge))))
  }

  test("in-domain DATE literal still translates to the exact micros range") {
    val day = Literal(19733, DateType) // 2024-01-11 UTC
    val r = ManifestRead.toRanges(Seq(EqualTo(dcast, day)))
    assert(r.nonEmpty && r.forall(_._1 == "ts"), r.toString)
    val los = r.collect { case ("ts", lo: Long, _) => lo }
    val his = r.collect { case ("ts", _, hi: Long) => hi }
    assert(los.contains(19733L * MicrosPerDay), s"lo bounds: $los")
    assert(his.contains(19734L * MicrosPerDay - 1L), s"hi bounds: $his")
    assert(ManifestRead.rangesExact(Seq(EqualTo(dcast, day))))
  }

  test("the day-domain guard sits exactly at Long.MaxValue/MicrosPerDay - 1") {
    val lim = (Long.MaxValue / MicrosPerDay - 1).toInt
    assert(ManifestRead.toRanges(
      Seq(EqualTo(dcast, Literal(lim, DateType)))).nonEmpty,
      "the last in-domain day must still translate")
    assert(ManifestRead.toRanges(
      Seq(EqualTo(dcast, Literal(lim + 1, DateType)))).isEmpty,
      "one day past the guard must leave the predicate untouched")
    assert(ManifestRead.toRanges(
      Seq(EqualTo(dcast, Literal(-lim, DateType)))).nonEmpty)
    assert(ManifestRead.toRanges(
      Seq(EqualTo(dcast, Literal(-(lim + 1), DateType)))).isEmpty)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators for corpus metadata. [[TextAnalysis]]
  * handles content-level PII (regex redaction, q66); this file handles the
  * STRUCTURAL side — quasi-identifier combinations (language × source ×
  * length band × …) that re-identify authors even after the text itself is
  * scrubbed.
  *
  * The release discipline is k-anonymity with a local-recoding
  * generalization ladder: each row's quasi-identifier tuple is generalized
  * (trailing attributes replaced by `*`, most specific first) just far
  * enough that at least `k` corpus rows share the generalized prefix. Rows
  * already in a crowd of ≥ k publish untouched; rare combinations coarsen
  * attribute by attribute; a row unique even by its first attribute
  * publishes fully suppressed.
  *
  * Scale: prefix population counts are one partially-aggregated groupBy per
  * ladder level (|levels| = |quasi attributes|, a handful), each collapsing
  * to at most the attribute-combination cardinality. Coarser prefixes
  * broadcast back; the full-tuple count joins by key (AQE broadcasts it
  * when genuinely small — a high-cardinality combination must not be
  * forced into executor memory). No window ever touches row-level data;
  * the corpus is scanned once per level for the count and once for the
  * final labeling.
  */
object Privacy {

  /** k-anonymize `quasiCols` (name → expression, ordered most-public
    * first). Output: `idCol`, one string column per quasi attribute with
    * `*` above the row's generalization point, and `anon_level` — how many
    * trailing attributes were generalized (0 = published exactly,
    * |quasiCols| = fully suppressed).
    *
    * The guarantee is over the PUBLISHED prefix: every output row's
    * non-`*` prefix is shared by ≥ k corpus rows (counted over the whole
    * corpus, independent of those rows' own chosen levels), unless even
    * the empty prefix has < k rows (corpus smaller than k).
    */
  def kAnonymize(df: DataFrame, idCol: String,
                 quasiCols: Seq[(String, Column)], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier")
    require(k >= 1, "k must be >= 1")
    val names = quasiCols.map(_._1)
    val base = df.select(col(idCol).as("_id") +:
      quasiCols.map { case (n, c) => c.cast("string").as(n) }: _*)
    // per-level prefix population counts: level j keeps the first
    // (|quasi| - j) attributes; j = |quasi| is the empty prefix (1 row).
    // Each count is a partial-aggregated groupBy to attribute-combination
    // cardinality — never a row-level window. Coarser prefixes (j ≥ 1)
    // are bounded by shrinking attribute domains and broadcast outright;
    // the FULL-tuple count (j = 0) can be large on a high-cardinality
    // combination, so it joins by key and AQE broadcasts it only when it
    // is genuinely small.
    val counted = (0 to names.size).foldLeft(base) { (acc, j) =>
      val prefix = names.dropRight(j)
      if (prefix.isEmpty)
        acc.crossJoin(broadcast(base.agg(count(lit(1)).as(s"_n$j"))))
      else {
        val cnt = base.groupBy(prefix.map(col): _*).agg(count(lit(1)).as(s"_n$j"))
        if (j == 0) acc.join(cnt, prefix)
        else acc.join(broadcast(cnt), prefix)
      }
    }
    // lowest level whose prefix crowd reaches k (fully suppressed if none)
    val level = (0 to names.size).reverse.foldLeft(lit(names.size)) {
      (els, j) => when(col(s"_n$j") >= k, lit(j)).otherwise(els)
    }
    val leveled = counted.withColumn("anon_level", level)
    val outCols = names.zipWithIndex.map { case (n, i) =>
      // attribute i survives iff it sits inside the published prefix
      when(col("anon_level") <= lit(names.size - i - 1), col(n))
        .otherwise(lit("*")).as(n)
    }
    leveled.select(col("_id").as(idCol) +: outCols :+ col("anon_level"): _*)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Gopher-style n-gram repetition statistics of a text column, one
  * imperative pass: whitespace tokens → word n-grams (space-joined, like
  * [[WordShingles]] but NOT distinct — repetition is the signal here) →
  * per-gram occurrence counts → two character-share metrics over the raw
  * text length:
  *
  *  - `top_share`  = max over grams of (count · gram_chars) / text_chars —
  *    the character share of the heaviest repeated n-gram ("fraction of
  *    characters in the most common n-gram", the top-2/3/4-gram family of
  *    Gopher's repetition filters; taking the max of count·chars rather
  *    than chars-of-the-max-count gram makes the tie-break engine-neutral).
  *  - `dup_frac`   = Σ over grams with count > 1 of ((count−1) · gram_chars)
  *    / text_chars — the character share of REPEATED occurrences (each
  *    gram's first occurrence is legitimate text; everything after is
  *    repetition), the duplicate-n-gram-fraction family.
  *
  * Both are 0 for empty text or texts shorter than n tokens. A per-doc
  * hash-map pass — O(tokens), map-side, no shuffle; the explode + groupBy
  * formulation would shuffle |docs|·|grams| rows to compute a per-document
  * scalar.
  */
case class GramRepetitionStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")
  override def dataType: DataType = StructType(Seq(
    StructField("top_share", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))
  override def prettyName: String = "graft_gram_repetition"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
    }
  }

  def compute(input: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val nChars = input.numChars()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.setDouble(0, 0.0); row.setDouble(1, 0.0)
    if (nChars == 0) return row
    val toks = input.toString.split(" ").filter(_.nonEmpty)
    if (toks.length < n) return row
    val counts = new java.util.HashMap[String, Int](math.max(16, toks.length))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1, Integer.sum _)
      i += 1
    }
    var topChars = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong
      // code POINTS, matching the code-point denominator (numChars) and the
      // oracle's length() — String.length counts UTF-16 units and would
      // inflate shares (past 1.0) on supplementary-plane text
      val len = e.getKey.codePointCount(0, e.getKey.length).toLong
      if (c * len > topChars) topChars = c * len
      if (c > 1) dupChars += (c - 1) * len
    }
    row.setDouble(0, topChars.toDouble / nChars)
    row.setDouble(1, dupChars.toDouble / nChars)
    row
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramRepetition", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramRepetitionStats =
    copy(child = newChild)
}

/** Character-unigram statistics of a text column, one imperative pass:
  * per-code-point counts → Shannon entropy (base 2) + code-point count +
  * distinct-code-point count. Low character entropy flags degenerate text
  * (repeated fillers, padding, encoding junk) and high entropy flags
  * binary-ish/minified content — a standard cheap quality signal next to
  * the token-level metrics in `TextAnalysis.qualityMetrics`.
  *
  * Entropy is computed as `log2(n) − (Σ c·log2 c)/n` — one log per DISTINCT
  * character rather than one per occurrence. Counts are over code points
  * (so astral-plane characters count once, matching any engine that splits
  * to characters rather than UTF-16 units). Empty text → (0.0, 0, 0).
  *
  * Map-side, codegen'd, no shuffle — the explode-chars + groupBy
  * formulation would shuffle |docs|·|chars| rows for a per-document scalar.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("entropy", DoubleType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "graft_char_entropy"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
    }
  }

  def compute(input: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    val s = input.toString
    val n = s.codePointCount(0, s.length).toLong
    if (n == 0L) {
      row.setDouble(0, 0.0); row.setLong(1, 0L); row.setLong(2, 0L)
      return row
    }
    val counts = new java.util.HashMap[Integer, Long](64)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, java.lang.Long.sum _)
      i += Character.charCount(cp)
    }
    var sumClogC = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sumClogC += c * (math.log(c) / math.log(2.0))
    }
    row.setDouble(0, math.log(n.toDouble) / math.log(2.0) - sumClogC / n)
    row.setLong(1, n)
    row.setLong(2, counts.size().toLong)
    row
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) via the JDK's
  * `java.text.Normalizer` — the canonicalization step that belongs BEFORE
  * any hash-keyed text operation: "é" as U+00E9 and as e+U+0301 are the
  * same text to a reader but different bytes to sha256/xxhash64, so
  * un-normalized corpora leak duplicates straight past exact dedup.
  * Spark SQL has no normalization built-in; this closes the gap as a
  * native expression.
  *
  * The `isNormalized` fast path returns the INPUT UTF8String untouched —
  * for ASCII/already-NFC corpora (the common case) the expression does
  * one scan and zero allocation per row, and stays inside whole-stage
  * codegen either way (`doGenCode` calls the kernel directly; no
  * CodegenFallback stage demotion).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unknown normalization form: $form")
  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_unicode_normalize_$form"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
    }
  }

  @transient private lazy val normForm = java.text.Normalizer.Form.valueOf(form)

  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, normForm)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, normForm))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalize", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** BPE segmentation of a single word under a learned merge list — the
  * encode side of [[graft.functions.Bpe.train]]: merges are applied in
  * LEARN ORDER, each greedily left-to-right and non-overlapping across the
  * word's current symbols, which reproduces exactly the segmentation the
  * training loop's vocabulary table held when it learned them (the
  * priority-queue encoders of production tokenizers compute the same
  * result; order-application is the defining form). One imperative pass
  * per merge over an in-place symbol buffer — O(merges · len) per word,
  * zero shuffle, inside whole-stage codegen.
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_segment"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
    }
  }

  def compute(input: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val word = input.toString
    var syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(word.substring(ci, ci + n))
      ci += n
    }
    merges.foreach { case (l, r) =>
      if (syms.size > 1) {
        val next = new java.util.ArrayList[String](syms.size)
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms.get(i) == l && syms.get(i + 1) == r) {
            next.add(l + r); i += 2 // consume both; non-overlapping greedy
          } else {
            next.add(syms.get(i)); i += 1
          }
        }
        syms = next
      }
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) {
      arr(k) = org.apache.spark.unsafe.types.UTF8String.fromString(syms.get(k))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeSegment", this)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * All pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * map-side, no UDFs, no shuffles; at 100 TB these run at scan speed and fuse
  * into whole-stage codegen with the parquet reader.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped. Single-space split + filter
    * (not `\s+` regex) so the semantics are trivially portable across
    * engines; use [[tokensRegex]] when inputs have tabs/newlines.
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Regex tokenizer: splits on any whitespace run (tabs/newlines included);
    * same token boundaries as [[tokens]] on single-spaced text.
    */
  def tokensRegex(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** BPE-ish pre-tokenizer: alphanumeric runs and punctuation runs are
    * separate tokens ("don't stop." → don, ', t, stop, .) — the word/punct
    * boundary split every byte-pair tokenizer applies before merging, so
    * counting these approximates an LLM token budget far better than
    * whitespace words (which glue trailing punctuation onto words).
    */
  def tokensBpe(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Token count under the BPE-ish pre-tokenization — the budget-planning
    * count for sequence packing against an LLM context window.
    */
  def tokenCountBpe(text: Column): Column = size(tokensBpe(text))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.!?,;:]", ""))

  /** Count of tokens found in `vocab`. */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(vocab)))

  /** English stopwords used by the quality score. */
  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it", "for", "on")

  /** Quality metrics: integer counts plus a stopword ratio. The ratio is
    * rounded to 4 places so the value is comparison-stable across engines.
    */
  def qualityMetrics(text: Column): Map[String, Column] = {
    val toks = tokens(text)
    val nTokens = size(toks)
    val nStop = vocabHits(toks, enStopwords)
    Map(
      "n_chars" -> length(text),
      "n_tokens" -> nTokens,
      "n_punct" -> punctCount(text),
      "n_stopwords" -> nStop,
      "stop_ratio" -> Portable.roundPortable(nStop.cast("double") / nTokens.cast("double"), 4))
  }

  /** Non-empty lines of a text column (blank / whitespace-only lines
    * dropped — they carry no repetition signal and would dominate the
    * duplicate count of any normally-formatted document).
    */
  def lines(text: Column): Column =
    filter(split(text, "\n"), l => trim(l) =!= lit(""))

  /** Duplicate-line fraction — the fraction of a document's non-empty lines
    * that are repeats of an earlier line (Gopher's duplicate-line repetition
    * filter: boilerplate, navigation chrome, and generated text repeat
    * whole lines). 0 for documents with no non-empty lines. Pure built-ins:
    * map-side, codegen'd, no shuffle.
    */
  def dupLineFraction(text: Column): Column = {
    val ls = lines(text)
    val nl = size(ls)
    when(nl > 0,
      (nl - size(array_distinct(ls))).cast("double") / nl.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Gopher-style repetition metrics: line-level duplication (built-ins)
    * plus n-gram character-share stats (single-pass native expression —
    * see [[graft.plans.GramRepetitionStats]] for the exact definitions).
    * The dominant signals real corpus filtering cuts on: documents whose
    * text is mostly repeated lines or repeated word n-grams are generated /
    * scraped-boilerplate, not prose. Ratios rounded to 4 places for
    * engine-stable comparison, like [[qualityMetrics]].
    */
  def repetitionMetrics(df: org.apache.spark.sql.DataFrame, text: Column,
                        n: Int = 2): Map[String, Column] = {
    // null text ≡ empty text: every metric is 0, never null — a null-text
    // row must not diverge between the null-propagating native expression
    // and the line metrics (or between engines)
    val txt = coalesce(text, lit(""))
    val st = graft.plans.GraftFunctions.gramRepetitionStats(df, txt, n)
    Map(
      "n_lines" -> size(lines(txt)).cast("long"),
      "dup_line_frac" -> Portable.roundPortable(dupLineFraction(txt), 4),
      s"top_${n}gram_share" -> Portable.roundPortable(st.getField("top_share"), 4),
      s"dup_${n}gram_frac" -> Portable.roundPortable(st.getField("dup_frac"), 4))
  }

  /** Language-ID heuristic: count stopword hits per candidate language and
    * take the argmax with a fixed priority order (en > de > es > fr; `other`
    * when nothing hits). Deterministic by construction; n-gram-free so it
    * stays a pure vectorizable expression.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ein", "zu", "ist"),
    "es" -> Seq("el", "la", "los", "que", "y", "un", "es", "por"),
    "fr" -> Seq("le", "les", "et", "dans", "est", "une", "pour", "sur"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    langStopwords.map { case (lang, words) => lang -> vocabHits(toks, words) }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    // argmax with priority = list order: a language wins only if strictly
    // greater than every earlier one and >= every later one.
    val best = scores.zipWithIndex.foldRight(lit("other")) {
      case (((lang, score), i), elseCol) =>
        val beats = scores.zipWithIndex.collect {
          case ((_, s), j) if j < i => score > s
          case ((_, s), j) if j > i => score >= s
        }
        when(beats.reduceOption(_ && _).getOrElse(lit(true)), lit(lang)).otherwise(elseCol)
    }
    when(anyHit, best).otherwise(lit("other"))
  }

  /** Canonical-text fingerprint: md5 of lowercased, whitespace-collapsed,
    * trimmed text. Stable across formatting-only edits.
    */
  def fingerprint(text: Column): Column =
    md5(trim(lower(regexp_replace(text, "\\s+", " "))))

  /** Rolling (polynomial) hash over the token stream — a Rabin-Karp style
    * document signature: h = (h·B + hash(tᵢ)) mod p, p = 2^31−1. The modulus
    * keeps every intermediate < 2^62 (ANSI-safe, no long overflow).
    * Order-sensitive, unlike [[fingerprint]].
    */
  def rollingHash(text: Column, base: Long = 1000003L): Column = {
    val p = 2147483647L
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(base) + pmod(xxhash64(t), lit(p)), lit(p)))
  }

  /** [[rollingHash]] with a PORTABLE per-token hash: the first 12 hex chars
    * (48 bits) of md5, `conv(substr(md5(t),1,12),16,10)`, mod p — the
    * q52/q110 "portable md5" discipline, so the signature is recomputable
    * by any engine with md5 (the q28 oracle re-derives it in DuckDB with
    * nibble parsing). Same fold, same modulus; every intermediate stays
    * < 2^52 (48-bit hash < p after mod; acc·base < 2^51), ANSI-safe. The
    * xxhash64 form remains the fast path for Spark-only lineages (one
    * hash vs an md5 per token).
    */
  def rollingHashPortable(text: Column, base: Long = 1000003L): Column = {
    val p = 2147483647L
    aggregate(tokens(coalesce(text, lit(""))), lit(0L),
      (acc, t) => pmod(acc * lit(base) +
        pmod(conv(substring(md5(t), 1, 12), 16, 10).cast("long"), lit(p)), lit(p)))
  }

  /** Word `n`-gram shingles of the token array (empty below n tokens). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** PII patterns, in REDACTION ORDER. Engine-portable regex subset: no
    * backreferences, no lookaround — valid and identical under both Java's
    * regex (Spark codegen) and RE2 (DuckDB/Go scrubbers), so a redacted
    * corpus is reproducible and auditable by either stack.
    *
    * Order matters and is part of the contract: emails first (an email
    * exhausts its digits before the phone pattern can see them), IPv4
    * before phone (a dotted quad like 10.123.245.7 contains digit runs a
    * permissive phone pattern could half-match; once it is `<IP>` there are
    * no digits left). Patterns are deliberately high-precision / moderate
    * recall — a corpus scrubber must not mangle ordinary prose (version
    * strings, dates), so the phone pattern demands the full 3-3-4 NANP
    * shape (optional country prefix) with at most 2 separator chars
    * between groups — dates and semver never form a 3-3-4 digit chain.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b",
    "phone" -> "(\\+?\\d{1,3}[-. ()]{0,2})?\\d{3}[-. ()]{0,2}\\d{3}[-. ]?\\d{4}")

  /** Redact every PII match with `<TYPE>` placeholders, applying
    * [[piiPatterns]] in order. Pure `regexp_replace` chain: map-side,
    * codegen'd, no shuffle — scrubbing runs at scan speed, the only
    * admissible cost for a pass every document must take at 100 TB.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"<${name.toUpperCase}>")
    }

  /** Per-type PII match counts over the ORIGINAL text (independent counts;
    * audit/monitoring signal for scrub-rate drift, not the redaction
    * itself). Keys = pattern names from [[piiPatterns]].
    */
  def piiCounts(text: Column): Map[String, Column] =
    piiPatterns.map { case (name, pat) =>
      name -> size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
    }.toMap

  /** Composite quality-gate verdict: the FIRST failing check names the
    * rejection (`too_short`, `repetitive_2gram`, `dup_2gram`,
    * `low_entropy`), else `keep` — the audit-friendly form of a corpus
    * filter (per-reason drop rates are the monitoring signal; a bare
    * boolean hides which filter fired). Check order is part of the
    * contract. All inputs are the engine-stable rounded metrics
    * ([[repetitionMetrics]], [[charEntropyMetrics]]), compared in double
    * space, so the verdict is reproducible by any engine. Map-side, no
    * shuffle — a row-local decision over single-pass metrics.
    */
  def qualityVerdict(df: org.apache.spark.sql.DataFrame, text: Column,
                     minTokens: Int = 12, maxTopShare: Double = 0.15,
                     maxDupShare: Double = 0.12, minEntropy: Double = 3.9): Column = {
    val rep = repetitionMetrics(df, text, n = 2)
    val ent = charEntropyMetrics(df, text)
    when(tokenCount(coalesce(text, lit(""))) < minTokens, lit("too_short"))
      .when(rep("top_2gram_share") > lit(maxTopShare), lit("repetitive_2gram"))
      .when(rep("dup_2gram_frac") > lit(maxDupShare), lit("dup_2gram"))
      .when(ent("char_entropy") < lit(minEntropy), lit("low_entropy"))
      .otherwise(lit("keep"))
  }

  /** Character-unigram quality stats: Shannon entropy (base 2, rounded to 4
    * places for engine-stable comparison), code-point count, distinct
    * code-point count — low entropy flags filler/padding/degenerate text,
    * high entropy flags minified/binary-ish content. Null text ≡ empty.
    * Single native pass ([[graft.plans.CharEntropyStats]]) — map-side at
    * scan speed; the explode-chars + groupBy formulation would shuffle
    * |docs|·|chars| rows for a per-document scalar.
    */
  def charEntropyMetrics(df: org.apache.spark.sql.DataFrame, text: Column)
      : Map[String, Column] = {
    val st = graft.plans.GraftFunctions.charEntropyStats(df, coalesce(text, lit("")))
    Map(
      // portable floor-form rounding (see Portable.scala): aligns with
      // DuckDB's binary-space rounding where Spark's BigDecimal round()
      // can sit 1 ulp off on boundary values
      "char_entropy" -> Portable.roundPortable(st.getField("entropy"), 4),
      "n_chars" -> st.getField("n_chars"),
      "n_distinct_chars" -> st.getField("n_distinct"))
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash every positional word n-gram, slide a window of `w`
    * consecutive hashes, keep each window's minimum — the guarantee is
    * that any match of length ≥ w+n-1 words between two documents shares
    * at least one selected fingerprint, at a ~2/(w+1) selection density.
    * The local-min rule picks the SAME grams regardless of where a copied
    * span lands in a document, which positional sampling (every k-th
    * gram) cannot do — this is the copy-detection primitive between exact
    * hashing (q20) and shingle-set Jaccard (q22).
    *
    * Hash = md5 hex, compared lexicographically — a portable total order
    * any engine reproduces (the selection only needs SOME fixed order).
    * Documents with fewer than `w` grams contribute their single overall
    * minimum (the winnowing boundary rule); gram-less docs select none.
    * All array ops are per-row and codegen'd: map-side at scan speed,
    * fingerprint count ~2/(w+1) of gram count — the downstream index
    * join is over the SELECTED set only.
    *
    * Returns `n_grams`, `n_fp` (distinct selected), and `fp_sha` (sha256
    * over the sorted selected set — a stable identity for the whole
    * fingerprint set, directly comparable across engines).
    */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, text: Column,
                         n: Int = 3, w: Int = 4): Map[String, Column] = {
    val hashes = winnowGramHashes(df, text, n)
    val fps = array_sort(array_distinct(winnowMins(hashes, w)))
    Map(
      "n_grams" -> size(hashes).cast("long"),
      "n_fp" -> size(fps).cast("long"),
      "fp_sha" -> sha2(concat_ws("", fps), 256))
  }

  /** Positional (non-distinct) word n-gram md5s of a text column — the
    * hash stream winnowing selects from. */
  private[functions] def winnowGramHashes(df: org.apache.spark.sql.DataFrame,
                                          text: Column, n: Int): Column =
    transform(graft.plans.GraftFunctions.wordShingles(
      df, coalesce(text, lit("")), n, distinct = false), g => md5(g))

  /** Window-of-`w` local minima over a hash stream (with repeats; callers
    * distinct as needed) — the winnowing selection rule, including the
    * short-document boundary case (fewer than `w` grams → overall min). */
  private[functions] def winnowMins(hashes: Column, w: Int): Column = {
    val nWin = size(hashes) - w + 1
    when(nWin >= 1,
        transform(sequence(lit(1), greatest(nWin, lit(1))),
          i => array_min(slice(hashes, i, lit(w)))))
      .when(size(hashes) > 0, array(array_min(hashes)))
      .otherwise(array().cast("array<string>"))
  }

  /** CCNet-style canonicalization before hashing: lowercase, replace every
    * character outside `[a-z0-9 ]` with a space (so punctuation separates
    * words instead of gluing them), collapse space runs, trim. Null ≡
    * empty. Exact-rule-portable — lower + two regex rewrites any engine
    * reproduces byte-for-byte — so the sha256 of the canonical form is a
    * stable cross-engine dedup key that exact dedup should group on
    * instead of raw text (it merges case/punctuation variants the raw
    * hash of [[NearDup.exactDedup]] treats as distinct). Pure codegen'd
    * string ops: map-side at scan speed.
    */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(coalesce(text, lit(""))), "[^a-z0-9 ]", " "),
      " +", " "))
}

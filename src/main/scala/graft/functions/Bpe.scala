package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over a distributed corpus — the
  * Sennrich et al. 2016 merge-learning algorithm re-shaped for Spark.
  *
  * The classical formulation scans the raw corpus once per merge; at 100 TB
  * that is one full pass per vocabulary entry. The map-reduce shape used
  * here (and by every production tokenizer trainer) pays the corpus scan
  * ONCE, collapsing it to a distinct-word frequency table — Heaps' law puts
  * that at O(corpus^~0.5) rows, millions of rows for a 100 TB corpus, not
  * billions — and then runs every merge iteration against that compact
  * cached table. Per-iteration cost is proportional to vocabulary size,
  * independent of corpus size.
  *
  * Two entry points:
  *  - [[mergePairCounts]] — one iteration's pair statistics (the q103
  *    oracle surface): exactly the ranking the first merge decision reads.
  *  - [[train]] — the full driver-side merge loop: learn `merges` merges,
  *    each materialized round truncating lineage like
  *    [[NearDup.connectedComponents]] does. The per-round `.limit(1)
  *    .collect()` is a bounded 1-row control-plane read, the same class as
  *    the CC convergence count.
  */
object Bpe {

  /** Distinct-word frequency table of a text column: the ONE corpus-wide
    * scan BPE training pays. Map-side-combining groupBy over whitespace
    * tokens ([[TextAnalysis.tokens]] semantics, empties dropped); output
    * cardinality is the vocabulary, not the corpus.
    */
  def wordFrequencies(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextAnalysis.tokens(coalesce(text, lit("")))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** All adjacent (left, right) symbol pairs of a symbol array, in order,
    * repeats kept — repetition inside a word is exactly what pair counting
    * must see.
    */
  private def adjacentPairs(symbols: Column): Column = {
    val m = greatest(size(symbols) - 1, lit(0))
    zip_with(slice(symbols, lit(1), m), slice(symbols, lit(2), m),
      (a, b) => struct(a.as("left"), b.as("right")))
  }

  /** Single-character symbol array of a word; the iteration-0 segmentation. */
  private def charSymbols(word: Column): Column =
    filter(split(word, ""), c => c =!= lit(""))

  /** Pair statistics of the FIRST merge iteration (symbols = characters),
    * ranked the way the merge decision reads them: count descending, pair
    * ascending (a total order, so top-k is engine-reproducible). `pair` is
    * the concatenated two symbols — unambiguous at iteration 0 where every
    * symbol is one character.
    *
    * Scale: one corpus scan into the word-frequency table (map-side
    * combine), then pair explosion over vocabulary-sized input; the top-k
    * is a TakeOrderedAndProject over at most |alphabet|² groups, never a
    * full sort of the corpus.
    */
  def mergePairCounts(df: DataFrame, text: Column, k: Int): DataFrame =
    wordFrequencies(df, text)
      .select(col("freq"), explode(adjacentPairs(charSymbols(col("word")))).as("p"))
      .groupBy(concat(col("p.left"), col("p.right")).as("pair"))
      .agg(sum("freq").as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(k)

  /** Greedy left-to-right application of one learned merge (l, r) to a
    * symbol array, as a fold: consumed pairs cannot overlap ("aaaa" under
    * (a,a) becomes [aa, aa], not [aa, aa, a]), matching the reference BPE
    * re-segmentation. `get` (0-based, null out-of-bounds) keeps the
    * empty-accumulator probe safe under ANSI mode.
    */
  private def applyMerge(symbols: Column, l: String, r: String): Column =
    aggregate(symbols, array().cast("array<string>"),
      (acc, x) =>
        when(get(acc, size(acc) - 1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Segment a word column under a learned merge list (the encode side of
    * [[train]]): a native single pass per word ([[graft.plans.BpeSegment]]),
    * applying merges in learn order. Returns array<string> symbols.
    */
  def segment(df: DataFrame, word: Column, merges: Seq[(String, String)]): Column = {
    val name = f"graft_bpe_segment_${merges.hashCode & 0xffffffffL}%08x"
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => graft.plans.BpeSegment(exprs.head, merges), "built-in")
    call_function(name, word)
  }

  /** Token count of a text column under a learned BPE vocabulary: each
    * whitespace word contributes its segment count. The budget-planning
    * number AFTER tokenizer training — [[TextAnalysis.tokenCountBpe]]'s
    * regex approximation, made exact for the learned vocab. Map-side only.
    */
  def encodedTokenCount(df: DataFrame, text: Column,
                        merges: Seq[(String, String)]): Column =
    aggregate(
      transform(TextAnalysis.tokens(coalesce(text, lit(""))),
        w => size(segment(df, w, merges))),
      lit(0L), (acc, x) => acc + x.cast("long"))

  /** Learn `merges` BPE merges. Returns (left, right, pair_count) in learn
    * order; stops early when no pair remains (fully merged vocabulary).
    *
    * Loop shape: the vocabulary-sized symbol table is materialized each
    * round ([[Par.materialize]] — lineage truncated, else round N's plan
    * embeds N nested folds); the argmax read is 1 row. Corpus is scanned
    * exactly once, up front.
    */
  def train(df: DataFrame, text: Column, merges: Int): Seq[(String, String, Long)] = {
    var words = Par.materialize(
      wordFrequencies(df, text)
        .select(charSymbols(col("word")).as("symbols"), col("freq")))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (learned.size < merges && !done) {
      val top = words
        .select(col("freq"), explode(adjacentPairs(col("symbols"))).as("p"))
        .groupBy(col("p.left").as("l"), col("p.right").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val l = top.head.getString(0)
        val r = top.head.getString(1)
        learned += ((l, r, top.head.getLong(2)))
        words = Par.materialize(
          words.select(applyMerge(col("symbols"), l, r).as("symbols"), col("freq")))
      }
    }
    learned.toSeq
  }
}

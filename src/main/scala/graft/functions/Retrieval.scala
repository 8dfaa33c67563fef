package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval scoring for corpus curation: BM25 lexical relevance and
  * reciprocal-rank fusion of lexical + vector rankings — the stack behind
  * retrieval-based dedup, targeted corpus carving ("give me the docs about
  * X"), and hybrid search QA over a training corpus.
  *
  * Exactness contract: every per-(doc, term) BM25 contribution is one
  * fixed double expression over exact integer counts (document length,
  * term frequency, document frequency, N; avgdl is an exact-integer sum
  * divided once), rounded to 10 and DECIMAL-summed — so scores are
  * partition-order-free and any engine reproduces them; inexact constants
  * (k1) are shipped as the same source decimals and combined with the
  * same operations on both sides, never pre-folded into a different
  * literal.
  *
  * Scale: the exploded token stream is filtered to the QUERY TERMS before
  * any aggregation (the shuffle carries |docs|·|query terms| rows, not
  * the corpus vocabulary); term document-frequencies and the 1-row corpus
  * stats ride broadcasts; fusion is an id-equi full-outer join of two
  * already-small ranked lists.
  */
object Retrieval {

  /** BM25 (Lucene's non-negative idf variant) of every document against a
    * bag of query `terms`. Returns (id, bm25) for documents matching at
    * least one term, rounded to 6.
    */
  def bm25Scores(df: DataFrame, textCol: String, idCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    // NULL text counts as an empty document (dl = 0, included in avgdl) —
    // the oracle's coalesce(text, '') does the same; letting size(null)
    // propagate would drop the doc from avgdl and shift every score
    val withDl = df
      .select(col(idCol).as("_id"),
        TextAnalysis.tokens(coalesce(col(textCol), lit(""))).as("_toks"))
      .select(col("_id"), col("_toks"), size(col("_toks")).cast("long").as("dl"))
    val stats = withDl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val tf = withDl.select(col("_id"), col("dl"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val scored = tf.join(broadcast(dft), Seq("term")).crossJoin(broadcast(stats))
    val idf = log((col("n_docs").cast("double") - col("df_t").cast("double") + lit(0.5)) /
      (col("df_t").cast("double") + lit(0.5)) + lit(1.0))
    val tfd = col("tf").cast("double")
    val norm = (tfd * (lit(k1) + lit(1.0))) /
      (tfd + lit(k1) * ((lit(1.0) - lit(b)) +
        lit(b) * col("dl").cast("double") / col("avgdl")))
    // portable floor-form rounding at term + output (see Portable.scala)
    val term = Portable.roundPortable(idf * norm, 10).cast("decimal(28,12)")
    scored.groupBy(col("_id"))
      .agg(Portable.r6(sum(term).cast("double")).as("bm25"))
      .withColumnRenamed("_id", idCol)
  }

  /** Reciprocal-rank fusion of two ranked lists (id, rank): score =
    * Σ 1/(kRrf + rank) over the lists where the id appears (0 where
    * absent), rounded to 6 — the standard hybrid-search combiner, robust
    * to incomparable score scales.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, kRrf: Int = 60): DataFrame = {
    val fa = a.select(col(idCol), col("rank").as("_ra"))
    val fb = b.select(col(idCol), col("rank").as("_rb"))
    fa.join(fb, Seq(idCol), "full_outer")
      .select(col(idCol),
        Portable.r6(
          coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("_ra").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("_rb").cast("double")), lit(0.0))
        ).as("rrf"))
  }
}

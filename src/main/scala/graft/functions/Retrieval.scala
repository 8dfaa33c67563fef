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
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoredWithHits(df, textCol, idCol, terms, k1, b)
      .select(col("_id").as(idCol), col("bm25"))

  /** [[bm25Scores]] plus `n_terms_hit` (how many DISTINCT query terms the
    * document contains) — the relevance side-channel [[rankingMetrics]]
    * reads; kept internal so the public scoring surface stays minimal.
    */
  private def scoredWithHits(df: DataFrame, textCol: String, idCol: String,
                             terms: Seq[String], k1: Double, b: Double): DataFrame = {
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
      .agg(Portable.r6(sum(term).cast("double")).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** DCG discount table g(r) = round(1e10 / log2(r+1)) as integer 1e-10
    * units, and its prefix sums (the ideal DCG for m relevant docs).
    * Public so an oracle can interpolate the SAME constants into its SQL —
    * the one place `ln` runs is here, on the driver, once; neither engine
    * recomputes it.
    */
  def dcgGains(k: Int): Seq[Long] = (1 to k).map(r =>
    math.floor(1e10 * math.log(2.0) / math.log(r + 1.0) + 0.5).toLong)

  def idcgTable(k: Int): Seq[Long] = dcgGains(k).scanLeft(0L)(_ + _).tail

  /** Ranking-quality evaluation of the BM25 retriever against an implicit
    * exact-match relevance oracle: for each named query (a bag of terms),
    * rank the corpus by ([[bm25Scores]] desc, id desc), call a document
    * relevant iff it contains EVERY query term, and report the standard
    * retrieval metrics at cutoff `k` — recall@k, MRR@k (reciprocal rank of
    * the first relevant hit, 0 if none ranks), and nDCG@k. One output row
    * per query — the regression scorecard a corpus-curation retriever is
    * tracked by.
    *
    * Exactness: the DCG discount table 1/log2(r+1) is pre-quantized to
    * integer 1e-10 units via [[dcgGains]] and shipped as the SAME literal
    * constants to both engines (the k1/b constant discipline — no runtime
    * `ln` whose last ulp could differ between libm and the JVM); DCG/IDCG
    * are exact integer sums of those constants, divided once and portably
    * rounded.
    *
    * Scale: per query, scoring is [[bm25Scores]]'s plan (query-term filter
    * before any shuffle); the top-k comes from the bounded-heap
    * [[graft.plans.GraftFunctions.topkPairs]] aggregate (≤ k pairs per
    * partition cross the exchange — never a global sort), relevance totals
    * are a 1-row aggregate, and the k-row ranked list joins by broadcast.
    * Queries are independent single-pass pipelines unioned at the end.
    */
  def rankingMetrics(df: DataFrame, textCol: String, idCol: String,
                     queries: Seq[(String, Seq[String])], k: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "at least one query")
    require(k >= 1 && k <= 1000, "cutoff k must be in [1, 1000]")
    // quantized discount table and its prefix sums — literal longs on both
    // the Spark and oracle sides by construction (see [[dcgGains]])
    val gains: Seq[Long] = dcgGains(k)
    val idcg: Seq[Long] = idcgTable(k)
    val perQuery = queries.map { case (name, terms) =>
      require(terms.distinct.size == terms.size, s"duplicate terms in query '$name'")
      // materialized: this frame is referenced THREE times below (the
      // relevance total, the top-k heap, and the broadcast relevant-id
      // filter) — unmaterialized, the full tokenize+explode+BM25 subplan
      // re-evaluates per reference (measured: 9 copies across the 3-query
      // scorecard, a 138-Exchange plan). The checkpoint is ≤ one row per
      // matching document — far smaller than the pipeline it caches.
      val scored = Par.materialize(
        scoredWithHits(df, textCol, idCol, terms, k1, b)
          .withColumn("_rel", (col("n_terms_hit") === terms.size).cast("int")))
      val relTotal = scored.agg(coalesce(sum(col("_rel")), lit(0)).cast("long").as("n_rel"))
      val ranked = scored
        .agg(graft.plans.GraftFunctions.topkPairs(scored, col("bm25"),
          col("_id").cast("long"), k).as("_topk"))
        .select(posexplode(col("_topk")).as(Seq("_pos", "_pair")))
        .select((col("_pos") + 1).as("_rank"), col("_pair.id").as("_id"))
      val hits = ranked
        .join(broadcast(scored.filter(col("_rel") === 1).select(col("_id"))
          .withColumn("_hit", lit(1))), Seq("_id"), "left")
      val gainCol = element_at(lit(gains.toArray), col("_rank").cast("int"))
      hits
        .agg(coalesce(sum(coalesce(col("_hit"), lit(0))), lit(0)).cast("long").as("n_hits"),
          max(when(col("_hit") === 1,
            Portable.r6(lit(1.0) / col("_rank").cast("double")))).as("_mrr"),
          coalesce(sum(when(col("_hit") === 1, gainCol).otherwise(lit(0L))), lit(0L))
            .as("_dcgq"))
        .crossJoin(broadcast(relTotal))
        .select(lit(name).as("query"), col("n_rel"), col("n_hits"),
          when(col("n_rel") > 0, Portable.r6(col("n_hits").cast("double") /
            col("n_rel").cast("double"))).otherwise(lit(0.0)).as("recall_k"),
          coalesce(col("_mrr"), lit(0.0)).as("mrr_k"),
          when(col("n_rel") > 0, Portable.r6(col("_dcgq").cast("double") /
            element_at(lit(idcg.toArray), least(col("n_rel"), lit(k.toLong)).cast("int"))
              .cast("double"))).otherwise(lit(0.0)).as("ndcg_k"))
    }
    perQuery.reduce(_.unionByName(_))
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

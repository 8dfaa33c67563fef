package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: deterministic
  * train/val/test splitting, token-budget sequence packing, vocabulary
  * document-frequency statistics.
  *
  * All three are single-pass declarative plans (a projection, one window,
  * one explode+groupBy respectively) with exact integer/string arithmetic —
  * no RNG state, no sampling nondeterminism — so the same corpus always
  * yields the same split/packing on any cluster size, and every operator is
  * DuckDB-oracle-checkable.
  */
object Corpus {

  /** Deterministic salted split assignment. Each row lands in a named split
    * by the first byte of `md5(id || ':' || salt)`: thresholds are cumulative
    * 1/256 shares of the weights, compared on the hex prefix — stable under
    * repartitioning, insertion, and re-runs (adding a document never moves
    * another document's split, unlike `randomSplit`, whose assignment
    * depends on partition layout and sampling state).
    *
    * `splits` maps name → weight (fractions of 256, e.g. 230/13/13 ≈
    * 90/5/5). md5 rather than xxhash64 keeps the assignment reproducible by
    * ANY engine or language with an md5 implementation — the split must be
    * recomputable years later by whoever audits the training set.
    */
  def splitAssign(df: DataFrame, idCol: String, salt: String,
                  splits: Seq[(String, Int)] = Seq("train" -> 230, "val" -> 13, "test" -> 13))
      : DataFrame = {
    require(splits.map(_._2).sum == 256, "split weights must sum to 256 (1/256 shares)")
    val prefix = substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 2)
    // upper bounds for all but the last split (whose bound would be 256 —
    // not a byte, and as 3-char hex it would compare lexicographically
    // wrong); the last split is purely the fallback branch
    val bounds = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val assign = splits.init.zip(bounds).foldRight(lit(splits.last._1)) {
      case (((name, _), bound), rest) =>
        when(prefix < lit(f"${bound}%02x"), lit(name)).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /** Greedy contiguous sequence packing: rows ordered by `orderCol` within
    * each `partitionCols` group are packed into sequences of ~`budget`
    * tokens; a row's sequence id is `floor(prefix_token_sum / budget)` —
    * the running sum of all EARLIER rows' tokens. One window pass, exact
    * integer arithmetic, deterministic under the (partition, order) total
    * order. A document larger than the budget occupies its sequence(s)
    * alone — the offset form never splits a document, matching
    * fill-then-spill packing of training-shard writers.
    *
    * Scale: one shuffle on `partitionCols` (the same exchange any
    * per-group window needs); the output feeds `groupBy(partition, seq)`
    * shard writes that reuse the partitioning. A running-sum window is
    * inherently sequential WITHIN a group — when one group outgrows an
    * executor's sort budget, add a hash-shard column to `partitionCols`
    * (e.g. `pmod(xxhash64(id), 256)`): shards pack independently and
    * packing quality is unaffected, since sequences never span shards by
    * construction.
    */
  def packSequences(df: DataFrame, tokenCol: String, budget: Long,
                    partitionCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("seq_id",
        floor((col("_cum") - col(tokenCol).cast("long")) / lit(budget)).cast("long"))
      .drop("_cum")
  }

  /** Deterministic stratified sample: at most `k` rows per stratum, chosen
    * by ranking on `md5(id || ':' || salt)` — the same engine-portable,
    * repartition-stable discipline as [[splitAssign]], so the sample is an
    * unbiased (hash-ordered) draw that any auditor can recompute. Secondary
    * order on the id itself makes the rank a total order even under a
    * (practically impossible) md5 collision.
    *
    * Scale: one shuffle on the strata columns — the exchange any exact
    * per-stratum quota needs. When quotas are large and strata skewed,
    * pre-filter with a hash THRESHOLD first (`md5 < bound` keeps ~share of
    * each stratum map-side, no shuffle) and quota-rank only the survivors;
    * at gate scale the direct window is the measured-faster plan.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], idCol: String,
                       k: Int, salt: String): DataFrame = {
    val rank = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(rank.asc, col(idCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Per-stratum sampling weights that reshape a corpus toward a target
    * mixture — the rebalancing step before training-set assembly (upweight
    * under-represented languages/sources, downweight dominant ones).
    * Observed share is the stratum's token share; the default target is the
    * uniform mixture (1/strata). `weight = target_share / observed_share`,
    * so sampling each stratum's documents with probability ∝ weight yields
    * the target mixture in tokens.
    *
    * One partial-aggregable groupBy to |strata| rows, then window totals
    * over that tiny aggregate — the 100 TB cost is one map-side-combined
    * shuffle; everything after runs on a handful of rows.
    */
  def mixtureWeights(df: DataFrame, strataCols: Seq[String],
                     tokensCol: Column): DataFrame = {
    val agg = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol.cast("long")).as("n_tokens"))
    val all = Window.partitionBy()
    // a zero-token stratum has NULL weight (the observed share is 0, the
    // ratio is undefined — under ANSI mode an unguarded double division by
    // zero THROWS rather than yielding null, so the guard is load-bearing);
    // DuckDB's x/0.0 = NULL agrees, and applyMixtureWeights treats the
    // NULL as "keep everything" (the limit of under-represented).
    // Rounding is Portable.r6, not round(): the inputs are ratios of exact
    // long sums (bit-identical on any IEEE engine), so the portable
    // floor-form makes the OUTPUT bytes engine-identical too — round()'s
    // BigDecimal path diverged from DuckDB by 1 ulp in round 4.
    agg
      .withColumn("token_share",
        when(sum(col("n_tokens")).over(all) > 0,
          Portable.r6(col("n_tokens").cast("double") / sum(col("n_tokens")).over(all))))
      .withColumn("weight",
        when(col("n_tokens") > 0,
          Portable.r6((lit(1.0) / count(lit(1)).over(all)) /
            (col("n_tokens").cast("double") / sum(col("n_tokens")).over(all)))))
  }

  /** Temperature-flattened mixture weights — the mT5/XLM-R sampling rule:
    * target share ∝ observed_shareᵅ, renormalized. α = 1 reproduces the
    * observed mix (all weights 1), α → 0 approaches uniform
    * ([[mixtureWeights]]'s target); the standard production choice
    * (α ≈ 0.3) boosts low-resource strata without letting them dominate.
    * `weight` is the per-document sampling multiplier `target / observed`,
    * directly consumable by [[applyMixtureWeights]]'s keep-probability
    * discipline.
    *
    * Zero-token strata keep the q62 NULL-weight contract (observed share
    * 0 → ratio undefined; ANSI division would throw, DuckDB agrees on
    * NULL). Scale: identical to [[mixtureWeights]] — one partial-agg pass
    * to |strata| rows, windows only over that tiny table.
    */
  def temperatureWeights(df: DataFrame, strataCols: Seq[String],
                         tokensCol: Column, alpha: Double): DataFrame = {
    val agg = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol.cast("long")).as("n_tokens"))
    val all = Window.partitionBy()
    val share = col("n_tokens").cast("double") / sum(col("n_tokens")).over(all)
    val powed = when(col("n_tokens") > 0, pow(share, lit(alpha))).otherwise(lit(0.0))
    // Portable.r6 (floor-form, engine-exact) rather than round(): pow is
    // the one residual cross-engine wobble (libm vs JVM may differ in the
    // last ulp), but a 1-ulp input difference flips the 1e-6-grain floor
    // only when the true value sits within ~1e-16 of a boundary —
    // round()'s BigDecimal-vs-binary divergence window was ~6 orders of
    // magnitude wider and actually bit in round 4.
    agg
      .withColumn("token_share",
        when(sum(col("n_tokens")).over(all) > 0, Portable.r6(share)))
      .withColumn("target_share",
        when(sum(powed).over(all) > 0, Portable.r6(powed / sum(powed).over(all))))
      .withColumn("weight",
        when(col("n_tokens") > 0,
          Portable.r6((powed / sum(powed).over(all)) / share)))
  }

  /** Padding-waste audit of a batching policy: group rows into
    * fixed-count batches, pad every member to its batch's max length (the
    * dense-tensor training shape), and report totals. Compares the two
    * canonical policies — `by_length` (sort each shard by length before
    * batching: like-sized rows share batches, padding collapses) vs
    * `arrival` (batch in id order: each batch pays its longest straggler)
    * — the measurement behind every bucketed-batching decision.
    *
    * Batching is per shard (a window keyed on `shardCol`, never a global
    * sort): the distributed reality of loader sharding, and the reason
    * the audit scales — each shard's rank/batch assignment shuffles only
    * on the shard key. A short final batch is padded to its OWN max over
    * its actual row count (no phantom rows).
    */
  def paddingAudit(df: DataFrame, shardCol: String, idCol: String,
                   lenCol: Column, batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val base = df.select(col(shardCol).as("_shard"), col(idCol).as("_id"),
      lenCol.cast("long").as("_len"))
    def audit(policy: String, order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(col("_shard")).orderBy(order: _*)
      base
        .withColumn("_batch", ((row_number().over(w) - 1) / batchSize).cast("long"))
        .groupBy(col("_shard"), col("_batch"))
        .agg(count(lit(1)).as("_cnt"), max(col("_len")).as("_mx"),
          sum(col("_len")).as("_sum"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("_sum")).as("payload_tokens"),
          sum(col("_cnt") * col("_mx") - col("_sum")).as("padding_tokens"))
        .select(lit(policy).as("policy"), col("n_batches"),
          col("payload_tokens"), col("padding_tokens"),
          Portable.roundPortable(col("padding_tokens").cast("double") /
            greatest(col("padding_tokens") + col("payload_tokens"), lit(1L)), 6)
            .as("padding_frac"))
    }
    audit("by_length", Seq(col("_len").desc, col("_id").asc))
      .unionByName(audit("arrival", Seq(col("_id").asc)))
  }

  /** Apply [[mixtureWeights]] as a deterministic downsample: each stratum
    * keeps documents with probability `min(weight, 1)` — under-represented
    * strata (weight ≥ 1) keep everything, dominant strata shed mass — so
    * the surviving corpus's token mixture approaches the uniform target.
    * The draw is the md5 discipline of [[splitAssign]]: a document's fate
    * depends only on (id, salt), so the sample is reproducible, stable
    * under repartitioning, and auditable. The threshold compares the first
    * TWO hash bytes against `max(floor(min(weight,1)·65536), 1)` — 1/65536
    * probability granularity, exact-rule-reproducible by any engine. The
    * floor of 1 means a nonempty stratum is never annihilated outright: a
    * stratum whose weight falls below the granularity (possible once
    * |strata| exceeds 65536·target share — e.g. one domain holding 30% of
    * tokens among thousands of domain strata) is cut to 1/65536, not to
    * zero, so no language/source silently vanishes from the training mix.
    *
    * Scale: the weights table is |strata| rows (broadcast); the keep
    * decision is map-side per row. One partially-aggregated pass for the
    * weights, one scan to filter — nothing else.
    */
  def applyMixtureWeights(df: DataFrame, strataCols: Seq[String],
                          tokensCol: Column, idCol: String, salt: String): DataFrame = {
    val weights = mixtureWeights(df, strataCols, tokensCol)
      .select((strataCols.map(col) :+ col("weight")): _*)
    val h = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val hex = "0123456789abcdef"
    val hash16 = (1 to 4).map(j =>
      (instr(lit(hex), substring(h, j, 1)) - 1) * lit(1 << (4 * (4 - j))))
      .reduce(_ + _)
    // a stratum with ZERO tokens has weight NULL (x/0): it is the limit of
    // "under-represented", so it keeps everything — without the coalesce
    // the NULL comparison would silently drop the whole stratum. (Rows
    // with a NULL strata key still drop at the equi-join, as documented.)
    df.join(broadcast(weights), strataCols)
      .filter(hash16 < greatest(
        floor(coalesce(least(col("weight"), lit(1.0)), lit(1.0)) * 65536), lit(1L)))
      .drop("weight")
  }

  /** Boilerplate n-gram detection: the top-`k` word n-grams per group
    * (source/domain) ranked by DOCUMENT frequency — the CCNet/RefinedWeb
    * signal for navigation chrome, disclaimers, and templated spans that
    * repeat across a domain's pages and should be stripped before
    * training. Distinct-per-document BEFORE the explode, so a gram
    * spamming one page counts once; ties rank by gram text for a total
    * order.
    *
    * Scale: the explode is map-side; the (group, gram) count partially
    * aggregates (combiner sends one row per distinct pair per partition);
    * the `minDf` filter prunes the long singleton tail BEFORE the ranking
    * window, which then sorts only each group's surviving grams — the same
    * aggregate-then-rank shape as [[tfIdfTopTerms]].
    */
  def boilerplateNgrams(df: DataFrame, textCol: String, groupCol: String,
                        n: Int = 2, k: Int = 10, minDf: Long = 2): DataFrame = {
    // project the token array FIRST: inlining tokens(text) into the
    // shingle transform re-splits the text once per gram index (HOF
    // lambdas are interpreted, not codegen'd — the common subexpression
    // is not shared), which is an O(tokens²) hidden cost per document
    // spread first: single-split corpora serialize tokenize+shingle+explode
    // onto one scan task (no-op on a many-split corpus — stats heuristic)
    val perDoc = Par.spread(df.select(col(groupCol), col(textCol).as("_text")))
      .select(col(groupCol), TextAnalysis.tokens(col("_text")).as("_toks"))
      .select(col(groupCol),
        explode(array_distinct(TextAnalysis.shingles(col("_toks"), n))).as("gram"))
    val dfCounts = perDoc.groupBy(col(groupCol), col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDf)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n_docs").desc, col("gram").asc)
    dfCounts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-group token-distribution drift: KL(group ‖ corpus) over token
    * unigram frequencies — the audit that catches a source/batch whose
    * language suddenly diverges from the corpus (scraper drift, encoding
    * breakage, injected spam) before it trains. A group's every token is by
    * construction in the corpus, so no zero-probability guard is needed.
    *
    * Exactness: counts are integers (exact in double), each KL term is
    * computed in one fixed double expression, rounded to 10 places, and
    * summed as DECIMAL — addition is order-independent, so the result is
    * identical regardless of partitioning or engine (ulp differences in
    * `ln` sit below the rounding).
    *
    * Scale: one explode + one (group, token) partial-aggregated shuffle;
    * corpus token totals come from a window over that AGGREGATED table
    * (shuffles |groups·vocab| aggregate rows, never raw tokens), and group
    * totals are a |groups|-row broadcast.
    */
  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed-unigram features are under a TARGET
    * corpus (rows where `targetPred` holds — the high-quality slice to
    * upsample toward) than under the raw corpus. `log_weight` is the sum
    * over token occurrences of `ln(p_target(bucket)/p_raw(bucket))` with
    * Laplace-smoothed bucket probabilities — the importance-resampling key
    * the selection step samples ∝ exp(log_weight).
    *
    * Portability discipline: buckets come from the first two md5 hex chars
    * of each token (engine-recomputable, the q52/q110 rule); each bucket's
    * log-ratio is quantized ONCE to integer 1e-10 units with the portable
    * floor-form, so per-doc scores are exact long sums — partition-order
    * free and engine-identical (the [[tokenKlDrift]] discipline).
    *
    * Scale: one explode into two partial-aggregated counts ((doc, bucket)
    * and (bucket)), a 1-row totals broadcast, a `buckets`-row log-ratio
    * broadcast joined back to the (doc, bucket) table, one per-doc agg —
    * no shuffle ever carries raw tokens, and the only state is 2·buckets
    * longs. Documents with zero tokens have no feature evidence and are
    * absent from the output.
    */
  def dsirLogWeights(df: DataFrame, textCol: String, idCol: String,
                     targetPred: Column, buckets: Int = 256): DataFrame = {
    require(buckets == 256, "bucket count is pinned to 256 (two md5 hex chars)")
    // spread before the explode (single-split corpora serialize the
    // tokenize+md5 pass onto one task), and derive the bucket histogram
    // from the per-doc aggregate instead of a second raw-token pass:
    // `_t` is a PER-DOCUMENT predicate (constant within `_id`), so
    // Σ rows[when(_t,1)] over a bucket equals Σ groups[when(_t,c_db)] —
    // the previous shape re-ran the whole tokenize+explode per reference
    // and shuffled the raw token stream twice.
    val base = Par.spread(df.select(col(idCol).as("_id"), targetPred.as("_t"),
      coalesce(col(textCol), lit("")).as("_text")))
    val tok = base.select(col("_id"), col("_t"),
      explode(TextAnalysis.tokens(col("_text"))).as("token"))
    val withB = tok.withColumn("_b",
      conv(substring(md5(col("token")), 1, 2), 16, 10).cast("long"))
    val perDocT = Par.materialize(withB.groupBy(col("_id"), col("_t"), col("_b"))
      .agg(count(lit(1)).as("c_db")))
    val perDoc = perDocT.select(col("_id"), col("_b"), col("c_db"))
    val perBucket = perDocT.groupBy(col("_b"))
      .agg(sum(col("c_db")).as("c_r"),
        sum(when(col("_t"), col("c_db")).otherwise(0L)).as("c_t"))
    val totals = perBucket.agg(sum(col("c_r")).as("t_r"), sum(col("c_t")).as("t_t"))
    val lr = perBucket.crossJoin(broadcast(totals))
      .withColumn("_lrq", floor(log(
        ((col("c_t") + 1).cast("double") / (col("t_t") + lit(buckets)).cast("double")) /
        ((col("c_r") + 1).cast("double") / (col("t_r") + lit(buckets)).cast("double")))
        * lit(1e10) + lit(0.5)))
      .select(col("_b"), col("_lrq"))
    perDoc.join(broadcast(lr), Seq("_b"))
      .groupBy(col("_id"))
      .agg(sum(col("c_db")).as("n_tokens"),
        sum(col("c_db") * col("_lrq")).as("_s"))
      .select(col("_id").as(idCol), col("n_tokens"),
        Portable.r6(col("_s").cast("double") / lit(1e10)).as("log_weight"))
  }

  def tokenKlDrift(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val tok = df.select(col(groupCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val cgt = tok.groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("c_gt"))
    val gTot = cgt.groupBy(col(groupCol)).agg(sum(col("c_gt")).as("n_g"))
      .withColumn("n_total", sum(col("n_g")).over(Window.partitionBy()))
    val withCorpus = cgt
      .withColumn("c_t", sum(col("c_gt")).over(Window.partitionBy(col("token"))))
      .join(broadcast(gTot), Seq(groupCol))
    val p = col("c_gt").cast("double") / col("n_g").cast("double")
    val ratio = (col("c_gt").cast("double") * col("n_total").cast("double")) /
      (col("n_g").cast("double") * col("c_t").cast("double"))
    // Portable floor-form rounding (see Portable.scala) at both the term
    // and output steps — Spark's BigDecimal round() diverges from
    // DuckDB's binary-space round by 1 ulp on boundary values
    val term = Portable.roundPortable(p * log(ratio), 10).cast("decimal(28,12)")
    withCorpus.groupBy(col(groupCol))
      .agg(max(col("n_g")).as("n_tokens"),
        Portable.r6(sum(term).cast("double")).as("kl_div"))
  }

  /** Source-reputation quality gate: [[TextAnalysis.qualityVerdict]] per
    * document, rolled up to a per-group keep rate, then propagated back —
    * a document from a group whose keep rate falls below `minKeepRate` is
    * blocked outright (`blocked_source`) even if it individually passes.
    * This is the domain-blocklist step every web-corpus pipeline runs:
    * individual-document filters miss spam farms whose pages each look
    * merely mediocre, but whose aggregate failure rate marks the domain.
    *
    * The keep rate compares ROUNDED (6 places) against the threshold, so
    * the decision is engine-reproducible. Scale: verdicts are map-side
    * native expressions; the rollup is a |groups|-row partial agg
    * broadcast back — two scans of the corpus (one aggregating, one
    * emitting), and the corpus itself is never shuffled.
    */
  def reputationGate(df: DataFrame, textCol: String, idCol: String,
                     groupCol: String, minKeepRate: Double = 0.75): DataFrame = {
    val scored = df.withColumn("verdict",
      TextAnalysis.qualityVerdict(df, col(textCol)))
    val rep = scored.groupBy(col(groupCol))
      .agg(Portable.r6(avg(when(col("verdict") === "keep", 1.0).otherwise(0.0)))
        .as("keep_rate"))
    scored.join(broadcast(rep), Seq(groupCol))
      .withColumn("final_verdict",
        when(col("keep_rate") < minKeepRate, lit("blocked_source"))
          .otherwise(col("verdict")))
      .select(col(idCol), col(groupCol), col("verdict"), col("keep_rate"),
        col("final_verdict"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row draws u ∈ (0,1) from `md5(id:salt)` (first
    * six hex nibbles → a 24-bit uniform, offset +0.5 so u is never 0) and
    * is keyed by `ln(u) / w`; the global top-`k` keys are an exact weighted
    * sample without replacement — inclusion probability proportional to
    * weight, no RNG state, reproducible by any engine from the same md5
    * rule ([[splitAssign]] discipline). Keys are ROUNDED to 10 places and
    * ranked (key desc, id asc), so the selected set is engine-identical
    * even at ln() ulp boundaries. Rows with non-positive weight are
    * excluded (they have inclusion probability 0).
    *
    * Scale: the key is map-side arithmetic on the row; global top-k
    * compiles to TakeOrderedAndProject (per-partition bounded heaps merged
    * once) — never a full sort, never a shuffle of the corpus.
    */
  /** 24-bit integer from the first six md5(id:salt) nibbles — the shared
    * uniform underlying [[weightedSample]] and [[kFoldAssign]]; exact
    * integer arithmetic any engine reproduces from the same md5.
    */
  private def hash24(id: Column, salt: String): Column = {
    val h = md5(concat(id.cast("string"), lit(":" + salt)))
    val hex = "0123456789abcdef"
    def nib(i: Int): Column = (instr(lit(hex), substring(h, i, 1)) - 1).cast("double")
    (1 to 6).map(j => nib(j) * lit(math.pow(16, 6 - j))).reduce(_ + _)
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: Column, k: Int,
                     salt: String): DataFrame = {
    val x = hash24(col(idCol), salt)
    val u = (x + lit(0.5)) / lit(16777216.0) // 16^6; exact dyadic division
    // double, not an integral cast: A-ES promises inclusion probability
    // proportional to ANY positive weight — truncating would drop every
    // row with 0 < weight < 1 and distort fractional weights
    df.withColumn("weight", weightCol.cast("double"))
      .filter(col("weight") > 0)
      .withColumn("sample_key",
        Portable.roundPortable(log(u) / col("weight"), 10))
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("weight"), col("sample_key"))
  }

  /** Per-stratum quota cap: keep the `n` best rows of each stratum by
    * `rank` (ties → smallest id), drop the rest — the hard per-domain
    * representation cap (RefinedWeb/FineWeb "max URLs per domain" rule)
    * that complements [[applyMixtureWeights]]'s probabilistic rebalance:
    * a quota bounds a stratum's absolute count no matter how its share
    * moves, and keeps the BEST members rather than a uniform draw.
    *
    * Scale: one hash-partitioned window per stratum (shuffle keyed on the
    * strata columns, never a global sort); rank + filter stream inside the
    * window, so per-partition memory is O(batch), not O(stratum). A skewed
    * mega-domain makes one hot partition — at that point cap its input
    * first with [[applyMixtureWeights]] or a salted pre-prune, as the
    * window's total order can't be salted without breaking exactness.
    */
  def quotaCap(df: DataFrame, strataCols: Seq[String], rank: Column,
               idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(rank.desc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Global token-offset index of a sharded corpus — for each row, the
    * index of its first token in the concatenated (shard asc, position
    * asc) token stream. This is the loader-side index every training run
    * reads ("sample i starts at token offset o"), and the textbook
    * distributed prefix sum: the naive form — one global ordered window —
    * funnels EVERY row through a single partition, the worst possible
    * plan at 100 TB. The two-level form does a per-shard cumulative sum
    * (parallel, one shuffle keyed on shard), collapses to one row per
    * shard, prefix-sums THAT table (a window over #shards rows, not the
    * corpus), and broadcast-joins the shard base offsets back.
    *
    * `posCol` must be a total order within each shard (e.g.
    * [[shuffleShards]]'s `shard_pos`); output appends `n_tokens` (the
    * evaluated `tokens` count) and `start_offset`.
    */
  def tokenOffsets(df: DataFrame, shardCol: String, posCol: String,
                   tokens: Column): DataFrame = {
    val wIntra = Window.partitionBy(col(shardCol)).orderBy(col(posCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("_intra", coalesce(sum(col("n_tokens")).over(wIntra), lit(0L)))
    val bases = intra.groupBy(col(shardCol))
      .agg(sum(col("n_tokens")).as("_shard_total"))
    val wBase = Window.orderBy(col(shardCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val based = bases
      .withColumn("_base", coalesce(sum(col("_shard_total")).over(wBase), lit(0L)))
      .select(col(shardCol), col("_base"))
    intra.join(broadcast(based), Seq(shardCol))
      .withColumn("start_offset", col("_base") + col("_intra"))
      .drop("_intra", "_base")
  }

  /** Incremental maintenance of [[tokenOffsets]]: offsets for an APPENDED
    * batch, given only the existing index's total token count — the
    * ingest-time discipline (same family as the q100 profile states and
    * q55 admission): each arriving batch is offset-indexed once, shifted
    * by the running total, and the existing index is never rescanned, so
    * per-batch cost is independent of corpus size. The batch occupies the
    * epoch AFTER everything indexed so far; within the batch the same
    * two-level prefix sum applies.
    *
    * Equivalence contract (q109's oracle): appending batches in epoch
    * order and concatenating their indexes equals [[tokenOffsets]] over
    * the union ordered by (epoch, shard, position).
    */
  def appendTokenOffsets(batch: DataFrame, shardCol: String, posCol: String,
                         tokens: Column, baseOffset: Long): DataFrame =
    tokenOffsets(batch, shardCol, posCol, tokens)
      .withColumn("start_offset", col("start_offset") + lit(baseOffset))

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * word n-grams that appear in no other document — templated/boilerplate
    * docs score near 0, genuinely novel text near 1. The inverse lens of
    * [[boilerplateNgrams]] (that ranks the shared grams; this scores each
    * doc by how little it shares). Docs too short to form a single n-gram
    * emit `n_grams = 0` with a null novelty.
    *
    * Scale: distinct-per-doc explode (map-side); document frequencies come
    * from a PARTIALLY-AGGREGATED groupBy on gram (map-side combine, so the
    * df table exchange carries one row per distinct gram per partition)
    * joined back to the exploded stream, then one per-doc partial agg —
    * two shuffles of the exploded stream, no per-partition sort (the
    * window-over-gram formulation would sort the full exploded stream
    * inside each gram partition with no combine step).
    */
  def ngramNovelty(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("_id"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("_id"),
        explode(array_distinct(TextAnalysis.shingles(col("_toks"), n))).as("gram"))
    val dfc = perDoc.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val stats = perDoc.join(dfc, Seq("gram"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumnRenamed("_id", idCol)
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        Portable.roundPortable(col("n_unique").cast("double") / col("n_grams").cast("double"), 6)
          .as("novelty"))
  }

  /** Token-concentration curve: for each percentage threshold, the minimum
    * number of documents (taking longest first) whose tokens cover at
    * least that share of the corpus — "500k docs hold 90% of the tokens"
    * is the number that decides dedup/packing/sampling strategy.
    *
    * EXACT without a corpus-wide sort: documents collapse to a LENGTH
    * HISTOGRAM (one partially-aggregated groupBy to |distinct lengths|
    * rows); the cumulative walk and threshold pick run entirely on that
    * tiny table, and the answer inside the boundary length-class is
    * closed-form integer arithmetic (`k = ⌈needed/len⌉` — every doc of a
    * class contributes equally, so the rank-ordered answer equals the
    * histogram answer). All comparisons are integer cross-products
    * (`cum·100 ≥ total·pct`), so any engine reproduces the exact counts.
    * Zero-length docs can never help reach a token threshold and are
    * excluded up front.
    */
  def tokenConcentration(df: DataFrame, textCol: String,
                         pcts: Seq[Int] = Seq(50, 90)): DataFrame = {
    val lens = df.select(TextAnalysis.tokenCount(col(textCol)).cast("long").as("len"))
      .filter(col("len") > 0)
      .groupBy(col("len")).agg(count(lit(1)).as("n"))
    coverageFromClasses(lens, pcts)
      .withColumnsRenamed(Map("n_units" -> "n_docs",
        "covered" -> "covered_tokens", "total" -> "total_tokens"))
  }

  /** Vocabulary coverage curve: the smallest vocabulary (most frequent
    * tokens first) covering each percentage of corpus TOKEN INSTANCES —
    * "8k types cover 99% of the stream" is the number a tokenizer's vocab
    * size is chosen against. Same closed form as [[tokenConcentration]]
    * over the token-FREQUENCY histogram: one explode + one (token) count
    * (both partially aggregated), one tiny groupBy on the distinct
    * frequency values — never a vocabulary-wide sort.
    */
  def vocabCoverage(df: DataFrame, textCol: String,
                    pcts: Seq[Int] = Seq(90, 99)): DataFrame = {
    val freqs = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("f"))
      .groupBy(col("f").as("len")).agg(count(lit(1)).as("n"))
    coverageFromClasses(freqs, pcts)
      .withColumnsRenamed(Map("n_units" -> "vocab_size",
        "covered" -> "covered_instances", "total" -> "total_instances"))
  }

  /** Per-document mean token surprisal under the corpus unigram model —
    * the statistical-LM quality score (the CCNet-style "does this read
    * like the corpus?" filter, with the unigram model standing in for the
    * external KenLM this container cannot host): surprisal of token t is
    * `-ln(c_t / T)`; a document's score is the count-weighted mean over
    * its tokens. High = out-of-distribution vocabulary (spam, wrong
    * language, binary junk); low = made of the corpus's common words.
    *
    * Exactness: the [[tokenKlDrift]] discipline — each (doc, token) term
    * is one fixed double expression rounded to 10, summed as DECIMAL, so
    * the mean is partition-order-free and engine-identical. Scale: one
    * explode into a partially-aggregated (doc, token) count, corpus token
    * totals via a window over that aggregated table, and the 1-row grand
    * total rides a broadcast.
    */
  def unigramSurprisal(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // NOTE (round 13): tried spread + materializing this twice-referenced
    // (doc, token) aggregate — measured WORSE in-run (0.48 → ~0.87
    // box-normalized): the frame is token-STRING-heavy, and deserialized
    // block storage of millions of small Strings costs more than the
    // second tokenize pass it saves. Reverted; contrast dsirLogWeights,
    // whose all-numeric aggregate made the same trade a win.
    val cdt = df
      .select(col(idCol).as("_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("_id"), col("token")).agg(count(lit(1)).as("c_dt"))
    val withTot = cdt
      .withColumn("c_t", sum(col("c_dt")).over(Window.partitionBy(col("token"))))
    val tot = cdt.agg(sum(col("c_dt")).as("t_total"))
    // portable floor-form rounding at term + output (see Portable.scala)
    val term = Portable.roundPortable(col("c_dt").cast("double") *
      -log(col("c_t").cast("double") / col("t_total").cast("double")), 10)
      .cast("decimal(28,12)")
    withTot.crossJoin(broadcast(tot))
      .groupBy(col("_id"))
      .agg(sum(col("c_dt")).as("n_tokens"),
        Portable.r6(sum(term).cast("double") / sum(col("c_dt")).cast("double"))
          .as("mean_surprisal"))
      .withColumnRenamed("_id", idCol)
  }

  /** Per-document mean BIGRAM surprisal under the corpus's unsmoothed
    * bigram LM — the second-order sibling of [[unigramSurprisal]]:
    * surprisal of an observed bigram (w1, w2) is −ln(c(w1 w2) / c(w1·)),
    * its conditional MLE probability (observed bigrams always have count
    * ≥ 1, so no smoothing is needed for scoring the corpus against
    * itself). Low scorers are template/boilerplate text whose word
    * transitions the corpus has memorized; high scorers have locally
    * improbable transitions — a sharper fluency lens than unigram
    * frequency, which cannot see word ORDER at all.
    *
    * Exactness: each distinct bigram's ln-ratio quantizes ONCE to integer
    * 1e-10 units (portable floor-form) — per-doc scores are exact long
    * sums, partition-order-free and engine-identical (the q122/q93
    * discipline). Scale: one explode into a (doc, bigram) partial-agg;
    * bigram and first-word totals are windows over the AGGREGATED
    * (doc, bigram) table keyed on bigram/w1 — the raw token stream never
    * crosses an exchange. Documents with < 2 tokens have no bigrams and
    * are absent from the output.
    */
  def bigramSurprisal(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // spread before the explode: a single-file corpus scans as ONE task,
    // and tokenize + shingle + explode + the partial aggregate all fuse
    // onto it (measured: a 1-task 3.1 s stage carrying ~the whole query
    // at the bench shape). One exchange of the raw (id, text) rows buys
    // full-width execution of the per-row text work; on a many-split
    // corpus the stats heuristic makes it a no-op.
    val cdb = Par.spread(df.select(col(idCol).as("_id"), col(textCol).as("_text")))
      .select(col("_id"),
        explode(TextAnalysis.shingles(
          TextAnalysis.tokens(coalesce(col("_text"), lit(""))), 2)).as("bigram"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .groupBy(col("_id"), col("w1"), col("bigram")).agg(count(lit(1)).as("c_db"))
    // ONE exchange serves both count windows: w1 is a function of bigram
    // (its first word), so partitioning by w1 already co-locates every
    // bigram group — the w1 window forces hashpartitioning(w1), and the
    // bigram window declared as partitionBy(w1, bigram) (identical groups:
    // adding a determined column splits nothing) has its
    // ClusteredDistribution(w1, bigram) SATISFIED by that partitioning
    // (partition expressions ⊆ clustering keys), so EnsureRequirements
    // inserts only a local sort, not a second full shuffle of the
    // (doc, bigram) table. Order matters: the w1 window must come first —
    // hashpartitioning(w1, bigram) would NOT satisfy the w1 window.
    val withTotals = cdb
      .withColumn("c_1", sum(col("c_db")).over(Window.partitionBy(col("w1"))))
      .withColumn("c_b", sum(col("c_db"))
        .over(Window.partitionBy(col("w1"), col("bigram"))))
    // cast to LONG before the sum: an exact integer sum is order-free;
    // a double sum of quantized terms would reintroduce the
    // partition-order sensitivity the quantization exists to kill
    val lnq = floor(log(col("c_b").cast("double") / col("c_1").cast("double"))
      * lit(1e10) + lit(0.5)).cast("long")
    withTotals
      .withColumn("_lnq", lnq)
      .groupBy(col("_id"))
      .agg(sum(col("c_db")).as("n_bigrams"),
        Portable.r6((-sum(col("c_db") * col("_lnq"))).cast("double") / lit(1e10) /
          sum(col("c_db")).cast("double")).as("mean_surprisal"))
      .withColumnRenamed("_id", idCol)
  }

  /** Shared closed form over a (len, n) size-class histogram: for each
    * pct, the fewest units (largest classes first) whose summed sizes
    * reach pct% of the total — `k = ⌈needed/len⌉` inside the boundary
    * class, all-integer comparisons throughout. Windows run over
    * |distinct sizes| rows only.
    */
  private def coverageFromClasses(classes: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100), "pcts in (0,100]")
    val w = Window.orderBy(col("len").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = classes
      .withColumn("class_sz", col("len") * col("n"))
      .withColumn("cum_sz", sum(col("len") * col("n")).over(w))
      .withColumn("cum_units", sum(col("n")).over(w))
      .withColumn("total", sum(col("len") * col("n")).over(Window.partitionBy()))
    pcts.map { pct =>
      // first qualifying class in size-desc order = min cum_sz
      cum.filter(col("cum_sz") * 100 >= col("total") * pct)
        .withColumn("_rn", row_number().over(Window.orderBy(col("cum_sz").asc)))
        .filter(col("_rn") === 1)
        .withColumn("_before", col("cum_sz") - col("class_sz"))
        .withColumn("_k", expr(
          s"(total * $pct - _before * 100 + len * 100 - 1) div (len * 100)"))
        .select(lit(pct.toLong).as("threshold_pct"),
          (col("cum_units") - col("n") + col("_k")).as("n_units"),
          (col("_before") + col("_k") * col("len")).as("covered"),
          col("total"))
    }.reduce(_ unionByName _)
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * `hash24(id:salt) mod k` — every document gets a stable fold in
    * [0, k); folds are disjoint, near-equal (24-bit uniform modulo bias
    * ≤ 2⁻²⁴·k, negligible for any practical k), and a document's fold
    * never changes as the corpus grows — the [[splitAssign]] guarantees,
    * with folds instead of named splits. Map-side projection, no shuffle.
    */
  def kFoldAssign(df: DataFrame, idCol: String, k: Int, salt: String): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.withColumn("fold", pmod(hash24(col(idCol), salt).cast("long"), lit(k.toLong)))
  }

  /** Per-group vocabulary document frequency: how many documents of each
    * group contain each token at least once, with the group's document
    * count for normalization. Distinct-per-document BEFORE the explode —
    * the map-side `array_distinct` bounds each document's contribution to
    * its vocabulary size, so a degenerate repeated-token document cannot
    * skew df. Top-`k` per group by (df desc, token asc) — total order.
    */
  def vocabTopDf(df: DataFrame, textCol: String, groupCol: String, k: Int): DataFrame = {
    val toks = array_distinct(TextAnalysis.tokens(col(textCol)))
    val exploded = df.select(col(groupCol), explode(toks).as("token"))
    val counts = exploded.groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("df").desc, col("token").asc)
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Per-group TF-IDF top terms: for each `groupCol` value (language,
    * source, domain…), the `k` tokens with the highest
    * `cnt · ln((N+1)/(df+1))` — corpus-level term salience (what vocabulary
    * distinguishes this slice), the routine report before mixture decisions
    * and tokenizer-vocab audits. Smoothed idf stays ≥ 0 and defined at
    * df = N. Ranking is on the ROUNDED weight (6 places) with a token
    * tiebreak — a total order both engines reproduce exactly (raw-double
    * ordering could flip near-ties across engines' 1-ulp `ln` differences).
    *
    * Scale: two partially-aggregated explodes (occurrence counts per group,
    * document frequency per token — distinct-per-doc BEFORE the explode
    * bounds a degenerate document's contribution), one key join on token,
    * one broadcast of the 1-row corpus count, and a top-k window over
    * |groups|·|vocab| aggregated rows — never over raw tokens.
    */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    groupCol: String, k: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val occ = df.select(col(groupCol), explode(toks).as("token"))
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("cnt"))
    val dfreq = df.select(col(idCol), explode(array_distinct(toks)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("tfidf").desc, col("token").asc)
    occ.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        Portable.roundPortable(col("cnt") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("token"), col("cnt"), col("df"), col("tfidf"), col("rnk"))
  }

  /** PMI collocations: the corpus's top-`k` adjacent-bigram collocations by
    * pointwise mutual information — `ln((c_ab/P) / ((c_a/T)·(c_b/T)))`,
    * where `c_ab` counts bigram POSITIONS (P total) and `c_a` token
    * occurrences (T total). High-PMI bigrams are multi-word expressions
    * ("new york", "machine learning") — the phrase-mining step before
    * tokenizer-vocab and boilerplate decisions. `minCount` suppresses the
    * unstable low-support tail (a 2-occurrence bigram of two rare tokens
    * dominates raw PMI). Ranking is on the ROUNDED pmi (6 places) with a
    * bigram tiebreak — total order, engine-exact (same discipline as
    * [[tfIdfTopTerms]]); the PMI ratio itself is evaluated in one fixed
    * double expression shape so both engines walk identical IEEE ops.
    *
    * Scale: two partially-aggregated explodes (bigram and unigram counts),
    * two broadcast-sized joins keyed on the words, one 1-row totals
    * broadcast, and a global top-k over the filtered collocation table —
    * every exchange carries aggregated vocabulary rows, never raw tokens.
    */
  def pmiCollocations(df: DataFrame, textCol: String, k: Int,
                      minCount: Long): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // totals need no explode: Σ size(tokens) = unigram occurrences and
    // Σ max(n−1, 0) = bigram positions, one map-side aggregate over the
    // raw scan (null text contributes nothing on either path)
    val nTok = size(toks)
    val totals = broadcast(df.agg(
      sum(nTok.cast("long")).as("t_tokens"),
      sum(greatest(nTok - 1, lit(0)).cast("long")).as("t_bigrams")))
    // the unigram table joins the collocation table TWICE (left and right
    // word); materialize once or the corpus is re-tokenized per reference
    // (same discipline as the near-dup signature tables). The bigram table
    // is referenced once — plain lineage
    // NOTE (round 13): tried spreading both exploding passes — measured a
    // wash-to-worse in-run (the exchange ships the raw text twice, once
    // per pass, for per-pass compute that is already cheap). Reverted.
    val uni = Par.materialize(df.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w")))
    // native non-distinct shingles: the composable transform/slice form
    // re-evaluates the token array inside every slice lambda (no CSE
    // inside lambdas — O(tokens²) per document); the native expression
    // tokenizes once per row
    val bi = df.select(explode(graft.plans.GraftFunctions.wordShingles(
        df, col(textCol), 2, distinct = false)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val parts = split(col("gram"), " ")
    val scored = bi
      .withColumn("w_a", parts.getItem(0)).withColumn("w_b", parts.getItem(1))
      .join(uni.withColumnsRenamed(Map("w" -> "w_a", "c_w" -> "c_a")), "w_a")
      .join(uni.withColumnsRenamed(Map("w" -> "w_b", "c_w" -> "c_b")), "w_b")
      .crossJoin(totals)
      .withColumn("pmi", Portable.r6(log(
        (col("c_ab").cast("double") / col("t_bigrams").cast("double")) /
          ((col("c_a").cast("double") / col("t_tokens").cast("double")) *
           (col("c_b").cast("double") / col("t_tokens").cast("double"))))))
    val w = Window.partitionBy().orderBy(col("pmi").desc, col("gram").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("gram"), col("c_ab"), col("c_a"), col("c_b"), col("pmi"), col("rnk"))
  }

  /** Sliding-window document chunking: each document's token stream becomes
    * overlapping chunks of `chunkTokens` tokens starting every `stride`
    * tokens — the long-document splitting step feeding context-window-bound
    * training and retrieval-index builds (stride < chunkTokens gives the
    * usual overlap so no boundary context is lost). A document with no
    * tokens yields no chunks; the final chunk is the (possibly short) tail.
    *
    * `chunk_id` is the 0-based window index (`start = chunk_id · stride`),
    * so (id, chunk_id) is a stable key and a chunk's provenance is exact
    * integer arithmetic — re-chunking with the same parameters always
    * reproduces the same rows, on any engine.
    *
    * Scale: tokenize → per-row `sequence`/`explode` → substring of the
    * token slice. All map-side on the document's own row (codegen'd
    * built-ins, no UDFs, no shuffle, no window) — chunking is free
    * pipeline work next to the scan at 100 TB; output size is input
    * tokens × (chunkTokens/stride) overlap factor, the inherent cost of
    * overlap, and nothing is buffered beyond one document.
    */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1, "chunkTokens and stride must be >= 1")
    val toks = TextAnalysis.tokens(col(textCol))
    val starts = when(size(toks) > 0,
        sequence(lit(0), size(toks) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), toks.as("_toks"), explode(starts).as("_start"))
      .select(col(idCol),
        (col("_start") / stride).cast("long").as("chunk_id"),
        size(slice(col("_toks"), col("_start") + 1, lit(chunkTokens))).cast("long")
          .as("n_tokens"),
        array_join(slice(col("_toks"), col("_start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** Deterministic corpus shuffle + shard assignment: shard by the first
    * md5(id:salt) byte (mod `nShards`), position within the shard by the
    * full hash — the training-order shuffle that kills any correlation
    * between corpus storage order and batch order, yet is bit-reproducible
    * by any engine (the property `randomSplit`/`rand()` shuffles lack: an
    * auditor must be able to reconstruct exactly which examples step 12345
    * trained on). Salt change ⇒ fresh independent order.
    *
    * Scale: the hash is map-side; positions need one shuffle on `shard`
    * (the exchange the shard write needs anyway) and a per-shard sort —
    * each shard is ~|corpus|/nShards, so size shards to the executor sort
    * budget (nShards is the parallelism knob, 256-4096 in practice).
    */
  def shuffleShards(df: DataFrame, idCol: String, salt: String, nShards: Int): DataFrame = {
    // two md5 bytes (65536 values) so the documented 256-4096 shard range
    // is actually reachable; modulo bias is ≤ nShards/65536 (zero for
    // power-of-two shard counts, the usual choice)
    require(nShards >= 1 && nShards <= 65536, "nShards must be in [1, 65536]")
    val h = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val hex = "0123456789abcdef"
    val x16 = (1 to 4).map(j =>
      (instr(lit(hex), substring(h, j, 1)) - 1) * lit(1 << (4 * (4 - j))))
      .reduce(_ + _)
    val w = Window.partitionBy(col("shard")).orderBy(col("_h").asc, col(idCol).asc)
    df.withColumn("_h", h)
      .withColumn("shard", pmod(x16, lit(nShards)).cast("long"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("_h")
  }

  /** Token-budget corpus selection: keep the best-scoring documents whose
    * cumulative token count fits a global budget — the final carve of a
    * curation pipeline ("fill 2 T tokens with the highest-quality data").
    * Priority order is (`scoreCol` desc, `idCol` asc); a document is kept
    * iff the cumulative token total through itself (inclusive) stays
    * ≤ budget, where budget = ⌊total_tokens · num / den⌋ — fractional so
    * the same query is meaningful at any corpus scale.
    *
    * `scoreCol` must be an INTEGRAL quality score of bounded cardinality
    * (a quantized density, e.g. stopword hits per mille) — it doubles as
    * the prefix-sum bucket key. The naive form of this operator is one
    * global ordered window: every row through a single partition, the
    * worst plan at 100 TB. This is the [[tokenOffsets]] two-level form
    * instead: a per-score-bucket cumulative sum (parallel, shuffled on
    * the score), bucket totals collapsed to |distinct scores| rows, a
    * window over THAT tiny table for the bucket base offsets, and a
    * broadcast join back. The budget itself derives from the same
    * |scores|-row aggregate — no extra corpus pass.
    */
  def budgetSelect(df: DataFrame, idCol: String, tokensCol: Column,
                   scoreCol: Column, budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget fraction must be >= 0")
    // NULL tokens count as 0 (the doc costs nothing against the budget);
    // a NULL score has no defined priority — such rows are absent from
    // the output (the bucket join has nothing to key them by)
    val base = df.select(col(idCol).as("_id"),
      coalesce(tokensCol.cast("long"), lit(0L)).as("n_tokens"),
      scoreCol.cast("long").as("score"))
    val wIntra = Window.partitionBy(col("score")).orderBy(col("_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val intra = base.withColumn("_cum_in", sum(col("n_tokens")).over(wIntra))
    val buckets = base.groupBy(col("score")).agg(sum(col("n_tokens")).as("_bt"))
    // exclusive prefix over buckets in priority order (score DESC), plus
    // the grand total for the fractional budget — both over |scores| rows
    val wBase = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val based = buckets
      .withColumn("_base", coalesce(sum(col("_bt")).over(wBase), lit(0L)))
      .withColumn("_total", sum(col("_bt")).over(Window.partitionBy()))
      .select(col("score"), col("_base"),
        (col("_total") * lit(budgetNum) / lit(budgetDen)).cast("long").as("_budget"))
    intra.join(broadcast(based), Seq("score"))
      .withColumn("cum_tokens", col("_base") + col("_cum_in"))
      .filter(col("cum_tokens") <= col("_budget"))
      .select(col("_id").as(idCol), col("score"), col("n_tokens"), col("cum_tokens"))
  }

  /** Per-stratum epoch plan: how many passes over each stratum a training
    * run should take to realize a temperature-flattened target mixture
    * within a global token budget — the schedule consumed by the data
    * loader ("en: 1.2 epochs, got: 4 epochs"). Target share ∝
    * observed_shareᵅ (the [[temperatureWeights]] rule); `epochs` =
    * min(maxEpochs, budget · target_share / stratum_tokens), capped so a
    * tiny stratum is repeated at most `maxEpochs` times rather than
    * memorized; `planned_tokens` = ⌊epochs · stratum_tokens⌋ is the
    * resulting actual token draw.
    *
    * Scale: identical to [[temperatureWeights]] — one partial-agg pass to
    * |strata| rows; every window below runs on that tiny table.
    */
  def epochPlan(df: DataFrame, strataCols: Seq[String], tokensCol: Column,
                alpha: Double, budgetTokens: Long, maxEpochs: Double): DataFrame = {
    require(budgetTokens > 0 && maxEpochs > 0, "budget and epoch cap must be positive")
    val agg = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol.cast("long")).as("n_tokens"))
    val all = Window.partitionBy()
    val share = col("n_tokens").cast("double") / sum(col("n_tokens")).over(all)
    val powed = when(col("n_tokens") > 0, pow(share, lit(alpha))).otherwise(lit(0.0))
    val targetShare = powed / sum(powed).over(all)
    // quantize epochs ONCE (portable floor-form; the q107 pow discipline),
    // then derive planned_tokens from the already-quantized epochs so the
    // two output columns cannot disagree in the last ulp
    val epochs = when(col("n_tokens") > 0,
      Portable.r6(least(lit(maxEpochs),
        lit(budgetTokens.toDouble) * targetShare / col("n_tokens").cast("double"))))
    agg
      .withColumn("target_share", when(sum(powed).over(all) > 0, Portable.r6(targetShare)))
      .withColumn("epochs", epochs)
      .withColumn("planned_tokens",
        floor(col("epochs") * col("n_tokens").cast("double")).cast("long"))
  }

  /** Per-stratum percentile-rank normalization of a score column — the
    * calibration step before cross-source comparisons or mixture-weighted
    * selection: raw quality scores are incomparable across sources (each
    * source has its own scale/offset), but the percentile of a document
    * WITHIN its source is. `pct` = (rank − 1)/(n − 1) over the total order
    * (`score` asc, `idCol` asc) inside each stratum (0 for a 1-row
    * stratum), so the best document of every source lands at 1.0 and
    * thresholds like "keep each source's top 30%" become a single global
    * predicate. Rank-based (the q115/q119 discipline): exact integer
    * ranks, one division, portable rounding — no interpolation, identical
    * on any engine.
    *
    * Scale: one row-level window keyed on the stratum — the same single
    * exchange a per-source groupBy would pay; nothing global.
    */
  def rankNormalize(df: DataFrame, strataCols: Seq[String], scoreCol: Column,
                    idCol: String): DataFrame = {
    require(strataCols.nonEmpty, "at least one stratum column")
    // rank over the INTEGRAL score (the same value the output carries), so
    // the order the percentile encodes is exactly the order a reader sees
    val base = df.withColumn("score", scoreCol.cast("long"))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("score").asc, col(idCol).asc)
    val n = count(lit(1)).over(Window.partitionBy(strataCols.map(col): _*))
    base.withColumn("pct",
      when(n > 1, Portable.r6((row_number().over(w) - lit(1)).cast("double") /
        (n - lit(1)).cast("double"))).otherwise(lit(0.0)))
  }

  /** Mergeable per-group profile state: `(n, s1, s2, mn, mx)` — count, sum,
    * sum of squares, min, max of `valueCol` per group. These are the
    * parallel-mergeable moments: states from disjoint batches combine by
    * summing the sums and min/max-ing the extremes ([[profileMerge]]), and
    * mean/variance derive at read time ([[profileFinish]]). The incremental
    * maintenance discipline at 100 TB: profile each ingest batch once when
    * it lands, store |groups| state rows, merge — history is never
    * rescanned. All-integer state (value cast to long), so merge order
    * cannot change a single bit of the finished doubles.
    */
  def profileState(df: DataFrame, groupCols: Seq[String],
                   valueCol: Column): DataFrame = {
    val v = valueCol.cast("long")
    // count(v), not count(*): a NULL value must be invisible to EVERY
    // moment alike — counting it in n but not s1/s2/mn/mx would make the
    // derived mean/variance describe neither the rows nor the values
    df.groupBy(groupCols.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("s1"),
        sum(v * v).as("s2"), min(v).as("mn"), max(v).as("mx"))
  }

  /** Combine any number of [[profileState]] tables (same `groupCols`) into
    * one state — the monoid append. A group absent from one state simply
    * contributes nothing. One partially-aggregated groupBy over |states| ×
    * |groups| rows; never touches the underlying data.
    */
  def profileMerge(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"), min(col("mn")).as("mn"), max(col("mx")).as("mx"))
  }

  /** Derive the readable profile from a state: count, total, mean,
    * population variance (`(s2 - s1²/n)/n`), min, max. Output columns are
    * named after `valueName` (the state is value-generic — bytes, lines,
    * scores — so the labels must be too). Exact cross-engine: the state is
    * integral and the doubles derive from integers below 2⁵³, so any
    * engine reproduces the rounded values bit-for-bit.
    */
  def profileFinish(state: DataFrame, groupCols: Seq[String],
                    valueName: String = "tokens"): DataFrame = {
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    state.select((groupCols.map(col) :+
      col("n").as("n_docs") :+ col("s1").as(s"n_$valueName") :+
      Portable.roundPortable(s1 / n, 6).as(s"mean_$valueName") :+
      Portable.roundPortable((s2 - s1 * s1 / n) / n, 6).as(s"var_$valueName") :+
      col("mn").as(s"min_$valueName") :+ col("mx").as(s"max_$valueName")): _*)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, as a 100 TB pipeline needs:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the candidate corpus; one pass over candidates, top-k via
  *    window. Exact baseline and the verifier for the approximate path.
  *  - [[lshTopK]] — approximate: random-hyperplane LSH buckets candidates so
  *    each query only scores its colliding bucket(s). Candidate generation is
  *    a key-equality join (shuffle on bucket id), never a cross join; recall
  *    is tunable via number of tables/hyperplanes. This is the path that
  *    survives a billion-vector corpus; an IVF (k-means coarse quantizer)
  *    variant would slot into the same shape with learned centroids.
  *
  * All math is double-precision fold over the array in index order
  * (`aggregate`/`zip_with`) — deterministic and engine-portable.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in index order, double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Zero-pad or truncate a driver-side sample vector to the trained dim —
    * one ragged corpus row must not crash quantizer training (the native
    * assignment kernels clamp reads the same way).
    */
  private def fitDim(v: Array[Double], dim: Int): Array[Double] =
    if (v.length == dim) v else java.util.Arrays.copyOf(v, dim)

  /** Dominant vector length across a training sample (ties → larger dim).
    * The target dim must NOT be whatever the first sampled row happens to
    * carry: one truncated/corrupt row sorting first would silently
    * truncate the whole corpus geometry to its length.
    */
  private def majorityDim(raw: Array[Array[Double]]): Int =
    raw.groupBy(_.length).maxBy { case (len, vs) => (vs.length, len) }._1

  /** Per-query top-k ranking of a scored candidate stream via the
    * bounded-heap typed aggregate (see [[graft.plans.TopKPairs]]): each
    * input partition sends at most k (sim, id) pairs per query across the
    * exchange — the window-rank form this replaces shuffles EVERY scored
    * candidate into a per-query sort, which at millions of queries × large
    * candidate sets is the ANN family's dominant exchange. Tie order
    * matches the window form exactly: sim DESC, neighbor_id ASC (the heap
    * keeps the larger (ord, id) pair, so the id rides in negated).
    * Expects `scored` to carry (query_id, neighbor_id, sim); emits
    * (query_id, neighbor_id, rank, sim) with sim rounded to 6dp at the
    * output, ranks 1..k.
    */
  private def topkPerQuery(scored: DataFrame, k: Int): DataFrame = {
    // the id rides through the heap as a long (cast keeps byte/short/int id
    // columns working, as the window form did; non-integral id types are
    // not supported by this family's contract). Negation flips the tie to
    // id ASC; ids are non-negative in this corpus model, so -id is safe.
    val agg = scored.groupBy(col("query_id"))
      .agg(graft.plans.GraftFunctions.topkPairs(scored, col("sim"),
        -col("neighbor_id").cast("long"), k).as("_top"))
    agg.select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_p")))
      .select(col("query_id"), (-col("_p.id")).as("neighbor_id"),
        (col("_pos") + 1).cast("int").as("rank"),
        Portable.roundPortable(col("_p.ord"), 6).as("sim"))
  }

  /** Exact cosine top-k: for every row of `queries`, the `k` nearest rows of
    * `candidates` (self-matches excluded). The query side is broadcast — the
    * corpus is scanned once regardless of query count; per-candidate work is
    * O(|queries|·dim). Deterministic tiebreak on candidate id.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("_qv"))
    val c = Par.spread(
      candidates.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("_cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", graft.plans.GraftFunctions.cosine(c, col("_qv"), col("_cv")))
    topkPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplanes: component h[i][d] derived from
    * xxhash64(seed, table, bit, dim) mapped to ±1. Sign-random projections
    * are enough for cosine LSH; ±1 keeps the dot products exact in double.
    */
  private def hyperplane(table: Int, bit: Int, dim: Int, seed: Long): Seq[Double] =
    (0 until dim).map { d =>
      val h = scala.util.hashing.MurmurHash3.productHash((seed, table, bit, d))
      if ((h & 1) == 0) 1.0 else -1.0
    }

  /** Random-hyperplane signature: `bits` sign bits per table → bucket id. */
  def lshBuckets(vec: Column, dim: Int, tables: Int, bits: Int, seed: Long): Column =
    array((0 until tables).map { t =>
      val bucket = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
        val plane = array(hyperplane(t, b, dim, seed).map(lit): _*)
        acc * 2 + when(dot(vec, plane) >= 0, 1L).otherwise(0L)
      }
      struct(lit(t).as("table"), bucket.as("bucket"))
    }: _*)

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * assigns every candidate to its nearest centroid (the "cells"); each
    * query scores only the `nprobe` nearest cells instead of the full
    * corpus. The learned-centroid counterpart of [[lshTopK]] — better cell
    * occupancy on clustered data, at the cost of a training pass.
    *
    * Scale: training samples the corpus (k-means on a bounded sample);
    * assignment is one broadcast of `nlist` centroids against the corpus;
    * the probe join is a key-equality join on cell id. Candidate work per
    * query ≈ (nprobe/nlist) of the corpus.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.plans.{GraftFunctions => GF}
    val c = Par.materialize(Par.spread(
      candidates.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("_cv"))))
    // train the quantizer on a bounded deterministic sample (hash-mod on the
    // id, not `limit`/`sample` — stable across partitionings): 16-ish cells
    // don't need the full corpus, and at 100 TB a full-corpus k-means pass
    // would dwarf the query itself. The standard IVF practice (train on
    // O(nlist·10²) points, assign everything).
    val maxTrain = nlist * 512L
    val total = c.count()
    val trainRows =
      if (total <= maxTrain) c
      else c.filter(pmod(xxhash64(col("neighbor_id")), lit(total / maxTrain + 1)) === 0)
    // the sample is bounded (nlist·512 rows, a few MB at any corpus size), so
    // Lloyd's runs ON THE DRIVER: 10 in-memory iterations cost ~ms, versus
    // ~10 distributed job barriers for a cluster k-means over the same rows.
    // FAISS-style IVF practice: sample → local train → broadcast centroids.
    // Trained and assigned on L2-NORMALIZED vectors: the ranking metric is
    // cosine, i.e. euclidean closeness on the unit sphere — quantizing raw
    // vectors lets norm variance dominate cell shape and true neighbors
    // land in unprobed cells (the FAISS METRIC_INNER_PRODUCT practice:
    // normalize, then L2 quantize).
    val raw = trainRows.orderBy(col("neighbor_id")) // deterministic order
      .select(col("_cv")).collect().map(_.getSeq[Double](0).toArray)
    require(raw.nonEmpty, "empty candidate corpus")
    val trainDim = majorityDim(raw) // hoisted: inline it and the groupBy reruns per vector
    val sample = raw
      .map(fitDim(_, trainDim)) // ragged rows zero-pad/truncate (kernels clamp the same way)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
    val centroids: Seq[Seq[Double]] =
      localKMeans(sample, nlist, iters = 10, seed).map(_.toSeq).toSeq
    // nearest-cell assignment via the native expression (euclidean, matching
    // k-means training; one flat loop/row instead of nlist·dim interpreted
    // closures + a full sort of the cell list)
    def nearestCells(df: DataFrame, vec: Column, n: Int): Column =
      graft.plans.GraftFunctions.nearestCentroids(df, vec, centroids, n)
    val cAssigned = Par.materialize(
      c.withColumn("cell", nearestCells(c, GF.l2normalize(c, col("_cv")), 1)(0)))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("_qv"))
    val q = q0.withColumn("cell",
      explode(nearestCells(q0, GF.l2normalize(q0, col("_qv")), nprobe)))
    val cand = q.join(cAssigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    topkPerQuery(
      cand.withColumn("sim", graft.plans.GraftFunctions.cosine(cand, col("_qv"), col("_cv"))),
      k)
  }

  /** IVF-PQ approximate top-k — the billion-vector memory path. On top of
    * [[ivfTopK]]'s coarse cells, every candidate vector is stored as `m`
    * product-quantization codes (~`m` bytes instead of 4·dim — ≈32×
    * compression at the defaults), and probe-time scoring is asymmetric
    * distance computation: one per-query lookup table of subspace inner
    * products, then a pure m-entry table sum per candidate — no vector math
    * against candidates at all. Optionally the top `rerankFactor·k` ADC
    * survivors are re-ranked with exact cosine against the full vectors
    * (IVFADC+R), which restores near-exact top-k while touching only a few
    * full vectors per query.
    *
    * This is the residual (FAISS IVFPQ) form: codes quantize r = v_norm −
    * coarse[cell(v)] — residuals cluster far tighter than raw vectors, so
    * the same code budget carries more signal — and the score decomposes as
    * ⟨q, v⟩ ≈ ⟨q, coarse_cell⟩ (one per probed cell, from a precomputed
    * per-query dot array) + ADC over the residual lookup table. Working on
    * L2-normalized vectors keeps cosine ≡ inner product, so one shared
    * codebook set serves every cell.
    */
  def ivfpqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 32,
                rerankFactor: Int = 3, seed: Long = 42L,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.plans.{GraftFunctions => GF}
    val c = Par.materialize(Par.spread(
      candidates.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("_cv"))))
    val maxTrain = nlist * 512L
    val total = c.count()
    val trainRows =
      if (total <= maxTrain) c
      else c.filter(pmod(xxhash64(col("neighbor_id")), lit(total / maxTrain + 1)) === 0)
    val raw = trainRows.orderBy(col("neighbor_id"))
      .select(col("_cv")).collect().map(_.getSeq[Double](0).toArray)
    require(raw.nonEmpty, "empty candidate corpus")
    val trainDim = majorityDim(raw) // hoisted: inline it and the groupBy reruns per vector
    val sample = raw.map(fitDim(_, trainDim)) // ragged rows zero-pad/truncate
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    def l2(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val normSample = sample.map(l2)
    // coarse quantizer + per-subspace RESIDUAL codebooks, all trained
    // driver-side on the bounded sample (see ivfTopK for why that holds at
    // any corpus size)
    val coarse: Seq[Seq[Double]] =
      localKMeans(normSample, nlist, iters = 10, seed).map(_.toSeq).toSeq
    val coarseArr = coarse.map(_.toArray).toArray
    def nearestIdx(p: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var ci = 0
      while (ci < coarseArr.length) {
        var s2 = 0.0; var d = 0
        while (d < dim) { val t = p(d) - coarseArr(ci)(d); s2 += t * t; d += 1 }
        if (s2 < bestD) { bestD = s2; best = ci }
        ci += 1
      }
      best
    }
    val residSample = normSample.map { p =>
      val ctr = coarseArr(nearestIdx(p))
      Array.tabulate(dim)(d => p(d) - ctr(d))
    }
    val effKsub = math.min(ksub, residSample.length)
    val codebooks = new Array[Double](m * effKsub * dsub)
    for (s <- 0 until m) {
      val sub = residSample.map(_.slice(s * dsub, (s + 1) * dsub))
      val cb = localKMeans(sub, effKsub, iters = 10, seed + s)
      for (j <- 0 until effKsub; d <- 0 until dsub)
        codebooks((s * effKsub + j) * dsub + d) = cb(j)(d)
    }
    // corpus index: normalized once, then ONLY (cell, residual codes)
    // travel through candidate generation — never the full vector, which
    // would defeat the ~32× compression exactly where it matters (the
    // probe join replicates candidates per matching query)
    val cNorm = c.withColumn("_nv", GF.l2normalize(c, col("_cv")))
      .withColumn("cell", GF.nearestCentroids(c, col("_nv"), coarse, 1)(0))
    val cIndexed = Par.materialize(cNorm
      .withColumn("codes", GF.pqEncode(cNorm,
        GF.centroidResidual(cNorm, col("_nv"), col("cell"), coarse),
        codebooks, m, effKsub, dsub))
      .select(col("neighbor_id"), col("cell"), col("codes")))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("_qv"))
    val qn = q0.withColumn("_nqv", GF.l2normalize(q0, col("_qv")))
      .withColumn("_lut", GF.pqLut(q0, col("_nqv"), codebooks, m, effKsub, dsub))
      .withColumn("_cdots", GF.centroidDots(q0, col("_nqv"), coarse))
    // _qv is NOT carried into the probe join — the ADC stream is the
    // operator's widest point and the query vector is re-attached from the
    // tiny per-query table only for the heap survivors below
    val q = qn.withColumn("cell",
        explode(GF.nearestCentroids(qn, col("_nqv"), coarse, nprobe)))
      .select(col("query_id"), col("_lut"),
        element_at(col("_cdots"), col("cell") + 1).as("_qdotc"), col("cell"))
    val cand = q.join(cIndexed, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("adc",
      col("_qdotc") + GF.pqAdc(cand, col("codes"), col("_lut"), effKsub))
    // ADC pre-selection through the same bounded-heap aggregate (ord = adc
    // score, tie on id ASC like the final rank): the ADC candidate stream
    // is the operator's widest point, and the heap sends ≤ rerankFactor·k
    // pairs per query per partition instead of window-sorting every
    // candidate; the query vector is re-attached from the tiny per-query
    // table afterwards
    val kAdc = math.max(k, k * rerankFactor)
    val survivors = scored.groupBy(col("query_id"))
      .agg(graft.plans.GraftFunctions.topkPairs(scored, col("adc"),
        // cast BEFORE negating: the heap is strictly (double, long) — an
        // int id column would fail analysis (and -Int.MinValue overflows)
        -col("neighbor_id").cast("long"), kAdc).as("_top"))
      .select(col("query_id"), explode(col("_top")).as("_p"))
      .select(col("query_id"), (-col("_p.id")).as("neighbor_id"))
      .join(qn.select(col("query_id"), col("_qv")), Seq("query_id"))
    // exact re-rank (IVFADC+R): fetch the few surviving full vectors by id —
    // a key-equality join against the (materialized) vector table touching
    // rerankFactor·k rows per query, instead of carrying dim doubles on
    // every ADC candidate
    val rerank = survivors.join(c, Seq("neighbor_id"))
    topkPerQuery(
      rerank.withColumn("sim",
        graft.plans.GraftFunctions.cosine(rerank, col("_qv"), col("_cv"))),
      k)
  }

  /** Seeded Lloyd's k-means over an in-memory sample (the IVF coarse
    * quantizer's training loop). Init = k points drawn by seeded shuffle;
    * empty clusters keep their previous centroid. Deterministic for a fixed
    * (sample, k, iters, seed).
    */
  private[functions] def localKMeans(points: Array[Array[Double]], k: Int,
                                     iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty sample")
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(points.indices.toVector).take(math.min(k, points.length))
    var ctrs = init.map(i => points(i).clone()).toArray
    if (ctrs.length < k) // degenerate tiny sample: pad by repeating points
      ctrs = Array.tabulate(k)(i => points(i % points.length).clone())
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < points.length) {
        val v = points(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var s = 0.0; var d = 0
          val ctr = ctrs(c)
          while (d < dim) { val t = v(d) - ctr(d); s += t * t; d += 1 }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      p = 0
      while (p < points.length) {
        val v = points(p); val a = assign(p)
        var d = 0
        while (d < dim) { sums(a)(d) += v(d); d += 1 }
        counts(a) += 1
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dim) { sums(c)(d) /= counts(c); d += 1 }
          ctrs(c) = sums(c)
        } // else: empty cluster keeps its previous centroid
        c += 1
      }
      it += 1
    }
    ctrs
  }

  /** Embedding-cosine near-duplicate pairs: every unordered pair with
    * cosine ≥ `minCosine` (id_a < id_b). Completes the dedup family
    * (exact hash / n-gram Jaccard / MinHash / SimHash / embedding-cosine).
    *
    * Delegating operator — the default is the scale path. The all-pairs
    * broadcast form ([[cosineNearDupPairsExact]]) is opt-in: it runs only
    * when the caller passes a positive `maxBroadcastBytes` AND the corpus is
    * PROVABLY that small (every logical-plan leaf has real stats — no
    * stats-less LogicalRDD sentinel — and the plan-level size estimate fits
    * under the cap; same leaf-stat discipline as [[Par.spread]], so the
    * routing decision costs no Spark job). Anything unknown or larger takes
    * [[cosineNearDupPairsLsh]]: key-equality bucket join, ~linear, the same
    * exact verify expression, recall pinned at 100% against the exact form
    * on the gate data. An operator that quietly planned an O(n²/2)
    * BroadcastNestedLoopJoin on a 100 TB corpus would be the single worst
    * plan in the library — so the unsafe form is never the default.
    */
  def cosineNearDupPairs(df: DataFrame, minCosine: Double, dim: Int,
                         maxBroadcastBytes: Long = 0L,
                         tables: Int = 48, bits: Int = 4, seed: Long = 42L,
                         maxBucket: Int = 100000,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val provablyTiny = maxBroadcastBytes > 0L && {
      val plan = df.queryExecution.optimizedPlan
      val sentinel = BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
      plan.collectLeaves().forall(_.stats.sizeInBytes < sentinel) &&
        plan.stats.sizeInBytes <= maxBroadcastBytes
    }
    if (provablyTiny) cosineNearDupPairsExact(df, minCosine, idCol, vecCol)
    else cosineNearDupPairsLsh(df, minCosine, dim, tables, bits, seed, maxBucket, idCol, vecCol)
  }

  /** The exact all-pairs baseline and VERIFIER form of [[cosineNearDupPairs]]:
    * one side is broadcast, so the corpus is scanned once and candidate
    * generation is an O(n²/2) comparison bounded by the broadcast side. It
    * exists to pin the LSH path's recall in tests and to serve corpora the
    * caller has proven broadcast-sized — it is NOT a canonical query shape
    * (PlanAuditSpec bans its BroadcastNestedLoopJoin from every shipped
    * query); the operator a pipeline runs is [[cosineNearDupPairs]].
    */
  def cosineNearDupPairsExact(df: DataFrame, minCosine: Double,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = Par.spread(df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("_va")))
    val b = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("_vb"))
    val pairs = a.join(broadcast(b), col("id_a") < col("id_b"))
    pairs
      .withColumn("sim", Portable.roundPortable(graft.plans.GraftFunctions.cosine(pairs, col("_va"), col("_vb")), 6))
      .filter(col("sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Embedding-cosine near-dup pairs at corpus scale: hyperplane-LSH
    * bucketing generates candidates, the exact cosine threshold verifies
    * them — the same verify expression as [[cosineNearDupPairs]], so
    * precision is exact and only recall is approximate (a qualifying pair
    * is missed only if it collides in NONE of the `tables` bucket tables;
    * at τ=0.4 and the defaults the per-pair miss probability is < 10⁻⁴,
    * and recall is pinned at 100% against the exact form on the gate data
    * in TrainingOpsSpec).
    *
    * Scale shape (the path [[cosineNearDupPairs]]'s broadcast form cannot
    * take): the bucket stream carries ONLY (id, table, bucket) — never the
    * vector, which would amplify shuffle volume `tables`-fold — so
    * candidate generation is a key-equality self-join bounded by bucket
    * occupancy, ~linear in corpus size for non-degenerate data; vectors are
    * re-attached from the materialized (id, vector) table for just the
    * surviving candidate pairs. `maxBucket` caps degenerate buckets (a
    * near-constant embedding region) exactly like the shingle index's
    * hot-key prune, and the truncation is logged.
    */
  def cosineNearDupPairsLsh(df: DataFrame, minCosine: Double, dim: Int,
                            tables: Int = 48, bits: Int = 4, seed: Long = 42L,
                            maxBucket: Int = 100000,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            strategy: String = "auto"): DataFrame = {
    // CANDIDATE-STRATEGY PLANNING (the sf0.1→sf1 scale probe's finding):
    // random-hyperplane LSH only FILTERS when a random pair's chance of
    // colliding in ≥1 table, 1 − (1 − 0.5^bits)^tables, is small. At a
    // LOW cosine threshold that is unattainable: per bit, a true pair at
    // angle θ collides w.p. 1 − θ/π vs 0.5 for a random pair, so at
    // τ = 0.4 (θ ≈ 66°, p_true ≈ 0.63/bit) the recall-preserving
    // parameterizations (4 bits × 48 tables → 95% random collision) admit
    // essentially EVERY pair, and the LSH plumbing (explode, 200M-row
    // dropDuplicates, two join-backs) is pure overhead on top of the
    // all-pairs verify it no longer avoids. No (bits, tables) escapes:
    // raising bits to 8/12 needs 270/1700 tables for recall and still
    // charges ≥ 0.4× the all-pairs verify in candidates alone. When the
    // declared parameters are in that regime, `auto` switches to the
    // BLOCKED EXACT self-join — same result (recall 1 by construction),
    // one equi-join pass, no dedup. LSH earns its keep at HIGH
    // thresholds (τ ≥ 0.8 → p_true ≥ 0.9/bit: 16 bits × 48 tables
    // filters ~1400×) — pass explicit bits/tables for that regime, or
    // strategy = "lsh" to pin the LSH plan (q50 does, as the
    // recall-pinned demonstrator).
    val lshRandomCollisionRate =
      1.0 - math.pow(1.0 - math.pow(0.5, bits.toDouble), tables.toDouble)
    val useLsh = strategy match {
      case "lsh" => true
      case "exact" => false
      case _ => lshRandomCollisionRate < 0.25
    }
    if (!useLsh)
      return cosineNearDupPairsBlocked(df, minCosine, idCol = idCol,
        vecCol = vecCol)
    val vecs = Par.materialize(Par.spread(
      df.select(col(idCol).as("_id"), asDouble(col(vecCol)).as("_v"))))
    val buckets = Par.materialize(NearDup.pruneHotKeys(
      vecs.withColumn("_bks",
          graft.plans.GraftFunctions.hyperplaneBuckets(vecs, col("_v"), dim, tables, bits, seed))
        .select(col("_id"), posexplode(col("_bks")).as(Seq("_table", "_bucket")))
        .withColumn("_tb", col("_table") * (1L << bits) + col("_bucket"))
        .select(col("_id"), col("_tb")),
      "_tb", maxBucket))
    val candIds = buckets.as("l").join(buckets.as("r"),
        col("l._tb") === col("r._tb") && col("l._id") < col("r._id"))
      .select(col("l._id").as("id_a"), col("r._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // spread before the vector attach — the cosine verify otherwise fuses
    // onto the AQE-coalesced 1-2-partition candidate read (see
    // NearDup.verifyJaccardSides for the measured collapse)
    val cand = Par.spread(candIds, force = true)
      .join(vecs.withColumnsRenamed(Map("_id" -> "id_a", "_v" -> "_va")), Seq("id_a"))
      .join(vecs.withColumnsRenamed(Map("_id" -> "id_b", "_v" -> "_vb")), Seq("id_b"))
    cand
      .withColumn("sim", Portable.roundPortable(graft.plans.GraftFunctions.cosine(cand, col("_va"), col("_vb")), 6))
      .filter(col("sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Corpus-wide cosine near-dup pairs by BLOCKED EXACT self-join — the
    * scale form for LOW thresholds, where no LSH parameterization filters
    * (see [[cosineNearDupPairsLsh]]'s planning note) and the qualifying
    * pairs are what they are: Ω(output) is the floor, and this plan walks
    * it in ONE equi-join pass. Each vector lands in a deterministic
    * crc32 block of ~`targetBlockRows` rows; the right side replicates to
    * every block id, the equi-join on the block key meets each unordered
    * pair exactly once under the `id_a < id_b` join conjunct (pair (x,y)
    * arises from x's block and from y's block; the order filter keeps
    * one), and the cosine evaluates inside the join's codegen — no
    * cartesian/BNLJ node, no candidate dedup, no join-back. Shuffle is
    * the replicated side, |vectors| × blocks rows — blocks scale as
    * n / targetBlockRows, so per-task pair work is constant and the total
    * is the unavoidable n²/2 verify, evenly spread across the cluster.
    */
  def cosineNearDupPairsBlocked(df: DataFrame, minCosine: Double,
                                targetBlockRows: Int = 512,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding"): DataFrame = {
    val vecs = Par.materialize(Par.spread(
      df.select(col(idCol).as("_id"), asDouble(col(vecCol)).as("_v"))))
    val nBlocks = math.max(1L,
      (vecs.count() + targetBlockRows - 1) / targetBlockRows)
    val blkOf = pmod(crc32(col("_id").cast("string").cast("binary")),
      lit(nBlocks))
    val left = vecs.select(col("_id").as("id_a"), col("_v").as("_va"),
      blkOf.as("_blk"))
    val right = vecs.select(col("_id").as("id_b"), col("_v").as("_vb"))
      .withColumn("_tgt", explode(sequence(lit(0L), lit(nBlocks - 1))))
    val joined = left.join(right,
      col("_blk") === col("_tgt") && col("id_a") < col("id_b"))
    joined
      .withColumn("sim", Portable.roundPortable(
        graft.plans.GraftFunctions.cosine(joined, col("_va"), col("_vb")), 6))
      .filter(col("sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Incremental embedding near-dup pairs: a new batch of vectors against a
    * maintained corpus — the embedding-space sibling of
    * [[NearDup.incrementalJaccardPairs]], and the maintenance shape a real
    * pipeline runs DAILY instead of corpus-wide SemDeDup
    * ([[cosineNearDupPairsLsh]]): the corpus pays its hyperplane bucket
    * index once (at 100 TB it is a maintained table new batches append to —
    * here derived on the fly); a batch then costs |batch| bucket lookups
    * plus its own internal self-join — never a corpus self-join, so
    * admission cost is independent of corpus size.
    *
    * Same seeded hyperplanes as the corpus-wide form, so a bucket index
    * built by one serves the other; same hot-key prune on the CORPUS index
    * only (its posting lists are what amplify the join — batch-internal
    * fan-out is bounded by the batch size); same exact-cosine verify, so
    * precision is exact and only candidate recall is approximate.
    *
    * Returns (id_a, id_b, sim) with id_b always the batch vector of the
    * pair (existing↔batch) or the larger id (batch-internal) — the
    * loser-side convention [[admitVectorBatch]] consumes.
    */
  def incrementalCosinePairs(existing: DataFrame, batch: DataFrame,
                             minCosine: Double, dim: Int,
                             tables: Int = 48, bits: Int = 4, seed: Long = 42L,
                             maxBucket: Int = 100000,
                             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ex = prepVectors(existing, idCol, vecCol)
    incrementalCosinePairsIndexed(
      bucketPostings(ex), ex, batch,
      minCosine, dim, tables, bits, seed, maxBucket, idCol, vecCol)
  }

  /** Normalized (_id, _v double-array) vector frame — the row shape a
    * maintained vector table persists ([[graft.pipeline.VectorIndex]]).
    */
  def prepVectors(df: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    Par.materialize(Par.spread(
      df.select(col(idCol).as("_id"), asDouble(col(vecCol)).as("_v"))))

  /** Hyperplane-LSH bucket postings (_id, _tb) of a prepped vector frame —
    * the rows a maintained bucket-index table stores. Same seeded
    * hyperplanes as every cosine LSH path, so postings persisted by one
    * build keep serving later probes.
    */
  def bucketPostings(vecs: DataFrame, dim: Int = 64, tables: Int = 48,
                     bits: Int = 4, seed: Long = 42L): DataFrame =
    vecs.withColumn("_bks",
        graft.plans.GraftFunctions.hyperplaneBuckets(vecs, col("_v"), dim, tables, bits, seed))
      .select(col("_id"), posexplode(col("_bks")).as(Seq("_table", "_bucket")))
      .withColumn("_tb", col("_table") * (1L << bits) + col("_bucket"))
      .select(col("_id"), col("_tb"))

  /** [[incrementalCosinePairs]] against an ALREADY-MATERIALIZED index —
    * `exPostings` (_id, _tb) and `exVectors` (_id, _v) as maintained
    * tables — the form a persisted 100 TB index serves: the corpus pays
    * its bucketing once at ingest, and each admission batch reads only
    * the postings its own buckets collide with.
    */
  def incrementalCosinePairsIndexed(exPostings: DataFrame, exVectors: DataFrame,
                                    batch: DataFrame,
                                    minCosine: Double, dim: Int,
                                    tables: Int = 48, bits: Int = 4, seed: Long = 42L,
                                    maxBucket: Int = 100000,
                                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ex = exVectors
    val ba = prepVectors(batch, idCol, vecCol)
    val baInv = Par.materialize(bucketPostings(ba, dim, tables, bits, seed))
    // corpus postings restricted to the buckets the batch probes — a
    // broadcast leftsemi (≤ tables·2^bits distinct keys) inside the
    // postings scan, so hot-bucket counting and the candidate join work on
    // the probed slice, and the full corpus postings are never shuffled or
    // cached per batch. Identical semantics: key-equality filtering leaves
    // every probed bucket's occupancy count unchanged (same buckets exceed
    // maxBucket), and unprobed buckets join nothing. At small `bits` every
    // bucket is probed and this is a pass-through — the occupancy term the
    // admission probe measures is then structural, which is exactly why
    // `bits` is the BUILD parameter to re-pick as the index grows
    // (BASELINE.md §Round 12).
    val probed = exPostings.join(
      baInv.select(col("_tb")).distinct(), Seq("_tb"), "leftsemi")
    val exInv = NearDup.pruneHotKeys(probed, "_tb", maxBucket)
    // existing↔batch candidates: the batch's buckets probe the corpus index
    val crossIds = baInv.as("b").join(exInv.as("e"), col("b._tb") === col("e._tb"))
      .select(col("e._id").as("id_a"), col("b._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // batch-internal candidates: the batch's own (small) self-join
    val selfIds = baInv.as("l").join(baInv.as("r"),
        col("l._tb") === col("r._tb") && col("l._id") < col("r._id"))
      .select(col("l._id").as("id_a"), col("r._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val candIds = crossIds.unionByName(selfIds).dropDuplicates("id_a", "id_b")
    // id_a resolves against corpus ∪ batch, id_b against the batch only.
    // Spread the pair ids before the vector attach: AQE coalesces the
    // byte-tiny candidate exchange to 1-2 partitions and the cosine
    // verify would fuse onto them (NearDup.verifyJaccardSides has the
    // measured case); one round-robin exchange buys full-width verify.
    val cand = Par.spread(candIds, force = true)
      .join(ex.unionByName(ba).withColumnsRenamed(Map("_id" -> "id_a", "_v" -> "_va")), Seq("id_a"))
      .join(ba.withColumnsRenamed(Map("_id" -> "id_b", "_v" -> "_vb")), Seq("id_b"))
    cand
      .withColumn("sim",
        Portable.roundPortable(graft.plans.GraftFunctions.cosine(cand, col("_va"), col("_vb")), 6))
      .filter(col("sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** [[incrementalCosinePairsIndexed]] against PERSISTED index tables,
    * with FILE-level pruning derived from the batch — the semantic twin
    * of [[graft.functions.NearDup.incrementalJaccardPairsStored]]:
    * `postingsFor` receives the batch's distinct (table,bucket) probe
    * keys, `vectorsFor` the candidate pairs' corpus ids (each `None`
    * above the bounded-collect cap → full table), and each returns a
    * SUPERSET of the touched rows (a `readAnyOf` pruned read) — every
    * downstream join keys on exactly the probed column, so superset
    * reads change I/O, never results. This deletes the two residual
    * ∝-corpus scan terms the round-12 admission probe measured in the
    * filtering regime: the postings scan feeding the semi filter, and
    * the corpus-vectors scan that re-attaches candidate embeddings.
    */
  def incrementalCosinePairsStored(postingsFor: Option[Array[Long]] => DataFrame,
                                   vectorsFor: Option[Array[Long]] => DataFrame,
                                   batch: DataFrame,
                                   minCosine: Double, dim: Int,
                                   tables: Int = 48, bits: Int = 4, seed: Long = 42L,
                                   maxBucket: Int = 100000,
                                   idCol: String = "vec_id", vecCol: String = "embedding",
                                   collectCap: Int = 1 << 20): DataFrame = {
    val ba = prepVectors(batch, idCol, vecCol)
    val baInv = Par.materialize(bucketPostings(ba, dim, tables, bits, seed))
    val probeKeys = Par.collectLongsBounded(
      baInv.select(col("_tb")).distinct(), collectCap)
    // key set already on the driver → InSet filter inside the scan; only
    // the cap-exceeded fallback pays the distinct + semi join
    val exPostings = postingsFor(probeKeys)
    val probed = probeKeys match {
      case Some(ks) => exPostings.filter(col("_tb").isInCollection(ks.toSeq))
      case None => exPostings.join(
        baInv.select(col("_tb")).distinct(), Seq("_tb"), "leftsemi")
    }
    val exInv = NearDup.pruneHotKeys(probed, "_tb", maxBucket)
    // materialized so the collected candidate-id set and the verify join
    // read the SAME computed candidates (and the probe join runs once)
    val crossIds = Par.materialize(
      baInv.as("b").join(exInv.as("e"), col("b._tb") === col("e._tb"))
        .select(col("e._id").as("id_a"), col("b._id").as("id_b"))
        .dropDuplicates("id_a", "id_b"))
    val corpusIds = Par.collectLongsBounded(
      crossIds.select(col("id_a")).distinct(), collectCap)
    val selfIds = baInv.as("l").join(baInv.as("r"),
        col("l._tb") === col("r._tb") && col("l._id") < col("r._id"))
      .select(col("l._id").as("id_a"), col("r._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val candIds = crossIds.unionByName(selfIds).dropDuplicates("id_a", "id_b")
    // id_a resolves against (pruned) corpus ∪ batch, id_b against the batch.
    // Spread before the vector attach — same AQE byte-coalescing collapse
    // as the indexed form above; see NearDup.verifyJaccardSides.
    val cand = Par.spread(candIds, force = true)
      .join(vectorsFor(corpusIds).unionByName(ba)
        .withColumnsRenamed(Map("_id" -> "id_a", "_v" -> "_va")), Seq("id_a"))
      .join(ba.withColumnsRenamed(Map("_id" -> "id_b", "_v" -> "_vb")), Seq("id_b"))
    cand
      .withColumn("sim",
        Portable.roundPortable(graft.plans.GraftFunctions.cosine(cand, col("_va"), col("_vb")), 6))
      .filter(col("sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** [[admitVectorBatchIndexed]] against PERSISTED index tables with
    * file-level pruning — see [[incrementalCosinePairsStored]]. `exIds`
    * is the corpus id column; callers may pass a read pruned to the
    * BATCH's ids (the anti-join only matches ids the batch carries; a
    * pruned read is a superset of those rows), or the full scan.
    */
  def admitVectorBatchStored(postingsFor: Option[Array[Long]] => DataFrame,
                             vectorsFor: Option[Array[Long]] => DataFrame,
                             exIds: DataFrame, batch: DataFrame,
                             minCosine: Double, dim: Int,
                             tables: Int = 48, bits: Int = 4, seed: Long = 42L,
                             maxBucket: Int = 100000,
                             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // no extra materialize: the candidate set is already cached inside the
    // stored pair plan, and verify from it is consumed exactly once
    val pairs = incrementalCosinePairsStored(postingsFor,
      vectorsFor, batch, minCosine, dim, tables, bits, seed, maxBucket,
      idCol, vecCol)
    admitByPairs(batch, pairs, exIds.select(col("_id").as(idCol)), idCol)
  }

  /** Batch admission under incremental SEMANTIC dedup: the batch vectors
    * that survive against the existing corpus and their own batch — the
    * embedding-space sibling of [[NearDup.admitBatch]] with the identical
    * pair-local rule: a batch vector drops iff it pairs with ANY existing
    * vector (the corpus member is already canonical) or with a smaller-id
    * batch vector. No cluster closure: admission is per-vector, and
    * conservatively dropping both members of a transitive chain is the
    * safe direction for training data.
    */
  def admitVectorBatch(existing: DataFrame, batch: DataFrame,
                       minCosine: Double, dim: Int,
                       tables: Int = 48, bits: Int = 4, seed: Long = 42L,
                       maxBucket: Int = 100000,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = Par.materialize(incrementalCosinePairs(existing, batch,
      minCosine, dim, tables, bits, seed, maxBucket, idCol, vecCol))
    admitByPairs(batch, pairs, existing.select(col(idCol)), idCol)
  }

  /** [[admitVectorBatch]] against a persisted index (postings + vectors
    * tables) — see [[incrementalCosinePairsIndexed]].
    */
  def admitVectorBatchIndexed(exPostings: DataFrame, exVectors: DataFrame,
                              batch: DataFrame,
                              minCosine: Double, dim: Int,
                              tables: Int = 48, bits: Int = 4, seed: Long = 42L,
                              maxBucket: Int = 100000,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = Par.materialize(incrementalCosinePairsIndexed(exPostings, exVectors,
      batch, minCosine, dim, tables, bits, seed, maxBucket, idCol, vecCol))
    admitByPairs(batch, pairs, exVectors.select(col("_id").as(idCol)), idCol)
  }

  /** The shared pair-local admission rule: a batch row drops iff it is the
    * id_b (loser) side of any pair; existing ids are excluded defensively.
    */
  private def admitByPairs(batch: DataFrame, pairs: DataFrame,
                           exIds: DataFrame, idCol: String): DataFrame = {
    // ONE anti-join against the unioned exclusion set (pair losers ∪
    // defensive existing ids): equal to two sequential anti-joins — a row
    // survives iff its id is in neither set — with one broadcast build
    // and one join instead of two of each
    val excluded = pairs.select(col("id_b").as(idCol)).unionByName(exIds)
    batch.join(excluded, Seq(idCol), "left_anti")
  }

  /** Chunk→document mean-pooling: average the embedding vectors of a
    * document's chunks into one document vector — the pooling step between
    * chunk-level encoding and document-level semantic ops (dedup,
    * retrieval, clustering). Output is relational (doc, pos, mean): one
    * row per vector dimension, the join-ready shape for downstream
    * per-dimension ops and for exact engine comparison.
    *
    * Exactness: each component is quantized to integer nano-units with the
    * portable floor-form FIRST (float inputs are exact in double; the
    * quantization is the same correctly-rounded IEEE ops on any engine),
    * then summed as exact longs — so the mean is partition-order-free and
    * engine-identical, the [[graft.functions.Corpus.tokenKlDrift]] sum
    * discipline applied to vectors. Scale: one explode to
    * |vectors|·dim rows, one partial-aggregated groupBy on (doc, pos) —
    * map-side combined, never a collect.
    */
  def meanPool(df: DataFrame, docCol: Column,
               vecCol: String = "embedding"): DataFrame = {
    val exploded = df.select(docCol.as("doc"),
      posexplode(asDouble(col(vecCol))).as(Seq("pos", "_x")))
    exploded
      .withColumn("_xq", floor(col("_x") * lit(1e9) + lit(0.5)))
      .groupBy(col("doc"), col("pos").cast("long").as("pos"))
      .agg(Portable.r6(sum(col("_xq")).cast("double") /
        (count(lit(1)) * lit(1e9))).as("mean"))
  }

  /** Approximate cosine top-k via multi-table hyperplane LSH: queries and
    * candidates are bucketed; only same-(table,bucket) pairs are scored.
    * Returns at most k neighbors per query (fewer if recall misses).
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int, dim: Int,
              tables: Int = 8, bits: Int = 10, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the bucket stream carries ONLY (id, table, bucket) — attaching the
    // vector to the explode would store and shuffle `tables` copies of every
    // vector (the amplification cosineNearDupPairsLsh documents avoiding);
    // vectors are re-attached by id join for just the surviving candidate
    // pairs
    def prepared(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      Par.materialize(Par.spread(
        df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs))))
    def bucketed(vecs: DataFrame, idAs: String, vecAs: String): DataFrame =
      vecs
        .withColumn("_bks",
          graft.plans.GraftFunctions.hyperplaneBuckets(vecs, col(vecAs), dim, tables, bits, seed))
        .select(col(idAs), posexplode(col("_bks")).as(Seq("table", "bucket")))
    val qv = prepared(queries, "query_id", "_qv")
    val cv = prepared(candidates, "neighbor_id", "_cv")
    val candIds = bucketed(qv, "query_id", "_qv")
      .join(bucketed(cv, "neighbor_id", "_cv"), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val cand = candIds.join(qv, Seq("query_id")).join(cv, Seq("neighbor_id"))
    topkPerQuery(
      cand.withColumn("sim", graft.plans.GraftFunctions.cosine(cand, col("_qv"), col("_cv"))),
      k)
  }

  /** Johnson–Lindenstrauss random projection of an embedding column to `k`
    * dimensions: out[j] = ⟨v, h_j⟩ / √k over the same deterministic ±1
    * hyperplanes the LSH family draws ([[hyperplane]], distinct seed
    * space), so pairwise inner products and euclidean distances are
    * preserved in expectation with O(1/√k) distortion — the standard
    * pre-ANN dimensionality reduction (project once, then run IVF/LSH in
    * the cheap k-dim space; re-rank survivors with full vectors).
    * Deterministic for a fixed (dim, k, seed): any engine re-derives the
    * identical projection. Map-side only — no shuffle, no training pass,
    * which is what distinguishes JL from PCA at 100 TB.
    */
  def jlProject(vec: Column, dim: Int, k: Int, seed: Long = 42L): Column = {
    val scale = 1.0 / math.sqrt(k.toDouble)
    array((0 until k).map { j =>
      val plane = array(hyperplane(j, 0, dim, seed ^ 0x4a4cL).map(lit): _*)
      dot(asDouble(vec), plane) * scale
    }: _*)
  }

  /** Cluster-cohesion audit over a labeled embedding corpus: per label, the
    * member count, the mean cosine of members to their OWN centroid
    * (cohesion), and the max cosine between this centroid and any OTHER
    * label's centroid (confusability margin — SemDeDup-style curation reads
    * "tight cluster, far from neighbors" as safe to dedup aggressively and
    * "loose or confusable" as needing review).
    *
    * Exactness: per-dim centroid means are DECIMAL-summed (order-free)
    * then divided once; member cosines use the native index-ordered fold
    * and are rounded to 6 before the (again decimal) mean — every number
    * is engine-reproducible. Scale: one posexplode shuffle keyed
    * (label, pos) for centroids (partial agg), centroid table is |labels|
    * rows broadcast back; members are scanned once; the centroid×centroid
    * compare is |labels|² on a broadcast-sized table.
    */
  def clusterCohesion(df: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val flat = df.select(col(labelCol).as("label"),
      posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
    val cent = flat.groupBy(col("label"), col("pos"))
      .agg((sum(col("v").cast("decimal(28,12)")).cast("double") /
        count(lit(1)).cast("double")).as("c"))
    val carr = cent.groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cvec"))
    val membered = df.select(col(labelCol).as("label"), asDouble(col(vecCol)).as("_v"))
      .join(broadcast(carr), Seq("label"))
    val cos6 = Portable.roundPortable(
      graft.plans.GraftFunctions.cosine(membered, col("_v"), col("cvec")), 6)
    val intra = membered
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        Portable.roundPortable(sum(cos6.cast("decimal(18,10)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_intra_cos"))
    val b = carr.select(col("label").as("label_b"), col("cvec").as("cvec_b"))
    val interPairs = carr.join(b, col("label") =!= col("label_b"))
    val inter = interPairs
      .groupBy(col("label"))
      .agg(max(Portable.roundPortable(graft.plans.GraftFunctions.cosine(
        interPairs, col("cvec"), col("cvec_b")), 6)).as("max_inter_cos"))
    // left: a single-label corpus has no inter pairs — report the label
    // with a NULL max_inter_cos rather than dropping it
    intra.join(inter, Seq("label"), "left")
  }
}

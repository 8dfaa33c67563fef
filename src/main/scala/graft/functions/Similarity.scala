package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim"))
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
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = Par.materialize(Par.spread(
      candidates.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("_cv"))))
    val trainDf = c.select(array_to_vector(col("_cv")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(trainDf)
    val centroids = model.clusterCenters.map(_.toArray)
    // nearest-cell assignment as a plain expression over broadcast centroids
    // (euclidean, matching k-means training)
    def dist2(vec: Column, ctr: Array[Double]): Column = {
      val carr = array(ctr.map(lit): _*)
      aggregate(zip_with(vec, carr, (a, b) => (a - b) * (a - b)), lit(0.0), (s, v) => s + v)
    }
    def nearestCells(vec: Column, n: Int): Column =
      slice(transform(array_sort(array(centroids.zipWithIndex.map { case (ctr, i) =>
        struct(dist2(vec, ctr).as("d"), lit(i).as("cell"))
      }: _*)), s => s.getField("cell")), 1, n)
    val cAssigned = Par.materialize(
      c.withColumn("cell", nearestCells(col("_cv"), 1)(0)))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("_qv"))
      .withColumn("cell", explode(nearestCells(col("_qv"), nprobe)))
    val cand = q.join(cAssigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("sim", graft.plans.GraftFunctions.cosine(cand, col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs: every unordered pair with
    * cosine ≥ `minCosine` (id_a < id_b), exact. Completes the dedup family
    * (exact hash / n-gram Jaccard / MinHash / SimHash / embedding-cosine).
    *
    * This is the exact baseline and the oracle-checkable form: one side is
    * broadcast, so the corpus is scanned once and the candidate generation is
    * an O(n²/2) comparison bounded by the broadcast side. At corpus sizes
    * where n² is no longer affordable, generate candidates with the
    * hyperplane-LSH bucketing of [[lshTopK]] (key-equality join, ~linear) and
    * apply exactly this cosine+threshold verify to the candidate pairs —
    * same verify expression, approximate recall.
    */
  def cosineNearDupPairs(df: DataFrame, minCosine: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = Par.spread(df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("_va")))
    val b = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("_vb"))
    val pairs = a.join(broadcast(b), col("id_a") < col("id_b"))
    pairs
      .withColumn("sim", round(graft.plans.GraftFunctions.cosine(pairs, col("_va"), col("_vb")), 6))
      .filter(col("sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Approximate cosine top-k via multi-table hyperplane LSH: queries and
    * candidates are bucketed; only same-(table,bucket) pairs are scored.
    * Returns at most k neighbors per query (fewer if recall misses).
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int, dim: Int,
              tables: Int = 8, bits: Int = 10, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val base = Par.spread(df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs)))
      // native single-pass bucketing; lshBuckets is the composable form
      base
        .withColumn("_bks",
          graft.plans.GraftFunctions.hyperplaneBuckets(base, col(vecAs), dim, tables, bits, seed))
        .select(col(idAs), col(vecAs), posexplode(col("_bks")).as(Seq("table", "bucket")))
    }
    val q = bucketed(queries, "query_id", "_qv")
    val c = Par.materialize(bucketed(candidates, "neighbor_id", "_cv"))
    val cand = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("sim", graft.plans.GraftFunctions.cosine(cand, col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim"))
  }
}

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

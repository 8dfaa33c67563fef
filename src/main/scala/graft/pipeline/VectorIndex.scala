package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.functions.Similarity
import graft.sources.ManifestStore

/** A MAINTAINED semantic-dedup index: the hyperplane-LSH bucket postings
  * and normalized vectors of the admitted corpus, persisted as two
  * [[ManifestStore]] tables. This is the production loop behind q120 —
  * instead of re-deriving the corpus index per batch
  * ([[Similarity.admitVectorBatch]]), each daily batch PROBES the
  * persisted postings, and only the admitted vectors append:
  *
  * {{{
  * val admitted = VectorIndex.admitAndAppend(spark, dir, batch, minCosine = 0.4, dim = 64)
  * }}}
  *
  * Invariants (spec-pinned in VectorIndexSpec):
  *  - the persisted-index admission equals [[Similarity.admitVectorBatch]]
  *    over the equivalent in-memory corpus at every step — the index is a
  *    cache of work, never a change of semantics;
  *  - same seeded hyperplanes everywhere, so postings written at ingest
  *    time keep serving probes for the table's lifetime;
  *  - appends go through manifest commits: concurrent batches both land
  *    (optimistic re-base), readers stay snapshot-isolated, and the
  *    postings/vector tables vacuum/compact like any other table.
  *
  * Scale: the postings table is the only thing a batch joins —
  * |corpus| × tables rows of two longs, bucketed by `_tb` under
  * compaction; admission cost is ∝ |batch| × bucket occupancy,
  * independent of corpus size, and the corpus vectors are read only for
  * the candidate ids the bucket join survives.
  */
object VectorIndex {

  val postingsSchema: StructType = StructType.fromDDL("_id BIGINT, _tb BIGINT")
  val vectorsSchema: StructType = StructType.fromDDL("_id BIGINT, _v ARRAY<DOUBLE>")

  /** `buckets > 0` declares a `bucket(buckets, _tb)` hidden-partition
    * layout on the postings table (see
    * [[graft.pipeline.ShingleIndex.Params]] — same sizing rule, same
    * spec-pinned semantics-identity with the unpartitioned layout).
    */
  /** `idBuckets > 0` bucket-partitions the VECTORS table on `_id` — the
    * exact-verification side (see [[graft.pipeline.ShingleIndex.Params]]:
    * without it, candidate-id pruning can prove nothing against
    * hash-spread files and verification re-scans every corpus vector per
    * batch). Same spec-pinned semantics-identity as `buckets`.
    */
  final case class Params(dim: Int, tables: Int = 48, bits: Int = 4,
                          seed: Long = 42L, maxBucket: Int = 100000,
                          buckets: Int = 0, idBuckets: Int = 0)

  private def postingsDir(dir: String) = s"$dir/postings"
  private def vectorsDir(dir: String) = s"$dir/vectors"

  /** The persisted postings table (empty frame before the first append). */
  def postings(spark: SparkSession, dir: String): DataFrame =
    ManifestStore.read(spark, postingsDir(dir), postingsSchema)

  /** The persisted vectors table (empty frame before the first append). */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    ManifestStore.read(spark, vectorsDir(dir), vectorsSchema)

  /** Append `batch`'s vectors to the index UNCONDITIONALLY (bootstrap or
    * pre-deduped input): normalized vectors + their bucket postings, one
    * manifest commit per table.
    */
  def append(spark: SparkSession, dir: String, batch: DataFrame, p: Params,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val prepped = Similarity.prepVectors(batch, idCol, vecCol)
    if (!prepped.isEmpty) {
      if (p.idBuckets > 0)
        ManifestStore.appendPartitioned(prepped, vectorsDir(dir),
          Seq(s"bucket(${p.idBuckets},_id)")): Unit
      else
        ManifestStore.append(prepped, vectorsDir(dir)): Unit
      val postings =
        Similarity.bucketPostings(prepped, p.dim, p.tables, p.bits, p.seed)
      if (p.buckets > 0)
        ManifestStore.appendPartitioned(postings, postingsDir(dir),
          Seq(s"bucket(${p.buckets},_tb)")): Unit
      else
        ManifestStore.append(postings, postingsDir(dir)): Unit
    }
  }

  /** The batch rows that survive semantic admission against the PERSISTED
    * index (plus the batch's own internal pairs) — pure read, no index
    * mutation. Equals [[Similarity.admitVectorBatch]] over the corpus the
    * index currently holds.
    */
  def admit(spark: SparkSession, dir: String, batch: DataFrame,
            minCosine: Double, p: Params,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // pruned readers (see ShingleIndex.admit): probe keys / candidate ids
    // become file predicates; above the collect cap → full table; results
    // identical either way (every join re-keys the rows)
    val postingsFor: Option[Array[Long]] => DataFrame = {
      case Some(keys) => ManifestStore.readAnyOf(
        spark, postingsDir(dir), postingsSchema, "_tb", keys)
      case None => postings(spark, dir)
    }
    val vectorsFor: Option[Array[Long]] => DataFrame = {
      case Some(ids) => ManifestStore.readAnyOf(
        spark, vectorsDir(dir), vectorsSchema, "_id", ids)
      case None => vectors(spark, dir)
    }
    // prune the defensive ids-disjoint scan by the batch's own ids (see
    // ShingleIndex.admit — superset-correct, cap degrades to full scan)
    val exIds = graft.functions.Par.collectLongsBounded(
        batch.select(col(idCol).cast("long")).distinct()) match {
      case Some(ids) => ManifestStore.readAnyOf(
        spark, vectorsDir(dir), vectorsSchema, "_id", ids).select(col("_id"))
      case None => vectors(spark, dir).select(col("_id"))
    }
    Similarity.admitVectorBatchStored(postingsFor, vectorsFor, exIds, batch,
      minCosine, p.dim, p.tables, p.bits, p.seed, p.maxBucket, idCol, vecCol)
  }

  /** One maintenance step: admit the batch, append the survivors, return
    * them. The admitted set is materialized BEFORE the append so the
    * admission snapshot cannot see its own batch's postings.
    */
  def admitAndAppend(spark: SparkSession, dir: String, batch: DataFrame,
                     minCosine: Double, p: Params,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val admitted = graft.functions.Par.materialize(
      admit(spark, dir, batch, minCosine, p, idCol, vecCol))
    append(spark, dir, admitted, p, idCol, vecCol)
    admitted
  }
}

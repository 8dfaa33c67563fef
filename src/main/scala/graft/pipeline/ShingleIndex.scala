package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.types.StructType

import graft.functions.NearDup
import graft.sources.ManifestStore

/** A MAINTAINED lexical near-dup index: the shingle-fingerprint postings
  * and per-document shingle sets of the admitted corpus, persisted as two
  * [[ManifestStore]] tables — the Jaccard twin of [[VectorIndex]], and the
  * production loop behind q55. Instead of re-shingling the whole corpus
  * per batch ([[NearDup.admitBatch]] derives the index from `existing` on
  * the fly), each daily batch PROBES the persisted postings and only the
  * admitted documents append:
  *
  * {{{
  * val admitted = ShingleIndex.admitAndAppend(spark, dir, batch, p)
  * }}}
  *
  * Invariants (spec-pinned in ShingleIndexSpec):
  *  - persisted-index admission equals [[NearDup.admitBatch]] over the
  *    equivalent in-memory corpus at every maintenance step — the index is
  *    a cache of work, never a change of semantics;
  *  - the postings are exactly the exploded shingle sets, so candidates
  *    written at ingest time keep serving probes for the table's lifetime;
  *  - appends go through manifest commits: concurrent batches both land
  *    (optimistic re-base), readers stay snapshot-isolated, and the tables
  *    vacuum/compact like any other manifest table.
  *
  * Scale: per batch, the batch's exploded fingerprints equi-join the
  * postings table on 8-byte keys (hot keys pruned corpus-side) — cost
  * ∝ |batch| × bucket occupancy, independent of corpus size; the shingle
  * sets are read only to exact-verify surviving candidate pairs. The
  * corpus documents themselves are NOT stored here — the index carries
  * fingerprints only, so it stays a small fraction of corpus bytes.
  */
object ShingleIndex {

  val postingsSchema: StructType = StructType.fromDDL("_id BIGINT, _h BIGINT")
  val shinglesSchema: StructType = StructType.fromDDL("_id BIGINT, _sh ARRAY<BIGINT>")

  /** `buckets > 0` declares a `bucket(buckets, _h)` hidden-partition
    * layout on the postings table: each append lands one file per touched
    * bucket (the partitioned writer hash-clusters first), and admission
    * derives partition predicates from the batch's probe keys so the
    * postings SCAN prunes whole files — the deployment sizing rule is
    * buckets ≈ corpusPostingsBytes / targetFileBytes, making per-batch
    * postings I/O saturate at |batch keys| × targetFileBytes regardless
    * of corpus size. 0 (default) keeps the unpartitioned layout; the
    * admission SEMANTICS are identical either way (spec-pinned).
    *
    * Pick by the measured crossover (BASELINE.md §Round 13): the flat
    * layout's contiguous scan WINS while corpusBytes / scanThroughput <
    * |batch keys| × perFileCost (both sides measured at the sf100-scale
    * decade); beyond it the bucketed layout's cost is saturated —
    * ∝ batch keys, corpus-independent — which is the 100 TB regime.
    */
  /** `idBuckets > 0` is the same declaration for the SHINGLES table, keyed
    * on `_id` — the exact-verification side. Without it a hash-spread
    * write leaves every shingles file spanning the full id range, so the
    * candidate-id `readAnyOf` can prove nothing and exact verification
    * re-scans the whole corpus's shingle sets per batch (the second
    * residual ∝-corpus term the round-13 admission probe measured); with
    * it, verification reads ≈ |candidate ids| files regardless of corpus
    * size. Same semantics-identity pin as `buckets`.
    */
  final case class Params(n: Int = 3, minJaccard: Double = 0.5,
                          maxBucket: Int = 1000, buckets: Int = 0,
                          idBuckets: Int = 0)

  private def postingsDir(dir: String) = s"$dir/postings"
  private def shinglesDir(dir: String) = s"$dir/shingles"

  /** The persisted postings table (empty frame before the first append). */
  def postings(spark: SparkSession, dir: String): DataFrame =
    ManifestStore.read(spark, postingsDir(dir), postingsSchema)

  /** The persisted per-document shingle sets. */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    ManifestStore.read(spark, shinglesDir(dir), shinglesSchema)

  /** Append `batch`'s fingerprints to the index UNCONDITIONALLY (bootstrap
    * or pre-deduped input): shingle sets + their exploded postings, one
    * manifest commit per table.
    */
  def append(spark: SparkSession, dir: String, batch: DataFrame, p: Params,
             idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val sh = NearDup.shingleDocs(batch, textCol, idCol, p.n)
    if (!sh.isEmpty) {
      if (p.idBuckets > 0)
        ManifestStore.appendPartitioned(sh, shinglesDir(dir),
          Seq(s"bucket(${p.idBuckets},_id)")): Unit
      else
        ManifestStore.append(sh, shinglesDir(dir)): Unit
      val postings = sh.select(col("_id"), explode(col("_sh")).as("_h"))
      if (p.buckets > 0)
        ManifestStore.appendPartitioned(postings, postingsDir(dir),
          Seq(s"bucket(${p.buckets},_h)")): Unit
      else
        ManifestStore.append(postings, postingsDir(dir)): Unit
    }
  }

  /** The batch rows that survive Jaccard admission against the PERSISTED
    * index (plus the batch's own internal pairs) — pure read, no index
    * mutation. Equals [[NearDup.admitBatch]] over the corpus the index
    * currently holds.
    */
  def admit(spark: SparkSession, dir: String, batch: DataFrame, p: Params,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // pruned readers: the batch's probe keys / the candidates' corpus ids
    // become FILE predicates (bucket-layout partition values when declared,
    // min-max id stats always), so per-batch index I/O stops scaling with
    // the corpus; above the bounded-collect cap each degrades to the full
    // table — identical results either way (every join re-keys the rows)
    val postingsFor: Option[Array[Long]] => DataFrame = {
      case Some(keys) => ManifestStore.readAnyOf(
        spark, postingsDir(dir), postingsSchema, "_h", keys)
      case None => postings(spark, dir)
    }
    val shinglesFor: Option[Array[Long]] => DataFrame = {
      case Some(ids) => ManifestStore.readAnyOf(
        spark, shinglesDir(dir), shinglesSchema, "_id", ids)
      case None => shingles(spark, dir)
    }
    // the defensive ids-disjoint anti-join needs only corpus rows whose
    // _id ∈ batch ids — prune the shingles scan by the batch's own ids
    // (superset-correct by the same pruneFilesAnyOf guarantee the
    // candidate path relies on; cap overflow degrades to the full scan,
    // which previously ran unconditionally)
    val exIds = graft.functions.Par.collectLongsBounded(
        batch.select(col(idCol).cast("long")).distinct()) match {
      case Some(ids) => ManifestStore.readAnyOf(
        spark, shinglesDir(dir), shinglesSchema, "_id", ids).select(col("_id"))
      case None => shingles(spark, dir).select(col("_id"))
    }
    NearDup.admitBatchStored(postingsFor, shinglesFor, exIds,
      batch, textCol, idCol, p.n, p.minJaccard, p.maxBucket)
  }

  /** One maintenance step: admit the batch, append the survivors'
    * fingerprints, return the survivors. The admitted set is materialized
    * BEFORE the append so the admission snapshot cannot see its own
    * batch's postings.
    */
  def admitAndAppend(spark: SparkSession, dir: String, batch: DataFrame,
                     p: Params, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val admitted = graft.functions.Par.materialize(
      admit(spark, dir, batch, p, idCol, textCol))
    append(spark, dir, admitted, p, idCol, textCol)
    admitted
  }
}

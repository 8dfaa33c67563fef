package graft.functions

import org.apache.spark.sql.DataFrame

/** Parallelism control for compute-bound operators.
  *
  * A small input (one parquet file, a broadcast-sized dim) arrives in 1-2
  * scan partitions, which serializes CPU-heavy per-row work (shingling,
  * signatures, distance math) onto one core no matter how big the cluster
  * is. Candidate-generation operators therefore round-robin the input across
  * the session's shuffle parallelism first: one cheap exchange of the small
  * side buys full-width execution of the expensive expressions. On a large
  * input the scan already yields many splits and the exchange is noise
  * relative to the operator's own join/agg shuffles.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  /** Materialize an expensive, multiply-referenced intermediate (shingle
    * index, MinHash signatures, LSH buckets) exactly once. A self-join over a
    * derived table otherwise recomputes the derivation per join side — at
    * 100 TB that triples the most expensive map stage. Local checkpoint cuts
    * the lineage and serves both sides from materialized blocks; in a
    * production cluster the same role is played by persisting the signature
    * table to storage (or `persist(MEMORY_AND_DISK)`), which is also what
    * survives executor loss — swap here if dynamic allocation is on.
    */
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint()
}

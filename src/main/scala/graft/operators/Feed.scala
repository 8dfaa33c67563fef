package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The mock feed's query semantics (reference M-1…M-4;
  * `services/mock_wms_api/app/main.py:218-252`): the reference's only "query
  * engine" is Sort → strict-> timestamp Filter → limit/offset Paginate →
  * envelope Project, recomputed per request.
  *
  * Scale notes: `changedSince` pushes the predicate into the scan (parquet
  * `PushedFilters`), so an incremental pull reads only matching row groups /
  * partitions. Pagination uses Spark's native `offset`/`limit`, which plan as
  * a global sort + limit — fine for feed-sized pages; deep offsets at 100 TB
  * should instead use keyset pagination ([[pageAfter]]), which stays a
  * pushed-down filter + top-k and never materializes a global row numbering.
  */
object Feed {

  /** M-1 — total order by `(updated_at, id)` (`main.py:224,243`). The
    * reference compares ISO strings; we compare native timestamps (SURVEY.md
    * §8 Q-5 — equivalent for fixed-format UTC, and correct in general).
    */
  def ordered(df: DataFrame, tsCol: String = "updated_at", idCol: String = "id"): DataFrame =
    df.orderBy(col(tsCol).asc, col(idCol).asc)

  /** M-2 — strictly-greater incremental filter (`main.py:227-228,246-247`). */
  def changedSince(df: DataFrame, cursor: Column, tsCol: String = "updated_at"): DataFrame =
    df.filter(col(tsCol) > cursor)

  /** M-3 — limit/offset page over the sorted, filtered set
    * (`main.py:232,250`; bounds `limit ∈ [1,500]`, `offset ≥ 0` at 221-222).
    */
  def page(df: DataFrame, limit: Int, offset: Int,
           tsCol: String = "updated_at", idCol: String = "id"): DataFrame = {
    require(limit >= 1, s"limit must be >= 1, got $limit")
    require(offset >= 0, s"offset must be >= 0, got $offset")
    ordered(df, tsCol, idCol).offset(offset).limit(limit)
  }

  /** Keyset ("seek") pagination — the scalable replacement for M-3: resume
    * strictly after the last seen `(ts, id)` key. Plans as pushed-down filter
    * + TakeOrderedAndProject (top-k per partition, k-merge on the driver);
    * no global sort, no offset scan.
    */
  def pageAfter(df: DataFrame, lastTs: Column, lastId: Column, limit: Int,
                tsCol: String = "updated_at", idCol: String = "id"): DataFrame =
    df.filter(col(tsCol) > lastTs || (col(tsCol) === lastTs && col(idCol) > lastId))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .limit(limit)

  /** M-4 — page envelope metadata: `count` is the TOTAL filtered count, not
    * the page size (`main.py:231-234,249-252`).
    */
  def envelope(filtered: DataFrame, limit: Int, offset: Int): DataFrame =
    filtered.agg(count(lit(1)).as("count"))
      .select(lit(limit).as("limit"), lit(offset).as("offset"), col("count"))
}

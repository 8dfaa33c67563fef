package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical payload projection + content hash (reference O-10;
  * `services/staging/app/payload.py:13-28`).
  *
  * The reference drops `_`-prefixed lineage columns, serializes the remaining
  * row to canonical JSON (`sort_keys=True`, separators `(",",":")`,
  * non-ASCII preserved) and takes `sha256(payload)`. Spark's
  * `to_json(struct(...))` with alphabetically ordered fields produces the
  * same compact, key-sorted form (Jackson emits no whitespace), and
  * `sha2(_, 256)` the same hex digest — both codegen'd built-ins, no UDF.
  *
  * Note: the reference's `_normalize_for_json` has a missing `return`
  * (`payload.py:5-11`) that nulls every non-timestamp scalar in the payload —
  * a defect, not a semantic (SURVEY.md §8 Q-1). We preserve values.
  */
object Payload {

  /** Columns participating in the payload: everything not `_`-prefixed,
    * alphabetically sorted — `payload.py:15-19` (sort via `sort_keys=True`).
    */
  def payloadCols(df: DataFrame): Seq[String] =
    df.columns.filterNot(_.startsWith("_")).sorted.toSeq

  /** Canonical JSON text of the non-meta columns of each row.
    * `ignoreNullFields=false`: the reference's `json.dumps` emits
    * `"field":null` for null values, and Spark's default would DROP the
    * field — same row, different payload text, different sha256, and the
    * (id, updated_at, payload_hash) conflict key would never match
    * reference-written history for any null-bearing row.
    */
  def canonicalJson(df: DataFrame): Column =
    to_json(struct(payloadCols(df).map(col): _*),
      Map("ignoreNullFields" -> "false"))

  /** O-10 — append `payload` (canonical JSON) and `payload_hash`
    * (sha256 hex) columns. Pure projection: map-side, codegen, no shuffle.
    */
  def withPayloadAndHash(df: DataFrame): DataFrame =
    df.withColumn("payload", canonicalJson(df))
      .withColumn("payload_hash", sha2(col("payload"), 256))
}

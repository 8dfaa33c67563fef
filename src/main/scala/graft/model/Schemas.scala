package graft.model

import org.apache.spark.sql.types._

/** Entity + control-table schemas for the WMS pipeline rebuild.
  *
  * Sources (reference, read-only): the pydantic models at
  * `services/mock_wms_api/app/main.py:49-114` and the warehouse DDL at
  * `sql/init_dw.sql:2-77`. Timestamps are `TimestampType` with the session
  * time zone pinned to UTC (build.sbt), matching the reference's
  * everything-to-UTC normalization (`services/extractor/app/normalize.py:6-9`).
  * Spark has no UUID type, so `id` is `StringType`
  * (`sql/init_dw.sql:32` uses Postgres `uuid`).
  */
object Schemas {

  /** `lines` element for inbound receipts — `mock_wms_api/app/main.py:49-55`. */
  val ibLine: StructType = StructType(Seq(
    StructField("line_id", StringType),
    StructField("product_id", LongType),
    StructField("sku", StringType),
    StructField("qty_unit_id", LongType),
    StructField("expected_qty", LongType),
    StructField("actual_qty", LongType)))

  /** `lines` element for outbound orders — `mock_wms_api/app/main.py:81-86`. */
  val obLine: StructType = StructType(Seq(
    StructField("line_id", StringType),
    StructField("product_id", LongType),
    StructField("sku", StringType),
    StructField("qty", LongType)))

  /** Inbound receipt — `mock_wms_api/app/main.py:58-78`. */
  val ibReceipt: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("po_code", StringType),
    StructField("po_date", StringType), // raw API shape; O-5 coerces to date
    StructField("status", StringType),
    StructField("note", StringType),
    StructField("processed_by", StringType),
    StructField("contact_name", StringType),
    StructField("contact_phone", StringType),
    StructField("client_id", LongType),
    StructField("warehouse_id", LongType),
    StructField("created_by", StringType),
    StructField("created_at", StringType),
    StructField("updated_by", StringType),
    StructField("updated_at", StringType),
    StructField("finished_at", StringType),
    StructField("lines", ArrayType(ibLine))))

  /** Outbound order — `mock_wms_api/app/main.py:88-114`. */
  val obOrder: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("so_code", StringType),
    StructField("expected_delivery_date", StringType),
    StructField("actual_delivery_date", StringType),
    StructField("customer_id", LongType),
    StructField("shipping_address_id", LongType),
    StructField("total_amount", DoubleType),
    StructField("actual_amount", DoubleType),
    StructField("note", StringType),
    StructField("client_id", LongType),
    StructField("warehouse_id", LongType),
    StructField("status", StringType),
    StructField("total_cod_amount", DoubleType),
    StructField("total_weight", DoubleType),
    StructField("total_volume", DoubleType),
    StructField("created_by", StringType),
    StructField("created_at", StringType),
    StructField("updated_by", StringType),
    StructField("updated_at", StringType),
    StructField("lines", ArrayType(obLine))))

  /** Valid IB statuses — `mock_wms_api/app/main.py:31-35`. */
  val ibStatuses: Seq[String] = Seq("NEW", "PROCESSING", "FINISHED", "CANCELLED")

  /** Valid OB statuses — `mock_wms_api/app/main.py:38-45`. */
  val obStatuses: Seq[String] =
    Seq("NEW", "READYTOPICK", "PICKING", "PICKED", "PACKING", "PACKED", "CANCELLED")

  /** Watermark control table — `sql/init_dw.sql:2-9`. */
  val watermark: StructType = StructType(Seq(
    StructField("pipeline_name", StringType, nullable = false),
    StructField("entity", StringType, nullable = false),
    StructField("last_success_time", TimestampType),
    StructField("last_success_run_id", StringType),
    StructField("updated_at", TimestampType)))

  /** Run/audit log — `sql/init_dw.sql:15-26`. */
  val runLog: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("pipeline_name", StringType),
    StructField("entity", StringType),
    StructField("started_at", TimestampType),
    StructField("ended_at", TimestampType),
    StructField("status", StringType),
    StructField("rows_in", LongType),
    StructField("rows_inserted_history", LongType),
    StructField("rows_upserted_latest", LongType),
    StructField("error", StringType)))

  /** Lineage metadata columns injected by O-8 — `normalize.py:60-62`. */
  val metaCols: Seq[String] = Seq("_run_id", "_extracted_at", "_watermark_effective")

  /** Columns the staging reader requires — `reader_landing.py:17-20`. */
  val stagingRequired: Seq[String] = Seq("id", "updated_at", "_run_id", "_extracted_at")
}

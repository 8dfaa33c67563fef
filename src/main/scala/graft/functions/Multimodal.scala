package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns next to typed metadata — the
  * Spark-side contract (schema, partitioning, batch shape) is real and
  * tested; the actual codec work is STUBBED with a deterministic fake
  * (`fakeDecodeFeatures`) because no image/audio libraries exist in this
  * container. On a real cluster the stub body is replaced by a vectorized
  * decode (e.g. JNI/FFI per partition) behind the same column signature, so
  * nothing downstream changes.
  *
  * Scale notes: binaries stay columnar in parquet; never `collect` them.
  * Feature extraction is a map-side projection; partition sizing should be
  * driven by `spark.sql.files.maxPartitionBytes` since rows are wide.
  */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  def nBytes(content: Column): Column = octet_length(content)

  def contentHash(content: Column): Column = sha2(content, 256)

  /** First `n` bytes as hex — the "magic number" header sniff. */
  def headerHex(content: Column, n: Int = 8): Column = hex(substring(content, 1, n))

  /** STUB decode → feature vector. Deterministic fake standing in for a real
    * image/audio decoder (none available offline): 8 doubles derived from
    * content hash chunks, normalized to [0,1). Replace the body — not the
    * signature — with a real decoder on a cluster with codec libraries.
    */
  def fakeDecodeFeatures(content: Column, dims: Int = 8): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => pmod(xxhash64(content, i), lit(1000000L)).cast("double") / lit(1000000.0))

  /** STUB resize: real implementation re-encodes pixels; the fake keeps the
    * byte-stream contract by truncating to a target budget proportional to
    * the pixel count, and rewrites the metadata — which is the real part.
    */
  def fakeResize(content: Column, meta: Column, w: Int, h: Int): Column =
    struct(
      substring(content, 1, 4096).as("content"),
      meta.withField("width", lit(w)).withField("height", lit(h)).as("meta"))

  /** Frame sampling: every `stride`-th fixed-size chunk of the byte stream —
    * the real plumbing for video frame extraction (offsets, batch shape);
    * a real decoder swaps byte-chunking for keyframe indices.
    */
  def frameSample(content: Column, frameBytes: Int, stride: Int, maxFrames: Int): Column =
    filter(
      array((0 until maxFrames).map { i =>
        substring(content, i * frameBytes * stride + 1, frameBytes)
      }: _*),
      f => octet_length(f) > 0)

  /** Full featurize projection over a media table. */
  def featurize(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumns(Map(
      "n_bytes" -> nBytes(col(contentCol)),
      "content_hash" -> contentHash(col(contentCol)),
      "header_hex" -> headerHex(col(contentCol)),
      "features" -> fakeDecodeFeatures(col(contentCol))))

  final case class MediaRow(media_id: Long, content: Array[Byte])
  final case class DecodedRow(media_id: Long, n_bytes: Int, features: Array[Double])

  /** Batched decode via `mapPartitions` — the Scala analog of a vectorized
    * pandas-UDF decode: each partition's rows are grouped into fixed-size
    * batches and handed to the decoder whole, the shape a native/FFI codec
    * wants (amortized setup, contiguous buffers). The decoder body is the
    * STUB; the batching, schema, and encoder plumbing are the real contract.
    */
  def decodeBatched(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("content")).as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatchStub))
      .toDF()
  }

  /** STUB batch decoder: deterministic features from the content bytes.
    * A real implementation passes the batch to an image/audio codec.
    */
  private def decodeBatchStub(batch: Seq[MediaRow]): Seq[DecodedRow] =
    batch.map { m =>
      val h = java.util.Arrays.hashCode(m.content)
      DecodedRow(m.media_id, m.content.length,
        Array.tabulate(8)(i => ((h.toLong * (i + 1)) & 0xFFFFFFL).toDouble / 0xFFFFFF))
    }
}

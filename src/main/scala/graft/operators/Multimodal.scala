package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata (SURVEY.md §2.D12).
  *
  * The Spark-side plumbing is the real deliverable and is fully
  * implemented and tested: schema, batched per-partition execution,
  * partition sizing, and typed Dataset signatures. The media DECODE
  * kernels are deterministic STUBS — the container has no image/audio
  * libraries — marked `STUB:` below; swapping in a real decoder changes
  * only the kernel body, not the distributed shape.
  *
  * Scale notes (§5): binary payloads dominate row size, so the media scan
  * is split by `files.maxPartitionBytes` like any parquet scan; feature
  * extraction is `mapPartitions` over an iterator — nothing materializes a
  * partition in memory, and `batch`ing amortizes per-batch decoder setup
  * (model load, JNI session) exactly like mapInPandas batches do in the
  * Python stack.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte],
                      byte_len: Long, width: Int, height: Int)

  /** Fixed-dim feature vector per media row (ANN-ready: feeds the same
    * embedding-similarity operators as the `embeddings` table).
    */
  case class MediaFeature(doc_id: Long, media_type: String,
                          feature: Array[Float])

  /** Build a media table over the documents corpus: payload = UTF-8 bytes
    * of the text (deterministic stand-in for real image bytes), metadata
    * derived from the payload. In production this is `spark.read.format
    * ("binaryFile")` or parquet with a binary column — same schema.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image/png"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      length(col("text")).cast("long").as("byte_len"),
      (pmod(col("doc_id"), lit(4)) * 160 + lit(320)).cast("int").as("width"),
      (pmod(col("doc_id"), lit(3)) * 120 + lit(240)).cast("int").as("height"))

  /** Decode + feature-extract, batched per partition. Typed Dataset in and
    * out; executors stream batches of `batchSize` rows through the decode
    * kernel.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch decoder setup would happen here (model/JNI load)
          batch.iterator.map { case (id, mt, bytes) =>
            MediaFeature(id, mt, decodeToFeatures(bytes, dim))
          }
        }
      }
  }

  /** Resize contract: binary in, binary out, metadata updated in the same
    * row. Runs as a codegen-friendly projection (the kernel is a scalar
    * function of the payload).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("content"),
      col("byte_len"), col("width"), col("height"))
      .as[MediaRow]
      .map(r => r.copy(content = resizeKernel(r.content, r.width, r.height, w, h),
        width = w, height = h))
      .toDF()
  }

  /** Frame sampling contract: one video row explodes to `frames` frame
    * rows (doc_id, frame_no, frame binary). Distributed fan-out happens in
    * the engine (flatMap), never on the driver.
    */
  def sampleFrames(media: DataFrame, frames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "video/mp4")
      .select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (0 until frames).map(i => (id, i, frameKernel(bytes, i, frames)))
      }
      .toDF("doc_id", "frame_no", "frame")
  }

  // ---- kernels (STUBS standing in for absent media libraries) -----------

  /** STUB: stands in for image/audio decode + embed (e.g. JPEG decode →
    * CNN features). Deterministic: strided FNV-1a folds of the payload,
    * scaled to [-1, 1]. Same signature a real kernel would have.
    */
  private[operators] def decodeToFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      var h = VectorOps.fnv1a64(Array(d.toByte))
      var i = d
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L
        i += dim
      }
      out(d) = (h.toDouble / Long.MaxValue.toDouble).toFloat
      d += 1
    }
    out
  }

  /** STUB: stands in for a real resample; keeps output size proportional
    * to the requested dimensions so downstream sizing logic is exercised.
    */
  private[operators] def resizeKernel(bytes: Array[Byte], w0: Int, h0: Int,
                                      w: Int, h: Int): Array[Byte] = {
    val outLen = math.max(1, (bytes.length.toLong * (w.toLong * h) /
      math.max(1L, w0.toLong * h0)).toInt)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = bytes(i % math.max(1, bytes.length)); i += 1 }
    out
  }

  /** STUB: stands in for keyframe extraction — returns the i-th of
    * `frames` equal slices of the payload.
    */
  private[operators] def frameKernel(bytes: Array[Byte], i: Int, frames: Int): Array[Byte] = {
    val step = math.max(1, bytes.length / frames)
    bytes.slice(i * step, math.min(bytes.length, (i + 1) * step))
  }
}

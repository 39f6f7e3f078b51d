package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * frame-sampling as per-partition batch operators.
  *
  * The *decode* step is a clearly-marked deterministic STUB (no codec
  * libraries exist in this environment); everything Spark-owned — schema,
  * encoders, partitioning, batch shape, the `mapPartitions` boundary where
  * a real decoder (JNI/FFmpeg/ImageIO) would slot in — is real and tested.
  * At scale this is the correct shape: payloads stay columnar binary in
  * parquet, the decoder runs once per executor-partition batch (amortizing
  * model/codec init), and only small feature vectors come back.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  case class MediaRecord(id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(id: Long, kind: String, nBytes: Int, features: Array[Float])

  /** Deterministic fake "media" table derived from `documents`: payload =
    * UTF-8 bytes of the text standing in for encoded media; metadata typed
    * and queryable. Real pipelines read such a table straight from
    * parquet (binary column + struct column). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(
        col("doc_id").as("id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("raw").as("format"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          (col("n_chars") * 40L).as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real implementation would decode the codec bytes
    * (JPEG/PCM/H.264) here; the stand-in computes a deterministic 16-bin
    * byte histogram, L1-normalized — same output shape (fixed-length
    * float feature vector) and same execution shape (per-partition batch
    * loop) as a real feature extractor. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(1, payload.length).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  /** Feature extraction over the media table: `mapPartitions` so codec /
    * model initialization (here: none — stub) happens once per partition,
    * not per row. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real decoder/model init would happen here, once per partition
      it.map(r => MediaFeatures(r.id, r.kind, r.payload.length, decodeStub(r.payload)))
    }
  }

  case class MediaResized(
      id: Long, kind: String, nBytesIn: Int, nBytesOut: Int, payload: Array[Byte])

  /** STUB resize: a real implementation would decode, rescale
    * (bilinear / sample-rate-convert) and re-encode; the stand-in
    * stride-samples the payload down to ≤ `maxBytes` bytes with
    * stride = ceilDiv(n, maxBytes), keeping the first byte of each
    * stride window. Output size ceilDiv(n, stride) is a pure function of
    * the input size, so the op is oracle-checkable end to end. */
  def resizeStub(payload: Array[Byte], maxBytes: Int): Array[Byte] = {
    val n = payload.length
    if (n <= maxBytes) payload
    else {
      val stride = (n + maxBytes - 1) / maxBytes
      val out = new Array[Byte]((n + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = payload(i * stride); i += 1 }
      out
    }
  }

  /** Batch resize over the media table — same per-partition execution
    * shape as [[extractFeatures]]. */
  def resize(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val out = resizeStub(r.payload, maxBytes)
        MediaResized(r.id, r.kind, r.payload.length, out.length, out)
      }
    }
  }

  /** Frame sampling: slice `n` evenly-spaced fixed-width "frames" out of a
    * video payload — pure binary expressions (substring on binary), no
    * decode needed, stays in codegen. */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    val len = length(col("payload"))
    media
      .select(col("id"), col("kind"), col("payload"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_no"))
      .withColumn("off",
        (col("frame_no") * greatest(len - frameBytes, lit(0)) / lit(math.max(1, n - 1))).cast("int"))
      .select(col("id"), col("kind"), col("frame_no"),
        col("payload").substr(col("off") + 1, lit(frameBytes)).as("frame"))
  }
}

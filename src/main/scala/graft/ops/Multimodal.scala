package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * frame-sampling as per-partition batch operators.
  *
  * Decode tiers. REAL codecs: binary PGM (Netpbm P5) via a byte-level
  * parser, RIFF/WAVE PCM and YUV4MPEG2 via chunk/frame walks, and —
  * genuinely COMPRESSED — PNG (zlib inflate + defilter), GIF (LZW +
  * palette resolve) and baseline JPEG (DCT + Huffman, flat-block-exact
  * at q=1.0 — see [[encodeJpeg]]) via the JDK's own `javax.imageio`
  * codecs. Only video codecs with no JDK decoder (H.264) keep
  * the clearly-marked deterministic STUB ([[decodeStub]]/[[resizeStub]]),
  * where everything Spark-owned — schema, encoders, partitioning, batch
  * shape, the `mapPartitions` boundary a JNI/FFmpeg decoder would slot
  * into — is real and tested. At scale this is the correct shape either
  * way: payloads stay columnar binary in parquet, the decoder runs once
  * per executor-partition batch (amortizing model/codec init), and only
  * small feature vectors come back.
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
    * (H.264-class codecs with no JDK decoder — PNG/GIF/JPEG/PGM/WAV/Y4M
    * have REAL decoders below) here; the stand-in computes a deterministic 16-bin
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

  // ── REAL image decode: Netpbm P5 (binary PGM) ───────────────────────
  // PGM is a genuine on-disk image format (ImageMagick/GIMP/Netpbm write
  // it) whose binary flavor needs no codec library — so unlike the
  // JPEG/H.264 stand-ins above, this path exercises the mapPartitions
  // decode boundary with an ACTUAL byte-level parser: header tokens
  // (magic / dims / maxval, #-comments skipped), then raw pixel bytes.

  case class PgmImage(id: Long, payload: Array[Byte])

  /** Encode a real P5 image: header + raw 8-bit pixels. Dimensions and
    * pixels are deterministic functions of `id` (pixel i =
    * (id·7 + i·13) mod 256) so feature oracles can recompute them in SQL
    * without parsing binary. */
  def encodePgm(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = (((id * 7 + i * 13) % 256) & 0xff).toByte
      i += 1
    }
    header ++ px
  }

  /** Parse a binary PGM for real: whitespace-delimited ASCII header
    * tokens with `#` comment lines, then `w·h` raw bytes. Returns
    * (width, height, pixels as 0-255 ints). */
  def decodePgm(b: Array[Byte]): (Int, Int, Array[Int]) = {
    var pos = 0
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\t' || c == '\r'
    def token(): String = {
      while (pos < b.length && isWs(b(pos))) pos += 1
      if (pos < b.length && b(pos) == '#') {
        while (pos < b.length && b(pos) != '\n') pos += 1
        return token()
      }
      val st = pos
      while (pos < b.length && !isWs(b(pos))) pos += 1
      new String(b, st, pos - st, "US-ASCII")
    }
    val magic = token()
    require(magic == "P5", s"not a binary PGM (magic $magic)")
    val w = token().toInt
    val h = token().toInt
    val maxv = token().toInt
    require(maxv == 255, s"only 8-bit PGM supported, maxval $maxv")
    pos += 1 // exactly one whitespace byte separates maxval from pixels
    require(b.length - pos >= w * h, "truncated pixel section")
    (w, h, Array.tabulate(w * h)(i => b(pos + i) & 0xff))
  }

  /** Nearest-neighbor ½× downscale: decode, keep every second pixel in
    * both axes (out dims = ceil(in/2)), re-encode as a valid PGM. */
  def resizePgmHalf(b: Array[Byte]): Array[Byte] = {
    val (w, h, px) = decodePgm(b)
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val header = s"P5\n$w2 $h2\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](w2 * h2)
    var j = 0
    while (j < out.length) {
      val y = j / w2; val x = j % w2
      out(j) = (px(2 * y * w + 2 * x) & 0xff).toByte
      j += 1
    }
    header ++ out
  }

  /** A table of REAL encoded PGM images, one per document id. */
  def pgmTable(spark: SparkSession, sfDir: String): Dataset[PgmImage] = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => PgmImage(id, encodePgm(id))))
  }

  /** [[encodePgm]] with a per-document BLUR variant: documents with
    * `id % 3 == 0` get flat 4-pixel runs (pixel i uses step ⌊i/4⌋
    * instead of i — a genuinely lower-frequency image), the rest keep
    * the sharp stride-13 texture. Same dims as [[encodePgm]]; still a
    * pure formula of `id` so the sharpness oracle recomputes in SQL. */
  def encodePgmMixedSharpness(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      val step = if (id % 3 == 0) i / 4 else i
      px(i) = (((id * 7 + step * 13) % 256) & 0xff).toByte
      i += 1
    }
    header ++ px
  }

  /** A REAL-bytes image corpus with mixed sharpness, one PGM per doc. */
  def pgmMixedTable(spark: SparkSession, sfDir: String): Dataset[PgmImage] = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => PgmImage(id, encodePgmMixedSharpness(id))))
  }

  /** Variance-of-Laplacian sharpness gate — the standard blur filter
    * for image-corpus curation (a blurred image has a low-variance
    * Laplacian response; OpenCV's `cv2.Laplacian(img).var()` idiom):
    * decode the REAL bytes, convolve the 4-neighbor Laplacian kernel
    * `4·p − left − right − up − down` over interior pixels, and release
    * exact integer sum/sum-of-squares plus the variance and a
    * threshold flag. Variance is computed as `(n·ss − s²) / n²` from
    * the exact BIGINT moments in ONE double division, so the SQL
    * oracle (which replays the pixel formula, never the bytes) lands
    * on the bit-identical double — no rounding step needed, the
    * [[pgmFeatures]] px_mean contract.
    *
    * Scale shape: per-partition decode + a row-local O(w·h) kernel, no
    * shuffle; moments are 8 numbers per image regardless of pixel
    * count, so the released frame is corpus-row-scale, never
    * pixel-scale. */
  def laplacianSharpness(
      images: Dataset[PgmImage],
      threshold: Double): DataFrame = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.map { img =>
        val (w, h, px) = decodePgm(img.payload)
        var s = 0L
        var ss = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val i = y * w + x
            val lap = 4L * px(i) - px(i - 1) - px(i + 1) - px(i - w) - px(i + w)
            s += lap
            ss += lap * lap
            x += 1
          }
          y += 1
        }
        val n = (w - 2).toLong * (h - 2)
        val varLap = (n * ss - s * s).toDouble / (n.toDouble * n)
        (img.id, w, h, n, s, ss, varLap, if (varLap >= threshold) 1 else 0)
      }
    }.toDF("doc_id", "width", "height", "n_interior", "lap_sum", "lap_ss",
      "var_lap", "sharp")
  }

  /** Decode features through the per-partition boundary: dimensions,
    * pixel count/sum/mean straight from the parsed bytes. */
  def pgmFeatures(images: Dataset[PgmImage]): DataFrame = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.map { img =>
        val (w, h, px) = decodePgm(img.payload)
        var s = 0L
        var i = 0
        while (i < px.length) { s += px(i); i += 1 }
        // mean left unrounded: both engines divide the same exact
        // integers, so the doubles are bit-identical without a round step
        (img.id, w, h, px.length, s, s.toDouble / px.length)
      }
    }.toDF("doc_id", "width", "height", "n_pix", "px_sum", "px_mean")
  }

  // ── REAL compressed image decode: PNG via javax.imageio ─────────────
  // PNG is a genuinely COMPRESSED codec (zlib/DEFLATE pixel streams,
  // CRC-checked chunks) and the JDK ships a full codec for it
  // (javax.imageio — pure JDK, zero new deps: the same constraint the
  // xlsx zip+StAX codec met). This retires the "compressed image formats
  // are stubs" caveat: the decode boundary below runs a real inflate +
  // defilter per image. Pixel i of image `id` is (id·5 + i·11) mod 256
  // (the [[encodePgm]] formula family), so feature oracles recompute in
  // SQL without touching bytes — compression makes the BYTE SIZE
  // encoder-dependent, so byte size is never an output column.

  /** Encode a real 8-bit grayscale PNG for image `id`:
    * w = 8 + id mod 9, h = 8 + id mod 7, pixel i = (id·5 + i·11) mod 256. */
  def encodePng(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, ((id * 5 + i * 11) % 256).toInt)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "png", bos)
    require(ok, "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Decode a PNG for real (ImageIO: chunk walk, zlib inflate, defilter)
    * → (width, height, band-0 samples row-major). */
  def decodePng(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    (w, h, Array.tabulate(w * h)(i => raster.getSample(i % w, i / w, 0)))
  }

  /** Real PNG decode features through the per-partition boundary — the
    * compressed-codec twin of [[pgmFeatures]]: per-document synthetic PNG
    * bytes round-trip encode → (inflate, defilter) decode, then
    * dimensions and pixel statistics from the decoded raster. ImageIO
    * cache config happens once per partition (the codec-init amortization
    * the boundary exists for). */
  def pngFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        // per-partition codec init: no disk-backed stream cache in tasks
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val (w, h, px) = decodePng(encodePng(id))
          var s = 0L
          var i = 0
          while (i < px.length) { s += px(i); i += 1 }
          (id, w, h, px.length, s, s.toDouble / px.length)
        }
      }
      .toDF("doc_id", "width", "height", "n_pix", "px_sum", "px_mean")
  }

  /** Nearest-neighbor ½× PNG downscale THROUGH the real codec: decode
    * (inflate+defilter), keep every second pixel in both axes, RE-ENCODE
    * as an actual PNG (filter+deflate) — the full decode→transform→encode
    * cycle a production image pipeline runs; [[resizePgmHalf]]'s
    * compressed twin. */
  def resizePngHalf(b: Array[Byte]): Array[Byte] = {
    val (w, h, px) = decodePng(b)
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val img = new java.awt.image.BufferedImage(
      w2, h2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var j = 0
    while (j < w2 * h2) {
      val y = j / w2; val x = j % w2
      raster.setSample(x, y, 0, px(2 * y * w + 2 * x))
      j += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "png", bos)
    require(ok, "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Decode features AFTER a real resize round trip: encode → decode →
    * half-scale → re-encode → decode again, all inside the partition
    * boundary — proves the executor-side ENCODE path on derived pixels,
    * not just synthetic input ([[pngFeatures]] covers that side). */
  def pngResizeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val (w, h, px) = decodePng(resizePngHalf(encodePng(id)))
          var s = 0L
          var i = 0
          while (i < px.length) { s += px(i); i += 1 }
          (id, w, h, px.length, s, s.toDouble / px.length)
        }
      }
      .toDF("doc_id", "width", "height", "n_pix", "px_sum", "px_mean")
  }

  /** Perceptual average-hash (aHash) over REAL decoded pixels: sample an
    * 8×8 nearest-neighbor grid (cell (i,j) ← source pixel
    * (i·h/8, j·w/8)), threshold each sample against the grid mean, emit
    * the 64 bits as a '0'/'1' string (a bitstring, not a BIGINT — bit 63
    * would overflow signed SQL integers). Identical images hash
    * identically; global brightness/contrast shifts preserve the
    * mean-relative bits — the classic cheap image near-dup key. */
  def aHashBits(w: Int, h: Int, px: Array[Int]): String = {
    val g = Array.tabulate(64) { k =>
      val i = k / 8; val j = k % 8
      px((i * h / 8) * w + (j * w / 8))
    }
    val mean = g.sum.toDouble / 64.0
    val sb = new StringBuilder(64)
    var k = 0
    while (k < 64) { sb += (if (g(k) > mean) '1' else '0'); k += 1 }
    sb.result()
  }

  /** Per-document image aHash through the decode boundary: document
    * `doc_id` carries image seed `doc_id % idMod` (a corpus with exact
    * re-posts — the web-scrape reality image dedup exists for), encoded
    * as REAL PGM bytes and decoded back before hashing. Returns
    * (doc_id, ahash). */
  def imageHashes(spark: SparkSession, sfDir: String, idMod: Int = 50): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, px) = decodePgm(encodePgm(id % idMod))
        (id, aHashBits(w, h, px))
      })
      .toDF("doc_id", "ahash")
  }

  // ── REAL audio decode: RIFF/WAVE PCM ────────────────────────────────

  /** Encode a real 16-bit mono PCM WAV: RIFF header, fmt chunk, data
    * chunk. Sample i = ((id·31 + i·17) mod 65536) − 32768, little-endian,
    * 8 kHz — deterministic so feature oracles recompute without bytes. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = 200 + (id % 100).toInt
    val rate = 8000
    val dataSize = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31 + i * 17) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** Parse a RIFF/WAVE container for real: chunk walk to `fmt ` and
    * `data`, 16-bit LE mono PCM. Returns (sampleRate, samples). */
  def decodeWav(b: Array[Byte]): (Int, Array[Int]) = {
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
    }
    require(ascii(4) == "RIFF", "not a RIFF container")
    bb.getInt() // riff size
    require(ascii(4) == "WAVE", "not a WAVE file")
    var rate = -1
    var samples: Array[Int] = null
    while (bb.remaining() >= 8 && (rate < 0 || samples == null)) {
      val tag = ascii(4)
      val size = bb.getInt()
      tag match {
        case "fmt " =>
          val fmt = bb.getShort(); val ch = bb.getShort()
          rate = bb.getInt()
          bb.getInt(); bb.getShort()
          val bits = bb.getShort()
          require(fmt == 1 && ch == 1 && bits == 16,
            s"only 16-bit mono PCM supported (fmt=$fmt ch=$ch bits=$bits)")
          bb.position(bb.position() + (size - 16))
        case "data" =>
          samples = Array.fill(size / 2)(bb.getShort().toInt)
        case _ => // skip unknown chunk (word-aligned)
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(rate > 0 && samples != null, "missing fmt/data chunk")
    (rate, samples)
  }

  // ── REAL video decode: YUV4MPEG2 (Y4M) ──────────────────────────────

  /** Encode a real Y4M clip: ASCII stream header, then per frame a FRAME
    * marker + raw C420 planes (w·h luma + w·h/2 chroma). Byte j of frame
    * k = (id·11 + k·7 + j·5) mod 256. */
  def encodeY4m(id: Long): Array[Byte] = {
    val w = 4 + (id % 4).toInt * 2
    val h = 4 + (id % 3).toInt * 2
    val frames = 2 + (id % 3).toInt
    val frameBytes = w * h * 3 / 2
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames * (marker.length + frameBytes))
    out.put(header)
    var k = 0
    while (k < frames) {
      out.put(marker)
      var j = 0
      while (j < frameBytes) {
        out.put((((id * 11 + k * 7 + j * 5) % 256) & 0xff).toByte)
        j += 1
      }
      k += 1
    }
    out.array()
  }

  /** Parse a Y4M stream for real: header parameter tokens (W/H/F/C...),
    * then FRAME-delimited raw planes. Returns (width, height, per-frame
    * luma-plane sums). */
  def decodeY4m(b: Array[Byte]): (Int, Int, Array[Long]) = {
    var pos = 0
    def line(): String = {
      val st = pos
      while (pos < b.length && b(pos) != '\n') pos += 1
      val s = new String(b, st, pos - st, "US-ASCII")
      pos += 1
      s
    }
    val header = line().split(' ')
    require(header(0) == "YUV4MPEG2", "not a Y4M stream")
    def param(p: Char): Option[String] =
      header.tail.find(_.head == p).map(_.tail)
    val w = param('W').get.toInt
    val h = param('H').get.toInt
    require(param('C').forall(_.startsWith("420")), "only C420 supported")
    val frameBytes = w * h * 3 / 2
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (pos < b.length) {
      require(line().startsWith("FRAME"), "missing FRAME marker")
      var s = 0L
      var j = 0
      while (j < w * h) { s += (b(pos + j) & 0xff); j += 1 } // luma plane
      sums += s
      pos += frameBytes
    }
    (w, h, sums.toArray)
  }

  /** Encode a Y4M clip with deterministic SCENE CUTS for shot-detection:
    * scene index s(k) = cumulative count of cut frames (frame k ≥ 1 is a
    * cut iff (id·13 + k·17) mod 5 = 0), and byte j of frame k =
    * (id·29 + s(k)·97 + j·3 + k) mod 256 — consecutive same-scene frames
    * drift by +1 per byte (small inter-frame motion), a cut jumps the
    * whole plane by +97 (new scene). */
  def encodeY4mShots(id: Long): Array[Byte] = {
    val w = 4 + (id % 3).toInt * 2
    val h = 4 + (id % 2).toInt * 4
    val frames = 6 + (id % 5).toInt
    val frameBytes = w * h * 3 / 2
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames * (marker.length + frameBytes))
    out.put(header)
    var k = 0
    var s = 0L
    while (k < frames) {
      if (k >= 1 && (id * 13 + k * 17) % 5 == 0) s += 1
      out.put(marker)
      var j = 0
      while (j < frameBytes) {
        out.put((((id * 29 + s * 97 + j * 3 + k) % 256) & 0xff).toByte)
        j += 1
      }
      k += 1
    }
    out.array()
  }

  /** Parse a Y4M stream keeping the full per-frame LUMA PLANES (not just
    * their sums) — the decode surface shot detection needs. */
  def decodeY4mLuma(b: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
    var pos = 0
    def line(): String = {
      val st = pos
      while (pos < b.length && b(pos) != '\n') pos += 1
      val s = new String(b, st, pos - st, "US-ASCII")
      pos += 1
      s
    }
    val header = line().split(' ')
    require(header(0) == "YUV4MPEG2", "not a Y4M stream")
    def param(p: Char): Option[String] =
      header.tail.find(_.head == p).map(_.tail)
    val w = param('W').get.toInt
    val h = param('H').get.toInt
    require(param('C').forall(_.startsWith("420")), "only C420 supported")
    val frameBytes = w * h * 3 / 2
    val planes = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    while (pos < b.length) {
      require(line().startsWith("FRAME"), "missing FRAME marker")
      planes += Array.tabulate(w * h)(j => b(pos + j) & 0xff)
      pos += frameBytes
    }
    (w, h, planes.toArray)
  }

  /** Shot-boundary detection over REAL decoded video: per consecutive
    * frame pair, the sum of absolute per-pixel luma differences; a cut is
    * a pair whose diff exceeds `threshold` per pixel. All-integer output
    * (diff SUM, not mean) so the oracle needs no float parity. One row
    * per (clip, frame ≥ 1); the whole decode + diff runs inside the
    * partition boundary — bytes never shuffle, output is O(frames) per
    * clip. The cut grid is the shot-segmentation input every video
    * training pipeline needs before frame sampling ([[sampleFrames]])
    * picks WITHIN shots rather than across them. */
  def shotDetect(spark: SparkSession, sfDir: String, threshold: Int = 30)
      : DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val (w, h, planes) = decodeY4mLuma(encodeY4mShots(id))
        (1 until planes.length).iterator.map { k =>
          var diff = 0L
          var j = 0
          while (j < w * h) {
            diff += math.abs(planes(k)(j) - planes(k - 1)(j))
            j += 1
          }
          (id, k, w, h, diff, if (diff > threshold.toLong * w * h) 1 else 0)
        }
      })
      .toDF("doc_id", "frame", "width", "height", "diff_sum", "is_cut")
  }

  /** Real WAV audio features through the per-partition boundary:
    * duration, amplitude sum, peak — straight from parsed PCM. */
  /** Encode arbitrary 16-bit mono PCM into a real RIFF/WAVE container —
    * the executor-side ENCODE path for audio derived on the cluster
    * (the [[resizePngHalf]] re-encode posture for sound). */
  def encodeWavPcm(rate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i).toShort); i += 1 }
    bb.array()
  }

  /** Halve the sample rate by plain decimation (keep every 2nd sample —
    * deterministic, no filter kernel to disagree about) and re-encode a
    * REAL WAV container from the derived samples. */
  def resampleWavHalf(b: Array[Byte]): Array[Byte] = {
    val (rate, samples) = decodeWav(b)
    val out = Array.tabulate((samples.length + 1) / 2)(i => samples(2 * i))
    encodeWavPcm(rate / 2, out)
  }

  /** Encode a WAV carrying a SQUARE-WAVE TONE of deterministic period
    * p(id) ∈ [8, 32] samples — the pitch-detection fixture. All-integer
    * samples (±amp), so the detector and its oracle share exact
    * arithmetic. */
  def encodeWavTone(id: Long): Array[Byte] = {
    val p = 8 + (id % 25).toInt
    val amp = 8000 + (id % 10).toInt * 100
    val n = 256 + (id % 64).toInt
    encodeWavPcm(8000,
      Array.tabulate(n)(i => if (i % p < p / 2) amp else -amp))
  }

  /** Pitch detection by integer autocorrelation over REAL decoded audio:
    * for each lag in [minLag, maxLag], R(lag) = Σ s[i]·s[i+lag] over the
    * overlapping samples; the detected period is the argmax (first/
    * smallest lag on ties). The classic pre-FFT pitch tracker — and
    * unlike a Goertzel/FFT bank it is ALL integer arithmetic, so the
    * DuckDB oracle reproduces it bit-for-bit with no float parity caveat.
    * Decode + the O(n·maxLag) scan run inside the partition boundary;
    * output is one narrow row per clip. */
  def pitchDetect(
      spark: SparkSession,
      sfDir: String,
      minLag: Int = 2,
      maxLag: Int = 40): DataFrame = {
    import spark.implicits._
    require(minLag >= 1 && maxLag > minLag, "need 1 <= minLag < maxLag")
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (rate, s) = decodeWav(encodeWavTone(id))
        var bestLag = -1
        var best = Long.MinValue
        var lag = minLag
        while (lag <= maxLag) {
          var r = 0L
          var i = 0
          while (i + lag < s.length) {
            r += s(i).toLong * s(i + lag)
            i += 1
          }
          if (r > best) { best = r; bestLag = lag }
          lag += 1
        }
        (id, s.length.toLong, rate.toLong, bestLag.toLong, best)
      })
      .toDF("doc_id", "n_samples", "sample_rate", "best_lag", "peak_corr")
  }

  /** Encode a WAV of alternating TONE BURSTS and near-silence — the VAD
    * (voice-activity-detection) fixture: sample i is "active" iff block
    * `(i/40 + id) mod 3 ≠ 0` (40-sample blocks, two of every three
    * active); active samples carry the full-scale sawtooth, silent ones
    * low-amplitude noise in [−50, 50]. All integer. */
  def encodeWavBursts(id: Long): Array[Byte] = {
    val n = 240 + (id % 60).toInt
    encodeWavPcm(8000, Array.tabulate(n) { i =>
      if ((i / 40 + id) % 3 != 0)
        (((id * 31 + i * 17) % 65536) - 32768).toInt
      else (((id * 7 + i * 13) % 101) - 50).toInt
    })
  }

  /** Energy-threshold VAD segmentation over REAL decoded audio: a
    * segment is a maximal run of samples with |s| > threshold; one row
    * per segment with its bounds, length, and peak — the
    * speech/music-detection cut video/audio pipelines run before
    * transcription or feature extraction. Runs are found in the DECODED
    * sample stream inside the partition boundary (the codec-boundary
    * imperative-scan posture of [[pitchDetect]]); output is O(segments)
    * per clip, all integer.
    *
    * Note the honest edge: a full-scale sawtooth sample occasionally
    * lands inside [−threshold, threshold] and splits a burst — the
    * detector reports what the SIGNAL does, and the oracle mirrors it
    * from the synthesis formula. */
  def vadSegments(
      spark: SparkSession,
      sfDir: String,
      threshold: Int = 100): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val (_, s) = decodeWav(encodeWavBursts(id))
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, Int, Int, Int, Int)]
        var seg = 0
        var i = 0
        while (i < s.length) {
          if (math.abs(s(i)) > threshold) {
            val start = i
            var peak = 0
            while (i < s.length && math.abs(s(i)) > threshold) {
              if (math.abs(s(i)) > peak) peak = math.abs(s(i))
              i += 1
            }
            out += ((id, seg, start, i - 1, i - start, peak))
            seg += 1
          } else i += 1
        }
        out.iterator
      })
      .toDF("doc_id", "seg", "start_i", "end_i", "len", "peak")
  }

  /** Audio features AFTER a real resample round trip: encode → decode →
    * decimate → RE-ENCODE (real container from executor-derived samples)
    * → decode again, all inside the partition boundary — the audio twin
    * of [[pngResizeFeatures]]. */
  def wavResampleFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (rate, samples) = decodeWav(resampleWavHalf(encodeWav(id)))
        var s = 0L; var peak = 0
        var i = 0
        while (i < samples.length) {
          s += samples(i)
          val a = math.abs(samples(i)); if (a > peak) peak = a
          i += 1
        }
        (id, samples.length, rate, s, peak, samples.length * 1000L / rate)
      })
      .toDF("doc_id", "n_samples", "sample_rate", "amp_sum", "peak",
        "duration_ms")
  }

  def wavFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (rate, samples) = decodeWav(encodeWav(id))
        var s = 0L; var peak = 0
        var i = 0
        while (i < samples.length) {
          s += samples(i)
          val a = math.abs(samples(i)); if (a > peak) peak = a
          i += 1
        }
        (id, samples.length, rate, s, peak,
          samples.length * 1000L / rate)
      })
      .toDF("doc_id", "n_samples", "sample_rate", "amp_sum", "peak", "duration_ms")
  }

  /** Real Y4M video features: frame count and per-clip luma statistics
    * from parsed planes. */
  def y4mFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, lumaSums) = decodeY4m(encodeY4m(id))
        (id, w, h, lumaSums.length, lumaSums.sum, lumaSums.min, lumaSums.max)
      })
      .toDF("doc_id", "width", "height", "n_frames",
        "luma_sum", "luma_min", "luma_max")
  }

  /** REAL mixed-modality feature extraction: each document id routes to a
    * genuine container format by `id % 3` (0 → PGM image, 1 → WAV audio,
    * 2 → Y4M video), is encoded as actual format bytes, and is decoded
    * back through the byte-level parsers above — all inside one
    * `mapPartitions` pass, the same decode-boundary shape a JPEG/H.264
    * pipeline would use. Emits a unified feature row per asset:
    * `units` = pixels / samples / frames, `val_sum` = pixel sum /
    * amplitude sum / luma sum. Deterministic payloads keep the whole op
    * SQL-oracle-checkable. */
  def realMediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaFeaturesOf(Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long])
  }

  /** The mixed-modality decode core over ANY id column — batch
    * ([[realMediaFeatures]]) and STREAMING (q250's media ingest gate)
    * share it: a stateless `mapPartitions`, so Structured Streaming runs
    * it per micro-batch with no state store. */
  def mediaFeaturesOf(ids: Dataset[Long]): DataFrame = {
    import ids.sparkSession.implicits._
    ids.mapPartitions(_.map { id =>
        (id % 3) match {
          case 0 =>
            val b = encodePgm(id)
            val (_, _, px) = decodePgm(b)
            var s = 0L; var i = 0
            while (i < px.length) { s += px(i); i += 1 }
            (id, "image", b.length, px.length, s)
          case 1 =>
            val b = encodeWav(id)
            val (_, samples) = decodeWav(b)
            var s = 0L; var i = 0
            while (i < samples.length) { s += samples(i); i += 1 }
            (id, "audio", b.length, samples.length, s)
          case _ =>
            val b = encodeY4m(id)
            val (_, _, lumaSums) = decodeY4m(b)
            (id, "video", b.length, lumaSums.length, lumaSums.sum)
        }
      })
      .toDF("doc_id", "kind", "n_bytes", "units", "val_sum")
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

  // ── REAL compressed image decode #2: GIF via javax.imageio ──────────
  // GIF is the LZW compression family (vs PNG's DEFLATE) and the JDK
  // ships both sides of the codec. A 256-entry grayscale palette makes
  // the round trip exact — palette color (v,v,v) survives encode/decode
  // byte-for-byte even if the writer permutes palette INDICES, because
  // features read the resolved color, not the index. Pixel i of image
  // `id` is (id·7 + i·13) mod 256 over w = 8 + id mod 10, h = 8 + id
  // mod 8, so oracles recompute features from the formula.

  /** Write a GIF with interlacing EXPLICITLY DISABLED. The plain
    * `ImageIO.write(img, "gif", …)` path interlaces small images (height
    * 4 came back row-scrambled through the JDK's own reader — measured,
    * not hypothetical), so every GIF written here pins progressive mode
    * off via the writer param. */
  /** Encode a REAL baseline JPEG (JDK `javax.imageio` — DCT + Huffman)
    * at quality 1.0. The q323 synthesis keeps every 8×8 block CONSTANT
    * (value from (id, blockX, blockY) only): a flat block's DCT is
    * DC-only, and the quality-1.0 quantization tables round-trip the DC
    * coefficient exactly, so decode reproduces the input BIT-EXACTLY —
    * verified over 40 size/value combinations including partial edge
    * blocks — which is what makes a lossy codec hash-oracle-able. The
    * general lossy path (non-flat content) is NOT bit-pinnable in SQL
    * and is exercised spec-side only. */
  def encodeJpeg(id: Long): Array[Byte] = {
    val w = 8 + (id % 50).toInt
    val h = 8 + (id % 40).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      val bx = (i % w) / 8
      val by = (i / w) / 8
      raster.setSample(i % w, i / w, 0,
        ((id * 31 + bx * 7 + by * 13) * 29 % 256).toInt)
      i += 1
    }
    writeJpeg(img)
  }

  private def writeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    require(it.hasNext, "JDK JPEG writer unavailable")
    val w = it.next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); w.dispose() }
    bos.toByteArray
  }

  /** Decode a JPEG for real (ImageIO: Huffman + dequant + IDCT) →
    * (width, height, gray row-major). Reads the RAW gray raster sample,
    * not `getRGB` — gray→sRGB conversion would gamma-shift values. */
  def decodeJpeg(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "not a decodable image")
    require(img.getRaster.getNumBands == 1, "expected grayscale JPEG")
    val w = img.getWidth
    val h = img.getHeight
    (w, h, Array.tabulate(w * h)(i =>
      img.getRaster.getSample(i % w, i / w, 0)))
  }

  /** q323: REAL JPEG decode features — encode (DCT + Huffman, q=1.0) →
    * decode → pixel stats inside the partition boundary; the third real
    * compressed codec beside PNG (q245) and GIF (q303). The flat-block
    * synthesis makes the round trip exact (see [[encodeJpeg]]), so the
    * oracle replays the pixel formula directly. */
  def jpegFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val (w, h, px) = decodeJpeg(encodeJpeg(id))
          var s = 0L
          var i = 0
          while (i < px.length) { s += px(i); i += 1 }
          (id, w, h, px.length, s, s.toDouble / px.length)
        }
      }
      .toDF("doc_id", "width", "height", "n_pix", "px_sum", "px_mean")
  }

  private def writeGif(img: java.awt.image.BufferedImage): Array[Byte] = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(it.hasNext, "JDK GIF writer unavailable")
    val w = it.next()
    val p = w.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); w.dispose() }
    bos.toByteArray
  }

  private def grayIndexedImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
  }

  /** Encode a real indexed-palette GIF for image `id` (LZW compression,
    * identity 256-gray palette, non-interlaced). */
  def encodeGif(id: Long): Array[Byte] = {
    val w = 8 + (id % 10).toInt
    val h = 8 + (id % 8).toInt
    val img = grayIndexedImage(w, h)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, ((id * 7 + i * 13) % 256).toInt)
      i += 1
    }
    writeGif(img)
  }

  /** Decode a GIF for real (ImageIO: LZW decompress + palette resolve) →
    * (width, height, gray values row-major). Reads the RESOLVED color
    * channel (`getRGB & 0xFF`), not the palette index, so a
    * writer-permuted palette cannot skew the values. */
  def decodeGif(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    (w, h, Array.tabulate(w * h)(i => img.getRGB(i % w, i / w) & 0xff))
  }

  /** Goertzel filter coefficients `2·cos(2π/P)` for the pinned analysis
    * periods (8/16/32 samples) — PRE-COMPUTED literals shared with the
    * DuckDB oracle, so no libm cos() parity question ever arises. */
  val goertzelPeriods: Seq[(Int, Double)] = Seq(
    8 -> 1.4142135623730951, // 2·cos(2π/8) = √2
    16 -> 1.8477590650225735,
    32 -> 1.9615705608064609)

  /** Single-frequency spectral energy via the Goertzel recurrence
    * (Goertzel 1958) over REAL decoded audio — the DSP building block of
    * tone/DTMF/voicing detectors, and the engine's first true spectral
    * feature beside the time-domain family (q93/q286/q296):
    * `s_i = x_i + c·s_{i−1} − s_{i−2}`, power
    * `s₁² + s₂² − c·s₁·s₂` at the pinned periods. Samples are
    * normalized by 1/32768 (a power of two — EXACT in binary, only the
    * exponent moves) and every recurrence step is 9dp-rounded, the
    * Holt/pageRank recurrence-parity pattern: the DuckDB oracle replays
    * the identical sequential fold with a WITH RECURSIVE chain and the
    * same pinned coefficients. Runs inside the partition codec boundary
    * on the decoded stream; output is 3 doubles per clip. */
  /** One Goertzel fold: normalized samples, 9dp per recurrence step,
    * 6dp power — the exact sequence the recursive-CTE oracle replays. */
  def goertzelPower(samples: Array[Int], coeff: Double): Double = {
    def round9(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < samples.length) {
      val x = samples(i) / 32768.0
      val s = round9(x + coeff * s1 - s2)
      s2 = s1
      s1 = s
      i += 1
    }
    java.math.BigDecimal.valueOf(s1 * s1 + s2 * s2 - coeff * s1 * s2)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  def goertzelEnergy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val coeffs = goertzelPeriods
    // balanced scan (r11): per-row work is a full WAV encode + decode +
    // three O(n-samples) Goertzel recurrences with 9dp rounding per step
    // — the single-row-group documents file ran it all on ONE core
    Sources.table(spark, sfDir, "documents", balance = true)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (_, raw) = decodeWav(encodeWavBursts(id))
        val e = coeffs.map { case (_, c) => goertzelPower(raw, c) }
        (id, raw.length, e(0), e(1), e(2))
      })
      .toDF("doc_id", "n", "e8", "e16", "e32")
  }

  /** Nearest-neighbor ½× GIF downscale THROUGH the real codec: decode
    * (LZW + palette), keep every second pixel in both axes, RE-ENCODE as
    * an actual GIF — [[resizePngHalf]]'s LZW twin, proving the
    * executor-side GIF ENCODE path on derived pixels. */
  def resizeGifHalf(b: Array[Byte]): Array[Byte] = {
    val (w, h, px) = decodeGif(b)
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val img = grayIndexedImage(w2, h2)
    val raster = img.getRaster
    var j = 0
    while (j < w2 * h2) {
      val y = j / w2; val x = j % w2
      raster.setSample(x, y, 0, px(2 * y * w + 2 * x))
      j += 1
    }
    writeGif(img)
  }

  /** Decode features AFTER a real GIF resize round trip: encode → decode
    * → half-scale → re-encode → decode again, all inside the partition
    * boundary — [[pngResizeFeatures]]'s LZW twin. */
  def gifResizeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val (w, h, px) = decodeGif(resizeGifHalf(encodeGif(id)))
          var s = 0L
          var i = 0
          while (i < px.length) { s += px(i); i += 1 }
          (id, w, h, px.length, s, s.toDouble / px.length)
        }
      }
      .toDF("doc_id", "width", "height", "n_pix", "px_sum", "px_mean")
  }

  /** Real GIF decode features through the per-partition boundary — the
    * LZW twin of [[pngFeatures]]: encode → (LZW inflate, palette
    * resolve) decode → dimensions and pixel statistics. */
  def gifFeatures(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Sources.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val (w, h, px) = decodeGif(encodeGif(id))
          var s = 0L
          var i = 0
          while (i < px.length) { s += px(i); i += 1 }
          (id, w, h, px.length, s, s.toDouble / px.length)
        }
      }
      .toDF("doc_id", "width", "height", "n_pix", "px_sum", "px_mean")
  }
}

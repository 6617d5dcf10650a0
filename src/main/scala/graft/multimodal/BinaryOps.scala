package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries exist in this container — see the build brief); everything
  * around it — schema, typed Dataset, mapPartitions batching, partition
  * sizing — is the real plumbing a decode UDF would ride on. Swapping
  * [[stubDecode]] for a JNI/FFI decoder changes no query shape.
  *
  * Scale: decode is embarrassingly parallel per-partition;
  * `spark.sql.files.maxPartitionBytes` bounds the bytes decoded per task,
  * so executor memory is bounded regardless of corpus size.
  */
object BinaryOps {

  case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder: derives fake media metadata deterministically from the
    * payload byte length. The fallback when the payload is not a container
    * format [[parseImageHeader]] understands (the synthetic test corpus
    * carries UTF-8 text payloads, which can never match the PNG/JPEG
    * signatures).
    */
  def stubDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(docId, n, 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 30)
  }

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)

  /** REAL image header parsing — (width, height) from the container bytes:
    *
    *  - PNG (ISO/IEC 15948 §5.2, §11.2.2): 8-byte signature, then IHDR is
    *    required to be the first chunk — width/height are the big-endian
    *    32-bit words at offsets 16 and 20.
    *  - JPEG (ITU-T T.81 §B.2.2): SOI marker, then marker segments are
    *    walked (2-byte big-endian payload length, which includes itself)
    *    until the first frame header SOFn (0xC0–0xCF minus DHT 0xC4,
    *    JPG 0xC8, DAC 0xCC); the frame carries precision(1),
    *    height(2 BE), width(2 BE).
    *
    * Returns None for anything malformed or non-image — callers fall back
    * to [[stubDecode]] so synthetic corpora keep flowing through the same
    * pipeline.
    */
  def parseImageHeader(p: Array[Byte]): Option[(Int, Int)] = {
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length >= 24 && pngSig.indices.forall(i => (p(i) & 0xff) == pngSig(i))
        && p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      val w = be32(p, 16)
      val h = be32(p, 20)
      if (w > 0 && h > 0) Some((w, h)) else None
    } else if (p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < p.length && (p(i) & 0xff) == 0xff) {
        var j = i
        while (j < p.length && (p(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= p.length) return None
        val marker = p(j) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf
            && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // j indexes the SOFn marker code; then len(2) precision(1)
          // height(2) width(2)
          if (j + 7 >= p.length) return None
          val h = be16(p, j + 4)
          val w = be16(p, j + 6)
          return if (w > 0 && h > 0) Some((w, h)) else None
        } else if (marker >= 0xd0 && marker <= 0xd9) {
          i = j + 1 // standalone marker (RSTn/SOI/EOI): no length field
        } else {
          if (j + 2 >= p.length) return None
          i = j + 1 + be16(p, j + 1)
        }
      }
      None
    } else None
  }

  /** Header-aware decode: real PNG/JPEG dimensions when the payload is one
    * (a still image is one frame); deterministic stub otherwise.
    */
  def decodeMeta(docId: Long, payload: Array[Byte]): MediaMeta =
    parseImageHeader(payload) match {
      case Some((w, h)) => MediaMeta(docId, payload.length, w, h, 1)
      case None         => stubDecode(docId, payload)
    }

  /** Metadata extraction over a (doc_id, payload binary) frame — the real
    * entry point a media table feeds. Per-partition batching; decode is
    * embarrassingly parallel.
    */
  def extractMetaBinary(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeMeta(id, bytes) })
  }

  /** Attach a binary payload column (documents.text encoded as UTF-8 —
    * standing in for real media bytes) and extract metadata per partition.
    */
  def extractMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] =
    extractMetaBinary(spark,
      docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))

  /** Frame-sampling shape: explode n_frames into (doc_id, frame_idx) rows —
    * the fan-out a video pipeline feeds to per-frame feature extraction.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyNth: Int): DataFrame =
    meta.toDF()
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"))

  /** REAL PNG pixel decode — JDK-only (`java.util.zip.Inflater`), no
    * image library: 8-bit-depth greyscale (color type 0), truecolor (2),
    * grey+alpha (4) and RGBA (6), non-interlaced. Concatenates the IDAT
    * chunks, inflates the compressed stream, and reverses the five
    * scanline filters (None/Sub/Up/Average/Paeth — ISO/IEC 15948 §9.2).
    * Returns (width, height, channels, rowMajorPixelBytes); None for
    * anything else (16-bit, palette, interlaced, malformed, truncated) —
    * callers fall back to the stub path. CRCs are not validated: a
    * corrupt-but-decodable payload still yields pixels, matching how
    * lenient production decoders behave in a crawl pipeline.
    */
  def decodePngPixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length < 33 || !pngSig.indices.forall(i => (p(i) & 0xff) == pngSig(i))
        || p(12) != 'I' || p(13) != 'H' || p(14) != 'D' || p(15) != 'R')
      return None
    val w = be32(p, 16)
    val h = be32(p, 20)
    val bitDepth = p(24) & 0xff
    val colorType = p(25) & 0xff
    val interlace = p(28) & 0xff
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => return None // palette (3) needs PLTE handling — not worth it
    }
    // bound absurd dimensions before allocating (a hostile header would
    // otherwise ask for gigabytes)
    if (w.toLong * h * channels > (1L << 28)) return None

    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var end = false
    while (!end && off + 8 <= p.length) {
      val len = be32(p, off)
      if (len < 0 || off + 12L + len > p.length) end = true
      else {
        if (p(off + 4) == 'I' && p(off + 5) == 'D'
            && p(off + 6) == 'A' && p(off + 7) == 'T')
          idat.write(p, off + 8, len)
        if (p(off + 4) == 'I' && p(off + 5) == 'E'
            && p(off + 6) == 'N' && p(off + 7) == 'D') end = true
        off += 12 + len
      }
    }

    val stride = w * channels
    val needed = (stride + 1L) * h
    // zlib's theoretical max expansion is ~1032:1 — a header claiming far
    // more pixels than the IDAT bytes could ever inflate to is hostile or
    // truncated; reject BEFORE allocating hundreds of MB per record (the
    // dimension cap above alone still admits ~0.5 GB from a 60-byte file)
    if (needed > idat.size().toLong * 1032L + 64L) return None
    val raw = new Array[Byte](needed.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var done = 0
      while (!inf.finished() && done < raw.length) {
        val n = inf.inflate(raw, done, raw.length - done)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        done += n
      }
      if (done < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()

    val out = new Array[Byte](stride * h)
    val bpp = channels // 8-bit depth: bytes per pixel == channels
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val pp = left + up - ul
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, channels, out))
  }

  /** Feature extraction with a REAL decode path for PNG payloads: decoded
    * pixels yield normalized per-channel means plus normalized dimensions
    * (cycled to `dim`); everything else falls to [[stubFeaturize]]. This
    * closes the declared decode stub for PNG with nothing but the JDK's
    * zlib — audio/video (and JPEG entropy decode) remain the documented
    * swap-points, since their codecs genuinely need external libraries.
    */
  def featurizePixels(payload: Array[Byte], dim: Int): Array[Double] =
    decodePngPixels(payload) match {
      case Some((w, h, ch, px)) =>
        val sums = new Array[Double](ch)
        var i = 0
        while (i < px.length) { sums(i % ch) += (px(i) & 0xff); i += 1 }
        val means = sums.map(_ / (w.toDouble * h) / 255.0)
        Array.tabulate(dim) { d =>
          if (d < ch) means(d)
          else if (d == ch) math.min(1.0, w / 4096.0)
          else if (d == ch + 1) math.min(1.0, h / 4096.0)
          else means(d % ch)
        }
      case None => stubFeaturize(payload, dim)
    }

  /** STUB feature extractor: a deterministic `dim`-float vector derived
    * from the payload bytes — standing in for an image/audio embedding
    * model. Each component folds every byte once (one pass over the
    * payload per vector, the same access pattern a real featurizer has).
    */
  def stubFeaturize(payload: Array[Byte], dim: Int): Array[Double] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      val d = i % dim
      acc(d) = acc(d) * 31 + (payload(i) & 0xff)
      i += 1
    }
    acc.map(v => ((v % 1000) + 1000) % 1000 / 1000.0)
  }

  /** Per-payload embedding extraction: the mapPartitions stage a model
    * featurizer rides on (batch shape = one partition; PNG payloads take
    * the REAL [[featurizePixels]] decode, others the deterministic stub —
    * swap the stub for an ONNX/JNI model call and nothing else changes).
    * Output embeds straight into [[graft.operators.Similarity]] —
    * `bruteForceTopK` / `lshTopK` / `ivfTopK` accept the array column
    * as-is.
    */
  def featurize(spark: SparkSession, docs: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, featurizePixels(bytes, dim)) })
      .toDF("doc_id", "embedding")
  }

  /** Resize planning: fit each image into a `box`×`box` square preserving
    * aspect ratio (never upscale) — the target-dimension arithmetic every
    * thumbnail/normalization stage runs before the actual pixel work. Pure
    * column math over the metadata; the decode-and-scale kernel would
    * consume (out_w, out_h) per row.
    */
  def resizePlan(meta: Dataset[MediaMeta], box: Int): DataFrame = {
    val scale = least(lit(1.0), lit(box.toDouble) / col("width"),
      lit(box.toDouble) / col("height"))
    meta.toDF().select(
      col("doc_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_w"),
      floor(col("height") * scale).cast("int").as("out_h"))
  }
}

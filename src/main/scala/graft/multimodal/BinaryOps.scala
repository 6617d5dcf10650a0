package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The REAL decode paths are JDK-only: PNG pixel decode
  * ([[decodePngPixels]] — zlib inflate + all five scanline filters),
  * PNG/JPEG header parse ([[parseImageHeader]]) and WAV/PCM audio decode
  * ([[parseWav]] / [[featurizeWav]] — RIFF chunk walk, 8/16-bit PCM).
  * Everything a codec library would genuinely be needed for (JPEG entropy
  * decode, compressed audio, video) falls back to a clearly-marked
  * deterministic STUB; everything around it — schema, typed Dataset,
  * mapPartitions batching, partition sizing — is the real plumbing a
  * decode UDF rides on. Swapping [[stubDecode]] for a JNI/FFI decoder
  * changes no query shape.
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

  /** Scalar audio features from a decoded PCM payload: amplitudes are
    * normalized by full scale (2^(bits-1)), `n_frames` counts frames (one
    * sample per channel), `zero_crossings` counts sign flips in channel 0.
    */
  case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      n_channels: Int,
      n_frames: Int,
      mean_amp: Double,
      rms_amp: Double,
      zero_crossings: Int)

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
    * (a still image is one frame), real MP4 track dimensions + frame
    * count when it is an ISO-BMFF container ([[parseMp4Header]]);
    * deterministic stub otherwise.
    */
  def decodeMeta(docId: Long, payload: Array[Byte]): MediaMeta =
    parseImageHeader(payload) match {
      case Some((w, h)) => MediaMeta(docId, payload.length, w, h, 1)
      case None => parseMp4Header(payload) match {
        case Some(v) =>
          MediaMeta(docId, payload.length, v.width, v.height,
            math.min(v.n_frames, Int.MaxValue.toLong).toInt)
        case None => stubDecode(docId, payload)
      }
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
    * zlib; [[featurizeWav]] closes it for PCM audio. Video (and JPEG
    * entropy decode, and compressed audio) remain the documented
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

  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def le32(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)

  /** REAL WAV/PCM audio decode — JDK-only, the PNG-decode discipline
    * applied to the RIFF container (RIFF spec / WAVE format registry,
    * mirrored in RFC 2361): `RIFF<size>WAVE`, then chunks are walked
    * (4-byte id, little-endian 32-bit payload size, data, odd sizes padded
    * to even) until both `fmt ` (format code 1 = integer PCM, channel
    * count, sample rate, bits per sample) and `data` (interleaved frames,
    * 8-bit unsigned / 16-bit signed little-endian) are seen.
    *
    * Returns (sampleRate, nChannels, bitsPerSample, interleavedSamples) —
    * samples SIGNED at either depth (8-bit is stored excess-128 and
    * re-centered here, per the format registry). None for anything
    * malformed: missing/short chunks, non-PCM format codes (float,
    * ADPCM, extensible), depths other than 8/16, or a `data` chunk that is
    * truncated or not frame-aligned — callers fall back to the stub path,
    * so a crawl corpus keeps flowing.
    */
  def parseWav(p: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F'
        || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E')
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(p, off + 4)
      if (size < 0 || off + 8L + size > p.length) return None // truncated
      if (p(off) == 'f' && p(off + 1) == 'm' && p(off + 2) == 't'
          && p(off + 3) == ' ') {
        if (size < 16) return None
        val code = le16(p, off + 8)
        val ch = le16(p, off + 10)
        val rate = le32(p, off + 12)
        val bits = le16(p, off + 22)
        if (code != 1 || ch < 1 || rate <= 0 || (bits != 8 && bits != 16))
          return None
        fmt = Some((rate, ch, bits))
      } else if (p(off) == 'd' && p(off + 1) == 'a' && p(off + 2) == 't'
          && p(off + 3) == 'a') {
        data = Some((off + 8, size))
      }
      off += 8 + size + (size & 1) // chunks are padded to even length
    }
    for {
      (rate, ch, bits) <- fmt
      (dOff, dLen) <- data
      bytesPerSample = bits / 8
      if dLen % (ch * bytesPerSample) == 0 // frame-aligned or malformed
    } yield {
      val n = dLen / bytesPerSample
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (bits == 8) (p(dOff + i) & 0xff) - 128
          else le16(p, dOff + 2 * i).toShort.toInt
        i += 1
      }
      (rate, ch, bits, out)
    }
  }

  /** Serialize interleaved PCM samples as a canonical 44-byte-header WAV —
    * the inverse of [[parseWav]] (round-trip law in MultimodalSpec).
    * Samples must already be signed at the target depth; 8-bit is stored
    * excess-128 per the format.
    */
  def buildWav(sampleRate: Int, nChannels: Int, bitsPerSample: Int,
      samples: Array[Int]): Array[Byte] = {
    require(nChannels >= 1 && (bitsPerSample == 8 || bitsPerSample == 16)
      && samples.length % nChannels == 0)
    val bps = bitsPerSample / 8
    val dataLen = samples.length * bps
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // integer PCM
      .putShort(nChannels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * nChannels * bps) // byte rate
      .putShort((nChannels * bps).toShort) // block align
      .putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      if (bitsPerSample == 8) out.put(((samples(i) + 128) & 0xff).toByte)
      else out.putShort(samples(i).toShort)
      i += 1
    }
    out.array()
  }

  /** Feature extraction over decoded PCM: full-scale-normalized mean and
    * RMS amplitude over ALL interleaved samples (exact integer
    * accumulation, one double division at the end — so the arithmetic is
    * reproducible in any engine), plus channel-0 zero crossings (adjacent
    * frames with strictly opposite signs). None when the payload is not a
    * PCM WAV [[parseWav]] accepts.
    */
  def featurizeWav(docId: Long, payload: Array[Byte]): Option[AudioFeatures] =
    parseWav(payload).map { case (rate, ch, bits, s) =>
      val fullScale = (1 << (bits - 1)).toDouble
      var sum = 0L
      var sumSq = 0L
      var i = 0
      while (i < s.length) {
        sum += s(i)
        sumSq += s(i).toLong * s(i)
        i += 1
      }
      var zc = 0
      var f = ch // channel 0 of frame 1
      while (f < s.length) {
        if (s(f).toLong * s(f - ch) < 0) zc += 1
        f += ch
      }
      val m = s.length
      AudioFeatures(docId, rate, ch, m / ch,
        if (m == 0) 0.0 else sum.toDouble / m / fullScale,
        if (m == 0) 0.0 else math.sqrt(sumSq.toDouble / m) / fullScale,
        zc)
    }

  /** Audio featurization over a (doc_id, payload binary) frame — the same
    * mapPartitions stage as [[extractMetaBinary]]; payloads that are not
    * PCM WAVs are dropped (a real pipeline routes them to the image/stub
    * path instead).
    */
  def audioFeaturesBinary(spark: SparkSession,
      payloads: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => featurizeWav(id, bytes) })
  }

  /** Video-track metadata from an MP4 container: dimensions, movie
    * duration in milliseconds, and the video track's sample (frame)
    * count — everything the frame-sampling fan-out and resize planning
    * need, without touching a codec. */
  case class VideoMeta(width: Int, height: Int, dur_ms: Double, n_frames: Long)

  /** REAL MP4 / ISO-BMFF container parse — JDK-only byte walk of the box
    * model (ISO/IEC 14496-12 §4.2: big-endian 32-bit size + 4-char type;
    * `size == 1` → 64-bit largesize follows; `size == 0` → box runs to
    * EOF; containers hold boxes recursively). The walk recurses into
    * moov/trak/mdia/minf/stbl and extracts:
    *
    *  - `mvhd` (v0/v1): movie timescale + duration → duration in ms
    *  - `tkhd` (v0/v1): the track's 16.16 fixed-point width/height — the
    *    first track with nonzero dimensions is the video track
    *  - that track's `stsz`: sample_count == frame count
    *
    * Returns None for anything that is not a plausible BMFF file (the
    * gate is the spec-required `ftyp` first box) or whose boxes are
    * truncated/malformed. Frame DECODE genuinely needs a codec and stays
    * a stub; the container metadata, duration arithmetic, frame-count and
    * sampling fan-out — the Spark-side surface — are real (q143 proves
    * the walker byte-level against a formula oracle).
    */
  def parseMp4Header(p: Array[Byte]): Option[VideoMeta] = {
    if (p.length < 16) return None
    val sz0 = be32(p, 0)
    if (sz0 < 8 || sz0 > p.length || p(4) != 'f' || p(5) != 't'
        || p(6) != 'y' || p(7) != 'p') return None
    var timescale = 0L
    var duration = -1L
    var width = 0
    var height = 0
    var frames = -1L
    // per-trak candidates, committed when the trak closes with video dims
    var tW = 0; var tH = 0; var tFrames = -1L
    def u32(i: Int): Long = be32(p, i) & 0xffffffffL
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def walk(from: Int, to: Int, depth: Int): Boolean = { // false = malformed
      var off = from
      while (off + 8 <= to) {
        var size = u32(off)
        var hdr = 8
        if (size == 0L) size = (to - off).toLong // to end of enclosing box
        else if (size == 1L) {
          if (off + 16 > to) return false
          size = u64(off + 8); hdr = 16
        }
        if (size < hdr || off + size > to || depth > 8) return false
        val typ = new String(p, off + 4, 4, "US-ASCII")
        val body = off + hdr
        val end = (off + size).toInt
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" =>
            if (!walk(body, end, depth + 1)) return false
          case "trak" =>
            tW = 0; tH = 0; tFrames = -1L
            if (!walk(body, end, depth + 1)) return false
            if (tW > 0 && tH > 0 && width == 0) {
              width = tW; height = tH; frames = tFrames
            }
          case "mvhd" =>
            if (body + 4 > end) return false
            val v = p(body) & 0xff
            if (v == 1) {
              // v1 needs 32 bytes through duration: u64(body+24) reads
              // body+24..body+31
              if (body + 32 > end) return false
              timescale = u32(body + 20); duration = u64(body + 24)
            } else {
              if (body + 20 > end) return false
              timescale = u32(body + 12); duration = u32(body + 16)
            }
          case "tkhd" =>
            // v0 minimum is 84 bytes — guard BEFORE the version-byte read
            // so an empty tkhd body at end-of-payload is malformed, not AIOOBE
            if (body + 84 > end) return false
            val v = p(body) & 0xff
            // width/height are the LAST 8 bytes of the fixed v0 (84-byte)
            // / v1 (96-byte) payload, 16.16 fixed point
            val need = if (v == 1) 96 else 84
            if (body + need > end) return false
            tW = (u32(body + need - 8) >> 16).toInt
            tH = (u32(body + need - 4) >> 16).toInt
          case "stsz" =>
            if (body + 12 > end) return false
            tFrames = u32(body + 8) // sample_count
          case _ => () // foreign box: skipped by size
        }
        off = (off + size).toInt
      }
      off == to || from == to
    }
    if (!walk(0, p.length, 0)) return None
    if (timescale <= 0L || duration < 0L || width <= 0 || height <= 0)
      return None
    Some(VideoMeta(width, height, duration * 1000.0 / timescale,
      math.max(frames, 0L)))
  }

  /** Serialize a minimal-but-well-formed MP4 (v0 boxes, full-size mvhd/
    * tkhd payloads, a `free` box to exercise foreign-box skipping, an
    * `mdat` stub) — the inverse of [[parseMp4Header]] for the round-trip
    * law and the q143 fixture. */
  def buildMp4(width: Int, height: Int, timescale: Int, duration: Long,
      nFrames: Long): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(8)
      .put("isom".getBytes("US-ASCII")).putInt(0x200).array())
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100) // v0 payload is 100 bytes
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // ctime, mtime
      b.putInt(timescale).putInt(duration.toInt)
      b.array() // rate/volume/matrix/next_track_id left zero — not parsed
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84) // v0 payload is 84 bytes
      b.putInt(0).putInt(0).putInt(0).putInt(1) // ver+flags, times, track id
      b.position(76)
      b.putInt(width << 16).putInt(height << 16)
      b.array()
    }
    val stsz = box("stsz", java.nio.ByteBuffer.allocate(12)
      .putInt(0).putInt(1).putInt(nFrames.toInt).array()) // fixed size 1
    val trak = box("trak", box("tkhd", tkhd) ++
      box("mdia", box("minf", box("stbl", stsz))))
    val moov = box("moov", box("mvhd", mvhd) ++ trak)
    val free = box("free", Array[Byte](7, 7, 7)) // odd-length foreign box
    val mdat = box("mdat", Array[Byte](0, 1, 2, 3))
    ftyp ++ free ++ moov ++ mdat
  }

  /** Deterministic MP4 fixture per document (the q143 twin of
    * [[syntheticWavCorpus]]): dimensions, timescale, duration and frame
    * count are integer arithmetic on doc_id; the Spark side serializes
    * the BMFF boxes and re-walks the bytes, the oracle derives the same
    * values from the formula — a hash match proves the box walker. */
  def syntheticMp4Corpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (16 * (10 + id % 20)).toInt
        val h = (16 * (6 + id % 15)).toInt
        val ts = (600 * (1 + id % 3)).toInt
        val dur = 600L * (10 + id % 50) + (id % 7) * 100L
        val n = 24 + id % 96
        (id, buildMp4(w, h, ts, dur, n))
      })
      .toDF("doc_id", "payload")
  }

  /** Video metadata extraction over a (doc_id, payload binary) frame —
    * the mapPartitions stage of [[extractMetaBinary]] specialized to the
    * MP4 walker's full output (duration included); non-BMFF payloads are
    * dropped. */
  def videoMetaBinary(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseMp4Header(bytes).map(v =>
          (id, v.width, v.height, v.dur_ms, v.n_frames))
      })
      .toDF("doc_id", "width", "height", "dur_ms", "n_frames")
  }

  /** Deterministic 16-bit PCM WAV fixture per document — the audio
    * analogue of the text-payload stand-in: channel count, sample rate,
    * frame count and every sample are pure integer arithmetic on doc_id,
    * so a SQL oracle can derive the SAME samples without parsing bytes —
    * while the Spark side genuinely serializes and re-parses the
    * container, proving [[parseWav]] against the formula (q141).
    */
  def syntheticWavCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val nCh = (1 + id % 2).toInt
        val rate = (8000 * (1 + id % 3)).toInt
        val m = (100 + id % 200).toInt * nCh
        val samples = Array.tabulate(m)(j =>
          ((id * 31 + j * 7919L) % 65536L - 32768L).toInt)
        (id, buildWav(rate, nCh, 16, samples))
      })
      .toDF("doc_id", "payload")
  }

  /** REAL audio embedding from decoded PCM: the interleaved samples are
    * cut into `dim` equal windows and each contributes its full-scale-
    * normalized RMS — the energy-envelope features a real audio encoder's
    * front end starts from (values in [0, 1], so they compose with the
    * pixel/stub featurizers in one embedding space). None for non-WAV
    * payloads. */
  def featurizeWavBands(payload: Array[Byte], dim: Int): Option[Array[Double]] =
    parseWav(payload).map { case (_, _, bits, s) =>
      val fullScale = (1 << (bits - 1)).toDouble
      val out = new Array[Double](dim)
      if (s.nonEmpty) {
        val win = math.max(1, (s.length + dim - 1) / dim)
        var b = 0
        while (b < dim) {
          val from = b * win
          val to = math.min(s.length, from + win)
          if (from < to) {
            var acc = 0.0
            var i = from
            while (i < to) { acc += s(i).toDouble * s(i); i += 1 }
            out(b) = math.sqrt(acc / (to - from)) / fullScale
          }
          b += 1
        }
      }
      out
    }

  /** One featurizer for every media payload: PNG pixels → channel means
    * ([[featurizePixels]]), PCM WAV → per-band RMS energies
    * ([[featurizeWavBands]]), anything codec-requiring → the
    * deterministic stub. All three land in [0, 1]^dim. */
  def featurizeMedia(payload: Array[Byte], dim: Int): Array[Double] =
    featurizeWavBands(payload, dim)
      .getOrElse(featurizePixels(payload, dim))

  /** Per-payload embedding extraction: the mapPartitions stage a model
    * featurizer rides on (batch shape = one partition; PNG and WAV
    * payloads take the REAL decodes via [[featurizeMedia]], others the
    * deterministic stub — swap the stub for an ONNX/JNI model call and
    * nothing else changes). Output embeds straight into
    * [[graft.operators.Similarity]] — `bruteForceTopK` / `lshTopK` /
    * `ivfTopK` accept the array column as-is.
    */
  def featurize(spark: SparkSession, docs: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, featurizeMedia(bytes, dim)) })
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

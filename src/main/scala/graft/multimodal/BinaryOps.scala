package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The REAL decode paths are JDK-only: PNG pixel decode
  * ([[decodePngPixels]] — zlib inflate + all five scanline filters),
  * baseline grayscale JPEG entropy decode ([[decodeJpegPixels]] —
  * Huffman + dequant + IDCT per ITU-T T.81), PNG/JPEG header parse
  * ([[parseImageHeader]]) and WAV/PCM audio decode ([[parseWav]] /
  * [[featurizeWav]] — RIFF chunk walk, 8/16-bit PCM).
  * Everything a codec library would genuinely be needed for
  * (arithmetic-coded JPEG, sampling factors beyond 2×2,
  * compressed audio, video frames) falls back to a clearly-marked
  * deterministic STUB; everything around it — schema,
  * typed Dataset, mapPartitions batching, partition sizing — is the real
  * plumbing a decode UDF rides on. Swapping [[stubDecode]] for a JNI/FFI
  * decoder changes no query shape.
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
    } else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F'
        && p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a') {
      // GIF87a/89a: logical screen w/h, little-endian 16-bit at 6/8
      val w = le16(p, 6)
      val h = le16(p, 8)
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
    * image library: 8- and 16-bit-depth greyscale (color type 0),
    * truecolor (2), palette (3 — indices expanded through PLTE to RGB),
    * grey+alpha (4) and RGBA (6), non-interlaced; 16-bit samples
    * downsample to their high byte on output (feature extraction never
    * needs the low bits). Concatenates the IDAT chunks, inflates the
    * compressed stream, and reverses the five scanline filters
    * (None/Sub/Up/Average/Paeth — ISO/IEC 15948 §9.2), sequentially or
    * across the seven Adam7 interlace passes (§8.2 — each pass an
    * independently filtered sub-image scattered to its final cells).
    * Returns (width, height, channels, rowMajorPixelBytes); None for
    * anything else (packed sub-8-bit palette, malformed, truncated) —
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
    if (w <= 0 || h <= 0 || (bitDepth != 8 && bitDepth != 16)
        || interlace > 1) return None // 0 = sequential, 1 = Adam7
    // palette images carry 1 index byte per pixel in the stream and
    // expand through PLTE to RGB on output (8-bit depth only — packed
    // 1/2/4-bit indices fail the depth gate, and 16-bit palette is
    // illegal per ISO 15948 Table 11.1)
    val palette = colorType == 3
    if (palette && bitDepth != 8) return None
    val channels = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => return None
    }
    // 16-bit samples are big-endian pairs in the stream; output
    // downsamples to the high byte (the production-pipeline convention —
    // feature extraction never needs the low 8 bits)
    val bytesPerSample = bitDepth / 8
    // bound absurd dimensions before allocating (a hostile header would
    // otherwise ask for gigabytes)
    if (w.toLong * h * channels * bytesPerSample > (1L << 28)) return None

    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var off = 8
    var end = false
    while (!end && off + 8 <= p.length) {
      val len = be32(p, off)
      if (len < 0 || off + 12L + len > p.length) end = true
      else {
        if (p(off + 4) == 'I' && p(off + 5) == 'D'
            && p(off + 6) == 'A' && p(off + 7) == 'T')
          idat.write(p, off + 8, len)
        if (p(off + 4) == 'P' && p(off + 5) == 'L'
            && p(off + 6) == 'T' && p(off + 7) == 'E')
          plte = java.util.Arrays.copyOfRange(p, off + 8, off + 8 + len)
        if (p(off + 4) == 'I' && p(off + 5) == 'E'
            && p(off + 6) == 'N' && p(off + 7) == 'D') end = true
        off += 12 + len
      }
    }
    // PLTE is mandatory for color type 3: 1-256 RGB triples (ISO 15948
    // §11.2.3); an out-of-range index below makes the image malformed
    if (palette && (plte == null || plte.length < 3 || plte.length % 3 != 0
        || plte.length > 768)) return None

    val bpp = channels * bytesPerSample // filters operate on whole bytes
    val stride = w * bpp
    // Adam7 pass geometry (ISO 15948 §8.2): (x0, y0, dx, dy) per pass;
    // a non-interlaced image is the single pass (0, 0, 1, 1)
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (if (w > x0) (w - x0 + dx - 1) / dx else 0,
        if (h > y0) (h - y0 + dy - 1) / dy else 0)
    }
    val needed = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0L else (pw.toLong * bpp + 1L) * ph
    }.sum
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

    // reverse the per-row filters of one pass image (rows of `rowBytes`
    // at raw(off), each led by its filter byte) into `dst`; each pass
    // filters independently of the others (§8.2)
    def unfilter(off: Int, rowBytes: Int, rows: Int,
        dst: Array[Byte]): Boolean = {
      var y = 0
      while (y < rows) {
        val f = raw(off + y * (rowBytes + 1)) & 0xff
        val rowIn = off + y * (rowBytes + 1) + 1
        val rowOut = y * rowBytes
        var x = 0
        while (x < rowBytes) {
          val cur = raw(rowIn + x) & 0xff
          val left = if (x >= bpp) dst(rowOut + x - bpp) & 0xff else 0
          val up = if (y > 0) dst(rowOut - rowBytes + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) dst(rowOut - rowBytes + x - bpp) & 0xff else 0
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
            case _ => return false
          }
          dst(rowOut + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      true
    }

    val out = new Array[Byte](stride * h)
    var roff = 0
    for (p <- passes) {
      val (x0, y0, dx, dy) = p
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val rowBytes = pw * bpp
        val pbuf = if (interlace == 0) out else new Array[Byte](rowBytes * ph)
        if (!unfilter(roff, rowBytes, ph, pbuf)) return None
        if (interlace != 0) { // scatter pass pixels to their final cells
          var py = 0
          while (py < ph) {
            var px = 0
            while (px < pw) {
              System.arraycopy(pbuf, (py * pw + px) * bpp,
                out, (y0 + py * dy) * stride + (x0 + px * dx) * bpp, bpp)
              px += 1
            }
            py += 1
          }
        }
        roff += (rowBytes + 1) * ph
      }
    }
    // 16-bit: keep the high byte of each big-endian sample
    val px8 =
      if (bytesPerSample == 1) out
      else {
        val d = new Array[Byte](w * h * channels)
        var i = 0
        while (i < d.length) { d(i) = out(i * 2); i += 1 }
        d
      }
    if (!palette) Some((w, h, channels, px8))
    else { // expand indices through the palette to interleaved RGB
      val nEntries = plte.length / 3
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < px8.length) {
        val idx = px8(i) & 0xff
        if (idx >= nEntries) return None // index past PLTE: malformed
        rgb(i * 3) = plte(idx * 3)
        rgb(i * 3 + 1) = plte(idx * 3 + 1)
        rgb(i * 3 + 2) = plte(idx * 3 + 2)
        i += 1
      }
      Some((w, h, 3, rgb))
    }
  }

  /** Feature extraction with a REAL decode path for PNG payloads: decoded
    * pixels yield normalized per-channel means plus normalized dimensions
    * (cycled to `dim`); everything else falls to [[stubFeaturize]]. This
    * closes the declared decode stub for PNG with nothing but the JDK's
    * zlib; [[featurizeWav]] closes it for PCM audio and
    * [[decodeJpegPixels]] for baseline AND progressive JPEG —
    * grayscale, 4:4:4 color and 4:2:0 subsampled color. Video frames
    * (and compressed audio) remain the documented swap-points, since
    * their codecs genuinely need external libraries.
    */
  def featurizePixels(payload: Array[Byte], dim: Int): Array[Double] =
    decodePngPixels(payload).orElse(decodeGifPixels(payload)) match {
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
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
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

  /** The video track's SAMPLE TABLE: codec fourcc plus the absolute
    * byte range of every sample (frame) in the file — what frame
    * EXTRACTION needs beyond [[parseMp4Header]]'s metadata. */
  case class VideoSamples(width: Int, height: Int, fourcc: String,
      offsets: Array[Long], sizes: Array[Int])

  /** REAL ISO-BMFF sample-table parse (14496-12 §8.5–8.7) — the second
    * half of the container walk: for the first trak with video
    * dimensions, read `stsd` (codec fourcc of sample entry 1), `stsz`
    * (uniform or per-sample sizes), `stsc` (sample→chunk runs) and
    * `stco`/`co64` (chunk offsets), then resolve every sample to its
    * absolute (offset, size) by the standard chunk walk: stsc runs give
    * each chunk its sample count, samples pack back-to-back within a
    * chunk. None when any table is missing/malformed or a resolved
    * range falls outside the payload — truncated files are rejected,
    * never sliced short. */
  def parseMp4Samples(p: Array[Byte]): Option[VideoSamples] = {
    if (p.length < 16) return None
    val sz0 = be32(p, 0)
    if (sz0 < 8 || sz0 > p.length || p(4) != 'f' || p(5) != 't'
        || p(6) != 'y' || p(7) != 'p') return None
    def u32(i: Int): Long = be32(p, i) & 0xffffffffL
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    var width = 0; var height = 0; var fourcc = ""
    var sizes: Array[Int] = null
    var chunkOffs: Array[Long] = null
    var stscRuns: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
    // per-trak candidates, committed when a trak closes with video dims
    var tW = 0; var tH = 0; var tFcc = ""
    var tSizes: Array[Int] = null
    var tChunks: Array[Long] = null
    var tRuns: Array[(Long, Long)] = null
    def walk(from: Int, to: Int, depth: Int): Boolean = {
      var off = from
      while (off + 8 <= to) {
        var size = u32(off)
        var hdr = 8
        if (size == 0L) size = (to - off).toLong
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
            tW = 0; tH = 0; tFcc = ""; tSizes = null; tChunks = null
            tRuns = null
            if (!walk(body, end, depth + 1)) return false
            if (tW > 0 && tH > 0 && width == 0) {
              width = tW; height = tH; fourcc = tFcc
              sizes = tSizes; chunkOffs = tChunks; stscRuns = tRuns
            }
          case "tkhd" =>
            if (body + 84 > end) return false
            val v = p(body) & 0xff
            val need = if (v == 1) 96 else 84
            if (body + need > end) return false
            tW = (u32(body + need - 8) >> 16).toInt
            tH = (u32(body + need - 4) >> 16).toInt
          case "stsd" =>
            // ver/flags(4) entry_count(4), then sample entries; the
            // fourcc is bytes 4..8 of entry 1's box header
            if (body + 16 > end || u32(body + 4) < 1) return false
            tFcc = new String(p, body + 12, 4, "US-ASCII")
          case "stsz" =>
            if (body + 12 > end) return false
            val uniform = u32(body + 4)
            val n = u32(body + 8)
            if (n > (1L << 20)) return false // hostile sample count
            val nn = n.toInt
            tSizes =
              if (uniform != 0L) {
                if (uniform > Int.MaxValue) return false
                Array.fill(nn)(uniform.toInt)
              } else {
                if (body + 12 + 4L * nn > end) return false
                Array.tabulate(nn) { k =>
                  val s = u32(body + 12 + 4 * k)
                  if (s > Int.MaxValue) return false
                  s.toInt
                }
              }
          case "stsc" =>
            if (body + 8 > end) return false
            val n = u32(body + 4)
            if (n > (1L << 16) || body + 8 + 12L * n > end) return false
            tRuns = Array.tabulate(n.toInt)(k =>
              (u32(body + 8 + 12 * k), u32(body + 12 + 12 * k)))
          case "stco" =>
            if (body + 8 > end) return false
            val n = u32(body + 4)
            if (n > (1L << 20) || body + 8 + 4L * n > end) return false
            tChunks = Array.tabulate(n.toInt)(k => u32(body + 8 + 4 * k))
          case "co64" =>
            if (body + 8 > end) return false
            val n = u32(body + 4)
            if (n > (1L << 20) || body + 8 + 8L * n > end) return false
            tChunks = Array.tabulate(n.toInt)(k => u64(body + 8 + 8 * k))
          case _ => ()
        }
        off = (off + size).toInt
      }
      off == to || from == to
    }
    if (!walk(0, p.length, 0)) return None
    if (width <= 0 || height <= 0 || sizes == null || chunkOffs == null ||
        stscRuns == null || stscRuns.isEmpty) return None
    // resolve samples: stsc run i covers chunks [first_i, first_{i+1});
    // runs must start at chunk 1 and be strictly increasing
    if (stscRuns.head._1 != 1L) return None
    val offs = new Array[Long](sizes.length)
    var s = 0
    var run = 0
    var chunk = 0 // 0-based index into chunkOffs
    while (s < sizes.length) {
      if (chunk >= chunkOffs.length) return None // more samples than chunks hold
      while (run + 1 < stscRuns.length &&
          chunk + 1 >= stscRuns(run + 1)._1) run += 1
      val spc = stscRuns(run)._2
      if (spc < 1L || spc > (1L << 20)) return None
      var at = chunkOffs(chunk)
      var k = 0L
      while (k < spc && s < sizes.length) {
        if (at < 0 || at + sizes(s) > p.length) return None // truncated
        offs(s) = at
        at += sizes(s)
        s += 1; k += 1
      }
      chunk += 1
    }
    Some(VideoSamples(width, height, fourcc, offs, sizes))
  }

  /** REAL video FRAME decode for Motion-JPEG tracks — the one video
    * codec the engine can decode library-free, because every sample is
    * a complete baseline/progressive JPEG handed to
    * [[decodeJpegPixels]]. Samples every `everyNth`-th frame (the
    * [[frameSampleFanout]] stride, applied at extraction so undecoded
    * frames are never sliced), decodes it, and emits per-frame luma
    * statistics — (doc_id, frame_idx, width, height, mean_px). Tracks
    * whose stsd fourcc is not `jpeg`/`mjpa`/`mjpb` (H.264 and friends —
    * inter-frame codecs genuinely need a codec library) and payloads
    * without a sample table are dropped, not stubbed. Runs in
    * mapPartitions over the binary column: per-row imperative work with
    * no shuffle, the same plan shape as the image/audio featurizers. */
  def videoFrameFeaturesBinary(spark: SparkSession, payloads: DataFrame,
      everyNth: Int = 1): DataFrame = {
    import spark.implicits._
    require(everyNth >= 1, "everyNth must be >= 1")
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseMp4Samples(bytes).toSeq
          .filter(v => Set("jpeg", "mjpa", "mjpb")(v.fourcc))
          .flatMap { v =>
            (0 until v.sizes.length by everyNth).flatMap { f =>
              val frame = java.util.Arrays.copyOfRange(bytes,
                v.offsets(f).toInt, v.offsets(f).toInt + v.sizes(f))
              decodeJpegPixels(frame).map { case (w, h, ch, px) =>
                // luma: channel 0 of grayscale, JFIF Y is not recomputed
                // for color — mean over the FIRST channel keeps the
                // statistic codec-exact for the gray MJPEG fixture
                var sum = 0L
                var i = 0
                while (i < w.toLong * h) { sum += px(i.toInt * ch) & 0xff; i += 1 }
                (id, f, w, h, sum.toDouble / (w.toLong * h) / 255.0)
              }
            }
          }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "mean_px")
  }

  /** Serialize a REAL Motion-JPEG MP4: full ftyp/moov box tree with a
    * `jpeg` VisualSampleEntry in stsd, per-sample stsz, samples packed
    * two per chunk (so stsc carries a genuine run table and stco one
    * offset per chunk — the resolve path in [[parseMp4Samples]] is
    * exercised, not a single-chunk degenerate), frames byte-concatenated
    * in mdat. The inverse of [[parseMp4Samples]] for the round-trip law
    * and the q149 fixture. */
  def buildMjpegMp4(width: Int, height: Int, timescale: Int,
      duration: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val n = frames.length
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(8)
      .put("isom".getBytes("US-ASCII")).putInt(0x200).array())
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(timescale).putInt(duration.toInt)
      b.array()
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0).putInt(0).putInt(0).putInt(1)
      b.position(76)
      b.putInt(width << 16).putInt(height << 16)
      b.array()
    }
    val stsd = {
      // VisualSampleEntry (14496-12 §12.1.3): 86 bytes — 8 box header,
      // 6 reserved + data_reference_index, 16 pre_defined/reserved,
      // width/height, 72dpi 16.16 resolutions, reserved, frame_count=1,
      // 32-byte compressorname, depth 24, pre_defined -1
      val e = java.nio.ByteBuffer.allocate(86)
      e.putInt(86).put("jpeg".getBytes("US-ASCII"))
      e.position(14); e.putShort(1) // data_reference_index
      e.position(32)
      e.putShort(width.toShort).putShort(height.toShort)
      e.putInt(0x00480000).putInt(0x00480000).putInt(0)
      e.putShort(1)
      e.position(82); e.putShort(24).putShort(-1)
      box("stsd", java.nio.ByteBuffer.allocate(8)
        .putInt(0).putInt(1).array() ++ e.array())
    }
    val stsz = {
      val b = java.nio.ByteBuffer.allocate(12 + 4 * n)
      b.putInt(0) // version + flags
      b.putInt(0) // sample_size 0 => per-sample size table follows
      b.putInt(n)
      frames.foreach(f => b.putInt(f.length))
      box("stsz", b.array())
    }
    val nChunks = (n + 1) / 2
    def moovOf(chunkOffs: Array[Long]): Array[Byte] = {
      val stsc = { // two samples per chunk; a short tail chunk gets its own run
        val runs =
          if (n % 2 == 0 || n < 2) Seq((1, math.min(2, math.max(n, 1))))
          else Seq((1, 2), (nChunks, 1))
        val b = java.nio.ByteBuffer.allocate(8 + 12 * runs.length)
        b.putInt(0).putInt(runs.length)
        runs.foreach { case (fc, spc) => b.putInt(fc).putInt(spc).putInt(1) }
        box("stsc", b.array())
      }
      val stco = {
        val b = java.nio.ByteBuffer.allocate(8 + 4 * nChunks)
        b.putInt(0).putInt(nChunks)
        chunkOffs.foreach(o => b.putInt(o.toInt))
        box("stco", b.array())
      }
      val trak = box("trak", box("tkhd", tkhd) ++
        box("mdia", box("minf", box("stbl", stsd ++ stsz ++ stsc ++ stco))))
      box("moov", box("mvhd", mvhd) ++ trak)
    }
    // two passes: moov's size is offset-independent, so lay out with
    // zeros, then rebuild with the true mdat-relative chunk offsets
    val probe = moovOf(Array.fill(nChunks)(0L))
    val mdatBody = ftyp.length + probe.length + 8L
    val offs = new Array[Long](nChunks)
    var at = mdatBody
    var i = 0
    while (i < n) {
      if (i % 2 == 0) offs(i / 2) = at
      at += frames(i).length
      i += 1
    }
    val moov = moovOf(offs)
    val mdat = box("mdat", frames.toArray.flatten)
    ftyp ++ moov ++ mdat
  }

  /** Deterministic Motion-JPEG fixture per document (the q149 twin of
    * [[syntheticJpegCorpus]], lifted to video): 8-aligned dimensions and
    * an odd/even frame count from doc_id arithmetic, each frame a
    * DC-only LOSSLESS baseline JPEG whose block constants are integer
    * arithmetic on (doc_id, frame_idx, block) — so a SQL oracle predicts
    * every decoded pixel of every frame while the Spark side genuinely
    * serializes the BMFF sample table AND the per-frame entropy streams,
    * then re-walks and re-decodes both. Odd frame counts make the stsc
    * run table two runs (builder packs two samples per chunk). */
  def syntheticMjpegCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 * (2 + id % 4)).toInt
        val h = (8 * (1 + id % 3)).toInt
        val nf = (3 + id % 4).toInt
        val frames = (0 until nf).map { f =>
          buildJpeg(w, h, (bx, by) =>
            ((id * 31 + f * 97 + bx * 17 + by * 23) % 256).toInt)
        }
        (id, buildMjpegMp4(w, h, 600, 25L * nf, frames))
      })
      .toDF("doc_id", "payload")
  }

  // ───────────────────────── H.264 header parse ─────────────────────────
  //
  // A real crawl's MP4s are overwhelmingly H.264, and inter-frame DECODE
  // genuinely needs a codec library (documented stub). What a curation
  // pipeline's metadata queries actually need — codec, profile, level,
  // coded dimensions, frame/keyframe counts — lives in container headers
  // this walk reads for real: the avc1 sample entry's
  // AVCDecoderConfigurationRecord (ISO/IEC 14496-15 §5.3.3.1), the first
  // SequenceParameterSet inside it (ITU-T H.264 §7.3.2.1.1 — Exp-Golomb
  // bitstream with emulation-prevention bytes removed per §7.4.1), and
  // the sync-sample table (14496-12 §8.6.2).

  /** MSB-first bit reader over an RBSP byte array with Exp-Golomb
    * decoding (H.264 §9.1). Reads past the end set `ok` false instead of
    * throwing — a truncated SPS is rejected, never an exception. */
  private final class BitReader(d: Array[Byte]) {
    private var pos = 0
    var ok = true
    def u1(): Int =
      if (pos >= d.length * 8) { ok = false; 0 }
      else { val b = (d(pos >> 3) >> (7 - (pos & 7))) & 1; pos += 1; b }
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (ok && u1() == 0 && zeros < 31) zeros += 1
      if (!ok || zeros >= 31) { ok = false; 0 }
      else ((1 << zeros) - 1) + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** profile_idc values whose SPS carries the chroma/bit-depth/scaling
    * branch (§7.3.2.1.1's `if (profile_idc == 100 || …)` list) — ONE
    * definition shared by [[parseSps]] and [[buildSps]], since a parse/
    * build disagreement here shifts every later Exp-Golomb field. */
  private val HighProfileIdcs = Set(100, 110, 122, 244, 44, 83, 86, 118,
    128, 138, 139, 134, 135)

  /** NAL payload → RBSP: strip emulation-prevention bytes (§7.4.1 — an
    * encoder inserts 0x03 after any 0x0000 so start codes can't appear
    * inside a NAL; the 00 00 03 sequence decodes back to 00 00). */
  private[graft] def rbspOf(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte](nal.length)
    var zeros = 0
    var i = from
    while (i < nal.length) {
      val b = nal(i)
      if (zeros >= 2 && b == 3) zeros = 0 // emulation-prevention byte
      else { out += b; zeros = if (b == 0) zeros + 1 else 0 }
      i += 1
    }
    out.toArray
  }

  /** The inverse of [[rbspOf]]: insert 0x03 after every 00 00 that would
    * otherwise be followed by 00/01/02/03 (§7.4.1's encoder rule). */
  private[graft] def epbInsert(rbsp: Array[Byte]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte](rbsp.length)
    var zeros = 0
    for (b <- rbsp) {
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** §7.3.2.1.1 scaling_list: consumed for position only (a present
    * scaling matrix shifts every later field). */
  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var lastScale = 8
    var nextScale = 8
    var j = 0
    while (j < size && r.ok) {
      if (nextScale != 0) nextScale = ((lastScale + r.se()) % 256 + 256) % 256
      if (nextScale != 0) lastScale = nextScale
      j += 1
    }
  }

  /** REAL SequenceParameterSet parse (H.264 §7.3.2.1.1) over a full SPS
    * NAL (header byte + EPB-coded payload): profile_idc, level_idc, and
    * the display dimensions — coded macroblock grid minus the frame-crop
    * offsets in chroma-dependent crop units (§7.4.2.1.1: CropUnitX/Y from
    * SubWidthC/SubHeightC and frame_mbs_only_flag). The high-profile
    * branch (chroma_format_idc, bit depths, scaling matrix) is parsed for
    * position so Main/High streams read identically to Baseline. None on
    * anything truncated, non-SPS, or with hostile field values. */
  private[graft] def parseSps(nal: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (nal.length < 4 || (nal(0) & 0x1f) != 7) return None
    val r = new BitReader(rbspOf(nal, 1))
    val profile = r.u(8)
    r.u(8) // constraint_set flags + reserved_zero_2bits
    val level = r.u(8)
    r.ue() // seq_parameter_set_id
    var chroma = 1 // 4:2:0 is implied outside the high-profile branch
    var separateColour = 0
    if (HighProfileIdcs(profile)) {
      chroma = r.ue()
      if (chroma > 3) return None
      if (chroma == 3) separateColour = r.u1()
      r.ue(); r.ue() // bit_depth_{luma,chroma}_minus8
      r.u1() // qpprime_y_zero_transform_bypass_flag
      if (r.u1() == 1) { // seq_scaling_matrix_present_flag
        val n = if (chroma != 3) 8 else 12
        var i = 0
        while (i < n && r.ok) {
          if (r.u1() == 1) skipScalingList(r, if (i < 6) 16 else 64)
          i += 1
        }
      }
    }
    r.ue() // log2_max_frame_num_minus4
    val pocType = r.ue()
    if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
    else if (pocType == 1) {
      r.u1(); r.se(); r.se()
      val nRef = r.ue()
      if (nRef > 255) return None
      var i = 0
      while (i < nRef && r.ok) { r.se(); i += 1 }
    }
    r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num_value_allowed_flag
    val wMbs = r.ue() + 1
    val hUnits = r.ue() + 1
    val frameMbsOnly = r.u1()
    if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field_flag
    r.u1() // direct_8x8_inference_flag
    var cl = 0; var cr = 0; var ct = 0; var cb = 0
    if (r.u1() == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    if (!r.ok || wMbs > (1 << 14) || hUnits > (1 << 14)) return None
    // §7.4.2.1.1: ChromaArrayType is 0 for monochrome or separate colour
    // planes (crop counts luma samples); else crop units are the chroma
    // subsampling factors, height additionally doubled for field coding
    val chromaArrayType = if (separateColour == 1) 0 else chroma
    val (subW, subH) = chroma match {
      case 1 => (2, 2)
      case 2 => (2, 1)
      case _ => (1, 1)
    }
    val cropX = if (chromaArrayType == 0) 1 else subW
    val cropY =
      (if (chromaArrayType == 0) 1 else subH) * (2 - frameMbsOnly)
    val width = wMbs * 16 - cropX * (cl + cr)
    val height = (2 - frameMbsOnly) * hUnits * 16 - cropY * (ct + cb)
    if (width <= 0 || height <= 0) None
    else Some((profile, level, width, height))
  }

  /** H.264 track header metadata: stsd fourcc, SPS profile/level, SPS
    * display dimensions, and the container's frame / sync-sample
    * (keyframe) counts. */
  case class H264Meta(codec: String, profile: Int, level: Int,
      width: Int, height: Int, nFrames: Long, nKeyframes: Long)

  /** REAL H.264 header parse over an ISO-BMFF payload: walk to the first
    * trak whose stsd entry is `avc1`/`avc3`, read the `avcC` box nested
    * inside the VisualSampleEntry (14496-15 §5.3.3.1: config version,
    * then SPS count + length-prefixed SPS NALs), parse the first SPS for
    * profile/level/dimensions ([[parseSps]]), and count frames (stsz) and
    * keyframes — `stss` entry_count when present; absent stss means every
    * sample is a sync sample (14496-12 §8.6.2), so the keyframe count is
    * the frame count. Frame DECODE stays a documented codec-requiring
    * stub; every byte of the metadata surface is read for real. */
  def parseH264Meta(p: Array[Byte]): Option[H264Meta] = {
    if (p.length < 16) return None
    val sz0 = be32(p, 0)
    if (sz0 < 8 || sz0 > p.length || p(4) != 'f' || p(5) != 't'
        || p(6) != 'y' || p(7) != 'p') return None
    def u32(i: Int): Long = be32(p, i) & 0xffffffffL
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    var fourcc = ""
    var sps: Array[Byte] = null
    var frames = -1L
    var keys = -1L
    // per-trak candidates, committed when a trak closes with an avc entry
    var tFcc = ""; var tSps: Array[Byte] = null
    var tFrames = -1L; var tKeys = -1L
    def walk(from: Int, to: Int, depth: Int): Boolean = {
      var off = from
      while (off + 8 <= to) {
        var size = u32(off)
        var hdr = 8
        if (size == 0L) size = (to - off).toLong
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
            tFcc = ""; tSps = null; tFrames = -1L; tKeys = -1L
            if (!walk(body, end, depth + 1)) return false
            if (tSps != null && fourcc.isEmpty) {
              fourcc = tFcc; sps = tSps; frames = tFrames; keys = tKeys
            }
          case "stsd" =>
            // ver/flags(4) entry_count(4), then sample entry 1: box
            // header (size + fourcc), 78 VisualSampleEntry bytes, then
            // nested config boxes (avcC among them) to the entry's end
            if (body + 16 > end || u32(body + 4) < 1) return false
            val eSize = u32(body + 8)
            val eFcc = new String(p, body + 12, 4, "US-ASCII")
            if ((eFcc == "avc1" || eFcc == "avc3") &&
                eSize >= 86 && body + 8 + eSize <= end) {
              tFcc = eFcc
              val eEnd = (body + 8 + eSize).toInt
              var at = body + 8 + 86 // past the fixed VisualSampleEntry
              while (at + 8 <= eEnd && tSps == null) {
                val bsz = u32(at)
                if (bsz < 8 || at + bsz > eEnd) return false
                if (new String(p, at + 4, 4, "US-ASCII") == "avcC") {
                  // configVersion(1) profile(1) compat(1) level(1)
                  // reserved|lengthSizeMinusOne(1) reserved|numSPS(1)
                  // then per SPS: u16 length + NAL bytes
                  val cb = at + 8
                  if (cb + 8 > eEnd || (p(cb) & 0xff) != 1) return false
                  val nSps = p(cb + 5) & 0x1f
                  if (nSps < 1) return false
                  val ln = ((p(cb + 6) & 0xff) << 8) | (p(cb + 7) & 0xff)
                  if (cb + 8 + ln > eEnd) return false
                  tSps = java.util.Arrays.copyOfRange(p, cb + 8, cb + 8 + ln)
                }
                at = (at + bsz).toInt
              }
            }
          case "stsz" =>
            if (body + 12 > end) return false
            tFrames = u32(body + 8)
          case "stss" =>
            if (body + 8 > end) return false
            tKeys = u32(body + 4)
          case _ => ()
        }
        off = (off + size).toInt
      }
      off == to || from == to
    }
    if (!walk(0, p.length, 0)) return None
    if (sps == null || frames < 0L) return None
    parseSps(sps).map { case (profile, level, w, h) =>
      H264Meta(fourcc, profile, level, w, h, frames,
        if (keys >= 0L) keys else frames)
    }
  }

  /** MSB-first bit writer with Exp-Golomb encoding — the [[parseSps]]
    * inverse for the round-trip law and the q161 fixture. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def u1(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
    }
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val k = v + 1
      val bits = 32 - Integer.numberOfLeadingZeros(k)
      u(0, bits - 1); u(k, bits)
    }
    def rbspTrailing(): Array[Byte] = {
      u1(1) // rbsp_stop_one_bit
      while (nbits != 0) u1(0)
      buf.toArray
    }
  }

  /** Serialize a real SPS NAL (§7.3.2.1.1, frame_mbs_only, 4:2:0, POC
    * type 0; the high-profile chroma branch when profile requires it),
    * emulation-prevention-coded (§7.4.1). */
  private[graft] def buildSps(profile: Int, level: Int, wMbs: Int,
      hUnits: Int, cropRight: Int, cropBottom: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(profile, 8)
    w.u(0, 8) // constraint flags
    w.u(level, 8)
    w.ue(0) // sps id
    if (HighProfileIdcs(profile)) {
      w.ue(1) // chroma_format_idc: 4:2:0
      w.ue(0); w.ue(0) // bit depths
      w.u1(0) // transform bypass
      w.u1(0) // no scaling matrix
    }
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(0) // pic_order_cnt_type 0
    w.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1) // max_num_ref_frames
    w.u1(0) // gaps allowed
    w.ue(wMbs - 1)
    w.ue(hUnits - 1)
    w.u1(1) // frame_mbs_only
    w.u1(1) // direct_8x8_inference
    if (cropRight > 0 || cropBottom > 0) {
      w.u1(1); w.ue(0); w.ue(cropRight); w.ue(0); w.ue(cropBottom)
    } else w.u1(0)
    Array[Byte](0x67) ++ epbInsert(w.rbspTrailing()) // 0x67: ref-idc 3, type 7
  }

  /** Serialize a minimal-but-well-formed H.264 MP4: avc1 sample entry
    * with a nested avcC carrying the SPS, stsz frame count, stss sync
    * table (every `keyEvery`-th frame), an mdat stub (frame PAYLOADS need
    * a codec — the decode stub; this file carries every header byte the
    * metadata surface reads). The inverse of [[parseH264Meta]]. */
  def buildAvcMp4(profile: Int, level: Int, wMbs: Int, hUnits: Int,
      cropRight: Int, cropBottom: Int, nFrames: Int,
      keyEvery: Int, withStss: Boolean = true): Array[Byte] = {
    def box(typ: String, bodyBytes: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + bodyBytes.length)
      b.putInt(8 + bodyBytes.length).put(typ.getBytes("US-ASCII"))
        .put(bodyBytes)
      b.array()
    }
    val width = wMbs * 16 - 2 * cropRight
    val height = hUnits * 16 - 2 * cropBottom
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(8)
      .put("isom".getBytes("US-ASCII")).putInt(0x200).array())
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(600).putInt(25 * nFrames)
      b.array()
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0).putInt(0).putInt(0).putInt(1)
      b.position(76)
      b.putInt(width << 16).putInt(height << 16)
      b.array()
    }
    val sps = buildSps(profile, level, wMbs, hUnits, cropRight, cropBottom)
    val avcC = {
      val b = java.nio.ByteBuffer.allocate(8 + sps.length + 1)
      b.put(1.toByte).put(profile.toByte).put(0.toByte).put(level.toByte)
      b.put(0xff.toByte) // reserved | lengthSizeMinusOne = 3
      b.put(0xe1.toByte) // reserved | numSPS = 1
      b.putShort(sps.length.toShort).put(sps)
      b.put(0.toByte) // numPPS = 0 (header-only fixture)
      box("avcC", b.array())
    }
    val stsd = {
      val e = java.nio.ByteBuffer.allocate(86 + avcC.length)
      e.putInt(86 + avcC.length).put("avc1".getBytes("US-ASCII"))
      e.position(14); e.putShort(1) // data_reference_index
      e.position(32)
      e.putShort(width.toShort).putShort(height.toShort)
      e.putInt(0x00480000).putInt(0x00480000).putInt(0)
      e.putShort(1)
      e.position(82); e.putShort(24).putShort(-1)
      e.position(86); e.put(avcC)
      box("stsd", java.nio.ByteBuffer.allocate(8)
        .putInt(0).putInt(1).array() ++ e.array())
    }
    val stsz = box("stsz", java.nio.ByteBuffer.allocate(12)
      .putInt(0).putInt(1).putInt(nFrames).array()) // uniform size 1
    // `withStss = false` omits the sync table entirely — the 14496-12
    // §8.6.2 "no stss means every sample is sync" case, so the parser's
    // fallback is buildable and testable, not just claimed
    val stss =
      if (!withStss) Array.empty[Byte]
      else {
        val syncs = (1 to nFrames by keyEvery).toArray // 1-based sample ids
        val b = java.nio.ByteBuffer.allocate(8 + 4 * syncs.length)
        b.putInt(0).putInt(syncs.length)
        syncs.foreach(b.putInt)
        box("stss", b.array())
      }
    val trak = box("trak", box("tkhd", tkhd) ++
      box("mdia", box("minf", box("stbl", stsd ++ stsz ++ stss))))
    val moov = box("moov", box("mvhd", mvhd) ++ trak)
    val mdat = box("mdat", Array[Byte](0, 0, 0, 1)) // codec-requiring stub
    ftyp ++ moov ++ mdat
  }

  /** Deterministic H.264 fixture per document (the q143 twin for avc1):
    * profile/level/macroblock grid/crop/frame count are integer
    * arithmetic on doc_id — the Spark side serializes the avcC + SPS
    * bit-exactly and re-parses its own bytes, the oracle derives the
    * same values from the formula. Profiles cycle Baseline/Main/High so
    * the high-profile SPS branch is exercised through the oracle gate;
    * crops exercise the §7.4.2.1.1 crop-unit arithmetic. */
  def syntheticAvcCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val profile = (id % 3) match {
          case 0 => 66; case 1 => 77; case _ => 100
        }
        val level = (id % 3) match {
          case 0 => 30; case 1 => 31; case _ => 41
        }
        val wMbs = (1 + id % 8).toInt
        val hUnits = (1 + id % 6).toInt
        val cropR = (id % 2).toInt
        val cropB = if (id % 3 == 0) 1 else 0
        val nf = (10 + id % 20).toInt
        (id, buildAvcMp4(profile, level, wMbs, hUnits, cropR, cropB, nf,
          keyEvery = 5))
      })
      .toDF("doc_id", "payload")
  }

  /** H.264 header extraction over a (doc_id, payload binary) frame —
    * mapPartitions over the binary column (no shuffle, the featurizer
    * plan shape); non-BMFF / non-avc payloads are dropped. */
  def h264MetaBinary(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseH264Meta(bytes).map(m => (id, m.codec, m.profile, m.level,
          m.width, m.height, m.nFrames, m.nKeyframes))
      })
      .toDF("doc_id", "codec", "profile_idc", "level_idc", "width",
        "height", "n_frames", "n_keyframes")
  }

  /** WebM/Matroska header metadata: the EBML doctype, the first VIDEO
    * track's codec id and pixel dimensions, the segment duration in
    * milliseconds (−1 when the Info element carries none), and the
    * CuePoint count (the keyframe seek index — a cue per keyframe is the
    * muxer norm). */
  case class WebmMeta(docType: String, codec: String, width: Int,
      height: Int, durMs: Double, nCues: Long)

  /** EBML variable-length integer at `off`: (value, byteLength), or None
    * on malformed input (zero first byte = length > 8, or truncation).
    * `keepMarker` keeps the length-descriptor bit in the value (element
    * IDs compare marker-inclusive per RFC 8794 §5; data sizes strip it). */
  private def ebmlVint(p: Array[Byte], off: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (off >= p.length) return None
    val b0 = p(off) & 0xff
    if (b0 == 0) return None // length ≥ 9: larger than any registered id/size
    val n = Integer.numberOfLeadingZeros(b0) - 23
    if (off + n > p.length) return None
    var v: Long = if (keepMarker) b0 else b0 & ((1 << (8 - n)) - 1)
    var i = 1
    while (i < n) { v = (v << 8) | (p(off + i) & 0xff); i += 1 }
    Some((v, n))
  }

  /** REAL WebM/Matroska (EBML) header walk — RFC 8794 + the public
    * Matroska element registry, the BMFF/avcC discipline applied to the
    * OTHER container a crawl's video actually ships in: EBML header →
    * DocType; Segment → Info (TimestampScale, Duration), Tracks (first
    * TrackType==1 entry's CodecID + Video PixelWidth/PixelHeight — audio
    * and subtitle tracks are skipped, whatever their order), Cues
    * (CuePoint count = the keyframe seek index). Unknown-size elements
    * (the live-muxed Segment convention: a size vint of all ones) extend
    * to their parent's end per RFC 8794 §6.2; truncated vints, children
    * overrunning their parent, or depth > 8 are malformed → None, never
    * garbage. Frame DECODE (VP8/VP9/AV1) stays the documented
    * codec-requiring stub — this is the metadata surface curation
    * queries run. */
  def parseWebmMeta(p: Array[Byte]): Option[WebmMeta] = {
    if (p.length < 8) return None
    var docType = ""; var codec = ""; var width = -1; var height = -1
    var tsScale = 1000000L; var duration = -1.0; var nCues = -1L
    def uintAt(body: Int, end: Int): Long = {
      var v = 0L; var i = body
      while (i < end) { v = (v << 8) | (p(i) & 0xff); i += 1 }
      v
    }
    def floatAt(body: Int, end: Int): Double = (end - body) match {
      case 4 => java.lang.Float.intBitsToFloat(be32(p, body)).toDouble
      case 8 => java.lang.Double.longBitsToDouble(
        ((be32(p, body) & 0xffffffffL) << 32) |
          (be32(p, body + 4) & 0xffffffffL))
      case _ => Double.NaN // 0- or 10-byte floats: not in WebM profiles
    }
    def strAt(body: Int, end: Int): String =
      new String(p, body, end - body, "US-ASCII")
    // iterate `from..to` as EBML children, dispatching (id, body, end);
    // returns false on any structural malformation
    def children(from: Int, to: Int, depth: Int)(
        f: (Long, Int, Int) => Boolean): Boolean = {
      if (depth > 8) return false
      var off = from
      while (off < to) {
        val idv = ebmlVint(p, off, keepMarker = true)
        if (idv.isEmpty) return false
        val (id, idN) = idv.get
        val szv = ebmlVint(p, off + idN, keepMarker = false)
        if (szv.isEmpty) return false
        val (sz, szN) = szv.get
        val body = off + idN + szN
        // all-ones data bits = unknown size: element runs to parent end
        // (any vint LENGTH is legal for the marker — libavformat's
        // live-muxed Segments carry the canonical 8-byte form, whose
        // 2^56−1 value must not trip the size-sanity guard below)
        val unknown = sz == (1L << (7 * szN)) - 1
        val end = if (unknown) to.toLong else body + sz
        if (end > to || body > to || (!unknown && sz > Int.MaxValue))
          return false
        if (!f(id, body, end.toInt)) return false
        off = end.toInt
      }
      off == to || from == to
    }
    val ok = children(0, p.length, 0) { (id, body, end) =>
      id match {
        case 0x1A45DFA3L => // EBML header
          children(body, end, 1) { (id2, b2, e2) =>
            if (id2 == 0x4282L) docType = strAt(b2, e2)
            true
          }
        case 0x18538067L => // Segment
          children(body, end, 1) { (id2, b2, e2) =>
            id2 match {
              case 0x1549A966L => // Info
                children(b2, e2, 2) { (id3, b3, e3) =>
                  if (id3 == 0x2AD7B1L) tsScale = uintAt(b3, e3)
                  else if (id3 == 0x4489L) duration = floatAt(b3, e3)
                  true
                }
              case 0x1654AE6BL => // Tracks
                children(b2, e2, 2) { (id3, b3, e3) =>
                  if (id3 == 0xAEL) { // TrackEntry
                    var tType = -1L; var tCodec = ""
                    var tW = -1; var tH = -1
                    val tok = children(b3, e3, 3) { (id4, b4, e4) =>
                      id4 match {
                        case 0x83L => tType = uintAt(b4, e4); true
                        case 0x86L => tCodec = strAt(b4, e4); true
                        case 0xE0L => // Video — malformation PROPAGATES
                          children(b4, e4, 4) { (id5, b5, e5) =>
                            if (id5 == 0xB0L) tW = uintAt(b5, e5).toInt
                            else if (id5 == 0xBAL) tH = uintAt(b5, e5).toInt
                            true
                          }
                        case _ => true
                      }
                    }
                    if (!tok) false
                    else {
                      if (tType == 1L && codec.isEmpty && tW > 0 && tH > 0) {
                        codec = tCodec; width = tW; height = tH
                      }
                      true
                    }
                  } else true
                }
              case 0x1C53BB6BL => // Cues
                nCues = 0L
                children(b2, e2, 2) { (id3, _, _) =>
                  if (id3 == 0xBBL) nCues += 1
                  true
                }
              case _ => true // Cluster/SeekHead/Tags/…: skipped whole
            }
          }
        case _ => true
      }
    }
    if (!ok || docType.isEmpty || codec.isEmpty || width <= 0 || height <= 0)
      None
    else Some(WebmMeta(docType, codec, width, height,
      if (duration >= 0) duration * tsScale / 1e6 else -1.0,
      math.max(nCues, 0L)))
  }

  /** EBML writer primitives + a WebM fixture synthesizer — the
    * [[parseWebmMeta]] inverse for the round-trip law and the q168
    * fixture. `unknownSizeSegment` encodes the Segment with the all-ones
    * size vint (the live-muxing convention); `audioFirst` puts an Opus
    * audio track BEFORE the video entry so track-type skipping is
    * exercised, not assumed. */
  def buildWebm(codec: String, width: Int, height: Int,
      durationUnits: Double, nCues: Int, audioFirst: Boolean = false,
      unknownSizeSegment: Boolean = false): Array[Byte] = {
    def idBytes(id: Long): Array[Byte] = {
      val n = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
        else if (id <= 0xffffffL) 3 else 4
      (1 to n).map(i => ((id >> (8 * (n - i))) & 0xff).toByte).toArray
    }
    def sizeBytes(v: Long): Array[Byte] = {
      var n = 1
      while (v >= (1L << (7 * n)) - 1) n += 1 // all-ones is reserved
      val marked = v | (1L << (7 * n))
      (1 to n).map(i => ((marked >> (8 * (n - i))) & 0xff).toByte).toArray
    }
    def elem(id: Long, body: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeBytes(body.length.toLong) ++ body
    def uint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >> (8 * n)) != 0) n += 1
      (1 to n).map(i => ((v >> (8 * (n - i))) & 0xff).toByte).toArray
    }
    def f64(d: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(d)
      (0 to 7).map(i => ((bits >> (8 * (7 - i))) & 0xff).toByte).toArray
    }
    val hdr = elem(0x1A45DFA3L,
      elem(0x4286L, uint(1)) ++ elem(0x42F7L, uint(1)) ++
        elem(0x42F2L, uint(4)) ++ elem(0x42F3L, uint(8)) ++
        elem(0x4282L, "webm".getBytes("US-ASCII")) ++
        elem(0x4287L, uint(2)) ++ elem(0x4285L, uint(2)))
    val info = elem(0x1549A966L,
      elem(0x2AD7B1L, uint(1000000L)) ++ elem(0x4489L, f64(durationUnits)))
    val video = elem(0xAEL,
      elem(0xD7L, uint(1)) ++ elem(0x73C5L, uint(1)) ++
        elem(0x83L, uint(1)) ++
        elem(0x86L, codec.getBytes("US-ASCII")) ++
        elem(0xE0L, elem(0xB0L, uint(width.toLong)) ++
          elem(0xBAL, uint(height.toLong))))
    val audio = elem(0xAEL,
      elem(0xD7L, uint(2)) ++ elem(0x73C5L, uint(2)) ++
        elem(0x83L, uint(2)) ++
        elem(0x86L, "A_OPUS".getBytes("US-ASCII")) ++
        elem(0xE1L, elem(0xB5L, f64(48000.0))))
    val tracks = elem(0x1654AE6BL,
      if (audioFirst) audio ++ video else video ++ audio)
    val cues = elem(0x1C53BB6BL,
      (0 until nCues).map(i => elem(0xBBL,
        elem(0xB3L, uint(i * 1000L)) ++
          elem(0xB7L, elem(0xF7L, uint(1)) ++
            elem(0xF1L, uint(4096L + i)))))
        .foldLeft(Array.emptyByteArray)(_ ++ _))
    // one Cluster with a minimal SimpleBlock so the walk has media-level
    // siblings to skip, as real files do
    val cluster = elem(0x1F43B675L,
      elem(0xE7L, uint(0)) ++
        elem(0xA3L, Array[Byte](0x81.toByte, 0, 0, 0x80.toByte, 1, 2, 3)))
    val segBody = info ++ tracks ++ cues ++ cluster
    // the canonical 8-byte all-ones marker (0x01FFFFFFFFFFFFFF) — what
    // live muxers actually write; its 2^56−1 value exercises the
    // unknown-size branch of the parser's size-sanity guard
    val segment =
      if (unknownSizeSegment)
        idBytes(0x18538067L) ++
          (Array(0x01) ++ Array.fill(7)(0xff)).map(_.toByte) ++ segBody
      else elem(0x18538067L, segBody)
    hdr ++ segment
  }

  /** Deterministic per-doc WebM corpus: codec cycles VP8/VP9/AV1, dims /
    * cue count / duration are integer arithmetic on doc_id (so the q168
    * oracle predicts every field closed-form), every 4th doc leads with
    * the audio track, every 5th uses an unknown-size Segment. */
  def syntheticWebmCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val codec = (id % 3) match {
          case 0 => "V_VP8"; case 1 => "V_VP9"; case _ => "V_AV1"
        }
        (id, buildWebm(codec,
          width = (64 + (id % 97) * 2).toInt,
          height = (36 + ((id * 3) % 83) * 2).toInt,
          durationUnits = (1000 + id % 500).toDouble,
          nCues = (1 + id % 12).toInt,
          audioFirst = id % 4 == 0,
          unknownSizeSegment = id % 5 == 0))
      })
      .toDF("doc_id", "payload")
  }

  /** WebM header extraction over a (doc_id, payload binary) frame —
    * mapPartitions over the binary column (no shuffle, the featurizer
    * plan shape); non-EBML / video-track-less payloads are dropped. */
  def webmMetaBinary(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWebmMeta(bytes).map(m => (id, m.docType, m.codec, m.width,
          m.height, m.durMs, m.nCues))
      })
      .toDF("doc_id", "doc_type", "codec", "width", "height", "dur_ms",
        "n_cues")
  }

  /** REAL GIF decode — JDK-only, the PNG/JPEG discipline applied to
    * GIF87a/89a: header + logical-screen-descriptor walk, global/local
    * color tables, extension-block skipping (GCE/comment/application),
    * then the FIRST image descriptor's LZW-compressed index stream —
    * LSB-first variable-width codes over concatenated sub-blocks, the
    * standard dictionary growth (first free = clear+2, width bump when
    * the table reaches 2^codeSize, add-skip at 4096 so deferred-clear
    * encoders decode too), Adam-style 4-pass interlace reorder when the
    * descriptor flags it, palette expansion to interleaved RGB. Returns
    * (width, height, 3, pixels) in the [[decodePngPixels]] shape;
    * animated GIFs decode their first frame (the standard still-image
    * semantics); malformed streams, oversized dims, frames outside the
    * canvas and out-of-palette indices are None, never garbage. */
  def decodeGifPixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < 14 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F'
        || p(3) != '8' || (p(4) != '7' && p(4) != '9') || p(5) != 'a')
      return None
    try {
      val w = le16(p, 6)
      val h = le16(p, 8)
      if (w <= 0 || h <= 0 || w.toLong * h * 3 > (1L << 28)) return None
      val packed = p(10) & 0xff
      var off = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 7) + 1)
        if (off + 3 * n > p.length) return None
        gct = java.util.Arrays.copyOfRange(p, off, off + 3 * n)
        off += 3 * n
      }
      while (off < p.length) {
        (p(off) & 0xff) match {
          case 0x3b => return None // trailer before any image
          case 0x21 => // extension: label, then sub-blocks to terminator
            off += 2
            while (off < p.length && p(off) != 0) off += 1 + (p(off) & 0xff)
            if (off >= p.length) return None
            off += 1
          case 0x2c =>
            if (off + 10 > p.length) return None
            val left = le16(p, off + 1)
            val top = le16(p, off + 3)
            val iw = le16(p, off + 5)
            val ih = le16(p, off + 7)
            val ip = p(off + 9) & 0xff
            off += 10
            if (iw <= 0 || ih <= 0 || left + iw > w || top + ih > h)
              return None
            var pal = gct
            if ((ip & 0x80) != 0) {
              val n = 1 << ((ip & 7) + 1)
              if (off + 3 * n > p.length) return None
              pal = java.util.Arrays.copyOfRange(p, off, off + 3 * n)
              off += 3 * n
            }
            if (pal == null) return None
            val palSize = pal.length / 3
            val interlaced = (ip & 0x40) != 0
            // concatenate the data sub-blocks
            if (off >= p.length) return None
            val minCode = p(off) & 0xff
            if (minCode < 1 || minCode > 11) return None
            off += 1
            val data = new java.io.ByteArrayOutputStream()
            while (off < p.length && p(off) != 0) {
              val n = p(off) & 0xff
              if (off + 1 + n > p.length) return None
              data.write(p, off + 1, n)
              off += 1 + n
            }
            if (off >= p.length) return None
            val d = data.toByteArray
            // LZW decode to iw*ih palette indices
            val idx = new Array[Byte](iw * ih)
            val clear = 1 << minCode
            val eoi = clear + 1
            val prefix = new Array[Int](4096)
            val suffix = new Array[Byte](4096)
            var next = eoi + 1
            var codeSize = minCode + 1
            var prev = -1
            var bitPos = 0L
            var out = 0
            val stack = new Array[Byte](4096)
            def readCode(): Int = {
              if (bitPos + codeSize > d.length * 8L) return -1
              var v = 0
              var i = 0
              while (i < codeSize) {
                val bp = bitPos + i
                if ((d((bp >> 3).toInt) >> (bp & 7) & 1) != 0) v |= 1 << i
                i += 1
              }
              bitPos += codeSize
              v
            }
            def firstByteOf(code: Int): Byte = {
              var c = code
              while (c >= clear) c = prefix(c)
              c.toByte
            }
            def emit(code: Int): Boolean = { // expand via the prefix chain
              var c = code
              var sp = 0
              while (c >= clear) {
                if (sp >= 4096 || c >= next) return false
                stack(sp) = suffix(c); sp += 1; c = prefix(c)
              }
              if (c >= palSize) return false
              if (out + sp + 1 > idx.length) return false
              idx(out) = c.toByte; out += 1
              while (sp > 0) { sp -= 1; idx(out) = stack(sp); out += 1 }
              true
            }
            var done = false
            while (!done && out < idx.length) {
              val code = readCode()
              if (code < 0 || code > next || code == eoi) done = true
              else if (code == clear) {
                next = eoi + 1; codeSize = minCode + 1; prev = -1
              } else if (prev < 0) {
                if (code >= clear || code >= palSize) return None
                idx(out) = code.toByte; out += 1
                prev = code
              } else {
                // code == next is the KwKwK case: str(prev)+first(prev),
                // which is exactly the entry being added this step
                val kwk = code == next
                if (kwk && next >= 4096) return None // nothing to refer to
                val first =
                  if (kwk) firstByteOf(prev) else firstByteOf(code)
                if (next < 4096) { // table full: decode only, no add
                  prefix(next) = prev; suffix(next) = first
                  next += 1
                  if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
                }
                if (kwk) { // emit the just-added entry: str(prev) + first
                  if (!emit(prev)) return None
                  // the trailing first-byte is part of the KwKwK unit: no
                  // room means the stream encodes more pixels than iw*ih —
                  // malformed, rejected like emit()'s own overflow path
                  if (out >= idx.length) return None
                  idx(out) = first; out += 1
                } else if (!emit(code)) return None
                prev = code
              }
            }
            if (out != idx.length) return None
            // interlace: sequential rows land in 4-pass order
            val rows =
              if (!interlaced) (0 until ih).toArray
              else {
                val order = new Array[Int](ih)
                var r = 0
                for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                     y <- start until ih by step) { order(r) = y; r += 1 }
                order
              }
            val outPx = new Array[Byte](w * h * 3)
            var rSeq = 0
            while (rSeq < ih) {
              val y = top + rows(rSeq)
              var x = 0
              while (x < iw) {
                val pi = (idx(rSeq * iw + x) & 0xff)
                if (pi >= palSize) return None
                val o = (y * w + left + x) * 3
                outPx(o) = pal(pi * 3)
                outPx(o + 1) = pal(pi * 3 + 1)
                outPx(o + 2) = pal(pi * 3 + 2)
                x += 1
              }
              rSeq += 1
            }
            return Some((w, h, 3, outPx))
          case _ => return None
        }
      }
      None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Serialize a real GIF89a — global color table, optional interlace,
    * a REAL LZW encoder (dictionary growth, width bumps mirroring the
    * decoder's schedule, clear-and-reset at table-full) — the inverse of
    * [[decodeGifPixels]] for the round-trip law and the q151 fixture.
    * `palette` is (r,g,b) per index (length a power of two, 2..256);
    * `pixel(x, y)` gives the palette index. */
  def buildGif(w: Int, h: Int, palette: Array[(Int, Int, Int)],
      pixel: (Int, Int) => Int, interlace: Boolean = false): Array[Byte] = {
    val palSize = palette.length
    require(palSize >= 2 && (palSize & (palSize - 1)) == 0 && palSize <= 256,
      "palette size must be a power of two in 2..256")
    val bits = 31 - Integer.numberOfLeadingZeros(palSize) // log2
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | ((bits - 1) & 7)) // GCT present, size 2^bits
    out.write(0); out.write(0) // bg index, aspect
    palette.foreach { case (r, g, b) =>
      out.write(r); out.write(g); out.write(b) }
    // image descriptor: full canvas
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(if (interlace) 0x40 else 0)
    // indices in stream order (interlace reorders rows)
    val rows =
      if (!interlace) (0 until h).toArray
      else Seq((0, 8), (4, 8), (2, 4), (1, 2))
        .flatMap { case (s, st) => s until h by st }.toArray
    val idx = new Array[Int](w * h)
    var k = 0
    rows.foreach { y =>
      var x = 0
      while (x < w) { idx(k) = pixel(x, y); k += 1; x += 1 }
    }
    // LZW encode
    val minCode = math.max(2, bits) // spec: minimum code size >= 2
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    val bytes = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var nBits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) {
        bytes.write((cur & 0xff).toInt); cur >>= 8; nBits -= 8
      }
    }
    var dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    put(clear)
    var wCode = idx(0)
    var i = 1
    while (i < idx.length) {
      val key = wCode.toLong << 12 | idx(i)
      val hit = dict.get(key)
      if (hit != null) wCode = hit
      else {
        put(wCode)
        if (next < 4096) {
          dict.put(key, next)
          next += 1
          // mirror of the decoder's bump (decoder adds lag one code, so
          // the encoder widens when next EXCEEDS the current ceiling)
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        } else { // table full: clear and restart
          put(clear)
          dict = new java.util.HashMap[Long, Integer]()
          next = eoi + 1
          codeSize = minCode + 1
        }
        wCode = idx(i)
      }
      i += 1
    }
    put(wCode)
    put(eoi)
    if (nBits > 0) bytes.write((cur & 0xff).toInt)
    // sub-blocks of <= 255 bytes + terminator + trailer
    val b = bytes.toByteArray
    var o = 0
    while (o < b.length) {
      val n = math.min(255, b.length - o)
      out.write(n)
      out.write(b, o, n)
      o += n
    }
    out.write(0)
    out.write(0x3b)
    out.toByteArray
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
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
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

  /** One featurizer for every media payload: PCM WAV → per-band RMS
    * energies ([[featurizeWavBands]]), baseline grayscale JPEG → decoded
    * per-strip pixel means ([[decodeJpegPixels]]), PNG pixels → channel
    * means ([[featurizePixels]]), anything codec-requiring → the
    * deterministic stub. All land in [0, 1]^dim. */
  def featurizeMedia(payload: Array[Byte], dim: Int): Array[Double] =
    featurizeWavBands(payload, dim)
      .orElse(decodeJpegPixels(payload).map { case (_, _, _, px) =>
        // dim equal pixel strips, normalized mean each — the grayscale
        // analogue of the WAV energy envelope
        val out = new Array[Double](dim)
        if (px.nonEmpty) {
          val win = math.max(1, (px.length + dim - 1) / dim)
          var b = 0
          while (b < dim) {
            val from = b * win
            val to = math.min(px.length, from + win)
            if (from < to) {
              var acc = 0L
              var i = from
              while (i < to) { acc += px(i) & 0xff; i += 1 }
              out(b) = acc.toDouble / (to - from) / 255.0
            }
            b += 1
          }
        }
        out
      })
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

  // ---- REAL baseline JPEG decode (ITU-T T.81) ----

  /** Zig-zag index k → natural (row-major) coefficient position
    * (ITU-T T.81 Figure 5). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) at (x, u) — the 1-D IDCT basis, shared by rows
    * and columns of the 2-D separable transform. */
  private val IdctCos: Array[Double] =
    Array.tabulate(64)(i => math.cos((2 * (i / 8) + 1) * (i % 8) * math.Pi / 16))
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Canonical Huffman decode tables from a DHT segment's (BITS, HUFFVAL)
    * — mincode/maxcode/valptr per code length, the ITU-T T.81 Annex F.2.2.3
    * DECODE procedure's working set. */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: JpegBitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (l > 16) throw new java.io.IOException("bad Huffman code")
      vals(valPtr(l) + code - minCode(l)) & 0xff
    }
  }

  /** Entropy-coded-segment bit reader with 0xFF00 byte unstuffing; RSTn
    * markers are surfaced to the MCU loop (byte-aligned, prediction
    * reset), EOI/any other marker ends the stream. */
  private final class JpegBitReader(p: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nBits = 0
    var atMarker = 0 // 0 = none; else the marker byte just hit
    def bit(): Int = {
      if (nBits == 0) {
        if (atMarker != 0 || pos >= p.length)
          throw new java.io.IOException("bit read past segment end")
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= p.length) throw new java.io.IOException("truncated")
          val m = p(pos) & 0xff
          pos += 1
          if (m != 0x00) { atMarker = m; throw new java.io.IOException("marker in data") }
          b = 0xff
        }
        cur = b
        nBits = 8
      }
      nBits -= 1
      (cur >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      nBits = 0
      if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xff
          || (p(pos + 1) & 0xff) < 0xd0 || (p(pos + 1) & 0xff) > 0xd7)
        throw new java.io.IOException("expected RST marker")
      pos += 2
    }
  }

  /** EXTEND (ITU-T T.81 F.2.2.1): map the `s` received magnitude bits to
    * the signed coefficient value. */
  private def extendSign(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Full 2-D IDCT of one natural-order coefficient block (T.81 A.3.3),
    * level shift, clamp, store at (bx, by) of a padded component plane —
    * shared by the baseline MCU loop and the progressive final pass. */
  private def idctToPlane(coef: Array[Int], plane: Array[Byte], pw: Int,
      bx: Int, by: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          val cosY = IdctCos(y * 8 + v)
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) InvSqrt2 else 1.0
              acc += cu * cv * c * IdctCos(x * 8 + u) * cosY
            }
            u += 1
          }
          v += 1
        }
        val px = math.round(acc / 4.0 + 128.0).toInt
        plane((by + y) * pw + (bx + x)) =
          (if (px < 0) 0 else if (px > 255) 255 else px).toByte
        x += 1
      }
      y += 1
    }
  }

  /** Crop the padded component planes to (w, h) output — grayscale copy
    * or JFIF YCbCr → RGB with nearest-neighbor chroma upsampling (see
    * the color notes on [[decodeJpegPixels]]). */
  private def assemblePlanes(w: Int, h: Int, nComp: Int,
      planes: Array[Array[Byte]], planeW: Array[Int], sampH: Array[Int],
      sampV: Array[Int], hMax: Int, vMax: Int): (Int, Int, Int, Array[Byte]) =
    if (nComp == 1) {
      val pw = planeW(0)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * pw, out, y * w, w)
        y += 1
      }
      (w, h, 1, out)
    } else {
      val out = new Array[Byte](w * h * 3)
      def cl(d: Double): Byte = { // parity round: see rgbToYcc
        val r = roundPar(d)
        (if (r < 0) 0 else if (r > 255) 255 else r).toByte
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def samp(c: Int): Int = planes(c)(
            (y * sampV(c) / vMax) * planeW(c) + (x * sampH(c) / hMax)) & 0xff
          val yv = samp(0)
          val cb = samp(1) - 128
          val cr = samp(2) - 128
          val o = (y * w + x) * 3
          out(o) = cl(yv + 1.402 * cr)
          out(o + 1) = cl(yv - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = cl(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      (w, h, 3, out)
    }

  /** REAL baseline JPEG pixel decode — JDK-only, the PNG-decode
    * discipline applied to ITU-T T.81: marker walk (DQT with multiple
    * 8/16-bit tables, DHT canonical Huffman build per Annex C, SOF0,
    * DRI), then the Annex F sequential entropy decoder — byte-unstuffed
    * bit reading, Huffman DC category + EXTEND with cross-block DC
    * prediction, the AC run/size loop with EOB and ZRL over zig-zag
    * order, dequantization, full 64-coefficient 2-D IDCT, level shift,
    * clamp, edge-block crop, restart-interval handling.
    *
    * Scope (honestly bounded, like the PNG decoder's): baseline SOF0,
    * single-component grayscale or 3-component YCbCr with sampling
    * factors up to 2×2 — 4:4:4, 4:2:2 and 4:2:0 MCU geometries
    * (interleaved data units in T.81 B.2.3 order, per-component DC
    * prediction, nearest-neighbor chroma upsampling, JFIF YCbCr→RGB
    * after the IDCT) — returns (width, height, channels, row-major
    * interleaved pixels), the [[decodePngPixels]] shape. PROGRESSIVE
    * (SOF2) frames take the multi-scan buffered-coefficient path
    * ([[decodeJpegProgressive]] — spectral selection, successive
    * approximation, EOB runs). Sampling factors beyond 2 and
    * arithmetic coding return None and stay on the metadata/stub path.
    *
    * Truncation contract: any stream that ends MID-scan is rejected
    * (None), baseline and progressive alike. A progressive stream cut
    * cleanly BETWEEN scans decodes its completed passes — a coarser
    * image by SOF2's own refinement semantics, best-effort by design —
    * unless zero scans completed, which is None like the baseline case.
    */
  def decodeJpegPixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    try {
      val quant = new Array[Array[Int]](4) // per table id, zig-zag order
      val dcTables = new Array[HuffTable](4)
      val acTables = new Array[HuffTable](4)
      var w = 0
      var h = 0
      var nComp = 0
      val qTab = Array.fill(3)(-1) // per component: quant table id
      val dcSel = Array.fill(3)(-1) // per component: SOS table selectors
      val acSel = Array.fill(3)(-1)
      val sampH = Array.fill(3)(1) // per component: sampling factors
      val sampV = Array.fill(3)(1)
      var restartInterval = 0
      var progressive = false
      val compId = Array.fill(3)(0) // SOF component ids (scan selectors)
      var sosMarkerAt = -1 // progressive: first SOS marker position
      var i = 2
      var sosAt = -1
      while (sosAt < 0) {
        if (i + 1 >= p.length) return None
        if ((p(i) & 0xff) != 0xff) return None
        var j = i
        while (j < p.length && (p(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= p.length) return None
        val marker = p(j) & 0xff
        if (marker == 0xd9) return None // EOI before SOS
        if (marker >= 0xd0 && marker <= 0xd8) { i = j + 1 }
        else {
          if (j + 2 >= p.length) return None
          val len = be16(p, j + 1)
          val seg = j + 3 // first payload byte
          val segEnd = j + 1 + len
          if (len < 2 || segEnd > p.length) return None
          marker match {
            case 0xdb => // DQT: one or more tables
              var q = seg
              while (q < segEnd) {
                val pq = (p(q) & 0xff) >> 4
                val tq = p(q) & 0x0f
                val n = if (pq == 0) 64 else 128
                if (tq > 3 || q + 1 + n > segEnd) return None
                quant(tq) = Array.tabulate(64)(k =>
                  if (pq == 0) p(q + 1 + k) & 0xff else be16(p, q + 1 + 2 * k))
                q += 1 + n
              }
            case 0xc4 => // DHT: one or more tables
              var q = seg
              while (q < segEnd) {
                val tc = (p(q) & 0xff) >> 4
                val th = p(q) & 0x0f
                if (tc > 1 || th > 3 || q + 17 > segEnd) return None
                val bits = Array.tabulate(16)(k => p(q + 1 + k) & 0xff)
                val nv = bits.sum
                if (q + 17 + nv > segEnd) return None
                val vals = java.util.Arrays.copyOfRange(p, q + 17, q + 17 + nv)
                val t = new HuffTable(bits, vals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                q += 17 + nv
              }
            case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
              progressive = marker == 0xc2
              if (seg + 6 > segEnd || (p(seg) & 0xff) != 8) return None
              h = be16(p, seg + 1)
              w = be16(p, seg + 3)
              nComp = p(seg + 5) & 0xff
              if ((nComp != 1 && nComp != 3) ||
                  seg + 6 + 3 * nComp > segEnd) return None
              for (c <- 0 until nComp) {
                compId(c) = p(seg + 6 + 3 * c) & 0xff
                val sv = p(seg + 7 + 3 * c) & 0xff
                sampH(c) = sv >> 4
                sampV(c) = sv & 0x0f
                // sampling factors 1 or 2 per axis cover gray, 4:4:4,
                // 4:2:2 and 4:2:0; anything else → None
                if (sampH(c) < 1 || sampH(c) > 2 ||
                    sampV(c) < 1 || sampV(c) > 2) return None
                qTab(c) = p(seg + 8 + 3 * c) & 0x0f
              }
            case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
                 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              return None // extended/lossless/arithmetic frame types
            case 0xdd => // DRI
              if (seg + 2 > segEnd) return None
              restartInterval = be16(p, seg)
            case 0xda => // SOS: components in frame order (our writers')
              if (progressive) {
                // progressive scans are parsed (and re-parsed per scan,
                // with inter-scan DHT/DRI updates) by the scan loop;
                // record the 0xFF marker-start (i), not the code byte (j)
                sosMarkerAt = i
                sosAt = segEnd // exits the walk
              } else {
                val ns = p(seg) & 0xff
                if (ns != nComp || ns < 1 ||
                    seg + 1 + 2 * ns + 3 > segEnd) return None
                for (c <- 0 until ns) {
                  dcSel(c) = (p(seg + 2 + 2 * c) & 0xff) >> 4
                  acSel(c) = p(seg + 2 + 2 * c) & 0x0f
                }
                sosAt = segEnd
              }
            case _ => () // APPn / COM / foreign: skipped by length
          }
          i = segEnd
        }
      }
      if (w <= 0 || h <= 0 || nComp == 0) return None
      if (nComp == 1) { // single-component scans ignore sampling factors
        sampH(0) = 1; sampV(0) = 1
      }
      if (w.toLong * h * nComp > (1L << 28)) return None // hostile dims
      for (c <- 0 until nComp)
        if (qTab(c) < 0 || quant(qTab(c)) == null) return None
      if (progressive) {
        // Tighter cap for SOF2: the progressive path buffers a full Int
        // coefficient plane per component (4 B/sample, MCU-padded) BEFORE
        // any entropy data validates, so size the guard by that 4×
        // footprint — 2^26 samples ≈ 256 MiB of coefficient buffers,
        // vs the baseline path's byte planes under the 2^28 cap above.
        if (w.toLong * h * nComp > (1L << 26)) return None
        return decodeJpegProgressive(p, sosMarkerAt, w, h, nComp, compId,
          qTab, sampH, sampV, quant, dcTables, acTables, restartInterval)
      }
      for (c <- 0 until nComp)
        if (dcTables(dcSel(c)) == null || acTables(acSel(c)) == null)
          return None
      val hMax = (0 until nComp).map(sampH).max
      val vMax = (0 until nComp).map(sampV).max
      // MCU grid of 8·hMax × 8·vMax pixel tiles (16×16 for 4:2:0)
      val mcuCols = (w + 8 * hMax - 1) / (8 * hMax)
      val mcuRows = (h + 8 * vMax - 1) / (8 * vMax)
      // per-component planes at their own sampled resolution, padded to
      // the MCU grid so block stores never bound-check
      val planeW = Array.tabulate(nComp)(c => mcuCols * sampH(c) * 8)
      val planeH = Array.tabulate(nComp)(c => mcuRows * sampV(c) * 8)
      val planes =
        Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))
      val br = new JpegBitReader(p, sosAt)
      val coef = new Array[Int](64)
      val pred = new Array[Int](nComp)
      var mcu = 0
      val nMcu = mcuCols * mcuRows
      while (mcu < nMcu) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          java.util.Arrays.fill(pred, 0)
        }
        val mcuX = mcu % mcuCols
        val mcuY = mcu / mcuCols
        var comp = 0
        while (comp < nComp) { // interleaved: sampH×sampV blocks per comp
          val qt = quant(qTab(comp))
          val dcT = dcTables(dcSel(comp))
          val acT = acTables(acSel(comp))
          val plane = planes(comp)
          val pw = planeW(comp)
          var blk = 0
          val nBlk = sampH(comp) * sampV(comp)
          while (blk < nBlk) {
            java.util.Arrays.fill(coef, 0)
            // DC: category via Huffman, magnitude bits, EXTEND, prediction
            val s = dcT.decode(br)
            if (s > 11) return None
            pred(comp) += extendSign(br.receive(s), s)
            coef(0) = pred(comp) * qt(0)
            // AC: run/size loop over zig-zag positions 1..63
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acT.decode(br)
              val r = rs >> 4
              val sz = rs & 0x0f
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL: sixteen zeros
                else eob = true
              } else {
                k += r
                if (k > 63) return None
                coef(ZigZag(k)) = extendSign(br.receive(sz), sz) * qt(k)
                k += 1
              }
            }
            // full 2-D IDCT (T.81 A.3.3), level shift, clamp; blocks are
            // ordered left-to-right, top-to-bottom within the MCU (B.2.3)
            val bx = (mcuX * sampH(comp) + blk % sampH(comp)) * 8
            val by = (mcuY * sampV(comp) + blk / sampH(comp)) * 8
            idctToPlane(coef, plane, pw, bx, by)
            blk += 1
          }
          comp += 1
        }
        mcu += 1
      }
      Some(assemblePlanes(w, h, nComp, planes, planeW, sampH, sampV,
        hMax, vMax))
    } catch { case _: java.io.IOException | _: ArrayIndexOutOfBoundsException =>
      None }
  }

  /** PROGRESSIVE (SOF2) decode — the multi-scan half of
    * [[decodeJpegPixels]] (ITU-T T.81 G.2): coefficients for every block
    * of every component are buffered across scans; each SOS carries a
    * spectral band (Ss..Se) and a successive-approximation stage
    * (Ah → Al) and refines the buffer — DC-first with the baseline
    * category+EXTEND coding of `diff ÷ 2^Al`, DC-refine one bit per
    * block, AC-first with end-of-band (EOBn) run coding, AC-refine with
    * the correction-bit algorithm of G.1.2.3 (run lengths count
    * ZERO-HISTORY positions; every nonzero-history coefficient passed
    * appends one correction bit). DHT/DQT/DRI segments between scans
    * update the live tables; interleaved multi-component DC scans use
    * the MCU geometry, single-component scans the component's own
    * (unpadded) block grid; restart intervals reset predictions and the
    * EOB run. The IDCT runs ONCE, after the last scan.
    */
  private def decodeJpegProgressive(p: Array[Byte], firstSos: Int, w: Int,
      h: Int, nComp: Int, compId: Array[Int], qTab: Array[Int],
      sampH: Array[Int], sampV: Array[Int], quant: Array[Array[Int]],
      dcTables: Array[HuffTable], acTables: Array[HuffTable],
      restartInterval0: Int): Option[(Int, Int, Int, Array[Byte])] = {
    var restartInterval = restartInterval0
    val hMax = (0 until nComp).map(sampH).max
    val vMax = (0 until nComp).map(sampV).max
    val mcuCols = (w + 8 * hMax - 1) / (8 * hMax)
    val mcuRows = (h + 8 * vMax - 1) / (8 * vMax)
    // MCU-padded block grid (interleaved addressing); non-interleaved
    // scans cover the component's TRUE grid (T.81 A.2.2), a prefix of
    // the padded one in each axis
    val blocksW = Array.tabulate(nComp)(c => mcuCols * sampH(c))
    val blocksH = Array.tabulate(nComp)(c => mcuRows * sampV(c))
    val compBW = Array.tabulate(nComp)(c =>
      ((w * sampH(c) + hMax - 1) / hMax + 7) / 8)
    val compBH = Array.tabulate(nComp)(c =>
      ((h * sampV(c) + vMax - 1) / vMax + 7) / 8)
    // per block: 64 ints in ZIG-ZAG order, raw (dequantized at the end)
    val coefs = Array.tabulate(nComp)(c =>
      new Array[Int](blocksW(c) * blocksH(c) * 64))

    def doScan(scanComp: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
        ss: Int, se: Int, ah: Int, al: Int, br: JpegBitReader): Unit = {
      val pred = new Array[Int](nComp)
      var eobrun = 0
      def bad(msg: String) = throw new java.io.IOException(msg)
      def dcUnit(c: Int, ci: Int, base: Int): Unit =
        if (ah == 0) {
          val t = dcTables(scanDc(ci))
          if (t == null) bad("missing DC table")
          val s = t.decode(br)
          if (s > 11) bad("bad DC category")
          pred(c) += extendSign(br.receive(s), s)
          coefs(c)(base) = pred(c) << al
        } else { // refinement: one bit appends to the approximation
          if (br.bit() == 1) coefs(c)(base) |= 1 << al
        }
      def acFirstUnit(c: Int, acT: HuffTable, base: Int): Unit =
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var end = false
          while (k <= se && !end) {
            val rs = acT.decode(br)
            val r = rs >> 4
            val sz = rs & 0x0f
            if (sz == 0) {
              if (r == 15) k += 16 // ZRL
              else { // EOBn: run includes this block
                eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
                end = true
              }
            } else {
              k += r
              if (k > se) bad("AC index past Se")
              coefs(c)(base + k) = extendSign(br.receive(sz), sz) << al
              k += 1
            }
          }
        }
      def acRefineUnit(c: Int, acT: HuffTable, base: Int): Unit = {
        val p1 = 1 << al
        val m1 = -1 << al
        val cf = coefs(c)
        def correct(idx: Int): Unit =
          if (br.bit() == 1 && (cf(idx) & p1) == 0)
            cf(idx) += (if (cf(idx) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var end = false
          while (k <= se && !end) {
            val rs = acT.decode(br)
            var r = rs >> 4
            val sz = rs & 0x0f
            var newVal = 0
            if (sz == 0) {
              if (r != 15) { // EOBn (includes this block); tail below
                eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                end = true
              } // r == 15: pass 16 zero-history positions
            } else {
              if (sz != 1) bad("AC refine size != 1")
              newVal = if (br.bit() == 1) p1 else m1
            }
            if (!end) {
              // advance over r ZERO-HISTORY positions; every nonzero-
              // history coefficient passed appends a correction bit
              var placed = false
              while (k <= se && !placed) {
                if (cf(base + k) != 0) { correct(base + k); k += 1 }
                else if (r == 0) placed = true
                else { r -= 1; k += 1 }
              }
              if (newVal != 0) {
                if (k > se) bad("AC refine past Se")
                cf(base + k) = newVal
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) { // band tail: corrections only
          while (k <= se) {
            if (cf(base + k) != 0) correct(base + k)
            k += 1
          }
          eobrun -= 1
        }
      }
      if (scanComp.length > 1) { // interleaved DC scan over MCUs
        if (ss != 0) bad("interleaved AC scan")
        var mcu = 0
        val nMcu = mcuCols * mcuRows
        while (mcu < nMcu) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            br.restart(); java.util.Arrays.fill(pred, 0); eobrun = 0
          }
          val mcuX = mcu % mcuCols
          val mcuY = mcu / mcuCols
          var ci = 0
          while (ci < scanComp.length) {
            val c = scanComp(ci)
            var blk = 0
            val nBlk = sampH(c) * sampV(c)
            while (blk < nBlk) {
              val bx = mcuX * sampH(c) + blk % sampH(c)
              val by = mcuY * sampV(c) + blk / sampH(c)
              dcUnit(c, ci, (by * blocksW(c) + bx) * 64)
              blk += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else { // non-interleaved: the component's true block grid
        val c = scanComp(0)
        val acT = if (ss > 0) acTables(scanAc(0)) else null
        if (ss > 0 && acT == null) bad("missing AC table")
        val bw = compBW(c)
        var unit = 0
        val nUnits = bw * compBH(c)
        while (unit < nUnits) {
          if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
            br.restart(); java.util.Arrays.fill(pred, 0); eobrun = 0
          }
          val base = ((unit / bw) * blocksW(c) + (unit % bw)) * 64
          if (ss == 0) dcUnit(c, 0, base)
          else if (ah == 0) acFirstUnit(c, acT, base)
          else acRefineUnit(c, acT, base)
          unit += 1
        }
      }
    }

    // after a scan's counted data units, skip padding bits / stuffed
    // bytes / trailing RSTs to the next true marker
    def skipEntropy(pos0: Int): Int = {
      var q = pos0
      while (q + 1 < p.length) {
        if ((p(q) & 0xff) == 0xff) {
          val m = p(q + 1) & 0xff
          if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) q += 2
          else if (m == 0xff) q += 1 // fill byte
          else return q
        } else q += 1
      }
      p.length
    }

    // the scan loop: a marker walk that also executes SOS segments.
    // Truncation contract: a stream that throws MID-scan is rejected by
    // the caller's catch (same as baseline); a stream that ends cleanly
    // BETWEEN scans renders the passes that completed — progressive is
    // refinement by design, so a partial-but-valid prefix is a coarser
    // image, not a wrong one — EXCEPT that zero completed scans means
    // there is no image at all (an all-flat coefficient buffer), which
    // is rejected like the baseline path rejects truncation.
    var i = firstSos
    var scansDone = 0
    var done = false
    while (!done) {
      if (i + 1 >= p.length) done = true // truncated: render what we have
      else {
        var j = i
        while (j < p.length && (p(j) & 0xff) == 0xff) j += 1
        if (j >= p.length || (p(i) & 0xff) != 0xff) return None
        val marker = p(j) & 0xff
        if (marker == 0xd9) done = true // EOI
        else if (marker >= 0xd0 && marker <= 0xd8) i = j + 1
        else {
          if (j + 2 >= p.length) return None
          val len = be16(p, j + 1)
          val seg = j + 3
          val segEnd = j + 1 + len
          if (len < 2 || segEnd > p.length) return None
          marker match {
            case 0xc4 => // DHT between scans updates the live tables
              var q = seg
              while (q < segEnd) {
                val tc = (p(q) & 0xff) >> 4
                val th = p(q) & 0x0f
                if (tc > 1 || th > 3 || q + 17 > segEnd) return None
                val bits = Array.tabulate(16)(k => p(q + 1 + k) & 0xff)
                val nv = bits.sum
                if (q + 17 + nv > segEnd) return None
                val t = new HuffTable(bits,
                  java.util.Arrays.copyOfRange(p, q + 17, q + 17 + nv))
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                q += 17 + nv
              }
              i = segEnd
            case 0xdb => // DQT between scans (legal; used at the IDCT)
              var q = seg
              while (q < segEnd) {
                val pq = (p(q) & 0xff) >> 4
                val tq = p(q) & 0x0f
                val n = if (pq == 0) 64 else 128
                if (tq > 3 || q + 1 + n > segEnd) return None
                quant(tq) = Array.tabulate(64)(k =>
                  if (pq == 0) p(q + 1 + k) & 0xff else be16(p, q + 1 + 2 * k))
                q += 1 + n
              }
              i = segEnd
            case 0xdd =>
              if (seg + 2 > segEnd) return None
              restartInterval = be16(p, seg)
              i = segEnd
            case 0xda =>
              val ns = p(seg) & 0xff
              if (ns < 1 || ns > nComp ||
                  seg + 1 + 2 * ns + 3 > segEnd) return None
              val scanComp = new Array[Int](ns)
              val scanDc = new Array[Int](ns)
              val scanAc = new Array[Int](ns)
              for (c <- 0 until ns) {
                val idx = (0 until nComp)
                  .indexWhere(compId(_) == (p(seg + 1 + 2 * c) & 0xff))
                if (idx < 0) return None
                scanComp(c) = idx
                scanDc(c) = (p(seg + 2 + 2 * c) & 0xff) >> 4
                scanAc(c) = p(seg + 2 + 2 * c) & 0x0f
              }
              val ss = p(seg + 1 + 2 * ns) & 0xff
              val se = p(seg + 2 + 2 * ns) & 0xff
              val a = p(seg + 3 + 2 * ns) & 0xff
              val ah = a >> 4
              val al = a & 0x0f
              if (se > 63 || ss > se || (ss == 0 && se != 0) ||
                  (ss > 0 && ns != 1) || ah > 13 || al > 13) return None
              val br = new JpegBitReader(p, segEnd)
              doScan(scanComp, scanDc, scanAc, ss, se, ah, al, br)
              scansDone += 1
              i = skipEntropy(br.pos)
            case _ => i = segEnd // APPn / COM / foreign
          }
        }
      }
    }
    if (scansDone == 0) return None // truncated before any scan: no image
    // dequantize + IDCT once, over each component's true grid
    val planeW = Array.tabulate(nComp)(c => blocksW(c) * 8)
    val planes = Array.tabulate(nComp)(c =>
      new Array[Byte](planeW(c) * blocksH(c) * 8))
    val nat = new Array[Int](64)
    var c = 0
    while (c < nComp) {
      val qt = quant(qTab(c))
      val cf = coefs(c)
      var by = 0
      while (by < compBH(c)) {
        var bx = 0
        while (bx < compBW(c)) {
          val base = (by * blocksW(c) + bx) * 64
          var k = 0
          while (k < 64) { nat(ZigZag(k)) = cf(base + k) * qt(k); k += 1 }
          idctToPlane(nat, planes(c), planeW(c), bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    Some(assemblePlanes(w, h, nComp, planes, planeW, sampH, sampV,
      hMax, vMax))
  }

  /** Serialize a minimal-but-well-formed BASELINE GRAYSCALE JPEG — the
    * inverse of [[decodeJpegPixels]] for the round-trip law and the q145
    * fixture. Each 8×8 block is the constant `blockVal(bx, by)` (edge
    * blocks replicate it into the padding), the quantization table is
    * all-ones and the image is DC-only — the one regime where baseline
    * JPEG is LOSSLESS (FDCT of a constant block is exactly 8·(v−128) in
    * the DC slot, IDCT inverts it exactly), so an oracle can predict the
    * decoded pixels. The entropy stream is real Huffman coding: custom
    * canonical tables carried in DHT (12 four-bit DC category codes, a
    * one-bit AC EOB), cross-block DC prediction, magnitude bits,
    * 0xFF byte stuffing, 1-padding to the byte boundary.
    */
  def buildJpeg(w: Int, h: Int, blockVal: (Int, Int) => Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && restartInterval >= 0)
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0x00) // DQT: 8-bit table 0
    for (_ <- 0 until 64) u8(1)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xc0); u16(8 + 3); u8(8); u16(h); u16(w); u8(1) // SOF0, 1 comp
    u8(1); u8(0x11); u8(0) // id 1, 1x1 sampling, quant table 0
    // DHT DC table 0: 12 symbols (categories 0..11), all four bits long
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    marker(0xc4); u16(2 + 17 + 12); u8(0x00)
    dcBits.foreach(u8); (0 until 12).foreach(u8)
    // DHT AC table 0: the single symbol 0x00 (EOB) as the one-bit code 0
    marker(0xc4); u16(2 + 17 + 1); u8(0x10)
    u8(1); (0 until 15).foreach(_ => u8(0)); u8(0x00)
    marker(0xda); u16(6 + 2); u8(1); u8(1); u8(0x00) // SOS: comp 1, DC0/AC0
    u8(0); u8(63); u8(0)
    // entropy-coded segment
    var acc = 0
    var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nAcc += 1
        if (nAcc == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00) // byte stuffing
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    def align(): Unit = if (nAcc > 0) { // 1-pad to the byte boundary
      acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
      bos.write(acc)
      if (acc == 0xff) bos.write(0x00)
      acc = 0; nAcc = 0
    }
    val cols = (w + 7) / 8
    val rows = (h + 7) / 8
    var pred = 0
    var mcu = 0
    while (mcu < cols * rows) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        align() // RSTn is byte-aligned; prediction resets (T.81 E.1.4)
        marker(0xd0 + ((mcu / restartInterval - 1) % 8))
        pred = 0
      }
      val v = blockVal(mcu % cols, mcu / cols) & 0xff
      val dc = 8 * (v - 128)
      val diff = dc - pred
      pred = dc
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      putBits(s, 4) // DC category: our canonical table maps symbol k to code k
      if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      putBits(0, 1) // AC EOB
      mcu += 1
    }
    align()
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** [[buildJpeg]]'s PROGRESSIVE twin (SOF2) — the q148 fixture: the
    * same DC-only all-ones-quant lossless regime, but coded as a real
    * four-scan progressive script exercising every scan type the
    * decoder supports:
    *
    *   1. DC first  (Ss=Se=0, Ah=0→Al=1): category+EXTEND coding of the
    *      arithmetic-shifted DC diffs, prediction over shifted values
    *   2. AC first  (Ss=1..63, Ah=0→Al=1): the band is all-zero, coded
    *      as genuine EOBn runs (run-length batches with extension bits)
    *   3. DC refine (Ah=1→Al=0): the dropped low bit, one raw bit/block
    *   4. AC refine (Ss=1..63, Ah=1→Al=0): EOBn runs over the
    *      still-zero band (the correction-bit path with empty history)
    *
    * `restartInterval > 0` stamps DRI and emits byte-aligned RSTn at the
    * cadence in EVERY scan (predictions and EOB runs reset — EOB runs
    * never cross a restart boundary, as T.81 requires). Lossless like
    * the baseline fixture, so the q145-style closed-form oracle applies.
    */
  def buildJpegProgressive(w: Int, h: Int, blockVal: (Int, Int) => Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && restartInterval >= 0)
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    // DQT: DC quant 8, AC all-ones — the quantized DC is then (v - 128)
    // itself (8·(v-128) ÷ 8), whose low bit is LIVE, so the refinement
    // scan genuinely flips bits; dequantization restores the exact DC
    // and the regime stays lossless
    marker(0xdb); u16(2 + 1 + 64); u8(0x00)
    u8(8); for (_ <- 0 until 63) u8(1)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xc2); u16(8 + 3); u8(8); u16(h); u16(w); u8(1) // SOF2, 1 comp
    u8(1); u8(0x11); u8(0)
    // DHT DC 0: categories 0..11 as four-bit codes (canonical: code = k)
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    marker(0xc4); u16(2 + 17 + 12); u8(0x00)
    dcBits.foreach(u8); (0 until 12).foreach(u8)
    // DHT AC 0: the fifteen EOBn symbols (r<<4, r = 0..14) as four-bit
    // codes — symbol index = r, code = r
    marker(0xc4); u16(2 + 17 + 15); u8(0x10)
    Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(u8)
    (0 until 15).foreach(r => u8(r << 4))
    val cols = (w + 7) / 8
    val rows = (h + 7) / 8
    val nUnits = cols * rows
    def dcOf(u: Int): Int = (blockVal(u % cols, u / cols) & 0xff) - 128
    var acc = 0
    var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nAcc += 1
        if (nAcc == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    def align(): Unit = if (nAcc > 0) {
      acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
      bos.write(acc)
      if (acc == 0xff) bos.write(0x00)
      acc = 0; nAcc = 0
    }
    var rstN = 0
    def rst(): Unit = { align(); marker(0xd0 + rstN % 8); rstN += 1 }
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2); u8(1); u8(1); u8(0x00)
      u8(ss); u8(se); u8((ah << 4) | al)
    }
    // scan 1: DC first, Al=1 — prediction over the SHIFTED values
    sos(0, 0, 0, 1)
    var pred = 0
    for (u <- 0 until nUnits) {
      if (restartInterval > 0 && u > 0 && u % restartInterval == 0) {
        rst(); pred = 0
      }
      val vs = dcOf(u) >> 1 // arithmetic shift, T.81 G.1.2.1
      val diff = vs - pred
      pred = vs
      val s =
        if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      putBits(s, 4)
      if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    }
    align()
    // scans 2 & 4: the all-zero AC band as EOBn run batches, runs never
    // crossing a restart boundary
    def acScanOfZeros(ah: Int, al: Int): Unit = {
      sos(1, 63, ah, al)
      var u = 0
      while (u < nUnits) {
        if (restartInterval > 0 && u > 0 && u % restartInterval == 0) rst()
        val span =
          if (restartInterval > 0)
            math.min(nUnits - u, restartInterval - u % restartInterval)
          else nUnits - u
        var left = span
        while (left > 0) {
          val r = math.min(14, 31 - Integer.numberOfLeadingZeros(left))
          val run = math.min(left, (1 << (r + 1)) - 1)
          putBits(r, 4) // EOBn symbol r<<4: canonical code = r
          if (r > 0) putBits(run - (1 << r), r)
          left -= run
        }
        u += span
      }
      align()
    }
    acScanOfZeros(0, 1)
    // scan 3: DC refinement — the dropped low bit, raw
    sos(0, 0, 1, 0)
    for (u <- 0 until nUnits) {
      if (restartInterval > 0 && u > 0 && u % restartInterval == 0) rst()
      putBits(dcOf(u) & 1, 1)
    }
    align()
    acScanOfZeros(1, 0)
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** RGB → JFIF YCbCr (ITU-T T.871 §7), rounded — the encoder side of
    * the color conversion [[decodeJpegPixels]] inverts. */
  /** Color-transform rounding uses the repo's cross-engine parity
    * convention (the `pround` 1e-8 stabilizer): the 6-decimal JFIF
    * coefficients land integer combinations EXACTLY on decimal .5 ties,
    * where IEEE evaluation order decides the side and engines disagree.
    * T.871 mandates round-to-nearest without fixing tie direction, so
    * the stabilized round is a valid choice — and the only one both
    * sides of the oracle can reproduce bit-for-bit. */
  private def roundPar(d: Double): Int = math.round(d + 1e-8).toInt

  private def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def cl(d: Double): Int = { // Cb/Cr round to 256 at the gamut corners
      val v = roundPar(d)
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    (cl(0.299 * r + 0.587 * g + 0.114 * b),
      cl(128 - 0.168736 * r - 0.331264 * g + 0.5 * b),
      cl(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
  }

  /** [[buildJpeg]] for 3-component 4:4:4 color: each 8×8 block is the
    * constant RGB `blockRgb(bx, by)`, converted to YCbCr at encode time
    * (the one lossy step — integer rounding, exactly replayable), then
    * coded DC-only against all-ones quant tables so the YCbCr planes
    * round-trip exactly. Two DQT tables (luma/chroma), two DHT pairs,
    * interleaved Y-Cb-Cr MCUs with per-component DC prediction — the
    * full baseline color container surface. */
  def buildJpegColor(w: Int, h: Int,
      blockRgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0)
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    for (t <- 0 to 1) { // DQT: all-ones luma + chroma tables
      marker(0xdb); u16(2 + 1 + 64); u8(t)
      for (_ <- 0 until 64) u8(1)
    }
    marker(0xc0); u16(8 + 3 * 3); u8(8); u16(h); u16(w); u8(3) // SOF0
    u8(1); u8(0x11); u8(0) // Y: 1x1, quant 0
    u8(2); u8(0x11); u8(1) // Cb: 1x1, quant 1
    u8(3); u8(0x11); u8(1) // Cr: 1x1, quant 1
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    for (t <- 0 to 1) { // DHT: DC + AC table pair per class id
      marker(0xc4); u16(2 + 17 + 12); u8(t) // DC table t
      dcBits.foreach(u8); (0 until 12).foreach(u8)
      marker(0xc4); u16(2 + 17 + 1); u8(0x10 | t) // AC table t: EOB="0"
      u8(1); (0 until 15).foreach(_ => u8(0)); u8(0x00)
    }
    marker(0xda); u16(6 + 2 * 3); u8(3) // SOS
    u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(63); u8(0)
    var acc = 0
    var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nAcc += 1
        if (nAcc == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    val cols = (w + 7) / 8
    val rows = (h + 7) / 8
    val pred = new Array[Int](3)
    var mcu = 0
    while (mcu < cols * rows) {
      val (r, g, b) = blockRgb(mcu % cols, mcu / cols)
      val (yv, cb, cr) = rgbToYcc(r & 0xff, g & 0xff, b & 0xff)
      var comp = 0
      while (comp < 3) {
        val v = comp match { case 0 => yv; case 1 => cb; case _ => cr }
        val dc = 8 * (v - 128)
        val diff = dc - pred(comp)
        pred(comp) = dc
        val s = if (diff == 0) 0
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        putBits(s, 4)
        if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        putBits(0, 1) // AC EOB
        comp += 1
      }
      mcu += 1
    }
    if (nAcc > 0) {
      acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
      bos.write(acc)
      if (acc == 0xff) bos.write(0x00)
    }
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** [[buildJpegColor]] in 4:2:0 — THE dominant layout of real crawl
    * JPEGs: Y sampled 2×2, chroma 1×1, so each MCU covers a 16×16 pixel
    * tile carrying four interleaved Y blocks then one Cb and one Cr
    * block (T.81 B.2.3 ordering), with per-component DC prediction.
    * `macroRgb(mx, my)` is the constant RGB of the 16×16 macroblock —
    * constant chroma per tile makes the subsampling exact (any
    * upsampling filter reproduces a constant), so the decode is as
    * replayable as the 4:4:4 case. */
  def buildJpegColor420(w: Int, h: Int,
      macroRgb: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    buildJpegColorSampled(w, h, 2, 2, macroRgb)

  /** 4:2:2 variant (Y sampled 2×1 — 16×8 MCU tiles; `macroRgb` is the
    * constant RGB per 16×8 macroblock). */
  def buildJpegColor422(w: Int, h: Int,
      macroRgb: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    buildJpegColorSampled(w, h, 2, 1, macroRgb)

  private def buildJpegColorSampled(w: Int, h: Int, hy: Int, vy: Int,
      macroRgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0 && hy >= 1 && hy <= 2 && vy >= 1 && vy <= 2)
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    for (t <- 0 to 1) {
      marker(0xdb); u16(2 + 1 + 64); u8(t)
      for (_ <- 0 until 64) u8(1)
    }
    marker(0xc0); u16(8 + 3 * 3); u8(8); u16(h); u16(w); u8(3) // SOF0
    u8(1); u8((hy << 4) | vy); u8(0) // Y sampling, quant 0
    u8(2); u8(0x11); u8(1) // Cb: 1x1, quant 1
    u8(3); u8(0x11); u8(1) // Cr: 1x1, quant 1
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    for (t <- 0 to 1) {
      marker(0xc4); u16(2 + 17 + 12); u8(t)
      dcBits.foreach(u8); (0 until 12).foreach(u8)
      marker(0xc4); u16(2 + 17 + 1); u8(0x10 | t)
      u8(1); (0 until 15).foreach(_ => u8(0)); u8(0x00)
    }
    marker(0xda); u16(6 + 2 * 3); u8(3) // SOS
    u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(63); u8(0)
    var acc = 0
    var nAcc = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nAcc += 1
        if (nAcc == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; nAcc = 0
        }
        i -= 1
      }
    }
    def putBlock(v: Int, comp: Int, pred: Array[Int]): Unit = {
      val dc = 8 * (v - 128)
      val diff = dc - pred(comp)
      pred(comp) = dc
      val s = if (diff == 0) 0
        else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      putBits(s, 4)
      if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      putBits(0, 1) // AC EOB
    }
    val mcuCols = (w + 8 * hy - 1) / (8 * hy)
    val mcuRows = (h + 8 * vy - 1) / (8 * vy)
    val pred = new Array[Int](3)
    var mcu = 0
    while (mcu < mcuCols * mcuRows) {
      val (r, g, b) = macroRgb(mcu % mcuCols, mcu / mcuCols)
      val (yv, cb, cr) = rgbToYcc(r & 0xff, g & 0xff, b & 0xff)
      for (_ <- 0 until hy * vy) putBlock(yv, 0, pred) // Y data units
      putBlock(cb, 1, pred)
      putBlock(cr, 2, pred)
      mcu += 1
    }
    if (nAcc > 0) {
      acc = (acc << (8 - nAcc)) | ((1 << (8 - nAcc)) - 1)
      bos.write(acc)
      if (acc == 0xff) bos.write(0x00)
    }
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** Per-image pixel statistics from a REAL JPEG entropy decode —
    * grayscale and color alike (statistics over all interleaved
    * samples; `channels` disambiguates). */
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      channels: Int, mean_px: Double, rms_px: Double)

  def featurizeJpeg(docId: Long, payload: Array[Byte]): Option[ImageFeatures] =
    decodeJpegPixels(payload).map { case (w, h, ch, px) =>
      var sum = 0L
      var sumSq = 0L
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        sum += v
        sumSq += v.toLong * v
        i += 1
      }
      val n = px.length.toDouble
      ImageFeatures(docId, w, h, ch,
        sum / n / 255.0, math.sqrt(sumSq / n) / 255.0)
    }

  /** Per-channel means from a decoded COLOR JPEG (None for grayscale or
    * non-JPEG payloads) — the q146 surface. */
  case class ColorImageFeatures(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  def featurizeJpegColor(docId: Long,
      payload: Array[Byte]): Option[ColorImageFeatures] =
    decodeJpegPixels(payload).collect { case (w, h, 3, px) =>
      val sums = new Array[Long](3)
      var i = 0
      while (i < px.length) { sums(i % 3) += px(i) & 0xff; i += 1 }
      val n = (w.toDouble * h) * 255.0
      ColorImageFeatures(docId, w, h,
        sums(0) / n, sums(1) / n, sums(2) / n)
    }

  /** Deterministic grayscale JPEG fixture per document — the q141/q143
    * pattern for still images: dimensions (not 8-aligned, so edge-block
    * cropping is exercised) and every block's value are integer
    * arithmetic on doc_id, the Spark side genuinely Huffman-encodes and
    * re-decodes the entropy stream, the oracle derives the same pixels
    * from the formula alone (q145). */
  def syntheticJpegCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (13 + id % 40).toInt
        val h = (9 + (id * 3) % 40).toInt
        val cols = (w + 7) / 8
        (id, buildJpeg(w, h, (bx, by) =>
          ((id * 31 + (by * cols + bx) * 17) % 256).toInt))
      })
      .toDF("doc_id", "payload")
  }

  /** Fixed-geometry grayscale JPEG fixture for the perceptual-hash
    * oracles (q205): 72×64 — the dHash 9×8 box grid tiles the 8×8 JPEG
    * blocks EXACTLY, so a grid-cell average IS its block constant
    * (id·31 + bi·17 mod 256, the q145 value formula) and all 64 gradient
    * bits replay as pure integer arithmetic in SQL. Same lossless
    * DC-only / all-ones-quant regime as [[syntheticJpegCorpus]]. */
  def syntheticHashJpegCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // repartition BEFORE the codec stage, COUNT PINNED: the documents
    // table reads as a couple of parquet splits and per-image
    // encode+decode+DCT work is ~8× the q145 fixtures' — and an
    // unpinned repartition of a 40 KB id column gets AQE-coalesced
    // right back to one partition, re-serializing the codec work
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, buildJpeg(72, 64, (bx, by) =>
          ((id * 31 + (by * 9 + bx) * 17) % 256).toInt))
      })
      .toDF("doc_id", "payload")
  }

  /** Near-dup image fixture (q206): consecutive ids share one base image
    * (base = id/2, [[syntheticHashJpegCorpus]]'s value formula over the
    * base); the odd id of each pair perturbs block 0 by +18 (mod 256) —
    * block (0,0) participates in exactly ONE dHash gradient bit (it is
    * the left edge of row 0), so the pair's Hamming distance is 0 or 1
    * while distinct bases differ across their whole wrap set. The +18
    * crosses the +17 neighbor-difference boundary, so the single bit
    * genuinely flips on non-wrapping blocks — a real near-dup, not an
    * exact re-encode. */
  def syntheticNearDupJpegCorpus(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val base = id / 2
        (id, buildJpeg(72, 64, (bx, by) => {
          val bi = by * 9 + bx
          val bump = if (id % 2 == 1 && bi == 0) 18 else 0
          ((base * 31 + bi * 17 + bump) % 256).toInt
        }))
      })
      .toDF("doc_id", "payload")
  }

  /** Hash-DIVERSE near-dup fixture — q206's oracle corpus: the plain
    * [[syntheticNearDupJpegCorpus]] affine block formula admits only 256
    * distinct dHash patterns (the hash depends on base·31 mod 256
    * alone), which collapses pair sets into quadratic blowup once the
    * corpus outgrows 256 bases. Mixing base NONLINEARLY into the
    * gradient structure (the bi² term) widens the class space to
    * 256×911 patterns — collision-free at every oracle scale (sf ≤ 0.1
    * has ≤ 2.5k bases) — while every cell stays plain integer
    * arithmetic a SQL oracle replays. */
  def syntheticNearDupJpegCorpusDiverse(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val base = id / 2
        (id, buildJpeg(72, 64, (bx, by) => {
          val bi = by * 9 + bx
          val bump = if (id % 2 == 1 && bi == 0) 18 else 0
          Math.floorMod(base * 2654435761L + bi * 40503L +
            (base % 911L) * bi * bi + bump, 256L).toInt
        }))
      })
      .toDF("doc_id", "payload")
  }

  /** SplitMix64 near-dup fixture — the SCALE-PROBE corpus: even the bi²
    * mix carries only ~233k hash classes (mod 256 × mod 911), so an
    * 80k-base probe corpus birthday-collides and pair counts go
    * superlinear — a generator artifact, not an operator property (real
    * near-dup density is cluster-bounded). Every cell here is an
    * independent 64-bit mix of (base, block), making cross-base hash
    * collisions ~2⁻⁶⁴-rare at any probe scale; the constructed
    * consecutive-id pairs are the whole pair set. Not SQL-replayable —
    * probes don't need an oracle. */
  def syntheticNearDupJpegCorpusProbe(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val base = id / 2
        (id, buildJpeg(72, 64, (bx, by) => {
          val bi = by * 9 + bx
          val bump = if (id % 2 == 1 && bi == 0) 18 else 0
          Math.floorMod(mix64(base * 72L + bi) + bump, 256L).toInt
        }))
      })
      .toDF("doc_id", "payload")
  }

  /** Deterministic PROGRESSIVE JPEG fixture per document — the q148
    * corpus: the q145 shape (non-8-aligned dims, per-block constants
    * from doc_id arithmetic), but encoded by [[buildJpegProgressive]]'s
    * four-scan SOF2 script (DC first/refine with successive
    * approximation, AC bands as EOBn runs), with a restart interval on
    * every third doc so RST-in-progressive-scan decode is on the oracle
    * path too. Same lossless regime → the q145-style closed-form oracle
    * predicts every decoded pixel. */
  def syntheticJpegProgressiveCorpus(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (11 + (id * 7) % 42).toInt
        val h = (10 + (id * 5) % 38).toInt
        val cols = (w + 7) / 8
        (id, buildJpegProgressive(w, h, (bx, by) =>
          ((id * 37 + (by * cols + bx) * 23) % 256).toInt,
          restartInterval = if (id % 3 == 0) 2 else 0))
      })
      .toDF("doc_id", "payload")
  }

  /** Image featurization over a (doc_id, payload binary) frame — the
    * mapPartitions stage of [[audioFeaturesBinary]] for JPEG payloads;
    * non-JPEG (or non-baseline) payloads are dropped. */
  def imageFeaturesBinary(spark: SparkSession,
      payloads: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => featurizeJpeg(id, bytes) })
  }

  /** Deterministic COLOR JPEG fixture per document (the q145 pattern in
    * color): non-8-aligned dimensions, per-block RGB from doc_id
    * arithmetic — the encoder's RGB→YCbCr rounding and the decoder's
    * YCbCr→RGB rounding are both exactly replayable in SQL, so the q146
    * oracle proves the full color chain byte-level. */
  def syntheticJpegColorCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (11 + id % 36).toInt
        val h = (10 + (id * 5) % 30).toInt
        val cols = (w + 7) / 8
        (id, buildJpegColor(w, h, (bx, by) => {
          val bi = by * cols + bx
          (((id * 31 + bi * 17) % 256).toInt,
            ((id * 47 + bi * 29) % 256).toInt,
            ((id * 59 + bi * 41) % 256).toInt)
        }))
      })
      .toDF("doc_id", "payload")
  }

  /** [[syntheticJpegColorCorpus]] in 4:2:0 (q147): per-macroblock
    * constant RGB, non-16-aligned dimensions so the MCU-grid crop is
    * exercised on both axes. */
  def syntheticJpeg420Corpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (9 + id % 40).toInt
        val h = (8 + (id * 7) % 40).toInt
        val cols = (w + 15) / 16
        (id, buildJpegColor420(w, h, (mx, my) => {
          val mi = my * cols + mx
          (((id * 31 + mi * 17) % 256).toInt,
            ((id * 47 + mi * 29) % 256).toInt,
            ((id * 59 + mi * 41) % 256).toInt)
        }))
      })
      .toDF("doc_id", "payload")
  }

  /** Color-image featurization over a (doc_id, payload binary) frame;
    * grayscale and non-JPEG payloads are dropped. */
  def colorImageFeaturesBinary(spark: SparkSession,
      payloads: DataFrame): Dataset[ColorImageFeatures] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        featurizeJpegColor(id, bytes) })
  }

  /** Deterministic GIF fixture per document (the q145 pattern for
    * palette images): a 64-color global palette and every pixel's
    * palette index are integer arithmetic on (doc_id, x, y) — GIF's LZW
    * is lossless, so the oracle predicts every pixel. Every fourth
    * document is INTERLACED, so the 4-pass reorder is on the oracle
    * path, and the palette indices cycle with x so the LZW dictionary
    * genuinely builds multi-symbol strings. */
  def syntheticGifCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // repartition BEFORE the codec stage, count pinned (the
      // q205-fixture discipline): a narrow single-split id column
      // otherwise serializes the whole encode+parse on one task
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (13 + id % 20).toInt
        val h = (11 + (id * 3) % 20).toInt
        val pal = Array.tabulate(64)(i =>
          ((i * 37 + 11) % 256, (i * 73 + 29) % 256, (i * 101 + 47) % 256))
        (id, buildGif(w, h, pal,
          (x, y) => ((id + x * 7 + y * 31) % 64).toInt,
          interlace = id % 4 == 0))
      })
      .toDF("doc_id", "payload")
  }

  /** Color featurization of GIF payloads — [[colorImageFeaturesBinary]]
    * with [[decodeGifPixels]] as the codec; non-GIF payloads drop. */
  def gifFeaturesBinary(spark: SparkSession,
      payloads: DataFrame): Dataset[ColorImageFeatures] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeGifPixels(bytes).collect { case (w, h, 3, px) =>
          val sums = new Array[Long](3)
          var i = 0
          while (i < px.length) { sums(i % 3) += px(i) & 0xff; i += 1 }
          val n = (w.toDouble * h) * 255.0
          ColorImageFeatures(id, w, h,
            sums(0) / n, sums(1) / n, sums(2) / n)
        }
      })
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

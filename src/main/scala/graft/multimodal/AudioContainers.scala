package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MP3 and FLAC container metadata walks — the audio side of the
  * MP4/WebM/H.264 video walks: bitrate, sample rate, channel shape,
  * frame/sample counts, and duration for the two formats that carry
  * most of the web's audio, WITHOUT decoding a single audio sample
  * (full MDCT/LPC decode is out of scope by the same line the video
  * walks draw at frame decode).
  *
  * MP3 (ISO/IEC 11172-3 audio framing, the de-facto wire layout
  * documented across every decoder): a stream of self-describing
  * frames, each led by a 4-byte header — 11-bit sync, 2-bit version
  * (MPEG1/2/2.5), 2-bit layer, bitrate and sample-rate table indices, a
  * padding bit — whose tables give the exact frame byte length, so the
  * whole file walks header-to-header with no payload inspection. An
  * ID3v2 tag at the head is skipped by its declared syncsafe size; a
  * Xing/Info block in the first frame's side-info shadow (the VBR
  * convention) is read for its frame count. Strictness: every frame
  * must start on a valid sync — a malformed or truncated frame drops
  * the file to None, never half-read fields.
  *
  * FLAC (the flac format spec, xiph.org): "fLaC" magic then metadata
  * blocks (1-byte last-flag+type, 24-bit length); STREAMINFO (type 0,
  * 34 bytes) packs sample rate (20 bits), channels−1 (3), bits−1 (5),
  * total samples (36) into one big-endian bit run.
  */
object AudioContainers {

  /** Parsed MP3: (version "1"/"2"/"2.5", layer 1-3, first-frame bitrate
    * kbps, sample rate, channels 1/2, frame count, duration ms, vbr —
    * whether a Xing/Info frame-count block was present). */
  final case class Mp3Meta(version: String, layer: Int, bitrateKbps: Int,
      sampleRate: Int, channels: Int, nFrames: Int, durationMs: Long,
      vbr: Boolean)

  // bitrate kbps by [versionGroup][layer][index]; group 0 = MPEG1,
  // group 1 = MPEG2/2.5 (they share tables); index 0 = "free", 15 bad
  private val bitrateKbps: Array[Array[Array[Int]]] = Array(
    Array( // MPEG1: layer I, II, III
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
    Array( // MPEG2/2.5
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  private val sampleRates: Map[String, Array[Int]] = Map(
    "1" -> Array(44100, 48000, 32000), "2" -> Array(22050, 24000, 16000),
    "2.5" -> Array(11025, 12000, 8000))

  /** Samples per frame by (version, layer). */
  private def samplesPerFrame(version: String, layer: Int): Int =
    (version, layer) match {
      case (_, 1) => 384
      case (_, 2) => 1152
      case ("1", 3) => 1152
      case (_, 3) => 576 // MPEG2/2.5 layer III
    }

  /** Frame byte length from the header fields (the table-driven formula
    * every decoder implements; layer I counts in 4-byte slots). */
  private def frameLength(version: String, layer: Int, kbps: Int,
      rate: Int, padding: Int): Int =
    if (layer == 1) (12 * kbps * 1000 / rate + padding) * 4
    else samplesPerFrame(version, layer) / 8 * kbps * 1000 / rate + padding

  /** Side-info bytes after the 4-byte header (layer III) — where a
    * Xing/Info block hides: MPEG1 17 mono / 32 otherwise, MPEG2/2.5
    * 9 mono / 17 otherwise. */
  private def sideInfoLen(version: String, channels: Int): Int =
    if (version == "1") { if (channels == 1) 17 else 32 }
    else { if (channels == 1) 9 else 17 }

  /** Walk an MP3 payload (optionally ID3v2-prefixed). None when no
    * valid frame stream is found or any frame breaks. */
  def parseMp3(payload: Array[Byte]): Option[Mp3Meta] = {
    if (payload == null || payload.length < 4) return None
    var off = 0
    // ID3v2 prefix: skipped by its declared syncsafe size
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      val sz = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
        ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
      off = 10 + sz
      if (off >= payload.length) return None
    }
    var version: String = null
    var layer = 0
    var kbps0 = 0
    var rate = 0
    var channels = 0
    var nFrames = 0
    var samples = 0L
    var vbr = false
    while (off + 4 <= payload.length) {
      val h = ((payload(off) & 0xff) << 24) | ((payload(off + 1) & 0xff) << 16) |
        ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
      if ((h >>> 21) != 0x7ff) return None // every frame starts on sync
      val ver = (h >>> 19) & 3 match {
        case 3 => "1"; case 2 => "2"; case 0 => "2.5"; case _ => return None
      }
      val lay = (h >>> 17) & 3 match {
        case 3 => 1; case 2 => 2; case 1 => 3; case _ => return None
      }
      val brIdx = (h >>> 12) & 0xf
      val srIdx = (h >>> 10) & 3
      val padding = (h >>> 9) & 1
      val chMode = (h >>> 6) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val group = if (ver == "1") 0 else 1
      val kbps = bitrateKbps(group)(lay - 1)(brIdx)
      val sr = sampleRates(ver)(srIdx)
      val ch = if (chMode == 3) 1 else 2
      if (nFrames == 0) {
        version = ver; layer = lay; kbps0 = kbps; rate = sr; channels = ch
      } else if (ver != version || lay != layer || sr != rate) return None
      val len = frameLength(ver, lay, kbps, sr, padding)
      if (len < 4 || off + len > payload.length) return None // truncated
      if (nFrames == 0 && lay == 3) {
        val x = off + 4 + sideInfoLen(ver, ch)
        if (x + 8 <= off + len &&
            ((payload(x) == 'X' && payload(x + 1) == 'i' &&
              payload(x + 2) == 'n' && payload(x + 3) == 'g') ||
             (payload(x) == 'I' && payload(x + 1) == 'n' &&
              payload(x + 2) == 'f' && payload(x + 3) == 'o')))
          vbr = true
      }
      nFrames += 1
      samples += samplesPerFrame(ver, lay)
      off += len
    }
    if (nFrames == 0 || off != payload.length) return None
    Some(Mp3Meta(version, layer, kbps0, rate, channels, nFrames,
      samples * 1000 / rate, vbr))
  }

  /** Parsed FLAC STREAMINFO: (sample rate, channels, bits per sample,
    * total samples, duration ms). */
  final case class FlacMeta(sampleRate: Int, channels: Int, bits: Int,
      totalSamples: Long, durationMs: Long)

  /** Walk FLAC metadata blocks to STREAMINFO. None on bad magic, a
    * block overrunning EOF, or no STREAMINFO before the last block. */
  def parseFlacStreamInfo(payload: Array[Byte]): Option[FlacMeta] = {
    if (payload == null || payload.length < 8) return None
    if (payload(0) != 'f' || payload(1) != 'L' || payload(2) != 'a' ||
        payload(3) != 'C') return None
    var off = 4
    var last = false
    while (!last && off + 4 <= payload.length) {
      val b0 = payload(off) & 0xff
      last = (b0 & 0x80) != 0
      val tpe = b0 & 0x7f
      val len = ((payload(off + 1) & 0xff) << 16) |
        ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
      val start = off + 4
      if (start + len > payload.length) return None // truncated block
      if (tpe == 0) {
        if (len < 34) return None
        // bytes 10..17 of STREAMINFO: rate(20) ch-1(3) bps-1(5) total(36)
        var bits = 0L
        var i = 0
        while (i < 8) { bits = (bits << 8) | (payload(start + 10 + i) & 0xffL); i += 1 }
        val rate = (bits >>> 44).toInt
        val ch = ((bits >>> 41) & 7).toInt + 1
        val bps = ((bits >>> 36) & 0x1f).toInt + 1
        val total = bits & 0xfffffffffL
        if (rate <= 0) return None
        return Some(FlacMeta(rate, ch, bps, total, total * 1000 / rate))
      }
      off = start + len
    }
    None
  }

  /** MP3 metadata columns for an (idCol, payloadCol binary) frame —
    * unparseable payloads dropped; map-only, no shuffle. */
  def mp3MetaBinary(spark: SparkSession, audio: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    import spark.implicits._
    audio.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        parseMp3(p).map(m => (id, m.version, m.layer, m.bitrateKbps,
          m.sampleRate, m.channels, m.nFrames, m.durationMs, m.vbr))
      })
      .toDF(idCol, "mpeg_version", "layer", "bitrate_kbps", "sample_rate",
        "channels", "n_frames", "duration_ms", "vbr")
  }

  /** FLAC metadata columns — same shape. */
  def flacMetaBinary(spark: SparkSession, audio: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    import spark.implicits._
    audio.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        parseFlacStreamInfo(p).map(m => (id, m.sampleRate, m.channels,
          m.bits, m.totalSamples, m.durationMs))
      })
      .toDF(idCol, "sample_rate", "channels", "bits_per_sample",
        "total_samples", "duration_ms")
  }

  // ───────────────────────── fixture builders ─────────────────────────

  /** One well-formed layer-III MP3: `nFrames` frames at the given table
    * indices, frame f padded iff f is odd, zero payloads; a Xing block
    * (frame count big-endian) in the first frame when `xing`. */
  def buildMp3(version: String, brIdx: Int, srIdx: Int, mono: Boolean,
      nFrames: Int, xing: Boolean): Array[Byte] = {
    require(Set("1", "2", "2.5")(version) && brIdx >= 1 && brIdx <= 14 &&
      srIdx >= 0 && srIdx <= 2 && nFrames >= 1)
    val group = if (version == "1") 0 else 1
    val kbps = bitrateKbps(group)(2)(brIdx)
    val rate = sampleRates(version)(srIdx)
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val padding = f % 2
      val verBits = version match { case "1" => 3; case "2" => 2; case _ => 0 }
      val h = (0x7ff << 21) | (verBits << 19) | (1 << 17) | (1 << 16) |
        (brIdx << 12) | (srIdx << 10) | (padding << 9) |
        ((if (mono) 3 else 0) << 6)
      val len = frameLength(version, 3, kbps, rate, padding)
      val frame = new Array[Byte](len)
      frame(0) = (h >>> 24).toByte; frame(1) = (h >>> 16).toByte
      frame(2) = (h >>> 8).toByte; frame(3) = h.toByte
      if (f == 0 && xing) {
        val x = 4 + sideInfoLen(version, if (mono) 1 else 2)
        // fail loudly rather than silently emit a CBR stream: an 8 kbps
        // stereo MPEG2 frame (26 bytes) genuinely cannot hold a Xing
        // block — callers wanting one must pick a bitrate that fits
        require(x + 12 <= len,
          s"frame too small for a Xing block: $len bytes, needs ${x + 12}")
        frame(x) = 'X'; frame(x + 1) = 'i'; frame(x + 2) = 'n'
        frame(x + 3) = 'g'
        frame(x + 7) = 1 // flags: frames field present
        frame(x + 8) = (nFrames >>> 24).toByte
        frame(x + 9) = (nFrames >>> 16).toByte
        frame(x + 10) = (nFrames >>> 8).toByte
        frame(x + 11) = nFrames.toByte
      }
      out.write(frame)
      f += 1
    }
    out.toByteArray
  }

  /** A minimal FLAC: magic, STREAMINFO, then a padding block marked
    * last. */
  def buildFlac(rate: Int, channels: Int, bits: Int,
      totalSamples: Long): Array[Byte] = {
    val si = new Array[Byte](34)
    var packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | (totalSamples & 0xfffffffffL)
    var i = 7
    while (i >= 0) { si(10 + i) = (packed & 0xff).toByte; packed >>>= 8; i -= 1 }
    val pad = new Array[Byte](6)
    "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 34) ++ si ++ // STREAMINFO, not last
      Array[Byte](0x81.toByte, 0, 0, pad.length.toByte) ++ pad // padding, last
  }

  /** Deterministic MP3 corpus for the q213 oracle: version cycles
    * 1/2/2.5 by id mod 3, bitrate index 1+id%14, rate index (id DIV
    * 3)%3, mono on odd ids, 4+id%5 frames with the odd ones padded,
    * a Xing block every 4th id (those ids force bitrate index ≥ 2 —
    * the smallest whose frames hold a Xing block at EVERY
    * version/rate/channel combination), an ID3v2 prefix every 6th (the
    * skip is on the oracle path), and every 13th file truncated
    * mid-frame — dropped. */
  def syntheticMp3Corpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val version = (id % 3) match {
          case 0 => "1"; case 1 => "2"; case _ => "2.5"
        }
        val brIdx = {
          val b = (1 + id % 14).toInt
          if (id % 4 == 0) math.max(b, 2) else b
        }
        val mp3 = buildMp3(version, brIdx,
          ((id / 3) % 3).toInt, mono = id % 2 == 1, (4 + id % 5).toInt,
          xing = id % 4 == 0)
        val tagged =
          if (id % 6 == 0)
            Id3.buildId3(3, s"t$id", "a", "al", 2000, 1) ++ mp3
          else mp3
        (id, if (id % 13 == 0) tagged.dropRight(3) else tagged)
      })
      .toDF("doc_id", "payload")
  }

  /** Deterministic FLAC corpus for the q214 oracle: rate/channels/bits/
    * total-samples all id arithmetic; every 13th file truncated inside
    * STREAMINFO — dropped. */
  def syntheticFlacCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val flac = buildFlac((8000 + (id % 12) * 4000).toInt,
          (1 + id % 8).toInt, (8 + id % 25).toInt, 1000L + id % 100000 * 37)
        (id, if (id % 13 == 0) flac.dropRight(12) else flac)
      })
      .toDF("doc_id", "payload")
  }
}

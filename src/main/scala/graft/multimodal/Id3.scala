package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ID3v2 provenance parse — the audio twin of [[Exif]]: the capture-side
  * metadata columns (title, artist, album, year, track) multimodal
  * curation policies and dedup windows key on, read straight from the
  * tag block that prepends real-world MP3/audio payloads
  * (id3.org ID3v2.3.0 §3, ID3v2.4.0 structure §3 — the informal
  * standards the whole ecosystem implements).
  *
  * Wire facts the walk honors, version-dispatched:
  *  - the 10-byte header: "ID3", version major 3 or 4, a flags byte, and
  *    a 4-byte SYNCSAFE size (7 bits per byte — MP3 decoders must never
  *    see a false frame-sync inside the tag);
  *  - v2.3 unsynchronisation (flags bit 7): every FF 00 on the wire is
  *    an escaped FF — de-unsynchronised over the whole tag body before
  *    the frame walk;
  *  - the optional extended header (flags bit 6), skipped by its own
  *    size field — 4-byte size EXCLUDING itself in v2.3, syncsafe size
  *    INCLUDING itself in v2.4;
  *  - frames: 4-char id, 4-byte size (PLAIN big-endian in v2.3,
  *    SYNCSAFE in v2.4), 2 flag bytes, payload; a 0x00 where a frame id
  *    should start is padding — end of frames;
  *  - text frames (T***): one encoding byte then text — ISO-8859-1 (0),
  *    UTF-16 with BOM (1), UTF-16BE (2, v2.4), UTF-8 (3, v2.4) — with
  *    an optional NUL terminator, both widths.
  *
  * Year comes from TYER (v2.3) or the leading yyyy of the TDRC
  * timestamp (v2.4 replaced TYER). Broken structure — truncated header,
  * frame running past the tag end, unknown version — drops to None,
  * never half-read fields.
  */
object Id3 {

  /** Parsed tag: (version major, title, artist, album, year, track). */
  final case class Tag(version: Int, title: Option[String],
      artist: Option[String], album: Option[String], year: Option[Int],
      track: Option[Int])

  private def syncsafe(p: Array[Byte], o: Int): Int =
    ((p(o) & 0x7f) << 21) | ((p(o + 1) & 0x7f) << 14) |
      ((p(o + 2) & 0x7f) << 7) | (p(o + 3) & 0x7f)

  private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)

  /** FF 00 → FF over a tag body (ID3v2.3 §5: the escape applied at
    * write time so no byte pair inside the tag looks like an MPEG
    * frame sync). */
  private[multimodal] def deUnsync(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      out.write(b(i))
      if ((b(i) & 0xff) == 0xff && i + 1 < b.length && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  /** Text-frame payload: encoding byte + text, optional NUL terminator
    * (2-byte for the UTF-16 family). None on an encoding this version
    * never wrote or an empty payload. */
  private def textOf(b: Array[Byte], off: Int, end: Int): Option[String] = {
    if (end <= off + 1) return None
    val enc = b(off) & 0xff
    val raw = java.util.Arrays.copyOfRange(b, off + 1, end)
    val cs = enc match {
      case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
      case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-dispatched
      case 2 => java.nio.charset.StandardCharsets.UTF_16BE
      case 3 => java.nio.charset.StandardCharsets.UTF_8
      case _ => return None
    }
    val s = new String(raw, cs)
    val cut = s.indexOf('\u0000')
    Some(if (cut >= 0) s.substring(0, cut) else s).filter(_.nonEmpty)
  }

  /** Walk an ID3v2 tag at the head of `payload`. None when no tag,
    * unknown version, or broken structure. */
  def parseId3(payload: Array[Byte]): Option[Tag] = {
    if (payload == null || payload.length < 10) return None
    if (payload(0) != 'I' || payload(1) != 'D' || payload(2) != '3')
      return None
    val ver = payload(3) & 0xff
    if (ver != 3 && ver != 4) return None
    val flags = payload(5) & 0xff
    if ((payload(6) | payload(7) | payload(8) | payload(9)) < 0) return None
    val size = syncsafe(payload, 6)
    if (10 + size > payload.length) return None
    var body = java.util.Arrays.copyOfRange(payload, 10, 10 + size)
    if ((flags & 0x80) != 0 && ver == 3) body = deUnsync(body)
    var off = 0
    if ((flags & 0x40) != 0) { // extended header
      if (body.length < off + 4) return None
      val ext =
        if (ver == 4) syncsafe(body, off)
        else be32(body, off).toInt + 4 // v2.3 size excludes its own field
      if (ext < 4 || off + ext > body.length) return None
      off += ext
    }
    var title: Option[String] = None
    var artist: Option[String] = None
    var album: Option[String] = None
    var year: Option[Int] = None
    var track: Option[Int] = None
    while (off + 10 <= body.length && body(off) != 0) {
      val id = new String(body, off, 4,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        return None
      val fsize =
        if (ver == 4) syncsafe(body, off + 4) else be32(body, off + 4).toInt
      val start = off + 10
      val end = start + fsize
      if (fsize < 0 || end > body.length) return None // truncated frame
      id match {
        case "TIT2" => title = textOf(body, start, end)
        case "TPE1" => artist = textOf(body, start, end)
        case "TALB" => album = textOf(body, start, end)
        case "TYER" if ver == 3 =>
          year = textOf(body, start, end).flatMap(_.take(4).toIntOption)
        case "TDRC" if ver == 4 => // v2.4 timestamp: yyyy[-MM[-dd...]]
          year = textOf(body, start, end).flatMap(_.take(4).toIntOption)
        case "TRCK" => // "n" or "n/total"
          track = textOf(body, start, end)
            .flatMap(_.takeWhile(_ != '/').toIntOption)
        case _ => () // COMM/TXXX/APIC/... — walked over, not read
      }
      off = end
    }
    Some(Tag(ver, title, artist, album, year, track))
  }

  /** Provenance columns for an (idCol, payloadCol binary) frame:
    * (idCol, id3_version, title, artist, album, year, track), untagged
    * or structurally broken payloads dropped — the mapPartitions parser
    * stage, no shuffle, no tag bytes downstream. */
  def id3MetaBinary(spark: SparkSession, audio: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    import spark.implicits._
    audio.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        parseId3(p).map(t =>
          (id, t.version, t.title, t.artist, t.album, t.year, t.track))
      })
      .toDF(idCol, "id3_version", "title", "artist", "album", "year",
        "track")
  }

  // ───────────────────────── fixture builders ─────────────────────────

  private def ssBytes(n: Int): Array[Byte] = Array(
    ((n >> 21) & 0x7f).toByte, ((n >> 14) & 0x7f).toByte,
    ((n >> 7) & 0x7f).toByte, (n & 0x7f).toByte)

  private def be32Bytes(n: Int): Array[Byte] = Array(
    ((n >> 24) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
    ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)

  private def frame(ver: Int, id: String, enc: Int,
      text: String): Array[Byte] = {
    val cs = enc match {
      case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
      case 1 => java.nio.charset.StandardCharsets.UTF_16 // writes a BOM
      case 2 => java.nio.charset.StandardCharsets.UTF_16BE
      case _ => java.nio.charset.StandardCharsets.UTF_8
    }
    val payload = enc.toByte +: text.getBytes(cs)
    val size =
      if (ver == 4) ssBytes(payload.length) else be32Bytes(payload.length)
    id.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      size ++ Array[Byte](0, 0) ++ payload
  }

  /** A well-formed v2.3 or v2.4 tag (the version picks the frame-size
    * wire format, the year frame id, and the text encoding the fixture
    * exercises), with an unknown TXXX frame the walk must skip and
    * `padding` zero bytes after the last frame. */
  def buildId3(ver: Int, title: String, artist: String, album: String,
      year: Int, track: Int, padding: Int = 0): Array[Byte] = {
    require(ver == 3 || ver == 4, s"ID3v2.$ver")
    val enc = if (ver == 4) 3 else 0 // UTF-8 is v2.4-only on the wire
    val body =
      frame(ver, "TIT2", enc, title) ++
        frame(ver, "TXXX", enc, "graft\u0000skipped") ++
        frame(ver, "TPE1", enc, artist) ++
        frame(ver, "TALB", enc, album) ++
        frame(ver, if (ver == 4) "TDRC" else "TYER", enc,
          if (ver == 4) f"$year%04d-01-02" else f"$year%04d") ++
        frame(ver, "TRCK", enc, s"$track/${track + 5}") ++
        new Array[Byte](padding)
    "ID3".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      Array[Byte](ver.toByte, 0, 0) ++ ssBytes(body.length) ++ body
  }

  /** Deterministic tagged-audio corpus for the q211 oracle: every field
    * a pure function of doc_id (title t{id%97}, artist a{id%89}, album
    * al{id%83}, year 1960+id%60, track 1+id%30), version 3 for even ids
    * and 4 for odd (both frame-size formats, both year frames, both
    * encodings on the oracle path), every 7th tag padded; the tag
    * prepends a real WAV payload the walk must ignore; every 13th doc
    * is a TRUNCATED FILE (the tag's last 8 bytes and everything after
    * them cut off, so the declared syncsafe size overruns the payload)
    * and must be dropped — the structural-break path is on the oracle
    * too. */
  def syntheticTaggedAudioCorpus(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    val tail = BinaryOps.buildWav(8000, 1, 16, Array.tabulate(64)(t =>
      (100 * math.sin(2 * math.Pi * t / 16)).toInt))
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val ver = if (id % 2 == 0) 3 else 4
        val tag = buildId3(ver, s"t${id % 97}", s"a${id % 89}",
          s"al${id % 83}", (1960 + id % 60).toInt, (1 + id % 30).toInt,
          padding = if (id % 7 == 0) 16 else 0)
        (id, if (id % 13 == 0) tag.dropRight(8) else tag ++ tail)
      })
      .toDF("doc_id", "payload")
  }
}

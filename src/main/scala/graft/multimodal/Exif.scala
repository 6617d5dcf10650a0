package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXIF/TIFF metadata for JPEG provenance — the capture-side columns
  * (camera make/model, orientation, capture timestamp) a multimodal
  * curation pipeline keys its dedup windows and policy filters on.
  * Format walk per the EXIF 2.32 / TIFF 6.0 public specs: the APP1
  * marker segment (0xFFE1) carrying the "Exif\0\0" identifier, then a
  * self-contained TIFF file — byte-order mark (`II` little / `MM` big),
  * magic 42, IFD0 as a 12-byte-entry table whose values live inline
  * (≤ 4 octets) or at offsets relative to the TIFF header start.
  *
  * Strictness contract: a structurally broken IFD (entry table or a
  * value offset pointing past the segment) parses to None — truncated
  * provenance must drop, not surface half-read fields; a JPEG without
  * an Exif APP1 (or with an XMP APP1, which shares the marker) is None
  * too. Scale shape: per-payload mapPartitions, no shuffle, pixels
  * untouched (the walk stops at SOS).
  */
object Exif {

  final case class ExifMeta(byteOrder: String, make: String, model: String,
      orientation: Int, dateTime: String)

  private val TagMake = 0x010f
  private val TagModel = 0x0110
  private val TagOrientation = 0x0112
  private val TagDateTime = 0x0132

  // ---------------------------------------------------------------- build

  /** One IFD0 with the four provenance tags, serialized at `bigEndian`
    * or little, as a complete APP1 segment (marker + length + Exif id +
    * TIFF block). ASCII values beyond 4 octets go to the value area
    * after the entry table, offsets TIFF-relative, entries in ascending
    * tag order per the TIFF spec. */
  def buildApp1(make: String, model: String, orientation: Int,
      dateTime: String, bigEndian: Boolean): Array[Byte] = {
    def u16(v: Int): Array[Byte] =
      if (bigEndian) Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      else Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32(v: Long): Array[Byte] =
      if (bigEndian) Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      else Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte)
    val makeB = (make + "\u0000").getBytes(US_ASCII)
    val modelB = (model + "\u0000").getBytes(US_ASCII)
    val dtB = (dateTime + "\u0000").getBytes(US_ASCII)
    // TIFF block layout: header (8) + count (2) + 4 entries (48) + next
    // IFD (4) = 62, then the value area. Per TIFF 6.0 a value of ≤ 4
    // octets lives INLINE in the entry (left-justified, zero-padded);
    // only longer values go to the area, packed in tag order.
    val valueBase = 62L
    val tiff = new ByteArrayOutputStream()
    tiff.write(if (bigEndian) "MM".getBytes(US_ASCII)
      else "II".getBytes(US_ASCII))
    tiff.write(u16(42))
    tiff.write(u32(8)) // IFD0 offset
    tiff.write(u16(4)) // entry count
    def entry(tag: Int, tpe: Int, count: Long, value: Array[Byte]): Unit = {
      tiff.write(u16(tag)); tiff.write(u16(tpe)); tiff.write(u32(count))
      tiff.write(value)
    }
    val area = new ByteArrayOutputStream()
    def asciiEntry(tag: Int, bytes: Array[Byte]): Unit =
      if (bytes.length <= 4)
        entry(tag, 2, bytes.length.toLong, bytes.padTo(4, 0.toByte))
      else {
        entry(tag, 2, bytes.length.toLong, u32(valueBase + area.size()))
        area.write(bytes)
      }
    // ascending tag order: Make, Model, Orientation, DateTime
    asciiEntry(TagMake, makeB)
    asciiEntry(TagModel, modelB)
    entry(TagOrientation, 3, 1L, u16(orientation) ++ u16(0))
    asciiEntry(TagDateTime, dtB)
    tiff.write(u32(0)) // no next IFD
    tiff.write(area.toByteArray)
    val body = "Exif\u0000\u0000".getBytes(US_ASCII) ++ tiff.toByteArray
    val seg = new ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = body.length + 2
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write(body)
    seg.toByteArray
  }

  /** Splice an APP1 segment into a JPEG immediately after SOI — where
    * every real camera writes it. */
  def withApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  // ---------------------------------------------------------------- parse

  /** Walk a JPEG's marker segments for the Exif APP1 and parse its IFD0.
    * None when absent or structurally broken (the drop contract above).
    */
  def parseExif(p: Array[Byte]): Option[ExifMeta] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < p.length && (p(i) & 0xff) == 0xff) {
      val marker = p(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS
      else {
        val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > p.length) return None
        if (marker == 0xe1 && len >= 8 &&
          new String(p, i + 4, 6, US_ASCII) == "Exif\u0000\u0000")
          return parseTiff(p, i + 10, len - 8)
        i += 2 + len
      }
    }
    None
  }

  /** The TIFF block at p[off, off+n): byte order, magic, IFD0 walk. */
  private def parseTiff(p: Array[Byte], off: Int, n: Int): Option[ExifMeta] = {
    if (n < 8) return None
    val bo = new String(p, off, 2, US_ASCII)
    val big = bo match {
      case "MM" => true
      case "II" => false
      case _    => return None
    }
    def u16(at: Long): Option[Int] = {
      if (at < 0 || at + 2 > n) None
      else {
        val a = p(off + at.toInt) & 0xff
        val b = p(off + at.toInt + 1) & 0xff
        Some(if (big) (a << 8) | b else (b << 8) | a)
      }
    }
    def u32(at: Long): Option[Long] = {
      if (at < 0 || at + 4 > n) None
      else {
        val v = (0 until 4).map(k => (p(off + at.toInt + k) & 0xffL))
        Some(if (big) (v(0) << 24) | (v(1) << 16) | (v(2) << 8) | v(3)
        else (v(3) << 24) | (v(2) << 16) | (v(1) << 8) | v(0))
      }
    }
    def ascii(at: Long, count: Long): Option[String] = {
      if (at < 0 || count < 1 || at + count > n) None
      else Some(new String(p, off + at.toInt, count.toInt - 1, US_ASCII))
    }
    for {
      magic <- u16(2) if magic == 42
      ifd0 <- u32(4)
      count <- u16(ifd0)
      // the entry table itself must fit — a count pointing past the
      // segment is the truncated-IFD drop case
      _ <- if (ifd0 + 2 + count * 12L + 4 <= n) Some(()) else None
      fields = (0 until count).flatMap { e =>
        val at = ifd0 + 2 + e * 12L
        for {
          tag <- u16(at)
          tpe <- u16(at + 2)
          cnt <- u32(at + 4)
        } yield (tag, tpe, cnt, at + 8)
      }
      _ <- if (fields.length == count) Some(()) else None
      make <- field(fields, TagMake, 2).flatMap {
        case (cnt, vat) =>
          if (cnt <= 4) ascii(vat, cnt) else u32(vat).flatMap(ascii(_, cnt))
      }
      model <- field(fields, TagModel, 2).flatMap {
        case (cnt, vat) =>
          if (cnt <= 4) ascii(vat, cnt) else u32(vat).flatMap(ascii(_, cnt))
      }
      orient <- field(fields, TagOrientation, 3)
        .flatMap { case (_, vat) => u16(vat) }
      dt <- field(fields, TagDateTime, 2).flatMap {
        case (cnt, vat) =>
          if (cnt <= 4) ascii(vat, cnt) else u32(vat).flatMap(ascii(_, cnt))
      }
    } yield ExifMeta(bo, make, model, orient, dt)
  }

  private def field(fields: Seq[(Int, Int, Long, Long)], tag: Int,
      tpe: Int): Option[(Long, Long)] =
    fields.collectFirst { case (t, tp, cnt, vat) if t == tag && tp == tpe =>
      (cnt, vat)
    }

  // ------------------------------------------------------------- fixtures

  /** Deterministic EXIF-bearing JPEG corpus: the q145 image geometry with
    * an APP1 whose provenance fields are id arithmetic — byte order
    * alternates by parity (both endian walks on the oracle path),
    * orientation cycles the 8 TIFF values, the timestamp is the id
    * folded into EXIF's "YYYY:MM:DD HH:MM:SS". */
  def syntheticExifJpegCorpus(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      // count-pinned repartition before the codec stage (q205 discipline)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (13 + id % 40).toInt
        val h = (9 + (id * 3) % 40).toInt
        val cols = (w + 7) / 8
        val jpeg = BinaryOps.buildJpeg(w, h, (bx, by) =>
          ((id * 31 + (by * cols + bx) * 17) % 256).toInt)
        val dt = f"${2000 + id % 24}%04d:${1 + id % 12}%02d:" +
          f"${1 + id % 28}%02d ${id % 24}%02d:${id % 60}%02d:${id % 60}%02d"
        val app1 = buildApp1(s"make${id % 5}", s"model${id % 7}",
          (1 + id % 8).toInt, dt, bigEndian = id % 2 == 1)
        (id, withApp1(jpeg, app1))
      })
      .toDF("doc_id", "payload")
  }

  /** EXIF provenance over a (doc_id, payload) frame — the mapPartitions
    * walk; payloads without parseable provenance drop. */
  def exifMetaBinary(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        parseExif(p).map(m =>
          (id, m.byteOrder, m.make, m.model, m.orientation, m.dateTime))
      })
      .toDF("doc_id", "byte_order", "make", "model", "orientation",
        "date_time")
  }
}

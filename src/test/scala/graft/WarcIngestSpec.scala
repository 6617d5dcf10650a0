package graft

import graft.io.WarcIngest
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the WARC walk: byte-exact body round-trip (including
  * multi-byte UTF-8), Content-Length framing under adversarial payloads
  * (bodies that contain "WARC/1.0" and header-shaped lines must not
  * desync the record walk), non-response skipping, header
  * case-insensitivity, and drop-bad-record on truncation.
  */
class WarcIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def roundTrip(docs: Seq[(Long, String)]): Seq[WarcIngest.WarcResponse] =
    WarcIngest.parseWarc(WarcIngest.buildWarcFile(0L, docs)).sortBy(_.docId)

  test("round-trip recovers every body byte-exactly, UTF-8 included") {
    val docs = Seq(1L -> "plain ascii", 2L -> "naïve — déjà vu ✓",
      3L -> "", 4L -> "line1\nline2\n")
    val out = roundTrip(docs)
    assert(out.map(r => r.docId -> r.payload) === docs)
    assert(out.forall(_.httpStatus == 200))
  }

  test("framing survives payloads containing WARC and HTTP header shapes") {
    val poison = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999\r\n\r\nHTTP/1.1 500 FAKE\r\n\r\nnot a record"
    val out = roundTrip(Seq(7L -> poison, 8L -> "after the poison"))
    assert(out.map(_.docId) === Seq(7L, 8L))
    assert(out.head.payload === poison)
    assert(out.head.httpStatus === 200) // the REAL status, not the embedded 500
  }

  test("warcinfo records are skipped; URI and record id parse back") {
    val out = roundTrip(Seq(26L -> "x"))
    assert(out.length === 1)
    assert(out.head.targetUri === "https://h0.example.com/d/26")
  }

  test("header names are case-insensitive") {
    val raw = new String(WarcIngest.buildWarcFile(0L, Seq(5L -> "body")), "ISO-8859-1")
      .replace("Content-Length:", "CONTENT-LENGTH:")
      .replace("WARC-Type:", "warc-type:")
    val out = WarcIngest.parseWarc(raw.getBytes("ISO-8859-1"))
    assert(out.map(_.docId) === Seq(5L))
  }

  test("truncated trailing record drops; clean prefix survives") {
    val full = WarcIngest.buildWarcFile(0L, Seq(1L -> "first", 2L -> "second"))
    val cut = full.dropRight(12)
    val out = WarcIngest.parseWarc(cut)
    assert(out.map(_.docId) === Seq(1L))
  }

  test("CDX law: the [offset, offset+length) slice re-parses as that record") {
    val file = WarcIngest.buildWarcFile(3L, Seq(10L -> "alpha", 11L -> "beta — γ", 12L -> ""))
    val recs = WarcIngest.parseWarc(file)
    assert(recs.length === 3)
    recs.foreach { r =>
      val slice = java.util.Arrays.copyOfRange(file,
        r.offset.toInt, (r.offset + r.recordLength).toInt)
      val re = WarcIngest.parseWarc(slice)
      assert(re.map(x => (x.docId, x.payload, x.contentLength)) ===
        Seq((r.docId, r.payload, r.contentLength)))
    }
    // spans tile the file exactly: next offset = prev offset + length
    val sorted = recs.sortBy(_.offset)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(b.offset === a.offset + a.recordLength)
      case _         => ()
    }
    assert(sorted.last.offset + sorted.last.recordLength === file.length.toLong)
  }

  test("distributed build+parse covers all docs exactly once") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val files = WarcIngest.syntheticWarcFiles(spark, docs, nFiles = 4)
    assert(files.count() === 4L)
    val out = WarcIngest.warcResponsesBinary(spark, files)
    val ids = out.select("doc_id").as[Long].collect().sorted
    val want = docs.select("doc_id").as[Long].collect().sorted
    assert(ids === want)
  }

  test("Location parses from the HTTP header block: case-insensitive, " +
      "first wins, absent on 200s, body never scanned") {
    val chain = WarcIngest.buildRedirectWarcFile(0L, Seq(2L -> "terminal body"))
    val recs = WarcIngest.parseWarc(chain).sortBy(_.docId)
    // doc 2: chain length 2 → records 8, 9, 10 at /r/2/{0,1,2}
    assert(recs.map(_.docId) === Seq(8L, 9L, 10L))
    assert(recs.map(_.httpStatus) === Seq(301, 301, 200))
    assert(recs.map(_.location) === Seq(
      "https://h2.example.com/r/2/1", "https://h2.example.com/r/2/2", null))
    assert(recs.last.payload === "terminal body")
    // a body containing a Location-shaped line must not leak into the field
    val poisoned = WarcIngest.buildWarcFile(0L,
      Seq(4L -> "Location: https://evil.example.com/\r\nbody"))
    assert(WarcIngest.parseWarc(poisoned).head.location === null)
  }

  test("WET round-trip recovers text byte-exactly; warcinfo skipped") {
    val docs = Seq((1L, "https://a/1", "plain"),
      (2L, "https://a/2", "naïve — déjà ✓"), (3L, "https://a/3", ""))
    val out = WarcIngest.parseWet(WarcIngest.buildWetFile(0L, docs))
      .sortBy(_.docId)
    assert(out.map(r => (r.docId, r.targetUri, r.text)) === docs)
    out.foreach(r =>
      assert(r.contentLength === r.text.getBytes("UTF-8").length.toLong))
  }

  test("WET framing survives conversion payloads shaped like records") {
    val poison = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 99999\r\n\r\nnot a record"
    val out = WarcIngest.parseWet(WarcIngest.buildWetFile(0L,
      Seq((7L, "https://a/7", poison), (8L, "https://a/8", "after"))))
    assert(out.map(_.docId) === Seq(7L, 8L))
    assert(out.head.text === poison)
  }

  test("WET walk skips response records; WARC walk skips conversions") {
    val wet = WarcIngest.buildWetFile(0L, Seq((1L, "https://a/1", "t")))
    assert(WarcIngest.parseWarc(wet).isEmpty)
    val warc = WarcIngest.buildWarcFile(0L, Seq(1L -> "t"))
    assert(WarcIngest.parseWet(warc).isEmpty)
  }

  test("a final record missing its trailing separator gets a span clamped " +
      "to EOF — no CDX range read past the file") {
    val full = WarcIngest.buildWarcFile(0L, Seq(1L -> "first", 2L -> "second"))
    val noSep = full.dropRight(4) // legally-borderline: last CRLF CRLF gone
    val recs = WarcIngest.parseWarc(noSep)
    assert(recs.map(_.docId) === Seq(1L, 2L))
    val last = recs.maxBy(_.offset)
    assert(last.offset + last.recordLength === noSep.length.toLong)
  }

  test("gzip law: plain and gzipped parses of the same records agree " +
      "field-for-field (coordinates excepted)") {
    val docs = Seq(1L -> "plain ascii", 2L -> "naïve — déjà vu ✓",
      3L -> "", 4L -> "WARC/1.0\r\nContent-Length: 9\r\n\r\npoison")
    val plain = WarcIngest.parseWarc(WarcIngest.buildWarcFile(0L, docs))
    val gz = WarcIngest.parseWarcAuto(WarcIngest.buildWarcFileGz(0L, docs))
    def key(r: WarcIngest.WarcResponse) =
      (r.docId, r.targetUri, r.httpStatus, r.contentLength, r.payload)
    assert(gz.map(key).sortBy(_._1) === plain.map(key).sortBy(_._1))
    // plain blobs keep working through the auto dispatch
    assert(WarcIngest.parseWarcAuto(WarcIngest.buildWarcFile(0L, docs))
      .map(key) === plain.map(key))
  }

  test("gzip CDX law: each record's span is one whole gzip member — the " +
      "compressed slice inflates and re-parses as exactly that record") {
    val docs = Seq(10L -> "alpha", 11L -> "beta — γ", 12L -> "")
    val file = WarcIngest.buildWarcFileGz(3L, docs)
    val recs = WarcIngest.parseWarcAuto(file)
    assert(recs.length === 3)
    recs.foreach { r =>
      val slice = java.util.Arrays.copyOfRange(file,
        r.offset.toInt, (r.offset + r.recordLength).toInt)
      val re = WarcIngest.parseWarcAuto(slice)
      assert(re.map(x => (x.docId, x.payload, x.contentLength)) ===
        Seq((r.docId, r.payload, r.contentLength)))
    }
    // member spans tile the file: warcinfo member first, then records
    val sorted = recs.sortBy(_.offset)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(b.offset === a.offset + a.recordLength)
      case _         => ()
    }
    assert(sorted.last.offset + sorted.last.recordLength === file.length.toLong)
    // a truncated final member drops; the clean prefix survives
    assert(WarcIngest.parseWarcAuto(file.dropRight(10)).map(_.docId) ===
      Seq(10L, 11L))
  }

  test("HTTP body decode: chunked de-framed, gzip/deflate inflated, " +
      "nesting order chunked-over-coding, md5-exact recovery") {
    val text = "the quick brown fox jumps over the lazy dog — " +
      "πάντα ῥεῖ — 0123456789" // > one 16-byte chunk, multi-byte UTF-8
    // id 12: both (3|12 and 4|12); id 9: chunked only; id 8: gzip only;
    // id 7: identity
    val file = WarcIngest.buildEncodedWarcFile(0L,
      Seq(7L -> text, 8L -> text, 9L -> text, 12L -> text))
    val recs = WarcIngest.parseWarc(file).sortBy(_.docId)
    assert(recs.map(_.docId) === Seq(7L, 8L, 9L, 12L))
    assert(recs.forall(_.payload === text))
    assert(recs.map(r => (r.transferEncoding, r.contentEncoding)) === Seq(
      ("identity", "identity"), ("identity", "gzip"),
      ("chunked", "identity"), ("chunked", "gzip")))
  }

  test("brotli bodies decode through real RFC 7932 framing; the coding " +
      "list 'gzip, br' unwinds in reverse wire order; chunked-over-br " +
      "nests") {
    val text = "βrotli body content — 0123456789 abcdefghij κλμ"
    val file = WarcIngest.buildEncodedWarcFile(0L,
      Seq(5L -> text, 10L -> text, 15L -> text, 20L -> text))
    val recs = WarcIngest.parseWarc(file).sortBy(_.docId)
    assert(recs.map(_.docId) === Seq(5L, 10L, 15L, 20L))
    assert(recs.forall(r => r.decoded && r.payload == text),
      recs.map(r => (r.docId, r.decoded)).mkString(", "))
    assert(recs.map(r => (r.transferEncoding, r.contentEncoding)) === Seq(
      ("identity", "br"), ("identity", "br"),
      ("chunked", "br"), ("identity", "gzip, br")))
  }

  test("Content-Encoding is a list header: 'gzip, identity' decodes; an " +
      "unrecognized coding flags decoded=false with a null payload") {
    def rec(ce: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Encoding: $ce\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        body
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:graft:1>\r\n" +
        "WARC-Target-URI: https://a/1\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close(); bo.toByteArray
    }
    // list value with identity members — decodes through the gzip token
    val listed = WarcIngest.parseWarc(rec("gzip, identity", gz("payload a")))
    assert(listed.map(r => (r.payload, r.decoded)) ===
      Seq(("payload a", true)))
    // unrecognized coding: no mojibake reaches downstream text operators
    val zstd = WarcIngest.parseWarc(
      rec("zstd", Array[Byte](0x28, (0xb5 - 256).toByte, 0x2f, 1, 2, 3)))
    assert(zstd.length === 1)
    assert(!zstd.head.decoded && zstd.head.payload == null)
    assert(zstd.head.contentEncoding === "zstd")
  }

  test("deflate bodies inflate under both zlib and raw framing") {
    def deflate(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput("deflated body".getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](256)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOfRange(buf, 0, n)
    }
    Seq(false, true).foreach { raw =>
      val body = deflate(raw)
      val http = (s"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
      val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:graft:1>\r\n" +
        "WARC-Target-URI: https://a/1\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        http ++ "\r\n\r\n".getBytes("ISO-8859-1")
      val out = WarcIngest.parseWarc(rec)
      assert(out.map(_.payload) === Seq("deflated body"), s"raw=$raw")
    }
  }
}

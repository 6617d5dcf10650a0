package graft.io

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** WARC ingestion — the container web crawls actually arrive in
  * (ISO 28500 / WARC 1.1; Common Crawl's WARC/WET drops). The reference
  * ingests CSV weather drops only (SURVEY.md §2.1), so this is north-star
  * crawl capability: read archive blobs as a binary column, split records
  * by Content-Length FRAMING (never by delimiter scanning — response
  * payloads may legally contain "WARC/1.0"), keep the response records,
  * and surface (target URI, HTTP status, payload) as ordinary columns for
  * the curation operators downstream.
  *
  * Scale shape: parse is a per-blob mapPartitions — no shuffle, no
  * driver state; a 100 TB crawl is millions of ~1 GiB WARC files, and
  * each task owns whole files (the format is not splittable mid-record —
  * the same contract real WARC readers on Hadoop use). The synthetic
  * builder groups documents into files with one keyed exchange; group
  * size is a file-sizing knob, exactly like production segment sizing.
  */
object WarcIngest {

  /** One parsed response record: id recovered from the record id URN,
    * the WARC header fields a curation pipeline keys on, the HTTP status
    * from the enclosed message, the decoded body, and the record's byte
    * span inside its file (`offset`, `recordLength` — version line
    * through trailing separator), the coordinates a CDX index serves
    * range reads by.
    */
  final case class WarcResponse(docId: Long, targetUri: String,
      httpStatus: Int, contentLength: Long, payload: String,
      offset: Long, recordLength: Long, location: String = null,
      transferEncoding: String = "identity",
      contentEncoding: String = "identity", decoded: Boolean = true)

  private val CRLF = "\r\n"

  private def httpBlock(text: String): Array[Byte] = {
    val body = text.getBytes(UTF_8)
    val head = s"HTTP/1.1 200 OK${CRLF}Content-Type: text/plain$CRLF" +
      s"Content-Length: ${body.length}$CRLF$CRLF"
    head.getBytes(ISO_8859_1) ++ body
  }

  /** Serialize one WARC record (version line, named headers, blank line,
    * `Content-Length` octets of payload, record separator).
    */
  private def record(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.0").append(CRLF)
    headers.foreach { case (k, v) => head.append(s"$k: $v").append(CRLF) }
    head.append(s"Content-Length: ${payload.length}").append(CRLF).append(CRLF)
    head.toString.getBytes(ISO_8859_1) ++ payload ++
      (CRLF + CRLF).getBytes(ISO_8859_1)
  }

  /** One WARC file: a warcinfo record (exercises type skipping in every
    * parse) followed by a response record per document, id order.
    * `uriOf` overrides the target URI per id (default: the fixture
    * formula the q175/q176 oracles derive from) — crawl-dedup fixtures
    * need re-fetches of ONE resource under different ids.
    */
  def buildWarcFile(fileId: Long, docs: Seq[(Long, String)],
      uriOf: Long => String = id => s"https://h${id % 13}.example.com/d/$id")
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:info:$fileId>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft$CRLF".getBytes(ISO_8859_1)))
    docs.sortBy(_._1).foreach { case (id, text) =>
      out.write(record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:$id>",
        "WARC-Target-URI" -> uriOf(id),
        "Content-Type" -> "application/http; msgtype=response"),
        httpBlock(text)))
    }
    out.toByteArray
  }

  private def redirectBlock(location: String): Array[Byte] =
    (s"HTTP/1.1 301 Moved Permanently${CRLF}Location: $location$CRLF" +
      s"Content-Length: 0$CRLF$CRLF").getBytes(ISO_8859_1)

  /** Redirect-bearing crawl: per document a chain of 1+doc_id%4 fetch
    * records — position p of chain `id` gets record id 4·id+p (disjoint
    * by construction) and target `/r/id/p`; non-terminal positions are
    * 301 responses whose `Location` names the next position, the
    * terminal is the 200 carrying the text. The raw-bytes input to
    * pointer-doubling resolution.
    */
  def buildRedirectWarcFile(fileId: Long, docs: Seq[(Long, String)])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:info:$fileId>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft$CRLF".getBytes(ISO_8859_1)))
    docs.sortBy(_._1).foreach { case (id, text) =>
      val l = (id % 4).toInt
      def u(p: Int) = s"https://h${id % 13}.example.com/r/$id/$p"
      (0 to l).foreach { p =>
        out.write(record(Seq(
          "WARC-Type" -> "response",
          "WARC-Record-ID" -> s"<urn:graft:${4 * id + p}>",
          "WARC-Target-URI" -> u(p),
          "Content-Type" -> "application/http; msgtype=response"),
          if (p < l) redirectBlock(u(p + 1)) else httpBlock(text)))
      }
    }
    out.toByteArray
  }

  def syntheticRedirectWarcFiles(spark: SparkSession, docs: DataFrame,
      nFiles: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups((fid, it) => (fid, buildRedirectWarcFile(fid, it.toSeq)))
      .toDF("file_id", "payload")
  }

  /** Parse every record of a WARC blob; return the responses. Framing is
    * Content-Length only: after the header block, exactly that many
    * octets are payload, then the CRLF CRLF separator — a payload
    * containing "WARC/1.0" or header-shaped lines cannot desync the
    * walk. Header names are case-insensitive per the spec. Malformed
    * blobs return what parsed cleanly before the fault (drop-bad-record,
    * the DROPMALFORMED discipline of the CSV path).
    */
  def parseWarc(bytes: Array[Byte]): Seq[WarcResponse] = {
    val out = ArrayBuffer.empty[WarcResponse]
    var pos = 0

    def line(): Option[String] = {
      var i = pos
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else {
        val s = new String(bytes, pos, i - pos, ISO_8859_1)
        pos = i + 2
        Some(s)
      }
    }

    while (pos < bytes.length) {
      // Tolerate extra separators between records.
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos += 2
      if (pos >= bytes.length) return out.toSeq
      val recStart = pos
      line() match {
        case Some(v) if v.startsWith("WARC/") =>
          val headers = scala.collection.mutable.Map.empty[String, String]
          var h = line()
          while (h.exists(_.nonEmpty)) {
            val s = h.get
            val c = s.indexOf(':')
            if (c > 0) headers(s.substring(0, c).trim.toLowerCase) =
              s.substring(c + 1).trim
            h = line()
          }
          if (h.isEmpty) return out.toSeq // EOF inside headers
          val len = headers.get("content-length").flatMap(_.toLongOption)
          len match {
            case Some(n) if pos + n <= bytes.length =>
              val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)
              pos += n.toInt
              // Span includes the CRLF CRLF separator — the unit a CDX
              // range read fetches — CLAMPED to the blob: a final record
              // that (legally-borderline) omits the trailing separator
              // must not put a span that over-reads past EOF into the
              // index.
              val recLen = math.min(pos + 4, bytes.length).toLong - recStart
              if (headers.get("warc-type").contains("response")) {
                parseResponse(headers, payload, recStart.toLong, recLen)
                  .foreach(out += _)
              }
            case _ => return out.toSeq // bad/truncated record
          }
        case Some(_) => () // skip junk line
        case None    => return out.toSeq
      }
    }
    out.toSeq
  }

  /** De-frame an HTTP/1.1 `Transfer-Encoding: chunked` body (RFC 9112
    * §7.1): hex chunk size (chunk extensions after ';' ignored), CRLF,
    * that many octets, CRLF, …, terminated by a 0-size chunk; trailer
    * fields after the last chunk are ignored. Malformed framing returns
    * what de-framed cleanly (the parser's drop-bad-record discipline).
    */
  private[io] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var pos = 0
    var done = false
    while (!done && pos < body.length) {
      var eol = pos
      while (eol + 1 < body.length &&
        !(body(eol) == '\r' && body(eol + 1) == '\n')) eol += 1
      if (eol + 1 >= body.length) done = true
      else {
        val sizeLine = new String(body, pos, eol - pos, ISO_8859_1)
        val hex = sizeLine.split(";", 2)(0).trim
        val n = try java.lang.Long.parseLong(hex, 16).toInt
          catch { case _: NumberFormatException => -1 }
        if (n < 0) done = true
        else if (n == 0) done = true // trailer + final CRLF ignored
        else if (eol + 2 + n + 2 > body.length) done = true // truncated
        else {
          out.write(body, eol + 2, n)
          pos = eol + 2 + n + 2 // data + its CRLF
        }
      }
    }
    out.toByteArray
  }

  /** Inflate one gzip-wrapped buffer (a single member; HTTP
    * `Content-Encoding: gzip` bodies). Returns the input on any fault —
    * a mislabeled identity body must survive. */
  private[io] def gunzip(body: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(body))
      val out = new ByteArrayOutputStream()
      in.transferTo(out)
      out.toByteArray
    } catch { case _: java.io.IOException => body }

  /** Inflate a `Content-Encoding: deflate` body: the label means zlib
    * (RFC 1950) in the standards and RAW deflate (RFC 1951) from a long
    * tail of legacy servers — try zlib first, fall back to raw, then to
    * identity. */
  private[io] def inflateDeflate(body: Array[Byte]): Array[Byte] = {
    def tryInflate(nowrap: Boolean): Option[Array[Byte]] =
      try {
        val inf = new java.util.zip.Inflater(nowrap)
        inf.setInput(body)
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, n)
        }
        val ok = inf.finished()
        inf.end()
        if (ok) Some(out.toByteArray) else None
      } catch { case _: java.util.zip.DataFormatException => None }
    tryInflate(false).orElse(tryInflate(true)).getOrElse(body)
  }

  /** Inner HTTP message: status from the first line, body after the
    * first CRLF CRLF — DECODED the way a fetch pipeline must before any
    * text operator sees it: `Transfer-Encoding: chunked` de-framed
    * first, then `Content-Encoding: gzip`/`deflate` inflated (dechunk
    * THEN decompress — the wire nests them that way), then UTF-8. Two
    * headers are NOT opaque: `Location` (the redirect pointer chain
    * resolution consumes — case-insensitive, first occurrence wins,
    * absent → null) and the two encoding headers (surfaced lowercased,
    * "identity" when absent).
    */
  private def parseResponse(headers: collection.Map[String, String],
      payload: Array[Byte], offset: Long, recLen: Long): Option[WarcResponse] = {
    val docId = headers.get("warc-record-id")
      .map(_.stripPrefix("<urn:graft:").stripSuffix(">"))
      .flatMap(_.toLongOption)
    val uri = headers.get("warc-target-uri")
    val clen = headers.get("content-length").flatMap(_.toLongOption)
    var i = 0
    while (i + 3 < payload.length &&
      !(payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    val eol = payload.indexOf('\r'.toByte)
    if (i + 3 >= payload.length || eol < 0) None
    else {
      val head = new String(payload, 0, i, ISO_8859_1)
      val lines = head.split("\r\n")
      val status = lines.head.split(" ").lift(1).flatMap(_.toIntOption)
      def header(name: String): Option[String] = lines.tail.collectFirst {
        case l if l.toLowerCase.startsWith(name + ":") =>
          l.substring(name.length + 1).trim
      }
      val location = header("location")
      val te = header("transfer-encoding").map(_.toLowerCase)
        .getOrElse("identity")
      val ce = header("content-encoding").map(_.toLowerCase)
        .getOrElse("identity")
      val raw = java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      val deframed = if (te.contains("chunked")) dechunk(raw) else raw
      // Content-Encoding is a LIST header (RFC 9110 §8.4: codings applied
      // in listed order on the wire, so decoded in reverse); an
      // unrecognized coding token means the octets cannot be recovered —
      // surface decoded=false with a NULL payload so downstream text
      // operators filter rather than ingest mojibake.
      val ceTokens = ce.split(",").map(_.trim).filter(_.nonEmpty)
      var bytes = deframed
      var ok = true
      ceTokens.reverse.foreach {
        case "identity" | ""   => ()
        case "gzip" | "x-gzip" => bytes = gunzip(bytes)
        case "deflate"         => bytes = inflateDeflate(bytes)
        case "br" => Brotli.decode(bytes) match {
          case Some(b) => bytes = b
          case None    => ok = false // structural fault: flag, no mojibake
        }
        case _ => ok = false
      }
      val body = if (ok) new String(bytes, UTF_8) else null
      for (d <- docId; u <- uri; s <- status; l <- clen)
        yield WarcResponse(d, u, s, l, body, offset, recLen,
          location.orNull, te, ce, ok)
    }
  }

  // ---------------------------------------------------------------------
  // Gzip WARC members (.warc.gz — the ISO 28500 / Common Crawl wire
  // format: each record an INDEPENDENT gzip member, concatenated, so a
  // CDX range read can fetch and inflate one record without touching the
  // rest of the file; CDX offsets point at member starts)
  // ---------------------------------------------------------------------

  /** Compress one serialized record as a complete gzip member. */
  private def gzipMember(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(record)
    gz.finish()
    gz.close()
    out.toByteArray
  }

  /** One parsed gzip member: its byte span in the blob and the inflated
    * octets. */
  final case class GzMember(offset: Long, compLength: Long,
      bytes: Array[Byte])

  /** Walk a concatenated-member gzip blob (RFC 1952 framing): per member,
    * parse the 10-byte header + the FLG-gated optional fields
    * (FEXTRA/FNAME/FCOMMENT/FHCRC), inflate with a raw `Inflater`, verify
    * the ISIZE trailer, and record the exact compressed span — the
    * coordinates a CDX index serves range reads by. Stops cleanly at the
    * first malformed member (drop-bad-record).
    */
  private[io] def gzipMembers(bytes: Array[Byte]): Seq[GzMember] = {
    val out = ArrayBuffer.empty[GzMember]
    var pos = 0
    while (pos + 10 <= bytes.length &&
      (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b &&
      bytes(pos + 2) == 8) {
      val start = pos
      val flg = bytes(pos + 3) & 0xff
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        if (p + 2 > bytes.length) return out.toSeq
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME: NUL-terminated
        while (p < bytes.length && bytes(p) != 0) p += 1
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
        while (p < bytes.length && bytes(p) != 0) p += 1
        p += 1
      }
      if ((flg & 2) != 0) p += 2 // FHCRC
      if (p >= bytes.length) return out.toSeq
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, p, bytes.length - p)
      val data = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      try {
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n > 0) data.write(buf, 0, n)
        }
        if (!inf.finished()) { inf.end(); return out.toSeq } // truncated
      } catch {
        case _: java.util.zip.DataFormatException =>
          inf.end(); return out.toSeq
      }
      val consumed = (bytes.length - p) - inf.getRemaining
      inf.end()
      val trailer = p + consumed
      if (trailer + 8 > bytes.length) return out.toSeq
      val isize = (bytes(trailer + 4) & 0xffL) |
        ((bytes(trailer + 5) & 0xffL) << 8) |
        ((bytes(trailer + 6) & 0xffL) << 16) |
        ((bytes(trailer + 7) & 0xffL) << 24)
      val inflated = data.toByteArray
      if (isize != (inflated.length & 0xffffffffL)) return out.toSeq
      pos = trailer + 8
      out += GzMember(start.toLong, (pos - start).toLong, inflated)
    }
    out.toSeq
  }

  /** True when the blob leads with the gzip magic — the dispatch test
    * [[parseWarcAuto]] runs per file. */
  private[io] def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Parse a WARC blob in EITHER wire format: plain octets walk through
    * [[parseWarc]] unchanged; a `.warc.gz` blob walks member-wise — each
    * member inflates independently and its records' CDX coordinates are
    * the MEMBER's compressed span (offset at member start, the Common
    * Crawl convention), so a range read fetches
    * [offset, offset+record_length) and inflates exactly one record.
    */
  def parseWarcAuto(bytes: Array[Byte]): Seq[WarcResponse] =
    if (!isGzip(bytes)) parseWarc(bytes)
    else gzipMembers(bytes).flatMap { m =>
      parseWarc(m.bytes).map(r =>
        r.copy(offset = m.offset, recordLength = m.compLength))
    }

  /** [[buildWarcFile]]'s `.warc.gz` twin: the SAME records (warcinfo +
    * one response per doc, id order), each serialized then compressed as
    * its own gzip member and concatenated — byte-for-byte the record
    * stream of the plain builder, so plain and gzipped parses of one doc
    * set must agree (the WarcIngestSpec law).
    */
  def buildWarcFileGz(fileId: Long, docs: Seq[(Long, String)],
      uriOf: Long => String = id => s"https://h${id % 13}.example.com/d/$id")
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(gzipMember(record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:info:$fileId>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft$CRLF".getBytes(ISO_8859_1))))
    docs.sortBy(_._1).foreach { case (id, text) =>
      out.write(gzipMember(record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:$id>",
        "WARC-Target-URI" -> uriOf(id),
        "Content-Type" -> "application/http; msgtype=response"),
        httpBlock(text))))
    }
    out.toByteArray
  }

  def syntheticWarcFilesGz(spark: SparkSession, docs: DataFrame,
      nFiles: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups((fid, it) => (fid, buildWarcFileGz(fid, it.toSeq)))
      .toDF("file_id", "payload")
  }

  // ---------------------------------------------------------------------
  // HTTP body encodings (Transfer-Encoding: chunked, Content-Encoding:
  // gzip/deflate — what real fetch records carry routinely)
  // ---------------------------------------------------------------------

  /** An HTTP 200 block whose body rides the wire encodings a real crawl
    * meets: a list of content codings applied in header order (gzip /
    * br — brotli bodies use the RFC 7932 uncompressed-meta-block writer,
    * real framing end to end), then optionally chunked framing (applied
    * OVER the content-codings, per the RFC nesting), identity otherwise.
    * Chunk size 16 exercises multi-chunk reassembly on every non-trivial
    * body.
    */
  private def httpBlockEncoded(text: String, chunked: Boolean,
      codings: Seq[String]): Array[Byte] = {
    val plain = text.getBytes(UTF_8)
    val coded = codings.foldLeft(plain) { (b, c) =>
      c match {
        case "gzip" => gzipMember(b)
        case "br"   => Brotli.encodeUncompressed(b)
        case other  => throw new IllegalArgumentException(other)
      }
    }
    val framed =
      if (!chunked) coded
      else {
        val out = new ByteArrayOutputStream()
        coded.grouped(16).foreach { chunk =>
          out.write(s"${chunk.length.toHexString}$CRLF".getBytes(ISO_8859_1))
          out.write(chunk)
          out.write(CRLF.getBytes(ISO_8859_1))
        }
        out.write(s"0$CRLF$CRLF".getBytes(ISO_8859_1))
        out.toByteArray
      }
    val head = new StringBuilder(s"HTTP/1.1 200 OK$CRLF")
      .append(s"Content-Type: text/plain$CRLF")
    if (codings.nonEmpty)
      head.append(s"Content-Encoding: ${codings.mkString(", ")}$CRLF")
    if (chunked) head.append(s"Transfer-Encoding: chunked$CRLF")
    else head.append(s"Content-Length: ${framed.length}$CRLF")
    head.append(CRLF)
    head.toString.getBytes(ISO_8859_1) ++ framed
  }

  /** Encoded-fetch fixture: every 3rd doc's response body is chunked;
    * content codings by residue — every 20th rides the LIST "gzip, br"
    * (both codings stacked in wire order), else every 5th br, else every
    * 4th gzip, the rest identity. The WARC walk itself is unchanged —
    * the record's Content-Length frames the whole HTTP block regardless
    * of what the body rides inside it.
    */
  def buildEncodedWarcFile(fileId: Long, docs: Seq[(Long, String)])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:info:$fileId>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft$CRLF".getBytes(ISO_8859_1)))
    docs.sortBy(_._1).foreach { case (id, text) =>
      val codings =
        if (id % 20 == 0) Seq("gzip", "br")
        else if (id % 5 == 0) Seq("br")
        else if (id % 4 == 0) Seq("gzip")
        else Nil
      out.write(record(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:$id>",
        "WARC-Target-URI" -> s"https://h${id % 13}.example.com/d/$id",
        "Content-Type" -> "application/http; msgtype=response"),
        httpBlockEncoded(text, chunked = id % 3 == 0, codings)))
    }
    out.toByteArray
  }

  def syntheticEncodedWarcFiles(spark: SparkSession, docs: DataFrame,
      nFiles: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups((fid, it) => (fid, buildEncodedWarcFile(fid, it.toSeq)))
      .toDF("file_id", "payload")
  }

  /** [[warcResponsesBinary]] plus the decoded wire-encoding evidence:
    * the transfer/content encodings each response arrived under — the
    * reader a fetch pipeline audits its decode coverage with.
    */
  def warcResponsesDecoded(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files.select(col("file_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (_, bytes) =>
        parseWarcAuto(bytes).map(r =>
          (r.docId, r.targetUri, r.httpStatus, r.payload,
            r.transferEncoding, r.contentEncoding, r.decoded))
      })
      .toDF("doc_id", "target_uri", "http_status", "payload",
        "transfer_encoding", "content_encoding", "decoded")
  }

  /** Synthetic crawl: documents grouped into `nFiles` WARC blobs
    * (file = doc_id mod nFiles; one keyed exchange, then a per-group
    * serialize — group size IS the file-size knob, so memory per task is
    * the file size, same as any archive writer).
    */
  def syntheticWarcFiles(spark: SparkSession, docs: DataFrame,
      nFiles: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups((fid, it) => (fid, buildWarcFile(fid, it.toSeq)))
      .toDF("file_id", "payload")
  }

  /** Parse a frame of WARC blobs into response rows: the mapPartitions
    * ingest stage (no shuffle; each task walks whole files). Accepts
    * plain AND `.warc.gz` blobs per file via [[parseWarcAuto]].
    */
  def warcResponsesBinary(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files.select(col("file_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (_, bytes) =>
        parseWarcAuto(bytes).map(r =>
          (r.docId, r.targetUri, r.httpStatus, r.contentLength, r.payload,
            r.location))
      })
      .toDF("doc_id", "target_uri", "http_status", "content_length",
        "payload", "location")
  }

  final case class WetRecord(docId: Long, targetUri: String,
      contentLength: Long, text: String)

  /** One WET file (the text-only CONVERSION sibling of the response
    * archive — what Common Crawl publishes as `.wet`): a warcinfo record
    * followed by one `WARC-Type: conversion` record per document whose
    * payload is the extracted plain text (UTF-8, no HTTP block), with
    * `WARC-Refers-To` naming the response record it was converted from.
    */
  def buildWetFile(fileId: Long, docs: Seq[(Long, String, String)])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:wetinfo:$fileId>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft$CRLF".getBytes(ISO_8859_1)))
    docs.sortBy(_._1).foreach { case (id, uri, text) =>
      out.write(record(Seq(
        "WARC-Type" -> "conversion",
        "WARC-Record-ID" -> s"<urn:graft:wet:$id>",
        "WARC-Refers-To" -> s"<urn:graft:$id>",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "text/plain"),
        text.getBytes(UTF_8)))
    }
    out.toByteArray
  }

  /** Walk a WET blob's conversion records — the same Content-Length-only
    * framing discipline as [[parseWarc]] (payloads containing "WARC/1.0"
    * cannot desync it), non-conversion records skipped, drop-bad-record
    * on truncation.
    */
  def parseWet(bytes: Array[Byte]): Seq[WetRecord] = {
    val out = ArrayBuffer.empty[WetRecord]
    var pos = 0
    def line(): Option[String] = {
      var i = pos
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else {
        val s = new String(bytes, pos, i - pos, ISO_8859_1)
        pos = i + 2
        Some(s)
      }
    }
    while (pos < bytes.length) {
      while (pos + 1 < bytes.length && bytes(pos) == '\r' &&
        bytes(pos + 1) == '\n') pos += 2
      if (pos >= bytes.length) return out.toSeq
      line() match {
        case Some(v) if v.startsWith("WARC/") =>
          val headers = scala.collection.mutable.Map.empty[String, String]
          var h = line()
          while (h.exists(_.nonEmpty)) {
            val s = h.get
            val c = s.indexOf(':')
            if (c > 0) headers(s.substring(0, c).trim.toLowerCase) =
              s.substring(c + 1).trim
            h = line()
          }
          if (h.isEmpty) return out.toSeq
          headers.get("content-length").flatMap(_.toLongOption) match {
            case Some(n) if pos + n <= bytes.length =>
              val payload =
                java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)
              pos += n.toInt
              if (headers.get("warc-type").contains("conversion")) {
                for {
                  id <- headers.get("warc-record-id")
                    .map(_.stripPrefix("<urn:graft:wet:").stripSuffix(">"))
                    .flatMap(_.toLongOption)
                  uri <- headers.get("warc-target-uri")
                } out += WetRecord(id, uri, n,
                  new String(payload, UTF_8))
              }
            case _ => return out.toSeq
          }
        case Some(_) => ()
        case None    => return out.toSeq
      }
    }
    out.toSeq
  }

  /** The WET-side distributed pair of [[syntheticWarcFiles]] /
    * [[warcResponsesBinary]]: group text rows into `nFiles` WET blobs,
    * and walk a frame of blobs back into conversion rows. No shuffle on
    * the read side; tasks own whole files.
    */
  def syntheticWetFiles(spark: SparkSession, docs: DataFrame,
      nFiles: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups((fid, it) => (fid, buildWetFile(fid, it.map { case (id, t) =>
        (id, s"https://h${id % 13}.example.com/d/$id", t)
      }.toSeq)))
      .toDF("file_id", "payload")
  }

  def wetRecordsBinary(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files.select(col("file_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (_, bytes) =>
        parseWet(bytes).map(r =>
          (r.docId, r.targetUri, r.contentLength, r.text))
      })
      .toDF("doc_id", "target_uri", "content_length", "text")
  }

  /** CDX index over a frame of WARC blobs: one row per response record
    * with its SURT key and byte span — what a 100 TB crawl store serves
    * random access from (look up the SURT key, range-read
    * [offset, offset+record_length) out of one file). Same no-shuffle
    * walk as [[warcResponsesBinary]]; the SURT key is pure Column
    * arithmetic on the parsed URI. A deployment sorts/partitions this
    * frame by `surt_key` (the Z-order/ck layout machinery in `io.Layout`
    * applies unchanged); kept unsorted here so the oracle checks the
    * walk, not a sort.
    */
  def warcCdx(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = files.select(col("file_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (fid, bytes) =>
        parseWarcAuto(bytes).map(r =>
          (r.docId, fid, r.targetUri, r.offset, r.recordLength))
      })
      .toDF("doc_id", "file_id", "target_uri", "offset", "record_length")
    rows.withColumn("surt_key",
      graft.operators.UrlOps.surtKey(col("target_uri")))
  }
}

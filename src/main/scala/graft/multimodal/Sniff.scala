package graft.multimodal

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-type sniffing over opaque crawl payloads — the dispatch a
  * pipeline runs BEFORE any typed decode: a crawl byte stream does not
  * announce what it is; the first bytes do (the WHATWG MIME-sniffing
  * model, magic numbers only — no extension, no header trust). Each
  * format rule matches the container's published signature:
  * JPEG FF D8, GIF "GIF8", PNG 89 'PNG', RIFF....WAVE, ISO-BMFF "ftyp"
  * at +4, EBML 1A 45 DF A3, "WARC/" records, and leading-whitespace-
  * tolerant '<' markup for HTML. One codegen-free mapPartitions pass
  * reading at most the first few bytes per payload; downstream the
  * sniffed class routes payloads to the matching [[BinaryOps]] /
  * [[graft.io.WarcIngest]] / [[graft.operators.HtmlExtract]] decoder.
  */
object Sniff {

  /** Format label from magic bytes; "unknown" when nothing matches. */
  def sniffFormat(p: Array[Byte]): String = {
    def at(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
    def ascii(from: Int, s: String): Boolean =
      p.length >= from + s.length &&
        s.indices.forall(j => at(from + j) == s.charAt(j).toInt)
    if (at(0) == 0xff && at(1) == 0xd8) "jpeg"
    else if (ascii(0, "GIF8")) "gif"
    else if (at(0) == 0x89 && ascii(1, "PNG")) "png"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "wav"
    else if (p.length >= 12 && ascii(4, "ftyp")) "mp4"
    else if (at(0) == 0x1a && at(1) == 0x45 && at(2) == 0xdf && at(3) == 0xa3)
      "webm"
    else if (ascii(0, "WARC/")) "warc"
    else {
      // HTML: skip leading ASCII whitespace, then a tag open
      var i = 0
      while (i < p.length && (p(i) == ' ' || p(i) == '\t' || p(i) == '\n' ||
        p(i) == '\r')) i += 1
      if (i < p.length && p(i) == '<') "html" else "unknown"
    }
  }

  /** Mixed-format corpus: doc_id mod 7 picks the container, each built
    * by the SAME real serializer its dedicated fixture corpus uses
    * (BinaryOps' jpeg/gif/wav/avc-mp4/webm formulas, WarcIngest's record
    * writer, HtmlExtract's page renderer) — the sniffer faces full real
    * payloads, not truncated magic stubs.
    */
  def syntheticMixedCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val payload: Array[Byte] = (id % 7) match {
          case 0 =>
            val w = (13 + id % 40).toInt
            val h = (9 + (id * 3) % 40).toInt
            val cols = (w + 7) / 8
            BinaryOps.buildJpeg(w, h, (bx, by) =>
              ((id * 31 + (by * cols + bx) * 17) % 256).toInt)
          case 1 =>
            val pal = Array.tabulate(64)(i =>
              ((i * 37 + 11) % 256, (i * 73 + 29) % 256, (i * 101 + 47) % 256))
            BinaryOps.buildGif((13 + id % 20).toInt, (11 + (id * 3) % 20).toInt,
              pal, (x, y) => ((id + x * 7 + y * 31) % 64).toInt,
              interlace = id % 4 == 0)
          case 2 =>
            val nCh = (1 + id % 2).toInt
            val m = (100 + id % 200).toInt * nCh
            BinaryOps.buildWav((8000 * (1 + id % 3)).toInt, nCh, 16,
              Array.tabulate(m)(j =>
                ((id * 31 + j * 7919L) % 65536L - 32768L).toInt))
          case 3 =>
            BinaryOps.buildAvcMp4(66, 30, (1 + id % 8).toInt,
              (1 + id % 6).toInt, (id % 2).toInt,
              if (id % 3 == 0) 1 else 0, (10 + id % 20).toInt, keyEvery = 5)
          case 4 =>
            BinaryOps.buildWebm(
              Seq("V_VP8", "V_VP9", "V_AV1")((id % 3).toInt),
              width = (64 + (id % 97) * 2).toInt,
              height = (36 + ((id * 3) % 83) * 2).toInt,
              durationUnits = (1000 + id % 500).toDouble,
              nCues = (1 + id % 12).toInt,
              audioFirst = id % 4 == 0,
              unknownSizeSegment = id % 5 == 0)
          case 5 =>
            graft.io.WarcIngest.buildWarcFile(id, Seq(id -> text))
          case _ =>
            (s"<html><head><title>Doc $id</title></head><body><p>" +
              graft.operators.HtmlExtract.escapeHtml(text) +
              "</p></body></html>").getBytes(UTF_8)
        }
        (id, payload)
      })
      .toDF("doc_id", "payload")
  }

  /** Sniff a payload frame: (doc_id, format). The shuffle-free dispatch
    * stage of a typed-decode pipeline.
    */
  def sniffBinary(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, sniffFormat(bytes)) })
      .toDF("doc_id", "format")
  }
}

package graft.io

import java.nio.charset.{CharacterCodingException, CodingErrorAction}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16BE, UTF_16LE, UTF_8}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Charset detection + decode — the step between a crawl payload's raw
  * octets and any text operator (a real crawl is a mix of UTF-8,
  * BOM-marked UTF-16 exports, and legacy single-byte pages; HTTP
  * headers lie often enough that curation pipelines sniff bytes). The
  * policy is the robust subset every pipeline converges on: BOM wins
  * (FF FE → UTF-16LE, FE FF → UTF-16BE, EF BB BF → UTF-8), else STRICT
  * UTF-8 validation (JDK CharsetDecoder with REPORT — no silent
  * replacement), else the Latin-1 fallback that decodes any byte
  * sequence. Detection is deterministic, so it oracles by formula;
  * decode is lossless for the BOM'd and valid-UTF-8 classes.
  *
  * Scale shape: mapPartitions over the payload column, no shuffle — the
  * [[graft.multimodal.BinaryOps]] discipline.
  */
object CharsetDetect {

  /** Charset label from bytes alone. */
  def detect(p: Array[Byte]): String = {
    def at(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
    if (at(0) == 0xff && at(1) == 0xfe) "utf-16le"
    else if (at(0) == 0xfe && at(1) == 0xff) "utf-16be"
    else if (at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf) "utf-8"
    else if (validUtf8(p)) "utf-8"
    else "latin-1"
  }

  /** Strict UTF-8 validation (malformed OR unmappable → false). */
  def validUtf8(p: Array[Byte]): Boolean = {
    val dec = UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(p)); true }
    catch { case _: CharacterCodingException => false }
  }

  /** (charset, text): BOMs stripped before decode; Latin-1 never fails. */
  def decode(p: Array[Byte]): (String, String) = detect(p) match {
    case "utf-16le" =>
      ("utf-16le", new String(p, 2, p.length - 2, UTF_16LE))
    case "utf-16be" =>
      ("utf-16be", new String(p, 2, p.length - 2, UTF_16BE))
    case "utf-8" =>
      val off = if (p.length >= 3 && (p(0) & 0xff) == 0xef) 3 else 0
      ("utf-8", new String(p, off, p.length - off, UTF_8))
    case _ => ("latin-1", new String(p, ISO_8859_1))
  }

  /** Mixed-encoding corpus: doc_id mod 3 picks UTF-8 (bare), UTF-16LE
    * (BOM) or UTF-16BE (BOM) — all three lossless for any text, so the
    * decode oracles as an md5 round-trip.
    */
  def syntheticEncodedCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val payload: Array[Byte] = (id % 3) match {
          case 0 => text.getBytes(UTF_8)
          case 1 => Array(0xff.toByte, 0xfe.toByte) ++ text.getBytes(UTF_16LE)
          case _ => Array(0xfe.toByte, 0xff.toByte) ++ text.getBytes(UTF_16BE)
        }
        (id, payload)
      })
      .toDF("doc_id", "payload")
  }

  /** Distributed detect+decode: (doc_id, charset, text). */
  def decodeBinary(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (cs, text) = decode(bytes)
        (id, cs, text)
      })
      .toDF("doc_id", "charset", "text")
  }
}

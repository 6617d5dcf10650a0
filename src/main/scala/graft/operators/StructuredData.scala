package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-data extraction from HTML heads — the two vocabularies a
  * real crawl mines for clean document metadata before touching body
  * text: OpenGraph `<meta property="og:*" content="…">` pairs and
  * schema.org JSON-LD `<script type="application/ld+json">` blocks.
  *
  * The tag scan is the same single-forward-walk the other HTML stages
  * use (comments skipped, non-LD script raw text skipped to its close
  * tag, quote-aware attribute parse). JSON-LD blocks are NOT hand-parsed:
  * the raw block rides out of the scan as a string column and the typed
  * fields come from Spark's codegen'd `get_json_object` — the JSON path
  * evaluation stays inside whole-stage codegen instead of a per-row
  * object mapper.
  *
  * Scale shape: per-row scan + projection, no shuffle; output is
  * pages-sized with a handful of short columns.
  */
object StructuredData {

  /** (og properties in document order, first JSON-LD block or null). */
  def scanPage(html: String): (Seq[(String, String)], String) = {
    val og = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var ld: String = null
    val lower = html.toLowerCase
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (html.startsWith("<!--", lt)) {
        val e = html.indexOf("-->", lt + 4)
        i = if (e < 0) n else e + 3
      } else {
        val gt = html.indexOf('>', lt)
        if (gt < 0) { i = n }
        else {
          val raw = html.substring(lt + 1, gt).trim
          val closing = raw.startsWith("/")
          val body = (if (closing) raw.drop(1) else raw).trim
          val name = body.takeWhile(c => !c.isWhitespace && c != '/').toLowerCase
          i = gt + 1
          if (!closing) name match {
            case "meta" =>
              val attrs = HtmlExtract.parseAttrs(body.drop(name.length))
              attrs.get("property").filter(_.toLowerCase.startsWith("og:"))
                .foreach { p =>
                  attrs.get("content").foreach(c => og += p.toLowerCase -> c)
                }
            case "script" | "style" =>
              val close = lower.indexOf(s"</$name", i)
              val end = if (close < 0) n else close
              val isLd = name == "script" &&
                HtmlExtract.parseAttrs(body.drop(name.length)).get("type")
                  .exists(_.equalsIgnoreCase("application/ld+json"))
              if (isLd && ld == null) ld = html.substring(i, end).trim
              i = if (close < 0) n
              else { val g = html.indexOf('>', close); if (g < 0) n else g + 1 }
            case _ => ()
          }
        }
      }
    }
    (og.toSeq, ld)
  }

  /** Distributed extraction: og:title/type/image/url as columns (first
    * occurrence wins, the OpenGraph rule) + the schema.org fields pulled
    * from the first JSON-LD block via codegen'd JSON paths.
    */
  def structuredBinary(spark: SparkSession, pages: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    import spark.implicits._
    val scanned = pages.select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, html) =>
        val (og, ld) = scanPage(html)
        val m = og.groupBy(_._1).map { case (k, vs) => k -> vs.head._2 }
        (id, m.getOrElse("og:title", null), m.getOrElse("og:type", null),
          m.getOrElse("og:image", null), m.getOrElse("og:url", null), ld)
      })
      .toDF(idCol, "og_title", "og_type", "og_image", "og_url", "ld_json")
    scanned.select(col(idCol), col("og_title"), col("og_type"),
      col("og_image"), col("og_url"),
      get_json_object(col("ld_json"), "$['@type']").as("ld_type"),
      get_json_object(col("ld_json"), "$.headline").as("ld_headline"),
      get_json_object(col("ld_json"), "$.wordCount").cast("int")
        .as("ld_word_count"))
  }

  /** Page-level robots directives (`<meta name="robots" content="…">` —
    * the opt-out a compliant corpus pipeline must honor BEFORE a page's
    * text or links enter any downstream store): (noindex, nofollow),
    * token-matched case-insensitively in the comma-separated content
    * list, with `none` ≡ `noindex, nofollow` per the de-facto standard.
    * First robots meta wins; absent → (false, false). Same scan shape
    * as [[scanPage]]; per-row, no shuffle.
    */
  def metaRobots(html: String): (Boolean, Boolean) = {
    val lower = html.toLowerCase
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return (false, false)
      if (html.startsWith("<!--", lt)) {
        val e = html.indexOf("-->", lt + 4)
        i = if (e < 0) n else e + 3
      } else {
        val gt = html.indexOf('>', lt)
        if (gt < 0) return (false, false)
        val raw = html.substring(lt + 1, gt).trim
        val closing = raw.startsWith("/")
        val body = (if (closing) raw.drop(1) else raw).trim
        val name = body.takeWhile(c => !c.isWhitespace && c != '/').toLowerCase
        i = gt + 1
        if (!closing) name match {
          case "meta" =>
            val attrs = HtmlExtract.parseAttrs(body.drop(name.length))
            if (attrs.get("name").exists(_.equalsIgnoreCase("robots"))) {
              val toks = attrs.getOrElse("content", "").toLowerCase
                .split(",").map(_.trim).toSet
              val none = toks.contains("none")
              return (none || toks.contains("noindex"),
                none || toks.contains("nofollow"))
            }
          case "script" | "style" =>
            val close = lower.indexOf(s"</$name", i)
            i = if (close < 0) n
            else { val g = html.indexOf('>', close); if (g < 0) n else g + 1 }
          case _ => ()
        }
      }
    }
    (false, false)
  }

  /** Distributed directive extraction: (id, noindex, nofollow). */
  def metaRobotsBinary(spark: SparkSession, pages: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    import spark.implicits._
    pages.select(col(idCol).cast("long"), col(htmlCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, html) =>
        val (ni, nf) = metaRobots(html)
        (id, ni, nf)
      })
      .toDF(idCol, "noindex", "nofollow")
  }

  /** Directive fixture: head carries a robots meta by doc_id%5 — absent,
    * noindex, nofollow, "noindex, nofollow", and `none` (≡ both) — plus
    * a script containing a fake robots meta that must not match.
    */
  def syntheticDirectiveCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val directive = (id % 5) match {
          case 0 => ""
          case 1 => """<meta name="robots" content="noindex">"""
          case 2 => """<meta name="ROBOTS" content="NoFollow">"""
          case 3 => """<meta name="robots" content="noindex, nofollow">"""
          case _ => """<meta name="robots" content="none">"""
        }
        val html = s"<html><head><title>Doc $id</title>$directive" +
          "<script>var s='<meta name=\"robots\" content=\"noindex\">';" +
          s"</script></head><body><p>body $id</p></body></html>"
        (id, html)
      })
      .toDF("doc_id", "html")
  }

  /** Deterministic fixture: each document renders a head carrying four
    * og:* metas (first-occurrence duplicate included — the OpenGraph
    * rule under test), a NON-LD script (must not be captured), and one
    * JSON-LD Article block, all fields doc_id formulas.
    */
  def syntheticSocialCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val host = s"https://h${id % 13}.example.com"
        val sb = new StringBuilder
        sb ++= s"<html><head><title>Doc $id</title>"
        sb ++= s"""<meta property="og:title" content="Doc $id">"""
        sb ++= s"""<meta property="OG:TYPE" content="article">"""
        sb ++= s"""<meta property="og:image" content="$host/img/$id.jpg">"""
        sb ++= s"""<meta property="og:url" content="$host/d/$id">"""
        // duplicate: first occurrence must win
        sb ++= s"""<meta property="og:title" content="WRONG $id">"""
        sb ++= "<script>var t='og:title fake';</script>"
        sb ++= """<script type="application/ld+json">"""
        sb ++= s"""{"@context":"https://schema.org","@type":"Article","""
        sb ++= s""""headline":"Doc $id","wordCount":${100 + id % 50}}"""
        sb ++= "</script></head><body><p>body</p></body></html>"
        (id, sb.toString)
      })
      .toDF("doc_id", "html")
  }
}

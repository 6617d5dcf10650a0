package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Out-link extraction + the corpus anchor-text index — the link-graph
  * feed between HTML ingest ([[HtmlExtract]]) and graph analytics
  * ([[LinkAnalysis]] PageRank) or anchor-text retrieval signals.
  *
  * Extraction is the same single-scan tag walk the other HTML stages
  * use (comments skipped, script/style raw text skipped): each `<a>`
  * yields its `href` attribute (quote-aware parse) and its anchor text —
  * the text content up to the matching `</a>`, nested tags stripped,
  * entities decoded. `href`s resolve against the page's base URI with
  * the RFC 3986 cases a crawl actually sees: absolute URLs pass through,
  * `//host/...` inherits the scheme, `/path` is host-relative, anything
  * else is path-relative (last segment of the base replaced); fragments
  * drop (a crawl frontier never distinguishes them).
  *
  * Scale shape: extraction is a per-row flatMap (no shuffle); the anchor
  * index is one hash aggregation keyed by resolved target — partial
  * aggregation map-side, output is targets-sized, not links-sized.
  */
object LinkGraph {

  final case class Link(seq: Int, href: String, anchor: String)

  /** RFC 3986-lite resolution of `href` against an absolute `base`. */
  def resolve(base: String, href: String): String = {
    val noFrag = { val h = href.indexOf('#'); if (h < 0) href else href.take(h) }
    if (noFrag.isEmpty) base
    else if (noFrag.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")) noFrag
    else {
      val schemeEnd = base.indexOf("://")
      val scheme = if (schemeEnd < 0) "https" else base.take(schemeEnd)
      val afterScheme = if (schemeEnd < 0) base else base.drop(schemeEnd + 3)
      val slash = afterScheme.indexOf('/')
      val host = if (slash < 0) afterScheme else afterScheme.take(slash)
      val basePath = if (slash < 0) "/" else afterScheme.drop(slash)
      if (noFrag.startsWith("//")) scheme + ":" + noFrag
      else if (noFrag.startsWith("/")) s"$scheme://$host$noFrag"
      else {
        val dir = basePath.take(basePath.lastIndexOf('/') + 1)
        s"$scheme://$host$dir$noFrag"
      }
    }
  }

  /** All `<a href=…>anchor</a>` links of a page, in document order. */
  def outLinks(html: String): Seq[Link] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Link]
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
            case "a" =>
              val attrs = HtmlExtract.parseAttrs(body.drop(1))
              val close = lower.indexOf("</a", i)
              val end = if (close < 0) n else close
              // anchor text: tags stripped, entities decoded, one scan
              val sb = new StringBuilder
              var j = i
              while (j < end) {
                val c = html.charAt(j)
                if (c == '<') {
                  val g = html.indexOf('>', j)
                  j = if (g < 0) end else g + 1
                } else if (c == '&') {
                  val semi = html.indexOf(';', j)
                  if (semi > j && semi - j <= 10) {
                    Sitemap.decodeEntities(html.substring(j, semi + 1)) match {
                      case d if d.length < semi + 1 - j => sb ++= d; j = semi + 1
                      case _ => sb += '&'; j += 1
                    }
                  } else { sb += '&'; j += 1 }
                } else { sb += c; j += 1 }
              }
              attrs.get("href").filter(_.nonEmpty).foreach { href =>
                out += Link(out.length, href, sb.toString.trim)
              }
              i = if (close < 0) n else close
            case "script" | "style" =>
              val close = lower.indexOf(s"</$name", i)
              i = if (close < 0) n
              else { val g = html.indexOf('>', close); if (g < 0) n else g + 1 }
            case _ => ()
          }
        }
      }
    }
    out.toSeq
  }

  /** Distributed out-link frame: one row per link —
    * (doc_id, seq, target, anchor), hrefs resolved against `baseCol`.
    */
  def outLinksBinary(spark: SparkSession, pages: DataFrame, idCol: String,
      htmlCol: String, baseCol: String): DataFrame = {
    import spark.implicits._
    pages.select(col(idCol).cast("long"), col(htmlCol), col(baseCol))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, html, base) =>
        outLinks(html).map(l => (id, l.seq, resolve(base, l.href), l.anchor))
      })
      .toDF(idCol, "seq", "target", "anchor")
  }

  /** The anchor-text index: per resolved target, in-link count, distinct
    * referring pages, distinct anchor strings, and the lexicographically
    * first anchor (the deterministic representative). One hash agg.
    */
  def anchorIndex(links: DataFrame, idCol: String): DataFrame =
    links.groupBy("target").agg(
      count(lit(1)).as("n_refs"),
      countDistinct(col(idCol)).as("n_pages"),
      countDistinct(col("anchor")).as("n_anchors"),
      min(col("anchor")).as("rep_anchor"))
}

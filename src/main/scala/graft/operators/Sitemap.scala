package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org protocol) — the crawl DISCOVERY side
  * complementing the [[Robots]] politeness gate: a fetched sitemap.xml
  * expands into the URL frontier, with per-URL freshness hints the
  * scheduler ranks by. Two document shapes per the protocol:
  *
  *   - `<urlset>` of `<url>` entries: `loc` (required), optional
  *     `lastmod`, `changefreq`, `priority`;
  *   - `<sitemapindex>` of `<sitemap>` entries (`loc`, `lastmod`) —
  *     the recursive fan-out shape for sites above the 50k-URL cap.
  *
  * Parsing is a tolerant tag walk, not a strict XML load: attributes and
  * namespace prefixes on the entry tags are ignored, unknown child tags
  * skipped, the five XML entities decoded in text content. Malformed
  * entries (no `loc`) are dropped, never thrown — crawl inputs are
  * adversarial.
  *
  * Scale shape: per-row pure flatMap (no shuffle); a frontier deployment
  * unions the exploded entries into the URL store keyed by registrable
  * domain, so discovery parallelizes with the corpus and the scheduler's
  * per-host grouping is the only shuffle.
  */
object Sitemap {

  final case class Entry(seq: Int, kind: String, loc: String,
      lastmod: String, changefreq: String, priority: Option[Double])

  private val entityRe = "&(amp|lt|gt|quot|apos|#[0-9]+);".r

  private[graft] def decodeEntities(s: String): String =
    if (!s.contains('&')) s
    else entityRe.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      m.group(1) match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case code => new String(Character.toChars(code.drop(1).toInt))
      }))

  /** Text content of the first `<tag>…</tag>` inside `seg`, entities
    * decoded; None when absent. Tolerates attributes on the open tag.
    */
  private def childText(seg: String, tag: String): Option[String] = {
    val lower = seg.toLowerCase
    val open = lower.indexOf("<" + tag)
    if (open < 0) None
    else {
      val gt = seg.indexOf('>', open)
      val close = lower.indexOf("</" + tag, math.max(gt, 0))
      if (gt < 0 || close < 0) None
      else Some(decodeEntities(seg.substring(gt + 1, close).trim))
    }
  }

  /** All `<tag>…</tag>` segments of `xml`, attribute-tolerant. */
  private def segments(xml: String, tag: String): Iterator[String] = {
    val lower = xml.toLowerCase
    Iterator.unfold(0) { from =>
      val open = lower.indexOf("<" + tag, from)
      if (open < 0) None
      else {
        // reject a longer tag name sharing the prefix (<urlset> vs <url>)
        val after = xml.charAt(math.min(open + tag.length + 1, xml.length - 1))
        val close = lower.indexOf("</" + tag + ">", open)
        if (close < 0) None
        else if (after != '>' && !after.isWhitespace && after != '/')
          Some(("", open + 1)) // skip; not this tag
        else Some((xml.substring(open, close), close + tag.length + 3))
      }
    }.filter(_.nonEmpty)
  }

  /** Parse one sitemap document into entries; `<urlset>` entries carry
    * kind "url", `<sitemapindex>` entries kind "sitemap". Entries
    * missing `loc` are dropped.
    */
  def parseSitemap(xml: String): Seq[Entry] = {
    val isIndex = xml.toLowerCase.contains("<sitemapindex")
    val (entryTag, kind) = if (isIndex) ("sitemap", "sitemap") else ("url", "url")
    segments(xml, entryTag).zipWithIndex.flatMap { case (seg, i) =>
      childText(seg, "loc").map { loc =>
        Entry(i, kind, loc,
          childText(seg, "lastmod").getOrElse(""),
          childText(seg, "changefreq").getOrElse(""),
          childText(seg, "priority").flatMap(_.toDoubleOption))
      }
    }.toSeq
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Serialize a urlset sitemap (the fixture's writer half). */
  def buildUrlset(entries: Seq[Entry]): String = {
    val body = entries.map { e =>
      val opt = new StringBuilder
      if (e.lastmod.nonEmpty) opt ++= s"\n    <lastmod>${e.lastmod}</lastmod>"
      if (e.changefreq.nonEmpty)
        opt ++= s"\n    <changefreq>${e.changefreq}</changefreq>"
      e.priority.foreach(p => opt ++= s"\n    <priority>$p</priority>")
      s"  <url>\n    <loc>${escape(e.loc)}</loc>$opt\n  </url>"
    }.mkString("\n")
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      body + "\n</urlset>\n"
  }

  /** Deterministic fixture over the documents table: each doc renders a
    * urlset of 1 + doc_id%4 entries whose every field is a formula —
    * locs carry a query string with `&` (escaped `&amp;` in the XML, so
    * the hash proves entity round-trip), lastmod/changefreq/priority
    * cycle by entry index.
    */
  def syntheticSitemapCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val entries = (0 to (id % 4).toInt).map { j =>
          Entry(j, "url",
            s"https://h${id % 13}.example.com/d/$id/p$j?q=a&r=$j",
            f"2024-${1 + j % 12}%02d-${1 + (id % 28).toInt}%02d",
            Seq("daily", "weekly", "monthly")(j % 3),
            Some((10 - j) / 10.0))
        }
        (id, buildUrlset(entries))
      })
      .toDF("doc_id", "sitemap_xml")
  }

  /** Serialize a sitemapindex (the >50k-URL fan-out shape). */
  def buildIndex(locs: Seq[(String, String)]): String = {
    val body = locs.map { case (loc, lastmod) =>
      val lm = if (lastmod.nonEmpty) s"\n    <lastmod>$lastmod</lastmod>" else ""
      s"  <sitemap>\n    <loc>${escape(loc)}</loc>$lm\n  </sitemap>"
    }.mkString("\n")
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      body + "\n</sitemapindex>\n"
  }

  /** Two-level fixture: per doc an INDEX document naming two child
    * sitemaps, plus the two child urlset documents keyed by their own
    * URL — child c carries 1+(doc_id+c)%3 entries, every field a
    * formula. Returns (indexes, children).
    */
  def syntheticIndexCorpus(spark: SparkSession,
      docs: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._
    def childUrl(id: Long, c: Int) =
      s"https://h${id % 13}.example.com/sm/${id}_$c.xml"
    val idx = docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, buildIndex((0 to 1).map(c =>
          childUrl(id, c) -> f"2024-0${1 + c}%d-01")))
      })
      .toDF("doc_id", "sitemap_xml")
    val kids = docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        (0 to 1).map { c =>
          val entries = (0 to ((id + c) % 3).toInt).map { j =>
            Entry(j, "url",
              s"https://h${id % 13}.example.com/d/$id/$c/p$j", "", "", None)
          }
          (childUrl(id, c), buildUrlset(entries))
        }
      })
      .toDF("url", "sitemap_xml")
    (idx, kids)
  }

  /** Expand a frame of sitemapindex documents through their child
    * sitemaps: parse the index rows to child locs, RESOLVE each loc
    * against the children frame (the fetch-store lookup — an equi-join,
    * broadcast when the index side is small, shuffled otherwise), parse
    * each child urlset, and emit
    * (doc_id, child_idx, seq, loc) with full provenance.
    *
    * Scale shape: two per-row parses around ONE equi-join keyed by child
    * URL — the recursion depth of the sitemap protocol is bounded at 2
    * by spec (an index may not point at another index), so this IS the
    * whole expansion, never an iterative walk.
    */
  def expandIndex(spark: SparkSession, indexes: DataFrame,
      children: DataFrame): DataFrame = {
    import spark.implicits._
    val childLocs = parseBinary(spark, indexes)
      .where(col("kind") === "sitemap")
      .select(col("doc_id"), col("seq").as("child_idx"),
        col("loc").as("child_url"))
    childLocs.join(children, childLocs("child_url") === children("url"))
      .select(col("doc_id"), col("child_idx"), col("sitemap_xml"))
      .as[(Long, Int, String)]
      .mapPartitions(_.flatMap { case (id, c, xml) =>
        parseSitemap(xml).map(e => (id, c, e.seq, e.loc))
      })
      .toDF("doc_id", "child_idx", "seq", "loc")
  }

  /** Distributed parse: explode each (doc_id, sitemap_xml) row into its
    * entries — (doc_id, seq, kind, loc, lastmod, changefreq, priority).
    */
  def parseBinary(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("sitemap_xml"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, xml) =>
        parseSitemap(xml).map(e =>
          (id, e.seq, e.kind, e.loc, e.lastmod, e.changefreq,
            e.priority.getOrElse(Double.NaN)))
      })
      .toDF("doc_id", "seq", "kind", "loc", "lastmod", "changefreq", "priority")
  }
}

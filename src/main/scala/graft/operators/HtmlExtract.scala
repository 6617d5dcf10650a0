package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the boilerplate-removal stage a crawl
  * pipeline runs between the WARC walk and text curation (jusText,
  * Kohlschütter boilerpipe, trafilatura are the published lineage). The
  * model here is the tractable core of those systems: a streaming tag
  * walk that (a) discards whole subtrees of chrome tags (nav/header/
  * footer/script/style/...), (b) segments the remaining text into blocks
  * at block-level element boundaries, and (c) drops any block whose
  * LINK DENSITY (fraction of its characters inside <a>) exceeds a
  * threshold — the single most effective boilerplate signal in the
  * boilerpipe study. Stopword/classifier refinements compose downstream
  * via [[QualityGate]]; they are corpus signals, not parse signals.
  *
  * Scale shape: one mapPartitions over the page column — per-row
  * imperative work, no shuffle, no driver state (the [[graft.multimodal.BinaryOps]]
  * discipline). The tokenizer is a single forward scan; memory is the
  * current block, not the DOM (no tree is built).
  *
  * Scope: tag scanning assumes '>' terminates a tag (attribute values
  * containing '>' — rare and invalid-ish — would split early); script/
  * style contents are skipped raw (a '<' inside code cannot desync the
  * walk); comments and declarations skip; the named + numeric entity
  * core decodes (&amp; &lt; &gt; &quot; &#39; &#x...; &#...;).
  */
object HtmlExtract {

  /** Subtrees discarded wholesale: page chrome and non-content. */
  val droppedTags: Set[String] = Set("script", "style", "nav", "header",
    "footer", "aside", "head", "title", "noscript", "template", "form",
    "button", "svg", "iframe")

  /** Elements whose close emits a block even when empty (leaf text
    * carriers — an empty <p></p> is a real, intentional segment).
    */
  val leafTags: Set[String] = Set("p", "li", "h1", "h2", "h3", "h4", "h5",
    "h6", "pre", "blockquote", "td", "th", "dt", "dd")

  /** Container boundaries: pending direct text flushes here, emitted
    * only when non-blank (inter-tag whitespace is not a block).
    */
  val containerTags: Set[String] = Set("div", "section", "article", "main",
    "body", "html", "ul", "ol", "table", "tr")

  private val voidTags: Set[String] = Set("br", "img", "hr", "meta", "link",
    "input", "area", "base", "col", "embed", "source", "track", "wbr")

  /** One segmented block: the element that closed it, its decoded text,
    * and how many of those characters sat inside <a>.
    */
  final case class HtmlBlock(tag: String, text: String, linkChars: Int)

  /** Minimal HTML escaping (what [[syntheticHtmlCorpus]] writes). */
  def escapeHtml(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb ++= "&amp;"
      case '<' => sb ++= "&lt;"
      case '>' => sb ++= "&gt;"
      case '"' => sb ++= "&quot;"
      case c   => sb += c
    }
    sb.toString
  }

  private def decodeEntity(name: String): Option[String] = name match {
    case "amp"  => Some("&")
    case "lt"   => Some("<")
    case "gt"   => Some(">")
    case "quot" => Some("\"")
    case "apos" => Some("'")
    case "nbsp" => Some("\u00a0") // the real codepoint, not ASCII space
    case n if n.startsWith("#x") || n.startsWith("#X") =>
      try Some(new String(Character.toChars(Integer.parseInt(n.drop(2), 16))))
      catch { case _: Exception => None }
    case n if n.startsWith("#") =>
      try Some(new String(Character.toChars(Integer.parseInt(n.drop(1)))))
      catch { case _: Exception => None }
    case _ => None
  }

  /** Segment a page into text blocks (chrome subtrees already removed).
    * Single forward scan; see the object doc for the block model.
    */
  def blocks(html: String): Seq[HtmlBlock] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[HtmlBlock]
    val text = new StringBuilder
    var linkChars = 0
    var aDepth = 0
    var dropDepth = 0
    val openDrops = scala.collection.mutable.Stack.empty[String]
    var i = 0
    val n = html.length
    lazy val lowerHtml = html.toLowerCase // once, not per raw-text element

    def flushContainer(tag: String): Unit = {
      if (text.toString.trim.nonEmpty) out += HtmlBlock(tag, text.toString, linkChars)
      text.clear(); linkChars = 0
    }
    def emitLeaf(tag: String): Unit = {
      out += HtmlBlock(tag, text.toString, linkChars)
      text.clear(); linkChars = 0
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else {
          val e = html.indexOf('>', i)
          if (e < 0) { i = n } // truncated tag: drop the tail
          else {
            val raw = html.substring(i + 1, e).trim
            i = e + 1
            val closing = raw.startsWith("/")
            val body = (if (closing) raw.drop(1) else raw).trim
            val name = body.takeWhile(ch => !ch.isWhitespace && ch != '/').toLowerCase
            if (name.nonEmpty) {
              if (!closing && (name == "script" || name == "style")) {
                // Raw-text elements: skip to the matching close tag;
                // '<' inside code cannot desync the walk.
                val close = s"</$name"
                val idx = lowerHtml.indexOf(close, i)
                if (idx < 0) i = n
                else {
                  val gt = html.indexOf('>', idx)
                  i = if (gt < 0) n else gt + 1
                }
              } else if (closing) {
                if (openDrops.nonEmpty && openDrops.top == name) {
                  openDrops.pop(); dropDepth -= 1
                } else if (dropDepth == 0) {
                  if (name == "a") aDepth = math.max(0, aDepth - 1)
                  else if (leafTags(name)) emitLeaf(name)
                  else if (containerTags(name)) flushContainer(name)
                }
              } else if (!raw.endsWith("/") && !voidTags(name)) {
                if (dropDepth > 0) {
                  if (droppedTags(name)) { openDrops.push(name); dropDepth += 1 }
                } else if (droppedTags(name)) {
                  openDrops.push(name); dropDepth += 1
                } else if (name == "a") aDepth += 1
                else if (leafTags(name) || containerTags(name)) flushContainer(name)
              } else if (dropDepth == 0 && name == "br") {
                text += '\n'
              }
            }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i)
        val decoded =
          if (semi > i && semi - i <= 10) decodeEntity(html.substring(i + 1, semi))
          else None
        decoded match {
          case Some(s) =>
            if (dropDepth == 0) {
              text ++= s
              if (aDepth > 0) linkChars += s.length
            }
            i = semi + 1
          case None =>
            if (dropDepth == 0) {
              text += '&'
              if (aDepth > 0) linkChars += 1
            }
            i += 1
        }
      } else {
        if (dropDepth == 0) {
          text += c
          if (aDepth > 0) linkChars += 1
        }
        i += 1
      }
    }
    flushContainer("body")
    out.toSeq
  }

  /** Attributes of one tag body (name stripped): `key="v"` / `key='v'` /
    * bare `key=v` / valueless flags, keys lowercased. Quote-aware so a
    * '>' never reaches here split mid-value in practice and spaces
    * inside quoted values survive.
    */
  private[operators] def parseAttrs(body: String): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    val n = body.length
    while (i < n) {
      while (i < n && (body.charAt(i).isWhitespace || body.charAt(i) == '/')) i += 1
      val ks = i
      while (i < n && !body.charAt(i).isWhitespace &&
        body.charAt(i) != '=' && body.charAt(i) != '/') i += 1
      val key = body.substring(ks, i).toLowerCase
      while (i < n && body.charAt(i).isWhitespace) i += 1
      if (i < n && body.charAt(i) == '=') {
        i += 1
        while (i < n && body.charAt(i).isWhitespace) i += 1
        if (i < n && (body.charAt(i) == '"' || body.charAt(i) == '\'')) {
          val q = body.charAt(i); i += 1
          val vs = i
          while (i < n && body.charAt(i) != q) i += 1
          if (key.nonEmpty) out(key) = body.substring(vs, i)
          if (i < n) i += 1
        } else {
          val vs = i
          while (i < n && !body.charAt(i).isWhitespace) i += 1
          if (key.nonEmpty) out(key) = body.substring(vs, i)
        }
      } else if (key.nonEmpty) out(key) = ""
    }
    out.toMap
  }

  /** Page-level metadata: `<title>` text (entity-decoded), the
    * description `<meta>` content, and the page's total `<a>` count
    * (chrome INCLUDED — link count is a page feature, not a content
    * feature; nav-heavy pages are what it flags). One scan, same
    * comment/raw-text skipping as [[blocks]].
    */
  final case class PageMeta(title: Option[String], metaDesc: Option[String],
      nLinks: Int)

  def pageMeta(html: String): PageMeta = {
    var title: Option[String] = None
    var desc: Option[String] = None
    var links = 0
    var i = 0
    val n = html.length
    val lower = html.toLowerCase
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
          val name = body.takeWhile(ch => !ch.isWhitespace && ch != '/').toLowerCase
          i = gt + 1
          if (!closing) name match {
            case "a" => links += 1
            case "title" if title.isEmpty =>
              val close = lower.indexOf("</title", i)
              if (close > i) {
                // RCDATA: entities decode, tags don't nest
                val sb = new StringBuilder
                var j = i
                while (j < close) {
                  if (html.charAt(j) == '&') {
                    val semi = html.indexOf(';', j)
                    val d = if (semi > j && semi - j <= 10)
                      decodeEntity(html.substring(j + 1, semi)) else None
                    d match {
                      case Some(s) => sb ++= s; j = semi + 1
                      case None    => sb += '&'; j += 1
                    }
                  } else { sb += html.charAt(j); j += 1 }
                }
                title = Some(sb.toString)
                i = close
              }
            case "meta" =>
              val attrs = parseAttrs(body.drop(name.length))
              if (attrs.get("name").exists(_.equalsIgnoreCase("description"))
                && desc.isEmpty) desc = attrs.get("content")
            case "script" | "style" =>
              val close = lower.indexOf(s"</$name", i)
              i = if (close < 0) n
              else { val g = html.indexOf('>', close); if (g < 0) n else g + 1 }
            case _ => ()
          }
        }
      }
    }
    PageMeta(title, desc, links)
  }

  /** Distributed page-metadata stage: (id, title, meta_desc, n_links). */
  def pageMetaContent(spark: SparkSession, pages: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    import spark.implicits._
    pages.select(col(idCol).cast("long"), col(htmlCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, html) =>
        val m = pageMeta(html)
        (id, m.title.orNull, m.metaDesc.orNull, m.nLinks)
      })
      .toDF(idCol, "title", "meta_desc", "n_links")
  }

  /** Main text of a page: blocks surviving the link-density gate, joined
    * with newlines. Returns (main_text, n_kept, n_dropped); whitespace-
    * only container flushes never existed as blocks, so the counts
    * partition the real segments.
    */
  def extractMain(html: String, maxLinkDensity: Double = 0.5): (String, Int, Int) = {
    val bs = blocks(html)
    val (keep, drop) = bs.partition { b =>
      b.text.isEmpty || b.linkChars.toDouble / b.text.length <= maxLinkDensity
    }
    (keep.map(_.text).mkString("\n"), keep.length, drop.length)
  }

  /** Deterministic page corpus: each document's text becomes the <p>
    * blocks of a main div, wrapped in the chrome every real page carries
    * — head/title/style/script (with '<' inside the code), a nav, a
    * link-farm "related" div (link density ≈ 0.9 — the density gate's
    * target), and a footer. Lossless: text is entity-escaped in, decoded
    * out.
    */
  def syntheticHtmlCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val paras = text.split("\n", -1)
        val sb = new StringBuilder
        sb ++= s"<html><head><title>Doc $id</title>"
        sb ++= s"""<meta name="description" content="Summary of document $id">"""
        sb ++= "<style>.m{color:#000}</style>"
        sb ++= "<script>var x=1;if(x<2){x=3}</script></head><body>"
        sb ++= "<nav><a href=\"/\">Home</a><a href=\"/about\">About</a>" +
          "<a href=\"/contact\">Contact</a></nav><div id=\"main\">"
        paras.foreach(p => sb ++= "<p>" + escapeHtml(p) + "</p>")
        sb ++= "</div><div class=\"related\">See also: "
        sb ++= s"<a href=\"/p/${id}a\">Related article number $id part one</a> "
        sb ++= s"<a href=\"/p/${id}b\">Related article number $id part two</a></div>"
        sb ++= s"<footer><a href=\"/terms\">Terms</a> © $id</footer></body></html>"
        (id, sb.toString)
      })
      .toDF("doc_id", "html")
  }

  /** The distributed stage: per-page extraction over a page frame. */
  def extractMainContent(spark: SparkSession, pages: DataFrame, idCol: String,
      htmlCol: String, maxLinkDensity: Double = 0.5): DataFrame = {
    import spark.implicits._
    pages.select(col(idCol).cast("long"), col(htmlCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, html) =>
        val (txt, k, dr) = extractMain(html, maxLinkDensity)
        (id, txt, k, dr)
      })
      .toDF(idCol, "main_text", "n_kept_blocks", "n_dropped_blocks")
  }
}

package graft

import graft.operators.LinkGraph
import graft.operators.LinkGraph.Link
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the link-graph feed: RFC 3986-lite resolution cases,
  * document-order anchor extraction with nested-tag stripping and entity
  * decode, script/style/comment immunity, href-less anchor drop, and the
  * anchor index's aggregation arithmetic over a known link multiset.
  */
class LinkGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("resolve: the five cases a crawl sees") {
    val base = "https://h1.example.com/d/42"
    assert(LinkGraph.resolve(base, "https://other.org/x") ===
      "https://other.org/x")
    assert(LinkGraph.resolve(base, "//cdn.example.com/a.js") ===
      "https://cdn.example.com/a.js")
    assert(LinkGraph.resolve(base, "/about") ===
      "https://h1.example.com/about")
    assert(LinkGraph.resolve(base, "next") ===
      "https://h1.example.com/d/next")
    assert(LinkGraph.resolve(base, "/p#frag") ===
      "https://h1.example.com/p")
    assert(LinkGraph.resolve(base, "#frag") === base)
  }

  test("outLinks: order, nested tags stripped, entities decoded") {
    val html = "<html><body>" +
      "<a href=\"/a\">plain</a>" +
      "<a href='/b'><b>bold</b> &amp; <i>ital</i></a>" +
      "<a href=/c>unquoted</a>" +
      "<a name=\"no-href\">skipped</a>" +
      "</body></html>"
    assert(LinkGraph.outLinks(html) === Seq(
      Link(0, "/a", "plain"),
      Link(1, "/b", "bold & ital"),
      Link(2, "/c", "unquoted")))
  }

  test("outLinks: script/style/comment content never yields links") {
    val html = "<script>var a='<a href=\"/x\">no</a>';</script>" +
      "<style>a{color:red}</style>" +
      "<!-- <a href=\"/y\">no</a> -->" +
      "<a href=\"/real\">yes</a>"
    assert(LinkGraph.outLinks(html) === Seq(Link(0, "/real", "yes")))
  }

  test("anchor index aggregates the fixture's chrome/article split") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 26).select(col("id").as("doc_id"),
      lit("t").as("text"))
    val pages = graft.operators.HtmlExtract.syntheticHtmlCorpus(spark, docs)
      .withColumn("base_uri", concat(lit("https://h"),
        col("doc_id") % 13, lit(".example.com/d/"), col("doc_id")))
    val links = LinkGraph.outLinksBinary(spark, pages, "doc_id", "html",
      "base_uri")
    assert(links.count() === 26L * 6)
    val idx = LinkGraph.anchorIndex(links, "doc_id")
      .as[(String, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // 26 docs over 13 hosts → every chrome target has exactly 2 refs
    val home = idx("https://h3.example.com/")
    assert(home === (("https://h3.example.com/", 2L, 2L, 1L, "Home")))
    // article targets are singletons with their own anchor
    val art = idx("https://h3.example.com/p/3a")
    assert(art._2 === 1L && art._5 === "Related article number 3 part one")
    // total targets: 13 hosts × 4 chrome + 26 docs × 2 articles
    assert(idx.size === 13 * 4 + 26 * 2)
  }
}

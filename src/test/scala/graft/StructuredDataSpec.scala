package graft

import graft.operators.StructuredData
import org.scalatest.funsuite.AnyFunSuite

/** Laws for structured-data extraction: og:* collection with
  * first-occurrence-wins and case-folded property names, non-LD script
  * immunity (including og-shaped strings inside code), first-LD-block
  * selection, comment skipping, and the distributed frame's JSON-path
  * typing.
  */
class StructuredDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("og scan: case-folded keys, first occurrence wins, order kept") {
    val html = """<head>
      |<meta property="OG:Title" content="first">
      |<meta property="og:title" content="second">
      |<meta property="og:type" content="article">
      |<meta name="og:ignored" content="name-attr is not property">
      |</head>""".stripMargin
    val (og, ld) = StructuredData.scanPage(html)
    assert(og === Seq("og:title" -> "first", "og:title" -> "second",
      "og:type" -> "article"))
    assert(ld === null)
  }

  test("non-LD scripts and comments never yield og pairs or LD blocks") {
    val html = "<script>var s='<meta property=\"og:title\" content=\"no\">';" +
      "</script><!-- <meta property=\"og:type\" content=\"no\"> -->" +
      "<script type=\"application/ld+json\">{\"@type\":\"A\"}</script>" +
      "<script type=\"application/ld+json\">{\"@type\":\"B\"}</script>"
    val (og, ld) = StructuredData.scanPage(html)
    assert(og.isEmpty)
    assert(ld === "{\"@type\":\"A\"}") // first block wins
  }

  test("metaRobots: token match, case-folding, none expansion, script " +
      "immunity, first-meta-wins") {
    import StructuredData.metaRobots
    assert(metaRobots("<head></head>") === ((false, false)))
    assert(metaRobots("""<meta name="robots" content="noindex">""") ===
      ((true, false)))
    assert(metaRobots("""<meta name="ROBOTS" content="NOFOLLOW">""") ===
      ((false, true)))
    assert(metaRobots("""<meta name="robots" content="noindex, nofollow">""")
      === ((true, true)))
    assert(metaRobots("""<meta name="robots" content="none">""") ===
      ((true, true)))
    // substring must not match: "noindexing" is not a token
    assert(metaRobots("""<meta name="robots" content="noindexing">""") ===
      ((false, false)))
    // fake directive inside script code never matches
    assert(metaRobots("<script>var s='<meta name=\"robots\" " +
      "content=\"noindex\">';</script>") === ((false, false)))
    // first robots meta wins
    assert(metaRobots("""<meta name="robots" content="noindex">""" +
      """<meta name="robots" content="nofollow">""") === ((true, false)))
  }

  test("distributed frame: og columns + JSON-path-typed LD fields") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.range(0, 30).select(col("id").as("doc_id"),
      org.apache.spark.sql.functions.lit("t").as("text"))
    val out = StructuredData.structuredBinary(spark,
        StructuredData.syntheticSocialCorpus(spark, docs), "doc_id", "html")
      .as[(Long, String, String, String, String, String, String, Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size === 30)
    val r = out(7L)
    assert(r === ((7L, "Doc 7", "article", "https://h7.example.com/img/7.jpg",
      "https://h7.example.com/d/7", "Article", "Doc 7", 107)))
  }
}

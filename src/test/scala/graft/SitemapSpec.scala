package graft

import graft.operators.Sitemap
import graft.operators.Sitemap.Entry
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the sitemap walk: urlset round-trip through the serializer,
  * entity decode, optional-field absence, sitemapindex dispatch, the
  * <url>-vs-<urlset> tag-prefix discrimination, malformed-entry drop,
  * and the exploded frame's row count law against the fixture formula.
  */
class SitemapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("urlset round-trip: build then parse recovers every field") {
    val in = Seq(
      Entry(0, "url", "https://a.example.com/x?q=1&r=2", "2024-01-02",
        "daily", Some(0.8)),
      Entry(1, "url", "https://a.example.com/<odd>", "", "", None))
    val out = Sitemap.parseSitemap(Sitemap.buildUrlset(in))
    assert(out === in)
  }

  test("entity decode covers the five named entities and numeric refs") {
    assert(Sitemap.decodeEntities("&amp;&lt;&gt;&quot;&apos;&#65;") ===
      "&<>\"'A")
    assert(Sitemap.decodeEntities("no entities") === "no entities")
  }

  test("sitemapindex parses with kind=sitemap") {
    val xml =
      """<?xml version="1.0"?>
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://s.example.com/a.xml</loc>
        |    <lastmod>2024-03-04</lastmod></sitemap>
        |  <sitemap><loc>https://s.example.com/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val out = Sitemap.parseSitemap(xml)
    assert(out.map(_.kind).distinct === Seq("sitemap"))
    assert(out.map(_.loc) === Seq("https://s.example.com/a.xml",
      "https://s.example.com/b.xml"))
    assert(out.head.lastmod === "2024-03-04")
  }

  test("entries without loc are dropped; unknown children ignored") {
    val xml = "<urlset><url><lastmod>2024-01-01</lastmod></url>" +
      "<url><loc>https://k.example.com/</loc><mystery>x</mystery></url></urlset>"
    val out = Sitemap.parseSitemap(xml)
    assert(out.map(_.loc) === Seq("https://k.example.com/"))
    assert(out.head.seq === 1) // seq is the walk position, drop preserved it
  }

  test("index expansion: join resolves every child, provenance exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.range(0, 30).select(col("id").as("doc_id"),
      org.apache.spark.sql.functions.lit("t").as("text"))
    val (idx, kids) = Sitemap.syntheticIndexCorpus(spark, docs)
    assert(idx.count() === 30 && kids.count() === 60)
    val out = Sitemap.expandIndex(spark, idx, kids)
      .as[(Long, Int, Int, String)].collect()
    val expected = (0L until 30L)
      .map(id => (1 + id % 3) + (1 + (id + 1) % 3)).sum
    assert(out.length === expected)
    assert(out.count(_._1 == 7L) === (1 + 7 % 3) + (1 + 8 % 3))
    assert(out.contains((7L, 1, 2, "https://h7.example.com/d/7/1/p2")))
    // an index doc whose child is missing from the store contributes
    // nothing for that child (inner join = fetch-failure drop)
    val out2 = Sitemap.expandIndex(spark, idx,
      kids.where(!col("url").endsWith("_1.xml")))
      .as[(Long, Int, Int, String)].collect()
    assert(out2.forall(_._2 === 0) && out2.nonEmpty)
  }

  test("exploded frame matches the fixture formula row count") {
    import spark.implicits._
    val docs = spark.range(0, 40).select(
      org.apache.spark.sql.functions.col("id").as("doc_id"),
      org.apache.spark.sql.functions.lit("t").as("text"))
    val out = Sitemap.parseBinary(spark,
      Sitemap.syntheticSitemapCorpus(spark, docs))
    val expected = (0L until 40L).map(id => 1 + (id % 4)).sum
    assert(out.count() === expected)
    val row = out.where("doc_id = 7 AND seq = 2")
      .as[(Long, Int, String, String, String, String, Double)].head()
    assert(row === ((7L, 2, "url", "https://h7.example.com/d/7/p2?q=a&r=2",
      "2024-03-08", "monthly", 0.8)))
  }
}

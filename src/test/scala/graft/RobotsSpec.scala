package graft

import graft.operators.Robots
import graft.operators.Robots.Rule
import org.scalatest.funsuite.AnyFunSuite

/** Laws for RFC 9309 robots evaluation: tolerant parsing (comments,
  * case-insensitive fields, consecutive User-agent lines sharing a group,
  * empty Disallow contributing no rule, group closure once rules start),
  * the wildcard/anchor path matcher, specific-group-over-`*` selection
  * without merging, longest-match precedence with Allow beating Disallow
  * on ties, the no-match default-allow, and the distributed verdict
  * frame agreeing with the scalar evaluator row by row.
  */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val policy =
    """# comment line
      |USER-AGENT: GraftBot   # trailing comment
      |Disallow: /private/
      |Allow: /private/pub*
      |disallow: /*.pdf$
      |
      |User-agent: a
      |User-agent: b
      |Disallow: /shared/
      |
      |User-agent: *
      |Disallow:
      |Disallow: /tmp/
      |Allow: /
      |Unknown-field: ignored
      |""".stripMargin

  test("parse: groups, comments, case-insensitive fields, shared UA run") {
    val g = Robots.parseRobots(policy)
    assert(g("graftbot") === Seq(Rule(false, "/private/"),
      Rule(true, "/private/pub*"), Rule(false, "/*.pdf$")))
    // consecutive User-agent lines share one rule block
    assert(g("a") === g("b"))
    assert(g("a") === Seq(Rule(false, "/shared/")))
    // empty Disallow contributes no rule
    assert(g("*") === Seq(Rule(false, "/tmp/"), Rule(true, "/")))
  }

  test("parse: a rule line closes the UA run; a later UA opens a new group") {
    val g = Robots.parseRobots(
      "User-agent: x\nDisallow: /a\nUser-agent: y\nDisallow: /b\n")
    assert(g("x") === Seq(Rule(false, "/a")))
    assert(g("y") === Seq(Rule(false, "/b")))
  }

  test("matches: prefix, wildcard spans, end anchor") {
    assert(Robots.matches("/p", "/page"))
    assert(!Robots.matches("/page", "/p"))
    assert(Robots.matches("/*.pdf$", "/a/b/c.pdf"))
    assert(!Robots.matches("/*.pdf$", "/a/b/c.pdfx"))
    assert(Robots.matches("/a*c*e", "/abcde"))
    assert(!Robots.matches("/a*c*e", "/abcd"))
    assert(Robots.matches("/x$", "/x"))
    assert(!Robots.matches("/x$", "/xy"))
    // '*' may span zero octets; trailing '*' is a plain prefix
    assert(Robots.matches("/a*b", "/ab"))
    assert(Robots.matches("/a*", "/a"))
  }

  test("group selection: exact token over *, groups never merge") {
    val g = Robots.parseRobots(policy)
    // GraftBot's group has no /tmp/ rule — the * group must NOT leak in
    val (allowed, rule) = Robots.evaluate(Robots.groupFor(g, "GraftBot"), "/tmp/x")
    assert(allowed && rule === "")
    // unknown agent falls back to *
    val (a2, r2) = Robots.evaluate(Robots.groupFor(g, "NoSuchBot"), "/tmp/x")
    assert(!a2 && r2 === "/tmp/")
  }

  test("precedence: longest pattern wins; Allow beats Disallow on ties") {
    val g = Robots.parseRobots(policy)("graftbot")
    assert(Robots.evaluate(g, "/private/doc1") === ((false, "/private/")))
    assert(Robots.evaluate(g, "/private/pub1") === ((true, "/private/pub*")))
    val tie = Seq(Rule(false, "/a/b"), Rule(true, "/a/c"), Rule(true, "/a/b"))
    assert(Robots.evaluate(tie, "/a/b") === ((true, "/a/b")))
    // no matching rule → allowed with empty rule
    assert(Robots.evaluate(g, "/open") === ((true, "")))
  }

  test("sitemapUrls: cross-group collection, case kept, comments stripped") {
    val txt =
      """User-agent: a
        |Sitemap: https://x.example.com/A.xml   # trailing comment
        |Disallow: /q
        |SITEMAP: https://x.example.com/B.xml
        |User-agent: *
        |sitemap: https://x.example.com/c.xml
        |Sitemap:
        |""".stripMargin
    assert(Robots.sitemapUrls(txt) === Seq(
      "https://x.example.com/A.xml",
      "https://x.example.com/B.xml",
      "https://x.example.com/c.xml"))
  }

  test("parseCrawlDelays: group binding, shared UA runs, last wins") {
    val txt =
      """User-agent: graftbot
        |Crawl-delay: 2
        |Disallow: /x
        |
        |User-agent: a
        |User-agent: b
        |Crawl-delay: 3.5
        |Crawl-delay: 4   # last wins
        |
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    val d = Robots.parseCrawlDelays(txt)
    assert(d === Map("graftbot" -> 2.0, "a" -> 4.0, "b" -> 4.0, "*" -> 10.0))
  }

  test("crawlDelays dim: UA group first, * fallback, default when absent") {
    import spark.implicits._
    val rows = Seq(
      ("h1", "User-agent: graftbot\nCrawl-delay: 2\nUser-agent: *\nCrawl-delay: 9"),
      ("h2", "User-agent: *\nCrawl-delay: 7"),
      ("h3", "User-agent: *\nDisallow: /")).toDF("host", "robots_txt")
    val d = Robots.crawlDelays(spark, rows, "host", "robots_txt",
        "GraftBot", default = 5.0)
      .as[(String, Double)].collect().toMap
    assert(d === Map("h1" -> 2.0, "h2" -> 7.0, "h3" -> 5.0))
  }

  test("compiled policyFilter agrees with the scalar evaluator on every " +
      "fixture (ua, path) class") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for (ua <- Seq("GraftBot", "NoSuchBot")) {
      val urls = (0 until 40).map { i =>
        val path = Seq(s"/private/doc$i", s"/private/pub$i", s"/f/r$i.pdf",
          s"/tmp/x$i", s"/index$i.html")(i % 5)
        s"https://h${i % 13}.example.com$path"
      }
      val got = urls.toDF("url")
        .withColumn("ok", Robots.policyFilter(Robots.fixturePolicy, ua,
          col("url")))
        .as[(String, Boolean)].collect().toMap
      val g = Robots.groupFor(Robots.parseRobots(Robots.fixturePolicy), ua)
      urls.foreach { u =>
        val path = u.drop(u.indexOf('/', 8))
        assert(got(u) === Robots.evaluate(g, path)._1, s"$ua $u")
      }
    }
  }

  test("group selection: longest-prefix product-token match — versioned " +
      "UA strings reach their group, one-letter groups never over-fire") {
    val txt = Seq(
      "User-agent: graftbot",
      "Disallow: /g/",
      "User-agent: graftbot-news",
      "Disallow: /n/",
      "User-agent: b",
      "Disallow: /b/",
      "User-agent: *",
      "Disallow: /all/").mkString("\n")
    val g = Robots.parseRobots(txt)
    // versioned UA resolves through its product token, not exact equality
    assert(Robots.groupFor(g, "GraftBot/1.2 (+https://example.com/bot)") ===
      Seq(Rule(false, "/g/")))
    // longest prefix wins between nested product tokens
    assert(Robots.groupFor(g, "graftbot-news/2.0") === Seq(Rule(false, "/n/")))
    // a UA merely CONTAINING a group's letter must not match it
    assert(Robots.groupFor(g, "NoSuchBot") === Seq(Rule(false, "/all/")))
    // the delay lookup shares the semantics
    assert(Robots.lookupUa(Map("graftbot" -> 2.0, "*" -> 9.0),
      "graftbot/1.2") === Some(2.0))
    assert(Robots.lookupUa(Map("b" -> 2.0, "*" -> 9.0),
      "nosuchbot") === Some(9.0))
  }

  test("compiled and interpreted gates agree on paths containing " +
      "newlines ('*' compiles DOTALL; '$' anchors at true end)") {
    def hits(re: String, s: String) =
      java.util.regex.Pattern.compile(re).matcher(s).find()
    val weird = Seq("/a/\nx/b", "/a/x\n/b", "/a/b\n", "/a/\n")
    for (pat <- Seq("/a/*b", "/a/*b$", "/a/b$", "/a/"); p <- weird) {
      assert(hits(Robots.toRegex(pat), p) === Robots.matches(pat, p),
        s"pattern=$pat path=${p.replace("\n", "\\n")}")
    }
  }

  test("toRegex: quoting keeps regex metachars literal; * and $ translate") {
    // rlike = regex FIND, so ^-prefixed patterns are prefix matches
    def hits(re: String, s: String) =
      java.util.regex.Pattern.compile(re).matcher(s).find()
    assert(hits(Robots.toRegex("/a/b.c"), "/a/b.c"))
    assert(hits(Robots.toRegex("/a/b.c"), "/a/b.c/deeper"))
    // '.' must not match as a wildcard
    assert(!hits(Robots.toRegex("/a/b.c"), "/a/bXc"))
    assert(hits(Robots.toRegex("/*.pdf$"), "/x/y.pdf"))
    assert(!hits(Robots.toRegex("/*.pdf$"), "/x/y.pdfz"))
    // unanchored pattern must still match only from the path START
    assert(!hits(Robots.toRegex("/tmp/"), "/a/tmp/"))
  }

  test("distributed verdict frame agrees with the scalar evaluator") {
    import spark.implicits._
    val docs = spark.range(0, 40).select(
      org.apache.spark.sql.functions.col("id").as("doc_id"),
      org.apache.spark.sql.functions.lit("t").as("text"))
    val rows = Robots.evalBinary(spark,
        Robots.syntheticRobotsCorpus(spark, docs))
      .as[(Long, String, String, Boolean, String)].collect()
    assert(rows.length === 40)
    rows.foreach { case (id, ua, path, allowed, rule) =>
      val g = Robots.parseRobots(Robots.fixturePolicy)
      val (a, r) = Robots.evaluate(Robots.groupFor(g, ua), path)
      assert(a === allowed, s"doc $id")
      assert(r === rule, s"doc $id")
      // every path class appears and uas alternate
      assert(path.contains(id.toString) || path == s"/index$id.html")
      assert(ua === (if (id % 2 == 0) "GraftBot" else "FetchKit"))
    }
    // both verdict classes present in the fixture
    assert(rows.exists(!_._4) && rows.exists(_._4))
  }
}

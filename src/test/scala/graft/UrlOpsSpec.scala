package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branch-level laws for URL curation: every canonicalization rule on a
  * hand-built fixture (the q171 oracle only checks the formula corpus;
  * this pins each rule in isolation), the registrable-domain PSL rule,
  * the dedup election (https preferred, then first id, key is
  * scheme-relative), and the domain-cap bound.
  */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlOps.canonicalize(col("u"))).as[String].head()

  test("canonicalize lowercases scheme and host, never the path") {
    assert(canon("HTTPS://EXAMPLE.Com/KeepCase/X") ===
      "https://example.com/KeepCase/X")
  }

  test("canonicalize strips www., fragment and trailing slash") {
    assert(canon("http://www.a.com/p/") === "http://a.com/p")
    assert(canon("http://a.com/p#frag") === "http://a.com/p")
    assert(canon("http://a.com/") === "http://a.com/")
    assert(canon("http://a.com") === "http://a.com/")
  }

  test("canonicalize strips only DEFAULT ports for the scheme") {
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("http://a.com:443/x") === "http://a.com:443/x")
    assert(canon("https://a.com:80/x") === "https://a.com:80/x")
    assert(canon("http://a.com:8080/x") === "http://a.com:8080/x")
  }

  test("canonicalize drops tracking params and sorts survivors") {
    assert(canon("http://a.com/x?utm_source=s&b=2&a=1&fbclid=f&gclid=g&ref=r") ===
      "http://a.com/x?a=1&b=2")
    // all params tracking → no '?' at all
    assert(canon("http://a.com/x?utm_a=1&utm_b=2") === "http://a.com/x")
    // param ORDER never splits a key
    assert(canon("http://a.com/x?b=2&a=1") === canon("http://a.com/x?a=1&b=2"))
  }

  test("registrableDomain folds subdomains; ccTLD second-level keeps three") {
    val rows = Seq("h1.deep.example.com", "example.com", "news.bbc.co.uk",
      "a.b.epsilon.ac.jp", "localhost")
      .toDF("h").select(UrlOps.registrableDomain(col("h"))).as[String].collect()
    assert(rows === Seq("example.com", "example.com", "bbc.co.uk",
      "epsilon.ac.jp", "localhost"))
  }

  test("PSL: official checkPublicSuffix vectors (covered families) — " +
      "compiled Column and interpreted evaluator agree") {
    import graft.operators.PublicSuffix
    // (host, registrable domain) pairs from the official PSL test file
    // (publicsuffix.org test vectors), restricted to rules the embedded
    // snapshot carries; None = the host IS a public suffix
    val vectors: Seq[(String, Option[String])] = Seq(
      "example.com" -> Some("example.com"),
      "www.example.com" -> Some("example.com"),
      "biz" -> None,
      "domain.biz" -> Some("domain.biz"),
      "example.uk.com" -> Some("example.uk.com"), // private-section rule
      "test.jp" -> Some("test.jp"),
      "www.test.jp" -> Some("test.jp"),
      "ac.jp" -> None,
      "test.ac.jp" -> Some("test.ac.jp"),
      "www.test.ac.jp" -> Some("test.ac.jp"),
      "kyoto.jp" -> None,
      "test.kyoto.jp" -> Some("test.kyoto.jp"),
      "ide.kyoto.jp" -> None,
      "b.ide.kyoto.jp" -> Some("b.ide.kyoto.jp"),
      "a.b.ide.kyoto.jp" -> Some("b.ide.kyoto.jp"),
      "c.kobe.jp" -> None,                   // *.kobe.jp wildcard
      "b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "a.b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "city.kobe.jp" -> Some("city.kobe.jp"), // !city.kobe.jp exception
      "www.city.kobe.jp" -> Some("city.kobe.jp"),
      "ck" -> None,
      "test.ck" -> None,                     // *.ck wildcard
      "b.test.ck" -> Some("b.test.ck"),
      "a.b.test.ck" -> Some("b.test.ck"),
      "www.ck" -> Some("www.ck"),            // !www.ck exception
      "www.www.ck" -> Some("www.ck"),
      "us" -> None,
      "test.us" -> Some("test.us"),
      "www.test.us" -> Some("test.us"),
      "ak.us" -> None,
      "test.ak.us" -> Some("test.ak.us"),
      "www.test.ak.us" -> Some("test.ak.us"),
      "k12.ak.us" -> None,
      "test.k12.ak.us" -> Some("test.k12.ak.us"),
      "www.test.k12.ak.us" -> Some("test.k12.ak.us"),
      // 4-label rule: the suffix family the two-label heuristic broke on
      "pvt.k12.ma.us" -> None,
      "x.pvt.k12.ma.us" -> Some("x.pvt.k12.ma.us"),
      "deep.x.pvt.k12.ma.us" -> Some("x.pvt.k12.ma.us"),
      // private section
      "blog.foo.github.io" -> Some("foo.github.io"),
      "foo.github.io" -> Some("foo.github.io"),
      "whatever.blogspot.com" -> Some("whatever.blogspot.com"))
    // interpreted evaluator against the Option semantics
    vectors.foreach { case (h, exp) =>
      assert(PublicSuffix.registrableDomainOf(h, PublicSuffix.defaultRules)
        === exp, s"interpreted: $h")
    }
    // compiled Column: a host at/below its suffix folds to itself
    val hosts = vectors.map(_._1)
    val got = hosts.toDF("h")
      .select(UrlOps.registrableDomain(col("h"))).as[String].collect()
    hosts.zip(got).zip(vectors.map(_._2)).foreach { case ((h, g), exp) =>
      assert(g === exp.getOrElse(h), s"compiled: $h")
    }
  }

  test("PSL: the broadcast-dim path agrees with the compiled path on " +
      "every official vector") {
    import graft.operators.PublicSuffix
    val hosts = Seq("example.com", "www.example.com", "biz", "domain.biz",
      "example.uk.com", "test.jp", "ac.jp", "www.test.ac.jp", "kyoto.jp",
      "ide.kyoto.jp", "a.b.ide.kyoto.jp", "c.kobe.jp", "a.b.c.kobe.jp",
      "city.kobe.jp", "www.city.kobe.jp", "ck", "test.ck", "a.b.test.ck",
      "www.ck", "www.www.ck", "us", "k12.ak.us", "www.test.k12.ak.us",
      "pvt.k12.ma.us", "deep.x.pvt.k12.ma.us", "blog.foo.github.io",
      "localhost", "h1.deep.example.com")
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "host")
    val compiled = df.select(col("doc_id"),
        UrlOps.registrableDomain(col("host")).as("domain"))
      .as[(Long, String)].collect().sortBy(_._1)
    val dim = PublicSuffix.registrableDomainDim(df, "host", "doc_id",
        PublicSuffix.rulesDim(spark))
      .select(col("doc_id"), col("domain"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(dim === compiled)
  }

  test("a URL embedding an absolute URL in its query parses by the FIRST " +
      "'://' — host, path, canonical key never re-anchor") {
    val u = "https://a.com/r?to=https://b.com/x"
    val row = Seq(u).toDF("u").select(
      UrlOps.hostOf(col("u")), UrlOps.pathOf(col("u")),
      UrlOps.schemeOf(col("u")), UrlOps.canonicalize(col("u")))
      .as[(String, String, String, String)].head()
    assert(row === (("a.com", "/r", "https", "https://a.com/r?to=https://b.com/x")))
    // dedup keys: the embedded URL and the real one must NOT collide
    val df = Seq((1L, u), (2L, "https://b.com/x")).toDF("doc_id", "url")
    assert(UrlOps.urlDedup(df, "url", "doc_id").count() === 2)
  }

  test("canonicalize keeps the query of a slashless URL") {
    assert(canon("https://a.com?x=1&utm_s=t") === "https://a.com/?x=1")
    assert(canon("https://a.com:8080?b=2&a=1") === "https://a.com:8080/?a=1&b=2")
    // a '/' inside the query is data, not path
    assert(canon("https://a.com?to=/x/y") === "https://a.com/?to=/x/y")
  }

  test("surtKey reverses host labels and lowercases the path only") {
    val out = Seq("https://H3.Example.com/D/9?x=1#f", "http://a.co.uk")
      .toDF("u").select(UrlOps.surtKey(col("u"))).as[String].collect()
    assert(out === Seq("com,example,h3)/d/9", "uk,co,a)/"))
  }

  test("urlDedup: scheme-relative key, https wins, then first id") {
    val df = Seq(
      (1L, "http://www.a.com/p?utm_x=1"), // same resource, http, first
      (2L, "https://a.com/p/"),           // same resource, https → wins
      (3L, "https://a.com/p#f"),          // same resource, https, later id
      (4L, "http://a.com/q")              // different resource
    ).toDF("doc_id", "url")
    val out = UrlOps.urlDedup(df, "url", "doc_id")
      .orderBy("resource_key")
      .as[(String, Long, Long)].collect()
    assert(out === Seq(("a.com/p", 2L, 3L), ("a.com/q", 4L, 1L)))
  }

  test("domainCap keeps at most maxDocs per registrable domain, first ids") {
    val df = (0L until 30L).map(i =>
      (i, s"https://sub$i.${if (i % 2 == 0) "a.com" else "b.co.uk"}/d/$i"))
      .toDF("doc_id", "url")
    val out = UrlOps.domainCap(df, "url", "doc_id", maxDocs = 5)
      .as[(Long, String, Int)].collect()
    val byDomain = out.groupBy(_._2)
    assert(byDomain.keySet === Set("a.com", "b.co.uk"))
    assert(byDomain.values.forall(_.length == 5))
    // first ids kept: evens 0..8 for a.com, odds 1..9 for b.co.uk
    assert(byDomain("a.com").map(_._1).sorted === Seq(0L, 2L, 4L, 6L, 8L))
    assert(byDomain("b.co.uk").map(_._1).sorted === Seq(1L, 3L, 5L, 7L, 9L))
    // rank is the in-domain keep order
    assert(out.filter(_._2 == "a.com").sortBy(_._1).map(_._3) === Seq(1, 2, 3, 4, 5))
  }
}

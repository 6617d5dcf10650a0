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

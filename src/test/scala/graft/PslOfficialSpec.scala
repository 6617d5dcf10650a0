package graft

import graft.operators.PublicSuffix
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The COMPLETE official publicsuffix.org conformance file
  * (`test_psl.txt`, public domain, bundled as a test resource) against
  * the FULL bundled official list — every vector, every evaluator: the
  * interpreted driver evaluator takes all vectors including the
  * invalid-host null cases; the compiled CASE-chain Column and the
  * broadcast-dim join (defined over canonical hosts — UrlOps output)
  * take every syntactically valid vector. A list snapshot that dropped a
  * family, a parse slip on an IDN rule, or a precedence fault in any
  * evaluator fails a named vector.
  */
class PslOfficialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (host, expected registrable domain or null) from the official file;
    * the null-input vector is skipped (no host to evaluate), commented
    * vectors are skipped per the file itself. */
  private lazy val vectors: Seq[(String, Option[String])] = {
    val in = getClass.getResourceAsStream("/graft/test_psl.txt")
    require(in != null, "bundled test_psl.txt missing")
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val call = """checkPublicSuffix\((.+?),\s*(.+?)\);""".r
    def arg(s: String): Option[String] = s.trim match {
      case "null" => None
      case q if q.startsWith("'") && q.endsWith("'") =>
        Some(q.substring(1, q.length - 1))
      case other => fail(s"unparseable vector argument: $other")
    }
    text.linesIterator.filterNot(_.trim.startsWith("//")).flatMap { l =>
      call.findFirstMatchIn(l).flatMap { m =>
        arg(m.group(1)).map(h => (h, arg(m.group(2))))
      }
    }.toSeq
  }

  private def valid(h: String): Boolean =
    h.nonEmpty && !h.startsWith(".") && !h.endsWith(".") &&
      !h.contains("..")

  test("official vector file is complete and loaded") {
    // the file carries 78 active checkPublicSuffix calls; one is the
    // null-input vector (no host to evaluate)
    assert(vectors.size === 77, s"${vectors.size} vectors parsed")
    assert(vectors.exists(_._1 == "食狮.公司.cn"), "IDN section present")
    assert(vectors.exists(_._1 == "xn--85x722f.xn--55qx5d.cn"),
      "punycoded section present")
  }

  test("interpreted evaluator: every vector, nulls included") {
    val rules = PublicSuffix.officialRules
    vectors.foreach { case (h, expected) =>
      assert(PublicSuffix.registrableDomainOf(h, rules) ===
        expected.map(_.toLowerCase), s"checkPublicSuffix('$h')")
    }
  }

  test("compiled CASE-chain Column: every valid-host vector under the " +
      "full official rule set — one codegen'd projection, 9.5k rules") {
    val rules = PublicSuffix.officialRules
    val vs = vectors.filter(v => valid(v._1))
    val got = vs.map(_._1.toLowerCase).toDF("host")
      .withColumn("domain",
        PublicSuffix.registrableDomain(col("host"), rules))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vs.foreach { case (h, expected) =>
      val want = expected.map(_.toLowerCase)
      val compiled = Option(got(h.toLowerCase))
      // the Column contract folds an at-suffix host to itself (the
      // domain-cap dim-key behavior), where the vector file says null
      assert(compiled === want.orElse(Some(h.toLowerCase)),
        s"compiled checkPublicSuffix('$h')")
    }
  }

  test("broadcast-dim join: every valid-host vector under the full " +
      "official dim") {
    val rules = PublicSuffix.officialRules
    val dim = PublicSuffix.rulesDim(spark, rules)
    val vs = vectors.filter(v => valid(v._1)).zipWithIndex
    val df = vs.map { case ((h, _), i) => (i.toLong, h) }.toDF("id", "host")
    val got = PublicSuffix.registrableDomainDim(df, "host", "id", dim)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    vs.foreach { case ((h, expected), i) =>
      val want = expected.map(_.toLowerCase).orElse(Some(h.toLowerCase))
      assert(Option(got(i.toLong)) === want, s"dim checkPublicSuffix('$h')")
    }
  }

  test("registrableDomains auto-selects: both real lists compile (no " +
      "join in the plan — the measured-faster shape at every real list " +
      "size), a pathological rule set falls back to the dim join, and " +
      "snapshot/official/dim all agree on shared families") {
    val hosts = Seq("www.example.co.uk", "a.b.ide.kyoto.jp", "www.ck",
      "b.test.ck", "foo.pvt.k12.ma.us", "user.github.io",
      "deep.sub.example.com").zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("id", "host")
    val compiled = PublicSuffix.registrableDomains(hosts, "host", "id")
    assert(!compiled.queryExecution.executedPlan.toString.contains("Join"),
      "snapshot rules must compile, not join")
    val official = PublicSuffix.registrableDomains(hosts, "host", "id",
      PublicSuffix.officialRules)
    assert(!official.queryExecution.executedPlan.toString.contains("Join"),
      "the full official list (9.9k rules) still compiles — no crossover")
    // pathological size (several times any published PSL) → dim fallback
    val huge = PublicSuffix.Rules(
      exact = (1 to 50001).map(i => s"s$i.zz").toSet ++
        PublicSuffix.officialRules.exact,
      wildcardBase = PublicSuffix.officialRules.wildcardBase,
      exception = PublicSuffix.officialRules.exception)
    val fallback = PublicSuffix.registrableDomains(hosts, "host", "id", huge)
    assert(fallback.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "an above-limit rule set must take the broadcast-dim path")
    val a = compiled.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = official.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val c = fallback.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b, "snapshot and official list agree on shared families")
    assert(b === c, "compiled and dim agree under the same families")
  }

  test("every rule in the bundled official file parses into exactly one " +
      "bucket and the counts are list-sized") {
    val r = PublicSuffix.officialRules
    assert(r.exact.size > 9000, s"exact=${r.exact.size}")
    assert(r.wildcardBase.size > 90, s"wildcard=${r.wildcardBase.size}")
    assert(r.exception.size >= 8, s"exception=${r.exception.size}")
    // punycode twinning: the unicode rule and its xn-- twin both present
    assert(r.exact.contains("公司.cn") && r.exact.contains("xn--55qx5d.cn"))
    assert(r.maxLabels === 5)
  }
}

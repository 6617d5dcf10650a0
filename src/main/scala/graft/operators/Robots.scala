package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt parsing + access evaluation (RFC 9309) — the crawl
  * politeness gate that decides whether a URL may be fetched at all,
  * sitting ahead of everything else in the front-end. Semantics per the
  * RFC and the reference implementation ecosystem:
  *
  *   - group selection: the most specific matching `User-agent` group
  *     wins (exact product token over `*`), and ONLY that group's rules
  *     apply — groups never merge;
  *   - rule matching: `*` matches any octet run, `$` anchors the end;
  *   - precedence: the longest (most octets) matching pattern wins,
  *     `Allow` beating `Disallow` on ties;
  *   - no matching rule → allowed.
  *
  * Parsing is tolerant the way the RFC demands: field names
  * case-insensitive, `#` comments stripped, unknown fields ignored,
  * consecutive `User-agent` lines share one group, an empty `Disallow:`
  * contributes no rule.
  *
  * Scale shape: evaluation is a per-row pure function (mapPartitions, no
  * shuffle); a deployment parses each domain's robots.txt once and
  * broadcasts the compiled rule table keyed by registrable domain —
  * the table is domains-sized, not corpus-sized.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** ua (lowercased product token) → rules, group structure per RFC. */
  def parseRobots(txt: String): Map[String, Seq[Rule]] = {
    val out = scala.collection.mutable.Map.empty[String, Vector[Rule]]
    var currentUas: List[String] = Nil
    var inGroup = false // false once a rule line closed the UA run
    for (raw <- txt.linesIterator) {
      val line = raw.split("#", 2)(0).trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (inGroup) { currentUas = Nil; inGroup = false }
            currentUas = value.toLowerCase :: currentUas
            currentUas.foreach(u => out.getOrElseUpdate(u, Vector.empty))
          case "allow" | "disallow" =>
            inGroup = true
            if (value.nonEmpty)
              currentUas.foreach { u =>
                out(u) = out.getOrElse(u, Vector.empty) :+
                  Rule(field == "allow", value)
              }
          case _ => () // crawl-delay, sitemap, unknown: ignored here
        }
      }
    }
    out.toMap
  }

  /** Per-UA `Crawl-delay` seconds (the de-facto extension every major
    * crawler honors): same group walk as [[parseRobots]] — a delay line
    * binds to the current UA run's groups; the LAST delay a group sees
    * wins (the same last-wins the field has in practice).
    */
  def parseCrawlDelays(txt: String): Map[String, Double] = {
    val out = scala.collection.mutable.Map.empty[String, Double]
    var currentUas: List[String] = Nil
    var inGroup = false
    for (raw <- txt.linesIterator) {
      val line = raw.split("#", 2)(0).trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (inGroup) { currentUas = Nil; inGroup = false }
            currentUas = value.toLowerCase :: currentUas
          case "crawl-delay" =>
            inGroup = true
            value.toDoubleOption.foreach(d =>
              currentUas.foreach(u => out(u) = d))
          case "allow" | "disallow" => inGroup = true
          case _ => ()
        }
      }
    }
    out.toMap
  }

  /** `Sitemap:` directives in document order — per RFC 9309 §2.3 the
    * field is NOT bound to any User-agent group, so collection ignores
    * group structure entirely. The value keeps its case (URLs are
    * case-sensitive past the authority).
    */
  def sitemapUrls(txt: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (raw <- txt.linesIterator) {
      val line = raw.split("#", 2)(0).trim
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(c + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.toSeq
  }

  /** Distributed `Sitemap:` collection over (id, robots_txt) rows:
    * (id, sm_idx, sitemap_url) in declaration order.
    */
  def declaredSitemaps(spark: SparkSession, df: DataFrame, idCol: String,
      txtCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(txtCol)).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, txt) =>
        sitemapUrls(txt).zipWithIndex.map { case (u, i) => (id, i, u) }
      })
      .toDF(idCol, "sm_idx", "sitemap_url")
  }

  /** Compile (host, robots_txt) rows into the hosts-sized delay dim a
    * scheduler broadcasts: the UA's group delay, `*`'s otherwise,
    * `default` when the policy names none.
    */
  def crawlDelays(spark: SparkSession, df: DataFrame, hostCol: String,
      txtCol: String, ua: String, default: Double): DataFrame = {
    import spark.implicits._
    val uaLower = ua.toLowerCase
    df.select(col(hostCol).cast("string"), col(txtCol)).as[(String, String)]
      .mapPartitions(_.map { case (host, txt) =>
        (host, lookupUa(parseCrawlDelays(txt), uaLower).getOrElse(default))
      })
      .toDF("host", "delay_sec")
  }

  /** RFC 9309 path match: `*` spans any octets, trailing `$` anchors. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1)
    if (parts.length == 1) {
      if (anchored) path == pat else path.startsWith(pat)
    } else {
      if (!path.startsWith(parts.head)) return false
      var pos = parts.head.length
      for (mid <- parts.tail.dropRight(1)) {
        val i = path.indexOf(mid, pos)
        if (i < 0) return false
        pos = i + mid.length
      }
      val last = parts.last
      if (anchored)
        path.length - last.length >= pos && path.endsWith(last)
      else {
        if (last.isEmpty) true else path.indexOf(last, pos) >= 0
      }
    }
  }

  /** The crawler's PRODUCT TOKEN (RFC 9309 §2.2.1: letters, digits,
    * "-" and "_"): the leading token of the UA string, lowercased —
    * "GraftBot/1.2 (+https://…)" identifies as "graftbot". */
  private[operators] def productToken(ua: String): String =
    ua.toLowerCase.takeWhile(c =>
      c.isLetterOrDigit || c == '-' || c == '_')

  /** Group matching: a crawler sending "GraftBot/1.2" matches the group
    * named "graftbot" — group names compare case-insensitively against
    * the crawler's PRODUCT TOKEN (the token extraction and
    * case-insensitive matching are RFC 9309 §2.2.1; the RFC itself
    * specifies EXACT token equality). On top of that this lookup keeps
    * the LONGEST-PREFIX fallback documented by Google's robots.txt
    * implementation notes (a "googlebot" group governs a
    * "googlebot-news" token unless the more specific group exists), ties
    * broken lexicographically for determinism; only when NO named group
    * prefixes the token does `*` apply. An exact group name is always
    * its own longest prefix, so RFC-conformant files resolve identically
    * under the extension; the residual over-fire (a one-letter group
    * name prefixing any token with that initial) is the documented price
    * of the Google-style fallback — a bare substring match would be
    * strictly worse. (The r14 exact-token-only lookup silently dropped
    * versioned UA strings to `*`.)
    */
  def groupFor(groups: Map[String, Seq[Rule]], ua: String): Seq[Rule] = {
    val t = productToken(ua)
    val named = groups.keysIterator
      .filter(g => g != "*" && g.nonEmpty && t.startsWith(g)).toSeq
    if (named.nonEmpty) groups(named.maxBy(g => (g.length, g)))
    else groups.getOrElse("*", Nil)
  }

  /** The same longest-prefix product-token match over any per-UA map
    * (crawl-delay lookups share the group-selection semantics). */
  private[graft] def lookupUa[A](m: Map[String, A], ua: String): Option[A] = {
    val t = productToken(ua)
    val named = m.keysIterator
      .filter(k => k != "*" && k.nonEmpty && t.startsWith(k)).toSeq
    if (named.nonEmpty) Some(m(named.maxBy(k => (k.length, k)))) else m.get("*")
  }

  /** (allowed, winning pattern) — longest match wins, Allow beats
    * Disallow on ties, no match allows with pattern "".
    */
  def evaluate(rules: Seq[Rule], path: String): (Boolean, String) = {
    val hits = rules.filter(r => matches(r.pattern, path))
    if (hits.isEmpty) (true, "")
    else {
      val best = hits.maxBy(r => (r.pattern.length, r.allow))
      (best.allow, best.pattern)
    }
  }

  /** Deterministic fixture over the documents table: one site policy
    * exercising every RFC 9309 semantic the evaluator implements —
    * specific-group selection (graftbot vs `*`, groups never merging),
    * wildcard + `$`-anchored patterns, longest-match precedence with
    * Allow beating Disallow, and the no-match default. ua alternates by
    * doc_id%2, the path class cycles by doc_id%5, so every (group, rule)
    * pair is hit and the oracle can replay the verdict by formula.
    */
  /** The fixture's site policy (shared with RobotsSpec's replay law). */
  val fixturePolicy: String = Seq(
    "# graft crawl policy",
    "User-agent: graftbot",
    "Disallow: /private/",
    "Allow: /private/pub*",
    "Disallow: /*.pdf$",
    "",
    "User-agent: *",
    "Disallow: /tmp/",
    "Allow: /").mkString("\n")

  def syntheticRobotsCorpus(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val policy = fixturePolicy
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val ua = if (id % 2 == 0) "GraftBot" else "FetchKit"
        val path = (id % 5) match {
          case 0 => s"/private/doc$id"
          case 1 => s"/private/pub$id"
          case 2 => s"/files/r$id.pdf"
          case 3 => s"/tmp/x$id"
          case _ => s"/index$id.html"
        }
        (id, policy, ua, path)
      })
      .toDF("doc_id", "robots_txt", "ua", "path")
  }

  /** RFC 9309 pattern → anchored Java regex: literal segments quoted,
    * `*` spans any octets — compiled as `(?s:.*)` so it crosses newlines
    * exactly like the interpreted [[matches]] walk's indexOf does (bare
    * `.*` stops at \n and the two advertised-equivalent gates would
    * diverge on a path containing one) — trailing `$` keeps its anchor;
    * the leading `^` makes the no-anchor case a prefix match, per the
    * RFC.
    */
  private[graft] def toRegex(pattern: String): String = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val body = pat.split("\\*", -1)
      .map(seg => if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
      .mkString("(?s:.*)")
    // \z, not $: Java's $ also matches BEFORE a final line terminator,
    // which would anchor-pass a path ending in \n that evaluate() rejects
    "^" + body + (if (anchored) "\\z" else "")
  }

  /** COMPILE a constant policy into a codegen'd boolean Column over a URL
    * column — the deployment shape for a corpus-wide gate where the
    * policy is known up front: rules sort by (length desc, Allow-first)
    * once at plan time, so the longest-match precedence becomes a plain
    * CASE chain whose first hit wins, and the whole gate stays inside
    * whole-stage codegen (no UDF, no per-row parse).
    */
  def policyFilter(policy: String, ua: String, url: Column): Column = {
    val rules = groupFor(parseRobots(policy), ua)
    val path = UrlOps.pathOf(url)
    rules.sortBy(r => (-r.pattern.length, !r.allow))
      .foldRight(lit(true)) { (r, els) =>
        when(path.rlike(toRegex(r.pattern)), lit(r.allow)).otherwise(els)
      }
  }

  /** Distributed evaluation over (id, robots_txt, ua, path) rows: parse
    * per row (fixture shape; deployments hoist the parse per domain) and
    * emit the verdict frame.
    */
  def evalBinary(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("robots_txt"), col("ua"),
      col("path")).as[(Long, String, String, String)]
      .mapPartitions(_.map { case (id, txt, ua, path) =>
        val (allowed, rule) = evaluate(groupFor(parseRobots(txt), ua), path)
        (id, ua, path, allowed, rule)
      })
      .toDF("doc_id", "ua", "path", "allowed", "rule")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL curation — the stage every crawl pipeline runs BEFORE any text
  * touches a tokenizer (CCNet, C4, RefinedWeb/Falcon all open with it):
  * canonicalize the target URI, collapse exact re-crawls of the same
  * resource, and bound any one registrable domain's share of the corpus.
  * The reference has no URL surface (its inputs are CSV weather drops —
  * SURVEY.md §2.1), so this whole operator is north-star pipeline
  * capability, not parity.
  *
  * Everything here is pure `Column` arithmetic — `substring_index` /
  * `split` / higher-order `filter` / `array_sort` — so the hot path stays
  * inside whole-stage codegen: no UDFs, no driver collects, and at 100 TB
  * the canonicalize+dedup pass is one projection plus one keyed
  * aggregation on the canonical key (the same shuffle exact dedup already
  * pays). Domain caps are a window over (domain) — bounded output per
  * group, skew-safe because a pathological domain contributes at most
  * `maxDocs` rows downstream.
  */
object UrlOps {

  /** Query-string parameter keys dropped during canonicalization: the
    * session/click trackers that make two fetches of one resource look
    * distinct. Prefix match for the `utm_` family, exact for the rest.
    */
  val trackingExact: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")

  private def isTracking(kv: Column): Column = {
    val key = substring_index(kv, "=", 1)
    key.startsWith("utm_") || trackingExact
      .map(key === _).reduce(_ || _)
  }

  /** Split on the FIRST "://" — never `substring_index(url, "://", -1)`,
    * which anchors on the LAST occurrence and re-parses a URL that embeds
    * an absolute URL in its query ("https://a.com/r?to=https://b.com/x",
    * ubiquitous in real crawls) as the EMBEDDED url, silently corrupting
    * every canonical dedup key, SURT key, and robots path downstream.
    * The prefix must also look like a scheme (RFC 3986 ALPHA then
    * alphanumeric/+/-/.), so a relative URL whose query carries "://"
    * never sheds its real head. Returns (scheme lowercased or "",
    * everything after the separator or the input unchanged).
    */
  private def schemeSplit(url: Column): (Column, Column) = {
    val i = instr(url, "://")
    // the head must LOOK like a scheme (RFC 3986 ALPHA then
    // alphanumeric/+/-/.): one anchored regex over the ≤ i-char prefix —
    // measurably cheaper than locate-based full-string scans (the regex
    // compiles once per plan; the prefix is a handful of octets)
    val valid = i > 0 &&
      url.substr(lit(1), i - 1).rlike("^[A-Za-z][A-Za-z0-9+.-]*$")
    (when(valid, lower(url.substr(lit(1), i - 1))).otherwise(lit("")),
      when(valid, url.substr(i + 3, length(url))).otherwise(url))
  }

  /** Scheme of a URL, lowercased ("" when no valid "scheme://" head). */
  def schemeOf(url: Column): Column = schemeSplit(url)._1

  /** Host (no port, no credentials handling — crawl URIs), lowercased,
    * leading "www." stripped.
    */
  def hostOf(url: Column): Column = {
    val afterScheme = schemeSplit(url)._2
    val hostPort = substring_index(substring_index(
      substring_index(afterScheme, "/", 1), "?", 1), "#", 1)
    val host = lower(substring_index(hostPort, ":", 1))
    when(host.startsWith("www."), host.substr(lit(5), length(host)))
      .otherwise(host)
  }

  /** Canonical form of a URL column:
    *   - scheme + host lowercased, leading "www." dropped
    *   - default ports stripped (":80" for http, ":443" for https);
    *     non-default ports kept
    *   - fragment dropped
    *   - tracking params dropped ([[trackingExact]] + "utm_*"); the
    *     survivors sorted bytewise so param order never splits a key
    *   - trailing "/" dropped from a non-root path
    *
    * One codegen'd projection; at corpus scale this column IS the dedup
    * key, so it must be deterministic across engines — everything is
    * bytewise string arithmetic, no locale, no IDN.
    */
  def canonicalize(url: Column): Column = {
    val (scheme, rest) = canonicalParts(url)
    concat(scheme, lit("://"), rest)
  }

  /** (canonical scheme, canonical SCHEME-RELATIVE remainder) — split so
    * [[resourceKey]] reads the remainder directly instead of re-parsing
    * the assembled canonical string (re-deriving the key from the string
    * duplicated the whole canonicalize tree per consumer and cost q172
    * 6× in the r15 bench).
    */
  private def canonicalParts(url: Column): (Column, Column) = {
    val (scheme, afterScheme) = schemeSplit(url)
    val noFrag = substring_index(afterScheme, "#", 1)
    val hostPort = substring_index(substring_index(noFrag, "/", 1), "?", 1)
    val host = hostOf(url)
    val port = when(hostPort.contains(":"),
      substring_index(hostPort, ":", -1)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")

    // Path+query = everything after the authority, anchored on the FIRST
    // of "/" or "?" (locate is 1-based, 0 when absent): a slashless URL
    // with a query ("https://a.com?x=1") has path "/" and MUST keep its
    // query — deriving rest from "/" alone silently dropped the params
    // and merged distinct resources.
    val slash = locate("/", noFrag)
    val qm = locate("?", noFrag)
    val rest = when(slash > 0 && (qm === 0 || slash < qm),
        noFrag.substr(slash, length(noFrag)))
      .when(qm > 0, concat(lit("/"), noFrag.substr(qm, length(noFrag))))
      .otherwise(lit(""))
    val pathOnly = substring_index(rest, "?", 1)
    val path = when(pathOnly === "" || pathOnly === "/", lit("/"))
      .otherwise(when(pathOnly.endsWith("/"),
        pathOnly.substr(lit(1), length(pathOnly) - 1))
        .otherwise(pathOnly))

    // query = after the FIRST "?" of rest (a query legally containing a
    // second "?" keeps it as data)
    val qr = locate("?", rest)
    val rawQuery = when(qr > 0, rest.substr(qr + 1, length(rest)))
      .otherwise(lit(""))
    val kept = array_join(
      array_sort(filter(split(rawQuery, "&"),
        kv => kv =!= "" && !isTracking(kv))), "&")

    (scheme, concat(
      host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit(""))))
  }

  /** Path component of a URL (no query, no fragment), "/" when absent.
    * Case preserved — paths are case-sensitive.
    */
  def pathOf(url: Column): Column = {
    val afterScheme = schemeSplit(url)._2
    val noFrag = substring_index(afterScheme, "#", 1)
    val slash = locate("/", noFrag)
    val qm = locate("?", noFrag)
    // the path ends at the first "?": a slashless-with-query URL has
    // path "/", and a "/" INSIDE the query is data, not path
    val rest = when(slash > 0 && (qm === 0 || slash < qm),
        noFrag.substr(slash, length(noFrag)))
      .otherwise(lit(""))
    val pathOnly = substring_index(rest, "?", 1)
    when(pathOnly === "", lit("/")).otherwise(pathOnly)
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the key CDX
    * indexes sort by, so one domain's records cluster): host labels
    * reversed and comma-joined, then ")" and the lowercased path.
    * "https://H3.Example.com/D/9" → "com,example,h3)/d/9".
    */
  def surtKey(url: Column): Column =
    concat(array_join(reverse(split(hostOf(url), "\\.")), ","),
      lit(")"), lower(pathOf(url)))

  /** Registrable domain of a host column under the Public Suffix List
    * algorithm — exact/wildcard/exception rules, longest match, implicit
    * `*` — compiled at plan time into pure codegen'd Column arithmetic.
    * See [[PublicSuffix]] for the algorithm, the curated list snapshot,
    * and the broadcast-dim deployment variant for the full official file.
    * A host at or below its public suffix folds to itself.
    */
  def registrableDomain(host: Column): Column =
    PublicSuffix.registrableDomain(host)

  /** SCHEME-RELATIVE canonical resource key — the re-crawl dedup key the
    * http and https fetches of one resource collide on: the canonical
    * remainder built DIRECTLY (never stripped back off the assembled
    * string — `substring_index(_, "://", -1)` would re-anchor on a
    * "://" inside a kept query param and collide unrelated resources,
    * and a first-occurrence re-parse pays the whole canonicalize tree
    * twice).
    */
  def resourceKey(url: Column): Column = canonicalParts(url)._2

  /** Collapse re-crawls: one survivor per resource. The key is the
    * SCHEME-RELATIVE canonical URL (everything after "://") so the http
    * and https fetches of one resource collide; preference is then https
    * over http, then the lowest id (first fetch). Output one row per
    * resource with the survivor's id and the collision count — the
    * verdict frame a curation pipeline joins back to drop losers.
    *
    * One shuffle on the resource key; the per-group state is a single
    * (rank, count) pair, so group skew (a hot URL re-crawled millions of
    * times) degrades to a big count, never a big buffer.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = df
      .withColumn("resource_key", resourceKey(col(urlCol)))
      .withColumn("_https", (schemeOf(col(urlCol)) === "https").cast("int"))
    val w = Window.partitionBy(col("resource_key"))
      .orderBy(col("_https").desc, col(idCol).asc)
    canon
      .withColumn("_rn", row_number().over(w))
      .withColumn("n_dups",
        count(lit(1)).over(Window.partitionBy(col("resource_key"))))
      .filter(col("_rn") === 1)
      .select(col("resource_key"), col(idCol).as("kept_id"), col("n_dups"))
  }

  /** Bound any one registrable domain's share: keep the first `maxDocs`
    * ids per domain (RefinedWeb's anti-SEO measure). Returns the kept
    * rows with their in-domain rank — callers wanting the drop side
    * invert the filter.
    */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
                maxDocs: Int): DataFrame = {
    val domained = df.withColumn("domain", registrableDomain(hostOf(col(urlCol))))
    val w = Window.partitionBy(col("domain")).orderBy(col(idCol).asc)
    domained
      .withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= maxDocs)
      .select(col(idCol), col("domain"), col("domain_rank"))
  }
}

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

  /** Scheme of a URL, lowercased ("" when no "://" present). */
  def schemeOf(url: Column): Column =
    when(url.contains("://"), lower(substring_index(url, "://", 1)))
      .otherwise(lit(""))

  /** Host (no port, no credentials handling — crawl URIs), lowercased,
    * leading "www." stripped.
    */
  def hostOf(url: Column): Column = {
    val afterScheme =
      when(url.contains("://"), substring_index(url, "://", -1)).otherwise(url)
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
    val scheme = schemeOf(url)
    val afterScheme =
      when(url.contains("://"), substring_index(url, "://", -1)).otherwise(url)
    val noFrag = substring_index(afterScheme, "#", 1)
    val hostPort = substring_index(substring_index(noFrag, "/", 1), "?", 1)
    val host = hostOf(url)
    val port = when(hostPort.contains(":"),
      substring_index(hostPort, ":", -1)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")

    // Path+query = everything after the authority. locate is 1-based and
    // returns 0 when absent; a URL with no "/" after the authority has an
    // empty path (normalized to "/").
    val slash = locate("/", noFrag)
    val rest = when(slash > 0, noFrag.substr(slash, length(noFrag)))
      .otherwise(lit(""))
    val pathOnly = substring_index(rest, "?", 1)
    val path = when(pathOnly === "" || pathOnly === "/", lit("/"))
      .otherwise(when(pathOnly.endsWith("/"),
        pathOnly.substr(lit(1), length(pathOnly) - 1))
        .otherwise(pathOnly))

    val rawQuery = when(rest.contains("?"),
      substring_index(rest, "?", -1)).otherwise(lit(""))
    val kept = array_join(
      array_sort(filter(split(rawQuery, "&"),
        kv => kv =!= "" && !isTracking(kv))), "&")

    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Path component of a URL (no query, no fragment), "/" when absent.
    * Case preserved — paths are case-sensitive.
    */
  def pathOf(url: Column): Column = {
    val afterScheme =
      when(url.contains("://"), substring_index(url, "://", -1)).otherwise(url)
    val noFrag = substring_index(afterScheme, "#", 1)
    val slash = locate("/", noFrag)
    val rest = when(slash > 0, noFrag.substr(slash, length(noFrag)))
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

  /** Second-level labels under which a two-letter ccTLD still needs three
    * labels for the registrable domain (simplified public-suffix rule:
    * "example.co.uk" registers at "example", not "co"). A real deployment
    * ships the full PSL as a broadcast lookup; the rule below covers the
    * dominant families and keeps the operator engine-portable.
    */
  val secondLevel: Seq[String] = Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Registrable domain of a host column: last two labels, or last three
    * when the second-to-last is a known second-level label under a
    * two-letter ccTLD.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val sld = element_at(labels, -2)
    val needThree = n >= lit(3) && length(tld) === 2 &&
      secondLevel.map(sld === _).reduce(_ || _)
    when(needThree,
      concat_ws(".", element_at(labels, -3), sld, tld))
      .otherwise(when(n >= lit(2), concat_ws(".", sld, tld)).otherwise(host))
  }

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
      .withColumn("resource_key",
        substring_index(canonicalize(col(urlCol)), "://", -1))
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

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl snapshot diffing — the change report between two crawls of the
  * same frontier: which URLs APPEARED, which VANISHED, which bodies
  * CHANGED (content-hash inequality), which held steady. Feeds the
  * adaptive recrawl estimator ([[Frontier.adaptiveSchedule]]) and the
  * freshness dashboards every crawl operation runs.
  *
  * Scale shape: ONE full-outer equi-join keyed by URL — both snapshots
  * shuffle once on the join key and the verdict is a codegen'd CASE over
  * the two hash columns; the per-host rollup reuses nothing corpus-sized
  * (hosts-sized output). URLs are unique per snapshot by contract
  * (post-[[UrlOps.urlDedup]]), so the join never fans out.
  */
object CrawlDiff {

  /** One row per URL in either snapshot:
    * (url, prev_hash, cur_hash, status ∈ added|removed|changed|unchanged).
    */
  def diff(prev: DataFrame, cur: DataFrame, urlCol: String,
      hashCol: String): DataFrame = {
    val p = prev.select(col(urlCol).as("url"), col(hashCol).as("prev_hash"))
    val c = cur.select(col(urlCol).as("url"), col(hashCol).as("cur_hash"))
    p.join(c, Seq("url"), "full_outer")
      .withColumn("status",
        when(col("prev_hash").isNull, lit("added"))
          .when(col("cur_hash").isNull, lit("removed"))
          .when(col("prev_hash") === col("cur_hash"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Per-host change rollup over a diff frame: hosts-sized output. */
  def diffSummary(d: DataFrame): DataFrame =
    d.groupBy(UrlOps.hostOf(col("url")).as("host"), col("status"))
      .agg(count(lit(1)).as("n_urls"))

  /** Deterministic two-snapshot fixture over the documents table:
    * id%5==0 is absent from the PREVIOUS crawl (→ added), id%5==1 absent
    * from the CURRENT (→ removed), id%3==0 bodies carry a v2 suffix in
    * the current crawl (→ changed), the rest are unchanged. Returns
    * (previous, current).
    */
  def syntheticSnapshots(spark: SparkSession,
      docs: DataFrame): (DataFrame, DataFrame) = {
    val base = docs.select(col("doc_id"), col("text"))
      .withColumn("url", concat(lit("https://h"), col("doc_id") % 13,
        lit(".example.com/d/"), col("doc_id")))
    val prev = base.where(col("doc_id") % 5 =!= 0)
      .select(col("url"), md5(col("text")).as("content_hash"))
    val cur = base.where(col("doc_id") % 5 =!= 1)
      .select(col("url"), md5(concat(col("text"),
        when(col("doc_id") % 3 === 0, lit("v2")).otherwise(lit(""))))
        .as("content_hash"))
    (prev, cur)
  }
}

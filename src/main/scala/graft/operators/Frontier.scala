package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-frontier scheduling — the politeness stage between discovery
  * ([[Sitemap]] explode, [[LinkGraph]] out-links) and fetch: a crawler
  * may hit one host only every `delaySec` seconds (robots crawl-delay /
  * default politeness), so the frontier orders each host's queue by
  * descending priority and assigns slot k the fetch offset k·delaySec.
  * Deterministic tie-break by URL so replays schedule identically.
  *
  * Scale shape: ONE shuffle keyed by host (the scheduler's intrinsic
  * partitioning — per-host queues are sequential by definition), then a
  * per-partition window walk; no global sort, no driver state. Host
  * skew (one domain with millions of URLs) stays a single partition's
  * sequential queue — which is exactly the politeness semantics: a
  * million-URL host IS fetched serially, the skew is the schedule.
  */
object Frontier {

  /** (input columns…, host, slot, offset_sec): slot = position in the
    * host's priority-ordered queue (0-based), offset_sec = slot·delay.
    */
  def schedule(links: DataFrame, urlCol: String, priorityCol: String,
      delaySec: Double): DataFrame = {
    val w = Window.partitionBy("host")
      .orderBy(col(priorityCol).desc, col(urlCol))
    links.withColumn("host", UrlOps.hostOf(col(urlCol)))
      .withColumn("slot", row_number().over(w).cast("long") - 1)
      .withColumn("offset_sec", col("slot") * lit(delaySec))
  }

  /** Adaptive revisit policy (Cho & Garcia-Molina): from a fetch history
    * of (url, fetch_seq, content_hash), estimate each URL's change rate
    * — the fraction of consecutive fetch pairs whose hash differed — and
    * schedule the next interval as baseHours/(1+9·rate), parity-rounded:
    * a never-changing page waits the full base, a page changing every
    * fetch waits base/10. Output one row per URL:
    * (url, n_fetches, n_changes, change_rate, next_interval_hours).
    *
    * Scale shape: one shuffle keyed by URL serving both the lag walk and
    * the aggregation (the window's partitioning is reused by the
    * groupBy — no second shuffle); output is URLs-sized.
    */
  /** [[schedule]] with PER-HOST delays (each domain's robots crawl-delay,
    * compiled to a hosts-sized dim by [[Robots.crawlDelays]]): the dim
    * BROADCASTS onto the queue — the corpus still shuffles exactly once,
    * on host — and slot k fetches at k·delay(host), `default` for hosts
    * the dim misses.
    */
  def scheduleWithDelays(links: DataFrame, urlCol: String,
      priorityCol: String, delays: DataFrame, default: Double): DataFrame = {
    val w = Window.partitionBy("host")
      .orderBy(col(priorityCol).desc, col(urlCol))
    links.withColumn("host", UrlOps.hostOf(col(urlCol)))
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("slot", row_number().over(w).cast("long") - 1)
      .withColumn("offset_sec",
        col("slot") * coalesce(col("delay_sec"), lit(default)))
  }

  /** Crawl-budget allocation — the capacity-planning step between the
    * scheduled frontier and a fetch window: a host can politely absorb at
    * most ⌊window/delay⌋+1 fetches (slots 0, delay, 2·delay … ≤ window),
    * and the crawler has a global budget of B fetches for the window.
    * Per host: queue_len, that politeness cap, and a GREEDY allocation in
    * host order — alloc = clamp(cap, B − Σ caps of earlier hosts) — so
    * early hosts fill their cap and the budget boundary splits exactly
    * one host (the q102 token-budget discipline on the hosts dim).
    *
    * A null/zero/negative delay (malformed robots data) falls back to
    * `fallbackDelaySec` BEFORE the cap arithmetic — `floor(w/0)` is null
    * and `least()` skips nulls, so an unguarded malformed delay silently
    * DELETED the politeness cap for exactly the hosts whose policy was
    * broken and over-allocated the budget to them.
    *
    * Scale shape: one hosts-keyed aggregation (corpus-sized input,
    * hosts-sized output), then a TWO-PASS DISTRIBUTED prefix sum over
    * host order — range-partition by host, per-partition running sums,
    * and a partition-subtotal offset table (one row per shuffle
    * partition, bounded by cluster config, never by host count) folded
    * back by broadcast. A web-scale frontier has 10⁷–10⁸ registrable
    * hosts; no stage here ever holds more than one range partition of
    * them in order — the only global-order window runs over the
    * `partitions`-row subtotal frame.
    */
  def budgetAllocate(frontier: DataFrame, hostCol: String, delayCol: String,
      windowSec: Double, budget: Long,
      fallbackDelaySec: Double = 1.0): DataFrame = {
    require(fallbackDelaySec > 0,
      s"fallbackDelaySec must be > 0: $fallbackDelaySec")
    val dRaw = first(col(delayCol)).as("delay_sec")
    val per = frontier.groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("queue_len"), dRaw)
      .withColumn("_d", when(col("delay_sec").isNull ||
          col("delay_sec") <= 0, lit(fallbackDelaySec))
        .otherwise(col("delay_sec")))
      .withColumn("cap", least(col("queue_len"),
        floor(lit(windowSec) / col("_d")) + 1L))
    // pass 1: range-partition the hosts dim by host and pin the
    // partition assignment (both consumers below must read ONE mapping)
    val parts = math.max(1,
      per.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val ranged = per.repartitionByRange(parts, col("host"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // per-partition running sum: partitionBy(pid) keeps every window
    // bounded by one range partition
    val wLocal = Window.partitionBy("pid").orderBy("host")
      .rowsBetween(Window.unboundedPreceding, -1)
    // pass 2: subtotals (≤ `parts` rows) → cumulative offsets; the
    // global-order window here runs over the partition COUNT, not hosts
    val wPid = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("pid")).agg(sum(col("cap")).as("sub"))
      .withColumn("off", coalesce(sum(col("sub")).over(wPid), lit(0L)))
      .select(col("pid"), col("off"))
    ranged
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("prior",
        coalesce(sum(col("cap")).over(wLocal), lit(0L)) + col("off"))
      .withColumn("alloc",
        greatest(lit(0L), least(col("cap"), lit(budget) - col("prior"))))
      .select(col("host"), col("queue_len"), col("cap"), col("alloc"))
  }

  /** Deterministic fetch-history fixture over the documents table: four
    * fetches per URL whose content hash changes every 1+doc_id%4 fetches
    * — so the corpus spans change-every-fetch (rate 1), two mid rates,
    * and never-changes (rate 0), and the oracle replays the hash stream
    * by formula.
    */
  def syntheticFetchHistory(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .withColumn("url", concat(lit("https://h"), col("doc_id") % 13,
        lit(".example.com/d/"), col("doc_id")))
      .withColumn("fetch_seq",
        explode(array(lit(0), lit(1), lit(2), lit(3))))
      .withColumn("k", (col("doc_id") % 4 + 1).cast("int"))
      .withColumn("content_hash", md5(concat(col("text"), lit("#"),
        (col("fetch_seq") / col("k")).cast("int"))))
      .select("doc_id", "url", "fetch_seq", "content_hash")

  def adaptiveSchedule(history: DataFrame, urlCol: String, seqCol: String,
      hashCol: String, baseHours: Double): DataFrame = {
    val w = Window.partitionBy(col(urlCol)).orderBy(col(seqCol))
    val prev = lag(col(hashCol), 1).over(w)
    val changed = when(prev.isNull, lit(0))
      .when(col(hashCol) === prev, lit(0)).otherwise(lit(1))
    history
      .withColumn("chg", changed)
      .groupBy(col(urlCol))
      .agg(count(lit(1)).as("n_fetches"),
        sum(col("chg")).as("n_changes"))
      .withColumn("change_rate",
        graft.functions.ColumnFunctions.pround(
          col("n_changes") / (col("n_fetches") - 1), 4))
      .withColumn("next_interval_hours",
        graft.functions.ColumnFunctions.pround(
          lit(baseHours) / (lit(1.0) + lit(9.0) * col("n_changes") /
            (col("n_fetches") - 1)), 2))
  }
}

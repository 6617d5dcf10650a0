package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus indexing: inverted-index construction and TF-IDF term scoring —
  * the retrieval-side operators of a training-data pipeline (build the
  * index that serves dedup lookups / quality audits; surface each
  * document's distinguishing terms for curation review).
  *
  * Scale shape: both are explode → hash-aggregate pipelines. The explode
  * is narrow; the aggregations get map-side partial combine for free
  * (token cardinality ≪ token occurrences), so the shuffle carries one
  * row per distinct (doc, token) / token, not per occurrence. Hot tokens
  * (stopwords appear in every document) are exactly the keys partial
  * aggregation collapses before the wire. The per-doc top-k is a
  * WindowGroupLimit, never a global sort.
  */
object Indexing {

  /** Inverted index with capped posting heads: one row per token with
    * document frequency, total term frequency, and the first
    * `postingCap` posting doc ids (ascending, comma-joined — the page a
    * lookup service would pin in memory). Tokens below `minDf` are
    * dropped: rare-token postings dominate index size but never serve
    * dedup lookups, so production indexes cap or tier them.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, postingCap: Int = 10): DataFrame = {
    require(minDf >= 1 && postingCap >= 1)
    docs
      .select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), "\\s+")).as("token"))
      .groupBy(col("token"))
      .agg(
        countDistinct(col("id")).as("doc_freq"),
        count(lit(1)).as("total_tf"),
        array_join(slice(sort_array(collect_set(col("id"))), 1, postingCap), ",")
          .as("postings_head"))
      .filter(col("doc_freq") >= minDf)
  }

  /** Per-stratum Zipf fit: OLS of ln(count) on ln(rank) over the top
    * `topN` tokens (rank by count desc, token asc — deterministic). A
    * healthy natural-language source fits slope ≈ −1 (Zipf's law); a
    * collapsed slope or r² is the template-spam / scraper-breakage smell
    * a dataset card flags next to entropy ([[graft.queries]] q107).
    * Closed-form population moments — covar_pop/var_pop — so any engine
    * replays it; one token-count aggregate, one tiny per-stratum window
    * over ≤ topN rows, one scalar aggregate per stratum.
    *
    * Output: (stratum, n_top, zipf_slope, zipf_r2), rounded to 6.
    */
  def zipfFit(docs: DataFrame, stratumCol: String, textCol: String,
      topN: Int = 100): DataFrame = {
    require(topN >= 2)
    val counts = docs
      .select(col(stratumCol).as("stratum"),
        explode(split(col(textCol), "\\s+")).as("token"))
      .groupBy(col("stratum"), col("token")).agg(count(lit(1)).as("c"))
    val ranked = counts
      .withColumn("rank", row_number().over(Window.partitionBy(col("stratum"))
        .orderBy(col("c").desc, col("token"))))
      .filter(col("rank") <= topN)
      .select(col("stratum"), log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val r = graft.functions.ColumnFunctions.pround(_: org.apache.spark.sql.Column, 6)
    ranked.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_top"),
        covar_pop(col("y"), col("x")).as("cxy"),
        var_pop(col("x")).as("vx"), var_pop(col("y")).as("vy"))
      .select(col("stratum"), col("n_top"),
        r(col("cxy") / col("vx")).as("zipf_slope"),
        r(col("cxy") * col("cxy") / (col("vx") * col("vy"))).as("zipf_r2"))
  }

  /** Per-document top-`k` TF-IDF terms: score = tf · ln(N/df), ranked
    * (rounded score desc, token asc) so the cut is deterministic and
    * engine-replayable. Output: (id, token, tf, df, score). The corpus
    * size N rides along as a one-row broadcast, never a driver action.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1)
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(split(col(textCol), "\\s+")).as("token"))
    val tf = toks.groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("score",
        graft.functions.ColumnFunctions.pround(
          col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    scored
      .withColumn("__rn", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("score").desc, col("token"))))
      .filter(col("__rn") <= k)
      .select(col("id"), col("token"), col("tf"), col("df"), col("score"))
  }
}

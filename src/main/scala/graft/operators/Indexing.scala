package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    *
    * Every aggregation buffer here is bounded: occurrences collapse to
    * one (token, doc) row map-side; df/tf are scalar partial aggregates;
    * and the posting head is rank-filtered (`row_number <= postingCap`,
    * planned as a WindowGroupLimit that keeps per-group state at
    * postingCap on BOTH sides of its shuffle) before anything is
    * collected — a stopword present in every document of a 100 TB corpus
    * costs postingCap ids in the collect buffer, never all of them.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, postingCap: Int = 10): DataFrame = {
    require(minDf >= 1 && postingCap >= 1)
    statsTail(postingRows(docs, idCol, textCol), minDf, postingCap)
  }

  /** One (token, id, tf) row per distinct (doc, token) — the posting rows
    * every index artifact derives from; raw occurrences collapse in the
    * map-side partial aggregate. */
  private def postingRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), "\\s+")).as("token"))
      .groupBy(col("token"), col("id"))
      .agg(count(lit(1)).as("tf"))

  /** Posting rows → the index surface (token, doc_freq, total_tf,
    * postings_head), with the rank-bounded head (see [[invertedIndex]]). */
  private def statsTail(perDoc: DataFrame, minDf: Long, postingCap: Int): DataFrame = {
    val stats = perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("tf")).as("total_tf"))
      .filter(col("doc_freq") >= minDf)
    stats.join(postingHead(perDoc, postingCap), "token")
      .select(col("token"), col("doc_freq"), col("total_tf"), col("postings_head"))
  }

  private def postingHead(perDoc: DataFrame, postingCap: Int): DataFrame =
    perDoc
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("token")).orderBy(col("id"))))
      .filter(col("__rn") <= postingCap)
      .groupBy(col("token"))
      .agg(array_join(sort_array(collect_list(col("id"))), ",").as("postings_head"))

  /** Token → shard for the persisted store's layout. */
  private[operators] def shardOf(token: org.apache.spark.sql.Column, nShards: Int) =
    pmod(xxhash64(token), lit(nShards.toLong)).cast("int")

  /** Build a PERSISTED inverted index under `indexDir` — the index the
    * serving paths ([[indexStats]], [[indexLookup]],
    * [[Retrieval.bm25FromIndex]]) read so no caller ever re-tokenizes the
    * corpus. Layout (the reference's watermark loader is the analogous
    * append-only contract — load_mapreduce_output.py:36-119):
    *
    *  - `postings/` (token, id, tf) `partitionBy(shard)` where
    *    shard = xxhash64(token) mod nShards — a token's postings live in
    *    exactly one shard directory, so lookups prune to it;
    *  - `stats/`  per-generation (shard, token, df, ttf) segment rows,
    *    merged by sum at read (the Lucene-segment shape: appends never
    *    rewrite old files, readers fold segments);
    *  - `doclen/` (id, dl); `consts/` per-generation (n_docs, sum_dl);
    *  - `meta/`   (n_shards) — stamped so appends keep the layout.
    */
  def indexBuild(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, nShards: Int = 16): Unit = {
    require(nShards >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    postingRows(docs, idCol, textCol)
      .withColumn("shard", shardOf(col("token"), nShards))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$indexDir/postings")
    // derive the rest from the store: the tokenize+groupBy ran exactly once
    val stored = spark.read.parquet(s"$indexDir/postings")
    stored.groupBy(col("shard"), col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ttf"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$indexDir/stats")
    val dl = stored.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    dl.write.mode("overwrite").parquet(s"$indexDir/doclen")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$indexDir/consts")
    Seq(nShards).toDF("n_shards").write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  /** Absorb a NEW document batch into the persisted index without
    * rescanning the old corpus: the batch is tokenized once and its
    * posting/stat/doclen/const rows APPENDED — existing files are never
    * rewritten, and readers merge segments by sum. Append-only contract:
    * a doc id enters the index exactly once (re-ingesting would silently
    * double df/tf), enforced by a semi-join point lookup against the
    * stored doclens.
    */
  def indexAppend(batch: DataFrame, idCol: String, textCol: String,
      indexDir: String): Unit = {
    val spark = batch.sparkSession
    val nShards = spark.read.parquet(s"$indexDir/meta").head().getInt(0)
    val dupe = spark.read.parquet(s"$indexDir/doclen")
      .join(batch.select(col(idCol).cast("long").as("id")), Seq("id"), "left_semi")
    require(dupe.isEmpty,
      "indexAppend: batch contains doc ids already in the index — " +
        "the append-only contract forbids re-ingesting a document")
    // materialized once (batch-sized): four writes below must not each
    // re-run the tokenize+groupBy
    val p = postingRows(batch, idCol, textCol)
      .withColumn("shard", shardOf(col("token"), nShards))
      .localCheckpoint()
    p.write.mode("append").partitionBy("shard").parquet(s"$indexDir/postings")
    p.groupBy(col("shard"), col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ttf"))
      .write.mode("append").partitionBy("shard").parquet(s"$indexDir/stats")
    val dl = p.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    dl.write.mode("append").parquet(s"$indexDir/doclen")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("append").parquet(s"$indexDir/consts")
    p.unpersist()
  }

  /** Serve the [[invertedIndex]] surface from the persisted store:
    * df/ttf fold the per-generation stat segments by sum (never re-reading
    * text); the posting head is rank-bounded over the stored posting rows
    * exactly as the batch build. Equals [[invertedIndex]] over the union
    * of all ingested batches (law in IndexingSpec).
    */
  def indexStats(spark: SparkSession, indexDir: String, minDf: Long,
      postingCap: Int = 10): DataFrame = {
    require(minDf >= 1 && postingCap >= 1)
    val stats = spark.read.parquet(s"$indexDir/stats")
      .groupBy(col("token"))
      .agg(sum(col("df")).as("doc_freq"), sum(col("ttf")).as("total_tf"))
      .filter(col("doc_freq") >= minDf)
    val head = postingHead(
      spark.read.parquet(s"$indexDir/postings").select("token", "id", "tf"),
      postingCap)
    stats.join(head, "token")
      .select(col("token"), col("doc_freq"), col("total_tf"), col("postings_head"))
  }

  /** Compact the per-generation stat/const segments into one generation —
    * the Lucene-style merge a long-lived index runs after many appends.
    * Readers fold segments by sum, so correctness never degrades without
    * compaction; this just bounds the segment count. Postings are
    * untouched (their rows are disjoint across generations, not
    * overlapping segments).
    *
    * Crash safety: the merged tables are FULLY WRITTEN to a staging
    * directory first, then swapped in with two filesystem metadata ops
    * (delete + rename) — a crash mid-write leaves the live store intact,
    * and a crash between delete and rename leaves the complete staging
    * directory on disk to recover from. A transactional table format
    * supplies the fully atomic commit in production (the `io.Upsert`
    * caveat); an in-place overwrite would instead destroy the only copy
    * of the segments on a mid-write crash.
    */
  def indexCompact(spark: SparkSession, indexDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def swap(sub: String)(write: String => Unit): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/${sub}__compact_tmp")
      // crash recovery FIRST: if a previous run died between delete(live)
      // and rename, the staging dir holds the ONLY copy — promote it
      // before the cleanup below would erase it
      if (!fs.exists(live) && fs.exists(tmp))
        require(fs.rename(tmp, live),
          s"indexCompact: recovery rename of $tmp failed")
      fs.delete(tmp, true)
      write(tmp.toString)
      fs.delete(live, true)
      require(fs.rename(tmp, live), s"indexCompact: rename of $tmp failed")
    }
    swap("stats") { out =>
      spark.read.parquet(s"$indexDir/stats")
        .groupBy(col("shard"), col("token"))
        .agg(sum(col("df")).as("df"), sum(col("ttf")).as("ttf"))
        .write.partitionBy("shard").parquet(out)
    }
    swap("consts") { out =>
      spark.read.parquet(s"$indexDir/consts")
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
        .write.parquet(out)
    }
  }

  /** Point lookup of a (small) token set's postings. The probed shard
    * values are computed driver-side — bounded by nShards by construction
    * — so the static IN on the partition column prunes unconditionally,
    * the [[Similarity.ivfSearch]] cell-store pattern: the scan touches
    * only the probed shards' directories.
    */
  def indexLookup(spark: SparkSession, indexDir: String,
      tokens: Seq[String]): DataFrame = {
    import spark.implicits._
    val nShards = spark.read.parquet(s"$indexDir/meta").head().getInt(0)
    val t = tokens.toDF("token")
    val shards = t.select(shardOf(col("token"), nShards).as("s"))
      .distinct().collect().map(_.getInt(0))
    spark.read.parquet(s"$indexDir/postings")
      .filter(col("shard").isin(shards.map(Integer.valueOf).toIndexedSeq: _*))
      .join(broadcast(t), Seq("token"))
      .select(col("token"), col("id"), col("tf"))
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

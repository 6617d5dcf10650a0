package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval scoring over the corpus: BM25 top-k — the ranking
  * function behind the retrieval side of a training-data pipeline
  * (kNN-LM data selection, dedup candidate lookup by content, quality
  * audits of "what does the corpus say about X").
  *
  * Scale shape: statistics (tf, df, doc length, avgdl) are explode →
  * hash-aggregate pipelines with map-side partial combine; the query set
  * is small by construction and broadcast to the term-frequency table, so
  * the corpus is scanned once and only (query, candidate) pairs that
  * share at least one term materialize. Per-query top-k is a
  * WindowGroupLimit over that candidate set, never a global sort.
  * Robertson & Walker / Robertson-Spärck Jones BM25 (TREC-3, public);
  * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) — the Lucene-standard
  * non-negative variant.
  */
object Retrieval {

  /** Score every corpus document against every query document's term
    * multiset with BM25 and keep the top `k` per query (self-matches
    * excluded). Query terms are DISTINCT tokens of the query doc — the
    * standard bag-of-query-terms formulation.
    *
    * Output: (query_id, rank, doc_id, score), rank by rounded score desc
    * with doc_id tie-break so the cut is deterministic and
    * engine-replayable.
    */
  private def toks(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      explode(split(col(textCol), "\\s+")).as("token"))

  /** Shared scoring tail for the recompute and the served paths — same
    * code, so served scores equal recomputed scores structurally.
    * `tf`=(id, token, tf, dl) — dl rides WITH the term rows (the served
    * path stores it inline in the postings, so scoring never joins a
    * corpus-sized doc-length table), `dfT`=(token, df),
    * `consts`=(n_docs double, avgdl double), `qterms`=(query_id, token).
    */
  private def score(tf: DataFrame, dfT: DataFrame, consts: DataFrame,
      qterms: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    // df is vocabulary-sized — too big to broadcast at scale. Restrict it to
    // the query vocabulary first (semi-join against the tiny broadcast query
    // term set); THAT is broadcastable by construction.
    val qdf = dfT.join(broadcast(qterms.select(col("token")).distinct()), "token")
    val idf: Column = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm: Column = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf
      .join(broadcast(qterms), "token")
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(qdf), "token")
      .crossJoin(broadcast(consts))
      .groupBy(col("query_id"), col("id"))
      .agg(graft.functions.ColumnFunctions.pround(sum(idf * tfNorm), 4).as("score"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("id"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("doc_id"), col("score"))
  }

  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1 && k1 > 0 && b >= 0 && b <= 1)
    // one row per (doc, token) with its tf — the only shuffle over the corpus
    val tf = toks(docs, idCol, textCol).groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // corpus constants ride along as a one-row broadcast, never a collect;
    // avgdl as exact-integer sum ÷ count (not avg()) so every engine's
    // accumulation order produces the bit-identical double
    val consts = dl
      .agg(count(lit(1)).cast("double").as("n_docs"), sum(col("dl")).as("sdl"))
      .withColumn("avgdl", col("sdl").cast("double") / col("n_docs"))
      .drop("sdl")
    val qterms = toks(queries, idCol, textCol)
      .select(col("id").as("query_id"), col("token")).distinct()
    score(tf.join(dl, "id"), dfT, consts, qterms, k, k1, b)
  }

  /** BM25 served from the persisted inverted-index store
    * ([[Indexing.indexBuild]]/[[Indexing.indexAppend]]): tf AND dl come
    * from the stored postings (dl is inline, so no corpus-sized doc-length
    * join at query time) SHARD-PRUNED to the query vocabulary's shards
    * (probed shard values are driver-side by construction, bounded by
    * nShards — the IVF cell pattern), df folds the stored stat segments,
    * and the corpus constants fold the per-generation (n_docs, sum_dl)
    * rows — the corpus text is never re-tokenized and nothing outside the
    * probed shards is read beyond the one-row-per-generation consts.
    * df/dl/avgdl are exact for every query token because a token's rows
    * live entirely in its own shard. Scores equal [[bm25TopK]] over the
    * ingested corpus (RetrievalSpec).
    */
  def bm25FromIndex(spark: SparkSession, queries: DataFrame,
      idCol: String, textCol: String, indexDir: String, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1 && k1 > 0 && b >= 0 && b <= 1)
    // pinned as a driver-side local relation: the shard probe below and
    // the scoring join must see the SAME query evaluation — a
    // nondeterministic `queries` plan would otherwise probe shards for
    // one token set and score another, silently zeroing unprobed terms —
    // and unlike a checkpoint nothing stays pinned on executors
    val qterms = graft.functions.Frames.pinLocal(
      toks(queries, idCol, textCol)
        .select(col("id").as("query_id"), col("token")).distinct())
    val (nShards, _) = {
      val m = spark.read.parquet(s"$indexDir/meta")
      // pre-ck indexes fail LOUDLY instead of losing rows behind ckFilter
      graft.functions.Pushdown.requireLayout(m, indexDir)
      val r = m.select(col("n_shards"), col("head_cap")).head()
      (r.getInt(0), r.getInt(1))
    }
    val (shards, cks) = graft.functions.Pushdown.footprint(qterms,
      Indexing.shardOf(col("token"), nShards),
      graft.functions.Pushdown.ckOf(col("token")))
    // one manifest resolution — all three surfaces score the same snapshot.
    // Indexing.surface folds both store layouts (dir-partitioned
    // build/compaction generations + flat append segments) behind the
    // same shard filter: directory pruning on the former, a batch-sized
    // data filter on the latter. BELOW the shard, the query terms' ck
    // ranges push to parquet over the ck-sorted files, so even a probed
    // shard is read only around the query tokens' key ranges ([[graft
    // .functions.Pushdown]] — the joins in score() restore exactness)
    val gens = Generations.live(spark, indexDir)
    def pruned(sub: String) = Indexing.surface(spark, indexDir, sub, gens)
      .filter(col("shard").isin(shards.map(Integer.valueOf).toIndexedSeq: _*))
      .filter(graft.functions.Pushdown.ckFilter(cks))
    val tf = pruned("postings")
      .select(col("id"), col("token"), col("tf"), col("dl"))
    val dfT = pruned("stats")
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
    val consts = Generations.readSurface(spark, indexDir, "consts", gens)
      .agg(sum(col("n_docs")).cast("double").as("n_docs"),
        sum(col("sum_dl")).as("sdl"))
      .withColumn("avgdl", col("sdl").cast("double") / col("n_docs"))
      .drop("sdl")
    score(tf, dfT, consts, qterms, k, k1, b)
  }

  /** Two-stage hybrid retrieval: BM25 generates `candK` lexical
    * candidates per query, then an embedding-cosine rerank blends
    * `wLex · bm25/max_bm25(query) + wSem · cos(query_vec, cand_vec)` and
    * keeps the top `k` — the standard lexical-recall + semantic-precision
    * stack (RAG retrieval, kNN data selection). Candidates missing an
    * embedding score cosine 0 (lexical-only), never drop.
    *
    * Scale shape: stage 2 runs over queries×candK rows only; embeddings
    * are fetched by id semi-join (a point lookup — the corpus embedding
    * table is never scanned into the rerank), per-query max and top-k are
    * windows over the candidate set.
    *
    * Output: (query_id, rank, doc_id, bm25, cos_sim, hybrid).
    */
  def hybridRerank(docs: DataFrame, queries: DataFrame, embeddings: DataFrame,
      idCol: String, textCol: String, vecIdCol: String, vecCol: String,
      k: Int = 5, candK: Int = 20, wLex: Double = 0.5, wSem: Double = 0.5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1 && candK >= k)
    // pinned driver-side (queries×candK rows, broadcast-sized by
    // construction): the embedding-fetch key set and the rerank both
    // consume this, and it pins one evaluation of the (possibly
    // nondeterministic) queries plan instead of three — with no executor
    // checkpoint blocks left behind
    val cands = graft.functions.Frames.pinLocal(
      bm25TopK(docs, queries, idCol, textCol, candK, k1, b)
        .select(col("query_id"), col("doc_id"), col("score").as("bm25")))
    rerankTail(cands, embeddings, vecIdCol, vecCol, k, wLex, wSem)
  }

  /** [[hybridRerank]] with stage 1 SERVED from the persisted inverted
    * index ([[bm25FromIndex]]) instead of recomputed — the resident
    * retrieval service's shape: the corpus is tokenized zero times per
    * query; candidate generation reads only the probed shards, and the
    * rerank fetches only the candidates' embeddings. Results equal
    * [[hybridRerank]] over the ingested corpus (RetrievalSpec law).
    */
  def hybridRerankFromIndex(spark: SparkSession, queries: DataFrame,
      embeddings: DataFrame, idCol: String, textCol: String,
      vecIdCol: String, vecCol: String, indexDir: String,
      k: Int = 5, candK: Int = 20, wLex: Double = 0.5, wSem: Double = 0.5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1 && candK >= k)
    val cands = graft.functions.Frames.pinLocal(
      bm25FromIndex(spark, queries, idCol, textCol, indexDir, candK, k1, b)
        .select(col("query_id"), col("doc_id"), col("score").as("bm25")))
    rerankTail(cands, embeddings, vecIdCol, vecCol, k, wLex, wSem)
  }

  /** Stage 2 of the hybrid stack, shared by the recompute and served
    * paths: cosine blend + top-k over the (already driver-pinned)
    * candidate set. */
  private def rerankTail(cands: DataFrame, embeddings: DataFrame,
      vecIdCol: String, vecCol: String, k: Int, wLex: Double,
      wSem: Double): DataFrame = {
    import graft.functions.VectorFunctions.{asDouble, dot, l2Norm}
    val pr = graft.functions.ColumnFunctions.pround _
    val emb = embeddings.select(col(vecIdCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val wanted = cands.select(col("doc_id").as("id"))
      .union(cands.select(col("query_id").as("id"))).distinct()
    val embP = emb.join(wanted, Seq("id"), "left_semi")
    val withCos = cands
      .join(embP.select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("query_id"), "left_outer")
      .join(embP.select(col("id").as("doc_id"), col("v").as("dv"),
        col("nrm").as("dn")), Seq("doc_id"), "left_outer")
      // 0 for BOTH a missing embedding (null after the outer join) and a
      // zero-norm vector: 0/0 is NaN, coalesce would pass it through, and
      // NaN sorts as the LARGEST double in the desc rank — a zero vector
      // would claim rank 1
      .withColumn("cos_sim",
        when(col("qv").isNull || col("dv").isNull
            || col("qn") * col("dn") === 0, lit(0.0))
          .otherwise(dot(col("qv"), col("dv")) / (col("qn") * col("dn"))))
    val wMax = Window.partitionBy(col("query_id"))
    withCos
      .withColumn("hybrid", pr(
        lit(wLex) * col("bm25") / max(col("bm25")).over(wMax) +
          lit(wSem) * col("cos_sim"), 6))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("hybrid").desc, col("doc_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("bm25"),
        pr(col("cos_sim"), 6).as("cos_sim"), col("hybrid"))
  }
}

package graft.queries

import graft.Tables
import graft.operators.{Chunking, Components, Dedup, Indexing, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-pipeline operators, second wave: dup-cluster resolution,
  * token-budget mixing, index construction, passage-level dedup, TF-IDF
  * curation signals, shard assignment, per-source diversity. Every entry
  * is oracle-checked — the hash/window arithmetic is md5/instr/window
  * math that DuckDB replays verbatim.
  */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Parity round shadow — see RelationalQueries / ColumnFunctions.pround. */
  private def round(c: org.apache.spark.sql.Column, d: Int) =
    graft.functions.ColumnFunctions.pround(c, d)

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Dup-CLUSTER resolution: near-dup pair relations are not transitive,
    // so survivors are chosen per connected component of the pair graph.
    // Edges here are content-window fingerprint star edges (prefix +
    // middle window — overlapping windows chain A≈B≈C into one cluster);
    // components by distributed min-label propagation, O(diameter)
    // rounds. The oracle replays the closure with a recursive CTE.
    ("q101_dup_clusters", (s: SparkSession, d: String) => {
      Components.dupClusters(Tables.documents(s, d), "doc_id", "text")
    }, Some("""
      WITH RECURSIVE
      t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      e1 AS (SELECT doc_id AS src,
                    min(doc_id) OVER (PARTITION BY md5(array_to_string(w[1:8], ' '))) AS dst
             FROM t WHERE len(w) >= 8),
      e2 AS (SELECT doc_id AS src,
                    min(doc_id) OVER (PARTITION BY md5(array_to_string(w[5:12], ' '))) AS dst
             FROM t WHERE len(w) >= 12),
      ed AS (SELECT src, dst FROM e1 WHERE src <> dst
             UNION SELECT src, dst FROM e2 WHERE src <> dst),
      und AS (SELECT src, dst FROM ed UNION SELECT dst AS src, src AS dst FROM ed),
      r(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT u.dst, r.lbl FROM r JOIN und u ON u.src = r.id),
      cc AS (SELECT id, min(lbl) AS cluster_id FROM r GROUP BY id)
      SELECT id AS doc_id, cluster_id,
             count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM cc""")),

    // Token-budget quota per source: the mixing unit that matters for
    // pretraining is tokens, not rows — walk each source in md5 order and
    // keep rows starting before the 1000-token budget. One window per
    // stratum (parallel across sources), no global order.
    ("q102_token_budget", (s: SparkSession, d: String) => {
      Sampling.tokenBudgetTake(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")),
        "source", "doc_id", size(split(col("text"), "\\s+")), 1000L)
        .select(col("doc_id"), col("source"), col("n_tok"), col("start_tok"))
    }, Some("""
      WITH t AS (SELECT doc_id, source,
                        len(string_split_regex(text, '\s+')) AS n_tok,
                        md5(CAST(doc_id AS VARCHAR)) AS ord
                 FROM documents),
      c AS (SELECT doc_id, source, n_tok,
                   CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY ord, doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_tok
            FROM t)
      SELECT doc_id, source, n_tok, start_tok FROM c WHERE start_tok < 1000""")),

    // Inverted-index construction with capped posting heads — the
    // retrieval-side artifact of the corpus (serves dedup lookups and
    // audits). Explode → hash agg with map-side combine; rare tokens
    // dropped below min doc-freq as production indexes tier them.
    ("q103_inverted_index", (s: SparkSession, d: String) => {
      Indexing.invertedIndex(Tables.documents(s, d), "doc_id", "text",
        minDf = 50L, postingCap = 10)
    }, Some("""
      WITH tk AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
                  FROM documents),
      agg AS (SELECT token, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_tf,
                     array_to_string(list_sort(list(DISTINCT doc_id))[1:10], ',')
                       AS postings_head
              FROM tk GROUP BY token)
      SELECT token, doc_freq, total_tf, postings_head
      FROM agg WHERE doc_freq >= 50""")),

    // Passage-level dedup rate: chop each doc into 16-token passages
    // (q100's chunker, overlap 0), hash them, and report per doc how many
    // passages also appear verbatim in ANOTHER doc — the boilerplate /
    // template-contamination signal paragraph dedup pipelines act on.
    // The hot-passage side is bounded by actual duplication, so it
    // broadcast-joins back; the corpus is never re-shuffled.
    ("q104_passage_dedup", (s: SparkSession, d: String) => {
      val ch = Chunking.chunkDocuments(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 16, overlap = 0)
        .select(col("id"), md5(col("chunk")).as("h"))
      val hot = ch.groupBy(col("h"))
        .agg(countDistinct(col("id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("h"), lit(1L).as("dup"))
      ch.join(hot, Seq("h"), "left")
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_passages"),
          sum(coalesce(col("dup"), lit(0L))).as("n_shared"))
        .select(col("doc_id"), col("n_passages"), col("n_shared"),
          round(col("n_shared").cast("double") / col("n_passages"), 4)
            .as("shared_frac"))
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      c AS (SELECT doc_id, w, len(w) AS n,
                   CAST(floor((greatest(0, len(w) - 16) + 15) / 16.0) + 1 AS INT) AS n_chunks
            FROM t),
      e AS (SELECT doc_id, w, n, unnest(generate_series(0, n_chunks - 1)) AS k FROM c),
      p AS (SELECT doc_id,
                   md5(array_to_string(w[k*16 + 1 : least(k*16 + 16, n)], ' ')) AS h
            FROM e),
      hot AS (SELECT h, 1 AS dup FROM p GROUP BY h
              HAVING count(DISTINCT doc_id) >= 2)
      SELECT p.doc_id, count(*) AS n_passages,
             CAST(sum(coalesce(hot.dup, 0)) AS BIGINT) AS n_shared,
             round(sum(coalesce(hot.dup, 0)) * 1.0 / count(*), 4) AS shared_frac
      FROM p LEFT JOIN hot USING (h)
      GROUP BY p.doc_id""")),

    // Per-document top-3 TF-IDF terms (score = tf · ln(N/df)) — the
    // distinguishing-term surface curation review reads. Ranked on the
    // ROUNDED score with a token tie-break so the cut is deterministic
    // and engine-replayable; per-doc top-k is a WindowGroupLimit.
    ("q105_tfidf", (s: SparkSession, d: String) => {
      Indexing.tfIdfTopTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
    }, Some("""
      WITH tk AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
                  FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
                    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
             FROM tf JOIN df USING (token) CROSS JOIN n),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, token) AS rn FROM sc)
      SELECT doc_id, token, tf, df, score FROM r WHERE rn <= 3""")),

    // Deterministic global shuffle into training shards: shard = first
    // md5 hex digit of the salted id (16-way), position = rank within the
    // shard by full hash — reproducible on any cluster, and the windows
    // run per shard in parallel (no global sort, no single partition).
    ("q106_shuffle_shard", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("h"))
        .withColumn("shard",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1).cast("int"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
          .cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    }, Some("""
      WITH t AS (SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS h
                 FROM documents),
      s AS (SELECT doc_id, h,
                   CAST(instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS INTEGER) AS shard
            FROM t)
      SELECT doc_id, shard,
             row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
      FROM s""")),

    // Per-source token-distribution Shannon entropy + vocabulary size —
    // the corpus-diversity stat dataset cards report (a source whose
    // entropy collapses is template spam). Two hash aggs over (source,
    // token) counts; the raw token stream never crosses the wire twice.
    ("q107_source_entropy", (s: SparkSession, d: String) => {
      val toks = Tables.documents(s, d).select(col("source"),
        explode(split(col("text"), "\\s+")).as("token"))
      val c = toks.groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      val tot = c.groupBy(col("source")).agg(
        sum(col("c")).as("t"), count(lit(1)).as("nd"))
      c.join(tot, "source")
        .groupBy(col("source"))
        .agg(max(col("t")).as("n_tokens"),
          max(col("nd")).as("n_distinct_tokens"),
          round(-sum((col("c") / col("t")) * log(col("c") / col("t"))), 6)
            .as("token_entropy"))
    }, Some("""
      WITH tk AS (SELECT source, unnest(string_split_regex(text, '\s+')) AS token
                  FROM documents),
      c AS (SELECT source, token, count(*) AS c FROM tk GROUP BY source, token),
      tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t, count(*) AS nd
              FROM c GROUP BY source)
      SELECT c.source, max(tot.t) AS n_tokens, max(tot.nd) AS n_distinct_tokens,
             round(-sum((c.c * 1.0 / tot.t) * ln(c.c * 1.0 / tot.t)), 6)
               AS token_entropy
      FROM c JOIN tot USING (source) GROUP BY c.source""")),
    // Cluster-dedup policy over the verified MinHash-LSH pair graph: one
    // survivor per connected component (C4/FineWeb-style), vs q68's
    // pairwise local-minimum rule. Declared on the portable md5 banding —
    // the oracle replays banding, Jaccard verification AND the transitive
    // closure (recursive CTE), hash-checking the full per-doc cluster map.
    ("q108_cluster_dedup", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val cm = Dedup.dupClusterMap(docs, "doc_id", "text", threshold = 0.5)
        .withColumnRenamed("id", "doc_id")
      docs.join(cm, "doc_id")
        .select(col("doc_id"), col("cluster_id"), col("lang"), col("source"))
    }, Some("""
      WITH RECURSIVE
      keep AS (
        SELECT doc_id, lang, source, text FROM (
          SELECT doc_id, lang, source, text,
                 row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents)
        WHERE rn = 1),
      t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM keep),
      s AS (
        SELECT doc_id,
               CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[i+1:i+3], ' ')
                          for i in generate_series(0, len(w)-3)]
               END AS shs
        FROM t),
      sig AS (
        SELECT doc_id,
               [list_min([substr(md5(i::VARCHAR || ':' || sh), 1, 16) for sh in shs])
                for i in generate_series(0, 31)] AS sig
        FROM s),
      bd AS (
        SELECT doc_id, g.b AS band,
               md5(g.b::VARCHAR || ':' || array_to_string(sig[g.b*2+1:g.b*2+2], ',')) AS band_hash
        FROM sig, generate_series(0, 15) AS g(b)),
      cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM bd x JOIN bd y ON x.band = y.band AND x.band_hash = y.band_hash
        WHERE x.doc_id < y.doc_id),
      dd AS (SELECT doc_id, list_distinct(shs) AS sh FROM s),
      pr AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN dd da ON da.doc_id = c.id_a
        JOIN dd db ON db.doc_id = c.id_b
        WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(da.sh, db.sh))) >= 0.5),
      und AS (SELECT id_a AS src, id_b AS dst FROM pr
              UNION SELECT id_b AS src, id_a AS dst FROM pr),
      r(id, lbl) AS (
        SELECT doc_id, doc_id FROM keep
        UNION
        SELECT u.dst, rr.lbl FROM r rr JOIN und u ON u.src = rr.id),
      cc AS (SELECT id, min(lbl) AS cluster_id FROM r GROUP BY id)
      SELECT k.doc_id, cc.cluster_id, k.lang, k.source
      FROM keep k JOIN cc ON cc.id = k.doc_id""")),

    // Closed-form single-feature ridge (covar/var aggregates, no solver) —
    // the oracle-checked twin of the seeded MLlib pipeline (q60): DuckDB
    // replays slope/intercept/rmse/r2 from the same population moments.
    ("q109_ridge_closed_form", (s: SparkSession, d: String) => {
      graft.ml.RidgePipeline.closedFormSimpleRidge(
        Tables.lineitem(s, d), "l_quantity", "l_extendedprice", lambda = 1.0)
    }, Some("""
      WITH st AS (
        SELECT count(*) AS n, avg(x) AS ax, avg(y) AS ay,
               covar_pop(x, y) AS cxy, var_pop(x) AS vx, var_pop(y) AS vy
        FROM (SELECT CAST(l_quantity AS DOUBLE) AS x,
                     CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem)),
      co AS (SELECT n, ax, ay, cxy, vx, vy,
                    cxy / (vx + 1.0 / n) AS slope FROM st)
      SELECT n, round(slope, 4) AS slope,
             round(ay - slope * ax, 4) AS intercept,
             round(sqrt(greatest(vy - 2.0 * slope * cxy + slope * slope * vx,
                                 0.0)), 4) AS rmse,
             CASE WHEN vy = 0 THEN NULL
                  ELSE round(1.0 - greatest(vy - 2.0 * slope * cxy
                               + slope * slope * vx, 0.0) / vy, 6) END AS r2
      FROM co""")),

    // Per-vector int8 scalar quantization (the storage format IVF/SQ ANN
    // indexes keep instead of float32 — 4× smaller, cheap to scan):
    // codes = floor((x−min)/(max−min)·255 + 0.5), reconstruction error
    // reported per vector. Pure per-row HOF arithmetic (shuffle-free);
    // IEEE double ops replay bit-identically in DuckDB's list lambdas.
    ("q110_quantize_embeddings", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.Column
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
        array_min(col("embedding")).cast("double").as("vmin"),
        array_max(col("embedding")).cast("double").as("vmax"))
      val sc = col("vmax") - col("vmin")
      def recon(x: Column) =
        col("vmin") + floor((x.cast("double") - col("vmin")) / sc * lit(255.0)
          + lit(0.5)) / lit(255.0) * sc
      val se = aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + (x.cast("double") - recon(x)) * (x.cast("double") - recon(x)))
      emb.select(col("vec_id"),
        round(col("vmin"), 6).as("qmin"), round(col("vmax"), 6).as("qmax"),
        round(when(col("vmax") === col("vmin"), lit(0.0))
          .otherwise(se / size(col("embedding"))), 8).as("q_mse"))
    }, Some("""
      WITH b AS (SELECT vec_id, embedding,
                        CAST(list_min(embedding) AS DOUBLE) AS vmin,
                        CAST(list_max(embedding) AS DOUBLE) AS vmax
                 FROM embeddings)
      SELECT vec_id, round(vmin, 6) AS qmin, round(vmax, 6) AS qmax,
             round(CASE WHEN vmax = vmin THEN 0.0 ELSE
               list_sum(list_transform(embedding, x ->
                 (CAST(x AS DOUBLE) - (vmin + floor((CAST(x AS DOUBLE) - vmin)
                    / (vmax - vmin) * 255.0 + 0.5) / 255.0 * (vmax - vmin)))
                 * (CAST(x AS DOUBLE) - (vmin + floor((CAST(x AS DOUBLE) - vmin)
                    / (vmax - vmin) * 255.0 + 0.5) / 255.0 * (vmax - vmin)))))
               / len(embedding) END, 8) AS q_mse
      FROM b""")),
    // Per-source KL divergence from the corpus token distribution — the
    // drift signal a dataset card pairs with q107's entropy: a source
    // whose KL spikes is off-distribution (template spam, wrong language,
    // scraper breakage). p_c(token) > 0 whenever p_s(token) > 0 (the
    // corpus contains every source), so no smoothing term is needed.
    ("q112_kl_drift", (s: SparkSession, d: String) => {
      val toks = Tables.documents(s, d).select(col("source"),
        explode(split(col("text"), "\\s+")).as("token"))
      val cs = toks.groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      val ct = toks.groupBy(col("token")).agg(count(lit(1)).as("ct"))
      val ts = cs.groupBy(col("source")).agg(sum(col("c")).as("t"))
      val n = ct.agg(sum(col("ct")).as("n_total"))
      cs.join(ct, "token").join(ts, "source").crossJoin(broadcast(n))
        .groupBy(col("source"))
        .agg(max(col("t")).as("n_tokens"),
          round(sum((col("c") / col("t"))
            * log((col("c") / col("t")) / (col("ct") / col("n_total")))), 6)
            .as("kl_vs_corpus"))
    }, Some("""
      WITH tk AS (SELECT source, unnest(string_split_regex(text, '\s+')) AS token
                  FROM documents),
      cs AS (SELECT source, token, count(*) AS c FROM tk GROUP BY source, token),
      ct AS (SELECT token, count(*) AS ct FROM tk GROUP BY token),
      ts AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cs GROUP BY source),
      n AS (SELECT CAST(sum(ct) AS BIGINT) AS n_total FROM ct)
      SELECT cs.source, max(ts.t) AS n_tokens,
             round(sum((cs.c * 1.0 / ts.t)
               * ln((cs.c * 1.0 / ts.t) / (ct.ct * 1.0 / n.n_total))), 6)
               AS kl_vs_corpus
      FROM cs JOIN ct USING (token) JOIN ts USING (source) CROSS JOIN n
      GROUP BY cs.source""")),

    // IVF ANN search with the PORTABLE random-centroid coarse quantizer:
    // centroids = the 16 corpus vectors first in md5(id) order, assignment
    // and probe selection by nearest centroid with a cell-index tie-break.
    // Hash-checks the ENTIRE IVF search path (assignment, nProbe cell
    // selection, cell equi-join, per-query top-k) — the k-means quantizer
    // variant (q51) stays engine-native under the recall laws.
    ("q111_ann_ivf_portable", (s: SparkSession, d: String) => {
      import graft.operators.Similarity
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopKPortable(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4)
    }, Some("""
      WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ord AS (SELECT vec_id, v,
                     row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS rn
              FROM c),
      ctr AS (SELECT rn AS cell, v AS cv FROM ord WHERE rn < 16),
      asg AS (SELECT vec_id, v, cell FROM (
                SELECT c.vec_id, c.v, ctr.cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_distance(c.v, ctr.cv), ctr.cell) AS r
                FROM c CROSS JOIN ctr)
              WHERE r = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
      probe AS (SELECT query_id, qv, cell FROM (
                  SELECT q.query_id, q.qv, ctr.cell,
                         row_number() OVER (PARTITION BY q.query_id
                           ORDER BY list_distance(q.qv, ctr.cv), ctr.cell) AS r
                  FROM q CROSS JOIN ctr)
                WHERE r <= 4),
      scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_cosine_similarity(a.v, p.qv) AS cos
        FROM probe p JOIN asg a ON a.cell = p.cell
        WHERE a.vec_id != p.query_id),
      rk AS (SELECT query_id, neighbor_id, cos,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS rank
             FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
             round(cos, 6) AS cos_sim
      FROM rk WHERE rank <= 10""")),

    // EXACT SUBSTRING dedup (Lee et al. 2022 ExactSubstr as a relational
    // plan): every duplicated run of >= 8 tokens anywhere in the corpus
    // (self-repeats included), reported as per-document MAXIMAL spans.
    // Sliding windows are expanded INSIDE the row (transform over
    // sequence + slice — no shuffle), duplicated window hashes are one
    // corpus-token-sized groupBy, and overlapping hit windows merge into
    // spans by gaps-and-islands per document. The oracle replays the
    // same windows/merge with DuckDB list slicing; hashes differ
    // (xxhash64 vs md5) but only equality is consumed.
    ("q150_dup_spans", (s: SparkSession, d: String) => {
      Dedup.duplicatedSpans(Tables.documents(s, d), "doc_id", "text",
        windowN = 8)
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                 FROM documents),
      e AS (SELECT doc_id, w, unnest(generate_series(0, len(w) - 8)) AS pos
            FROM t WHERE len(w) >= 8),
      wn AS (SELECT doc_id, pos,
                    md5(array_to_string(w[pos + 1 : pos + 8], ' ')) AS h
             FROM e),
      hot AS (SELECT h FROM wn GROUP BY h HAVING count(*) >= 2),
      hits AS (SELECT doc_id, pos FROM wn JOIN hot USING (h)),
      g AS (SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                                  ORDER BY pos) > 8
                        THEN 1 ELSE 0 END AS brk
            FROM hits),
      i AS (SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM g)
      SELECT doc_id, min(pos) AS span_start,
             max(pos) + 7 AS span_end, count(*) AS n_windows
      FROM i GROUP BY doc_id, island""")),
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}

package graft.queries

import graft.Tables
import graft.operators.{Components, Decontaminate, LinkAnalysis, Packing, Retrieval}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-analysis wave 4 (round 6): two-stage hybrid retrieval
  * (BM25 → embedding-cosine rerank), curriculum batching by distributed
  * global rank, power-iteration PageRank over the dup-cluster star graph,
  * and the cross-source n-gram containment matrix. Every entry is
  * oracle-checked: the arithmetic is join/window/closed-form math DuckDB
  * replays verbatim (PageRank's three rounds are unrolled in the SQL).
  */
object AnalysisQueries {

  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Hybrid rerank: BM25 top-10 candidates per query doc (docs 0-2),
    // blended 50/50 with embedding cosine (doc_id ↔ vec_id), top-5 kept.
    // The rerank runs over queries×10 rows; embeddings fetched by id.
    ("q121_hybrid_rerank", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      Retrieval.hybridRerank(docs, docs.filter(col("doc_id") < 3),
        Tables.table(s, d, "embeddings"), "doc_id", "text", "vec_id",
        "embedding", k = 5, candK = 10)
    }, Some("""
      WITH tk AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
                  FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      co AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
             FROM dl),
      q AS (SELECT DISTINCT doc_id AS query_id, token FROM tk WHERE doc_id < 3),
      sc AS (
        SELECT q.query_id, tf.doc_id,
               round(sum(ln(1.0 + (co.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * (1.2 + 1.0))
                 / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / co.avgdl))), 4)
                 AS score
        FROM tf JOIN q USING (token) JOIN df USING (token)
        JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN co
        WHERE tf.doc_id <> q.query_id
        GROUP BY q.query_id, tf.doc_id),
      rk AS (SELECT query_id, doc_id, score,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, doc_id) AS rank
             FROM sc),
      cand AS (SELECT query_id, doc_id, score AS bm25 FROM rk WHERE rank <= 10),
      emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cosd AS (SELECT c.query_id, c.doc_id, c.bm25,
                      CASE WHEN eq.v IS NULL OR ed.v IS NULL
                             OR list_dot_product(eq.v, eq.v)
                                * list_dot_product(ed.v, ed.v) = 0
                           THEN 0
                           ELSE list_cosine_similarity(eq.v, ed.v) END AS cos_raw
               FROM cand c
               LEFT JOIN emb eq ON eq.vec_id = c.query_id
               LEFT JOIN emb ed ON ed.vec_id = c.doc_id),
      hy AS (SELECT query_id, doc_id, bm25, cos_raw,
                    round(0.5 * bm25 / max(bm25) OVER (PARTITION BY query_id)
                          + 0.5 * cos_raw, 6) AS hybrid
             FROM cosd),
      hr AS (SELECT query_id, doc_id, bm25, cos_raw, hybrid,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY hybrid DESC, doc_id) AS rnk
             FROM hy)
      SELECT query_id, CAST(rnk AS INTEGER) AS rank, doc_id, bm25,
             round(cos_raw, 6) AS cos_sim, hybrid
      FROM hr WHERE rnk <= 5""")),

    // Length-curriculum batching: global rank by (token count, doc_id)
    // via the two-phase distributed prefix sum — never a single-partition
    // corpus sort — cut into 64-doc training batches.
    ("q122_curriculum", (s: SparkSession, d: String) => {
      Packing.curriculumBatches(Tables.documents(s, d), "doc_id",
        size(split(col("text"), "\\s+")), batchSize = 64)
    }, Some("""
      WITH t AS (SELECT doc_id,
                        len(string_split_regex(text, '\s+')) AS order_key
                 FROM documents),
      r AS (SELECT doc_id, CAST(order_key AS BIGINT) AS order_key,
                   CAST(row_number() OVER (ORDER BY order_key, doc_id) - 1
                     AS BIGINT) AS global_pos
            FROM t)
      SELECT doc_id, order_key, global_pos,
             global_pos // 64 AS batch_id, global_pos % 64 AS pos_in_batch
      FROM r""")),

    // PageRank (3 power-iteration rounds, damping 0.85, dangling mass
    // redistributed) over the q101 fingerprint star graph — hub
    // centrality for canonical-survivor selection. The oracle unrolls the
    // three rounds; (1 − 0.85) is computed in DOUBLE space on both
    // engines (a decimal-literal 0.15 is a different double).
    ("q123_pagerank", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      LinkAnalysis.pageRank(docs.select(col("doc_id").as("id")),
        Components.fingerprintEdges(docs, "doc_id", "text"), iters = 3)
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      e1 AS (SELECT doc_id AS src,
                    min(doc_id) OVER (PARTITION BY md5(array_to_string(w[1:8], ' '))) AS dst
             FROM t WHERE len(w) >= 8),
      e2 AS (SELECT doc_id AS src,
                    min(doc_id) OVER (PARTITION BY md5(array_to_string(w[5:12], ' '))) AS dst
             FROM t WHERE len(w) >= 12),
      ed AS (SELECT src, dst FROM e1 WHERE src <> dst
             UNION SELECT src, dst FROM e2 WHERE src <> dst),
      v AS (SELECT doc_id AS id FROM documents),
      nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
      r0 AS (SELECT id, 1.0 / nv.n AS r FROM v CROSS JOIN nv),
      d0 AS (SELECT COALESCE(sum(r.r), 0) AS dm FROM r0 r
             LEFT JOIN dg ON r.id = dg.src WHERE dg.src IS NULL),
      c0 AS (SELECT e.dst AS id, sum(r.r / dg.deg) AS s
             FROM ed e JOIN r0 r ON r.id = e.src JOIN dg ON dg.src = e.src
             GROUP BY e.dst),
      r1 AS (SELECT v.id,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nv.n
                      + CAST(0.85 AS DOUBLE) * (COALESCE(c.s, 0) + dx.dm / nv.n) AS r
             FROM v CROSS JOIN nv CROSS JOIN d0 dx
             LEFT JOIN c0 c ON c.id = v.id),
      d1 AS (SELECT COALESCE(sum(r.r), 0) AS dm FROM r1 r
             LEFT JOIN dg ON r.id = dg.src WHERE dg.src IS NULL),
      c1 AS (SELECT e.dst AS id, sum(r.r / dg.deg) AS s
             FROM ed e JOIN r1 r ON r.id = e.src JOIN dg ON dg.src = e.src
             GROUP BY e.dst),
      r2 AS (SELECT v.id,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nv.n
                      + CAST(0.85 AS DOUBLE) * (COALESCE(c.s, 0) + dx.dm / nv.n) AS r
             FROM v CROSS JOIN nv CROSS JOIN d1 dx
             LEFT JOIN c1 c ON c.id = v.id),
      d2 AS (SELECT COALESCE(sum(r.r), 0) AS dm FROM r2 r
             LEFT JOIN dg ON r.id = dg.src WHERE dg.src IS NULL),
      c2 AS (SELECT e.dst AS id, sum(r.r / dg.deg) AS s
             FROM ed e JOIN r2 r ON r.id = e.src JOIN dg ON dg.src = e.src
             GROUP BY e.dst),
      r3 AS (SELECT v.id,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nv.n
                      + CAST(0.85 AS DOUBLE) * (COALESCE(c.s, 0) + dx.dm / nv.n) AS r
             FROM v CROSS JOIN nv CROSS JOIN d2 dx
             LEFT JOIN c2 c ON c.id = v.id)
      SELECT id, round(r, 6) AS pagerank FROM r3""")),

    // Cross-source 8-gram containment matrix: fraction of each source's
    // distinct grams also present in every other source — the
    // mirror/syndication overlap table. Per-gram join fanout is bounded
    // by the source count, never by gram frequency.
    ("q124_containment", (s: SparkSession, d: String) => {
      Decontaminate.crossSourceContainment(Tables.documents(s, d),
        "source", "text", n = 8)
    }, Some("""
      WITH sh AS (
        SELECT source,
               list_distinct(CASE WHEN len(w) <= 8 THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[i+1:i+8], ' ')
                          for i in generate_series(0, len(w)-8)]
               END) AS gs
        FROM (SELECT source, string_split_regex(text, '\s+') AS w FROM documents)),
      g AS (SELECT DISTINCT source AS stratum, unnest(gs) AS g FROM sh),
      sz AS (SELECT stratum, count(*) AS n_grams_a FROM g GROUP BY stratum),
      sharedp AS (SELECT a.stratum AS source_a, b.stratum AS source_b,
                         count(*) AS n_shared
                  FROM g a JOIN g b USING (g)
                  WHERE a.stratum <> b.stratum
                  GROUP BY a.stratum, b.stratum)
      SELECT s.source_a, s.source_b, z.n_grams_a, s.n_shared,
             round(s.n_shared * 1.0 / z.n_grams_a, 4) AS containment
      FROM sharedp s JOIN sz z ON z.stratum = s.source_a""")),
    // Tokenizer-vocabulary coverage: OOV rate per document against the
    // corpus top-1000 token vocabulary (deterministic cut: count desc,
    // token asc) — the coverage check run before committing a tokenizer.
    // The vocab side is a TakeOrdered 1000-row broadcast; the corpus
    // streams through one hash join + per-doc aggregate.
    ("q125_oov_rate", (s: SparkSession, d: String) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("token")).limit(1000)
        .select(col("token"), lit(1L).as("iv"))
      toks.join(broadcast(vocab), Seq("token"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("iv"), lit(0L))).as("n_in_vocab"))
        .select(col("doc_id"), col("n_tokens"), col("n_in_vocab"),
          graft.functions.ColumnFunctions.pround(
            lit(1.0) - col("n_in_vocab").cast("double") / col("n_tokens"), 4)
            .as("oov_rate"))
    }, Some("""
      WITH tk AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
                  FROM documents),
      vc AS (SELECT token FROM (
               SELECT token, count(*) AS c FROM tk GROUP BY token
               ORDER BY c DESC, token LIMIT 1000)),
      j AS (SELECT t.doc_id,
                   CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS hit
            FROM tk t LEFT JOIN vc v USING (token))
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(hit) AS BIGINT) AS n_in_vocab,
             round(1.0 - sum(hit) * 1.0 / count(*), 4) AS oov_rate
      FROM j GROUP BY doc_id""")),

    // Distribution-rank window breadth: NTILE deciles, percent_rank,
    // cume_dist and first_value over per-source length order — the
    // remaining rank-family functions not exercised by q19/q59/q88.
    // Per-source windows parallelize across sources; no global order.
    ("q126_rank_functions", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_tok"), col("doc_id"))
      val pr = graft.functions.ColumnFunctions.pround _
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tok"))
        .withColumn("decile", ntile(10).over(w))
        .withColumn("pct_rank", pr(percent_rank().over(w), 6))
        .withColumn("cume", pr(cume_dist().over(w), 6))
        .withColumn("shortest_doc", first_value(col("doc_id")).over(w))
    }, Some("""
      WITH t AS (SELECT doc_id, source,
                        CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
                          AS n_tok
                 FROM documents)
      SELECT doc_id, source, n_tok,
             CAST(ntile(10) OVER w AS INTEGER) AS decile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume,
             first_value(doc_id) OVER w AS shortest_doc
      FROM t
      WINDOW w AS (PARTITION BY source ORDER BY n_tok, doc_id)""")),
    // Contamination SPAN localization: for each doc sharing 8-grams with
    // the benchmark set (q95's convention), WHERE the overlap sits —
    // first/last hit position and the covered span fraction. The fix for
    // a contaminated doc is often to cut the span, not drop the doc.
    // Same broadcast shape as q95; positions ride the explode for free.
    ("q129_contamination_span", (s: SparkSession, d: String) => {
      import graft.functions.TextFunctions.shingles
      val docs = Tables.documents(s, d)
      // ONE shingle evaluation, one explode, one aggregation: n_grams
      // falls out of max(pos)+1, hit positions out of conditional
      // min/max — a separate size() branch would re-evaluate the gram
      // array per row (measured 3× slower)
      val grams = docs.select(col("doc_id"),
        posexplode(shingles(col("text"), 8)).as(Seq("pos", "g")))
      val bg = docs.filter(col("doc_id") % 97 === 0)
        .select(explode(array_distinct(shingles(col("text"), 8))).as("g"))
        .distinct()
        .withColumn("hit", lit(1L))
      val hitPos = when(col("hit") === 1L, col("pos"))
      // the bench side is DERIVED from the corpus (doc_id % 97), so its
      // size is corpus-proportional in the worst case: broadcast only
      // under the cap, degrade to a shuffle join above it
      grams.join(Decontaminate.sizeBoundedBench(bg), Seq("g"), "left_outer")
        .groupBy(col("doc_id"))
        .agg((max(col("pos")) + 1).cast("long").as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          (min(hitPos) + 1).cast("long").as("first_hit"),
          (max(hitPos) + 1).cast("long").as("last_hit"))
        .filter(col("n_hits") > 0)
        .withColumn("span_frac", graft.functions.ColumnFunctions.pround(
          (col("last_hit") - col("first_hit") + 1).cast("double") / col("n_grams"), 4))
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
               CASE WHEN len(w) <= 8 THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[i+1:i+8], ' ')
                          for i in generate_series(0, len(w)-8)]
               END AS gs
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents)),
      g AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams, unnest(gs) AS g,
                   CAST(unnest(generate_series(1, len(gs))) AS BIGINT) AS i
            FROM sh),
      bg AS (SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id % 97 = 0)
      SELECT g.doc_id, max(g.n_grams) AS n_grams, count(*) AS n_hits,
             min(g.i) AS first_hit, max(g.i) AS last_hit,
             round((max(g.i) - min(g.i) + 1) * 1.0 / max(g.n_grams), 4) AS span_frac
      FROM g JOIN bg USING (g) GROUP BY g.doc_id""")),

    // Per-source quality gate: each source's own p10 token-count cutoff
    // (exact interpolated percentile, engine-parity per q71) and which
    // docs fall below it — per-source thresholds are the curation norm
    // because length distributions differ wildly across sources.
    ("q130_quality_gate", (s: SparkSession, d: String) => {
      val t = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tok"))
      val cut = t.groupBy(col("source"))
        .agg(expr("percentile(n_tok, 0.1)").as("p10"))
      t.join(broadcast(cut), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tok"),
          graft.functions.ColumnFunctions.pround(col("p10"), 4).as("p10"),
          (col("n_tok") < col("p10")).as("below_gate"))
    }, Some("""
      WITH t AS (SELECT doc_id, source,
                        CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
                 FROM documents),
      c AS (SELECT source, quantile_cont(n_tok, 0.1) AS p10 FROM t GROUP BY source)
      SELECT t.doc_id, t.source, t.n_tok, round(c.p10, 4) AS p10,
             (t.n_tok < c.p10) AS below_gate
      FROM t JOIN c USING (source)""")),
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}

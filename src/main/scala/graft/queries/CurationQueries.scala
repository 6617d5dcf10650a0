package graft.queries

import graft.Tables
import graft.operators.{Decontaminate, History, Indexing, Retrieval, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-pipeline operators, third wave: retrieval scoring (BM25),
  * distribution health (Zipf fit), CDC warehouse history (SCD2),
  * cross-split n-gram novelty, temperature-scaled mixing, and
  * time-decayed engagement. Every entry is oracle-checked — the
  * arithmetic is md5/window/closed-form-moment math DuckDB replays
  * verbatim.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // BM25 top-10 per query doc (query terms = distinct tokens of docs
    // 0-2) — the retrieval ranking behind content-based dedup lookups and
    // corpus audits. Hash-checks idf, length normalization, candidate
    // generation and the per-query WindowGroupLimit.
    ("q113_bm25", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      Retrieval.bm25TopK(docs, docs.filter(col("doc_id") < 3),
        "doc_id", "text", k = 10)
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
             FROM sc)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score
      FROM rk WHERE rank <= 10""")),

    // Per-source Zipf fit over the top-100 tokens: slope ≈ -1 is healthy
    // natural language; collapse is template spam. Closed-form population
    // moments so the OLS replays in any engine.
    ("q114_zipf_slope", (s: SparkSession, d: String) => {
      Indexing.zipfFit(Tables.documents(s, d), "source", "text", topN = 100)
        .withColumnRenamed("stratum", "source")
    }, Some("""
      WITH tk AS (SELECT source, unnest(string_split_regex(text, '\s+')) AS token
                  FROM documents),
      c AS (SELECT source, token, count(*) AS c FROM tk GROUP BY source, token),
      rk AS (SELECT source, c, token,
                    row_number() OVER (PARTITION BY source
                      ORDER BY c DESC, token) AS rank
             FROM c),
      pts AS (SELECT source, ln(CAST(rank AS DOUBLE)) AS x,
                     ln(CAST(c AS DOUBLE)) AS y
              FROM rk WHERE rank <= 100),
      f AS (SELECT source, count(*) AS n_top, covar_pop(y, x) AS cxy,
                   var_pop(x) AS vx, var_pop(y) AS vy
            FROM pts GROUP BY source)
      SELECT source, n_top, round(cxy / vx, 6) AS zipf_slope,
             round(cxy * cxy / (vx * vy), 6) AS zipf_r2
      FROM f""")),

    // SCD2 dimension history from the event log: one row per run of an
    // unchanged per-user event_type, with [valid_from, valid_to) bounds
    // and a current flag — CDC ingestion's warehouse-side artifact.
    // Bounds rendered to second precision strings for engine parity.
    ("q115_scd2", (s: SparkSession, d: String) => {
      History.scd2(Tables.events(s, d), "user_id", "event_type", "ts", "event_id")
        .select(col("user_id"), col("version"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("n_events"), col("is_current"))
    }, Some("""
      WITH o AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                      OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      v AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS version
            FROM o),
      r AS (SELECT user_id, version, max(event_type) AS event_type,
                   min(ts) AS vf, count(*) AS n_events
            FROM v GROUP BY user_id, version),
      f AS (SELECT user_id, version, event_type, vf, n_events,
                   lead(vf) OVER (PARTITION BY user_id ORDER BY version) AS vt
            FROM r)
      SELECT user_id, version, event_type,
             strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
             strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
             n_events, (vt IS NULL) AS is_current
      FROM f""")),

    // Cross-split 3-gram novelty of the val split vs train (q99's
    // content-hash split): the residual near-duplicate leakage measure —
    // how much of each val doc a model could have seen verbatim.
    ("q116_ngram_novelty", (s: SparkSession, d: String) => {
      val split = Sampling.leakageSafeSplit(Tables.documents(s, d), "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      Decontaminate.crossSplitNovelty(
        split.filter(col("split") === "val"),
        split.filter(col("split") === "train"),
        "doc_id", "text", n = 3)
    }, Some("""
      WITH sp AS (SELECT doc_id, text,
                    CASE WHEN substr(md5(text), 1, 8) < 'cccccccc' THEN 'train'
                         WHEN substr(md5(text), 1, 8) < 'e6666666' THEN 'val'
                         ELSE 'test' END AS split
                  FROM documents),
      g AS (SELECT doc_id, split,
                   list_distinct(list_transform(
                     generate_series(1, greatest(1, len(w) - 2)),
                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS gs
            FROM (SELECT doc_id, split,
                         string_split_regex(text, '\s+') AS w FROM sp)),
      vg AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS gr
             FROM g WHERE split = 'val'),
      tg AS (SELECT DISTINCT gr FROM
               (SELECT unnest(gs) AS gr FROM g WHERE split = 'train')),
      j AS (SELECT vg.doc_id, vg.n_grams,
                   CASE WHEN tg.gr IS NULL THEN 0 ELSE 1 END AS hit
            FROM vg LEFT JOIN tg USING (gr))
      SELECT doc_id, max(n_grams) AS n_grams,
             CAST(sum(hit) AS BIGINT) AS n_seen,
             round(1.0 - sum(hit) * 1.0 / max(n_grams), 4) AS novelty
      FROM j GROUP BY doc_id""")),

    // Temperature-scaled source mixing (alpha = 1/T = 0.5, mT5-style):
    // token-weighted natural shares, rebalanced weights, and expected
    // epochs per source at a 200k-token budget — the pre-training recipe
    // table every run signs off on.
    ("q117_mix_temperature", (s: SparkSession, d: String) => {
      Sampling.temperatureWeights(Tables.documents(s, d), "source",
        size(split(col("text"), "\\s+")), alpha = 0.5, budgetTokens = 200000L)
    }, Some("""
      WITH c AS (SELECT source,
                        CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
                          AS n_tokens
                 FROM documents GROUP BY source),
      t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS n_total,
                   sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS z
            FROM c)
      SELECT c.source, c.n_tokens,
             round(c.n_tokens / t.n_total, 6) AS natural_frac,
             round(pow(CAST(c.n_tokens AS DOUBLE), 0.5) / t.z, 6) AS mix_frac,
             round(pow(CAST(c.n_tokens AS DOUBLE), 0.5) / t.z * 200000
               / c.n_tokens, 6) AS epochs_at_budget
      FROM c CROSS JOIN t""")),

    // Per-user exponentially time-decayed engagement value (tau = 7 days
    // against the corpus max timestamp) — the recency weighting feature
    // stores compute over event streams.
    ("q118_decay", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
      val tmax = ev.agg(max(unix_millis(col("ts"))).as("ms_max"))
      ev.select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
        .crossJoin(broadcast(tmax))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          graft.functions.ColumnFunctions.pround(
            sum(col("value") *
              exp(-((col("ms_max") - col("ms")) / lit(86400000.0)) / lit(7.0))), 4)
            .as("decayed_value"))
    }, Some("""
      WITH m AS (SELECT epoch_ms(max(ts)) AS ms_max FROM events)
      SELECT user_id, count(*) AS n_events,
             round(sum(value
               * exp(-((m.ms_max - epoch_ms(ts)) / 86400000.0) / 7.0)), 4)
               AS decayed_value
      FROM events CROSS JOIN m GROUP BY user_id""")),
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}

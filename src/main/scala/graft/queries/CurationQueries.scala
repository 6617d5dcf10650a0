package graft.queries

import graft.Tables
import graft.operators.{Decontaminate, History, Indexing, Retrieval, Sampling, UrlOps}
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

    // URL CANONICALIZATION (CCNet/C4/RefinedWeb stage zero) — documents
    // carry no URL, so each doc gets a deterministic one exercising every
    // branch: uppercase scheme/host, "WWW." prefix, a ccTLD needing the
    // three-label registrable rule, default vs non-default ports crossed
    // against both schemes, a trailing slash, tracking params out of
    // order, a fragment. The Spark side genuinely parses the string
    // (UrlOps.canonicalize — pure codegen'd Column ops); the oracle
    // derives the canonical form from the formula, q161-style.
    ("q171_url_canon", (s: SparkSession, d: String) => {
      val id = col("doc_id")
      val url = concat(
        when(id % 2 === 0, lit("HTTP")).otherwise(lit("https")), lit("://"),
        when(id % 7 === 0, lit("WWW.")).otherwise(lit("")),
        lit("Sub"), (id % 3).cast("string"),
        lit(".site"), (id % 10).cast("string"),
        when(id % 6 === 0, lit(".CO.UK")).otherwise(lit(".com")),
        when(id % 5 === 0, lit(":80"))
          .when(id % 5 === 1, lit(":443"))
          .when(id % 5 === 2, lit(":8080")).otherwise(lit("")),
        lit("/Dir/"), (id % 40).cast("string"),
        when(id % 4 === 0, lit("/")).otherwise(lit("")),
        when(id % 3 === 0, lit("?utm_source=rss&b=2&a=1"))
          .when(id % 3 === 1, lit("?z=9&a=1&gclid=x")).otherwise(lit("")),
        when(id % 4 === 0, lit("#Sec")).otherwise(lit("")))
      Tables.documents(s, d).select(id, url.as("url"))
        .select(id, col("url"),
          UrlOps.canonicalize(col("url")).as("canon_url"),
          UrlOps.hostOf(col("url")).as("host"),
          UrlOps.registrableDomain(UrlOps.hostOf(col("url"))).as("domain"))
    }, Some("""
      WITH u AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END ||
                 '://' ||
                 CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END ||
                 'Sub' || CAST(doc_id % 3 AS VARCHAR) ||
                 '.site' || CAST(doc_id % 10 AS VARCHAR) ||
                 CASE WHEN doc_id % 6 = 0 THEN '.CO.UK' ELSE '.com' END ||
                 CASE WHEN doc_id % 5 = 0 THEN ':80'
                         WHEN doc_id % 5 = 1 THEN ':443'
                         WHEN doc_id % 5 = 2 THEN ':8080' ELSE '' END ||
                 '/Dir/' || CAST(doc_id % 40 AS VARCHAR) ||
                 CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
                 CASE WHEN doc_id % 3 = 0 THEN '?utm_source=rss&b=2&a=1'
                         WHEN doc_id % 3 = 1 THEN '?z=9&a=1&gclid=x'
                         ELSE '' END ||
                 CASE WHEN doc_id % 4 = 0 THEN '#Sec' ELSE '' END AS url,
               'sub' || CAST(doc_id % 3 AS VARCHAR) ||
                 '.site' || CAST(doc_id % 10 AS VARCHAR) ||
                 CASE WHEN doc_id % 6 = 0 THEN '.co.uk' ELSE '.com' END
                 AS host
        FROM documents)
      SELECT doc_id, url,
             CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END ||
               '://' || host ||
               CASE WHEN doc_id % 5 = 0 AND doc_id % 2 = 1 THEN ':80'
                       WHEN doc_id % 5 = 1 AND doc_id % 2 = 0 THEN ':443'
                       WHEN doc_id % 5 = 2 THEN ':8080' ELSE '' END ||
               '/Dir/' || CAST(doc_id % 40 AS VARCHAR) ||
               CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2'
                       WHEN doc_id % 3 = 1 THEN '?a=1&z=9' ELSE '' END
               AS canon_url,
             host,
             'site' || CAST(doc_id % 10 AS VARCHAR) ||
               CASE WHEN doc_id % 6 = 0 THEN '.co.uk' ELSE '.com' END
               AS domain
      FROM u""")),

    // CANONICAL-URL DEDUP (re-crawl collapse): five fetches per resource
    // (scheme varies, a unique utm_ param varies, "www." varies — all
    // canonicalized away), one survivor per scheme-relative resource key,
    // https preferred, then first fetch. The oracle replays the election.
    ("q172_url_dedup", (s: SparkSession, d: String) => {
      val id = col("doc_id")
      // Collision key is id % 100 (via %4 × %25); scheme rides id % 3 so
      // every group mixes https and http and the preference is live.
      val url = concat(
        when(id % 3 === 0, lit("https")).otherwise(lit("http")), lit("://"),
        when(id % 7 === 0, lit("www.")).otherwise(lit("")),
        lit("d"), (id % 4).cast("string"), lit(".example.com/p/"),
        (id % 25).cast("string"),
        when(id % 2 === 0,
          concat(lit("?utm_campaign=c"), id.cast("string")))
          .otherwise(lit("")))
      UrlOps.urlDedup(
        Tables.documents(s, d).select(id, url.as("url")), "url", "doc_id")
        .withColumnRenamed("kept_id", "kept_doc_id")
        .orderBy(col("resource_key"))
    }, Some("""
      WITH u AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'https' ELSE 'http' END AS scheme,
               'd' || CAST(doc_id % 4 AS VARCHAR) || '.example.com/p/' ||
                 CAST(doc_id % 25 AS VARCHAR) AS rkey
        FROM documents),
      r AS (SELECT doc_id, rkey,
                   row_number() OVER (PARTITION BY rkey
                     ORDER BY CASE WHEN scheme = 'https' THEN 1 ELSE 0 END DESC,
                              doc_id) AS rn,
                   count(*) OVER (PARTITION BY rkey) AS n_dups
            FROM u)
      SELECT rkey AS resource_key, doc_id AS kept_doc_id, n_dups
      FROM r WHERE rn = 1 ORDER BY resource_key""")),

    // PER-DOMAIN CAP (RefinedWeb's anti-SEO share bound): hosts fan out
    // over 13 subdomains of 6 registrable domains (two needing the
    // three-label ccTLD rule), keep the first 20 docs per domain. The
    // oracle replays the registrable-domain fold and the ranked keep.
    ("q173_domain_cap", (s: SparkSession, d: String) => {
      val id = col("doc_id")
      val base = when(id % 6 === 0, lit("alpha.co.uk"))
        .when(id % 6 === 1, lit("beta.com"))
        .when(id % 6 === 2, lit("gamma.net"))
        .when(id % 6 === 3, lit("delta.org"))
        .when(id % 6 === 4, lit("epsilon.ac.jp"))
        .otherwise(lit("zeta.io"))
      val url = concat(lit("https://h"), (id % 13).cast("string"), lit("."),
        base, lit("/x/"), id.cast("string"))
      UrlOps.domainCap(
        Tables.documents(s, d).select(id, url.as("url")), "url", "doc_id",
        maxDocs = 20)
        .withColumn("domain_rank", col("domain_rank").cast("int"))
        .orderBy(col("domain"), col("domain_rank"))
    }, Some("""
      WITH u AS (
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 0 THEN 'alpha.co.uk'
                    WHEN doc_id % 6 = 1 THEN 'beta.com'
                    WHEN doc_id % 6 = 2 THEN 'gamma.net'
                    WHEN doc_id % 6 = 3 THEN 'delta.org'
                    WHEN doc_id % 6 = 4 THEN 'epsilon.ac.jp'
                    ELSE 'zeta.io' END AS domain
        FROM documents),
      r AS (SELECT doc_id, domain,
                   row_number() OVER (PARTITION BY domain ORDER BY doc_id)
                     AS domain_rank
            FROM u)
      SELECT doc_id, domain, CAST(domain_rank AS INTEGER) AS domain_rank
      FROM r WHERE domain_rank <= 20
      ORDER BY domain, domain_rank""")),

    // PUBLIC SUFFIX LIST fold (publicsuffix.org algorithm — q173's
    // registrable-domain key, now exercised on every STRUCTURAL case the
    // official algorithm has: a plain TLD, a 2-label suffix, the 4-label
    // pvt.k12.ma.us family the two-label heuristic mis-bucketed, a
    // wildcard TLD (*.ck), a city wildcard (*.kobe.jp), BOTH exception
    // rules (!www.ck, !city.kobe.jp), and a private-section suffix
    // (github.io). Hosts come from the id formula; the Spark side runs
    // the compiled rule-set CASE chain (pure codegen'd projection — plan
    // pinned exchange-free in PlanSpec); the oracle states the expected
    // fold per class.
    ("q201_psl_domains", (s: SparkSession, d: String) => {
      val id = col("doc_id")
      val host = when(id % 8 === 0,
          concat(lit("a"), (id % 5).cast("string"), lit(".b.example.com")))
        .when(id % 8 === 1,
          concat(lit("x"), (id % 5).cast("string"), lit(".news.bbc.co.uk")))
        .when(id % 8 === 2,
          concat(lit("deep"), (id % 5).cast("string"), lit(".x.pvt.k12.ma.us")))
        .when(id % 8 === 3,
          concat(lit("a"), (id % 5).cast("string"), lit(".b.test.ck")))
        .when(id % 8 === 4, lit("www.www.ck"))
        .when(id % 8 === 5,
          concat(lit("s"), (id % 5).cast("string"), lit(".a.b.kobe.jp")))
        .when(id % 8 === 6, lit("www.city.kobe.jp"))
        .otherwise(
          concat(lit("blog"), (id % 5).cast("string"), lit(".foo.github.io")))
      Tables.documents(s, d)
        .select(id, host.as("host"),
          UrlOps.registrableDomain(host).as("domain"))
    }, Some("""
      SELECT doc_id,
             CASE doc_id % 8
               WHEN 0 THEN 'a' || CAST(doc_id % 5 AS VARCHAR) || '.b.example.com'
               WHEN 1 THEN 'x' || CAST(doc_id % 5 AS VARCHAR) || '.news.bbc.co.uk'
               WHEN 2 THEN 'deep' || CAST(doc_id % 5 AS VARCHAR) || '.x.pvt.k12.ma.us'
               WHEN 3 THEN 'a' || CAST(doc_id % 5 AS VARCHAR) || '.b.test.ck'
               WHEN 4 THEN 'www.www.ck'
               WHEN 5 THEN 's' || CAST(doc_id % 5 AS VARCHAR) || '.a.b.kobe.jp'
               WHEN 6 THEN 'www.city.kobe.jp'
               ELSE 'blog' || CAST(doc_id % 5 AS VARCHAR) || '.foo.github.io'
             END AS host,
             CASE doc_id % 8
               WHEN 0 THEN 'example.com'   -- implicit * rule
               WHEN 1 THEN 'bbc.co.uk'     -- 2-label exact rule
               WHEN 2 THEN 'x.pvt.k12.ma.us' -- 4-label exact rule
               WHEN 3 THEN 'b.test.ck'     -- *.ck wildcard
               WHEN 4 THEN 'www.ck'        -- !www.ck exception
               WHEN 5 THEN 'a.b.kobe.jp'   -- *.kobe.jp wildcard
               WHEN 6 THEN 'city.kobe.jp'  -- !city.kobe.jp exception
               ELSE 'foo.github.io'        -- private-section rule
             END AS domain
      FROM documents""")),

    // PSL fold via the BROADCAST-DIM path (the full-official-list
    // deployment shape: the rule table hot-swaps without re-planning):
    // q201's exact fixture and oracle, evaluated by exploding each
    // host's candidate trailing suffixes and broadcast-joining the rules
    // dim under the official precedence — the two evaluation paths are
    // oracle-pinned to agree rule-for-rule.
    ("q203_psl_domains_dim", (s: SparkSession, d: String) => {
      val id = col("doc_id")
      val host = when(id % 8 === 0,
          concat(lit("a"), (id % 5).cast("string"), lit(".b.example.com")))
        .when(id % 8 === 1,
          concat(lit("x"), (id % 5).cast("string"), lit(".news.bbc.co.uk")))
        .when(id % 8 === 2,
          concat(lit("deep"), (id % 5).cast("string"), lit(".x.pvt.k12.ma.us")))
        .when(id % 8 === 3,
          concat(lit("a"), (id % 5).cast("string"), lit(".b.test.ck")))
        .when(id % 8 === 4, lit("www.www.ck"))
        .when(id % 8 === 5,
          concat(lit("s"), (id % 5).cast("string"), lit(".a.b.kobe.jp")))
        .when(id % 8 === 6, lit("www.city.kobe.jp"))
        .otherwise(
          concat(lit("blog"), (id % 5).cast("string"), lit(".foo.github.io")))
      graft.operators.PublicSuffix.registrableDomainDim(
        Tables.documents(s, d).select(id, host.as("host")),
        "host", "doc_id",
        graft.operators.PublicSuffix.rulesDim(s))
    }, Some("""
      SELECT doc_id,
             CASE doc_id % 8
               WHEN 0 THEN 'a' || CAST(doc_id % 5 AS VARCHAR) || '.b.example.com'
               WHEN 1 THEN 'x' || CAST(doc_id % 5 AS VARCHAR) || '.news.bbc.co.uk'
               WHEN 2 THEN 'deep' || CAST(doc_id % 5 AS VARCHAR) || '.x.pvt.k12.ma.us'
               WHEN 3 THEN 'a' || CAST(doc_id % 5 AS VARCHAR) || '.b.test.ck'
               WHEN 4 THEN 'www.www.ck'
               WHEN 5 THEN 's' || CAST(doc_id % 5 AS VARCHAR) || '.a.b.kobe.jp'
               WHEN 6 THEN 'www.city.kobe.jp'
               ELSE 'blog' || CAST(doc_id % 5 AS VARCHAR) || '.foo.github.io'
             END AS host,
             CASE doc_id % 8
               WHEN 0 THEN 'example.com'
               WHEN 1 THEN 'bbc.co.uk'
               WHEN 2 THEN 'x.pvt.k12.ma.us'
               WHEN 3 THEN 'b.test.ck'
               WHEN 4 THEN 'www.ck'
               WHEN 5 THEN 'a.b.kobe.jp'
               WHEN 6 THEN 'city.kobe.jp'
               ELSE 'foo.github.io'
             END AS domain
      FROM documents""")),
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}

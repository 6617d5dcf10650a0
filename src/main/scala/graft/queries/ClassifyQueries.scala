package graft.queries

import graft.Tables
import graft.operators.{Classify, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation wave 5 (round 11): supervised source classification
  * (multinomial Naive Bayes trained and served as pure aggregations) and
  * deterministic SemDeDup-style semantic dedup. Every entry is
  * oracle-checked — α=1 smoothing and seed-id centroids are chosen
  * exactly so both train and serve replay closed-form in DuckDB (the
  * seeded/trained variants of both live in MLlib-land: q60 / q51).
  */
object ClassifyQueries {

  type Q = (SparkSession, String) => DataFrame

  private def trainDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") % 5 =!= 0)
  private def testDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") % 5 === 0)

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // NB training surface on the doc_id%5≠0 split: per-source totals,
    // log-prior, and the top-5 tokens with smoothed log-likelihoods —
    // the inspectable model a curation pipeline ships alongside its
    // filter decisions. Hash-checks both aggregation passes and the
    // smoothing arithmetic.
    ("q153_nb_train", (s: SparkSession, d: String) =>
      Classify.nbTopTokens(trainDocs(s, d), "doc_id", "text", "source",
        k = 5),
    Some("""
      WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
      tk AS (SELECT source AS label,
                    unnest(string_split_regex(text, '\s+')) AS token
             FROM train),
      cnt AS (SELECT label, token, count(*) AS c FROM tk GROUP BY label, token),
      lbl AS (SELECT source AS label, count(*) AS n_docs FROM train GROUP BY source),
      tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS n_tokens FROM cnt GROUP BY label),
      g AS (SELECT (SELECT count(*) FROM train) AS n_docs_total,
                   (SELECT count(DISTINCT token) FROM cnt) AS v_size),
      rk AS (SELECT label, token, c,
                    row_number() OVER (PARTITION BY label
                      ORDER BY c DESC, token) AS rank
             FROM cnt)
      SELECT rk.label, CAST(rk.rank AS INTEGER) AS rank, lbl.n_docs,
             tot.n_tokens, CAST(g.v_size AS BIGINT) AS v_size,
             round(ln(lbl.n_docs * 1.0 / g.n_docs_total), 6) AS log_prior,
             rk.token, rk.c,
             round(ln((rk.c + 1.0) / (tot.n_tokens + g.v_size)), 6) AS log_lik
      FROM rk JOIN lbl USING (label) JOIN tot USING (label) CROSS JOIN g
      WHERE rk.rank <= 5""")),

    // Held-out classification (doc_id%5=0): one row per test doc with the
    // argmax source under the α=1 decomposition — unseen (token,label)
    // pairs contribute ln(1)=0, so scoring is one token-keyed join plus
    // broadcast label constants and the label×vocabulary matrix is never
    // built. Ranks on the 4-decimal parity round, ties to the smaller
    // label.
    ("q154_nb_classify", (s: SparkSession, d: String) =>
      Classify.nbClassify(trainDocs(s, d), testDocs(s, d), "doc_id", "text",
        "source"),
    Some("""
      WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
      test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
      tk AS (SELECT source AS label,
                    unnest(string_split_regex(text, '\s+')) AS token
             FROM train),
      cnt AS (SELECT label, token, count(*) AS c FROM tk GROUP BY label, token),
      lbl AS (SELECT source AS label, count(*) AS n_docs FROM train GROUP BY source),
      tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS n_tokens FROM cnt GROUP BY label),
      g AS (SELECT (SELECT count(*) FROM train) AS n_docs_total,
                   (SELECT count(DISTINCT token) FROM cnt) AS v_size),
      stats AS (SELECT lbl.label, lbl.n_docs, tot.n_tokens, g.n_docs_total,
                       g.v_size
                FROM lbl JOIN tot USING (label) CROSS JOIN g),
      tf AS (SELECT doc_id, true_label, token, count(*) AS tf
             FROM (SELECT doc_id, source AS true_label,
                          unnest(string_split_regex(text, '\s+')) AS token
                   FROM test)
             GROUP BY doc_id, true_label, token),
      vocab AS (SELECT DISTINCT token FROM cnt),
      m AS (SELECT tf.doc_id, tf.true_label, CAST(sum(tf.tf) AS BIGINT) AS m
            FROM tf JOIN vocab USING (token) GROUP BY tf.doc_id, tf.true_label),
      seen AS (SELECT tf.doc_id, cnt.label,
                      sum(tf.tf * ln(cnt.c + 1.0)) AS s_seen
               FROM tf JOIN cnt USING (token) GROUP BY tf.doc_id, cnt.label),
      sc AS (SELECT m.doc_id, m.true_label, s.label,
                    round(ln(s.n_docs * 1.0 / s.n_docs_total)
                      - m.m * ln((s.n_tokens + s.v_size) * 1.0)
                      + coalesce(seen.s_seen, 0.0), 4) AS score
             FROM m CROSS JOIN stats s
             LEFT JOIN seen ON seen.doc_id = m.doc_id AND seen.label = s.label),
      rk AS (SELECT doc_id, true_label, label, score,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, label) AS rk
             FROM sc)
      SELECT doc_id, true_label, label AS pred_label, score,
             CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS INTEGER)
               AS correct
      FROM rk WHERE rk = 1""")),

    // Deterministic SemDeDup over the embeddings table: nearest of the 8
    // seed-id centroids, then cosine-to-exemplar ≥ 0.85 inside each
    // cluster marks the semantic duplicates. Hash-checks assignment
    // (rounded-cosine argmax), exemplar choice, and the dup gate.
    ("q155_semdedup", (s: SparkSession, d: String) =>
      Similarity.semDedupExemplar(Tables.embeddings(s, d), "vec_id",
        "embedding", k = 8, tau = 0.85),
    Some("""
      WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM c ORDER BY vec_id LIMIT 8),
      a AS (SELECT c.vec_id, c.v, cent.cid,
                   round(list_cosine_similarity(c.v, cent.cv), 6) AS cos
            FROM c CROSS JOIN cent),
      asg AS (SELECT vec_id, v, cid AS cluster_id,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY cos DESC, cid) AS rk
              FROM a),
      mem AS (SELECT vec_id, v, cluster_id FROM asg WHERE rk = 1),
      ex AS (SELECT cluster_id, min(vec_id) AS exemplar_id
             FROM mem GROUP BY cluster_id),
      exv AS (SELECT ex.cluster_id, ex.exemplar_id, c.v AS ev
              FROM ex JOIN c ON c.vec_id = ex.exemplar_id)
      SELECT mem.vec_id, mem.cluster_id, exv.exemplar_id,
             round(list_cosine_similarity(mem.v, exv.ev), 6) AS cos_ex,
             CAST(CASE WHEN round(list_cosine_similarity(mem.v, exv.ev), 6)
                            >= 0.85
                        AND mem.vec_id <> exv.exemplar_id
                  THEN 1 ELSE 0 END AS INTEGER) AS is_dup
      FROM mem JOIN exv USING (cluster_id)""")),
    // PII redaction round-trip: the corpus carries no PII, so the query
    // injects a deterministic doc_id-derived email/URL/phone tail into
    // every document and scrubs it with the production cascade
    // ([[graft.functions.TextFunctions.scrubPii]]) — the oracle replays
    // injection AND all three regex passes, so a drifting pattern or
    // ordering bug (URLs contain '@') fails the hash. Pure per-row
    // codegen'd regexp work, no shuffle.
    ("q156_pii_scrub", (s: SparkSession, d: String) => {
      val injected = concat(col("text"),
        lit(" see http://ex.com/p/"), col("doc_id").cast("string"),
        lit("?u=1 or mail u"), col("doc_id").cast("string"),
        lit("@corp.example.org call +1 (555) 010-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now"))
      Tables.documents(s, d).select(col("doc_id"),
        graft.functions.TextFunctions.scrubPii(injected).as("scrubbed"))
    },
    Some("""
      WITH inj AS (SELECT doc_id,
                          concat(text, ' see http://ex.com/p/', doc_id,
                                 '?u=1 or mail u', doc_id,
                                 '@corp.example.org call +1 (555) 010-',
                                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                                 ' now') AS t
                   FROM documents)
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed
      FROM inj""")),

    // Classifier EVALUATION surface — the confusion matrix over the
    // held-out split: per (true, predicted) source pair, how many docs
    // landed there. The standard gate before a trained quality/source
    // filter is allowed to drop corpus data. Pure rollup of the q154
    // serve (same α=1 decomposition, same 4-decimal argmax), so the
    // oracle replays train + classify + the matrix aggregation.
    ("q158_nb_confusion", (s: SparkSession, d: String) =>
      Classify.nbClassify(trainDocs(s, d), testDocs(s, d), "doc_id", "text",
          "source")
        .groupBy(col("true_label"), col("pred_label"))
        .agg(count(lit(1)).as("n")),
    Some("""
      WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
      test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
      tk AS (SELECT source AS label,
                    unnest(string_split_regex(text, '\s+')) AS token
             FROM train),
      cnt AS (SELECT label, token, count(*) AS c FROM tk GROUP BY label, token),
      lbl AS (SELECT source AS label, count(*) AS n_docs FROM train GROUP BY source),
      tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS n_tokens FROM cnt GROUP BY label),
      g AS (SELECT (SELECT count(*) FROM train) AS n_docs_total,
                   (SELECT count(DISTINCT token) FROM cnt) AS v_size),
      stats AS (SELECT lbl.label, lbl.n_docs, tot.n_tokens, g.n_docs_total,
                       g.v_size
                FROM lbl JOIN tot USING (label) CROSS JOIN g),
      tf AS (SELECT doc_id, true_label, token, count(*) AS tf
             FROM (SELECT doc_id, source AS true_label,
                          unnest(string_split_regex(text, '\s+')) AS token
                   FROM test)
             GROUP BY doc_id, true_label, token),
      vocab AS (SELECT DISTINCT token FROM cnt),
      m AS (SELECT tf.doc_id, tf.true_label, CAST(sum(tf.tf) AS BIGINT) AS m
            FROM tf JOIN vocab USING (token) GROUP BY tf.doc_id, tf.true_label),
      seen AS (SELECT tf.doc_id, cnt.label,
                      sum(tf.tf * ln(cnt.c + 1.0)) AS s_seen
               FROM tf JOIN cnt USING (token) GROUP BY tf.doc_id, cnt.label),
      sc AS (SELECT m.doc_id, m.true_label, s.label,
                    round(ln(s.n_docs * 1.0 / s.n_docs_total)
                      - m.m * ln((s.n_tokens + s.v_size) * 1.0)
                      + coalesce(seen.s_seen, 0.0), 4) AS score
             FROM m CROSS JOIN stats s
             LEFT JOIN seen ON seen.doc_id = m.doc_id AND seen.label = s.label),
      rk AS (SELECT doc_id, true_label, label, score,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, label) AS rk
             FROM sc)
      SELECT true_label, label AS pred_label, count(*) AS n
      FROM rk WHERE rk = 1
      GROUP BY true_label, label""")),

    // Mojibake repair round-trip: the corpus is clean, so the query
    // injects a deterministic UTF-8-as-Latin-1 tail (the classic crawl
    // double-encoding artifact) and repairs it with the production
    // literal-replace cascade ([[graft.functions.TextFunctions
    // .fixMojibake]]). The oracle replays injection AND every replace,
    // so a drifting sequence map fails the hash. Pure per-row codegen'd
    // string work, no shuffle.
    ("q159_fix_mojibake", (s: SparkSession, d: String) => {
      val injected = concat(col("text"),
        lit(" cafÃ© â€œnaÃ¯veâ€“style donâ€™t 25Â½Â° no."),
        col("doc_id").cast("string"))
      Tables.documents(s, d).select(col("doc_id"),
        graft.functions.TextFunctions.fixMojibake(injected).as("fixed"))
    },
    Some("""
      WITH inj AS (SELECT doc_id,
                          concat(text,
                                 ' cafÃ© â€œnaÃ¯veâ€“style donâ€™t 25Â½Â° no.',
                                 doc_id) AS t
                   FROM documents)
      SELECT doc_id,
             replace(replace(replace(replace(replace(replace(replace(replace(
             replace(replace(replace(replace(replace(replace(replace(replace(
             replace(replace(replace(t,
               'Ã©', 'é'), 'Ã¨', 'è'), 'Ã¡', 'á'), 'Ã³', 'ó'), 'Ãº', 'ú'),
               'Ã±', 'ñ'), 'Ã¼', 'ü'), 'Ã¶', 'ö'), 'Ã¤', 'ä'), 'Ã¯', 'ï'),
               'Ã§', 'ç'), 'â€™', ''''), 'â€œ', '"'), 'â€“', '–'),
               'â€”', '—'), 'Â°', '°'), 'Â½', '½'), 'Â«', '«'), 'Â»', '»')
               AS fixed
      FROM inj""")),

    // Source-level boilerplate removal round-trip (CCNet/RefinedWeb-style
    // line-frequency filtering): the corpus has no line structure, so the
    // query injects a deterministic template around every document — a
    // NAV header and FOOT footer in 100% of each source's docs (must be
    // stripped), a PROMO line in 25% (below the 0.5 threshold — must
    // survive), the original text and a RARE per-doc line (unique — must
    // survive). The oracle replays injection, line-frequency detection,
    // the threshold, and order-preserving reconstruction.
    ("q160_boilerplate", (s: SparkSession, d: String) => {
      val injected = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        concat(
          lit("NAV "), col("source"), lit(" menu home about\n"),
          when(col("doc_id") % 4 === 0,
            concat(lit("PROMO "), col("source"), lit(" sale\n")))
            .otherwise(lit("")),
          col("text"),
          lit("\nRARE "), col("doc_id").cast("string"),
          lit("\nFOOT "), col("source"), lit(" copyright")).as("text"))
      graft.operators.Boilerplate.stripBoilerplate(injected, "doc_id",
        "text", "source", minFrac = 0.5)
    },
    Some("""
      WITH inj AS (SELECT doc_id, source,
                          concat('NAV ', source, ' menu home about', chr(10),
                                 CASE WHEN doc_id % 4 = 0
                                      THEN concat('PROMO ', source, ' sale',
                                                  chr(10))
                                      ELSE '' END,
                                 text,
                                 chr(10), 'RARE ', doc_id,
                                 chr(10), 'FOOT ', source, ' copyright') AS t
                   FROM documents),
      l AS (SELECT source, doc_id,
                   unnest(list_distinct(string_split(t, chr(10)))) AS line
            FROM inj),
      nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs
             FROM inj GROUP BY source),
      b AS (SELECT l.source, l.line
            FROM l JOIN nd ON nd.source = l.source
            GROUP BY l.source, l.line, nd.n_docs
            HAVING count(DISTINCT l.doc_id) >= nd.n_docs * 0.5),
      bl AS (SELECT source, list(line) AS blines FROM b GROUP BY source)
      SELECT i.doc_id,
             array_to_string(
               list_filter(string_split(i.t, chr(10)),
                 x -> NOT coalesce(list_contains(bl.blines, x), false)),
               chr(10)) AS clean_text
      FROM inj i LEFT JOIN bl ON bl.source = i.source""")),

    // Corpus-wide EXACT PARAGRAPH dedup, keep-first (Falcon/RefinedWeb
    // recipe; distinct from q160's per-source frequency threshold —
    // here ANY cross-document repeat loses all but its smallest-id
    // occurrence, regardless of how few docs share it). The corpus has
    // no line structure, so the query injects one: a paragraph shared
    // by every 3rd doc (keeper: doc 0), one of five rotating footers
    // (keepers: docs 0–4), a BLANK line in every 4th doc (structure —
    // exempt from keeper election, must survive verbatim in ALL
    // carriers, not just the smallest-id one), the original text and a
    // unique per-doc line. The oracle replays injection, keeper
    // election (excluding empties), keep-first filtering (empties pass
    // unconditionally), and order-preserving reconstruction.
    ("q163_paragraph_dedup", (s: SparkSession, d: String) => {
      val injected = Tables.documents(s, d).select(col("doc_id"),
        concat(
          when(col("doc_id") % 3 === 0,
            lit("SHARED_A common paragraph\n")).otherwise(lit("")),
          col("text"),
          lit("\nSHARED_B_"), (col("doc_id") % 5).cast("string"),
          when(col("doc_id") % 4 === 0, lit("\n")).otherwise(lit("")),
          lit("\nUNIQ "), col("doc_id").cast("string")).as("text"))
      graft.operators.Dedup.paragraphDedup(injected, "doc_id", "text")
    },
    Some("""
      WITH inj AS (SELECT doc_id,
                          concat(CASE WHEN doc_id % 3 = 0
                                      THEN concat('SHARED_A common paragraph',
                                                  chr(10))
                                      ELSE '' END,
                                 text,
                                 chr(10), 'SHARED_B_', doc_id % 5,
                                 CASE WHEN doc_id % 4 = 0 THEN chr(10)
                                      ELSE '' END,
                                 chr(10), 'UNIQ ', doc_id) AS t
                   FROM documents),
      ps AS (SELECT doc_id, string_split(t, chr(10)) AS ps FROM inj),
      e AS (SELECT doc_id, unnest(ps) AS p,
                   unnest(generate_series(1, len(ps))) AS pos
            FROM ps),
      k AS (SELECT p, min(doc_id) AS keep_id FROM e
            WHERE p <> '' GROUP BY p),
      c AS (SELECT e.doc_id, e.pos, e.p
            FROM e LEFT JOIN k USING (p)
            WHERE e.p = '' OR e.doc_id = k.keep_id),
      r AS (SELECT doc_id, string_agg(p, chr(10) ORDER BY pos, p)
                     AS clean_text
            FROM c GROUP BY doc_id)
      SELECT i.doc_id, coalesce(r.clean_text, '') AS clean_text
      FROM inj i LEFT JOIN r USING (doc_id)""")),

    // The COMPOSITE quality gate (CCNet/GPT-3/RefinedWeb recipe,
    // [[graft.operators.QualityGate]]): repetition + OOV + boilerplate
    // fraction + NB quality log-odds cascaded into one verdict frame
    // with per-reason drop attribution. The corpus has no line
    // structure, so the query injects a footer into every 10th doc
    // (boilerplate at minFrac 0.08); hi-quality label = src0 (the DSIR
    // target convention). The oracle replays all four signal
    // computations, the quantile calibration, and the cascade — every
    // drop is hash-checked to its attributed reason.
    ("q167_quality_gate_composite", (s: SparkSession, d: String) => {
      val injected = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        concat(col("text"),
          when(col("doc_id") % 10 === 0,
            concat(lit("\nFOOTER_"), col("source"))).otherwise(lit("")))
          .as("text"))
      graft.operators.QualityGate.qualityGate(injected, "doc_id", "text",
        "source", hiQuality = col("source") === "src0",
        repQ = 0.97, oovQ = 0.97, nbQ = 0.10, boilerMax = 0.4,
        vocabK = 1000, boilerMinFrac = 0.08)
    },
    Some("""
      WITH d AS (SELECT doc_id, source,
                        concat(text, CASE WHEN doc_id % 10 = 0
                                          THEN concat(chr(10), 'FOOTER_',
                                                      source)
                                          ELSE '' END) AS text
                 FROM documents),
      t AS (SELECT doc_id, string_split_regex(text, '\s+') AS tok FROM d),
      rep AS (SELECT doc_id,
                     round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / len(grams), 4) AS rep_ratio
              FROM (SELECT doc_id,
                           list_transform(
                             generate_series(1, greatest(1, len(tok) - 2)),
                             i -> concat_ws(' ', tok[i], tok[i+1], tok[i+2]))
                             AS grams
                    FROM t)),
      tk AS (SELECT doc_id, unnest(tok) AS token FROM t),
      vc AS (SELECT token FROM (
               SELECT token, count(*) AS c FROM tk GROUP BY token
               ORDER BY c DESC, token LIMIT 1000)),
      oov AS (SELECT tk.doc_id,
                     round(1.0 - sum(CASE WHEN v.token IS NULL THEN 0
                                          ELSE 1 END) * 1.0 / count(*), 4)
                       AS oov_rate
              FROM tk LEFT JOIN vc v USING (token) GROUP BY tk.doc_id),
      dl AS (SELECT source AS src, doc_id,
                    unnest(list_distinct(string_split(text, chr(10))))
                      AS line
             FROM d),
      nd AS (SELECT source AS src, count(DISTINCT doc_id) AS n_docs
             FROM d GROUP BY source),
      bl AS (SELECT dl.src, dl.line
             FROM dl JOIN nd USING (src)
             GROUP BY dl.src, dl.line, nd.n_docs
             HAVING count(DISTINCT dl.doc_id) >= nd.n_docs * 0.08),
      bset AS (SELECT src, list(line) AS blines FROM bl GROUP BY src),
      boil AS (SELECT d.doc_id,
                      round(CAST(len(list_filter(
                              string_split(d.text, chr(10)),
                              x -> coalesce(list_contains(b.blines, x),
                                            false))) AS DOUBLE)
                            / len(string_split(d.text, chr(10))), 4)
                        AS boiler_frac
               FROM d LEFT JOIN bset b ON b.src = d.source),
      lb AS (SELECT doc_id,
                    CASE WHEN source = 'src0' THEN 'hi' ELSE 'lo' END
                      AS label, text
             FROM d),
      cnt AS (SELECT label, token, count(*) AS c
              FROM (SELECT label,
                           unnest(string_split_regex(text, '\s+')) AS token
                    FROM lb)
              GROUP BY label, token),
      wide AS (SELECT token,
                      sum(CASE WHEN label = 'hi' THEN c ELSE 0 END) AS c_pos,
                      sum(CASE WHEN label <> 'hi' THEN c ELSE 0 END) AS c_neg
               FROM cnt GROUP BY token),
      g AS (SELECT (SELECT sum(c_pos) FROM wide) AS n_pos,
                   (SELECT sum(c_neg) FROM wide) AS n_neg,
                   (SELECT count(*) FROM wide) AS v,
                   (SELECT count(*) FROM lb WHERE label = 'hi') AS d_pos,
                   (SELECT count(*) FROM lb WHERE label <> 'hi') AS d_neg),
      tf AS (SELECT doc_id, token, count(*) AS tf
             FROM (SELECT doc_id,
                          unnest(string_split_regex(text, '\s+')) AS token
                   FROM lb)
             GROUP BY doc_id, token),
      nbagg AS (SELECT tf.doc_id,
                       sum(CASE WHEN w.token IS NOT NULL THEN tf.tf
                                ELSE 0 END) AS m,
                       sum(tf.tf * (ln(coalesce(w.c_pos, 0) + 1.0)
                                  - ln(coalesce(w.c_neg, 0) + 1.0))) AS s
                FROM tf LEFT JOIN wide w USING (token)
                GROUP BY tf.doc_id),
      nb AS (SELECT doc_id,
                    round(ln(g.d_pos * 1.0 / g.d_neg)
                        - m * (ln((g.n_pos + g.v) * 1.0)
                             - ln((g.n_neg + g.v) * 1.0))
                        + s, 4) AS nb_log_odds
             FROM nbagg CROSS JOIN g),
      sig AS (SELECT r.doc_id, r.rep_ratio, o.oov_rate, b.boiler_frac,
                     n.nb_log_odds
              FROM rep r JOIN oov o USING (doc_id)
              JOIN boil b USING (doc_id) JOIN nb n USING (doc_id)),
      cut AS (SELECT quantile_cont(rep_ratio, 0.97) AS rep_cut,
                     quantile_cont(oov_rate, 0.97) AS oov_cut,
                     quantile_cont(nb_log_odds, 0.10) AS nb_cut
              FROM sig)
      SELECT s.doc_id, s.rep_ratio, s.oov_rate, s.boiler_frac,
             s.nb_log_odds,
             CASE WHEN s.rep_ratio > c.rep_cut THEN 'repetition'
                  WHEN s.oov_rate > c.oov_cut THEN 'oov'
                  WHEN s.boiler_frac > 0.4 THEN 'boilerplate'
                  WHEN s.nb_log_odds < c.nb_cut THEN 'nb_quality'
                  ELSE 'kept' END AS drop_reason,
             (CASE WHEN s.rep_ratio > c.rep_cut THEN 'repetition'
                   WHEN s.oov_rate > c.oov_cut THEN 'oov'
                   WHEN s.boiler_frac > 0.4 THEN 'boilerplate'
                   WHEN s.nb_log_odds < c.nb_cut THEN 'nb_quality'
                   ELSE 'kept' END = 'kept') AS kept
      FROM sig s CROSS JOIN cut c""")),

    // GOPHER RULES (Rae et al. 2021 A1.1) — the rule-based pre-filter as
    // an oracle-checked verdict frame. Three rules are dead on clean
    // synthetic text, so the query injects doc_id-keyed pathologies
    // (the q156 discipline): every 11th doc gets 15 '#' tokens (symbol
    // ratio), every 13th a 3000-char word (mean word length), every
    // 17th thirty numeric tokens (alphabetic fraction); word-count and
    // stop-word rules are live on the natural distribution. The oracle
    // replays injection, tokenization, all five rule statistics and the
    // conjunctive verdict.
    ("q170_gopher_rules", (s: SparkSession, d: String) => {
      val injected = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 11 === 0,
            lit(" " + "### " * 14 + "###")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit(" " + "z" * 3000)).otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            lit(" " + "12345 " * 29 + "12345")).otherwise(lit("")))
          .as("text"))
      graft.operators.QualityGate.gopherRules(injected, "doc_id", "text",
        minWords = 15, maxWords = 100000, minStopWords = 2)
    },
    Some("""
      WITH inj AS (SELECT doc_id,
                          concat(text,
                            CASE WHEN doc_id % 11 = 0
                                 THEN concat(' ', repeat('### ', 14), '###')
                                 ELSE '' END,
                            CASE WHEN doc_id % 13 = 0
                                 THEN concat(' ', repeat('z', 3000))
                                 ELSE '' END,
                            CASE WHEN doc_id % 17 = 0
                                 THEN concat(' ', repeat('12345 ', 29),
                                             '12345')
                                 ELSE '' END) AS t
                   FROM documents),
      w AS (SELECT doc_id, string_split_regex(t, '\s+') AS w FROM inj),
      s AS (SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   round(list_sum(list_transform(w,
                           x -> CAST(len(x) AS DOUBLE))) / len(w), 4)
                     AS mean_word_len,
                   round(len(list_filter(w,
                           x -> contains(x, '#') OR contains(x, '...')))
                         * 1.0 / len(w), 4) AS symbol_ratio,
                   round(len(list_filter(w,
                           x -> regexp_matches(x, '[A-Za-z]')))
                         * 1.0 / len(w), 4) AS alpha_frac,
                   CAST(len(list_filter(w,
                           x -> x IN ('the','be','to','of','and','that',
                                      'have','with'))) AS BIGINT)
                     AS n_stop_words
            FROM w)
      SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
             n_stop_words,
             (n_words >= 15 AND n_words <= 100000) AS r_word_count,
             (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
               AS r_mean_word_len,
             (symbol_ratio <= 0.1) AS r_symbol_ratio,
             (alpha_frac >= 0.8) AS r_alpha_frac,
             (n_stop_words >= 2) AS r_stop_words,
             (n_words >= 15 AND n_words <= 100000
              AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
              AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
              AND n_stop_words >= 2) AS gopher_pass
      FROM s""")),

    // Trained-centroid SemDeDup vs the deterministic exemplar twin at the
    // SAME (k, τ): one agreement row quantifying how far the k-means
    // geometry moves the per-vector dup verdicts. Seeded k-means is not
    // DuckDB-replayable (the q51/q60 situation) → rows-only; the
    // structural laws live in SimilaritySpec and the exemplar twin q155
    // stays fully oracle-checked.
    ("q157_semdedup_agreement", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val ex = Similarity.semDedupExemplar(emb, "vec_id", "embedding",
          k = 8, tau = 0.85)
        .select(col("vec_id"), col("is_dup").as("dup_ex"))
      val tr = Similarity.semDedupTrained(emb, "vec_id", "embedding",
          k = 8, tau = 0.85)
        .select(col("vec_id"), col("is_dup").as("dup_tr"))
      ex.join(tr, Seq("vec_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("dup_ex")).cast("long").as("n_dup_exemplar"),
          sum(col("dup_tr")).cast("long").as("n_dup_trained"),
          sum(when(col("dup_ex") === col("dup_tr"), 1).otherwise(0))
            .cast("long").as("n_verdict_agree"),
          graft.functions.ColumnFunctions.pround(
            avg(when(col("dup_ex") === col("dup_tr"), 1.0).otherwise(0.0)), 6)
            .as("agreement"))
    }, None),

    // CHAR-NGRAM LANGUAGE ID (CCNet's lid gate, as explainable NB): the
    // q154 classifier re-based on char-3-gram profiles — lowercase,
    // whitespace folded to '_', '_' sentinels, every 3-window — over the
    // deterministic 4-language fixture (en/de/fr/es stopword-heavy
    // templates + an id numeral tail). Train on doc_id%5≠0, classify the
    // held-out %5=0 split. The oracle replays EVERYTHING — the feature
    // map (generate_series + substr), both training aggregations, the
    // α=1 scoring decomposition, the 4-decimal round, and the argmax
    // tie-break — so a drift anywhere from the gram window to the prior
    // hash-mismatches.
    ("q202_lang_id", (s: SparkSession, d: String) => {
      val corpus = Classify.syntheticMultilingualCorpus(
        Tables.documents(s, d))
      Classify.langIdClassify(
        corpus.filter(col("doc_id") % 5 =!= 0),
        corpus.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang", n = 3)
    }, Some("""
      WITH base AS (
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                    WHEN 2 THEN 'fr' ELSE 'es' END AS lang,
               CASE doc_id % 4
                 WHEN 0 THEN 'the house and the water are near the old street'
                 WHEN 1 THEN 'das haus und das wasser sind nahe der alten strasse'
                 WHEN 2 THEN 'la maison et le pain sont pres de la vieille rue'
                 ELSE 'la casa y el agua estan cerca de la calle vieja'
               END || ' n' || CAST(doc_id % 10 AS VARCHAR) AS text
        FROM documents),
      padded AS (
        SELECT doc_id, lang,
               '_' || regexp_replace(lower(text), '\s+', '_', 'g') || '_' AS s
        FROM base),
      grams AS (
        SELECT doc_id, lang,
               unnest(list_transform(
                 generate_series(1, greatest(length(s) - 2, 1)),
                 i -> substr(s, i, 3))) AS token
        FROM padded),
      tk AS (SELECT lang AS label, token FROM grams WHERE doc_id % 5 <> 0),
      cnt AS (SELECT label, token, count(*) AS c FROM tk GROUP BY label, token),
      lbl AS (SELECT lang AS label, count(*) AS n_docs FROM base
              WHERE doc_id % 5 <> 0 GROUP BY lang),
      tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS n_tokens
              FROM cnt GROUP BY label),
      g AS (SELECT (SELECT count(*) FROM base WHERE doc_id % 5 <> 0)
                     AS n_docs_total,
                   (SELECT count(DISTINCT token) FROM cnt) AS v_size),
      stats AS (SELECT lbl.label, lbl.n_docs, tot.n_tokens, g.n_docs_total,
                       g.v_size
                FROM lbl JOIN tot USING (label) CROSS JOIN g),
      tf AS (SELECT doc_id, lang AS true_label, token, count(*) AS tf
             FROM grams WHERE doc_id % 5 = 0
             GROUP BY doc_id, lang, token),
      vocab AS (SELECT DISTINCT token FROM cnt),
      m AS (SELECT tf.doc_id, tf.true_label, CAST(sum(tf.tf) AS BIGINT) AS m
            FROM tf JOIN vocab USING (token) GROUP BY tf.doc_id, tf.true_label),
      seen AS (SELECT tf.doc_id, cnt.label,
                      sum(tf.tf * ln(cnt.c + 1.0)) AS s_seen
               FROM tf JOIN cnt USING (token) GROUP BY tf.doc_id, cnt.label),
      sc AS (SELECT m.doc_id, m.true_label, s.label,
                    round(ln(s.n_docs * 1.0 / s.n_docs_total)
                      - m.m * ln((s.n_tokens + s.v_size) * 1.0)
                      + coalesce(seen.s_seen, 0.0), 4) AS score
             FROM m CROSS JOIN stats s
             LEFT JOIN seen ON seen.doc_id = m.doc_id AND seen.label = s.label),
      rk AS (SELECT doc_id, true_label, label, score,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, label) AS rk
             FROM sc)
      SELECT doc_id, true_label, label AS pred_label, score,
             CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS INTEGER)
               AS correct
      FROM rk WHERE rk = 1""")),

    // LANG-ID ABSTAIN (the `und` fallback a 100 TB multilingual corpus
    // forces — CCNet drops below-threshold lid scores rather than
    // mislabeling): q202's machinery under langIdPredict's margin gate
    // over the fixture's out-of-set residue class (doc_id%5==4 is
    // Russian — Cyrillic grams, script-disjoint from every training
    // profile), which splits into BOTH unknown shapes: even ids carry no
    // Latin tail (zero vocabulary overlap → no scoring row → und with
    // null score), odd ids keep the digit tail (scored on two tail grams
    // alone → sub-margin → und with the top score kept as evidence). The
    // oracle replays the feature map, the full scoring decomposition,
    // the top-2 margin arithmetic, AND the one-row-per-doc left join —
    // so a drift anywhere from the gram window to the abstain threshold
    // hash-mismatches.
    ("q204_langid_abstain", (s: SparkSession, d: String) => {
      val corpus = Classify.syntheticMultilingualCorpusWithUnknown(
        Tables.documents(s, d))
      Classify.langIdPredict(
        corpus.filter(col("lang") =!= "xx"),
        corpus, "doc_id", "text", "lang", n = 3, minMargin = 3.0)
    }, Some("""
      WITH base AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 4 THEN
                 'пример текста на другом языке без общих слов' ||
                   CASE WHEN doc_id % 2 = 1
                        THEN ' n' || CAST(doc_id % 3 AS VARCHAR)
                        ELSE '' END
               ELSE
                 CASE doc_id % 4
                   WHEN 0 THEN 'the house and the water are near the old street'
                   WHEN 1 THEN 'das haus und das wasser sind nahe der alten strasse'
                   WHEN 2 THEN 'la maison et le pain sont pres de la vieille rue'
                   ELSE 'la casa y el agua estan cerca de la calle vieja'
                 END || ' n' || CAST(doc_id % 10 AS VARCHAR)
               END AS text,
               CASE WHEN doc_id % 5 = 4 THEN 'xx' ELSE
                 CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                      WHEN 2 THEN 'fr' ELSE 'es' END END AS lang
        FROM documents),
      padded AS (
        SELECT doc_id, lang,
               '_' || regexp_replace(lower(text), '\s+', '_', 'g') || '_' AS s
        FROM base),
      grams AS (
        SELECT doc_id, lang,
               unnest(list_transform(
                 generate_series(1, greatest(length(s) - 2, 1)),
                 i -> substr(s, i, 3))) AS token
        FROM padded),
      tk AS (SELECT lang AS label, token FROM grams WHERE lang <> 'xx'),
      cnt AS (SELECT label, token, count(*) AS c FROM tk GROUP BY label, token),
      lbl AS (SELECT lang AS label, count(*) AS n_docs FROM base
              WHERE lang <> 'xx' GROUP BY lang),
      tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS n_tokens
              FROM cnt GROUP BY label),
      g AS (SELECT (SELECT count(*) FROM base WHERE lang <> 'xx')
                     AS n_docs_total,
                   (SELECT count(DISTINCT token) FROM cnt) AS v_size),
      stats AS (SELECT lbl.label, lbl.n_docs, tot.n_tokens, g.n_docs_total,
                       g.v_size
                FROM lbl JOIN tot USING (label) CROSS JOIN g),
      tf AS (SELECT doc_id, token, count(*) AS tf
             FROM grams GROUP BY doc_id, token),
      vocab AS (SELECT DISTINCT token FROM cnt),
      m AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS m
            FROM tf JOIN vocab USING (token) GROUP BY tf.doc_id),
      seen AS (SELECT tf.doc_id, cnt.label,
                      sum(tf.tf * ln(cnt.c + 1.0)) AS s_seen
               FROM tf JOIN cnt USING (token) GROUP BY tf.doc_id, cnt.label),
      sc AS (SELECT m.doc_id, s.label,
                    round(ln(s.n_docs * 1.0 / s.n_docs_total)
                      - m.m * ln((s.n_tokens + s.v_size) * 1.0)
                      + coalesce(seen.s_seen, 0.0), 4) AS score
             FROM m CROSS JOIN stats s
             LEFT JOIN seen ON seen.doc_id = m.doc_id AND seen.label = s.label),
      rk AS (SELECT doc_id, label, score,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, label) AS rk
             FROM sc),
      top2 AS (SELECT doc_id,
                      max(CASE WHEN rk = 1 THEN label END) AS best,
                      max(CASE WHEN rk = 1 THEN score END) AS best_score,
                      max(CASE WHEN rk = 2 THEN score END) AS second_score
               FROM rk WHERE rk <= 2 GROUP BY doc_id),
      assigned AS (SELECT doc_id,
                          CASE WHEN second_score IS NULL
                                 OR best_score - second_score >= 3.0
                               THEN best ELSE 'und' END AS lang_pred,
                          best_score AS lang_score
                   FROM top2)
      SELECT b.doc_id,
             coalesce(a.lang_pred, 'und') AS lang_pred,
             a.lang_score
      FROM base b LEFT JOIN assigned a USING (doc_id)""")),

    // LANG-ID BREADTH (the many-profile regime a 100 TB multilingual
    // corpus forces): q202's machinery over TWELVE languages across
    // three scripts — incl. the Romance cluster (fr/es/it/pt/ro), whose
    // char-3-gram profiles overlap on dozens of grams and separate only
    // through the full-profile likelihood, plus Cyrillic and Greek,
    // which must coexist with Latin profiles in one vocabulary. The NB
    // machinery is label-count-agnostic by construction; this pins that
    // the claim survives 3× the profile count and cross-script
    // vocabularies. The oracle replays the feature map, both training
    // aggregations, the full α=1 scoring decomposition over all 12
    // labels, and the argmax tie-break.
    ("q210_lang_id_wide", (s: SparkSession, d: String) => {
      val corpus = Classify.syntheticMultilingualCorpusWide(
        Tables.documents(s, d))
      Classify.langIdClassify(
        corpus.filter(col("doc_id") % 5 =!= 0),
        corpus.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang", n = 3)
    }, Some("""
      WITH base AS (
        SELECT doc_id,
               CASE doc_id % 12
                 WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
                 WHEN 3 THEN 'es' WHEN 4 THEN 'it' WHEN 5 THEN 'pt'
                 WHEN 6 THEN 'nl' WHEN 7 THEN 'sv' WHEN 8 THEN 'pl'
                 WHEN 9 THEN 'ro' WHEN 10 THEN 'ru' ELSE 'el' END AS lang,
               CASE doc_id % 12
                 WHEN 0 THEN 'the house and the water are near the old street'
                 WHEN 1 THEN 'das haus und das wasser sind nahe der alten strasse'
                 WHEN 2 THEN 'la maison et le pain sont pres de la vieille rue'
                 WHEN 3 THEN 'la casa y el agua estan cerca de la calle vieja'
                 WHEN 4 THEN 'la casa e il pane sono vicino alla vecchia strada'
                 WHEN 5 THEN 'a casa e a agua estao perto da rua velha'
                 WHEN 6 THEN 'het huis en het water zijn dicht bij de oude straat'
                 WHEN 7 THEN 'huset och vattnet ligger nara den gamla gatan'
                 WHEN 8 THEN 'dom i woda sa blisko starej ulicy'
                 WHEN 9 THEN 'casa si apa sunt aproape de strada veche'
                 WHEN 10 THEN 'дом и вода находятся рядом со старой улицей'
                 ELSE 'το σπιτι και το νερο ειναι κοντα στον παλιο δρομο'
               END || ' n' || CAST(doc_id % 10 AS VARCHAR) AS text
        FROM documents),
      padded AS (
        SELECT doc_id, lang,
               '_' || regexp_replace(lower(text), '\s+', '_', 'g') || '_' AS s
        FROM base),
      grams AS (
        SELECT doc_id, lang,
               unnest(list_transform(
                 generate_series(1, greatest(length(s) - 2, 1)),
                 i -> substr(s, i, 3))) AS token
        FROM padded),
      tk AS (SELECT lang AS label, token FROM grams WHERE doc_id % 5 <> 0),
      cnt AS (SELECT label, token, count(*) AS c FROM tk GROUP BY label, token),
      lbl AS (SELECT lang AS label, count(*) AS n_docs FROM base
              WHERE doc_id % 5 <> 0 GROUP BY lang),
      tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS n_tokens
              FROM cnt GROUP BY label),
      g AS (SELECT (SELECT count(*) FROM base WHERE doc_id % 5 <> 0)
                     AS n_docs_total,
                   (SELECT count(DISTINCT token) FROM cnt) AS v_size),
      stats AS (SELECT lbl.label, lbl.n_docs, tot.n_tokens, g.n_docs_total,
                       g.v_size
                FROM lbl JOIN tot USING (label) CROSS JOIN g),
      tf AS (SELECT doc_id, lang AS true_label, token, count(*) AS tf
             FROM grams WHERE doc_id % 5 = 0
             GROUP BY doc_id, lang, token),
      vocab AS (SELECT DISTINCT token FROM cnt),
      m AS (SELECT tf.doc_id, tf.true_label, CAST(sum(tf.tf) AS BIGINT) AS m
            FROM tf JOIN vocab USING (token) GROUP BY tf.doc_id, tf.true_label),
      seen AS (SELECT tf.doc_id, cnt.label,
                      sum(tf.tf * ln(cnt.c + 1.0)) AS s_seen
               FROM tf JOIN cnt USING (token) GROUP BY tf.doc_id, cnt.label),
      sc AS (SELECT m.doc_id, m.true_label, s.label,
                    round(ln(s.n_docs * 1.0 / s.n_docs_total)
                      - m.m * ln((s.n_tokens + s.v_size) * 1.0)
                      + coalesce(seen.s_seen, 0.0), 4) AS score
             FROM m CROSS JOIN stats s
             LEFT JOIN seen ON seen.doc_id = m.doc_id AND seen.label = s.label),
      rk AS (SELECT doc_id, true_label, label, score,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, label) AS rk
             FROM sc)
      SELECT doc_id, true_label, label AS pred_label, score,
             CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS INTEGER)
               AS correct
      FROM rk WHERE rk = 1""")),
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}

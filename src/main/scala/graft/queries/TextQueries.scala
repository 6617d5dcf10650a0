package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables: dedup family, text analysis, similarity search.
  *
  * Oracle policy: every operator whose arithmetic is expressible in DuckDB
  * SQL carries an oracle (token counts, quality scores, lang-ID, exact
  * dedup, token-set Jaccard, brute-force cosine). Operators built on Spark's
  * xxhash64 (MinHash, SimHash, fingerprints, LSH buckets) have no DuckDB
  * twin — they are declared without oracle (driver records rows-only) and
  * are instead invariant-tested in ScalaTest (planted near-dups must be
  * found; signatures must be deterministic).
  *
  * Scale: all per-doc scoring is shuffle-free narrow projection; dedup/LSH
  * shuffle only on compact hash keys (band hash, bucket id); similarity
  * broadcasts the query set and never shuffles the corpus.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Parity round shadow — see RelationalQueries / ColumnFunctions.pround. */
  private def round(c: org.apache.spark.sql.Column, d: Int) =
    graft.functions.ColumnFunctions.pround(c, d)

  private val stopwordsSql = stopwords.map(w => s"'$w'").mkString(", ")

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // Exact dedup groups by content hash (md5 — same hex in DuckDB).
    ("q40_dedup_exact", (s: SparkSession, d: String) => {
      Dedup.exactDupGroups(Tables.documents(s, d), "doc_id", "text")
    }, Some("""
      SELECT md5(text) AS text_hash, count(*) AS dup_count, min(doc_id) AS keeper_id
      FROM documents GROUP BY text_hash""")),

    // Token counting (whitespace regex — identical split semantics).
    ("q41_token_count", (s: SparkSession, d: String) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_measured"))
    }, Some("""
      SELECT doc_id,
             CAST(len(string_split_regex(text, '\s+')) AS INTEGER) AS n_tokens,
             CAST(length(text) AS INTEGER) AS n_chars_measured
      FROM documents""")),

    // Quality scoring: length/punctuation/stopword-ratio composite.
    ("q42_text_quality", (s: SparkSession, d: String) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        tokenCount(col("text")).as("n_tokens"),
        punctCount(col("text")).as("n_punct"),
        stopwordCount(col("text")).as("n_stopwords"),
        qualityScore(col("text")).as("quality"))
    }, Some(s"""
      WITH t AS (
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS n_tokens,
               CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS INTEGER) AS n_punct,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                    t -> t IN ($stopwordsSql))) AS INTEGER) AS n_stopwords
        FROM documents)
      SELECT doc_id, n_chars, n_tokens, n_punct, n_stopwords,
             round((least(n_chars / 500.0, 1.0)
                  + least((CASE WHEN n_tokens = 0 THEN 0.0
                                ELSE CAST(n_stopwords AS DOUBLE) / n_tokens END) * 5.0, 1.0)
                  + least((CASE WHEN n_chars = 0 THEN 0.0
                                ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 20.0, 1.0)
                   ) / 3.0, 4) AS quality
      FROM t""")),

    // Language-ID heuristic: marker-stopword argmax, ties by declaration
    // order, 'und' when no marker hits.
    ("q43_lang_id", (s: SparkSession, d: String) => {
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"), langGuess(col("text")).as("lang_guess"))
    }, Some {
      val scoreExprs = langMarkers.map { case (lang, markers) =>
        val list = markers.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t IN ($list))) AS INTEGER) AS s_$lang"
      }.mkString(",\n               ")
      val best = s"greatest(${langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")})"
      val cases = langMarkers.map { case (l, _) =>
        s"WHEN s_$l = $best AND s_$l > 0 THEN '$l'"
      }.mkString("\n                  ")
      s"""
      WITH t AS (
        SELECT doc_id, lang,
               $scoreExprs
        FROM documents)
      SELECT doc_id, lang,
             CASE $cases
                  ELSE 'und' END AS lang_guess
      FROM t"""
    }),

    // Token-set (1-gram) Jaccard near-dup pairs over the WHOLE corpus via
    // the exact prefix-filter self-join (Dedup.jaccardSelfJoin) — zero
    // false negatives, so the exhaustive DuckDB cross join is still the
    // hash-exact oracle while the executed Spark plan contains only
    // equi-joins (guarded in PlanSpec).
    ("q44_token_jaccard", (s: SparkSession, d: String) => {
      Dedup.jaccardSelfJoin(Tables.documents(s, d), "doc_id", "text", 0.9)
    }, Some("""
      WITH t AS (SELECT doc_id, list_distinct(string_split_regex(text, '\s+')) AS tok
                 FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.tok, b.tok))), 4) AS jaccard
      FROM t a, t b
      WHERE a.doc_id < b.doc_id
        AND round(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.tok, b.tok))), 4) >= 0.9""")),

    // MinHash + banded LSH near-dup pairs. The declared entry uses the
    // PORTABLE md5-hex signature (Dedup.minHashLshPortable) so DuckDB
    // replays the exact band hashes and the candidate set — the xxhash64
    // codegen kernel stays the engine-native default (minHashLsh), covered
    // by the DedupSpec planted-dup laws + differential tests.
    ("q45_minhash_lsh", (s: SparkSession, d: String) => {
      Dedup.minHashLshPortable(Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, threshold = 0.5)
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
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
               md5(g.b::VARCHAR || ':' || array_to_string(sig[g.b*4+1:g.b*4+4], ',')) AS band_hash
        FROM sig, generate_series(0, 7) AS g(b)),
      cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM bd x JOIN bd y ON x.band = y.band AND x.band_hash = y.band_hash
        WHERE x.doc_id < y.doc_id),
      d AS (SELECT doc_id, list_distinct(shs) AS sh FROM s)
      SELECT c.id_a, c.id_b,
             round(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(da.sh, db.sh))), 4) AS jaccard
      FROM cand c
      JOIN d da ON da.doc_id = c.id_a
      JOIN d db ON db.doc_id = c.id_b
      WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(da.sh, db.sh))) >= 0.5""")),

    // SimHash near-dup pairs within hamming radius 3. Declared on the
    // PORTABLE md5 token hash; the 16-bit chunk pigeonhole blocking is
    // EXACT for radius <= 3, so the DuckDB oracle is simply the
    // brute-force hamming scan over engine-identical fingerprints
    // (('0x'||substr(md5(tok),1,16))::UBIGINT == the Spark kernel's
    // big-endian first 8 md5 bytes). xxhash64 simHashDups stays the
    // engine-native default under the DedupSpec laws.
    ("q46_simhash", (s: SparkSession, d: String) => {
      Dedup.simHashDupsPortable(Tables.documents(s, d), "doc_id", "text", maxDist = 3)
    }, Some("""
      WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
                 FROM documents),
      h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM t),
      v AS (SELECT doc_id, g.b AS b,
                   sum(CASE WHEN (hv >> g.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
            FROM h, generate_series(0, 63) AS g(b) GROUP BY doc_id, g.b),
      f AS (SELECT doc_id,
                   CAST(sum(CASE WHEN vote > 0 THEN (1::UBIGINT << b)
                                 ELSE 0::UBIGINT END) AS UBIGINT) AS fpu
            FROM v GROUP BY doc_id)
      SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
             CAST(bit_count(xor(a.fpu, b2.fpu)) AS INTEGER) AS dist
      FROM f a JOIN f b2 ON a.doc_id < b2.doc_id
      WHERE bit_count(xor(a.fpu, b2.fpu)) <= 3""")),

    // Winnowing-style document fingerprint: min hash over word 5-gram
    // shingles. The declared entry uses md5 as the shingle hash so the
    // fingerprint is engine-portable and DuckDB-replayable; the xxhash64
    // production kernel (TextFunctions.fingerprint) and simHash64 are the
    // same shape and stay covered by q46 + ExpressionSpec determinism laws.
    ("q47_fingerprint", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(shingles(col("text"), 5)).as("sh"))
        .groupBy(col("doc_id"))
        .agg(min(md5(col("sh"))).as("fp"))
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      s AS (
        SELECT doc_id,
               CASE WHEN len(w) <= 5 THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[i+1:i+5], ' ')
                          for i in generate_series(0, len(w)-5)]
               END AS shs
        FROM t),
      u AS (SELECT doc_id, unnest(shs) AS sh FROM s)
      SELECT doc_id, min(md5(sh)) AS fp
      FROM u GROUP BY doc_id""")),

    // Brute-force cosine top-10 for 5 query vectors — the exact-ANN
    // baseline. Query set broadcasts; corpus scanned once.
    ("q48_ann_brute_force", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
    }, Some("""
      WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(c.v, q.qv) AS cos,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id)
                 AS rank
        FROM c, q WHERE c.vec_id != q.query_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
             round(cos, 6) AS cos_sim
      FROM scored WHERE rank <= 10""")),

    // Cosine-radius embedding near-dup pairs via banded multi-table
    // hyperplane LSH — the 100 TB path: candidates meet in (table, bucket)
    // equi-joins, never a cross join. Declared on the PORTABLE per-table
    // Rademacher planes (same ±1 literals baked into plan and SQL), so the
    // DuckDB oracle replays banding, candidate generation, and the cosine
    // verify engine-exactly; the gaussian-coefficient native variant keeps
    // the SimilaritySpec precision-1.0/recall laws.
    ("q49_embedding_neardup", (s: SparkSession, d: String) => {
      Similarity.embeddingNearDupsBandedPortable(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.4, tables = 16, bitsPerTable = 8, dim = 64)
    }, Some {
      import graft.functions.VectorFunctions.portableHyperplanes
      def bucket(t: Int, v: String): String =
        portableHyperplanes(8, 64, s"$t:").zipWithIndex.map { case (w, b) =>
          s"(CASE WHEN list_dot_product($v, ${w.mkString("[", ",", "]")}) >= 0 THEN ${1L << b} ELSE 0 END)"
        }.mkString(" + ")
      val bks = (0 until 16).map(t => bucket(t, "v")).mkString("[", ", ", "]")
      s"""
      WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cb AS (SELECT vec_id, $bks AS bks FROM c),
      bd AS (SELECT vec_id, g.t AS tbl, bks[g.t+1] AS bucket
             FROM cb, generate_series(0, 15) AS g(t)),
      cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
               FROM bd a JOIN bd b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket
               WHERE a.vec_id < b2.vec_id)
      SELECT p.id_a, p.id_b,
             round(list_cosine_similarity(va.v, vb.v), 6) AS cos_sim
      FROM cand p
      JOIN c va ON va.vec_id = p.id_a
      JOIN c vb ON vb.vec_id = p.id_b
      WHERE list_cosine_similarity(va.v, vb.v) >= 0.4"""
    }),

    // LSH-bucketed approximate ANN. Declared on the PORTABLE Rademacher
    // hyperplanes: the SAME ±1 literal arrays are baked into the Spark plan
    // and this generated SQL, and ±1 multipliers keep each projection an
    // exact left-to-right sum — so bucket assignment, candidate set, and
    // ranking replay engine-exactly in DuckDB. The xxhash64-coefficient
    // lshTopK stays the engine-native default (recall law in
    // SimilaritySpec).
    ("q50_ann_lsh", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopKPortable(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nBits = 4, dim = 64)
    }, Some {
      val planes = graft.functions.VectorFunctions.portableHyperplanes(4, 64)
      def bucket(v: String): String = planes.zipWithIndex.map { case (w, b) =>
        s"(CASE WHEN list_dot_product($v, ${w.mkString("[", ",", "]")}) >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"""
      WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cb AS (SELECT vec_id, v, ${bucket("v")} AS bucket FROM c),
      q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, c2.vec_id AS neighbor_id,
               list_cosine_similarity(c2.v, q.qv) AS cos,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY list_cosine_similarity(c2.v, q.qv) DESC, c2.vec_id)
                 AS rank
        FROM cb c2 JOIN q ON c2.bucket = q.bucket AND c2.vec_id != q.query_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
             round(cos, 6) AS cos_sim
      FROM scored WHERE rank <= 10"""
    }),

    // IVF coarse-quantizer ANN (KMeans cells, nProbe nearest probed) — the
    // partitioned-corpus scale path; model-dependent, so rows-only.
    ("q51_ann_ivf", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nCells = 16, nProbe = 4)
    }, None),

    // Corpus curation rollup: per (source, lang) quality/token statistics —
    // the dataset-card numbers a training-data pipeline reports.
    ("q52_corpus_stats", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("source"), col("lang"),
          qualityScore(col("text")).as("q"),
          tokenCount(col("text")).as("nt"),
          length(col("text")).as("nc"))
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("q")), 4).as("avg_quality"),
          round(avg(col("nt")), 2).as("avg_tokens"),
          sum(col("nc")).cast("bigint").as("total_chars"))
    }, Some(s"""
      WITH t AS (
        SELECT source, lang,
               CAST(length(text) AS INTEGER) AS nc,
               CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS nt,
               CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS INTEGER) AS np,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                    t -> t IN ($stopwordsSql))) AS INTEGER) AS ns
        FROM documents),
      q AS (
        SELECT source, lang, nc, nt,
               round((least(nc / 500.0, 1.0)
                 + least((CASE WHEN nt = 0 THEN 0.0 ELSE CAST(ns AS DOUBLE) / nt END) * 5.0, 1.0)
                 + least((CASE WHEN nc = 0 THEN 0.0 ELSE CAST(np AS DOUBLE) / nc END) * 20.0, 1.0)
                 ) / 3.0, 4) AS quality
        FROM t)
      SELECT source, lang, count(*) AS n_docs,
             round(avg(quality), 4) AS avg_quality,
             round(avg(nt), 2) AS avg_tokens,
             CAST(sum(nc) AS BIGINT) AS total_chars
      FROM q GROUP BY source, lang""")),

    // Text normalization: lowercase, strip non-alphanumerics, collapse
    // whitespace — the canonicalization step before hashing/shingling.
    ("q54_normalize", (s: SparkSession, d: String) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm_text"))
    }, Some("""
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
      FROM documents""")),

    // Corpus-wide token frequencies: explode + count + top-k — the
    // vocabulary profile.
    ("q55_token_freq", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(20)
    }, Some("""
      SELECT token, count(*) AS freq
      FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
      WHERE length(token) > 0
      GROUP BY token ORDER BY freq DESC, token LIMIT 20""")),

    // Edit distance between sampled document pairs — the character-level
    // near-dup metric (both engines implement classic Levenshtein). The
    // samples are paired through a DERIVED EQUI-JOIN KEY (doc_id div 50
    // aligns each 50m row with its 50m+1 neighbour), so the executed plan
    // is a hash join over ~n/50 rows per side — a crossJoin of the two
    // samples would be O(n²/2500), still quadratic at 100 TB. Guarded by a
    // no-cartesian plan test in PlanSpec.
    ("q56_edit_distance", (s: SparkSession, d: String) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 80).as("prefix"))
      val a = t.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("id_a"), floor(col("doc_id") / 50).as("grp"),
          col("prefix").as("pa"))
      val b = t.filter(col("doc_id") % 50 === 1)
        .select(col("doc_id").as("id_b"), floor(col("doc_id") / 50).as("grp"),
          col("prefix").as("pb"))
      a.join(b, Seq("grp"))
        .select(col("id_a"), col("id_b"), levenshtein(col("pa"), col("pb")).as("edit_dist"))
    }, Some("""
      WITH t AS (SELECT doc_id, substr(text, 1, 80) AS prefix FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS edit_dist
      FROM t a JOIN t b ON a.doc_id // 50 = b.doc_id // 50
      WHERE a.doc_id % 50 = 0 AND b.doc_id % 50 = 1""")),

    // Embedding-corpus statistics per label: norm and component spread —
    // the sanity dashboard over a vector store.
    ("q64_embedding_stats", (s: SparkSession, d: String) => {
      import graft.functions.VectorFunctions
      Tables.embeddings(s, d)
        .select(col("label"),
          VectorFunctions.l2Norm(VectorFunctions.asDouble(col("embedding"))).as("nrm"),
          element_at(col("embedding"), 1).cast("double").as("c0"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          round(avg(col("nrm")), 6).as("avg_norm"),
          round(stddev(col("nrm")), 6).as("std_norm"),
          round(avg(col("c0")), 6).as("avg_c0"))
    }, Some("""
      WITH t AS (SELECT label,
                        sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm,
                        CAST(embedding[1] AS DOUBLE) AS c0
                 FROM embeddings)
      SELECT label, count(*) AS n_vecs,
             round(avg(nrm), 6) AS avg_norm,
             round(stddev(nrm), 6) AS std_norm,
             round(avg(c0), 6) AS avg_c0
      FROM t GROUP BY label""")),

    // Full corpus-cleaning pipeline: exact + MinHash-LSH fuzzy dedup,
    // surviving rows out. Declared on the PORTABLE md5 banding
    // (Dedup.dedupCorpusPortable, 16x2 bands) so DuckDB replays the whole
    // exact→LSH→anti-join survivor computation; the xxhash64-native
    // dedupCorpus stays covered by the SketchSpec crafted-corpus law.
    ("q68_dedup_corpus", (s: SparkSession, d: String) => {
      Dedup.dedupCorpusPortable(Tables.documents(s, d), "doc_id", "text", threshold = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
    }, Some("""
      WITH keep AS (
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
      d AS (SELECT doc_id, list_distinct(shs) AS sh FROM s),
      losers AS (
        SELECT DISTINCT c.id_b
        FROM cand c
        JOIN d da ON da.doc_id = c.id_a
        JOIN d db ON db.doc_id = c.id_b
        WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(da.sh, db.sh))) >= 0.5)
      SELECT k.doc_id, k.lang, k.source
      FROM keep k WHERE k.doc_id NOT IN (SELECT id_b FROM losers)""")),

    // Deterministic hash sampling + per-stratum quotas — reproducible
    // curation sampling. The declared entry uses the PORTABLE md5-hex
    // selector, so DuckDB replays the exact selection and the row set
    // hash-checks; the cheaper xxhash64 variants stay the engine-native
    // default (SamplingSpec covers both).
    ("q67_sampling", (s: SparkSession, d: String) => {
      import graft.operators.Sampling
      val docs = Tables.documents(s, d)
      Sampling.stratifiedQuotaPortable(
        Sampling.deterministicSamplePortable(docs, "doc_id", 0.8),
        "lang", "doc_id", 10)
        .select(col("doc_id"), col("lang"))
    }, Some("""
      WITH s AS (
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'),
      r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM s)
      SELECT doc_id, lang FROM r WHERE rn <= 10""")),

    // Leakage-safe train/val/test split: assignment keyed on the CONTENT
    // hash so byte-identical duplicates can never straddle splits —
    // deterministic, partitioning-independent, engine-replayable.
    ("q99_leakage_split", (s: SparkSession, d: String) => {
      import graft.operators.Sampling
      Sampling.leakageSafeSplit(Tables.documents(s, d), "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
    }, Some("""
      SELECT doc_id,
             CASE WHEN substr(md5(text), 1, 8) < 'cccccccc' THEN 'train'
                  WHEN substr(md5(text), 1, 8) < 'e6666666' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents""")),

    // Duplicate-3-gram repetition ratio (boilerplate/spam signal for
    // curation filters); the DuckDB twin rebuilds the same shingle set
    // with list functions.
    ("q84_repetition", (s: SparkSession, d: String) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        repetitionRatio(col("text"), 3).as("rep_ratio"))
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS tok FROM documents),
      g AS (SELECT doc_id,
                   list_transform(generate_series(1, greatest(1, len(tok) - 2)),
                                  i -> concat_ws(' ', tok[i], tok[i+1], tok[i+2])) AS grams
            FROM t)
      SELECT doc_id,
             round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 4) AS rep_ratio
      FROM g""")),

    // Training-mixture rates: per-source keep rates toward a target data
    // mix, capped by the scarcest source (no upsampling) — the "data
    // recipe" computation every pretraining pipeline runs before sampling.
    ("q86_mixing_rates", (s: SparkSession, d: String) => {
      import graft.operators.Sampling
      Sampling.mixingRates(Tables.documents(s, d), "source",
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))
    }, Some("""
      WITH counts AS (SELECT source, count(*) AS n_rows FROM documents GROUP BY source),
      tgt(source, target_frac) AS (VALUES
        ('src0', CAST(0.4 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        ('src2', CAST(0.2 AS DOUBLE)), ('src3', CAST(0.1 AS DOUBLE))),
      j AS (SELECT c.source, n_rows, COALESCE(target_frac, 0.0) AS target_frac
            FROM counts c LEFT JOIN tgt USING (source)),
      cap AS (SELECT min(n_rows / target_frac) AS n_out FROM j WHERE target_frac > 0),
      k AS (SELECT source, n_rows, target_frac,
                   CAST(round(target_frac * n_out, 0) AS BIGINT) AS n_keep
            FROM j, cap)
      SELECT source, n_rows, target_frac, n_keep,
             round(CAST(n_keep AS DOUBLE) / n_rows, 6) AS rate
      FROM k""")),

    // Mergeable HLL sketch rollup: per-source sketches union to the global
    // estimate without re-reading data — the sketch-store pattern that
    // replaces count-distinct at 100 TB (partial sketches persist and
    // merge across days/sources). The sketch binary is engine-specific but
    // its estimate is deterministic for fixed data, so the entry emits the
    // exact count plus a within-5% boolean the DuckDB oracle replays as
    // TRUE — oracle-checked end to end (merge==direct law in UpsertSpec).
    ("q87_hll_mergeable", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val merged = docs
        .groupBy(col("source"))
        .agg(hll_sketch_agg(col("doc_id")).as("sk"), count(lit(1)).as("n"))
        .agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
          sum(col("n")).as("n_docs"))
      val exact = docs.agg(countDistinct(col("doc_id")).as("exact_distinct_docs"))
      merged.crossJoin(exact).select(
        col("n_docs"), col("exact_distinct_docs"),
        (abs(col("est") - col("exact_distinct_docs"))
          <= col("exact_distinct_docs") * 0.05).as("est_ok"))
    }, Some("""
      SELECT count(*) AS n_docs,
             count(DISTINCT doc_id) AS exact_distinct_docs,
             TRUE AS est_ok
      FROM documents""")),

    // End-to-end curation pipeline, every stage oracle-expressible:
    // normalize → quality-filter → exact-dedup on normalized hash (smallest
    // id survives) → per-(source, lang) dataset-card rollup. The fuzzy
    // variant (MinHash) is q68; this is the deterministic twin the gate can
    // hash-check stage-for-stage.
    ("q93_curation_pipeline", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.documents(s, d).select(
        col("doc_id"), col("source"), col("lang"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm"),
        qualityScore(col("text")).as("q"))
      scored.filter(col("q") >= 0.5)
        .withColumn("__rn", row_number().over(
          Window.partitionBy(md5(col("norm"))).orderBy(col("doc_id"))))
        .filter(col("__rn") === 1)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), round(avg(col("q")), 4).as("avg_quality"))
    }, Some(s"""
      WITH t AS (
        SELECT doc_id, source, lang, text,
               CAST(length(text) AS INTEGER) AS nc,
               CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS nt,
               CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS INTEGER) AS np,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                    t -> t IN ($stopwordsSql))) AS INTEGER) AS ns
        FROM documents),
      q AS (
        SELECT doc_id, source, lang,
               trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g')) AS norm,
               round((least(nc / 500.0, 1.0)
                 + least((CASE WHEN nt = 0 THEN 0.0 ELSE CAST(ns AS DOUBLE) / nt END) * 5.0, 1.0)
                 + least((CASE WHEN nc = 0 THEN 0.0 ELSE CAST(np AS DOUBLE) / nc END) * 20.0, 1.0)
                 ) / 3.0, 4) AS q
        FROM t),
      dedup AS (
        SELECT *, row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rn
        FROM q WHERE q >= 0.5)
      SELECT source, lang, count(*) AS n_docs, round(avg(q), 4) AS avg_quality
      FROM dedup WHERE rn = 1 GROUP BY source, lang""")),

    // Document-length histogram (fixed-width buckets) — distribution
    // shape for curation decisions.
    ("q53_length_histogram", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .groupBy((floor(length(col("text")) / 100) * 100).cast("int").as("bucket_start"))
        .agg(count(lit(1)).as("n_docs"))
    }, Some("""
      SELECT CAST(CAST(floor(length(text) / 100) AS BIGINT) * 100 AS INTEGER) AS bucket_start,
             count(*) AS n_docs
      FROM documents GROUP BY bucket_start""")),

    // Benchmark decontamination (word-8-gram overlap vs an eval set —
    // the GPT-3/Llama-style leakage guard). The "benchmark" here is the
    // deterministic doc_id % 97 slice of the corpus so the oracle can
    // replay the whole report.
    ("q95_decontaminate", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      operators.Decontaminate.contaminationReport(
        docs, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", n = 8)
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(w) <= 8 THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[i+1:i+8], ' ')
                          for i in generate_series(0, len(w)-8)]
               END) AS gs
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents)),
      cg AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g FROM sh),
      bg AS (SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id % 97 = 0)
      SELECT cg.doc_id, CAST(any_value(cg.n_grams) AS INTEGER) AS n_grams,
             count(*) AS n_hits,
             round(count(*) * 1.0 / any_value(cg.n_grams), 4) AS contaminated_frac
      FROM cg JOIN bg USING (g)
      GROUP BY cg.doc_id""")),

    // Bloom-prefiltered decontamination — q95's report in the regime
    // where the benchmark gram set is too big to broadcast as strings:
    // the corpus gram stream is killed map-side by a 2^17-bit / k=5
    // Bloom filter (pure Column double-hash bit tests), survivors are
    // exact-verified. The result is EXACT (no false negatives; false
    // positives die in the verify join), so the oracle is the same
    // replay as q95 with the denser doc_id % 17 bench slice — DuckDB
    // never needs to model the filter at all.
    ("q174_bloom_decontaminate", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      operators.Decontaminate.bloomContaminationReport(
        docs, docs.filter(col("doc_id") % 17 === 0), "doc_id", "text",
        n = 8, mBits = 1L << 17, k = 5)
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(w) <= 8 THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[i+1:i+8], ' ')
                          for i in generate_series(0, len(w)-8)]
               END) AS gs
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents)),
      cg AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g FROM sh),
      bg AS (SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id % 17 = 0)
      SELECT cg.doc_id, CAST(any_value(cg.n_grams) AS INTEGER) AS n_grams,
             count(*) AS n_hits,
             round(count(*) * 1.0 / any_value(cg.n_grams), 4) AS contaminated_frac
      FROM cg JOIN bg USING (g)
      GROUP BY cg.doc_id""")),

    // Corpus-trained bigram language-model scoring (add-1 smoothing) —
    // the classic statistical quality signal before any neural scorer;
    // pure count arithmetic, so the DuckDB twin replays it exactly
    // (parallel unnests zip in DuckDB, matching the zip_with shift).
    ("q98_bigram_lm", (s: SparkSession, d: String) => {
      operators.LanguageModel.bigramLogProb(Tables.documents(s, d), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      bg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
             FROM t WHERE len(w) >= 2),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(w) AS tok FROM t))
      SELECT bg.doc_id, count(*) AS n_bigrams,
             round(avg(ln((c12.c12 + 1.0) / (c1.c1 + 1.0 * v.v))), 6) AS avg_logprob
      FROM bg
      JOIN c12 USING (w1, w2)
      JOIN c1 USING (w1)
      CROSS JOIN v
      GROUP BY bg.doc_id""")),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020): the q98
    // bigram-LM score split into per-source head/middle/tail terciles —
    // the keep-head curation policy as one verdict frame. The oracle
    // replays the LM arithmetic and the per-source quantile cuts.
    ("q169_perplexity_buckets", (s: SparkSession, d: String) => {
      operators.LanguageModel.perplexityBuckets(Tables.documents(s, d),
        "doc_id", "text", "source")
        .withColumnRenamed("id", "doc_id")
        .withColumnRenamed("src", "source")
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      bg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
             FROM t WHERE len(w) >= 2),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(w) AS tok FROM t)),
      s AS (SELECT bg.doc_id, count(*) AS n_bigrams,
                   round(avg(ln((c12.c12 + 1.0) / (c1.c1 + 1.0 * v.v))), 6)
                     AS avg_logprob
            FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
            GROUP BY bg.doc_id),
      ss AS (SELECT s.doc_id, d.source, s.n_bigrams, s.avg_logprob
             FROM s JOIN documents d USING (doc_id)),
      cut AS (SELECT source,
                     quantile_cont(avg_logprob, 0.3333333333333333) AS t1,
                     quantile_cont(avg_logprob, 0.6666666666666666) AS t2
              FROM ss GROUP BY source)
      SELECT ss.doc_id, ss.source, ss.n_bigrams, ss.avg_logprob,
             CASE WHEN ss.avg_logprob >= c.t2 THEN 'head'
                  WHEN ss.avg_logprob >= c.t1 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM ss JOIN cut c USING (source)""")),

    // Context-window chunking: split each doc's token stream into 32-token
    // windows with 8-token overlap — the dual of q96's packing (that
    // concatenates short docs; this splits long ones). Narrow per-row
    // arithmetic; the oracle replays the window math with list slicing.
    ("q100_chunk_windows", (s: SparkSession, d: String) => {
      operators.Chunking.chunkDocuments(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 32, overlap = 8)
        .withColumnRenamed("id", "doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      c AS (SELECT doc_id, w, len(w) AS n,
                   CAST(floor((greatest(0, len(w) - 32) + 23) / 24.0) + 1 AS INT) AS n_chunks
            FROM t),
      e AS (SELECT doc_id, w, n, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
            FROM c)
      SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
             CAST(chunk_id * 24 AS INT) AS start_tok,
             CAST(len(w[chunk_id*24 + 1 : least(chunk_id*24 + 32, n)]) AS INT) AS n_tok,
             array_to_string(w[chunk_id*24 + 1 : least(chunk_id*24 + 32, n)], ' ') AS chunk
      FROM e""")),

    // Sequence packing: assign every doc a (seq_id, offset) in the
    // md5-shuffled global token stream chopped into 512-token training
    // sequences. Spark side is the distributed two-phase prefix sum
    // (operators/Packing); the oracle replays it as one global window.
    ("q96_pack_sequences", (s: SparkSession, d: String) => {
      operators.Packing.packSequences(Tables.documents(s, d), "doc_id",
        size(split(col("text"), "\\s+")), budget = 512L)
    }, Some("""
      WITH t AS (SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_tok,
                        md5(CAST(doc_id AS VARCHAR)) AS ord
                 FROM documents),
      c AS (SELECT doc_id, n_tok,
                   sum(n_tok) OVER (ORDER BY ord, doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tok AS start
            FROM t)
      SELECT doc_id, n_tok, CAST(floor(start / 512.0) AS BIGINT) AS seq_id,
             CAST(start % 512 AS BIGINT) AS offset_in_seq
      FROM c""")),

    // DSIR-style importance weights (Xie et al. 2023) — the standard
    // data-SELECTION step between crawl cleaning and pretraining: every
    // document scored by how much its hashed unigram+bigram bag looks
    // drawn from the target domain (here src0's documents) rather than
    // from the raw pool. Features hash through md5, so the oracle
    // replays the ENTIRE computation — tokenization, bigram formation,
    // bucketing, Laplace smoothing, the log-likelihood-ratio sum. Plan:
    // two bucket-keyed count aggs, a 256-row broadcast weight table, one
    // doc-keyed agg; no all-pairs, no global sort.
    ("q162_dsir_weights", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      operators.Sampling.dsirWeights(docs,
        docs.filter(col("source") === "src0"), "doc_id", "text",
        nBuckets = 256, alpha = 1.0)
    }, Some("""
      WITH tok AS (SELECT doc_id, source,
                          string_split_regex(text, '\s+') AS t
                   FROM documents),
      g AS (SELECT doc_id, source,
                   unnest(list_concat(t,
                     list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1]))) AS g
            FROM tok),
      b AS (SELECT doc_id, source,
                   ((instr('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 4096 +
                    (instr('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 256 +
                    (instr('0123456789abcdef', substr(md5(g), 3, 1)) - 1) * 16 +
                    (instr('0123456789abcdef', substr(md5(g), 4, 1)) - 1)) % 256
                     AS b
            FROM g),
      ct AS (SELECT b, count(*) AS ct FROM b WHERE source = 'src0' GROUP BY b),
      cr AS (SELECT b, count(*) AS cr FROM b GROUP BY b),
      tot AS (SELECT (SELECT sum(ct) FROM ct) AS tt,
                     (SELECT sum(cr) FROM cr) AS tr),
      wt AS (SELECT cr.b,
                    ln((coalesce(ct.ct, 0) + 1.0) / (tot.tt + 256.0))
                  - ln((cr.cr + 1.0) / (tot.tr + 256.0)) AS lr
             FROM cr LEFT JOIN ct USING (b) CROSS JOIN tot)
      SELECT b.doc_id, round(sum(wt.lr), 4) AS log_weight
      FROM b JOIN wt USING (b)
      GROUP BY b.doc_id""")),

    // The DSIR SELECTION stage end-to-end: the 50 documents most
    // target-like under q162's weights, deterministic resampling
    // (weight desc, id asc — ties break identically on both sides
    // because both rank the 4-decimal parity round). Planned as a
    // distributed TakeOrderedAndProject (PlanSpec-adjacent law in
    // SamplingSpec), never a single-partition window.
    ("q164_dsir_select", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      operators.Sampling.dsirSelect(docs,
        docs.filter(col("source") === "src0"), "doc_id", "text", k = 50,
        nBuckets = 256, alpha = 1.0)
    }, Some("""
      WITH tok AS (SELECT doc_id, source,
                          string_split_regex(text, '\s+') AS t
                   FROM documents),
      g AS (SELECT doc_id, source,
                   unnest(list_concat(t,
                     list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1]))) AS g
            FROM tok),
      b AS (SELECT doc_id, source,
                   ((instr('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 4096 +
                    (instr('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 256 +
                    (instr('0123456789abcdef', substr(md5(g), 3, 1)) - 1) * 16 +
                    (instr('0123456789abcdef', substr(md5(g), 4, 1)) - 1)) % 256
                     AS b
            FROM g),
      ct AS (SELECT b, count(*) AS ct FROM b WHERE source = 'src0' GROUP BY b),
      cr AS (SELECT b, count(*) AS cr FROM b GROUP BY b),
      tot AS (SELECT (SELECT sum(ct) FROM ct) AS tt,
                     (SELECT sum(cr) FROM cr) AS tr),
      wt AS (SELECT cr.b,
                    ln((coalesce(ct.ct, 0) + 1.0) / (tot.tt + 256.0))
                  - ln((cr.cr + 1.0) / (tot.tr + 256.0)) AS lr
             FROM cr LEFT JOIN ct USING (b) CROSS JOIN tot),
      w AS (SELECT b.doc_id, round(sum(wt.lr), 4) AS log_weight
            FROM b JOIN wt USING (b)
            GROUP BY b.doc_id)
      SELECT doc_id, log_weight FROM w
      ORDER BY log_weight DESC, doc_id LIMIT 50""")),
  )

  val queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  val oracles: Map[String, String] = entries.collect { case (n, _, Some(sql)) =>
    n -> sql.stripMargin.trim.replace("round(", "round(1e-8 + ")
  }.toMap
}

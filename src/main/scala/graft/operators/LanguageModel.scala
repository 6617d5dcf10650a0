package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language-model scoring — the classic statistical
  * quality signal a curation pipeline computes before any neural scoring:
  * train bigram counts over the corpus itself, then score each document by
  * its average bigram log-probability under add-k smoothing. Gibberish,
  * boilerplate, and wrong-language text land far below the corpus's own
  * register; the score is a strong cheap filter feature.
  *
  * Scale shape: two grouped counts (bigram, unigram) + one scalar (vocab
  * size), then one equi-join of the corpus's bigram stream against the
  * count tables — every stage keyed by token text, arbitrarily
  * partitionable, no driver-side state beyond the single vocab-size
  * scalar. The count tables are corpus-level aggregates a production
  * pipeline would persist and reuse across scoring runs.
  */
object LanguageModel {

  /** Per-document average bigram log-probability:
    * score(d) = (1/|bigrams(d)|) · Σ ln((c(w1,w2)+k) / (c(w1)+k·V))
    * over the document's word bigrams, with counts trained on the whole
    * corpus and V = |vocabulary|. Documents with fewer than 2 tokens have
    * no bigrams and are omitted (no register to judge them against).
    * Returns (id, n_bigrams, avg_logprob rounded to 6).
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      split(col(textCol), "\\s+").as("w"))
    // one row per bigram occurrence: the array zipped with its own shift
    val bigrams = toks
      .filter(size(col("w")) >= 2)
      .withColumn("bg", zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .select(col("id"), explode(col("bg")).as("bg"))
      .select(col("id"), col("bg.w1"), col("bg.w2"))

    val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // c(w1) = Σ_w2 c(w1,w2): both counts tally the same bigram rows, so
    // the unigram-context table folds out of c12 — a vocabulary-sized
    // re-aggregation instead of a second full pass + shuffle of the
    // corpus bigram stream (guide §2.3/§2.4)
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = toks.select(explode(col("w")).as("w")).agg(
      countDistinct(col("w")).as("v"))

    // attach c1 to the count table first (vocab-sized join keyed on w1),
    // then join the corpus stream ONCE on (w1, w2) — the stream is
    // shuffled once, not twice; self-scoring means every stream bigram
    // hits the count table, so inner-join row sets are unchanged
    val ctab = c12.join(c1, Seq("w1"))
    bigrams
      .join(ctab, Seq("w1", "w2"))
      .crossJoin(vocab) // 1-row scalar: broadcast, not a real product
      .withColumn("lp", log((col("c12") + lit(k)) / (col("c1") + lit(k) * col("v"))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.functions.ColumnFunctions.pround(avg(col("lp")), 6).as("avg_logprob"))
  }

  /** Train-then-score: score `docs` against counts trained on `trainDocs`
    * ONLY — the production shape (count tables persist, each new batch is
    * scored against the frozen register), and the variant whose unseen
    * bigrams get the true smoothing floor k/(k·V). Self-scoring
    * ([[bigramLogProb]]) inflates singleton contexts instead: a
    * document's own bigrams contribute (1+k)/(1+k·V) > k/(k·V), so
    * out-of-register text is better separated by THIS variant.
    */
  def bigramLogProbAgainst(trainDocs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, k: Double = 1.0): DataFrame = {
    val train = bigramRows(trainDocs, idCol, textCol)
    val c12 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // c(w1) folded out of c12 (Σ_w2 c(w1,w2)) — one corpus pass, not two
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = trainDocs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    scoreTail(bigramRows(docs, idCol, textCol), c12, c1, vocab, k)
  }

  /** CCNet-style PERPLEXITY BUCKETING (Wenzek et al. 2020 §4.3): score
    * every document with the corpus bigram LM ([[bigramLogProb]] — the
    * q98 statistic) and split each SOURCE into head / middle / tail by
    * its own avg-log-prob terciles — most-fluent third first, the
    * standard keep-head / sample-middle / drop-tail curation policy.
    * Per-source cuts because fluency distributions differ wildly across
    * sources (the q130 per-source-threshold discipline); cuts are exact
    * interpolated percentiles over the 6-decimal-rounded scores (counts
    * map bounded by the rounding grid), broadcast back as a
    * sources-sized frame. Documents with fewer than 2 tokens have no
    * bigrams and are omitted, as in [[bigramLogProb]]. Returns (id, src,
    * n_bigrams, avg_logprob, bucket ∈ {head, middle, tail}). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, k: Double = 1.0): DataFrame = {
    val scored = bigramLogProb(docs, idCol, textCol, k)
      .join(docs.select(col(idCol).as("id"), col(srcCol).as("src")),
        Seq("id"))
    val cuts = scored.groupBy(col("src")).agg(
      expr("percentile(avg_logprob, 0.3333333333333333)").as("t1"),
      expr("percentile(avg_logprob, 0.6666666666666666)").as("t2"))
    scored.join(broadcast(cuts), Seq("src"))
      .select(col("id"), col("src"), col("n_bigrams"), col("avg_logprob"),
        when(col("avg_logprob") >= col("t2"), "head")
          .when(col("avg_logprob") >= col("t1"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** One (id, w1, w2) row per bigram occurrence: the token array zipped
    * with its own shift. Documents with fewer than 2 tokens yield none. */
  private[operators] def bigramRows(df: DataFrame, idCol: String,
      textCol: String): DataFrame = df
    .select(col(idCol).as("id"), split(col(textCol), "\\s+").as("w"))
    .filter(size(col("w")) >= 2)
    .withColumn("bg", zip_with(
      slice(col("w"), lit(1), size(col("w")) - 1),
      slice(col("w"), lit(2), size(col("w")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2"))))
    .select(col("id"), explode(col("bg")).as("bg"))
    .select(col("id"), col("bg.w1"), col("bg.w2"))

  /** Shared scoring tail for the train-then-score and persisted-store
    * paths: `docBigrams`=(id, w1, w2) occurrences, `c12`=(w1, w2, c12),
    * `c1`=(w1, c1), `vocab`=one (v) row. Left joins + coalesce give
    * unseen bigrams the true smoothing floor k/(k·V). */
  private[operators] def scoreTail(docBigrams: DataFrame, c12: DataFrame,
      c1: DataFrame, vocab: DataFrame, k: Double,
      rounded: Boolean = true): DataFrame = {
    val avgLp = avg(col("lp"))
    docBigrams
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(vocab) // 1-row scalar: broadcast, not a real product
      .withColumn("lp", log(
        (coalesce(col("c12"), lit(0L)) + lit(k))
          / (coalesce(col("c1"), lit(0L)) + lit(k) * col("v"))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (if (rounded) graft.functions.ColumnFunctions.pround(avgLp, 6)
         else avgLp).as("avg_logprob"))
  }
}

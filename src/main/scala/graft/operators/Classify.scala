package graft.operators

import graft.functions.ColumnFunctions.pround
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification as pure DataFrame
  * aggregations — the quality/domain classifier stage of a curation
  * pipeline (CCNet/GPT-3-style source filtering), expressed closed-form so
  * a SQL oracle replays train AND score exactly.
  *
  * Smoothing is fixed at Laplace α=1, deliberately: with ln(α)=0 the
  * score of doc d under label ℓ decomposes as
  *
  *   score(d,ℓ) = ln d_ℓ − ln D − m_d·ln(N_ℓ + V)
  *                + Σ_{(t,ℓ) seen in training} tf_{d,t}·ln(c_{t,ℓ} + 1)
  *
  * where m_d counts d's tokens that exist in the training vocabulary at
  * all. Every unseen-(t,ℓ) pair contributes exactly 0, so scoring is ONE
  * token-keyed join against the seen (label, token) counts plus broadcast
  * per-label constants — the |labels|×|V| smoothed matrix is never
  * materialized. That is the 100 TB shape: training is two hash
  * aggregations over the token stream, scoring shuffles only on token.
  *
  * Argmax ties (after the 4-decimal parity round) break toward the
  * lexicographically smallest label.
  */
object Classify {

  /** (label, token) occurrence counts over the training docs under a
    * pluggable feature map (word tokens by default; char n-grams for
    * language ID). */
  private def tokenCounts(train: DataFrame, textCol: String,
      labelCol: String,
      feats: Column => Column = TextFunctions.tokens): DataFrame =
    train.select(col(labelCol).as("label"),
        explode(feats(col(textCol))).as("token"))
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("c"))

  /** Overlapping char n-grams of a text column — the language-ID feature
    * map (Cavnar & Trenkle 1994 n-gram profiles; the lid gate shape CCNet
    * runs ahead of everything else): lowercase, whitespace runs folded to
    * one "_" so word boundaries are features, "_" sentinels at both ends,
    * then every n-window. Pure codegen'd Column arithmetic (sequence +
    * transform + substr) so the whole feature map replays in a SQL
    * oracle; a text shorter than n yields its single padded window.
    */
  def charNgrams(text: Column, n: Int = 3): Column = {
    val s = concat(lit("_"), regexp_replace(lower(text), "\\s+", "_"),
      lit("_"))
    transform(sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
      i => s.substr(i, lit(n)))
  }

  /** Per-label doc and token totals plus the global doc count and
    * vocabulary size — a |labels|-row frame, always broadcast. */
  private def labelStats(train: DataFrame, idCol: String, textCol: String,
      labelCol: String, counts: DataFrame): DataFrame = {
    val perLabel = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .join(counts.groupBy(col("label")).agg(sum(col("c")).as("n_tokens")),
        Seq("label"))
    val globals = perLabel.agg(sum(col("n_docs")).as("n_docs_total"))
      .crossJoin(counts.select(col("token")).distinct()
        .agg(count(lit(1)).as("v_size")))
    perLabel.crossJoin(broadcast(globals))
  }

  /** Training inspection surface: per label the doc/token totals, the
    * log-prior, and the top-`k` tokens by count (ties to the smaller
    * token) with their smoothed log-likelihoods.
    */
  def nbTopTokens(train: DataFrame, idCol: String, textCol: String,
      labelCol: String, k: Int): DataFrame = {
    val counts = tokenCounts(train, textCol, labelCol)
    val stats = labelStats(train, idCol, textCol, labelCol, counts)
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("c").desc, col("token"))))
      .filter(col("rank") <= k)
      .join(broadcast(stats), Seq("label"))
      .select(col("label"), col("rank"), col("n_docs"), col("n_tokens"),
        col("v_size"),
        pround(log(col("n_docs").cast("double") / col("n_docs_total")), 6)
          .as("log_prior"),
        col("token"), col("c"),
        pround(log((col("c") + lit(1.0)) /
          (col("n_tokens") + col("v_size")).cast("double")), 6)
          .as("log_lik"))
  }

  /** Score `test` docs against the model trained on `train`; returns one
    * row per test doc: the true label, the argmax prediction, its rounded
    * score, and a correctness flag.
    */
  def nbClassify(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String): DataFrame =
    nbClassifyFeatures(train, test, idCol, textCol, labelCol,
      TextFunctions.tokens)

  /** The full per-(doc, label) score frame under a pluggable feature map
    * — (id, true_label, label, score), one row per test doc × training
    * label for docs with ANY training-vocabulary overlap (a zero-overlap
    * doc has no m_d row and is absent: the caller decides whether that
    * means "skip" ([[nbClassifyFeatures]]) or "unknown"
    * ([[langIdPredict]])). */
  private def nbScoresFeatures(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, labelCol: String,
      feats: Column => Column): DataFrame = {
    val counts = tokenCounts(train, textCol, labelCol, feats)
    val stats = labelStats(train, idCol, textCol, labelCol, counts)
    val tf = test.select(col(idCol).as("id"), col(labelCol).as("true_label"),
        explode(feats(col(textCol))).as("token"))
      .groupBy(col("id"), col("true_label"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // m_d: test tokens restricted to the training vocabulary (any label)
    val vocab = counts.select(col("token")).distinct()
    val mDoc = tf.join(vocab, Seq("token"), "left_semi")
      .groupBy(col("id"), col("true_label")).agg(sum(col("tf")).as("m"))
    // Σ tf·ln(c+1) over the SEEN (token, label) pairs — token-keyed join,
    // the only corpus-shaped shuffle in scoring
    val seen = tf.join(counts, Seq("token"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("tf") * log(col("c") + lit(1.0))).as("s_seen"))
    mDoc.crossJoin(broadcast(stats))
      .join(seen, Seq("id", "label"), "left")
      .select(col("id"), col("true_label"), col("label"),
        pround(log(col("n_docs").cast("double") / col("n_docs_total"))
          - col("m") * log((col("n_tokens") + col("v_size")).cast("double"))
          + coalesce(col("s_seen"), lit(0.0)), 4).as("score"))
  }

  /** [[nbClassify]] under a pluggable feature map — the same α=1
    * decomposition, scoring shuffle keyed on the feature. */
  def nbClassifyFeatures(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String,
      feats: Column => Column): DataFrame =
    nbScoresFeatures(train, test, idCol, textCol, labelCol, feats)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("score").desc, col("label"))))
      .filter(col("rank") === 1)
      .select(col("id").as("doc_id"), col("true_label"),
        col("label").as("pred_label"), col("score"),
        when(col("label") === col("true_label"), 1).otherwise(0)
          .as("correct"))

  /** LANGUAGE ID (the lid gate CCNet §3.1 runs before every other
    * filter; fastText-lid's job, as explainable NB): [[nbClassifyFeatures]]
    * over [[charNgrams]] char-3-gram profiles — training is two hash
    * aggregations over the gram stream, scoring one gram-keyed join, the
    * per-language constant table broadcast. Same output/rounding contract
    * as [[nbClassify]], so the whole gate (feature map included) replays
    * in a SQL oracle.
    */
  def langIdClassify(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String, n: Int = 3): DataFrame =
    nbClassifyFeatures(train, test, idCol, textCol, labelCol,
      charNgrams(_, n))

  /** Language prediction over UNLABELED docs (the [[QualityGate]] signal
    * shape): (doc_id, lang_pred, lang_score) — EXACTLY one row per input
    * doc. Any existing `labelCol` on `docs` is overwritten by the
    * internal placeholder.
    *
    * ABSTAIN semantics (the CCNet-style lid gate contract — a 100 TB
    * multilingual corpus contains languages outside any training set, and
    * force-assigning the nearest profile mislabels them): the argmax
    * language is assigned only when its 4-decimal-rounded score beats the
    * runner-up by at least `minMargin` log-units; a sub-margin doc maps
    * to `"und"` (ISO 639-3 undetermined) with its top score kept as
    * evidence, and a doc with ZERO training-vocabulary overlap (no
    * scoring row at all — e.g. a script the char-gram profiles never saw)
    * maps to `"und"` with a null score. `minMargin = 0.0` (the default)
    * assigns every scored doc — exact ties already break toward the
    * lexicographically smallest label — so the only behavior change vs
    * the force-assign shape is that unscorable docs now surface instead
    * of vanishing from the frame.
    */
  def langIdPredict(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, n: Int = 3,
      minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0: $minMargin")
    val top2 = nbScoresFeatures(train,
        docs.withColumn(labelCol, lit("")), idCol, textCol, labelCol,
        charNgrams(_, n))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("score").desc, col("label"))))
      .filter(col("rank") <= 2)
      .groupBy(col("id"))
      .agg(max(when(col("rank") === 1, col("label"))).as("best"),
        max(when(col("rank") === 1, col("score"))).as("best_score"),
        max(when(col("rank") === 2, col("score"))).as("second_score"))
    // a single-label training set has no runner-up: margin is vacuously
    // met (the gate then only separates scorable from unscorable docs)
    val assigned = top2.select(col("id").as("doc_id"),
      when(col("second_score").isNull ||
          col("best_score") - col("second_score") >= minMargin,
        col("best")).otherwise(lit("und")).as("lang_pred"),
      col("best_score").as("lang_score"))
    docs.select(col(idCol).as("doc_id"))
      .join(assigned, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("lang_pred"), lit("und")).as("lang_pred"),
        col("lang_score"))
  }

  /** Deterministic multilingual fixture over the documents table: four
    * language templates (en/de/fr/es — stopword-heavy running text, so
    * char-3-gram profiles separate them the way real lid features do)
    * with an id-varying numeral tail; every field replays by formula in
    * the oracle.
    */
  val langTemplates: Map[String, String] = Map(
    "en" -> "the house and the water are near the old street",
    "de" -> "das haus und das wasser sind nahe der alten strasse",
    "fr" -> "la maison et le pain sont pres de la vieille rue",
    "es" -> "la casa y el agua estan cerca de la calle vieja")

  /** The BREADTH fixture (q210): twelve languages across three scripts
    * (Latin incl. the heavily gram-overlapping Romance cluster, Cyrillic,
    * Greek), ORDERED — position = doc_id % 12, so every field replays by
    * formula. Stopword-heavy single-sentence profiles keep the NB
    * machinery honest about what actually separates languages at
    * char-3-gram altitude: the Romance neighbors (es/pt/it/fr/ro) share
    * dozens of grams and are told apart only by the full-profile
    * likelihood, not by any single distinctive gram. */
  val langTemplatesWide: Seq[(String, String)] = Seq(
    "en" -> "the house and the water are near the old street",
    "de" -> "das haus und das wasser sind nahe der alten strasse",
    "fr" -> "la maison et le pain sont pres de la vieille rue",
    "es" -> "la casa y el agua estan cerca de la calle vieja",
    "it" -> "la casa e il pane sono vicino alla vecchia strada",
    "pt" -> "a casa e a agua estao perto da rua velha",
    "nl" -> "het huis en het water zijn dicht bij de oude straat",
    "sv" -> "huset och vattnet ligger nara den gamla gatan",
    "pl" -> "dom i woda sa blisko starej ulicy",
    "ro" -> "casa si apa sunt aproape de strada veche",
    "ru" -> "дом и вода находятся рядом со старой улицей",
    "el" -> "το σπιτι και το νερο ειναι κοντα στον παλιο δρομο")

  /** Twelve-language corpus: language = position doc_id % 12 in
    * [[langTemplatesWide]], text = that profile plus the id-varying
    * numeral tail — one `element_at` over two literal arrays, fully
    * codegen'd, every field SQL-replayable. */
  def syntheticMultilingualCorpusWide(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val langs = array(langTemplatesWide.map(t => lit(t._1)): _*)
    val texts = array(langTemplatesWide.map(t => lit(t._2)): _*)
    val idx = (id % 12).cast("int") + 1
    docs.select(id, element_at(langs, idx).as("lang"),
      concat(element_at(texts, idx), lit(" n"),
        (id % 10).cast("string")).as("text"))
  }

  def syntheticMultilingualCorpus(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val lang = when(id % 4 === 0, "en").when(id % 4 === 1, "de")
      .when(id % 4 === 2, "fr").otherwise("es")
    val text = concat(
      when(id % 4 === 0, langTemplates("en"))
        .when(id % 4 === 1, langTemplates("de"))
        .when(id % 4 === 2, langTemplates("fr"))
        .otherwise(langTemplates("es")),
      lit(" n"), (id % 10).cast("string"))
    docs.select(id, lang.as("lang"), text.as("text"))
  }

  /** [[syntheticMultilingualCorpus]] plus an OUT-OF-SET residue class —
    * the abstain-path fixture: doc_id%5==4 is Russian (label "xx", a
    * language no training profile covers; Cyrillic, so its char-3-grams
    * are script-disjoint from the Latin templates), split into BOTH
    * unknown shapes a real corpus serves up — an even id carries no
    * Latin tail (ZERO training-vocabulary overlap → unscorable), an odd
    * id keeps a " n<digit>" tail (scored on two tail grams alone →
    * sub-margin). The unknown tail digit is id%3, NOT id%10: every
    * unknown id ends in 4 or 9 (id%5==4), and exactly those two digits
    * never reach a training tail (id%10∈{4,9} ⇒ id%5==4 ⇒ out-of-set),
    * so an id%10 tail would make every unknown zero-overlap and the
    * sub-margin residue class empty. The in-set classes keep the
    * 4-template formula so every field replays in SQL.
    */
  def syntheticMultilingualCorpusWithUnknown(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val ruTemplate = "пример текста на другом языке без общих слов"
    val lang = when(id % 5 === 4, "xx")
      .otherwise(when(id % 4 === 0, "en").when(id % 4 === 1, "de")
        .when(id % 4 === 2, "fr").otherwise("es"))
    val latin = concat(
      when(id % 4 === 0, langTemplates("en"))
        .when(id % 4 === 1, langTemplates("de"))
        .when(id % 4 === 2, langTemplates("fr"))
        .otherwise(langTemplates("es")),
      lit(" n"), (id % 10).cast("string"))
    val unknown = when(id % 2 === 0, lit(ruTemplate))
      .otherwise(concat(lit(ruTemplate), lit(" n"), (id % 3).cast("string")))
    docs.select(id, lang.as("lang"),
      when(id % 5 === 4, unknown).otherwise(latin).as("text"))
  }

  /** Binary NB LOG-ODDS — the fastText-style quality-classifier score
    * every curation pipeline thresholds on (GPT-3 §2.2, CCNet): for a
    * two-label training set, score(d, pos) − score(d, neg) under the α=1
    * decomposition above. The per-label terms telescope into ONE
    * token-keyed pass:
    *
    *   log_odds(d) = ln(d₊/d₋) − m_d·[ln(N₊+V) − ln(N₋+V)]
    *                 + Σ_t tf_{d,t}·[ln(c_{t,+}+1) − ln(c_{t,−}+1)]
    *
    * with c = 0 for the label that never saw the token (its ln(0+1)
    * contributes 0 — exactly nbClassify's unseen-pair semantics), so the
    * sum runs over the test doc's vocabulary-joined tokens only. One
    * (token → c₊,c₋) hash join plus a 1-row broadcast of the label
    * constants; `test` needs no label column. 4-decimal parity round
    * (the summed-ln convention). Output: (idCol, nb_log_odds).
    */
  def nbLogOdds(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String, posLabel: String): DataFrame = {
    val counts = tokenCounts(train, textCol, labelCol)
    // bounded driver collect BY CONSTRUCTION: one row per training label,
    // and the contract is exactly two of them
    val labels = train.select(col(labelCol)).distinct().collect()
      .map(_.getString(0)).sorted
    require(labels.length == 2 && labels.contains(posLabel),
      s"nbLogOdds needs exactly two training labels incl. '$posLabel': " +
        labels.mkString(", "))
    val wide = counts.groupBy(col("token")).agg(
      sum(when(col("label") === posLabel, col("c")).otherwise(0L))
        .as("c_pos"),
      sum(when(col("label") =!= posLabel, col("c")).otherwise(0L))
        .as("c_neg"))
    val consts = wide.agg(sum(col("c_pos")).as("n_pos"),
        sum(col("c_neg")).as("n_neg"), count(lit(1)).as("v_size"))
      .crossJoin(train.agg(
        sum(when(col(labelCol) === posLabel, 1L).otherwise(0L)).as("d_pos"),
        sum(when(col(labelCol) =!= posLabel, 1L).otherwise(0L)).as("d_neg")))
    val tf = test.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.join(wide, Seq("token"), "left_outer")
      .groupBy(col("id"))
      .agg(
        // m_d: test tokens present in the training vocabulary (any label)
        sum(when(col("c_pos").isNotNull, col("tf")).otherwise(0L)).as("m"),
        sum(col("tf") * (log(coalesce(col("c_pos"), lit(0L)) + lit(1.0)) -
          log(coalesce(col("c_neg"), lit(0L)) + lit(1.0)))).as("s"))
      .crossJoin(broadcast(consts))
      .select(col("id").as(idCol),
        pround(log(col("d_pos").cast("double") / col("d_neg"))
          - col("m") * (log((col("n_pos") + col("v_size")).cast("double"))
            - log((col("n_neg") + col("v_size")).cast("double")))
          + col("s"), 4).as("nb_log_odds"))
  }
}

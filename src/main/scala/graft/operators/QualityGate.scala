package graft.operators

import graft.functions.ColumnFunctions.pround
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composite quality GATE every curation pipeline runs between
  * cleaning and training (the CCNet / GPT-3 / RefinedWeb recipe): four
  * independent signals — duplicate-3-gram repetition, OOV rate against
  * the corpus top-k vocabulary, per-document boilerplate-line fraction,
  * and a binary NB quality-classifier log-odds — folded into ONE verdict
  * frame with PER-REASON drop attribution: each dropped document is
  * charged to the FIRST gate it fails in the cascade (cheap per-row
  * heuristics first, the classifier last), so per-reason drop counts sum
  * exactly to total drops and a curation run can publish where its data
  * went.
  *
  * Thresholds are SELF-CALIBRATING corpus quantiles (the q130 discipline:
  * length distributions — and repetition/OOV/quality distributions —
  * differ wildly across corpora, so absolute cutoffs don't transfer):
  * repetition and OOV drop the top (1−q) tail, the classifier drops the
  * bottom nbQ tail of log-odds. Boilerplate fraction keeps an ABSOLUTE
  * cutoff — "more than boilerMax of this document is template chrome" is
  * a policy statement, not a distributional one.
  *
  * Scale shape: repetition is per-row codegen'd work; OOV is one
  * token-keyed aggregation plus a top-k-row broadcast; the boilerplate
  * set is bounded by construction ([[Boilerplate]]) and broadcast; the NB
  * score is one token-keyed join plus a 1-row broadcast
  * ([[Classify.nbLogOdds]]). The assembled per-doc signal frame is
  * localCheckpointed once (narrow: five columns per doc) because both
  * the quantile calibration and the verdict projection consume it; the
  * quantile aggregation itself holds one counts-map per 4-decimal-rounded
  * signal — bounded by the rounding grid, never by corpus size.
  */
object QualityGate {

  /** Verdict frame: (idCol, rep_ratio, oov_rate, boiler_frac,
    * nb_log_odds, drop_reason ∈ {repetition, oov, boilerplate,
    * nb_quality, kept}, kept). `hiQuality` is the boolean training label
    * for the classifier (e.g. `col("source") === "curated"`), evaluated
    * over `docs` itself — the self-scored closed form, like the DSIR
    * fit. It must split the corpus: a batch where every document labels
    * the same way has no quality contrast for the classifier and fails
    * fast with a gate-level message.
    *
    * Optional FIFTH signal — language ID, the gate CCNet §3.1 runs FIRST
    * (a wrong-language page is dropped before any quality heuristic
    * spends work on it): pass `langTrain` (a labeled corpus with
    * `langLabelCol`) and `allowedLangs`; every doc gets a `lang_pred`
    * column ([[Classify.langIdPredict]] — char-3-gram NB, one gram-keyed
    * join plus a languages-row broadcast), and a prediction outside
    * `allowedLangs` drops with reason "language" at the HEAD of the
    * cascade. The prediction joins LEFT onto the signal frame and a
    * missing/null prediction reads as "und" — outside any allowedLangs —
    * so a doc the profiles cannot score (zero char-gram overlap: exactly
    * the non-Latin-script page a lid gate exists to drop) still gets its
    * one verdict row and is charged to "language", keeping the
    * one-row-per-doc / per-reason-drops-sum-to-total contract intact and
    * the rep/oov/nb quantile calibration over the FULL corpus.
    * `langMinMargin` is [[Classify.langIdPredict]]'s abstain threshold:
    * an argmax that beats the runner-up by less than this many log-units
    * abstains to "und" (and so drops) rather than mislabeling. Disabled
    * (the default) the verdict frame is column-exact with r14 — the q167
    * contract.
    */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, hiQuality: Column, repQ: Double = 0.97,
      oovQ: Double = 0.97, nbQ: Double = 0.10, boilerMax: Double = 0.4,
      vocabK: Int = 1000, boilerMinFrac: Double = 0.25,
      langTrain: Option[DataFrame] = None, langLabelCol: String = "lang",
      allowedLangs: Seq[String] = Nil,
      langMinMargin: Double = 0.0): DataFrame = {
    require(langTrain.isEmpty || allowedLangs.nonEmpty,
      "language gating needs a non-empty allowedLangs")
    require(repQ > 0 && repQ < 1 && oovQ > 0 && oovQ < 1 &&
      nbQ > 0 && nbQ < 1, "quantile thresholds must be in (0,1)")
    require(boilerMax > 0 && boilerMax <= 1,
      s"boilerMax must be in (0,1]: $boilerMax")
    val rep = docs.select(col(idCol).as("id"),
      TextFunctions.repetitionRatio(col(textCol), 3).as("rep_ratio"))
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(vocabK)
      .select(col("token"), lit(1L).as("iv"))
    val oov = toks.join(broadcast(vocab), Seq("token"), "left_outer")
      .groupBy(col("id"))
      .agg(pround(lit(1.0) -
        sum(coalesce(col("iv"), lit(0L))).cast("double") / count(lit(1)), 4)
        .as("oov_rate"))
    val bset = Boilerplate.boilerplateSets(docs, idCol, textCol, srcCol,
      boilerMinFrac)
    val boiler = docs
      .join(broadcast(bset), docs(srcCol) === col("src"), "left_outer")
      .select(col(idCol).as("id"),
        pround(size(filter(split(col(textCol), "\n"),
            l => Boilerplate.isBoiler(col("blines"), l))).cast("double") /
          size(split(col(textCol), "\n")), 4).as("boiler_frac"))
    val labeled = docs.withColumn("qlabel",
      when(hiQuality, "hi").otherwise("lo"))
    // the classifier needs BOTH classes in the corpus being gated — a
    // uniformly-labeled batch has no quality contrast to learn, which is
    // a caller configuration error, not a degradable case (one bounded
    // driver aggregate: two booleans)
    val sides = labeled.agg(
      max(when(col("qlabel") === "hi", true).otherwise(false)),
      max(when(col("qlabel") === "lo", true).otherwise(false))).head()
    require(sides.getBoolean(0) && sides.getBoolean(1),
      "qualityGate: the hiQuality predicate labels every document the " +
        "same way — the NB quality signal needs both hi and lo examples " +
        "in the gated corpus (check the predicate against this batch)")
    val nb = Classify.nbLogOdds(labeled, labeled, idCol, textCol,
      "qlabel", "hi").withColumnRenamed(idCol, "id")
    val four = rep.join(oov, Seq("id")).join(boiler, Seq("id"))
      .join(nb, Seq("id"))
    val signals = langTrain match {
      case None => four.localCheckpoint() // calibration agg + verdict
      case Some(lt) =>
        // LEFT join + null→"und": langIdPredict already emits one row per
        // doc, but the gate must not lose a verdict row even if the
        // prediction frame does — an unmatched doc is exactly the
        // unscorable page the language gate drops
        four.join(Classify.langIdPredict(lt, docs, idCol, textCol,
            langLabelCol, 3, langMinMargin)
            .withColumnRenamed("doc_id", "id")
            .select(col("id"), col("lang_pred")),
          Seq("id"), "left_outer")
          .withColumn("lang_pred", coalesce(col("lang_pred"), lit("und")))
          .localCheckpoint()
    }
    val cuts = signals.agg(
      expr(s"percentile(rep_ratio, $repQ)").as("rep_cut"),
      expr(s"percentile(oov_rate, $oovQ)").as("oov_cut"),
      expr(s"percentile(nb_log_odds, $nbQ)").as("nb_cut"))
    val langReason = langTrain match {
      case None    => when(lit(false), "language")
      case Some(_) => when(!col("lang_pred")
        .isInCollection(allowedLangs), "language")
    }
    val reason = langReason
      .when(col("rep_ratio") > col("rep_cut"), "repetition")
      .when(col("oov_rate") > col("oov_cut"), "oov")
      .when(col("boiler_frac") > boilerMax, "boilerplate")
      .when(col("nb_log_odds") < col("nb_cut"), "nb_quality")
      .otherwise("kept")
    val base = Seq(col("id").as(idCol), col("rep_ratio"), col("oov_rate"),
      col("boiler_frac"), col("nb_log_odds")) ++
      (if (langTrain.isDefined) Seq(col("lang_pred")) else Nil) ++
      Seq(reason.as("drop_reason"), (reason === "kept").as("kept"))
    signals.crossJoin(broadcast(cuts)).select(base: _*)
  }

  /** Gopher's filter word list (Rae et al. 2021, A1.1): a document must
    * contain at least `minStopWords` of these to count as running text. */
  private val GopherStopWords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER QUALITY RULES (Rae et al. 2021, Appendix A1.1) — the
    * rule-based document filter every large-scale curation pipeline runs
    * BEFORE any learned scorer, as one verdict frame with independent
    * per-rule flags (Gopher applies the rules conjunctively, so
    * `gopher_pass` is their AND — no cascade, unlike [[qualityGate]]'s
    * attributed drops):
    *
    *   r_word_count    word count in [minWords, maxWords]
    *   r_mean_word_len mean word length in [3, 10]
    *   r_symbol_ratio  '#'-or-'…'-carrying words ≤ 10% of words
    *   r_alpha_frac    words containing an alphabetic char ≥ 80%
    *   r_stop_words    ≥ minStopWords hits from Gopher's 8-word list
    *
    * Entirely per-row codegen'd expressions over the split token array —
    * no join, no shuffle, no state: the 100 TB shape is a bare projection
    * over the scan. Word-count bounds are parameters (Gopher's 50 min is
    * tuned to web pages; short-document corpora gate lower). Ratios are
    * 4-decimal parity-rounded so the verdict replays in any engine. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minStopWords: Int = 2): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords && minStopWords >= 0)
    val w = split(col(textCol), "\\s+")
    val n = size(w)
    val meanLen = pround(
      aggregate(w, lit(0.0), (acc, x) => acc + length(x)) / n, 4)
    val symRatio = pround(
      size(filter(w, x => x.contains("#") || x.contains("...")))
        .cast("double") / n, 4)
    val alphaFrac = pround(
      size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") / n, 4)
    val nStop = size(filter(w,
      x => x.isInCollection(GopherStopWords))).cast("long")
    docs.select(col(idCol), n.cast("long").as("n_words"),
        meanLen.as("mean_word_len"), symRatio.as("symbol_ratio"),
        alphaFrac.as("alpha_frac"), nStop.as("n_stop_words"))
      .withColumn("r_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_mean_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_symbol_ratio", col("symbol_ratio") <= 0.1)
      .withColumn("r_alpha_frac", col("alpha_frac") >= 0.8)
      .withColumn("r_stop_words", col("n_stop_words") >= minStopWords)
      .withColumn("gopher_pass",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_alpha_frac") &&
          col("r_stop_words"))
  }
}

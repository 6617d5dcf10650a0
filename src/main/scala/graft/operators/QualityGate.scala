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
    */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, hiQuality: Column, repQ: Double = 0.97,
      oovQ: Double = 0.97, nbQ: Double = 0.10, boilerMax: Double = 0.4,
      vocabK: Int = 1000, boilerMinFrac: Double = 0.25): DataFrame = {
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
    val signals = rep.join(oov, Seq("id")).join(boiler, Seq("id"))
      .join(nb, Seq("id"))
      .localCheckpoint() // consumed twice: calibration agg + verdict
    val cuts = signals.agg(
      expr(s"percentile(rep_ratio, $repQ)").as("rep_cut"),
      expr(s"percentile(oov_rate, $oovQ)").as("oov_cut"),
      expr(s"percentile(nb_log_odds, $nbQ)").as("nb_cut"))
    val reason = when(col("rep_ratio") > col("rep_cut"), "repetition")
      .when(col("oov_rate") > col("oov_cut"), "oov")
      .when(col("boiler_frac") > boilerMax, "boilerplate")
      .when(col("nb_log_odds") < col("nb_cut"), "nb_quality")
      .otherwise("kept")
    signals.crossJoin(broadcast(cuts))
      .select(col("id").as(idCol), col("rep_ratio"), col("oov_rate"),
        col("boiler_frac"), col("nb_log_odds"),
        reason.as("drop_reason"), (reason === "kept").as("kept"))
  }
}

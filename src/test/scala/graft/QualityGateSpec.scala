package graft

import graft.operators.QualityGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the composite quality gate: per-reason drop counts sum to
  * total drops (the attribution is a partition — every dropped doc is
  * charged to exactly one reason), the cascade replays from the
  * published signals (reason = first failing gate under the quantile
  * cuts recomputed from the output itself), precedence charges a
  * multi-failing doc to the earliest gate, and the verdict frame is
  * total (one row per input doc).
  */
class QualityGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The q167 fixture: sf0.001 docs with the footer injection. */
  private def injected = {
    Tables.documents(spark, TestSpark.sf0001).select(col("doc_id"),
      col("source"),
      concat(col("text"),
        when(col("doc_id") % 10 === 0,
          concat(lit("\nFOOTER_"), col("source"))).otherwise(lit("")))
        .as("text"))
  }

  private lazy val out = QualityGate.qualityGate(injected, "doc_id",
    "text", "source", hiQuality = col("source") === "src0",
    repQ = 0.97, oovQ = 0.97, nbQ = 0.10, boilerMax = 0.4,
    vocabK = 1000, boilerMinFrac = 0.08).collect()

  /** Spark's exact interpolated percentile (index = q·(n−1)). */
  private def pct(vs: Array[Double], q: Double): Double = {
    val s = vs.sorted
    val idx = q * (s.length - 1)
    val lo = idx.toInt
    if (lo == s.length - 1) s(lo)
    else s(lo) + (idx - lo) * (s(lo + 1) - s(lo))
  }

  test("verdict frame is total and attribution partitions the drops") {
    val n = injected.count()
    assert(out.length.toLong === n, "one verdict row per input doc")
    val byReason = out.groupBy(_.getString(5)).map { case (r, rows) =>
      r -> rows.length
    }
    val drops = out.count(!_.getBoolean(6))
    assert(byReason.filterNot(_._1 == "kept").values.sum === drops,
      "per-reason counts must sum to total drops")
    assert(byReason.getOrElse("kept", 0) === out.length - drops)
    // non-vacuity at this fixture: the gate drops SOMETHING from every
    // tail it calibrates, keeps the majority, and the injected footer
    // makes the boilerplate reason live
    assert(drops > 0 && drops < out.length / 2)
    assert(byReason.contains("boilerplate"),
      s"footer injection must fire the boilerplate gate: $byReason")
    assert(byReason.contains("nb_quality"),
      s"the p10 log-odds tail must fire the classifier gate: $byReason")
  }

  test("cascade replays from the published signals and quantile cuts") {
    val rep = out.map(_.getDouble(1))
    val oov = out.map(_.getDouble(2))
    val nb = out.map(_.getDouble(4))
    val (repCut, oovCut, nbCut) = (pct(rep, 0.97), pct(oov, 0.97),
      pct(nb, 0.10))
    val eps = 1e-9 // skip rows within an ulp-slop of a recomputed cut
    for (r <- out) {
      val (rr, ov, bf, lo) = (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))
      if (math.abs(rr - repCut) > eps && math.abs(ov - oovCut) > eps &&
          math.abs(lo - nbCut) > eps) {
        val expect =
          if (rr > repCut) "repetition"
          else if (ov > oovCut) "oov"
          else if (bf > 0.4) "boilerplate"
          else if (lo < nbCut) "nb_quality"
          else "kept"
        assert(r.getString(5) === expect,
          s"doc ${r.getLong(0)}: signals ($rr,$ov,$bf,$lo) vs cuts " +
            s"($repCut,$oovCut,$nbCut)")
        assert(r.getBoolean(6) === (expect == "kept"))
      }
    }
  }

  test("gopherRules: each rule trips on its hand-built pathology and " +
      "only there; the verdict is their conjunction") {
    val good = "the cat sat of the mat and dogs ran that way have fun " +
      "with words here now then" // 18 words, all alpha, stops, len 3-5
    val docs = Seq(
      (1L, good),
      (2L, "the of and that have"), // 5 words: word-count fails
      (3L, good + " " + "z" * 500), // one giant word: mean length fails
      (4L, good + " " + "# # #"), // 3 '#' of 21 words: symbol fails
      // 9 five-char numerics of 27 words: alpha fails, mean length holds
      (5L, good + " 11111 22222 33333 44444 55555 66666 77777 88888 99999"),
      (6L, "cat sat mat dog ran way fun words here now then hop " +
        "top pop got hot lot not")) // 18 words, zero stop hits
      .toDF("doc_id", "text")
    val out = QualityGate.gopherRules(docs, "doc_id", "text",
        minWords = 15, maxWords = 100000, minStopWords = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // schema: 0=id 1=n_words 2=mwl 3=sym 4=alpha 5=nstop then 5 flags + pass
    def flags(id: Long): Seq[Boolean] = (6 to 11).map(out(id).getBoolean)
    assert(flags(1L) === Seq(true, true, true, true, true, true))
    assert(flags(2L) === Seq(false, true, true, true, true, false))
    assert(flags(3L) === Seq(true, false, true, true, true, false))
    assert(flags(4L) === Seq(true, true, false, true, true, false))
    assert(flags(5L) === Seq(true, true, true, false, true, false))
    assert(flags(6L) === Seq(true, true, true, true, false, false))
    // exact statistics on the clean doc: 18 words, 2+ stop hits
    assert(out(1L).getLong(1) === 18L)
    assert(out(1L).getDouble(4) === 1.0)
  }

  test("five-signal cascade: language heads the cascade, the attribution " +
      "still partitions the drops, and the disabled path is column-exact") {
    import graft.operators.Classify
    // every 9th doc is re-texted with the German template (an id numeral
    // tail keeps them distinct); the lid NB trains on the deterministic
    // 4-language fixture and the gate allows everything BUT de
    val base = injected.withColumn("text",
      when(col("doc_id") % 9 === 0,
        concat(lit(Classify.langTemplates("de")), lit(" n"),
          (col("doc_id") % 10).cast("string")))
        .otherwise(col("text")))
    val langTrain = Classify.syntheticMultilingualCorpus(
      spark.range(0, 200).select(col("id").as("doc_id")))
    val out5 = QualityGate.qualityGate(base, "doc_id", "text", "source",
      hiQuality = col("source") === "src0", boilerMinFrac = 0.08,
      langTrain = Some(langTrain), langLabelCol = "lang",
      allowedLangs = Seq("en", "fr", "es")).collect()
    val cols = QualityGate.qualityGate(base, "doc_id", "text", "source",
      hiQuality = col("source") === "src0", boilerMinFrac = 0.08,
      langTrain = Some(langTrain), langLabelCol = "lang",
      allowedLangs = Seq("en", "fr", "es")).columns.toSeq
    assert(cols === Seq("doc_id", "rep_ratio", "oov_rate", "boiler_frac",
      "nb_log_odds", "lang_pred", "drop_reason", "kept"))
    // total + partition (now over five reasons)
    assert(out5.length.toLong === base.count())
    val reasonIdx = cols.indexOf("drop_reason")
    val keptIdx = cols.indexOf("kept")
    val langIdx = cols.indexOf("lang_pred")
    val byReason = out5.groupBy(_.getString(reasonIdx)).view
      .mapValues(_.length).toMap
    val drops = out5.count(!_.getBoolean(keptIdx))
    assert(byReason.filterNot(_._1 == "kept").values.sum === drops)
    // language heads the cascade: reason "language" ⇔ pred ∉ allowed
    out5.foreach { r =>
      val disallowed = r.getString(langIdx) == "de"
      assert((r.getString(reasonIdx) == "language") === disallowed,
        s"doc ${r.get(0)}: pred=${r.getString(langIdx)} " +
          s"reason=${r.getString(reasonIdx)}")
    }
    // the re-texted docs ARE the de predictions (template matches train)
    out5.filter(r => r.getLong(0) % 9 == 0).foreach(r =>
      assert(r.getString(langIdx) === "de", s"doc ${r.get(0)}"))
    assert(byReason.contains("language") && byReason("language") > 0)
    // disabled path: the r14 column contract, no lang column
    val out4cols = QualityGate.qualityGate(base, "doc_id", "text", "source",
      hiQuality = col("source") === "src0", boilerMinFrac = 0.08)
      .columns.toSeq
    assert(out4cols === Seq("doc_id", "rep_ratio", "oov_rate",
      "boiler_frac", "nb_log_odds", "drop_reason", "kept"))
  }

  test("language gate totality: an unscorable (zero-gram-overlap) doc " +
      "keeps its one verdict row, reads 'und', and is charged to " +
      "'language' — the drops still partition") {
    import graft.operators.Classify
    // every 11th doc re-texted in a script no Latin char-gram profile
    // ever saw — the exact page the r15 inner join silently deleted
    val base = injected.withColumn("text",
      when(col("doc_id") % 11 === 0,
        lit("пример текста на другом языке без общих слов"))
        .otherwise(col("text")))
    val langTrain = Classify.syntheticMultilingualCorpus(
      spark.range(0, 200).select(col("id").as("doc_id")))
    val out = QualityGate.qualityGate(base, "doc_id", "text", "source",
      hiQuality = col("source") === "src0", boilerMinFrac = 0.08,
      langTrain = Some(langTrain), langLabelCol = "lang",
      allowedLangs = Seq("en", "de", "fr", "es")).collect()
    assert(out.length.toLong === base.count(),
      "one verdict row per doc INCLUDING unscorable ones")
    val cols = Seq("doc_id", "rep_ratio", "oov_rate", "boiler_frac",
      "nb_log_odds", "lang_pred", "drop_reason", "kept")
    val langIdx = cols.indexOf("lang_pred")
    val reasonIdx = cols.indexOf("drop_reason")
    out.filter(_.getLong(0) % 11 == 0).foreach { r =>
      assert(r.getString(langIdx) === "und", s"doc ${r.get(0)}")
      assert(r.getString(reasonIdx) === "language", s"doc ${r.get(0)}")
    }
    val drops = out.count(!_.getBoolean(cols.indexOf("kept")))
    val byReason = out.groupBy(_.getString(reasonIdx)).view
      .mapValues(_.length).toMap
    assert(byReason.filterNot(_._1 == "kept").values.sum === drops)
  }

  test("a uniformly-labeled corpus fails fast with a gate-level message") {
    val uniform = injected.limit(50)
    val e = intercept[IllegalArgumentException] {
      QualityGate.qualityGate(uniform, "doc_id", "text", "source",
        hiQuality = lit(true)).collect()
    }
    assert(e.getMessage.contains("labels every document the same way"),
      e.getMessage)
  }

  test("precedence charges a multi-failing doc to the earliest gate") {
    // a synthetic doc failing repetition AND oov AND boilerplate: 35
    // identical tokens (rep_ratio ≈ 1, all tokens out of any vocab drawn
    // from the normal docs) — must be charged to 'repetition'
    val weird = (1 to 35).map(_ => "zzqx").mkString(" ")
    val base = injected.limit(200)
      .select(col("doc_id") + 1000000, col("source"), col("text"))
      .toDF("doc_id", "source", "text")
    val spiked = base.unionByName(
      Seq((1L, "src1", weird)).toDF("doc_id", "source", "text"))
    val v = QualityGate.qualityGate(spiked, "doc_id", "text", "source",
      hiQuality = col("source") === "src0", repQ = 0.97, oovQ = 0.97,
      nbQ = 0.10, boilerMax = 0.4, vocabK = 100, boilerMinFrac = 0.08)
      .filter(col("doc_id") === 1L).collect()
    assert(v.length === 1)
    assert(v.head.getString(5) === "repetition",
      s"multi-failure must attribute to the first gate: ${v.head}")
  }
}

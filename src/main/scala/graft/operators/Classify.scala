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
    // both explode-heavy pre-shuffle pipelines spread to the core count
    // when the scan is narrower (single-split files serialize the gram
    // explosion on one core; a production-scale scan is already parallel
    // and Spread is a no-op)
    val counts = tokenCounts(Spread.toCores(train, col(idCol)),
      textCol, labelCol, feats)
    // ONE occurrence row per test token — no per-doc tf pre-aggregation:
    // the (id,label) aggregation below partial-aggregates map-side BEFORE
    // its exchange, compressing to ≤ |docs|·|labels| rows per partition
    // (tighter than the old (id,token,tf) shuffle), and Σ over
    // occurrences of ln-terms equals the old Σ tf·ln-terms up to FP
    // re-association, which the 4-decimal parity round absorbs
    val tf = Spread.toCores(test, col(idCol))
      .select(col(idCol).as("id"), col(labelCol).as("true_label"),
        explode(feats(col(textCol))).as("token"))
    // ONE token-keyed pass over the test stream (was three: a left_semi
    // vocabulary probe for m_d, a (token,label) counts join for s_seen,
    // and an (id,label) re-join gluing them — guide §2.3/§2.4): fold the
    // per-token label counts into a |labels|-bounded map (vocab-sized
    // regroup of the counts table), join the stream once on token, and
    // emit per (token, label) the FULL likelihood contribution
    //   tf·(ln(c+1) − ln(N_ℓ+V))
    // — unseen (token,label) pairs contribute exactly −tf·ln(N_ℓ+V)
    // (ln(0+1)=0), so summing contributions over a doc's in-vocabulary
    // tokens reproduces s_seen − m_d·ln(N_ℓ+V) without ever computing
    // m_d separately. The per-label constants ride in as one broadcast
    // 1-row array; the prior lands after the (id,label) aggregation via
    // a broadcast join. Same score arithmetic up to FP re-association,
    // which the 4-decimal parity round absorbs; zero-overlap docs still
    // produce no rows (inner join), preserving the absent-doc contract.
    // vocabulary-sized (one row per distinct token, a ≤|labels|-entry
    // count map each) and materialized ONCE: the training corpus is
    // exploded exactly one time per invocation — the stats collect below
    // and the scoring join both read these blocks
    val tokmap = counts.groupBy(col("token"))
      .agg(map_from_entries(collect_list(struct(col("label"), col("c"))))
        .as("cm"))
      .localCheckpoint()
    // The per-label constants are MODEL METADATA — one row per training
    // label, bounded by the label set (≤ a dozen languages / a handful of
    // quality classes), the same dim-sized-frame class as the store
    // operators' bounded collects. Collecting them once and folding them
    // into LITERALS removes every re-materialization of the old stats
    // subtree (built once as a broadcast relation, its exchange cascade
    // re-executed per consumer) and turns the final per-label constants
    // join into constant-folded arithmetic. ONE bounded collect action —
    // three small subtrees unioned so AQE materializes them concurrently:
    // per-label doc counts (a column-pruned scan of train, no explode),
    // per-label token totals and the vocabulary size (both re-aggregated
    // from the checkpointed vocabulary-sized tokmap, NOT from a second
    // pass over the corpus).
    val a = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("label"), col("n_docs"),
        lit(null).cast("long").as("n_tokens"), lit(0).as("g"))
    val b = tokmap.select(explode(map_entries(col("cm"))).as("e"))
      .groupBy(col("e.key").as("label"))
      .agg(sum(col("e.value")).as("n_tokens"))
      .select(col("label"), lit(null).cast("long").as("n_docs"),
        col("n_tokens"), lit(1).as("g"))
    val v = tokmap.agg(count(lit(1)).as("vd"))
      .select(lit(null).cast("string").as("label"), col("vd"),
        lit(null).cast("long").as("n_tokens"), lit(2).as("g"))
    val collected = a.unionAll(b).unionAll(v).collect()
    val plRows = collected.filter(_.getAs[Int]("g") == 0)
    val vSize = collected.find(_.getAs[Int]("g") == 2)
      .map(_.getAs[Long]("n_docs")).getOrElse(0L)
    val nTokens = collected.filter(_.getAs[Int]("g") == 1)
      .map(r => r.getAs[String]("label") -> r.getAs[Long]("n_tokens")).toMap
    // inner-join semantics of the old stats frame: a label with docs but
    // no tokens carries no counts row and is excluded everywhere,
    // INCLUDING the doc-count total the priors normalize by
    val statsRows = plRows.filter(r => nTokens.contains(r.getAs[String]("label")))
    if (statsRows.isEmpty)
      // empty training set: the old crossJoin produced zero rows
      return tf.select(col("id"), col("true_label"),
        lit("").as("label"), lit(0.0).as("score")).limit(0)
    val nDocsTotal = statsRows.map(_.getAs[Long]("n_docs")).sum
    // (label, ln(N_ℓ+V)) literal array and label → log-prior literal map;
    // the logs stay Column expressions (constant-folded), so the engine's
    // own ln is used — same arithmetic as the old column-space formula
    val sa = array(statsRows.map { r =>
      struct(lit(r.getAs[String]("label")).as("label"),
        log(lit((nTokens(r.getAs[String]("label")) + vSize).toDouble))
          .as("lnNV"))
    }.toIndexedSeq: _*)
    val priorM = map(statsRows.flatMap { r =>
      Seq(lit(r.getAs[String]("label")),
        log(lit(r.getAs[Long]("n_docs").toDouble / nDocsTotal.toDouble)))
    }.toIndexedSeq: _*)
    // the ln arithmetic runs ONCE PER VOCABULARY TOKEN (projected onto
    // the tokmap side, |V|·|labels| logs total), not once per test
    // occurrence × label: the per-occurrence hot loop is join-probe +
    // pre-computed-array explode + partial-agg accumulate only
    val tokarr = tokmap.select(col("token"), transform(sa,
      s => struct(s.getField("label").as("label"),
        (log(coalesce(element_at(col("cm"),
            s.getField("label")), lit(0L)) + lit(1.0))
          - s.getField("lnNV")).as("contrib"))).as("arr"))
    val contribs = tf.join(tokarr, Seq("token"))
      .select(col("id"), col("true_label"), explode(col("arr")).as("lc"))
      .select(col("id"), col("true_label"),
        col("lc.label").as("label"), col("lc.contrib").as("contrib"))
    contribs
      .groupBy(col("id"), col("true_label"), col("label"))
      .agg(sum(col("contrib")).as("body"))
      .select(col("id"), col("true_label"), col("label"),
        pround(element_at(priorM, col("label")) + col("body"), 4)
          .as("score"))
  }

  /** [[nbClassify]] under a pluggable feature map — the same α=1
    * decomposition, scoring shuffle keyed on the feature. */
  def nbClassifyFeatures(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String,
      feats: Column => Column): DataFrame =
    // argmax as a hash aggregation instead of a rank window: min over
    // (−score, label) structs reproduces the (score desc, label asc)
    // tie-break exactly, without the window's sort (negation is an IEEE
    // sign-bit flip — order-exact and lossless on re-negation)
    nbScoresFeatures(train, test, idCol, textCol, labelCol, feats)
      .groupBy(col("id"), col("true_label"))
      .agg(min(struct((-col("score")).as("ns"), col("label"))).as("top"))
      .select(col("id").as("doc_id"), col("true_label"),
        col("top.label").as("pred_label"),
        (-col("top.ns")).as("score"),
        when(col("top.label") === col("true_label"), 1).otherwise(0)
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
    // top-2 as one hash aggregation (no rank window): sort the ≤|labels|
    // (−score, label) structs per doc — ascending = (score desc, label
    // asc), the exact window tie-break — and slice the head pair
    val top2 = nbScoresFeatures(train,
        docs.withColumn(labelCol, lit("")), idCol, textCol, labelCol,
        charNgrams(_, n))
      .groupBy(col("id"))
      .agg(slice(array_sort(collect_list(
        struct((-col("score")).as("ns"), col("label")))), 1, 2).as("t2"))
      .select(col("id"),
        col("t2").getItem(0).getField("label").as("best"),
        (-col("t2").getItem(0).getField("ns")).as("best_score"),
        when(size(col("t2")) > 1,
          -col("t2").getItem(1).getField("ns")).as("second_score"))
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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for corpus curation at scale: deterministic
  * hash-based sampling (reproducible across runs and engines, unlike
  * `df.sample`'s RNG which depends on partitioning) and per-stratum
  * quota sampling.
  */
object Sampling {

  /** Keep a deterministic ~`fraction` of rows, selected by key hash —
    * the reproducible alternative to `sample()`: the same key always gets
    * the same verdict, on any cluster, any partitioning.
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol)), lit(buckets)) < (fraction * buckets).toLong)
  }

  /** PORTABLE deterministic sampling: selection by the first 8 hex chars
    * of md5(key as string), compared lexicographically against the
    * fraction's hex threshold — md5 hex is identical in every engine
    * (Spark, DuckDB, Hive, Postgres...), so an external system can replay
    * the exact row selection. [[deterministicSample]] (xxhash64) is the
    * cheaper engine-native default; use this variant when the sample
    * membership itself must be auditable across engines.
    */
  def deterministicSamplePortable(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    // fraction=1.0 would render threshold 0x100000000 as the 9-char string
    // "100000000", which sorts BELOW most 8-char hex prefixes — short-circuit
    // the boundary fractions instead of comparing against an out-of-range key
    if (fraction >= 1.0) df
    else if (fraction <= 0.0) df.filter(lit(false))
    else {
      // floor(fraction · 2^32) as 8 lowercase hex chars; md5 hex is lowercase
      // everywhere, so string order == numeric order
      val threshold = f"${(fraction * 4294967296.0).toLong}%08x"
      df.filter(substring(md5(col(keyCol).cast("string")), 1, 8) < lit(threshold))
    }
  }

  /** Portable twin of [[stratifiedQuota]]: per-stratum quota in
    * md5-hex-of-key order — replayable by any engine with md5 and
    * row_number.
    */
  def stratifiedQuotaPortable(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(md5(col(keyCol).cast("string")), col(keyCol))))
      .filter(col("__rn") <= quota)
      .drop("__rn")

  /** Exactly `quota` rows per stratum (fewer if the stratum is smaller),
    * chosen deterministically by key hash order — bounded output per
    * group regardless of skew.
    */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(xxhash64(col(keyCol)), col(keyCol))))
      .filter(col("__rn") <= quota)
      .drop("__rn")

  /** Per-stratum TOKEN-budget take (the unit that actually matters for a
    * training mixture — [[stratifiedQuota]] caps rows, this caps tokens):
    * within each stratum, walk rows in md5(key) order and keep every row
    * that STARTS before the budget is exhausted, i.e. whose running token
    * total (exclusive of itself) is < `budget`. Deterministic,
    * partitioning-independent, engine-replayable; the prefix sum is one
    * window per stratum — strata scan in parallel, no global order.
    * Output: input columns + `n_tok` (the weight used) + `start_tok`
    * (tokens consumed before this row). A null weight counts as 0 — the
    * row rides free rather than poisoning the running sum (a null in the
    * prefix sum would silently drop every later row in the stratum). The
    * input must not already have `n_tok`/`start_tok` columns.
    */
  def tokenBudgetTake(df: DataFrame, stratumCol: String, keyCol: String,
      weight: org.apache.spark.sql.Column, budget: Long): DataFrame = {
    require(budget >= 1, "need budget >= 1")
    val clash = df.columns.toSet.intersect(Set("n_tok", "start_tok"))
    require(clash.isEmpty,
      s"tokenBudgetTake appends ${clash.mkString(", ")} — rename the input column(s)")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", coalesce(weight.cast("long"), lit(0L)))
      .withColumn("start_tok", sum(col("n_tok")).over(w) - col("n_tok"))
      .filter(col("start_tok") < budget)
  }

  /** Source-mixing rates: given target proportions per stratum (the "data
    * mixture" of a training recipe), compute the largest total corpus that
    * honours them without upsampling any stratum, and each stratum's keep
    * rate toward it. Pure relational arithmetic over the per-stratum
    * counts — the (tiny) rates table then drives [[deterministicSample]]
    * per stratum.
    *
    * Output: (stratum, n_rows, target_frac, n_keep, rate) where
    * n_keep = round(target_frac · N_out), N_out = min_s(n_s / p_s)
    * over strata with p_s > 0; strata absent from `targets` get rate 0.
    */
  def mixingRates(df: DataFrame, stratumCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.values.forall(_ >= 0))
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.toDF(stratumCol, "target_frac")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_rows"))
    val joined = counts.join(tgt, Seq(stratumCol), "left_outer")
      .na.fill(0.0, Seq("target_frac"))
    // fail fast when no positive-target stratum exists in the data — the
    // min() capacity aggregate would otherwise be null and every n_keep /
    // rate would come back silently null
    require(joined.filter(col("target_frac") > 0).limit(1).count() > 0,
      s"mixingRates: no stratum present in the data has a positive target " +
        s"(targets: ${targets.keys.mkString(", ")})")
    // N_out = min over strata of n_s / p_s (capacity of the scarcest source)
    val nOut = joined.filter(col("target_frac") > 0)
      .select(min(col("n_rows") / col("target_frac")).as("n_out"))
    joined.crossJoin(nOut)
      .withColumn("n_keep",
        graft.functions.ColumnFunctions.pround(
          col("target_frac") * col("n_out"), 0).cast("long"))
      .withColumn("rate",
        graft.functions.ColumnFunctions.pround(
          col("n_keep").cast("double") / col("n_rows"), 6))
      .select(col(stratumCol), col("n_rows"), col("target_frac"),
        col("n_keep"), col("rate"))
  }

  /** Leakage-safe train/val/test split: the split key is the CONTENT hash
    * (md5 of the text), not the row id, so byte-identical duplicates can
    * never straddle splits — the classic eval-contamination bug when a
    * corpus is split by id before dedup finishes. Assignment compares the
    * first 8 md5 hex chars against the cumulative-fraction thresholds of
    * the 32-bit hex space; deterministic, partitioning-independent, and
    * engine-portable (the q99 DuckDB oracle replays it verbatim). For
    * near-duplicate safety, pass an already-deduped corpus or key on a
    * canonical representative (e.g. [[graft.operators.Dedup]] survivors).
    *
    * `splits`: ordered (name, fraction) with fractions summing to 1.
    * Returns `df` plus a `split` column.
    */
  def leakageSafeSplit(df: DataFrame, textCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0)
      && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must be non-negative and sum to 1")
    val h = substring(md5(col(textCol)), 1, 8)
    // upper threshold per split (all but the last, which takes the rest)
    val uppers = splits.init
      .zip(splits.scanLeft(0.0)(_ + _._2).tail)
      .map { case ((name, _), cum) =>
        (name, f"${(cum * 4294967296.0).toLong}%08x")
      }
    val assign = uppers match {
      case Nil => lit(splits.last._1)
      case (n0, t0) +: rest =>
        rest.foldLeft(when(h < lit(t0), lit(n0))) {
          case (acc, (n, t)) => acc.when(h < lit(t), lit(n))
        }.otherwise(lit(splits.last._1))
    }
    df.withColumn("split", assign)
  }

  /** Temperature-scaled mixing weights: w_s ∝ p_s^(1/T) where p_s is the
    * stratum's natural share of `weight` (tokens, usually) — the standard
    * multilingual/multi-source rebalancing rule (mT5's τ-sampling;
    * exponent alpha = 1/T, alpha < 1 upweights scarce sources). Also
    * reports each stratum's expected epoch count at `budgetTokens`, the
    * number every data recipe checks before committing (epochs ≫ 1 on a
    * small source means it will be memorized).
    *
    * Pure arithmetic over the per-stratum aggregate (one shuffle over
    * stratum keys; the normalizing sum is a one-row broadcast). Output:
    * (stratum, n_tokens, natural_frac, mix_frac, epochs_at_budget).
    */
  def temperatureWeights(df: DataFrame, stratumCol: String,
      weight: org.apache.spark.sql.Column, alpha: Double,
      budgetTokens: Long): DataFrame = {
    require(alpha > 0 && budgetTokens >= 1)
    val r = graft.functions.ColumnFunctions.pround(_: org.apache.spark.sql.Column, 6)
    val counts = df.groupBy(col(stratumCol))
      .agg(sum(weight.cast("long")).as("n_tokens"))
    val tot = counts.agg(sum(col("n_tokens")).as("n_total"),
      sum(pow(col("n_tokens").cast("double"), alpha)).as("z"))
    counts.crossJoin(broadcast(tot))
      .withColumn("mix_frac_raw",
        pow(col("n_tokens").cast("double"), alpha) / col("z"))
      .select(col(stratumCol), col("n_tokens"),
        r(col("n_tokens") / col("n_total")).as("natural_frac"),
        r(col("mix_frac_raw")).as("mix_frac"),
        r(col("mix_frac_raw") * budgetTokens / col("n_tokens"))
          .as("epochs_at_budget"))
  }

  /** Frequent-items profile per column (Spark's stat.freqItems — the
    * Karp-Papadimitriou-Shenker sketch): items with frequency above
    * `support`, per column. One pass, no shuffle of raw data.
    */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double): DataFrame =
    df.stat.freqItems(cols.toArray, support)

  /** The hashed-ngram bucket stream behind [[dsirWeights]]: one row per
    * (carried columns, bucket) for every unigram AND bigram of `textCol`,
    * bucketed by the first 4 hex chars of md5 mod `nBuckets` — md5 so the
    * ENTIRE computation (hashing included) replays verbatim in any engine
    * (the [[deterministicSamplePortable]] portability discipline). */
  private[operators] def ngramBuckets(df: DataFrame, textCol: String,
      nBuckets: Int, carry: org.apache.spark.sql.Column*): DataFrame = {
    val t = split(col(textCol), "\\s+")
    // slice lengths are size-1 (0 for a one-token doc → empty bigram list)
    val bi = zip_with(slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1), (a, b) => concat(a, lit(" "), b))
    df.select((carry :+ explode(concat(t, bi)).as("g")): _*)
      .withColumn("b", expr(
        s"""CAST(pmod(
           (instr('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 4096 +
           (instr('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 256 +
           (instr('0123456789abcdef', substr(md5(g), 3, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substr(md5(g), 4, 1)) - 1),
           $nBuckets) AS INT)"""))
      .drop("g")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much its hashed n-gram bag looks drawn from the
    * TARGET domain rather than from the raw pool — the standard
    * data-selection step between crawl cleaning and pretraining. Features
    * are unigrams + bigrams hashed into `nBuckets` md5 buckets
    * (engine-portable, so the hashing itself replays in the oracle);
    * bucket distributions are Laplace-smoothed (+`alpha`), and a
    * document's weight is log w(x) = Σ_ngrams [ln p̂_target(b) −
    * ln p̂_raw(b)], rounded to the 4-decimal parity round (a sum of
    * hundreds of ln terms — the q154 NB-score precision convention).
    *
    * Scale shape: bucket-keyed count aggregations with map-side partials
    * over target and raw (the classic two-pass DSIR recipe — the raw
    * corpus is scanned once to FIT the bucket distribution and once to
    * SCORE; at 100 TB a deployment would persist the nBuckets-row fit
    * and score many batches against it), an nBuckets-row log-ratio table
    * BROADCAST back (bounded by construction, never by data), and one
    * doc-keyed aggregation. Nothing is all-pairs; no global sort.
    * Selection at scale thresholds on the weight or takes a distributed
    * top-k ([[dsirSelect]] — TakeOrderedAndProject, never a
    * single-partition window). */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 256, alpha: Double = 1.0): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 65536,
      s"nBuckets must be in [2, 65536]: $nBuckets")
    require(alpha > 0, s"alpha must be > 0: $alpha")
    // ONE raw-corpus pass serving both the FIT and the SCORE: the explode
    // + md5 stream pre-aggregates to a (doc, bucket, n) frame — bounded
    // by docs × nBuckets, map-side combined — and both consumers below
    // read the SAME (id, b) exchange. The dedup into one physical
    // scan+explode is an AQE-runtime exchange-reuse effect (the STATIC
    // plan still formats two Generates), so the claim is judged by
    // measurement, not a plan pin: BENCH_ISOLATED_r15.json records the
    // fuse at −44% in-suite / −32% fresh-JVM on q162/q164. The r14 shape
    // exploded the corpus once per consumer — the suite's two slowest
    // queries paid the dominant md5 cost twice.
    // both md5-ngram explosions spread to core count when the scan is
    // narrower (single-split files serialize the dominant md5 stream on
    // one core; a no-op at production scan widths — Spread.toCores)
    val perDocB = ngramBuckets(Spread.toCores(raw, col(idCol)),
        textCol, nBuckets, col(idCol))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n"))
    val cr = perDocB.groupBy(col("b")).agg(sum(col("n")).as("cr"))
    val ct = ngramBuckets(Spread.toCores(target, col(textCol)),
        textCol, nBuckets)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val tot = cr.agg(sum(col("cr")).as("tr")).crossJoin(
      ct.agg(sum(col("ct")).as("tt")))
    // every bucket a raw doc can hit appears in cr, so the left join
    // covers the per-doc probe; target-absent buckets smooth to α
    val wt = cr.join(ct, Seq("b"), "left_outer").crossJoin(tot)
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + alpha) /
            (col("tt") + alpha * nBuckets)) -
          log((col("cr") + alpha) / (col("tr") + alpha * nBuckets)))
          .as("lr"))
    perDocB.join(broadcast(wt), Seq("b"))
      .groupBy(col(idCol))
      .agg(graft.functions.ColumnFunctions.pround(
        sum(col("lr") * col("n")), 4).as("log_weight"))
  }

  /** The `k` raw documents most target-like under [[dsirWeights]] —
    * deterministic resampling (weight desc, id asc): planned as a
    * distributed TakeOrderedAndProject, never a global window. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, nBuckets: Int = 256,
      alpha: Double = 1.0): DataFrame = {
    require(k >= 1)
    dsirWeights(raw, target, idCol, textCol, nBuckets, alpha)
      .orderBy(col("log_weight").desc, col(idCol)).limit(k)
  }
}

package graft.operators

import graft.functions.TextFunctions.shingles
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag (and drop)
  * documents that share word n-grams with an evaluation/benchmark set —
  * the standard leakage guard run before LLM training (n-gram overlap
  * decontamination as described in the GPT-3, PaLM and Llama reports;
  * typically n in 8–13).
  *
  * Scale shape: the benchmark side collapses to DISTINCT n-grams and
  * broadcasts (eval sets are tiny next to a training corpus), so the
  * corpus never shuffles — its n-grams stream through a map-side hash
  * join and the per-doc hit counts partial-aggregate before the one
  * doc_id-keyed exchange. Joining on the raw n-gram string keeps the
  * operator exact (no hash-collision false positives).
  */
object Decontaminate {

  /** Per contaminated document: (idCol, n_grams, n_hits,
    * contaminated_frac) where n_hits counts the doc's DISTINCT n-grams
    * that appear anywhere in `bench`. Documents with zero overlap are
    * absent (inner join) — the common case, kept off the shuffle.
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val grams = corpus
      .select(col(idCol), array_distinct(shingles(col(textCol), n)).as("gs"))
      .withColumn("n_grams", size(col("gs")))
      .select(col(idCol), col("n_grams"), explode(col("gs")).as("g"))
    val benchGrams = bench
      .select(explode(array_distinct(shingles(col(textCol), n))).as("g"))
      .distinct()
    grams
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("contaminated_frac",
        graft.functions.ColumnFunctions.pround(
          col("n_hits").cast("double") / col("n_grams"), 4))
  }

  /** Cross-split n-gram novelty: for every document of the `target` split,
    * the fraction of its DISTINCT word n-grams never seen anywhere in the
    * `seen` split — the leakage/novelty curve reported when validating a
    * train/val split ([[Sampling.leakageSafeSplit]] guards byte-identical
    * duplicates; this measures what near-duplicate overlap remains).
    *
    * Unlike [[contaminationReport]] the reference side here is another
    * corpus split, not a tiny benchmark — so nothing broadcasts: the seen
    * side collapses to DISTINCT n-grams (partial-aggregated before the
    * wire) and the overlap is a shuffled left semi-style join on the
    * n-gram string, then one doc_id-keyed count. Every target doc is
    * reported, including fully-novel ones (novelty 1.0).
    */
  def crossSplitNovelty(target: DataFrame, seen: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val grams = target
      .select(col(idCol), array_distinct(shingles(col(textCol), n)).as("gs"))
      .withColumn("n_grams", size(col("gs")).cast("long"))
      .select(col(idCol), col("n_grams"), explode(col("gs")).as("g"))
    val seenGrams = seen
      .select(explode(array_distinct(shingles(col(textCol), n))).as("g"))
      .distinct()
      .withColumn("hit", lit(1L))
    grams
      .join(seenGrams, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(max(col("n_grams")).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_seen"))
      .withColumn("novelty",
        graft.functions.ColumnFunctions.pround(
          lit(1.0) - col("n_seen").cast("double") / col("n_grams"), 4))
  }

  /** Cross-source n-gram containment matrix: for every ordered source
    * pair (a, b) sharing at least one gram, the fraction of a's DISTINCT
    * n-grams that also occur in b — "how much of source a is textually
    * covered by source b", the pairwise overlap table a dataset card
    * reports before mixing sources (mirror-site and syndicated-content
    * detection).
    *
    * Scale shape: each source collapses to DISTINCT (source, gram) rows
    * first (partial-aggregated), so the gram join's per-key fanout is
    * bounded by the SOURCE COUNT squared — never by gram frequency — and
    * the output is |sources|² rows. One gram-keyed shuffle, one pair
    * aggregation.
    */
  def crossSourceContainment(docs: DataFrame, stratumCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val g = docs
      .select(col(stratumCol).as("stratum"),
        explode(array_distinct(shingles(col(textCol), n))).as("g"))
      .distinct()
    val sizes = g.groupBy(col("stratum")).agg(count(lit(1)).as("n_grams_a"))
    val shared = g.select(col("stratum").as("source_a"), col("g"))
      .join(g.select(col("stratum").as("source_b"), col("g")), Seq("g"))
      .filter(col("source_a") =!= col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnRenamed("stratum", "source_a"), Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("n_grams_a"), col("n_shared"),
        graft.functions.ColumnFunctions.pround(
          col("n_shared").cast("double") / col("n_grams_a"), 4).as("containment"))
  }

  /** A bench-side frame for a gram-overlap join, broadcast ONLY when its
    * row count stays under `maxBroadcast`. The probe is LIMIT-bounded
    * (`limit(cap + 1).count()` — LocalLimit short-circuits each
    * partition), so deciding costs at most cap+1 rows, never a full
    * aggregate; above the cap the frame is returned unhinted and the
    * overlap join degrades to a shuffle instead of OOMing the driver.
    * This pins the documented "eval sets are tiny" assumption of
    * [[contaminationReport]] for callers whose "benchmark" is actually
    * derived from the corpus (the q129 shape): the broadcast stays the
    * default fast path, the corpus-proportional case stays correct.
    * The probe costs one extra evaluation of `bench`'s plan — fine for
    * the scan+project derivations used here; pin upstream first if the
    * derivation ever becomes expensive.
    */
  def sizeBoundedBench(bench: DataFrame, maxBroadcast: Int = 1 << 20): DataFrame =
    if (bench.limit(maxBroadcast + 1).count() > maxBroadcast) bench
    else broadcast(bench)

  /** The corpus minus every document overlapping `bench` above
    * `maxFrac` of its distinct n-grams (0.0 = drop on any shared
    * n-gram). Anti-join on the flagged id set — one broadcast-able key
    * exchange.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, maxFrac: Double = 0.0): DataFrame = {
    val flagged = contaminationReport(corpus, bench, idCol, textCol, n)
      .filter(col("contaminated_frac") > maxFrac)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------------
  // Bloom-prefiltered decontamination — the 100 TB regime of
  // contaminationReport. When the benchmark union is large (every eval
  // suite ever published: ~1e8 distinct 8-grams × ~60 bytes ≈ 6 GB of
  // strings), broadcasting the gram SET no longer fits; a Bloom filter at
  // ~14 bits/element is ~170 MB — broadcastable. The filter kills
  // (1 - fpp) of the corpus grams MAP-SIDE so only true hits plus a fpp
  // sliver reach the exact verify join; the final report stays EXACT
  // because every bloom survivor is re-checked against the real gram set
  // (false positives die in the inner join, and a Bloom filter has no
  // false negatives).
  //
  // The filter is plain Column arithmetic end to end — double hashing
  // h1 + i·h2 (Kirsch–Mitzenmacher) over xxhash64, bit_or-packed into
  // m/64 longs — so build, probe and verify all stay inside whole-stage
  // codegen: no UDFs, no non-codegen expressions on the hot path.
  // ---------------------------------------------------------------------

  private def bloomH1(g: Column): Column = xxhash64(lit("bloom_h1"), g)
  private def bloomH2(g: Column): Column = xxhash64(lit("bloom_h2"), g)

  /** Bit positions (k probes, Kirsch–Mitzenmacher double hashing) of one
    * gram in an `mBits`-bit filter. Both hashes are reduced mod mBits
    * BEFORE the probe arithmetic so `h1 + i·h2` stays ≤ (k+1)·mBits —
    * no long overflow under ANSI mode for any realistic geometry.
    */
  private def bloomPositions(g: Column, mBits: Long, k: Int): Seq[Column] = {
    val h1 = pmod(bloomH1(g), lit(mBits))
    val h2 = pmod(bloomH2(g), lit(mBits))
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits)))
  }

  /** Build the packed filter words from a single-column frame of grams
    * (`gramCol`). Distributed build: positions explode, bit_or packs per
    * 64-bit word, and only the ≤ mBits/64 aggregated words reach the
    * driver — the collect is bounded by the filter geometry, never by
    * the gram count.
    */
  def bloomBuild(grams: DataFrame, gramCol: String, mBits: Long,
      k: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    val nWords = (mBits / 64).toInt
    val words = grams
      .select(explode(array(bloomPositions(col(gramCol), mBits, k): _*)).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64L)).cast("int")).as("m"))
      .groupBy(col("w")).agg(call_function("bit_or", col("m")).as("bits"))
      .collect()
    val arr = new Array[Long](nWords)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership probe against packed filter words: k codegen'd bit tests
    * over an array literal (element_at is O(1)). At this scale the words
    * ship inside the plan; past ~2^27 bits swap the literal for a
    * broadcast-variable-backed Expression — the probe arithmetic is
    * unchanged.
    */
  def bloomMightContain(g: Column, words: Seq[Long], mBits: Long,
      k: Int): Column = {
    val lw = typedLit(words)
    bloomPositions(g, mBits, k).map { p =>
      val word = element_at(lw, shiftright(p, 6).cast("int") + 1)
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** [[contaminationReport]] with a Bloom prefilter on the corpus-gram
    * stream: identical output (exact — survivors are verified against
    * the true gram set), but the only UNCONDITIONAL broadcast is the
    * mBits/8-byte filter; the verify join's bench side goes through
    * [[sizeBoundedBench]] (broadcast when it fits, shuffle when it
    * doesn't — and post-prefilter the corpus side of that shuffle is the
    * fpp sliver, not the corpus). Sizing: mBits ≈ 1.44 · |bench grams| ·
    * log2(1/fpp), k ≈ 0.7 · mBits / |bench grams|.
    */
  def bloomContaminationReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      mBits: Long = 1L << 20, k: Int = 5): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(shingles(col(textCol), n))).as("g"))
      .distinct()
    val words = bloomBuild(benchGrams, "g", mBits, k)
    val grams = corpus
      .select(col(idCol), array_distinct(shingles(col(textCol), n)).as("gs"))
      .withColumn("n_grams", size(col("gs")))
      .select(col(idCol), col("n_grams"), explode(col("gs")).as("g"))
      .filter(bloomMightContain(col("g"), words, mBits, k))
    grams
      .join(sizeBoundedBench(benchGrams), Seq("g"))
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("contaminated_frac",
        graft.functions.ColumnFunctions.pround(
          col("n_hits").cast("double") / col("n_grams"), 4))
  }
}

package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-rule training (Sennrich et al. 2016) as an
  * iterative Spark job — the tokenizer-training half of a text pipeline
  * (TextFunctions.bpePretokenize is the inference half).
  *
  * The classic scale trick: iterate over the WORD-FREQUENCY table, not
  * the corpus. One corpus pass builds (word, freq); every BPE iteration
  * is then an aggregation over the vocabulary — invariant to corpus
  * size. Each iteration is fully distributed (adjacent-pair counts via
  * explode + groupBy, weighted by word frequency); only the single
  * winning pair per iteration comes to the driver, exactly like a
  * k-means centroid update. Lineage is truncated each iteration
  * (localCheckpoint) so the plan does not deepen with merge count.
  *
  * At 100 TB you train on a bounded sample of the word table (cap via
  * `maxVocab` — highest-frequency words carry essentially all pair
  * mass), which is how production tokenizers are trained too.
  */
object BpeTrainer {

  /** One corpus pass: whitespace words → (word, freq), optionally capped
    * to the `maxVocab` most frequent words (deterministic tie-break).
    */
  def wordFrequencies(docs: DataFrame, textCol: String,
      maxVocab: Int = 100000): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxVocab)

  /** Fold one learned merge (x, y) into each word's symbol array,
    * leftmost-first (standard BPE greedy application). Pure HOF — no UDF;
    * runs over the vocabulary table, never the corpus.
    */
  private def applyMerge(syms: org.apache.spark.sql.Column, x: String, y: String) =
    aggregate(syms,
      expr("CAST(array() AS ARRAY<STRING>)"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(x) && s === lit(y),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(x + y))))
        .otherwise(concat(acc, array(s))))

  /** Learn up to `nMerges` merge rules from the corpus. Returns the
    * ordered merge list; stops early when no adjacent pair occurs at
    * least `minCount` times.
    */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
      nMerges: Int, maxVocab: Int = 100000, minCount: Long = 2L): Seq[(String, String)] = {
    var vocab = wordFrequencies(docs, textCol, maxVocab)
      .select(col("freq"), split(col("word"), "").as("syms"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val top = vocab
        .filter(size(col("syms")) > 1)
        .select(col("freq"), explode(
          arrays_zip(slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("x"), col("p.1").as("y"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("x"), col("y"))
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getAs[Long]("n") < minCount) done = true
      else {
        val (x, y) = (top.head.getAs[String]("x"), top.head.getAs[String]("y"))
        merges += ((x, y))
        vocab = vocab
          .select(col("freq"), applyMerge(col("syms"), x, y).as("syms"))
          .localCheckpoint()
        i += 1
      }
    }
    merges.result()
  }

  /** The learned segmentation: word → subword array after all merges —
    * the lookup table an encoder joins the token stream against (corpus
    * encoding is then a broadcast join, never a per-doc merge loop).
    */
  def segmentation(spark: SparkSession, docs: DataFrame, textCol: String,
      merges: Seq[(String, String)], maxVocab: Int = 100000): DataFrame = {
    val base = wordFrequencies(docs, textCol, maxVocab)
      .select(col("word"), split(col("word"), "").as("syms"))
    // checkpoint every few merges: nesting all M folds into one column
    // expression would deepen the tree linearly in M
    merges.grouped(8).foldLeft(base) { (df, group) =>
      group.foldLeft(df) { case (d, (x, y)) =>
        d.select(col("word"), applyMerge(col("syms"), x, y).as("syms"))
      }.localCheckpoint()
    }.select(col("word"), col("syms").as("subwords"))
  }

  /** Encode a corpus against a learned segmentation: ONE broadcast join
    * of the tokenized stream against the (word → subwords) lookup — the
    * corpus never runs a per-document merge loop. Words outside the
    * capped training vocabulary fall back to character symbols, which is
    * exactly their segmentation under no applicable merges (the same
    * greedy fold applied to an unseen word could only merge pairs the
    * vocab table would also have merged — but rather than approximate,
    * the fallback IS the no-merge base case, the standard open-vocab
    * treatment).
    *
    * Output: (id, n_words, n_tokens, tokens) with `tokens` the subword
    * stream in document order (ordered re-assembly via sort-by-position,
    * not collect_list order). Per-row array size is bounded by document
    * length — chunk long documents first ([[graft.operators.Chunking]])
    * exactly as a tokenizer service would.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      segmentation: DataFrame): DataFrame =
    docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\s+")).as(Seq("wpos", "word")))
      .filter(length(col("word")) > 0)
      .join(broadcast(segmentation.select(col("word"), col("subwords"))),
        Seq("word"), "left_outer")
      .select(col("id"), col("wpos"),
        coalesce(col("subwords"), split(col("word"), "")).as("subs"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_words"),
        flatten(transform(array_sort(collect_list(struct(col("wpos"), col("subs")))),
          s => s.getField("subs"))).as("tokens"))
      .select(col("id"), col("n_words"), size(col("tokens")).as("n_tokens"),
        col("tokens"))
}

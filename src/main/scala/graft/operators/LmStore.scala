package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted bigram language-model store — the count tables of
  * [[LanguageModel]] as an on-disk, incrementally-maintained artifact.
  * This is the store with the cleanest fold algebra of the family: every
  * statistic is a COUNT, and counts of disjoint document batches add, so
  * a generation per ingested batch folds by plain sum at read and
  * compaction is the same sum written down. The production shape the
  * LanguageModel scaladoc promises ("count tables a pipeline would
  * persist and reuse across scoring runs") made real: train once, absorb
  * each new crawl increment for the cost of counting THAT batch, score
  * any document set against the frozen register without ever re-reading
  * the training corpus.
  *
  * Layout (the index-store shape — one `gen=<g>` directory per ingested
  * batch, appends never rewrite old files, readers fold, compaction
  * merges; the `_MANIFEST` generation list is the single commit point,
  * [[Generations]]):
  *
  *   meta/                      one row (n_shards)
  *   bigrams/gen=<g>/shard=<s>/   (w1, w2, c) — fold by sum
  *   unigrams/gen=<g>/shard=<s>/  (w1, c) — bigram-context counts, fold
  *       by sum; sharded by the SAME key (w1) as bigrams so a scoring
  *       batch prunes both tables with one probed-shard set
  *   tokens/gen=<g>/            (w) — this generation's distinct tokens;
  *       the ground truth V folds from (distinct over the union is exact)
  *   docreg/gen=<g>/            (id) — ingested-doc registry backing the
  *       append-only guard (re-ingesting a doc would double its counts)
  *   vtot/gen=<g>/              one (v, mark) row — the TOTAL distinct
  *       token count over the whole tokens surface as of this
  *       generation's write, stamped with the registry size as a
  *       monotone marker (docs are append-only, so the row with the
  *       largest mark is the latest state). Scoring reads THIS — one row
  *       per generation — never a vocab-sized distinct: V's O(vocab)
  *       aggregation is charged to the write that changed it, not to
  *       every scoring call (the folded-posting-heads discipline of the
  *       index store, applied to a non-summable statistic via a
  *       latest-wins marker instead of a sum)
  *
  * Generation names: "g<k>" for batch build/append (auto-numbered),
  * caller-chosen "b<batchId>" for stream appends
  * ([[graft.streaming.LmStream]]), "c<n>" for compacted generations.
  * Every generation write OVERWRITES its own gen directory, so
  * re-driving a generation converges — and stays invisible until the
  * manifest references it.
  *
  * 100 TB shape: appends cost one count pass over the batch; scoring
  * prunes the count scans to the shards of the scored batch's own vocab
  * (probed driver-side, bounded by nShards BY CONSTRUCTION); the shuffle
  * in every stage is keyed by token text with map-side partial combine.
  */
object LmStore {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def shardOf(w: Column, nShards: Int) =
    pmod(xxhash64(w), lit(nShards.toLong)).cast("int")

  private def readMeta(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/meta").select(col("n_shards")).head().getInt(0)

  private val surfaces = Seq("bigrams", "unigrams", "tokens", "docreg", "vtot")

  private def surface(spark: SparkSession, dir: String, sub: String,
      gens: Seq[String]): DataFrame =
    Generations.readSurface(spark, dir, sub, gens)

  /** Count the batch once and write one generation of every surface.
    * `gens` is the full generation list the finished write will comprise
    * (the committed manifest plus `gen` itself) — the vtot recount folds
    * the tokens/docreg surfaces over exactly that list. */
  private def writeGeneration(batch: DataFrame, idCol: String,
      textCol: String, dir: String, gen: String, nShards: Int,
      gens: Seq[String]): Unit = {
    val bg = LanguageModel.bigramRows(batch, idCol, textCol)
      .withColumn("shard", shardOf(col("w1"), nShards))
      .localCheckpoint() // one tokenize+zip evaluation for the two count writes
    bg.groupBy(col("shard"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$dir/bigrams/gen=$gen")
    bg.groupBy(col("shard"), col("w1")).agg(count(lit(1)).as("c"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$dir/unigrams/gen=$gen")
    batch.select(explode(split(col(textCol), "\\s+")).as("w")).distinct()
      .write.mode("overwrite").parquet(s"$dir/tokens/gen=$gen")
    batch.select(col(idCol).as("id")).distinct()
      .write.mode("overwrite").parquet(s"$dir/docreg/gen=$gen")
    bg.unpersist()
    // the write that changed V pays for recounting it (over the tokens
    // surface INCLUDING this generation); a replay recomputes over the
    // then-current state, so its row is never stale-but-max
    val s = batch.sparkSession
    surface(s, dir, "tokens", gens)
      .agg(countDistinct(col("w")).as("v"))
      .crossJoin(surface(s, dir, "docreg", gens)
        .agg(count(lit(1)).as("mark")))
      .select(col("v"), col("mark"))
      .write.mode("overwrite").parquet(s"$dir/vtot/gen=$gen")
  }

  /** Build a fresh persisted LM store under `dir` from the training
    * corpus (any previous store there is removed). */
  def lmBuild(trainDocs: DataFrame, idCol: String, textCol: String,
      dir: String, nShards: Int = 16): Unit = {
    require(nShards >= 1)
    val spark = trainDocs.sparkSession
    import spark.implicits._
    fsOf(spark, dir).delete(new Path(dir), true)
    writeGeneration(trainDocs, idCol, textCol, dir, "g0", nShards, Seq("g0"))
    Seq(nShards).toDF("n_shards")
      .write.mode("overwrite").parquet(s"$dir/meta")
    // the manifest flip commits the build ([[Generations]])
    Generations.commit(spark, dir, Seq("g0"))
  }

  /** Absorb a NEW training batch for the cost of counting the batch: its
    * counts land as one generation; readers fold by sum, so the folded
    * register equals one trained on the union of all ingested batches.
    * Append-only contract: a doc id enters the register exactly once
    * (re-ingesting would double its counts), enforced against the stored
    * doc registry. For at-least-once stream delivery use
    * [[lmAppendOrReplay]] — a redelivered batch would trip this guard.
    */
  def lmAppend(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, dir: String): Unit = {
    val committed = Generations.live(spark, dir)
    val dupe = surface(spark, dir, "docreg", committed).select(col("id"))
      .join(batch.select(col(idCol).as("id")), Seq("id"), "left_semi")
    require(dupe.isEmpty,
      "lmAppend: batch contains doc ids already in the register — " +
        "the append-only contract forbids re-ingesting a document")
    val gen = Generations.nextName(spark, dir, surfaces, 'g')
    writeGeneration(batch, idCol, textCol, dir, gen, readMeta(spark, dir),
      committed :+ gen)
    Generations.add(spark, dir, gen)
  }

  /** Replay-safe append for STREAM-triggered ingestion
    * ([[graft.streaming.LmStream]]): the batch's five surface writes all
    * target `gen=<gen>` with OVERWRITE, so an at-least-once redelivery —
    * even after a crash that committed only some of the five — rewrites
    * the same directories and converges; doc ids already ingested by a
    * DIFFERENT generation are genuine re-ingestion and fail fast. `gen`
    * must not collide with the batch ("g<k>") or compaction ("c0")
    * namespaces — use "b<batchId>".
    */
  def lmAppendOrReplay(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, dir: String, gen: String): Unit = {
    require(gen.nonEmpty &&
      !(gen.length > 1 && (gen.head == 'g' || gen.head == 'c') &&
        gen.tail.forall(_.isDigit)),
      s"lmAppendOrReplay: generation name '$gen' collides with the " +
        "batch/compaction namespace — use a distinct prefix, e.g. b<batchId>")
    val committed = Generations.live(spark, dir)
    val others = surface(spark, dir, "docreg", committed)
      .filter(col("gen") =!= gen).select(col("id"))
      .join(batch.select(col(idCol).as("id")), Seq("id"), "left_semi")
    require(others.isEmpty,
      "lmAppendOrReplay: batch contains doc ids already ingested by a " +
        "DIFFERENT generation — genuine re-ingestion, not a replay")
    writeGeneration(batch, idCol, textCol, dir, gen, readMeta(spark, dir),
      (committed :+ gen).distinct)
    Generations.add(spark, dir, gen)
  }

  /** Score a document set against the stored register WITHOUT re-reading
    * the training corpus: bigram/context counts fold the generations by
    * sum, V reads the one-row-per-generation vtot stats (latest-wins marker
    * fold — never a vocab-sized distinct), unseen bigrams get the true
    * smoothing floor k/(k·V) ([[LanguageModel.bigramLogProbAgainst]]'s
    * semantics — and therefore [[LanguageModel.bigramLogProb]]'s when
    * `docs` IS the ingested corpus; q135's oracle). The count scans are
    * pruned to the shards of the scored batch's own vocabulary — probed
    * driver-side, bounded by nShards by construction, so a small scoring
    * batch reads a fraction of the register no matter how many batches
    * were ever ingested.
    */
  def lmScore(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, dir: String, k: Double = 1.0): DataFrame = {
    val nShards = readMeta(spark, dir)
    // one checkpointed evaluation serves the probe collect AND the scoring
    // join: a bigram whose shard went unprobed would left-join to null and
    // silently score as unseen, so the two sides must see the same rows.
    // pinLocal is wrong here (docs can be corpus-sized — this must stay an
    // executor-side frame); the checkpoint blocks are reclaimed by the
    // ContextCleaner when the returned frame is collected and dropped.
    // The probed-shard set itself is a distinct-shard aggregate — bounded
    // by nShards BY CONSTRUCTION, never by the batch
    val bg = LanguageModel.bigramRows(docs, idCol, textCol)
      .localCheckpoint()
    val probed = bg.select(shardOf(col("w1"), nShards).as("s"))
      .distinct().collect().map(_.getInt(0))
    // one manifest resolution — all three surfaces score the same snapshot
    val gens = Generations.live(spark, dir)
    def pruned(sub: String) = surface(spark, dir, sub, gens)
      .filter(col("shard").isin(probed.map(Integer.valueOf).toIndexedSeq: _*))
    val c12 = pruned("bigrams").groupBy(col("w1"), col("w2"))
      .agg(sum(col("c")).as("c12"))
    val c1 = pruned("unigrams").groupBy(col("w1"))
      .agg(sum(col("c")).as("c1"))
    // latest-wins fold of the one-row-per-generation vocab stats: one
    // tiny scan, never a vocab-sized distinct at scoring time
    val vocab = surface(spark, dir, "vtot", gens)
      .orderBy(col("mark").desc, col("v").desc).limit(1).select(col("v"))
    LanguageModel.scoreTail(bg, c12, c1, vocab, k)
  }

  /** Compact the store's committed generations into one: bigram/context
    * counts merge by sum, token sets by distinct, vtot keeps its
    * max-marker row, the doc registry passes through (disjoint across
    * generations). Correctness never depends on compaction (readers
    * fold); it bounds the generation and file count. Generations in
    * `keepGens` stay referenced untouched (a stream maintainer MUST keep
    * every generation its checkpoint has not committed — see
    * [[lmAppendOrReplay]]).
    *
    * Crash and concurrent-reader safety per the [[Generations]] manifest
    * protocol — fold to a new `gen=c<n>`, flip the manifest, sweep the
    * folded directories one cycle later; single WRITER still required.
    */
  def lmCompact(spark: SparkSession, dir: String,
      keepGens: Set[String] = Set.empty): Unit = {
    Generations.sweepUnreferenced(spark, dir, surfaces, keepGens)
    val liveGens = Generations.live(spark, dir)
    val foldGens = liveGens.filterNot(keepGens)
    // nothing to fold: no foldable gens, or a lone already-compacted one
    if (foldGens.isEmpty ||
      (foldGens.sizeIs == 1 && foldGens.head.startsWith("c"))) return
    val cGen = Generations.nextName(spark, dir, surfaces, 'c')
    def fold(sub: String, parts: Seq[String])(f: DataFrame => DataFrame): Unit =
      f(surface(spark, dir, sub, foldGens).drop("gen"))
        .write.mode("overwrite")
        .partitionBy(parts: _*).parquet(s"$dir/$sub/gen=$cGen")
    fold("bigrams", Seq("shard")) {
      _.groupBy(col("shard"), col("w1"), col("w2")).agg(sum(col("c")).as("c"))
    }
    fold("unigrams", Seq("shard")) {
      _.groupBy(col("shard"), col("w1")).agg(sum(col("c")).as("c"))
    }
    fold("tokens", Nil)(_.distinct())
    fold("docreg", Nil)(identity)
    // latest-wins statistic: the fold keeps the max-marker row
    fold("vtot", Nil)(_.orderBy(col("mark").desc, col("v").desc).limit(1))
    Generations.commit(spark, dir, cGen +: liveGens.filter(keepGens))
  }
}

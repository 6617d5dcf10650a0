package graft

import graft.operators.{Generations, Indexing}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the inverted index and its persisted lifecycle: the posting
  * head stays bounded under maximal document frequency (the 100 TB
  * stopword case), build + append equals a batch rebuild, appends are
  * fail-fast on re-ingestion, stats serve from the folded per-generation
  * heads (never the postings store), compaction folds every surface to a
  * single generation without changing the served surface, and lookups
  * prune to the probed shards.
  */
class IndexingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    // "common" appears in EVERY doc; "tok<i>" is unique to doc i;
    // "dup" appears twice per doc to exercise tf > df
    (i.toLong, s"common dup dup tok$i")
  }.toDF("doc_id", "text")

  private def genDirs(dir: String, surface: String): Seq[String] = {
    val d = new java.io.File(s"$dir/$surface")
    if (!d.exists()) Nil
    else d.listFiles().toSeq.map(_.getName).filter(_.startsWith("gen="))
  }

  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }

  test("a token present in every doc still yields a postingCap-length head") {
    val got = Indexing.invertedIndex(corpus(40), "doc_id", "text",
      minDf = 1L, postingCap = 10)
    val common = got.filter($"token" === "common").collect().head
    assert(common.getAs[Long]("doc_freq") === 40L)
    assert(common.getAs[Long]("total_tf") === 40L)
    assert(common.getAs[String]("postings_head") === (0 until 10).mkString(","))
    val dup = got.filter($"token" === "dup").collect().head
    assert(dup.getAs[Long]("doc_freq") === 40L)
    assert(dup.getAs[Long]("total_tf") === 80L)
  }

  test("persisted index: build + append equals a batch rebuild; lookup spans generations") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString + "/idx"
    Indexing.indexBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      dir, nShards = 8)
    Indexing.indexAppend(docs.filter($"doc_id" % 2 === 1), "doc_id", "text", dir)

    val stats = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
    val served = stats.orderBy("token").collect().toSeq
    val rebuilt = Indexing.invertedIndex(docs, "doc_id", "text",
      minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    assert(served === rebuilt)

    // the stats serve path folds the STORED heads — it must never scan
    // the postings store (serving cost is O(heads + stats), not O(index))
    val postScans = scans(stats.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
    assert(postScans.isEmpty, "indexStats must not scan the postings store")

    // a universal token's postings must surface ids from both generations
    val firstTok = rebuilt.head.getAs[String]("token")
    val lk = Indexing.indexLookup(spark, dir, Seq(firstTok))
      .select($"id").as[Long].collect()
    assert(lk.nonEmpty)

    // TF-IDF served from the same store equals the recompute
    val tfidfServed = Indexing.tfIdfFromIndex(spark, dir, k = 3)
      .orderBy("id", "token").collect().toSeq
    val tfidfRebuilt = Indexing.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
      .orderBy("id", "token").collect().toSeq
    assert(tfidfServed === tfidfRebuilt)
  }

  test("appends land as FLAT segments; compaction folds them into the sharded layout") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_seg").toString + "/idx"
    Indexing.indexBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      dir, nShards = 8)
    Indexing.indexAppend(docs.filter($"doc_id" % 2 === 1), "doc_id", "text", dir)
    def names(sub: String, gen: String): Seq[String] = {
      val d = new java.io.File(s"$dir/$sub/gen=$gen")
      if (d.exists()) d.listFiles().toSeq.map(_.getName) else Nil
    }
    // the build generation is directory-partitioned, one file per shard
    val g0 = names("postings", "g0").filter(_.startsWith("shard="))
    assert(g0.nonEmpty, "build generation must be shard-partitioned")
    g0.foreach { sd =>
      val files = new java.io.File(s"$dir/postings/gen=g0/$sd").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files === 1, s"one file per shard dir, $sd has $files")
    }
    // the append generation is a flat segment: shard stays a data column,
    // file count tracks the batch (AQE coalesces the small shuffle), and
    // NO per-shard directories are created — the O(nShards)-file-creates
    // append cost the r8 scale probe measured is structurally gone
    for (sub <- Seq("postings", "stats", "heads")) {
      val g1 = names(sub, "g1")
      assert(g1.nonEmpty, s"$sub append generation missing")
      assert(!g1.exists(_.startsWith("shard=")),
        s"$sub append must be a flat segment, found ${g1.mkString(",")}")
      assert(g1.count(_.endsWith(".parquet")) <= 4,
        s"$sub segment file count must track the batch")
    }
    // serving folds both layouts identically
    val served = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    assert(served === Indexing.invertedIndex(docs, "doc_id", "text",
      minDf = 5L, postingCap = 10).orderBy("token").collect().toSeq)
    // compaction re-shards the segments: a lone c0, partitioned again
    Indexing.indexCompact(spark, dir)
    val c0 = names("postings", "c0").filter(_.startsWith("shard="))
    assert(c0.nonEmpty, "compaction must fold segments into shard dirs")
    assert(Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq === served)
  }

  test("an EMPTY batch append is harmless: flat empty generation, serving unchanged") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_empty").toString + "/idx"
    Indexing.indexBuild(docs, "doc_id", "text", dir, nShards = 4)
    val before = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    Indexing.indexAppend(docs.filter(lit(false)), "doc_id", "text", dir)
    // the empty segment generation is committed but contributes nothing
    assert(graft.operators.Generations.live(spark, dir) === Seq("g0", "g1"))
    assert(Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq === before)
    assert(graft.operators.Retrieval.bm25FromIndex(spark,
      docs.filter($"doc_id" < 2), "doc_id", "text", dir, k = 5).count() > 0)
    // and compaction folds it away with everything else
    Indexing.indexCompact(spark, dir)
    assert(Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq === before)
  }

  test("indexCompact folds the manifest to one generation without changing the served surface") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_cmp").toString + "/idx"
    Indexing.indexBuild(docs.filter($"doc_id" % 3 === 0), "doc_id", "text", dir, nShards = 4)
    Indexing.indexAppend(docs.filter($"doc_id" % 3 === 1), "doc_id", "text", dir)
    Indexing.indexAppend(docs.filter($"doc_id" % 3 === 2), "doc_id", "text", dir)
    for (s <- Seq("postings", "stats", "heads", "doclen", "consts"))
      assert(genDirs(dir, s).size === 3, s"$s: expected 3 generations pre-compaction")
    val before = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    val beforeBm25 = graft.operators.Retrieval.bm25FromIndex(spark,
      docs.filter($"doc_id" < 3), "doc_id", "text", dir, k = 10)
      .orderBy("query_id", "rank").collect().toSeq

    // concurrent-reader grace: this plan resolved the PRE-compaction
    // manifest; it must still collect correctly AFTER the compaction flips
    // (the folded directories survive until the next sweep)
    val resolvedBefore = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)

    Indexing.indexCompact(spark, dir)
    assert(Generations.live(spark, dir) === Seq("c0"))
    val after = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    assert(after === before, "compaction must not change the served stats")
    val afterBm25 = graft.operators.Retrieval.bm25FromIndex(spark,
      docs.filter($"doc_id" < 3), "doc_id", "text", dir, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(afterBm25 === beforeBm25, "compaction must not change served BM25")
    assert(resolvedBefore.orderBy("token").collect().toSeq === before,
      "a reader holding the old manifest must survive the compaction")
    // the folded generations are still on disk (reader grace) …
    for (s <- Seq("postings", "stats", "heads", "doclen", "consts"))
      assert(genDirs(dir, s).size === 4, s"$s: folded gens must survive one cycle")

    // … and they stay alive as long as a RETAINED SNAPSHOT manifest
    // references them (Generations.HistoryKeep — the tunable reader-grace
    // window, StoreLifecycleSpec's time-travel law): an immediate second
    // compact sweeps nothing yet
    Indexing.indexCompact(spark, dir)
    for (s <- Seq("postings", "stats", "heads", "doclen", "consts"))
      assert(genDirs(dir, s).size === 4,
        s"$s: snapshot-referenced gens must survive")
    // …but once enough commits rotate those snapshots out, the sweep
    // reclaims them — disk is bounded by compaction cadence × HistoryKeep,
    // not by ingest history
    val extra1 = docs.filter($"doc_id" % 3 === 0)
      .select(($"doc_id" + 1000000).as("doc_id"), $"text")
    val extra2 = docs.filter($"doc_id" % 3 === 1)
      .select(($"doc_id" + 2000000).as("doc_id"), $"text")
    Indexing.indexAppend(extra1, "doc_id", "text", dir) // rotates a snapshot
    Indexing.indexAppend(extra2, "doc_id", "text", dir) // rotates the other
    Indexing.indexCompact(spark, dir)
    for (s <- Seq("postings", "stats", "heads", "doclen", "consts")) {
      val left = genDirs(dir, s)
      assert(!left.exists(Seq("gen=g0", "gen=g1", "gen=g2").contains),
        s"$s: gens no retained snapshot references must be swept, got $left")
      assert(left.size === 4, s"$s: disk bounded by cadence × HistoryKeep")
    }
    // the manifest-resolved stats surface holds one segment row per token
    val live = Generations.live(spark, dir)
    assert(live === Seq("c1"))
    val dup = Generations.readSurface(spark, dir, "stats", live)
      .groupBy("shard", "token").count().filter($"count" > 1)
    assert(dup.isEmpty, "stats must hold a single segment row per token")
    assert(Generations.readSurface(spark, dir, "consts", live).count() === 1L)

    // crash mid-fold: a partial, never-committed c-generation on disk is
    // an orphan — the next compaction sweeps it and serving is unchanged
    val preStray = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    val stray = new java.io.File(s"$dir/stats/gen=c9")
    assert(stray.mkdirs())
    Indexing.indexCompact(spark, dir)
    assert(!stray.exists(), "an uncommitted partial fold must be swept")
    val recovered = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    assert(recovered === preStray, "sweeping orphans must not change the store")
  }

  test("indexCompact preserves keepGens untouched for in-flight stream generations") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_keep").toString + "/idx"
    Indexing.indexBuild(docs.filter($"doc_id" % 3 === 0), "doc_id", "text", dir, nShards = 4)
    Indexing.indexAppend(docs.filter($"doc_id" % 3 === 1), "doc_id", "text", dir)
    Indexing.indexAppendOrReplay(docs.filter($"doc_id" % 3 === 2), "doc_id", "text",
      dir, gen = "b7")
    val before = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    Indexing.indexCompact(spark, dir, keepGens = Set("b7"))
    assert(Generations.live(spark, dir).sorted === Seq("b7", "c0"))
    val after = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    assert(after === before)
    // the kept generation is still a valid replay target: re-running the
    // stream batch after compaction must converge, not double-ingest
    Indexing.indexAppendOrReplay(docs.filter($"doc_id" % 3 === 2), "doc_id", "text",
      dir, gen = "b7")
    val replayed = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    assert(replayed === before)
  }

  test("indexAppend fails fast when a doc id is already ingested") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_dup").toString + "/idx"
    Indexing.indexBuild(corpus(10), "doc_id", "text", dir, nShards = 4)
    val e = intercept[IllegalArgumentException] {
      Indexing.indexAppend(corpus(3), "doc_id", "text", dir)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("indexAppendOrReplay: replay converges, cross-generation overlap fails fast") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_rep").toString + "/idx"
    Indexing.indexBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      dir, nShards = 4)
    val batch = docs.filter($"doc_id" % 2 === 1)
    Indexing.indexAppendOrReplay(batch, "doc_id", "text", dir, gen = "b0")
    val first = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq

    // full replay (at-least-once redelivery): byte-identical outcome
    Indexing.indexAppendOrReplay(batch, "doc_id", "text", dir, gen = "b0")
    val replayed = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    assert(replayed === first, "replaying a generation must not change the store")

    // crash-replay: the previous attempt committed only SOME of the five
    // surface writes — delete one surface's gen dir and replay; the
    // overwrite-per-generation contract must repair it
    val stats = new java.io.File(s"$dir/stats/gen=b0")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(stats)
    Indexing.indexAppendOrReplay(batch, "doc_id", "text", dir, gen = "b0")
    val repaired = Indexing.indexStats(spark, dir, minDf = 5L, postingCap = 10)
      .orderBy("token").collect().toSeq
    assert(repaired === first, "replay after a partial crash must repair the store")

    // the same docs arriving under a DIFFERENT generation is genuine
    // re-ingestion — fail fast, never double-count
    val e = intercept[IllegalArgumentException] {
      Indexing.indexAppendOrReplay(batch, "doc_id", "text", dir, gen = "b1")
    }
    assert(e.getMessage.contains("DIFFERENT generation"))
    // and the auto-numbered batch namespace is fenced off
    val e2 = intercept[IllegalArgumentException] {
      Indexing.indexAppendOrReplay(batch, "doc_id", "text", dir, gen = "g3")
    }
    assert(e2.getMessage.contains("namespace"))
  }

  test("indexStats rejects a postingCap above the stored head cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_cap").toString + "/idx"
    Indexing.indexBuild(corpus(20), "doc_id", "text", dir, nShards = 4, headCap = 5)
    val e = intercept[IllegalArgumentException] {
      Indexing.indexStats(spark, dir, minDf = 1L, postingCap = 10)
    }
    assert(e.getMessage.contains("head cap"))
    val ok = Indexing.indexStats(spark, dir, minDf = 1L, postingCap = 5)
      .filter($"token" === "common").collect().head
    assert(ok.getAs[String]("postings_head") === (0 until 5).mkString(","))
  }

  test("indexLookup prunes the posting scan to the probed shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_prune").toString + "/idx"
    Indexing.indexBuild(corpus(50), "doc_id", "text", dir, nShards = 8)
    val lk = Indexing.indexLookup(spark, dir, Seq("common"))
    assert(lk.collect().length === 50) // execute THIS plan so scan metrics populate
    val postScan = scans(lk.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
    assert(postScan.nonEmpty, "no file scan over the posting store found")
    val scanned = postScan
      .map(_.metrics.get("numPartitions").map(_.value).getOrElse(0L)).sum
    assert(scanned === 1L,
      s"one probed token must read exactly one (gen, shard) partition, read $scanned")
  }

  test("in-shard ck ranges bound the postings rows a small lookup reads") {
    // ONE shard, so directory pruning cannot help — the bound must come
    // from the ck-range pushdown over the ck-sorted postings file
    val big = spark.range(0, 4000).select($"id".as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("tok"), pmod($"id" * 12 + lit(j), lit(40000)))): _*)
        .as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_ck").toString + "/idx"
    Indexing.indexBuild(big, "doc_id", "text", dir, nShards = 1)
    val total = spark.read.parquet(s"$dir/postings/gen=g0").count()
    val got = Indexing.indexLookup(spark, dir, Seq("tok17", "tok18"))
    assert(got.collect().length >= 2)
    val postingScans = scans(got.queryExecution.executedPlan)
      .filter(_.output.exists(_.name == "tf"))
    assert(postingScans.nonEmpty)
    val readRows = postingScans.map(_.metrics("numOutputRows").value).max
    assert(readRows > 0 && readRows < total / 2,
      s"ck ranges must skip most of the $total-row single-shard postings, read $readRows")
    val meta = postingScans.head.metadata.getOrElse("PushedFilters", "")
    assert(meta.contains("GreaterThanOrEqual(ck") || meta.contains("EqualTo(ck"),
      s"ck ranges missing from PushedFilters: $meta")
  }
}

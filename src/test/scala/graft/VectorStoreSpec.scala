package graft

import graft.operators.{Generations, Similarity, VectorStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the persisted portable-quantizer ANN store: a one-generation
  * whole-corpus store serves exactly [[Similarity.ivfTopKPortable]], a
  * build + append equals one generation per batch folded at read,
  * compaction folds to a single generation without changing results,
  * replayed stream appends converge, re-ingestion fails fast, and the
  * serve scan prunes to the probed cells.
  */
class VectorStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, TestSpark.sf0001)
  private def queries = emb.filter($"vec_id" < 5)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ann").toString + "/store"

  private def search(dir: String): Seq[String] =
    VectorStore.annSearch(spark, queries, "vec_id", "embedding", dir,
      k = 10, nProbe = 4)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq

  private def genDirs(dir: String): Seq[String] = {
    val d = new java.io.File(s"$dir/cells")
    if (!d.exists()) Nil
    else d.listFiles().toSeq.map(_.getName).filter(_.startsWith("gen="))
  }

  test("one-generation whole-corpus store serves exactly ivfTopKPortable") {
    val dir = tmp()
    VectorStore.annBuild(emb, "vec_id", "embedding", dir, nCells = 16)
    val served = search(dir)
    val recomputed = Similarity.ivfTopKPortable(emb, queries, "vec_id",
      "embedding", k = 10, nCells = 16, nProbe = 4)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(served === recomputed)
  }

  test("build + appends fold at read; compaction changes files, not results") {
    val a = tmp(); val b = tmp()
    // store a: quantizer from the even half, odd half in one append
    VectorStore.annBuild(emb.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", a, nCells = 16)
    VectorStore.annAppend(spark, emb.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", a)
    // store b: same quantizer batch, odd half split across TWO appends
    VectorStore.annBuild(emb.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", b, nCells = 16)
    VectorStore.annAppend(spark, emb.filter($"vec_id" % 4 === 1),
      "vec_id", "embedding", b)
    VectorStore.annAppend(spark, emb.filter($"vec_id" % 4 === 3),
      "vec_id", "embedding", b)
    val before = search(a)
    assert(before === search(b))
    assert(genDirs(b).size === 3)

    // concurrent-reader grace: a plan resolved against the pre-compaction
    // manifest must still collect correctly after the flip
    val resolvedBefore = VectorStore.annSearch(spark, queries, "vec_id",
      "embedding", b, k = 10, nProbe = 4)
    VectorStore.annCompact(spark, b)
    assert(Generations.live(spark, b) === Seq("c0"))
    assert(genDirs(b).size === 4, "folded gens must survive one cycle")
    assert(search(b) === before)
    assert(resolvedBefore.orderBy("query_id", "rank").collect()
      .map(_.toString).toSeq === before,
      "a reader holding the old manifest must survive the compaction")
    // the NEXT cycle keeps them while a retained SNAPSHOT manifest
    // references them — the tunable reader-grace window (rotation-and-
    // reclaim law: IndexingSpec; time travel: StoreLifecycleSpec)
    VectorStore.annCompact(spark, b)
    assert(genDirs(b).size === 4, "snapshot-referenced gens must survive")
    assert(search(b) === before)

    // keepGens: the kept generation survives the fold untouched
    VectorStore.annCompact(spark, a, keepGens = Set("g1"))
    assert(Generations.live(spark, a).toSet === Set("c0", "g1"))
    assert(search(a) === before)
  }

  test("append-only guard: re-ingesting an id fails fast on both paths") {
    val dir = tmp()
    VectorStore.annBuild(emb.filter($"vec_id" < 50), "vec_id", "embedding",
      dir, nCells = 8)
    val e1 = intercept[IllegalArgumentException] {
      VectorStore.annAppend(spark, emb.filter($"vec_id" < 10), "vec_id",
        "embedding", dir)
    }
    assert(e1.getMessage.contains("append-only"))
    val e2 = intercept[IllegalArgumentException] {
      VectorStore.annAppendOrReplay(spark, emb.filter($"vec_id" < 10),
        "vec_id", "embedding", dir, gen = "b7")
    }
    assert(e2.getMessage.contains("DIFFERENT generation"))
  }

  test("stream append replays converge; namespace collisions rejected") {
    val dir = tmp()
    VectorStore.annBuild(emb.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", dir, nCells = 16)
    val batch = emb.filter($"vec_id" % 2 =!= 0)
    VectorStore.annAppendOrReplay(spark, batch, "vec_id", "embedding", dir, "b0")
    val once = search(dir)
    // at-least-once redelivery of the same generation: byte-converged
    VectorStore.annAppendOrReplay(spark, batch, "vec_id", "embedding", dir, "b0")
    assert(search(dir) === once)
    assert(genDirs(dir).toSet === Set("gen=g0", "gen=b0"))
    intercept[IllegalArgumentException] {
      VectorStore.annAppendOrReplay(spark, batch, "vec_id", "embedding",
        dir, gen = "g3")
    }
    intercept[IllegalArgumentException] {
      VectorStore.annAppendOrReplay(spark, batch, "vec_id", "embedding",
        dir, gen = "c0")
    }
  }

  test("a crashed fold's orphan generation is swept, never served") {
    val dir = tmp()
    VectorStore.annBuild(emb.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", dir, nCells = 16)
    VectorStore.annAppend(spark, emb.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", dir)
    val before = search(dir)
    VectorStore.annCompact(spark, dir)
    // simulate a compaction that died mid-fold: a partial, never-committed
    // c-generation on disk — unreferenced, so serving ignores it and the
    // next maintenance cycle deletes it
    val stray = new java.io.File(s"$dir/cells/gen=c1")
    assert(stray.mkdirs())
    assert(search(dir) === before)
    VectorStore.annCompact(spark, dir)
    assert(!stray.exists(), "an uncommitted partial fold must be swept")
    // the committed-then-folded g0/g1 survive: a retained snapshot
    // manifest still references them (reader-grace window)
    assert(genDirs(dir).toSet === Set("gen=g0", "gen=g1", "gen=c0"))
    assert(search(dir) === before)
  }

  test("recall@k vs brute force is monotone in nProbe and exact at nProbe=nCells") {
    val dir = tmp()
    VectorStore.annBuild(emb.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", dir, nCells = 16)
    VectorStore.annAppend(spark, emb.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", dir)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 10)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallAt = Seq(1, 2, 4, 8, 16).map { np =>
      val got = VectorStore.annSearch(spark, queries, "vec_id", "embedding",
          dir, k = 10, nProbe = np)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> got.count(exact).toDouble / exact.size
    }
    recallAt.sliding(2).foreach { case Seq((npLo, lo), (npHi, hi)) =>
      assert(lo <= hi + 1e-12,
        s"recall must not decrease as nProbe grows: $npLo→$lo, $npHi→$hi")
    }
    assert(recallAt.last._2 === 1.0,
      "probing every cell must reproduce brute force exactly")
    assert(recallAt.head._2 < 1.0,
      "nProbe=1 must genuinely prune (otherwise the sweep measures nothing)")
    // the one-pass sweep serve equals the per-setting serves exactly
    val sweep = VectorStore.annSearchSweep(spark, queries, "vec_id",
        "embedding", dir, k = 10, probes = Seq(1, 4, 16))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getDouble(4))).toSet
    val perSetting = Seq(1, 4, 16).flatMap { np =>
      VectorStore.annSearch(spark, queries, "vec_id", "embedding", dir,
          k = 10, nProbe = np)
        .collect().map(r => (np, r.getLong(0), r.getInt(1),
          r.getLong(2), r.getDouble(3)))
    }.toSet
    assert(sweep === perSetting,
      "annSearchSweep must equal annSearch at every probed setting")
  }

  test("a reader holding a resolved manifest survives a CONCURRENT compact+sweep") {
    val dir = tmp()
    VectorStore.annBuild(emb.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", dir, nCells = 16)
    VectorStore.annAppend(spark, emb.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", dir)
    val before = search(dir)
    // reader: resolve the manifest ONCE (plan construction), then collect
    // repeatedly while the writer compacts — every collect must succeed
    // with identical results, no file-not-found
    val resolved = VectorStore.annSearch(spark, queries, "vec_id",
      "embedding", dir, k = 10, nProbe = 4)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => {
      try VectorStore.annCompact(spark, dir) // flips manifest to c0
      catch { case t: Throwable => failure.set(t) }
      finally done.set(true)
    })
    writer.start()
    var reads = 0
    while (!done.get() || reads == 0) {
      val got = resolved.orderBy("query_id", "rank").collect()
        .map(_.toString).toSeq
      assert(got === before,
        s"read $reads under concurrent compaction diverged")
      reads += 1
    }
    writer.join()
    assert(failure.get() === null, s"compaction failed: ${failure.get()}")
    assert(Generations.live(spark, dir) === Seq("c0"))
    // the old reader's generations are still on disk (one-cycle grace) —
    // and the lapsed plan STILL collects after the writer finished
    assert(resolved.orderBy("query_id", "rank").collect()
      .map(_.toString).toSeq === before)
    assert(search(dir) === before, "a fresh resolve serves the folded store")
  }

  test("serve scan reads only the probed cells' directories") {
    val dir = tmp()
    VectorStore.annBuild(emb, "vec_id", "embedding", dir, nCells = 16)
    val sr = VectorStore.annSearch(spark, queries, "vec_id", "embedding",
      dir, k = 10, nProbe = 2)
    sr.collect() // execute THIS plan so scan metrics populate
    val cellScans = scans(sr.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/cells")))
    assert(cellScans.nonEmpty, "no file scan over the cell store found")
    val scanned = cellScans
      .map(_.metrics.get("numPartitions").map(_.value).getOrElse(0L)).sum
    // 5 queries × 2 probes bounds the probed set at 10 of the 16 cells
    assert(scanned > 0L && scanned <= 10L,
      s"probed scan must touch at most 10 cell partitions, read $scanned")
  }

  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
}

package graft

import graft.operators.{ClusterStore, Components, Generations}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the persisted duplicate-cluster store: absorbing a batch via
  * the stored hub table equals a batch rebuild over the union corpus; an
  * apply is BATCH-BOUND — it never reads (let alone rewrites) the labels
  * of clusters the batch does not touch, and never modifies any old file;
  * chained merges keep the remap ledger depth-1; compaction commits
  * through the generation manifest with one cycle of reader grace;
  * redelivery, duplicate ids and scheme mismatches fail fast.
  */
class ClusterStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "cluster_id").as[(Long, Long)].collect().toSet

  private def hubsOf(dir: String) =
    ClusterStore.hubsRead(spark, dir, Generations.live(spark, dir))

  private def genDirs(dir: String, surface: String): Seq[String] = {
    val d = new java.io.File(s"$dir/$surface")
    if (!d.exists()) Nil
    else d.listFiles().toSeq.map(_.getName).filter(_.startsWith("gen="))
  }

  test("ccBuild + ccApply equals a batch rebuild over the union corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore").toString + "/store"
    ClusterStore.ccBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text", dir)
    ClusterStore.ccApply(spark, dir, docs.filter($"doc_id" % 2 =!= 0),
      "doc_id", "text")
    val served = labelsOf(ClusterStore.ccRead(spark, dir))
    val rebuilt = labelsOf(Components.connectedComponents(
      docs.select($"doc_id".as("id")),
      Components.fingerprintEdges(docs, "doc_id", "text")))
    assert(served === rebuilt)
    // the hub table never holds two representatives for one fingerprint
    val dupHubs = hubsOf(dir).groupBy("w", "fp").count().filter($"count" > 1)
    assert(dupHubs.isEmpty, "hub append must add only novel fingerprints")
  }

  test("driver-path and distributed-path applies serve identical labellings") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dirD = java.nio.file.Files.createTempDirectory("graft_cc_drv").toString + "/store"
    val dirX = java.nio.file.Files.createTempDirectory("graft_cc_dist").toString + "/store"
    ClusterStore.ccBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text", dirD)
    ClusterStore.ccBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text", dirX)
    val batch = docs.filter($"doc_id" % 2 =!= 0)
    // small batch → driver union-find path
    ClusterStore.ccApply(spark, dirD, batch, "doc_id", "text")
    // force the distributed iterative path for the SAME batch
    spark.conf.set("spark.graft.cc.driverMaxBatch", "0")
    try ClusterStore.ccApply(spark, dirX, batch, "doc_id", "text")
    finally spark.conf.unset("spark.graft.cc.driverMaxBatch")
    assert(labelsOf(ClusterStore.ccRead(spark, dirD))
      === labelsOf(ClusterStore.ccRead(spark, dirX)))
    // the ledgers agree too (same merges, same depth-1 composition)
    def remapOf(dir: String) =
      Generations.readSurface(spark, dir, "remap",
          Seq(Generations.live(spark, dir).last))
        .select("old_label", "new_label").as[(Long, Long)].collect().toSet
    assert(remapOf(dirD) === remapOf(dirX))
  }

  test("ccApply is batch-bound: untouched label buckets neither read nor written") {
    // two identical-prefix docs cluster together; the third is unrelated
    val olds = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (4L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_b").toString + "/store"
    ClusterStore.ccBuild(olds, "doc_id", "text", dir, nBuckets = 8)
    def filesUnder(sub: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$sub"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val labelsBefore = filesUnder("labels")
    // the new doc shares no fingerprint window with the store, so the only
    // label bucket the apply may READ is the dupe guard's — the batch id's
    // own bucket. Corrupt every OTHER bucket's files: a scan of any of
    // them would abort the apply on unreadable parquet.
    val batch = Seq(
      (7L, "totally novel content nothing shared with the others at all here"))
      .toDF("doc_id", "text")
    val myBucket = batch
      .select(pmod(xxhash64($"doc_id".cast("string")), lit(8L)).cast("int"))
      .head().getInt(0)
    for (b <- 0 until 8 if b != myBucket) {
      val d = new java.io.File(s"$dir/labels/gen=g0/__bucket=$b")
      if (d.exists())
        d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          java.nio.file.Files.write(f.toPath, "not parquet".getBytes)
          f.setLastModified(labelsBefore(f.getPath)) // keep the mtime probe clean
        }
    }
    ClusterStore.ccApply(spark, dir, batch, "doc_id", "text")
    // append-only: every pre-existing label file survives byte-untouched
    val labelsAfter = filesUnder("labels")
    assert(labelsBefore.keySet.subsetOf(labelsAfter.keySet) &&
      labelsBefore.forall { case (p, m) => labelsAfter(p) == m },
      "an apply must never rewrite an old generation's label files")
    assert(genDirs(dir, "labels").toSet === Set("gen=g0", "gen=g1"))
  }

  test("ccApply merges two stored clusters when a batch doc bridges them") {
    // doc 2 and doc 6 share nothing: different (1,8) prefixes, different
    // (5,12) slices — two singleton clusters at build time
    val olds = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta one two three four"),
      (6L, "pe qu ro si epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_m").toString + "/store"
    ClusterStore.ccBuild(olds, "doc_id", "text", dir, nBuckets = 4)
    // bridge: its (1,8) prefix equals doc 2's, its (5,12) slice equals
    // doc 6's — one new doc chains the two stored clusters
    val bridge = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    ClusterStore.ccApply(spark, dir,
      Seq((10L, bridge)).toDF("doc_id", "text"), "doc_id", "text")
    val got = labelsOf(ClusterStore.ccRead(spark, dir))
    val want = labelsOf(Components.connectedComponents(
      Seq(2L, 6L, 10L).toDF("id"),
      Components.fingerprintEdges(
        olds.unionByName(Seq((10L, bridge)).toDF("doc_id", "text")),
        "doc_id", "text")))
    assert(got === want)
    assert(got.map(_._2) === Set(2L), "all three docs must share one cluster")
  }

  test("chained merges keep the remap ledger depth-1") {
    // build: docs 5 and 9 are unrelated singletons
    val olds = Seq(
      (5L, "alpha beta gamma delta epsilon zeta eta theta one two three four"),
      (9L, "pe qu ro si epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_d").toString + "/store"
    ClusterStore.ccBuild(olds, "doc_id", "text", dir, nBuckets = 4)
    // apply 1: doc 7 bridges 5 and 9 -> component min 5, ledger {9 -> 5}
    val bridge = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    ClusterStore.ccApply(spark, dir,
      Seq((7L, bridge)).toDF("doc_id", "text"), "doc_id", "text")
    // apply 2: doc 1 shares doc 5's prefix window -> the merged component's
    // min drops to 1; the OLD entry {9 -> 5} must recompose to {9 -> 1}
    ClusterStore.ccApply(spark, dir,
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta ix x xi xii"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val remap = Generations.readSurface(spark, dir, "remap",
        Seq(Generations.live(spark, dir).last))
      .select("old_label", "new_label").as[(Long, Long)].collect().toMap
    assert(remap.values.toSet.intersect(remap.keySet).isEmpty,
      s"ledger must be depth-1, got $remap")
    val all = olds.unionByName(Seq((7L, bridge)).toDF("doc_id", "text"))
      .unionByName(Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta ix x xi xii"))
        .toDF("doc_id", "text"))
    val want = labelsOf(Components.connectedComponents(
      Seq(1L, 5L, 7L, 9L).toDF("id"),
      Components.fingerprintEdges(all, "doc_id", "text")))
    assert(labelsOf(ClusterStore.ccRead(spark, dir)) === want)
    assert(want.map(_._2) === Set(1L), "all four docs share cluster 1")
  }

  test("ccCompact folds generations through the manifest with reader grace") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_c").toString + "/store"
    ClusterStore.ccBuild(docs.filter($"doc_id" % 3 === 0), "doc_id", "text", dir)
    ClusterStore.ccApply(spark, dir, docs.filter($"doc_id" % 3 === 1),
      "doc_id", "text")
    val before = labelsOf(ClusterStore.ccRead(spark, dir))
    val hubsBefore = hubsOf(dir).as[(Int, String, Long)].collect().toSet
    // concurrent-reader grace: a plan resolved against the pre-compaction
    // manifest must still collect correctly after the flip
    val resolvedBefore = ClusterStore.ccRead(spark, dir)
    ClusterStore.ccCompact(spark, dir)
    assert(Generations.live(spark, dir) === Seq("c0"))
    for (s <- Seq("hubs", "labels", "remap"))
      assert(genDirs(dir, s).size === 3,
        s"$s: folded gens must survive one cycle")
    assert(labelsOf(ClusterStore.ccRead(spark, dir)) === before,
      "compaction must not change the served labelling")
    assert(hubsOf(dir).as[(Int, String, Long)].collect().toSet === hubsBefore,
      "compaction must not change hub contents")
    assert(labelsOf(resolvedBefore) === before,
      "a reader holding the old manifest must survive the compaction")
    // a second compaction of an already-folded store early-returns (so
    // repeated timed runs measure pure serving) — and the folded remap is
    // empty: serving pays no ledger redirect until the next merge
    ClusterStore.ccCompact(spark, dir)
    assert(Generations.live(spark, dir) === Seq("c0"))
    assert(Generations.readSurface(spark, dir, "remap", Seq("c0")).isEmpty)
    // the folded hub table still drives an apply: equals a full rebuild
    ClusterStore.ccApply(spark, dir, docs.filter($"doc_id" % 3 === 2),
      "doc_id", "text")
    val rebuilt = labelsOf(Components.connectedComponents(
      docs.select($"doc_id".as("id")),
      Components.fingerprintEdges(docs, "doc_id", "text")))
    assert(labelsOf(ClusterStore.ccRead(spark, dir)) === rebuilt)
  }

  test("ccApplyOrReplay: fresh applies, full replays no-op, partial fails") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_r").toString + "/store"
    ClusterStore.ccBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text", dir)
    val batch = docs.filter($"doc_id" % 2 =!= 0)
    // fresh batch: the normal apply path
    ClusterStore.ccApplyOrReplay(spark, dir, batch, "doc_id", "text")
    val after = labelsOf(ClusterStore.ccRead(spark, dir))
    val rebuilt = labelsOf(Components.connectedComponents(
      docs.select($"doc_id".as("id")),
      Components.fingerprintEdges(docs, "doc_id", "text")))
    assert(after === rebuilt)
    // byte-identical redelivery of the completed batch: converged no-op
    // (plain ccApply would fail fast here)
    ClusterStore.ccApplyOrReplay(spark, dir, batch, "doc_id", "text")
    assert(labelsOf(ClusterStore.ccRead(spark, dir)) === after)
    // partial overlap is upstream corruption, never a checkpointed replay
    val mixed = batch.select($"doc_id", $"text").limit(1).unionByName(
      Seq((999999L, "a doc id the store has never seen before right here"))
        .toDF("doc_id", "text"))
    val e = intercept[IllegalStateException] {
      ClusterStore.ccApplyOrReplay(spark, dir, mixed, "doc_id", "text")
    }
    assert(e.getMessage.contains("partial overlap"))
    // a batch with duplicate ids fails with its own message, not as a
    // phantom partial replay
    val dup = Seq(
      (777777L, "some fresh text right here for the duplicate row case ok"),
      (777777L, "some fresh text right here for the duplicate row case ok"))
      .toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      ClusterStore.ccApplyOrReplay(spark, dir, dup, "doc_id", "text")
    }
    assert(e2.getMessage.contains("duplicate doc ids"))
  }

  test("ccApply fails fast on redelivered ids and mismatched schemes") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_g").toString + "/store"
    ClusterStore.ccBuild(docs, "doc_id", "text", dir)
    val e = intercept[IllegalArgumentException] {
      ClusterStore.ccApply(spark, dir, docs, "doc_id", "text")
    }
    assert(e.getMessage.contains("already labelled"))
    val e2 = intercept[IllegalArgumentException] {
      ClusterStore.ccApply(spark, dir,
        Seq((5L, "other text entirely for this one right here ok then fine"))
          .toDF("doc_id", "text"),
        "doc_id", "text", windows = Seq((1, 4)))
    }
    assert(e2.getMessage.contains("scheme"))
  }

  test("applies land as FLAT segments; compaction folds them back to " +
      "bucket dirs") {
    // a batch apply's file count must track the BATCH, never the store's
    // bucket fan-out: at contract sizing (nBuckets grows with the corpus)
    // one-file-per-touched-dir applies pay a geometry-proportional
    // per-file constant (the r12 contract probe's cc_apply_5k ramp);
    // flat segments bound it, and compaction restores the pruned layout
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_seg")
      .toString + "/store"
    ClusterStore.ccBuild(docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      dir, nBuckets = 64)
    ClusterStore.ccApply(spark, dir, docs.filter($"doc_id" % 2 =!= 0),
      "doc_id", "text")
    def entries(sub: String, gen: String): Seq[String] = {
      val d = new java.io.File(s"$dir/$sub/gen=$gen")
      if (d.exists()) d.listFiles().toSeq.map(_.getName) else Nil
    }
    // build generation: directory-partitioned
    assert(entries("labels", "g0").exists(_.startsWith("__bucket=")))
    assert(entries("hubs", "g0").exists(_.startsWith("__shard=")))
    // apply generation: FLAT — parquet files only, count << nBuckets
    val segLabels = entries("labels", "g1")
    assert(segLabels.nonEmpty && !segLabels.exists(_.startsWith("__bucket=")),
      s"apply must write a flat segment: $segLabels")
    assert(segLabels.count(_.endsWith(".parquet")) <= 8,
      s"segment file count must track the batch, not the 64-bucket " +
        s"fan-out: $segLabels")
    assert(!entries("hubs", "g1").exists(_.startsWith("__shard=")))
    // serving folds both layouts
    val served = labelsOf(ClusterStore.ccRead(spark, dir))
    val rebuilt = labelsOf(Components.connectedComponents(
      docs.select($"doc_id".as("id")),
      Components.fingerprintEdges(docs, "doc_id", "text")))
    assert(served === rebuilt)
    // compaction folds the segment back into bucket directories
    ClusterStore.ccCompact(spark, dir)
    assert(entries("labels", "c0").exists(_.startsWith("__bucket=")))
    assert(entries("hubs", "c0").exists(_.startsWith("__shard=")))
    assert(labelsOf(ClusterStore.ccRead(spark, dir)) === rebuilt)
  }
}

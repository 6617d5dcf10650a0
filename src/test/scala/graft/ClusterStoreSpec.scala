package graft

import graft.operators.{ClusterStore, Components}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the persisted duplicate-cluster store: absorbing a batch via
  * the stored hub table equals a batch rebuild over the union corpus, the
  * label rewrite touches only buckets whose labels changed, redelivery
  * and scheme mismatches fail fast, and the hub table stays one row per
  * (window, fingerprint).
  */
class ClusterStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "cluster_id").as[(Long, Long)].collect().toSet

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
    val dupHubs = spark.read.parquet(s"$dir/hubs")
      .groupBy("w", "fp").count().filter($"count" > 1)
    assert(dupHubs.isEmpty, "hub append must add only novel fingerprints")
  }

  test("ccApply rewrites only the buckets whose labels changed") {
    // two identical-prefix docs cluster together; the third is unrelated
    val olds = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (4L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_b").toString + "/store"
    ClusterStore.ccBuild(olds, "doc_id", "text", dir, nBuckets = 8)
    def snap(): Map[String, Long] =
      new java.io.File(s"$dir/labels").listFiles().filter(_.isDirectory)
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> f.lastModified())).toMap
    val before = snap()
    // the new doc shares no fingerprint window: exactly one new label row,
    // so exactly one bucket directory may change
    ClusterStore.ccApply(spark, dir,
      Seq((7L, "totally novel content nothing shared with the others at all here"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val after = snap()
    val changed = after.keySet.filter(k => before.get(k) != Some(after(k))) ++
      (before.keySet -- after.keySet)
    val changedBuckets = changed.map(_.split("/").head)
    assert(changedBuckets.size <= 1,
      s"one unconnected new doc must touch at most one bucket: $changedBuckets")
    assert(labelsOf(ClusterStore.ccRead(spark, dir))
      .contains((7L, 7L)), "the unconnected doc labels itself")
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

  test("ccCompact folds hub file sets; serving and later applies unchanged") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ccstore_c").toString + "/store"
    ClusterStore.ccBuild(docs.filter($"doc_id" % 3 === 0), "doc_id", "text", dir)
    ClusterStore.ccApply(spark, dir, docs.filter($"doc_id" % 3 === 1),
      "doc_id", "text")
    def hubFiles(): Int =
      new java.io.File(s"$dir/hubs").listFiles()
        .count(_.getName.endsWith(".parquet"))
    val filesBefore = hubFiles()
    val before = labelsOf(ClusterStore.ccRead(spark, dir))
    val hubsBefore = spark.read.parquet(s"$dir/hubs")
      .as[(Int, String, Long)].collect().toSet
    ClusterStore.ccCompact(spark, dir)
    assert(labelsOf(ClusterStore.ccRead(spark, dir)) === before,
      "compaction must not change the served labelling")
    assert(spark.read.parquet(s"$dir/hubs")
      .as[(Int, String, Long)].collect().toSet === hubsBefore,
      "compaction must not change hub contents")
    assert(hubFiles() <= filesBefore,
      "compaction must not grow the hub file count")
    // a second compaction of an already-folded store is harmless
    ClusterStore.ccCompact(spark, dir)
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
}

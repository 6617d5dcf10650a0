package graft

import graft.operators.History
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the persisted SCD2 store: applying a CDC batch incrementally
  * equals rebuilding from the union of all events — including LATE events
  * that interleave stored ones (the case a collapsed-history merge cannot
  * replay, which is why the store keeps the event log) — and the rewrite
  * touches only the affected key buckets' files.
  */
class HistorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("user_id", "event_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")

  private def canon(df: DataFrame) =
    df.select(col("user_id"), col("version"), col("event_type"),
        unix_millis(col("valid_from")).as("vf"),
        unix_millis(col("valid_to")).as("vt"),
        col("n_events"), col("is_current"))
      .collect().map(_.toSeq).toSet

  test("incremental apply equals batch rebuild, including late interleaved events") {
    val b1 = ev((1L, 1L, "a", 1000L), (1L, 2L, "a", 2000L), (1L, 3L, "b", 3000L),
      (2L, 1L, "x", 1000L), (3L, 1L, "p", 5000L))
    // user 1 gets a LATE event (ts 1500) that splits its first run into
    // a|c|a; user 2 appends normally; user 4 is brand new
    val b2 = ev((1L, 4L, "c", 1500L), (2L, 2L, "y", 9000L), (4L, 1L, "q", 1000L))
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2").toString + "/store"
    History.scd2Build(b1, "user_id", "event_type", "ts", "event_id", dir, nBuckets = 4)
    History.scd2Apply(spark, dir, b2, "user_id", "event_type", "ts", "event_id")
    val got = canon(History.scd2Read(spark, dir))
    val want = canon(History.scd2(b1.unionByName(b2),
      "user_id", "event_type", "ts", "event_id"))
    assert(got === want)
    // the late event really did split the run: user 1 has 4 versions now
    assert(got.count(_.head == 1L) === 4)
  }

  test("scd2Compact folds the event-log generations through the manifest") {
    import graft.operators.Generations
    val b1 = ev((1L, 1L, "a", 1000L), (2L, 1L, "x", 1000L), (3L, 1L, "p", 2000L))
    val b2 = ev((1L, 2L, "b", 3000L), (2L, 2L, "y", 4000L))
    val b3 = ev((1L, 3L, "a", 5000L), (3L, 2L, "q", 6000L))
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_cmp").toString + "/store"
    History.scd2Build(b1, "user_id", "event_type", "ts", "event_id", dir, nBuckets = 4)
    History.scd2Apply(spark, dir, b2, "user_id", "event_type", "ts", "event_id")
    History.scd2Apply(spark, dir, b3, "user_id", "event_type", "ts", "event_id")
    def genDirs: Seq[String] =
      new java.io.File(s"$dir/events").listFiles().toSeq
        .map(_.getName).filter(_.startsWith("gen="))
    val before = canon(History.scd2Read(spark, dir))
    assert(Generations.live(spark, dir) === Seq("g0", "g1", "g2"))

    // a reader that resolved the pre-compaction manifest must survive the
    // flip: the folded generations stay on disk for one cycle
    val resolvedBefore = History.scd2Read(spark, dir)
    History.scd2Compact(spark, dir)
    assert(Generations.live(spark, dir) === Seq("c0"))
    assert(genDirs.size === 4, "folded gens must survive one cycle")
    assert(canon(History.scd2Read(spark, dir)) === before)
    assert(canon(resolvedBefore) === before)
    // the log still carries every event: a full rebuild from it matches
    val all = b1.unionByName(b2).unionByName(b3)
    assert(canon(History.scd2(all, "user_id", "event_type", "ts", "event_id"))
      === before)

    // an already-folded store early-returns; a stray partial fold (crashed
    // compaction) is unreferenced and swept by the next run — while the
    // committed-then-folded generations survive as long as a retained
    // SNAPSHOT manifest references them (rotation-and-reclaim law:
    // IndexingSpec; time travel: StoreLifecycleSpec)
    val stray = new java.io.File(s"$dir/events/gen=c1")
    assert(stray.mkdirs())
    History.scd2Compact(spark, dir)
    assert(!stray.exists(), "an uncommitted partial fold must be swept")
    assert(genDirs.size === 4, "snapshot-referenced gens must survive")
    assert(Generations.live(spark, dir) === Seq("c0"))

    // applies keep working on the compacted log (late event splits a run)
    val b4 = ev((1L, 4L, "c", 3500L), (4L, 1L, "r", 1000L))
    History.scd2Apply(spark, dir, b4, "user_id", "event_type", "ts", "event_id")
    assert(canon(History.scd2Read(spark, dir)) ===
      canon(History.scd2(all.unionByName(b4),
        "user_id", "event_type", "ts", "event_id")))
  }

  test("re-applying a delivered batch fails fast instead of corrupting history") {
    val b1 = ev((1L, 1L, "a", 1000L), (2L, 1L, "x", 1000L))
    val b2 = ev((1L, 2L, "b", 2000L))
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_redlv").toString + "/store"
    History.scd2Build(b1, "user_id", "event_type", "ts", "event_id", dir, nBuckets = 4)
    History.scd2Apply(spark, dir, b2, "user_id", "event_type", "ts", "event_id")
    // at-least-once redelivery of b2: double-counting n_events must be
    // refused, and the store must stay exactly as after the first apply
    val e = intercept[IllegalArgumentException] {
      History.scd2Apply(spark, dir, b2, "user_id", "event_type", "ts", "event_id")
    }
    assert(e.getMessage.contains("redelivered"))
    val got = canon(History.scd2Read(spark, dir))
    assert(got === canon(History.scd2(b1.unionByName(b2),
      "user_id", "event_type", "ts", "event_id")))
    // the same double-count arriving WITHIN one batch must also be refused
    val e2 = intercept[IllegalArgumentException] {
      History.scd2Apply(spark, dir,
        ev((3L, 9L, "z", 5000L), (3L, 9L, "z", 5000L)),
        "user_id", "event_type", "ts", "event_id")
    }
    assert(e2.getMessage.contains("more than once"))
    assert(canon(History.scd2Read(spark, dir)) === got, "store must be untouched")
  }

  test("scd2ApplyOrReplay: replayed batch converges, partial overlap fails fast") {
    val b1 = ev((1L, 1L, "a", 1000L), (2L, 1L, "x", 1000L))
    val b2 = ev((1L, 2L, "b", 2000L), (4L, 1L, "q", 500L))
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_replay").toString + "/store"
    History.scd2Build(b1, "user_id", "event_type", "ts", "event_id", dir, nBuckets = 4)
    History.scd2ApplyOrReplay(spark, dir, b2, "user_id", "event_type", "ts", "event_id")
    val after = canon(History.scd2Read(spark, dir))
    // at-least-once replay of the SAME batch: no exception, store unchanged
    History.scd2ApplyOrReplay(spark, dir, b2, "user_id", "event_type", "ts", "event_id")
    assert(canon(History.scd2Read(spark, dir)) === after)
    assert(after === canon(History.scd2(b1.unionByName(b2),
      "user_id", "event_type", "ts", "event_id")))
    // half-replayed half-new batch: checkpointed replay is all-or-nothing
    val mixed = ev((1L, 2L, "b", 2000L), (9L, 1L, "n", 100L))
    val e = intercept[IllegalStateException] {
      History.scd2ApplyOrReplay(spark, dir, mixed,
        "user_id", "event_type", "ts", "event_id")
    }
    assert(e.getMessage.contains("partial overlap"))
  }

  test("apply rewrites only the affected buckets' history files") {
    val b1 = ev((1L to 8L).map(u => (u, 1L, "a", 1000L * u)): _*)
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_prune").toString + "/store"
    History.scd2Build(b1, "user_id", "event_type", "ts", "event_id", dir, nBuckets = 4)

    def snap(): Map[String, Map[String, Long]] =
      new java.io.File(s"$dir/history").listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified).toMap)
        .toMap
    val before = snap()

    // one user's batch → exactly one bucket rewritten
    History.scd2Apply(spark, dir, ev((1L, 2L, "b", 9000L)),
      "user_id", "event_type", "ts", "event_id")
    val after = snap()
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size === 1, s"expected one rewritten bucket, got $changed")
    // and the merged content is right
    val u1 = History.scd2Read(spark, dir).filter(col("user_id") === 1L)
      .select(col("version"), col("event_type"), col("is_current"))
      .as[(Long, String, Boolean)].collect().toSet
    assert(u1 === Set((1L, "a", false), (2L, "b", true)))
  }
}

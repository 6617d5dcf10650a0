package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compaction-cadence probe for the cluster store's touched-file READ
  * ceiling: ccApply's batch reads open min(batch footprint, nBuckets)
  * files per COMMITTED GENERATION (flat segments are read whole behind a
  * data filter; partitioned generations contribute their probed bucket
  * dirs), so the per-apply read cost grows with the generation count
  * between compactions and compaction resets it. The README documents
  * that contract; this probe pins it with numbers: apply N consecutive
  * 5000-doc batches (recording the committed generation count before
  * each), compact once, then apply N more — the committed artifact shows
  * per-apply cost vs generation count at ≤ linear growth and the
  * post-compaction reset.
  *
  * Contract sizing at the probed scale (nBuckets = 8·k — the geometry
  * the ramp was measured under in the round-13 contract artifact).
  *
  * `runMain graft.tools.CcCadence [sfDir] [k] [nApplies] [outFile]`
  */
object CcCadence {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 32
    val nApplies = if (args.length > 2) args(2).toInt else 8
    val outFile = if (args.length > 3) Some(args(3)) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = "/tmp/graft_cccadence"
    val tmpF = new java.io.File(tmp)
    if (tmpF.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      tmpF.listFiles().foreach(rm)
    }
    val base = graft.Tables.documents(spark, sfDir)
    ScaleProbe.scaledCorpus(base, k).write.mode("overwrite")
      .parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")
    val ccDir = s"$tmp/cc"
    graft.operators.ClusterStore.ccBuild(docs, "doc_id", "text", ccDir,
      nBuckets = 8 * k)
    val batchBase5k = docs.filter(col("doc_id") < 5000).localCheckpoint()

    var seq = 0L
    val lines = Seq.newBuilder[String]
    lines += ("""{"mode":"cc-cadence","k":%d,"nBuckets":%d,"batch":5000,""" +
      """"note":"per-apply wall time vs committed generation count, """ +
      """JIT-warm in both phases - the touched-file read ceiling grows """ +
      """with gens between compactions and compaction resets it"}""")
      .format(k, 8 * k)
    def applyOnce(phase: String, i: Int): Unit = {
      System.gc() // untimed housekeeping between timed ops (probe convention)
      val gens = graft.operators.Generations.live(spark, ccDir).size
      val ld0 = graft.functions.HostStats.loadAvg1
      seq += 1
      val batch = batchBase5k
        .select((-(lit(seq) * 1000000 + col("doc_id")) - 1).as("doc_id"),
          col("text"))
      val t0 = System.nanoTime()
      graft.operators.ClusterStore.ccApply(spark, ccDir, batch,
        "doc_id", "text")
      val sec = (System.nanoTime() - t0) / 1e9
      if (phase != "warmup") {
        val line =
          f"""{"phase":"$phase","apply":$i,"gens_before":$gens,"sec":$sec%.2f,"ld":[$ld0%.2f,${graft.functions.HostStats.loadAvg1}%.2f]}"""
        println(line); lines += line
      }
    }
    // UNTIMED warmup: the apply path's generated code is cold for the
    // first few executions (the r14 first cut showed 9.9→7.5 s of pure
    // JIT warm-down masking the generation ramp) — run three applies and
    // a compaction off the record so BOTH timed phases start warm, at one
    // committed generation, with the same plan variants compiled
    for (i <- 1 to 3) applyOnce("warmup", i)
    graft.operators.ClusterStore.ccCompact(spark, ccDir)
    Thread.sleep(3000) // let the compaction's page writeback settle
    // phase 1: accumulate generations — the per-apply read term may climb
    // with the committed generation count (the documented ceiling)
    for (i <- 1 to nApplies) applyOnce("accumulate", i)
    // the cadence event itself, timed for completeness (store-sized by
    // design — it rewrites surviving state; off the serving path)
    val tc0 = System.nanoTime()
    graft.operators.ClusterStore.ccCompact(spark, ccDir)
    val compactLine = f"""{"phase":"compact","sec":${(System.nanoTime() - tc0) / 1e9}%.2f}"""
    println(compactLine); lines += compactLine
    Thread.sleep(3000) // same settle so phase 2's first row is comparable
    // phase 2: the reset — applies against the freshly folded store must
    // return to the low-generation-count cost
    for (i <- 1 to nApplies) applyOnce("post-compact", i)
    outFile.foreach { f =>
      java.nio.file.Files.writeString(java.nio.file.Path.of(f),
        lines.result().mkString("", "\n", "\n"))
    }
    spark.stop()
  }
}

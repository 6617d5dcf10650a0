package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused timing harness for the lm_score fixed-geometry growth term:
  * builds the scale probe's LM store at k=1 and k=16 with the SAME
  * geometry (nShards = 64) and times lmScore end-to-end on the pinned
  * 50-doc batch. This is the harness that attributed the round-9 1.85×
  * growth to the duplicated register subtree + per-surface file opens
  * (not scan bytes — the register is count-table-sized), and verified
  * the single-scan rollup plan flat (≈1.0× per 16×).
  *
  * `runMain graft.tools.LmProfile [sfDir]`
  */
object LmProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val base = graft.Tables.documents(spark, sfDir)
    def t[A](tag: String)(f: => A): Unit = {
      val runs = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-22s min ${runs.min}%.3f  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    for (k <- Seq(1, 16)) {
      val tmp = s"/tmp/graft_lmprof/x$k"
      ScaleProbe.scaledCorpus(base, k).write.mode("overwrite")
        .parquet(s"$tmp/docs")
      val docs = spark.read.parquet(s"$tmp/docs")
      val lmDir = s"$tmp/lm"
      graft.operators.LmStore.lmBuild(docs, "doc_id", "text", lmDir, nShards = 64)
      val batch = docs.filter(col("doc_id") < 50).localCheckpoint()
      val regRows = spark.read.option("basePath", s"$lmDir/bigrams")
        .parquet(s"$lmDir/bigrams/gen=g0").count()
      println(s"=== k=$k  corpus=${docs.count()} docs, register $regRows bigrams ===")
      t("lmScore end-to-end") {
        graft.operators.LmStore.lmScore(spark, batch, "doc_id", "text", lmDir).count()
      }
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Batch plan dumper for the optimization-round evidence trail:
  * `runMain graft.tools.ExplainDump <outDir> <sfDir> <q1,q2,...|all>`
  * writes `<outDir>/<name>.txt` with the `.explain("formatted")` output of
  * each named query (one shared session, bench-identical confs) so plan
  * claims in OPTIMIZATION_r*.md can be checked offline against committed
  * files. Unlike [[Explain]] it does not execute the plans — AQE-final
  * shapes are judged from the bench record; this captures the static plan
  * (Exchange count, join strategy, PushedFilters/ReadSchema, codegen
  * spans).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 2 && args(2) != "all") args(2).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
      } catch { case e: Throwable =>
        System.err.println(s"[explaindump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

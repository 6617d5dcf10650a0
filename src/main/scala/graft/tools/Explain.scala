package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.tools.Explain <queryName> [sfDir]`
  * prints the formatted physical plan (and times one execution) so shuffle
  * counts, broadcast choices, pushed filters and codegen spans can be
  * reviewed per query.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name executed in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}

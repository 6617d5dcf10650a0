package graft.tools

import org.apache.spark.sql.SparkSession

/** Bimodality probe for q44 (jaccardSelfJoin): runs the query repeatedly
  * with AQE on and off and prints per-run wall times — the round-10
  * diagnosis harness for the intermittent 4–10× slow runs the bench
  * guard keeps flagging on this query.
  *
  * `runMain graft.tools.Q44Probe [sfDir] [runs]`
  */
object Q44Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 8
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
    val fn = graft.SparkEntry.queries("q44_token_jaccard")
    def time(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 4).foreach(_ => time()) // JIT/codegen warm before any variant
    val variants: Seq[(String, Map[String, String])] = Seq(
      "aqe-on" -> Map("spark.sql.adaptive.enabled" -> "true"),
      "aqe-on2" -> Map("spark.sql.adaptive.enabled" -> "true"),
      "aqe-off" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "no-skewjoin" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "false"),
      "no-coalesce" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false"),
      "no-localreader" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.localShuffleReader.enabled" -> "false"),
      "no-bcastconv" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))
    val defaults = variants.flatMap(_._2.keys).distinct
      .map(k => k -> spark.conf.getOption(k)).toMap
    for ((tag, confs) <- variants) {
      defaults.foreach { case (k, v) =>
        v match { case Some(x) => spark.conf.set(k, x)
                  case None => spark.conf.unset(k) } }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val ts = (1 to runs).map(_ => time())
      println(f"$tag%-15s ${ts.map(t => f"$t%.2f").mkString(" ")}  " +
        f"min ${ts.min}%.2f max ${ts.max}%.2f")
    }
    spark.stop()
  }
}

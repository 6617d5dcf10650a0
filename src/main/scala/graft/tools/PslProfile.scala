package graft.tools

import graft.operators.PublicSuffix
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compiled-vs-dim PSL evaluator timing — the measurement behind
  * [[PublicSuffix.compiledRuleLimit]]: times the compiled CASE-chain
  * Column under the curated snapshot (~0.5k rules) and under the FULL
  * official list (~9.9k rules after punycode twinning), against the
  * broadcast-dim join under the official list, over a host frame
  * synthesized from the documents table across suffix families (plain
  * TLD, multi-label ccTLD, wildcard, exception, private-section, and
  * official-list-only long-tail). Each variant reports first-action
  * (planning + codegen included) and steady-state min — the crossover is
  * a PLANNING-cost story, the per-row cost is flat in rule count (InSet).
  *
  * `runMain graft.tools.PslProfile [sfDir] [iters] [mult]`
  */
object PslProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 5
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
    val mult = if (args.length > 2) args(2).toInt else 1
    val hosts = graft.Tables.documents(spark, sfDir)
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"))
      .select(col("doc_id").as("id"),
        concat(lit("w"), col("doc_id") % 1000, lit("."),
          element_at(array(lit("example.com"), lit("example.co.uk"),
            lit("b.ide.kyoto.jp"), lit("x.test.ck"), lit("city.kobe.jp"),
            lit("foo.pvt.k12.ma.us"), lit("u.github.io"),
            lit("shop.example.nagoya.jp"), lit("e.gov.uk"),
            lit("t.org.mk")), (col("doc_id") % 10 + 1).cast("int")))
          .as("host"))
      .localCheckpoint()
    val n = hosts.count()
    println(s"hosts: $n")
    def time(tag: String)(f: => Long): Unit = {
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); val c = f
        ((System.nanoTime() - t0) / 1e9, c)
      }
      require(runs.map(_._2).distinct.size == 1)
      println(f"  $tag%-28s first ${runs.head._1}%6.3f  " +
        f"min ${runs.map(_._1).min}%6.3f  " +
        s"runs ${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    val snapshot = PublicSuffix.defaultRules
    val official = PublicSuffix.officialRules
    def cnt(r: PublicSuffix.Rules) =
      r.exact.size + r.wildcardBase.size + r.exception.size
    println(s"snapshot rules: ${cnt(snapshot)}, official: ${cnt(official)}")
    time("compiled/snapshot") {
      hosts.withColumn("d",
        PublicSuffix.registrableDomain(col("host"), snapshot))
        .agg(count(col("d"))).head().getLong(0)
    }
    time("compiled/official") {
      hosts.withColumn("d",
        PublicSuffix.registrableDomain(col("host"), official))
        .agg(count(col("d"))).head().getLong(0)
    }
    time("dim/official") {
      PublicSuffix.registrableDomainDim(hosts, "host", "id",
        PublicSuffix.rulesDim(spark, official))
        .agg(count(col("domain"))).head().getLong(0)
    }
    spark.stop()
  }
}

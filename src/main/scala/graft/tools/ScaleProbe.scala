package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the corpus operators: times the
  * linear-output pipeline ops over 1×/2×/4×/8× corpora and prints one
  * JSON line per (op, scale) so the growth curve is measurable.
  *
  * The scaled corpus is K independent shards: copy k prefixes every token
  * with `ck_`, so shards share no vocabulary and the duplicate/near-dup
  * structure per shard is exactly the base corpus's. A linear-time
  * operator should then scale ~linearly in K (modulo fixed scheduling
  * overhead); anything superlinear is a plan problem, not a data
  * property.
  *
  * `runMain graft.tools.ScaleProbe [sfDir] [maxK]`
  */
object ScaleProbe {

  def scaledCorpus(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      docs.select(
        // id * k + i is collision-free for ANY base id distribution
        (col("doc_id") * k + i).as("doc_id"),
        // prefix every token with the shard tag (any whitespace run
        // separates tokens downstream, so normalize \s+): shards are
        // vocabulary-disjoint by construction
        regexp_replace(concat(lit(s"c${i}_"), col("text")), "\\s+", s" c${i}_")
          .as("text"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxK = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.Tables.documents(spark, sfDir)
    val ks = Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxK).toSeq
    for (k <- ks) {
      // materialize the scaled corpus so generation cost is out of the op
      // timings and every op reads the same parquet
      val path = s"/tmp/graft_scale/docs_x$k"
      scaledCorpus(base, k).write.mode("overwrite").parquet(path)
      val docs = spark.read.parquet(path)

      val ops: Seq[(String, () => Long)] = Seq(
        ("exact_dedup", () =>
          graft.operators.Dedup.exactDupGroups(docs, "doc_id", "text").count()),
        ("minhash_lsh", () =>
          graft.operators.Dedup.minHashLsh(docs, "doc_id", "text",
            shingleN = 3, k = 32, bands = 8, threshold = 0.5).count()),
        ("dedup_corpus", () =>
          graft.operators.Dedup.dedupCorpus(docs, "doc_id", "text").count()),
        ("pack_sequences", () =>
          graft.operators.Packing.packSequences(docs, "doc_id",
            size(split(col("text"), "\\s+")), budget = 512L).count()),
        ("decontaminate", () =>
          graft.operators.Decontaminate.contaminationReport(
            docs, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text").count()))

      for ((name, run) <- ops) {
        val t0 = System.nanoTime()
        val rows = run()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"$name","k":$k,"rows":$rows,"sec":$sec%.2f}""")
      }
    }
    spark.stop()
  }
}

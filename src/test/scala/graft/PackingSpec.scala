package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = (1L to 500L).map(i => (i, s"doc $i " + ("tok " * (i % 37).toInt)))
    .toDF("doc_id", "text")
  def nTok = size(split(col("text"), "\\s+"))

  test("packing covers every doc once; offsets stay inside the budget") {
    val packed = Packing.packSequences(docs, "doc_id", nTok, budget = 128)
      .collect()
    assert(packed.length === 500)
    assert(packed.map(_.getAs[Long]("doc_id")).toSet === (1L to 500L).toSet)
    assert(packed.forall(r => r.getAs[Long]("offset_in_seq") >= 0 &&
      r.getAs[Long]("offset_in_seq") < 128))
    // first-token positions reconstruct a contiguous token stream
    val total = packed.map(_.getAs[Long]("n_tok")).sum
    val maxSeq = packed.map(_.getAs[Long]("seq_id")).max
    assert(maxSeq === (total - packed.map(r =>
      (r.getAs[Long]("seq_id"), r.getAs[Long]("offset_in_seq"), r.getAs[Long]("n_tok")))
      .maxBy(t => (t._1, t._2))._3) / 128,
      "last sequence id must match total-token arithmetic")
  }

  test("distributed prefix sum is partition-count independent") {
    def run(parts: Int) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Packing.packSequences(docs, "doc_id", nTok, budget = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run(1) === run(7), "1-partition and 7-partition plans must agree")
    assert(run(7) === run(32), "7- and 32-partition plans must agree")
  }

  test("curriculumBatches: global rank matches the naive window; partition-independent") {
    import org.apache.spark.sql.expressions.Window
    def run(parts: Int) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Packing.curriculumBatches(docs, "doc_id", nTok, batchSize = 7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = run(1)
    assert(a === run(13), "1- and 13-partition plans must agree")
    // naive single-window reference
    val naive = docs
      .select(col("doc_id"), nTok.cast("long").as("k"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("k"), col("doc_id"))).cast("long") - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(a.map(t => (t._1, t._2, t._3)) === naive)
    // batch arithmetic
    assert(a.forall(t => t._4 === t._3 / 7 && t._5 === t._3 % 7))
  }

  test("matches the naive global-window formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    val naive = docs
      .select(col("doc_id"), nTok.cast("long").as("n_tok"),
        Packing.mixOrder(col("doc_id")).as("ord"))
      .withColumn("cum", sum(col("n_tok")).over(
        Window.orderBy(col("ord"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start", col("cum") - col("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        floor(col("start") / 64).as("seq_id"), (col("start") % 64).as("offset_in_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val dist = Packing.packSequences(docs, "doc_id", nTok, budget = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(dist.toSeq === naive.toSeq)
  }

  test("no global single-partition window over the corpus in the plan") {
    val packed = Packing.packSequences(docs, "doc_id", nTok, budget = 128)
    // the only Window.orderBy-without-partition operates on the nPart-row
    // partition-totals side; the corpus-sized window is partitioned by pid
    val plan = packed.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(pid"), plan)
  }
}

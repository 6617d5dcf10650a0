package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for context windows: split each document's token
  * stream into fixed-size windows with a configurable overlap — the
  * standard prep step for pretraining samples and retrieval chunks
  * (the dual of [[Packing.packSequences]], which concatenates SHORT
  * documents; this splits LONG ones).
  *
  * Scale shape: pure narrow per-row arithmetic (split → computed window
  * count → explode → slice) — shuffle-free, arbitrarily partitionable,
  * codegen'd built-ins end to end.
  */
object Chunking {

  /** One row per (doc, chunk): (id, chunk_id, start_tok, n_tok, chunk).
    * Windows start every `chunkSize − overlap` tokens; the last window
    * clamps at the document end (and is the only one allowed to be
    * shorter). Documents with ≤ `chunkSize` tokens yield exactly one
    * chunk: the whole document.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize >= 1 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize >= 1 and 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    docs
      .select(col(idCol).as("id"), split(col(textCol), "\\s+").as("w"))
      .withColumn("n", size(col("w")))
      // ceil(max(0, n - chunkSize) / step) + 1. The numerator is clamped
      // non-negative BEFORE the division so floor == truncation in every
      // engine (negative integer division truncates in Spark but floors
      // in DuckDB); floor(double) of small ints is exact in both.
      .withColumn("n_chunks",
        (floor((greatest(lit(0), col("n") - lit(chunkSize)) + lit(step - 1))
          / lit(step)) + 1).cast("int"))
      .select(col("id"), col("w"), col("n"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * step)
      .withColumn("chunk_toks",
        slice(col("w"), col("start_tok") + 1, lit(chunkSize)))
      .select(col("id"), col("chunk_id"), col("start_tok"),
        size(col("chunk_toks")).as("n_tok"),
        array_join(col("chunk_toks"), " ").as("chunk"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Redirect-chain resolution — a crawl's fetch log is full of 301/302
  * records whose payload is just a `Location` pointer; dedup, canonical
  * URLs, and the frontier all need each URL's FINAL destination. A chain
  * is a linked list in a table, so the scalable resolution is POINTER
  * DOUBLING (the [[Components]] trick specialized to functional graphs):
  * each round joins the state frame with itself, composing the known
  * k-step successor into a 2k-step successor — ⌈log₂ maxHops⌉ rounds
  * resolve every chain up to maxHops, not maxHops rounds.
  *
  * Input: one row per fetched URL — `location` = the redirect target, or
  * NULL for a terminal (2xx) fetch. Output per input URL:
  * (url, final_url, n_hops, terminal). URLs whose chain leaves the frame
  * (dangling target the crawl never fetched) finish at that external URL
  * with terminal=true — the pointer can't be followed further. URLs on a
  * redirect CYCLE never reach a terminal row: after the doubling rounds
  * they stay done=false and report terminal=false (crawlers drop them).
  *
  * Scale shape: each round is one equi-join of the state with itself on
  * the current endpoint — hash-partitioned, no driver state, no
  * per-chain iteration. 5 rounds cover 32 hops; real redirect chains are
  * <10 (browsers cap ~20), so the round count is a small constant while
  * chain COUNT parallelizes freely.
  */
object Redirects {

  /** Resolve (urlCol, locCol-nullable) fetch rows to final destinations. */
  def resolve(edges: DataFrame, urlCol: String, locCol: String,
      maxHops: Int = 32): DataFrame = {
    var state = edges.select(
      col(urlCol).cast("string").as("url"),
      coalesce(col(locCol), col(urlCol)).cast("string").as("cur"),
      when(col(locCol).isNull, 0L).otherwise(1L).as("hops"),
      col(locCol).isNull.as("done"))
    var span = 1
    while (span < maxHops) {
      val j = state.select(col("url").as("j_url"), col("cur").as("j_cur"),
        col("hops").as("j_hops"), col("done").as("j_done"))
      state = state.join(j, state("cur") === j("j_url") && !state("done"),
          "left")
        .select(state("url"),
          when(state("done"), state("cur"))
            .otherwise(coalesce(col("j_cur"), state("cur"))).as("cur"),
          when(state("done") || col("j_hops").isNull, state("hops"))
            .otherwise(state("hops") + col("j_hops")).as("hops"),
          // no match for an unfinished pointer = the target was never
          // fetched — the chain ends at that external URL
          (state("done") || col("j_done").isNull || col("j_done"))
            .as("done"))
      span *= 2
    }
    state.select(col("url"), col("cur").as("final_url"),
      col("hops").as("n_hops"), col("done").as("terminal"))
  }

  /** Deterministic fixture over the documents table: each doc owns one
    * redirect chain of 1+doc_id%4 rows — positions 0..L-1 redirect one
    * step down, position L is the terminal fetch — so hop counts span
    * 0..3 and the oracle derives (final, hops) from the position formula.
    */
  def syntheticFetchLog(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val l = (id % 4).toInt
        def u(p: Int) = s"https://h${id % 13}.example.com/r/$id/$p"
        (0 to l).map { p =>
          (id, u(p), if (p < l) u(p + 1) else null)
        }
      })
      .toDF("doc_id", "url", "location")
  }
}

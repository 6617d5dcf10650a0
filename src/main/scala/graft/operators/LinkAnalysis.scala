package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link analysis over a directed pair relation: fixed-round power-iteration
  * PageRank (Page, Brin, Motwani, Winograd 1999 — "The PageRank Citation
  * Ranking"; the iterative join+aggregate formulation is the textbook
  * MapReduce example). Over a dup-cluster star-edge graph
  * ([[Components.fingerprintEdges]]) the rank concentrates on cluster
  * hubs — a centrality signal curation uses to pick canonical survivors
  * and to spot template farms (one hub collecting thousands of spokes).
  *
  * Scale shape per round: one equi-join of the (long, double) rank table
  * with the edge list on src, one dst-keyed sum with map-side partial
  * aggregation, a one-row dangling-mass broadcast — and nothing else. The
  * rank table is 16 bytes a row; `localCheckpoint` truncates lineage per
  * round and the superseded table is unpersisted (the [[Components]]
  * loop's storage discipline). Round count is FIXED (`iters`), so wall
  * time is linear in edges × iters by construction.
  */
object LinkAnalysis {

  /** PageRank with uniform teleport and dangling-mass redistribution:
    * r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/outdeg(u) + dangling/N), `iters`
    * rounds from the uniform start. Edges are deduplicated; direction
    * respected; vertices absent from `edges` still rank (teleport +
    * dangling share). Output: (id, pagerank) rounded to 6 for
    * cross-engine replay — every arithmetic step is plain SQL, so a fixed
    * unrolling replays in DuckDB (the q123 oracle).
    *
    * PRECONDITION: every edge endpoint must appear in `vertices`.
    * Contributions flowing to a dst id absent from `vertices` vanish in
    * the left-outer join (rank mass silently leaks and the ranks no
    * longer sum to 1), and an absent src never emits at all. Callers
    * deriving edges from the vertex set ([[Components.fingerprintEdges]]
    * over the same corpus — the q123 shape) satisfy this by construction;
    * anyone else should union the edge endpoints into `vertices` first.
    * Not `require`d: the check would cost an extra corpus-wide anti-join
    * per call on a hot, already-iterative path.
    */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val v = vertices.select(col("id").cast("long").as("id")).localCheckpoint(false)
    // loop-invariant hoists (optimization guide §1.2 "the distributed
    // algorithm"): the out-degree join rides ON the checkpointed edge
    // frame once — the old loop re-joined e⋈deg every iteration — and the
    // vertex count is one bounded scalar collected once instead of a
    // broadcast 1-row frame re-materialized per iteration. The division
    // 1.0/n and (1−d) stay in double space (not pre-folded decimals).
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
    val degF = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = e.join(degF, "src").localCheckpoint(false)
    val deg = ed.select(col("src")).distinct().localCheckpoint(false)
    val nD = v.count().toDouble
    val n = lit(nD)
    val teleport = lit(1.0) - lit(damping)

    var ranks = v.select(col("id"), (lit(1.0) / n).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("id"))
        .select(ed("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      val dangling = ranks
        .join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dm"))
      val next = v
        .join(contrib, Seq("id"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (teleport / n + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dm") / n)).as("r"))
        .localCheckpoint()
      ranks.unpersist()
      ranks = next
    }
    val out = ranks.select(col("id"),
      graft.functions.ColumnFunctions.pround(col("r"), 6).as("pagerank"))
    out
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — duplicate-CLUSTER resolution,
  * the step after candidate-pair generation that every production dedup
  * pipeline needs: near-dup relations are not transitive (A~B and B~C does
  * not imply A~C passes the threshold), so keeping one survivor per
  * connected component of the pair graph is the standard policy
  * (reference analog: the dedup survivors in its curation scripts keep one
  * row per exact-hash group; this generalizes to fuzzy pair graphs).
  *
  * Algorithm: iterative min-label propagation — every vertex starts
  * labelled with its own id and repeatedly takes the min label over itself
  * and its neighbours until a fixpoint. Converges in O(diameter) rounds;
  * near-dup graphs are unions of small dense clusters (diameter ≤ a few
  * hops), so the round count is tiny and INDEPENDENT of corpus size. Each
  * round is one equi-join + one groupBy over compact (long, long) rows —
  * no driver-side graph, no vertex ever collected. For adversarial
  * long-path graphs the published fix is alternating large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
  * 2014), which squares path lengths per round; the propagation loop below
  * keeps the simpler shape because dedup graphs never pay that worst case,
  * and `maxIter` fails fast (rather than silently under-merging) if one
  * ever shows up.
  *
  * Scale shape at 100 TB: the edge set (already distilled to star edges by
  * [[fingerprintEdges]]) is O(corpus); each round shuffles only 16-byte
  * rows on a long key; `localCheckpoint` truncates lineage so the plan
  * does not grow with rounds and a lost executor replays one round, not
  * the whole history.
  */
object Components {

  /** Min-label propagation. `vertices`: one `id` column; `edges`:
    * (`src`, `dst`) — direction ignored, self-loops dropped. Returns
    * (id, cluster_id) where cluster_id = min id reachable from `id`.
    * Throws (rather than returning an under-merged labelling) if the
    * fixpoint is not reached within `maxIter` rounds.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    require(maxIter >= 1, "need maxIter >= 1")
    // undirected, deduped, self-loop-free; materialized once — every round
    // re-reads this, so it must not re-derive from the (possibly expensive)
    // candidate-pair plan each time
    val und = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(array_min(array(col("src"), col("dst"))).as("src"),
        array_max(array(col("src"), col("dst"))).as("dst"))
      .distinct()
    val both = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    var labels = vertices.select(col("id").cast("long").as("id"),
      col("id").cast("long").as("label")).localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // each vertex's next label = min(own, neighbours') — labels only
      // ever decrease, so "no label decreased" is the fixpoint test
      val viaNeighbour = both.join(labels, both("src") === labels("id"))
        .select(both("dst").as("id"), col("label"))
      val next = labels.union(viaNeighbour)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("label", "prev"), Seq("id"))
        .filter(col("label") < col("prev"))
        .isEmpty
      labels = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds — graph has " +
          "a longer path structure than a dedup pair graph should; raise " +
          "maxIter or switch to large-star/small-star")
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Star edges from content-window fingerprints: md5 over each configured
    * token window (1-based inclusive `from`..`to`); every doc gets one edge
    * to the MIN doc id of its fingerprint group — linear in the corpus
    * (never the O(group²) clique), with identical connectivity. Documents
    * shorter than a window emit no edge for it (an empty-slice fingerprint
    * would otherwise hub-connect all short docs). Overlapping windows make
    * the graph genuinely multi-hop: A≈B on the prefix window and B≈C on a
    * middle window chain into one cluster.
    */
  def fingerprintEdges(docs: DataFrame, idCol: String, textCol: String,
      windows: Seq[(Int, Int)] = Seq((1, 8), (5, 12))): DataFrame = {
    require(windows.nonEmpty && windows.forall { case (a, b) => a >= 1 && b >= a })
    val toks = docs.select(col(idCol).cast("long").as("id"),
      split(col(textCol), "\\s+").as("w"))
    windows.map { case (from, to) =>
      val fp = toks.filter(size(col("w")) >= to)
        .select(col("id"),
          md5(array_join(slice(col("w"), from, to - from + 1), " ")).as("fp"))
      val hubs = fp.groupBy("fp").agg(min("id").as("dst"))
      fp.join(hubs, "fp")
        .select(col("id").as("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
    }.reduce(_ union _)
  }

  /** Per-document dup-cluster assignment over fingerprint star edges:
    * (doc_id, cluster_id, cluster_size). The min-id member is the
    * canonical survivor; `cluster_size` > 1 marks documents that share a
    * content window with at least one other.
    */
  def dupClusters(docs: DataFrame, idCol: String, textCol: String,
      windows: Seq[(Int, Int)] = Seq((1, 8), (5, 12))): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = connectedComponents(
      docs.select(col(idCol).as("id")),
      fingerprintEdges(docs, idCol, textCol, windows))
    cc.select(col("id").as(idCol), col("cluster_id"),
      count(lit(1)).over(Window.partitionBy(col("cluster_id"))).as("cluster_size"))
  }
}

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
  * 2014), which contracts path structure geometrically per round; the loop
  * below starts with the simpler propagation shape (dedup graphs rarely pay
  * the worst case) and ESCAPES to the alternating-star algorithm after
  * `starAfter` unconverged rounds, seeded with the propagation progress —
  * so a planted 10k-hop path converges in O(log n) star rounds instead of
  * failing.
  *
  * Scale shape at 100 TB: the edge set (already distilled to star edges by
  * [[fingerprintEdges]]) is O(corpus); each round shuffles only 16-byte
  * rows on a long key. `localCheckpoint` truncates lineage so the plan does
  * not grow with rounds — the trade is fault tolerance for speed: the
  * checkpoint blocks live on executors, so losing one fails the job and
  * the caller reruns it (acceptable for a minutes-long dedup step; use
  * reliable `checkpoint()` with an HDFS checkpoint dir if a rerun is more
  * expensive than the extra write). Each round's superseded labels are
  * unpersisted once the next round's checkpoint materializes, so executor
  * storage stays O(|V| + |E|), not O(rounds).
  */
object Components {

  /** Min-label propagation with an alternating-star escape. `vertices`:
    * one `id` column; `edges`: (`src`, `dst`) — direction ignored,
    * self-loops dropped. Returns (id, cluster_id) where cluster_id = min
    * id reachable from `id`.
    *
    * Propagation runs up to min(`starAfter`, `maxIter`) rounds; if the
    * fixpoint is not reached and budget remains, the Kiveris alternating
    * large-star/small-star phase takes over (seeded with the propagation
    * progress) for up to `maxIter` rounds of its own. Throws — rather
    * than returning an under-merged labelling — only if even the star
    * phase fails to converge (or `maxIter` ≤ `starAfter` left it no room,
    * the strict fail-fast configuration).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 20, starAfter: Int = 8): DataFrame = {
    require(maxIter >= 1, "need maxIter >= 1")
    require(starAfter >= 1, "need starAfter >= 1")
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
    // Per-vertex labels only ever DECREASE (next = min(own, neighbours')),
    // and next's id set is always a SUPERSET of labels' (labels is unioned
    // in), so: equal row count ⟹ same id set, and then equal label-sum ⟹
    // every label unchanged ⟹ fixpoint. One (count, decimal-sum) aggregate
    // over the freshly checkpointed blocks replaces the old per-round
    // next⋈labels join + filter + isEmpty job (decimal so a petascale id
    // space cannot wrap the sum through overflow; the count guard covers
    // a round that only ADDS edge-endpoint ids without decreasing any
    // label — additions must stabilize before sums are comparable).
    def labelFp(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(col("label").cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), r.getDecimal(1))
    }
    var prevFp = labelFp(labels)
    var round = 0
    var converged = false
    while (!converged && round < math.min(maxIter, starAfter)) {
      val viaNeighbour = both.join(labels, both("src") === labels("id"))
        .select(both("dst").as("id"), col("label"))
      val next = labels.union(viaNeighbour)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      val fp = labelFp(next)
      converged = fp._1 == prevFp._1 && fp._2.compareTo(prevFp._2) == 0
      prevFp = fp
      labels.unpersist()
      labels = next
      round += 1
    }
    if (!converged && maxIter > starAfter) {
      // escape path: the progress edges (label → id, label < id by the
      // monotone-decrease invariant, so already canonical) compress every
      // hop propagation already traversed; connectivity is preserved
      // because a vertex's label is always an id inside its own component.
      // The base edges come from the CHECKPOINTED `both` (one direction),
      // never from `und` — seeding from `und` would re-execute the
      // possibly-expensive upstream candidate-pair plan exactly when the
      // job is already on its slow path
      val seed = both.filter(col("src") < col("dst")).union(
        labels.filter(col("label") =!= col("id"))
          .select(col("label").as("src"), col("id").as("dst")))
        .distinct()
      val stars = alternatingStars(seed, maxIter)
      val out = vertices.select(col("id").cast("long").as("id"))
        .join(stars.select(col("dst").as("id"), col("src").as("__lab")),
          Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("__lab"), col("id")).as("cluster_id"))
      labels.unpersist()
      both.unpersist()
      return out
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds — graph has " +
          "a longer path structure than a dedup pair graph should; raise " +
          "maxIter above starAfter to enable the large-star/small-star escape")
    both.unpersist()
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** INCREMENTAL connected components: absorb a new batch into an
    * existing labelling without re-pairing the old corpus with itself.
    * `oldLabels` is a previous (id, cluster_id) result; `newEdges` is
    * every edge with at least one endpoint in the new batch (the caller
    * derives these from its candidate-pair state — e.g. fingerprint
    * lookups against a persisted hub table — never by rescanning old
    * text).
    *
    * AFFECTED-SUBGRAPH shape: only the clusters actually touched by the
    * batch's edges enter the iterative phase. Touched clusters are found
    * by one semi-join of the old labelling on the new edges' endpoints;
    * their members join the subgraph as depth-1 label edges
    * (cluster_id → id), every UNTOUCHED cluster's labels pass through
    * verbatim via one anti-join — two linear scans of the old labelling,
    * but the per-round joins of the CC loop run over a graph whose size
    * tracks the batch (touched clusters + new vertices), not the corpus.
    * A new edge bridging two giant old components still converges in few
    * rounds because each component is a depth-1 star.
    *
    * Correctness: an untouched cluster has no edge to the batch (none of
    * its members is an endpoint), so its component — and its min-id label
    * — is unchanged by the union graph. A touched cluster enters with its
    * FULL member set and its label edges, so subgraph CC computes the
    * same component minima batch CC would (a cluster's stored label is
    * its min member id, hence the merged component's min is visible
    * inside the subgraph). Equals batch CC over (old edges ∪ new edges)
    * whenever `oldLabels` was a correct min-label labelling of the old
    * edge set (law in ComponentsSpec; q128 hash-checks the composition
    * end to end against the full-corpus recursive-CTE oracle).
    */
  def connectedComponentsIncremental(oldLabels: DataFrame,
      newVertices: DataFrame, newEdges: DataFrame,
      maxIter: Int = 20, starAfter: Int = 8): DataFrame = {
    val old = oldLabels.select(col("id").cast("long").as("id"),
      col("cluster_id").cast("long").as("cluster_id"))
    // checkpointed (not explicitly unpersisted — the returned frame is
    // lazy and still reads these blocks; the ContextCleaner reclaims them
    // once the caller drops the result): the possibly-expensive candidate
    // edge plan is evaluated once for the endpoint probe and the CC seed
    val newE = newEdges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val endpoints = newE.select(col("src").as("id"))
      .union(newE.select(col("dst").as("id"))).distinct()
    val touched = old.join(endpoints, Seq("id"), "left_semi")
      .select(col("cluster_id")).distinct()
    val members = old.join(touched, Seq("cluster_id"), "left_semi")
      .localCheckpoint()
    val vertices = members.select(col("id"))
      .union(endpoints)
      .union(newVertices.select(col("id").cast("long").as("id")))
      .distinct()
    val labelEdges = members.filter(col("id") =!= col("cluster_id"))
      .select(col("cluster_id").as("src"), col("id").as("dst"))
    val sub = connectedComponents(vertices, labelEdges.union(newE),
      maxIter, starAfter)
    val untouched = old.join(touched, Seq("cluster_id"), "left_anti")
      .select(col("id"), col("cluster_id"))
    untouched.unionByName(sub.select(col("id"), col("cluster_id")))
  }

  /** Alternating large-star/small-star rounds (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014): large-star links
    * every neighbour v > u to m(u) = min(Γ(u) ∪ {u}); small-star links
    * every neighbour v < u (and u itself) to the min of those. Each phase
    * preserves connectivity, only ever contracts toward component minima,
    * and the fixed points are exactly unions of stars centred at each
    * component's min — so path structure collapses geometrically
    * (O(log n) rounds on a path) instead of one hop per round.
    *
    * Input: canonical undirected edges (src < dst, distinct, no
    * self-loops). Output: the converged star edges — (component_min,
    * member) one row per non-min member; isolated vertices and the
    * centres themselves emit nothing (the caller coalesces to self).
    * Same per-round shape as propagation: equi-join + groupBy over
    * 16-byte rows, localCheckpoint + unpersist per round.
    */
  private[operators] def alternatingStars(edges0: DataFrame,
      maxRounds: Int): DataFrame = {
    def canon(df: DataFrame) = df
      .select(array_min(array(col("a"), col("b"))).as("src"),
        array_max(array(col("a"), col("b"))).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    var cur = edges0.localCheckpoint()
    var round = 0
    var done = cur.isEmpty
    while (!done && round < maxRounds) {
      val both = cur.union(cur.select(col("dst").as("src"), col("src").as("dst")))
      // large-star: each edge appears once with dst > src in `both`, so the
      // whole phase is one min-aggregate + one equi-join
      val mAll = both.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src").as("u"), least(col("src"), col("mn")).as("m"))
      val large = canon(
        both.join(mAll, both("src") === col("u"))
          .filter(col("dst") > col("src"))
          .select(col("dst").as("a"), col("m").as("b")))
      // small-star on the large-star output: from each u's perspective only
      // the smaller neighbours (every canonical edge appears once as
      // (src = larger endpoint, dst = smaller) in `lboth` filtered)
      val lboth = large.union(large.select(col("dst").as("src"), col("src").as("dst")))
      val smallN = lboth.filter(col("dst") < col("src"))
      val mS = smallN.groupBy("src").agg(min("dst").as("m"))
      val next = canon(
        smallN.join(mS, "src").select(col("dst").as("a"), col("m").as("b"))
          .union(mS.select(col("src").as("a"), col("m").as("b"))))
        .localCheckpoint()
      done = next.except(cur).isEmpty && cur.except(next).isEmpty
      cur.unpersist()
      cur = next
      round += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"alternatingStars: no fixpoint after $maxRounds rounds — raise maxIter")
    cur
  }

  /** One (w, id, fp) row per document per configured token window it is
    * long enough for: fp = md5 over the 1-based inclusive `from`..`to`
    * token slice, `w` the window's index — fingerprints are grouped per
    * (w, fp), so a coincidental md5 match ACROSS windows never joins
    * documents (identical semantics to fingerprinting each window
    * separately). The raw material of [[fingerprintEdges]] and the
    * persisted hub table ([[ClusterStore]]).
    */
  private[operators] def fingerprintRows(docs: DataFrame, idCol: String,
      textCol: String, windows: Seq[(Int, Int)]): DataFrame = {
    require(windows.nonEmpty && windows.forall { case (a, b) => a >= 1 && b >= a })
    val toks = docs.select(col(idCol).cast("long").as("id"),
      split(col(textCol), "\\s+").as("w"))
    windows.zipWithIndex.map { case ((from, to), wi) =>
      toks.filter(size(col("w")) >= to)
        .select(lit(wi).as("w"), col("id"),
          md5(array_join(slice(col("w"), from, to - from + 1), " ")).as("fp"))
    }.reduce(_ union _)
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
    val fp = fingerprintRows(docs, idCol, textCol, windows)
    val hubs = fp.groupBy("w", "fp").agg(min("id").as("dst"))
    fp.join(hubs, Seq("w", "fp"))
      .select(col("id").as("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
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

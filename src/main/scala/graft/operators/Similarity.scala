package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one pass, no corpus shuffle. The baseline
  *    every approximate method is verified against.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — queries only meet
  *    corpus vectors sharing their bucket, cutting the scan by ~2^bits.
  *    This is the 100 TB path: bucket id is the join key, the corpus is
  *    hash-partitioned by bucket once and reused across query batches.
  *  - [[embeddingNearDups]]: cosine-radius self-join via the same buckets.
  *
  * All vector math is codegen'd `Column` arithmetic (VectorFunctions) in
  * float64; no UDFs.
  */
object Similarity {

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * (it is broadcast). Ties broken by corpus id ascending.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms once per vector (not per pair); cos = dot/(nrm_a*nrm_b) is
    // bit-identical to cosine() but does 1/3 of the element loops
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qnrm", l2Norm(col("qv")))
    val scored = c
      .join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        graft.functions.ColumnFunctions.pround(col("cos"), 6).as("cos_sim"))
  }

  /** LSH-bucketed approximate top-k: only corpus vectors in the same
    * hyperplane bucket as the query are scored. Recall trades off with
    * `nBits`; multi-probe (flipping one bit) can be layered on by unioning
    * bucket ids.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val c = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), nBits))
      .withColumn("nrm", l2Norm(col("v")))
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), nBits))
      .withColumn("qnrm", l2Norm(col("qv")))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        graft.functions.ColumnFunctions.pround(col("cos"), 6).as("cos_sim"))
  }

  /** [[lshTopK]] on the portable Rademacher hyperplanes
    * ([[graft.functions.VectorFunctions.lshBucketPortable]]): bucket
    * assignment is engine-exact (±1 literal hyperplanes, sequential
    * summation), so the q50 DuckDB oracle replays the whole bucketed
    * search. `dim` must match the embedding dimension.
    */
  def lshTopKPortable(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int, dim: Int): DataFrame = {
    val c = corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucketPortable(col("v"), nBits, dim))
      .withColumn("nrm", l2Norm(col("v")))
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucketPortable(col("qv"), nBits, dim))
      .withColumn("qnrm", l2Norm(col("qv")))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        graft.functions.ColumnFunctions.pround(col("cos"), 6).as("cos_sim"))
  }

  /** IVF (inverted-file) approximate top-k: k-means centroids learned once
    * over (a sample of) the corpus; each corpus vector is assigned to its
    * nearest centroid cell, and a query only scans its `nProbe` nearest
    * cells. This is the classic coarse-quantizer ANN layout: at 100 TB the
    * corpus is written partitioned by `cell`, so a query batch touches
    * nProbe/nCells of the data and the per-cell scan is an equi-join on the
    * cell id — no broadcast of the corpus, no full scan.
    *
    * Returns the same shape as [[bruteForceTopK]]. Recall is tested against
    * the exact baseline in SimilaritySpec.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    // coarse quantizer only needs rough cells: cap the iteration count and
    // loosen tol — every extra k-means iteration is a full corpus pass, and
    // recall (tested vs the exact baseline) is insensitive to the last
    // few centroid updates
    // random init: k-means|| costs ~initSteps extra corpus passes for
    // centroid quality the probe stage doesn't need
    val km = new KMeans().setK(nCells).setSeed(42L)
      .setMaxIter(8).setTol(1e-3).setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
    // the coarse quantizer fits on a BOUNDED sample: every k-means
    // iteration is a pass over its input, and cell quality is insensitive
    // to sampling at this granularity (recall law in SimilaritySpec).
    // count() is parquet-metadata-cheap; fraction 1.0 below the cap keeps
    // small corpora (and the spec fixtures) on the exact previous path
    val fitCap = 100000L
    val nCorpus = c.count()
    val fitSet =
      if (nCorpus <= fitCap) c.select(col("features"))
      else c.sample(withReplacement = false, fitCap.toDouble / nCorpus, seed = 42L)
        .select(col("features"))
    val model = km.fit(fitSet)

    val cells = model.transform(c).select(col("id"), col("v"), col("cell"))
      .withColumn("nrm", l2Norm(col("v")))

    probeCells(cells, model.clusterCenters.map(_.toArray), queries, idCol,
      vecCol, k, nProbe)
  }

  /** PORTABLE IVF: identical probe machinery to [[ivfTopK]] but the coarse
    * quantizer is the "random centroids" layout — the nCells corpus vectors
    * that sort FIRST by md5(id) (a deterministic, engine-replayable draw)
    * instead of fitted k-means means. Random-vector coarse quantizers are
    * the standard cheap IVF initialization; cell balance is worse than
    * k-means but the probe/scan shape — assign by nearest centroid, scan
    * nProbe/nCells of the corpus per query — is exactly the same, so this
    * variant puts the whole IVF search path (assignment, probe selection,
    * cell equi-join, top-k) under the DuckDB hash check (q111) while the
    * k-means quantizer stays engine-native under the SimilaritySpec recall
    * laws (q51). Centroid fetch is a driver-sized top-nCells collect.
    */
  def ivfTopKPortable(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val centroids = portableCentroids(c, nCells)
    probeCells(assignCells(c, centroids), centroids, queries, idCol, vecCol,
      k, nProbe)
  }

  /** The portable coarse quantizer: the `nCells` vectors of `c` (an
    * (id, v) frame) first in md5(id) order — a deterministic,
    * engine-replayable draw; a driver-sized top-nCells collect. Ordered by
    * cell index (= draw rank). */
  private[operators] def portableCentroids(c: DataFrame,
      nCells: Int): Array[Array[Double]] = c
    .withColumn("h", md5(col("id").cast("string")))
    .orderBy(col("h"), col("id"))
    .limit(nCells)
    .select(col("v")).collect()
    .map(_.getSeq[Double](0).toArray)

  /** Nearest-centroid assignment as a narrow projection over a literal
    * centroid array (ties broken by cell index — same rule as probeSide):
    * (id, v) → (id, v, cell, nrm). */
  private[operators] def assignCells(c: DataFrame,
      centroids: Array[Array[Double]]): DataFrame = c
    .withColumn("cellDists", array(centroids.zipWithIndex.map { case (ctr, i) =>
      struct(l2Sq(col("v"), lit(ctr)).as("d"), lit(i).as("cell"))
    }: _*))
    .withColumn("cell", element_at(array_sort(col("cellDists")), 1).getField("cell"))
    .drop("cellDists")
    .withColumn("nrm", l2Norm(col("v")))

  /** The IVF probe stage shared by the one-shot [[ivfTopK]] and the
    * persisted-index [[ivfSearch]]: each query scans only its nProbe
    * nearest centroid cells (centroids are tiny — shipped as a literal
    * array), candidates meet in an equi-join on the cell id.
    *
    * The query batch is driver-sized by contract (every consumer
    * broadcasts it), but its SOURCE may be a filter over a corpus-sized
    * table read by many tasks — so the narrow (query_id, qv) projection
    * is pinned FIRST (the scan stays parallel, the rows land on the
    * driver) and the centroid-distance projection evaluates over the
    * pinned rows in ONE task. That projection's expression tree carries
    * nCells × dim literal doubles, and its per-TASK setup cost (~135 ms
    * at 256×64 — plan deserialization/init, independent of row count)
    * dominates a small batch: fanned across the source's partitions it
    * made serve cost grow with the corpus partition count while serving
    * 3 rows (the r11 fixed-geometry ann_search "knee": executor time
    * 1.2→4.3 s as the query table's file count grew 16→32, rows
    * constant at 3).
    */
  private[graft] def probeSide(centroids: Array[Array[Double]], queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame =
    graft.functions.Frames.pinLocal(
        queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv")))
      .coalesce(1)
      .withColumn("qnrm", l2Norm(col("qv")))
      .withColumn("cellDists", array(centroids.zipWithIndex.map { case (ctr, i) =>
        struct(l2Sq(col("qv"), lit(ctr)).as("d"), lit(i).as("cell"))
      }: _*))
      .withColumn("probe", slice(array_sort(col("cellDists")), 1, nProbe))
      .withColumn("cell", explode(col("probe.cell")))
      .select(col("query_id"), col("qv"), col("qnrm"), col("cell"))

  private[graft] def scoreProbe(cells: DataFrame, q: DataFrame, k: Int): DataFrame =
    cells.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        graft.functions.ColumnFunctions.pround(col("cos"), 6).as("cos_sim"))

  private def probeCells(cells: DataFrame, centroids: Array[Array[Double]],
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame =
    scoreProbe(cells, probeSide(centroids, queries, idCol, vecCol, nProbe), k)

  /** Build a PERSISTED IVF index under `indexDir`: the fitted coarse
    * quantizer at `indexDir/model` and the cell assignments at
    * `indexDir/cells`, written `partitionBy("cell")` — the 100 TB layout:
    * a query batch reads only its probed cells' files (partition pruning
    * on the cell directory), and new corpus batches append without
    * touching existing files. Fit is bounded by the same 100k sample cap
    * as [[ivfTopK]].
    */
  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String,
      indexDir: String, nCells: Int = 16): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val km = new KMeans().setK(nCells).setSeed(42L)
      .setMaxIter(8).setTol(1e-3).setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
    val fitCap = 100000L
    val nCorpus = c.count()
    val fitSet =
      if (nCorpus <= fitCap) c.select(col("features"))
      else c.sample(withReplacement = false, fitCap.toDouble / nCorpus, seed = 42L)
        .select(col("features"))
    val model = km.fit(fitSet)
    model.write.overwrite().save(s"$indexDir/model")
    model.transform(c).select(col("id"), col("v"), col("cell"))
      .withColumn("nrm", l2Norm(col("v")))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/cells")
  }

  /** Assign a NEW corpus batch to the persisted index's cells and append —
    * the incremental path: the quantizer is NEVER refit (cell ids stay
    * stable, existing files untouched), matching how production IVF
    * indexes absorb a morning's crawl. Periodic rebuilds (when drift
    * degrades recall) are a fresh [[ivfBuild]].
    */
  def ivfAppend(spark: SparkSession, batch: DataFrame, idCol: String,
      vecCol: String, indexDir: String): Unit = {
    import org.apache.spark.ml.clustering.KMeansModel
    import org.apache.spark.ml.functions.array_to_vector
    val model = KMeansModel.load(s"$indexDir/model")
    val c = batch.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    model.transform(c).select(col("id"), col("v"), col("cell"))
      .withColumn("nrm", l2Norm(col("v")))
      .write.mode("append").partitionBy("cell").parquet(s"$indexDir/cells")
  }

  /** Serve top-k queries from a persisted IVF index: load the quantizer,
    * probe nProbe cells per query against the cell store (partition-pruned
    * read). Same output shape as [[bruteForceTopK]].
    */
  def ivfSearch(spark: SparkSession, queries: DataFrame, idCol: String,
      vecCol: String, indexDir: String, k: Int, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeansModel
    val model = KMeansModel.load(s"$indexDir/model")
    val cells = spark.read.parquet(s"$indexDir/cells")
    // pinned as a driver-side local relation: the probed-cell collect and
    // the scoring join must see the SAME evaluation of a possibly
    // nondeterministic queries plan — otherwise a query row present only
    // at scoring time could probe a cell the static filter below already
    // pruned away. (Driver-sized by construction: this side broadcasts.)
    val q = graft.functions.Frames.pinLocal(
      probeSide(model.clusterCenters.map(_.toArray), queries, idCol,
        vecCol, nProbe))
    // The probed-cell set is bounded by nCells (driver-sized BY
    // CONSTRUCTION — it cannot exceed the centroid count), so a static IN
    // filter on the partition column makes pruning unconditional: the scan
    // touches only the probed cells' directories, instead of hoping DPP
    // fires through the exploded probe side.
    val probed = q.select(col("cell")).distinct().collect()
      .map(_.getAs[Number](0).intValue())
    scoreProbe(cells.filter(col("cell").isin(probed.map(Integer.valueOf): _*)), q, k)
  }

  /** Banded (multi-table) hyperplane-LSH near-dup pairs by cosine ≥
    * threshold — the 100 TB radius-search path. `tables` independent
    * `bitsPerTable`-bit bucketings (OR-of-AND, exactly MinHash banding's
    * shape): a pair is a candidate if it shares ANY table's bucket, then
    * the exact cosine verifies, so precision is 1.0 and recall is
    * 1 − (1 − p^bits)^tables with p = 1 − θ/π. Defaults (8 bits × 16
    * tables) give ≥ 0.93 detection at cos 0.8 and ≥ 0.995 at cos 0.9
    * while random near-orthogonal pairs collide in only ~1/16 of n² —
    * radius search close to the random-similarity regime is inherently
    * a recall/cost dial; tune toward more, narrower tables for higher
    * recall at lower thresholds.
    *
    * Scale shape mirrors [[graft.operators.Dedup.minHashLsh]]: only
    * (table, bucket, id) triples shuffle through the candidate join —
    * never the vectors — and each surviving side's vector is fetched once
    * by id for the verify stage. Returns (id_a, id_b, cos_sim) with
    * id_a < id_b.
    */
  def embeddingNearDupsBanded(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 16, bitsPerTable: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val banded = c.select(col("id"),
      posexplode(hyperplaneBuckets(col("v"), bitsPerTable, tables))
        .as(Seq("tbl", "bucket")))
    val l = banded.select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("tbl"), col("bucket"), col("id").as("id_b"))
    // multi-table collisions → dedup on the bare 16-byte id pair first
    val pairs = l.join(r, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val sets = c.withColumn("nrm", l2Norm(col("v")))
    pairs
      .join(sets.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b")), Seq("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"),
        graft.functions.ColumnFunctions.pround(col("cos"), 6).as("cos_sim"))
  }

  /** [[embeddingNearDupsBanded]] on the portable per-table Rademacher
    * hyperplanes ([[graft.functions.VectorFunctions.hyperplaneBucketsPortable]]):
    * candidate generation is engine-exact, so the q49 DuckDB oracle
    * replays the whole banded search + cosine verify. `dim` must match
    * the embedding dimension.
    */
  def embeddingNearDupsBandedPortable(corpus: DataFrame, idCol: String,
      vecCol: String, threshold: Double, tables: Int = 16,
      bitsPerTable: Int = 8, dim: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val banded = c.select(col("id"),
      posexplode(hyperplaneBucketsPortable(col("v"), bitsPerTable, tables, dim))
        .as(Seq("tbl", "bucket")))
    val l = banded.select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("tbl"), col("bucket"), col("id").as("id_b"))
    val pairs = l.join(r, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val sets = c.withColumn("nrm", l2Norm(col("v")))
    pairs
      .join(sets.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b")), Seq("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"),
        graft.functions.ColumnFunctions.pround(col("cos"), 6).as("cos_sim"))
  }

  /** The persistable LSH state of an embedding corpus: one (id, tbl,
    * bucket) row per table per vector — the embeddings twin of
    * [[graft.operators.Dedup.bandSignatures]]. Built on the PORTABLE
    * Rademacher planes so state computed by any engine (or any session)
    * is bucket-identical; parameters are stamped into the `bucket`
    * column's metadata (parquet-persistent) so
    * [[embeddingDedupIncremental]] can refuse state built under a
    * different scheme. Deliberately narrow: only (tbl, bucket, id) ever
    * enters a candidate shuffle — never the vectors.
    */
  def bucketSignatures(corpus: DataFrame, idCol: String, vecCol: String,
      tables: Int = 16, bitsPerTable: Int = 8, dim: Int = 64): DataFrame = {
    val params = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.tables", tables.toLong)
      .putLong("graft.bitsPerTable", bitsPerTable.toLong)
      .putLong("graft.dim", dim.toLong)
      .build()
    corpus
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .select(col("id"),
        posexplode(hyperplaneBucketsPortable(col("v"), bitsPerTable, tables, dim))
          .as(Seq("tbl", "bucket")))
      .withMetadata("bucket", params)
  }

  /** Incremental embedding dedup: clean a NEW embedding batch against the
    * already-ingested corpus WITHOUT re-pairing the corpus with itself —
    * the embeddings twin of [[graft.operators.Dedup.dedupIncremental]].
    *
    * `oldBuckets` is the persisted [[bucketSignatures]] state (append-only
    * across batches); `oldVecs` is the corpus itself, touched ONLY to
    * fetch vectors for candidate ids that survive bucketing (a
    * semi-join-pruned point lookup — never a full scan). A new vector is
    * dropped when its cosine vs any old vector reaches `threshold` (old
    * corpus always wins) or vs a smaller-id new vector (the greedy
    * min-keeper rule). Byte-identical vectors need no separate stage:
    * identical vector ⇒ identical buckets ⇒ collision ⇒ cos = 1.
    */
  def embeddingDedupIncremental(newVecs: DataFrame, oldVecs: DataFrame,
      oldBuckets: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 16, bitsPerTable: Int = 8,
      dim: Int = 64): DataFrame = {
    // fail fast on state built under a different bucketing scheme — with
    // mismatched (tables, bits, dim) the (tbl, bucket) join is silently
    // near-empty and cross-batch duplicates sail through
    val m = oldBuckets.schema.find(_.name == "bucket").map(_.metadata)
      .getOrElse(org.apache.spark.sql.types.Metadata.empty)
    if (m.contains("graft.tables")) {
      val (ot, ob, od) = (m.getLong("graft.tables"),
        m.getLong("graft.bitsPerTable"), m.getLong("graft.dim"))
      require(ot == tables && ob == bitsPerTable && od == dim,
        s"embeddingDedupIncremental: oldBuckets was built with (tables=$ot, " +
          s"bitsPerTable=$ob, dim=$od) but this call uses (tables=$tables, " +
          s"bitsPerTable=$bitsPerTable, dim=$dim) — buckets would never " +
          "collide across batches")
    }
    // the batch is bucketed ONCE; the same table drives both joins
    val newBuckets = bucketSignatures(newVecs, idCol, vecCol, tables, bitsPerTable, dim)
    def vecs(df: DataFrame) = df.select(col(idCol).as("id"),
      asDouble(col(vecCol)).as("v")).withColumn("nrm", l2Norm(col("v")))
    val newV = vecs(newVecs)

    val crossCand = newBuckets.select(col("tbl"), col("bucket"), col("id").as("new_id"))
      .join(oldBuckets.select(col("tbl"), col("bucket"), col("id").as("old_id")),
        Seq("tbl", "bucket"))
      .select(col("new_id"), col("old_id"))
      .distinct()

    val oldCandV = vecs(oldVecs)
      .join(crossCand.select(col("old_id").as("id")).distinct(), Seq("id"), "left_semi")
    val droppedVsOld = crossCand
      .join(newV.select(col("id").as("new_id"), col("v").as("v_a"), col("nrm").as("nrm_a")), Seq("new_id"))
      .join(oldCandV.select(col("id").as("old_id"), col("v").as("v_b"), col("nrm").as("nrm_b")), Seq("old_id"))
      .filter(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")) >= threshold)
      .select(col("new_id").as(idCol))
      .distinct()

    // within-batch pairs from the SAME bucket table
    val l = newBuckets.select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val r = newBuckets.select(col("tbl"), col("bucket"), col("id").as("id_b"))
    val withinCand = l.join(r, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val droppedWithin = withinCand
      .join(newV.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a")), Seq("id_a"))
      .join(newV.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b")), Seq("id_b"))
      .filter(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")) >= threshold)
      .select(col("id_b").as(idCol))
      .distinct()

    newVecs.join(droppedVsOld.union(droppedWithin).distinct(), Seq(idCol), "left_anti")
  }

  /** Batch corpus-level embedding dedup: greedy min-keeper over the banded
    * near-dup pairs (a vector is dropped iff it is the larger id of any
    * confirmed pair — one pass, no connected components; transitive chains
    * keep their minimum element). The batch law twin of
    * [[embeddingDedupIncremental]].
    */
  def dedupEmbeddings(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 16, bitsPerTable: Int = 8,
      dim: Int = 64): DataFrame = {
    val losers = embeddingNearDupsBandedPortable(corpus, idCol, vecCol,
      threshold, tables, bitsPerTable, dim)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Near-duplicate pairs by cosine ≥ threshold, bucketed self-join
    * (id_a < id_b). For exhaustive (non-approximate) output use nBits=0,
    * which degenerates to the full cross self-join — only for small n
    * (the test oracle for [[embeddingNearDupsBanded]], which is the
    * declared scale path).
    */
  /** SemDeDup-shaped semantic dedup with a deterministic, replayable
    * geometry: assign every vector to its nearest of the `k` seed
    * centroids (the k smallest-id vectors — a fixed, engine-independent
    * choice standing in for trained k-means centres, which are seeded and
    * hence unreplayable; the TRAINED path is [[semDedupTrained]]), then
    * inside each cluster mark members whose cosine to the cluster exemplar
    * (its smallest id) reaches `tau` as semantic duplicates. Assignment
    * ranks on the 6-decimal parity round of cosine (ties to the smaller
    * centroid id) so the argmax replays exactly.
    *
    * Scale shape: the k centroids are a driver-sized collect shipped back
    * as LITERALS (the [[VectorStore.annSearchSweep]] pattern), so
    * assignment is a pure per-row codegen'd projection — an
    * array-of-structs (−cos, cid) sorted and truncated to its head, zero
    * joins, zero exchange. The only shuffle in the whole operator is the
    * k-group exemplar aggregate (map-side combined, ≤k rows per task);
    * exemplar vectors come back via one broadcast hash join. The corpus
    * is scanned twice and shuffled never (PlanSpec pin).
    */
  def semDedupExemplar(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double): DataFrame = {
    val c = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val cent = c.orderBy(col("id")).limit(k)
      .select(col("id"), col("v"), col("nrm")).collect()
      .map(r => (r.get(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    markExemplarDups(c, assignExemplarCells(c, cent), idCol, tau)
  }

  /** The exemplar stage shared by both SemDeDup variants: per cluster the
    * min-id member is the exemplar (a k-group aggregate with map-side
    * partials — the operator's ONLY shuffle), its vector comes back via
    * one corpus hash join, and members re-join the k-row exemplar frame by
    * broadcast for the τ gate. */
  private def markExemplarDups(c: DataFrame, assigned: DataFrame,
      idCol: String, tau: Double): DataFrame = {
    val exemplars = assigned.groupBy(col("cluster_id"))
      .agg(min(col("id")).as("exemplar_id"))
      .join(c.select(col("id").as("exemplar_id"), col("v").as("ev"),
        col("nrm").as("enrm")), Seq("exemplar_id"))
    assigned.join(broadcast(exemplars), Seq("cluster_id"))
      .withColumn("cos_ex", graft.functions.ColumnFunctions.pround(
        dot(col("v"), col("ev")) / (col("nrm") * col("enrm")), 6))
      .select(col("id").as(idCol), col("cluster_id"), col("exemplar_id"),
        col("cos_ex"),
        when(col("cos_ex") >= tau && col("id") =!= col("exemplar_id"), 1)
          .otherwise(0).as("is_dup"))
  }

  /** Nearest-centroid assignment over a LITERAL centroid list (cid, cv,
    * cnrm) by rounded cosine, ties to the smaller cid — the shuffle-free
    * argmax shared by [[semDedupExemplar]] and [[semDedupTrained]]:
    * (id, v, nrm) → (id, v, nrm, cluster_id), a narrow projection. The
    * struct sorts ascending on (−cos, cid), so the head is the max-cosine
    * centroid with deterministic tie-break — exactly the old
    * row_number-over-Window ordering without its corpus×k exchange. */
  private def assignExemplarCells(c: DataFrame,
      cent: Array[(Any, Array[Double], Double)]): DataFrame = c
    .withColumn("best", element_at(array_sort(array(cent.map {
      case (cid, cv, cnrm) => struct(
        (-graft.functions.ColumnFunctions.pround(
          dot(col("v"), lit(cv)) / (col("nrm") * lit(cnrm)), 6)).as("nc"),
        lit(cid).as("cid"))
    }: _*)), 1))
    .select(col("id"), col("v"), col("nrm"), col("best.cid").as("cluster_id"))

  /** SemDeDup with TRAINED centroids — the production geometry: a k-means
    * coarse quantizer (the [[ivfBuild]] recipe: seed 42, capped
    * iterations, bounded fit sample) replaces the seed-id centroid draw,
    * then the identical exemplar machinery runs — same shuffle-free
    * literal-centroid argmax ([[assignExemplarCells]]), same min-id
    * exemplar per cluster, same τ dup gate. `cluster_id` is the centroid
    * INDEX (0..k−1) since trained centres are not corpus vectors.
    *
    * Seeded k-means is engine-native (no DuckDB oracle possible — the
    * q51/q60 situation); [[semDedupExemplar]] is the oracle-green
    * deterministic twin, and the q157 agreement row quantifies how far
    * the trained geometry moves the dup verdicts (SimilaritySpec laws pin
    * the structural invariants).
    */
  def semDedupTrained(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, fitCap: Long = 100000L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(fitCap >= k, s"fitCap $fitCap must be >= k $k")
    val c = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    // k = 1: every vector lands in the single cluster no matter where
    // the centroid sits (an argmax over one candidate), so no fit is
    // needed — and MLlib's KMeans refuses k < 2. The exemplar machinery
    // below is unchanged, which is what makes the k=1 sweep row an exact
    // self-check against the deterministic twin.
    if (k == 1) {
      val assigned = c.withColumn("cluster_id", lit(0))
        .select(col("id"), col("v"), col("nrm"), col("cluster_id"))
      return markExemplarDups(c, assigned, idCol, tau)
    }
    val fit = c.withColumn("features", array_to_vector(col("v")))
    val km = new KMeans().setK(k).setSeed(42L)
      .setMaxIter(8).setTol(1e-3).setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
    val nCorpus = fit.count()
    val fitSet =
      if (nCorpus <= fitCap) fit.select(col("features"))
      else fit.sample(withReplacement = false, fitCap.toDouble / nCorpus,
        seed = 42L).select(col("features"))
    val cent = km.fit(fitSet).clusterCenters.zipWithIndex.map {
      case (ctr, i) =>
        val a = ctr.toArray
        (i: Any, a, math.sqrt(a.map(x => x * x).sum))
    }
    markExemplarDups(c, assignExemplarCells(c, cent), idCol, tau)
  }

  /** Sensitivity sweep for the trained SemDeDup path — the record a team
    * reads BEFORE trusting trained centroids on a real corpus: one row
    * per (k, fit_cap) with the per-vector dup-verdict agreement between
    * [[semDedupTrained]] and the deterministic oracle-green twin
    * [[semDedupExemplar]] at the same (k, τ). `fit_cap` bounds the
    * k-means fit sample, so the sweep separates centroid-COUNT
    * sensitivity (vary k) from fit-SAMPLE sensitivity (vary cap at fixed
    * k). At k = 1 both paths collapse to the identical single-exemplar
    * geometry, so that row's agreement is exactly 1.0 — the sweep's
    * built-in self-check (law in ClassifySpec). */
  def semDedupTrainedSweep(emb: DataFrame, idCol: String, vecCol: String,
      ks: Seq[Int], tau: Double,
      fitCaps: Seq[Long] = Seq(100000L)): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = for (k <- ks) yield {
      // the exemplar twin depends on k alone — compute it once per k and
      // pin it locally, not once per (k, fitCap)
      val ex = graft.functions.Frames.pinLocal(
        semDedupExemplar(emb, idCol, vecCol, k, tau)
          .select(col(idCol).as("id"), col("is_dup").as("de")))
      for (cap <- fitCaps) yield {
        val tr = semDedupTrained(emb, idCol, vecCol, k, tau, cap)
          .select(col(idCol).as("id"), col("is_dup").as("dt"))
        val r = ex.join(tr, Seq("id"))
          .agg(count(lit(1)), sum(col("de")), sum(col("dt")),
            avg(when(col("de") === col("dt"), 1.0).otherwise(0.0)))
          .head()
        (k, cap, r.getLong(0), r.getLong(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e6) / 1e6)
      }
    }
    rows.flatten.toDF("k", "fit_cap", "n", "n_dup_exemplar",
      "n_dup_trained", "agreement")
  }

  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val withBucket =
      if (nBits > 0) c.withColumn("bucket", lshBucket(col("v"), nBits))
      else c.withColumn("bucket", lit(0L))
    val l = withBucket.select(col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val r = withBucket.select(col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), graft.functions.ColumnFunctions.pround(col("cos"), 6).as("cos_sim"))
  }
}

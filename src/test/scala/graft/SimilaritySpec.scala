package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Hand-checkable vectors: 1 ∥ 0 (cos 1), 2 ⟂ 0, 3 anti-parallel, 4 diagonal.
  lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(2.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(1.0f, 1.0f)),
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val res = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 4)
      .orderBy($"rank").collect()
    assert(res.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 4L, 2L, 3L))
    assert(res.head.getAs[Double]("cos_sim") === 1.0)
    assert(res.last.getAs[Double]("cos_sim") === -1.0)
  }

  test("embeddingNearDups exhaustive finds parallel pair only at 0.99") {
    val pairs = Similarity.embeddingNearDups(vecs, "vec_id", "embedding", 0.99, nBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((0L, 1L)))
  }

  test("lshTopK neighbors are true neighbors with correct cosine") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"cos_sim".as("exact_cos"))
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10, nBits = 4)
    assert(approx.count() > 0)
    // every approx result's cosine must equal the exact cosine for that pair
    val joined = approx.join(exact, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter($"exact_cos".isNotNull && $"cos_sim" =!= $"exact_cos").count() === 0)
  }

  test("lshTopKPortable: same exact-cosine law as the native variant") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"cos_sim".as("exact_cos"))
    val approx = Similarity.lshTopKPortable(emb, queries, "vec_id", "embedding",
      k = 10, nBits = 4, dim = 64)
    assert(approx.count() > 0)
    val joined = approx.join(exact, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter($"exact_cos".isNotNull && $"cos_sim" =!= $"exact_cos").count() === 0)
    // determinism: the Rademacher hyperplanes are value-stable across calls
    val again = Similarity.lshTopKPortable(emb, queries, "vec_id", "embedding",
      k = 10, nBits = 4, dim = 64)
    assert(approx.collect().toSeq === again.collect().toSeq)
  }

  test("embeddingNearDupsBandedPortable: precision 1.0 vs exhaustive, finds the parallel pair") {
    val found = Similarity.embeddingNearDupsBandedPortable(vecs, "vec_id", "embedding",
      threshold = 0.99, tables = 16, bitsPerTable = 8, dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical-direction vectors land in every table's same bucket
    assert(found === Set((0L, 1L)))
  }

  test("embeddingDedupIncremental: batch cleans against persisted bucket state") {
    import org.apache.spark.sql.functions.col
    val dim = 8
    def vec(dir: Array[Double], scale: Double): Array[Float] =
      dir.map(x => (x * scale).toFloat)
    val a = Array(1.0, 2.0, -1.0, 0.5, 3.0, -2.0, 1.5, 0.25)
    val b = Array(-2.0, 1.0, 4.0, -0.5, 0.0, 1.0, -3.0, 2.0)
    val c = Array(0.5, -3.0, 1.0, 2.0, -1.0, 0.0, 2.5, -1.5)
    val old = Seq((0L, vec(a, 1.0)), (3L, vec(b, 1.0))).toDF("vec_id", "embedding")
    val dir2 = java.nio.file.Files.createTempDirectory("graft_buckets").toString + "/state"
    Similarity.bucketSignatures(old, "vec_id", "embedding",
      tables = 16, bitsPerTable = 8, dim = dim).write.parquet(dir2)
    val oldBuckets = spark.read.parquet(dir2)
    // metadata-survival pin: the scheme stamp must come back from parquet.
    // Absent metadata is tolerated as hand-built state, so the detection
    // assertions below would NOT catch a silent metadata loss on write.
    assert(oldBuckets.schema.find(_.name == "bucket").get.metadata
      .contains("graft.tables"), "scheme metadata lost in parquet round-trip")
    // 10 = parallel to old 0 (cos 1); 11 fresh; 12 = parallel to 11
    val batch = Seq(
      (10L, vec(a, 2.0)), (11L, vec(c, 1.0)), (12L, vec(c, 3.0)),
    ).toDF("vec_id", "embedding")
    val survivors = Similarity.embeddingDedupIncremental(batch, old, oldBuckets,
      "vec_id", "embedding", threshold = 0.99, tables = 16, bitsPerTable = 8, dim = dim)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors === Set(11L),
      "10 duplicates old 0; 12 duplicates new 11 (smaller id wins)")

    // law: incremental == batch re-dedup when old is clean and ids sort
    val batchResult = Similarity.dedupEmbeddings(old.unionByName(batch),
      "vec_id", "embedding", threshold = 0.99, tables = 16, bitsPerTable = 8, dim = dim)
      .select("vec_id").as[Long].collect().toSet
    assert(batchResult === Set(0L, 3L) ++ survivors)

    // mismatched bucketing scheme must fail fast, matching must proceed
    val ex = intercept[IllegalArgumentException] {
      Similarity.embeddingDedupIncremental(batch, old, oldBuckets,
        "vec_id", "embedding", threshold = 0.99, tables = 8, bitsPerTable = 8, dim = dim)
    }
    assert(ex.getMessage.contains("tables=16"))
  }

  test("persisted IVF index: build, append a batch, search finds both generations") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    // build on the even ids, append the odd ids with the FROZEN quantizer
    Similarity.ivfBuild(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      idx, nCells = 4)
    Similarity.ivfAppend(spark, emb.filter(col("vec_id") % 2 === 1), "vec_id",
      "embedding", idx)
    val queries = emb.filter(col("vec_id") < 5)
    val res = Similarity.ivfSearch(spark, queries, "vec_id", "embedding", idx,
      k = 10, nProbe = 4)
    val rows = res.collect()
    assert(rows.length === 5 * 10, "every query fills its top-10 from the full store")
    val neighbors = rows.map(_.getAs[Long]("neighbor_id")).toSet
    assert(neighbors.exists(_ % 2 == 0) && neighbors.exists(_ % 2 == 1),
      "results must draw from both the built and the appended generation")
    // cosines are exact (same verify math as the brute-force baseline)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim").as("exact_cos"))
    val joined = res.join(exact, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("exact_cos").isNotNull &&
      col("cos_sim") =!= col("exact_cos")).count() === 0)

    // partition pruning: with a low nProbe only the probed cells' files
    // are read — the layout property the cell-partitioned store exists for
    val narrow = Similarity.ivfSearch(spark, emb.filter(col("vec_id") === 0L),
      "vec_id", "embedding", idx, k = 3, nProbe = 1)
    narrow.collect() // execute so AQE finalizes
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
      }
    val cellScan = scans(narrow.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("cells")))
    assert(cellScan.nonEmpty, "no file scan over the cell store found")
    val scanned = cellScan
      .map(_.metrics.get("numPartitions").map(_.value).getOrElse(0L)).sum
    assert(scanned === 1, s"nProbe=1 must read exactly one cell partition, read $scanned")
  }

  test("ivfTopK: decent recall vs exact baseline, exact cosines") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id", $"cos_sim".as("exact_cos"))
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5, nCells = 8, nProbe = 4)
    // probing half the cells must recover a majority of the true top-5
    val hits = ivf.join(exact, Seq("query_id", "neighbor_id")).count()
    assert(hits >= 25, s"IVF recall too low: $hits/50")
    // and every reported cosine must be the true cosine
    val wrong = ivf.join(exact, Seq("query_id", "neighbor_id"))
      .filter($"cos_sim" =!= $"exact_cos").count()
    assert(wrong === 0)
  }

  test("ivfTopKPortable: exact cosines, recall comparable to the k-means quantizer") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id", $"cos_sim".as("exact_cos"))
    val ivf = Similarity.ivfTopKPortable(emb, queries, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 4)
    // random centroids partition less evenly than k-means, but probing
    // half the cells must still recover a real share of the true top-5
    val hits = ivf.join(exact, Seq("query_id", "neighbor_id")).count()
    assert(hits >= 20, s"portable IVF recall too low: $hits/50")
    val wrong = ivf.join(exact, Seq("query_id", "neighbor_id"))
      .filter($"cos_sim" =!= $"exact_cos").count()
    assert(wrong === 0)
    // determinism: same result under a different input partitioning
    val again = Similarity.ivfTopKPortable(emb.repartition(7), queries,
      "vec_id", "embedding", 5, nCells = 8, nProbe = 4)
      .collect().map(_.toString).sorted
    assert(again === ivf.collect().map(_.toString).sorted)
  }

  test("banded near-dups: precision 1.0 vs exhaustive, high-sim recall law") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val exhaustive = Similarity.embeddingNearDups(emb, "vec_id", "embedding", 0.4, nBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val banded = Similarity.embeddingNearDupsBanded(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision 1.0: every banded pair is a true pair with the true cosine
    banded.foreach { case (pair, cos) =>
      assert(exhaustive.get(pair).contains(cos), s"false positive or wrong cos: $pair")
    }
    // recall law: strongly-similar pairs (cos >= 0.8) must all be found
    val strong = exhaustive.filter(_._2 >= 0.8)
    val missedStrong = strong.keySet -- banded.keySet
    assert(missedStrong.isEmpty, s"missed high-sim pairs: $missedStrong")
  }

  test("banded near-dups find a planted duplicate pair") {
    import spark.implicits._
    // 64-dim: a planted near-identical pair among random-ish vectors
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (math.sin(seed * 31 + i * 7).toFloat))
    val base = (0 until 40).map(s => (s.toLong, vec(s)))
    val planted = (1000L, vec(7).map(x => x * 1.001f + 0.001f))
    val df = (base :+ planted).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupsBanded(df, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((7L, 1000L)), s"planted pair not found: ${pairs.toSeq}")
  }

  test("lsh bucket is deterministic") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
    val b1 = emb.select(graft.functions.VectorFunctions.lshBucket(
      graft.functions.VectorFunctions.asDouble($"embedding"), 8).as("b")).collect()
    val b2 = emb.select(graft.functions.VectorFunctions.lshBucket(
      graft.functions.VectorFunctions.asDouble($"embedding"), 8).as("b")).collect()
    assert(b1.map(_.getLong(0)).sameElements(b2.map(_.getLong(0))))
  }
}

package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Crafted corpus: 0/1 byte-identical; 2 near-identical to 0 (one word
  // changed); 3/4 unrelated.
  lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy cat again and again today"),
    (3L, "completely different content about spark catalyst optimizer rules"),
    (4L, "unrelated text mentioning minhash lsh banding and shingle sets"),
  ).toDF("doc_id", "text")

  test("exactDupGroups finds the byte-identical pair, keeper = min id") {
    val g = Dedup.exactDupGroups(corpus, "doc_id", "text")
    assert(g.count() === 4) // 5 docs, one collapsed pair
    val dup = g.filter($"dup_count" === 2).collect()
    assert(dup.length === 1 && dup.head.getAs[Long]("keeper_id") === 0L)
  }

  test("dropExactDups keeps one survivor per text") {
    val kept = Dedup.dropExactDups(corpus, "doc_id", "text")
    assert(kept.count() === 4)
    assert(kept.filter($"doc_id" === 1L).count() === 0) // 0 survives, 1 dropped
  }

  test("minHashLsh finds exact + near pairs and not unrelated ones") {
    val pairs = Dedup.minHashLsh(corpus, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L))) // identical -> jaccard 1.0
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 === 1.0)
    assert(keys.contains((0L, 2L)) && keys.contains((1L, 2L))) // near dup
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minHashLsh on real corpus finds the planted near-dups at sf0.001") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.5)
    assert(pairs.count() > 0)
    assert(pairs.agg(min($"jaccard")).head().getDouble(0) >= 0.5)
  }

  test("simHashDups: identical docs at distance 0, near dups within radius") {
    val pairs = Dedup.simHashDups(corpus, "doc_id", "text", maxDist = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number]("dist").intValue())).toMap
    assert(pairs((0L, 1L)) === 0)
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  /** Brute-force oracle for jaccardSelfJoin: all pairs, exact token-set
    * Jaccard rounded to 4, filtered at the threshold.
    */
  private def bruteJaccard(df: org.apache.spark.sql.DataFrame, t: Double) = {
    val toks = df.select($"doc_id", array_distinct(split($"text", "\\s+")).as("tok"))
    toks.select($"doc_id".as("id_a"), $"tok".as("tok_a"))
      .crossJoin(toks.select($"doc_id".as("id_b"), $"tok".as("tok_b")))
      .filter($"id_a" < $"id_b")
      .withColumn("jaccard", graft.functions.ColumnFunctions.pround(
        graft.expressions.TokenExpressions.jaccardSim($"tok_a", $"tok_b"), 4))
      .filter($"jaccard" >= t)
      .select($"id_a", $"id_b", $"jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("jaccardSelfJoin == brute force on the crafted corpus (several thresholds)") {
    // 0.5 with even-sized token sets exercises the integral t·|X| ceiling;
    // 0.9 the near-dup regime; 0.99 identical-only
    for (t <- Seq(0.5, 0.9, 0.99)) {
      val got = Dedup.jaccardSelfJoin(corpus, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got === bruteJaccard(corpus, t), s"threshold $t")
    }
  }

  test("jaccardSelfJoin == brute force on the real sf0.001 corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = Dedup.jaccardSelfJoin(docs, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === bruteJaccard(docs, 0.9))
  }

  test("dedupIncremental: new batch cleans against persisted band state") {
    // clean old corpus (ids 0,3,4 — the crafted corpus survivors)
    val old = corpus.filter($"doc_id".isin(0L, 3L, 4L))
    val oldBands = Dedup.bandSignatures(old, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16)
    // new batch: 10 = exact copy of 0; 11 = near-dup of 0 (one word);
    // 12 fresh; 13 = exact copy of 12 within the batch
    val fresh = "totally new subject matter concerning distributed prefix sums today ok"
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "the quick brown fox jumps over the lazy cat again and again today"),
      (12L, fresh), (13L, fresh)).toDF("doc_id", "text")
    val survivors = Dedup.dedupIncremental(batch, old, oldBands, "doc_id", "text",
      shingleN = 3, threshold = 0.5, k = 32, bands = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(12L),
      "10 exact-dups old 0, 11 near-dups old 0, 13 exact-dups new 12")

    // law: incremental == batch re-dedup when old is clean and ids sort
    val batchResult = Dedup.dedupCorpus(old.unionByName(batch), "doc_id", "text",
      shingleN = 3, threshold = 0.5, k = 32, bands = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(batchResult === Set(0L, 3L, 4L) ++ survivors)
  }

  test("dedupIncremental rejects band state built under a different scheme") {
    val old = corpus.filter($"doc_id".isin(0L, 3L, 4L))
    // state built with 8 bands, parquet round-trip (metadata must survive)
    val dir = java.nio.file.Files.createTempDirectory("graft_bands").toString + "/bands"
    Dedup.bandSignatures(old, "doc_id", "text", shingleN = 3, k = 32, bands = 8)
      .write.parquet(dir)
    val oldBands = spark.read.parquet(dir)
    val batch = Seq((10L, "anything at all here")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupIncremental(batch, old, oldBands, "doc_id", "text",
        shingleN = 3, threshold = 0.5, k = 32, bands = 16)
    }
    assert(ex.getMessage.contains("bands=8"))
    // matching parameters pass the gate
    Dedup.dedupIncremental(batch, old, oldBands, "doc_id", "text",
      shingleN = 3, threshold = 0.5, k = 32, bands = 8).count()
  }

  test("simHashDupsPortable: same planted-dup law as the native variant") {
    val pairs = Dedup.simHashDupsPortable(corpus, "doc_id", "text", maxDist = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number]("dist").intValue())).toMap
    assert(pairs((0L, 1L)) === 0, "identical docs have identical fingerprints")
    assert(pairs.contains((0L, 2L)), "one changed word stays within radius")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minHashLshPortable: same planted-dup law as the native variant") {
    val pairs = Dedup.minHashLshPortable(corpus, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 === 1.0)
    assert(keys.contains((0L, 2L)) && keys.contains((1L, 2L)))
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minHashLshPortable on real corpus: verified pairs only, at sf0.001") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val pairs = Dedup.minHashLshPortable(docs, "doc_id", "text", threshold = 0.5)
    assert(pairs.count() > 0)
    assert(pairs.agg(min($"jaccard")).head().getDouble(0) >= 0.5)
  }

  test("dedupCorpusPortable keeps exactly the crafted-corpus survivors") {
    val survivors = Dedup.dedupCorpusPortable(corpus, "doc_id", "text",
      shingleN = 3, threshold = 0.5, k = 32, bands = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(0L, 3L, 4L),
      "1 exact-dups 0; 2 near-dups 0; 3 and 4 unrelated survive")
  }

  test("dedupIncremental happy path: parquet round-tripped matching state still catches the planted dup") {
    // Twin of the MISMATCH-rejection test: a matching-scheme state read
    // back from parquet must look metadata-complete AND still detect the
    // cross-batch duplicate — a metadata regression that made valid state
    // look parameterless would otherwise silently disable incremental dedup.
    val old = corpus.filter($"doc_id".isin(0L, 3L, 4L))
    val dir = java.nio.file.Files.createTempDirectory("graft_bands_ok").toString + "/bands"
    Dedup.bandSignatures(old, "doc_id", "text", shingleN = 3, k = 32, bands = 16)
      .write.parquet(dir)
    val oldBands = spark.read.parquet(dir)
    // metadata-survival pin: absent metadata is tolerated as hand-built
    // state, so detection alone would not catch a silent loss on write
    assert(oldBands.schema.find(_.name == "band_hash").get.metadata
      .contains("graft.bands"), "scheme metadata lost in parquet round-trip")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "brand new material on adaptive query execution and skew handling"),
    ).toDF("doc_id", "text")
    val survivors = Dedup.dedupIncremental(batch, old, oldBands, "doc_id", "text",
      shingleN = 3, threshold = 0.5, k = 32, bands = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(11L), "10 duplicates old doc 0 and must be dropped")
  }

  test("cluster dedup collapses a hub component the pairwise rule keeps") {
    // Hub pattern: doc 3 = doc 1's tokens ++ doc 2's tokens, so 3 pairs
    // with BOTH 1 and 2 (J ≈ 18/38 ≈ 0.47) while 1 and 2 share nothing.
    // Pairwise rule: only 3 is the larger id of a pair -> survivors {1,2}.
    // Cluster rule: {1,2,3} is ONE component -> survivor {1} alone.
    val a = (0 until 20).map(i => s"alpha$i").mkString(" ")
    val b = (0 until 20).map(i => s"beta$i").mkString(" ")
    val hub = Seq((1L, a), (2L, b), (3L, s"$a $b")).toDF("doc_id", "text")
    val pairwise = Dedup.dedupCorpusPortable(hub, "doc_id", "text", threshold = 0.45)
      .select($"doc_id").as[Long].collect().toSet
    val clustered = Dedup.dedupCorpusClustered(hub, "doc_id", "text", threshold = 0.45)
      .select($"doc_id").as[Long].collect().toSet
    assert(pairwise === Set(1L, 2L), "pairwise keeps both local minima")
    assert(clustered === Set(1L), "cluster policy keeps one survivor per component")
    // the cluster map itself: all three docs in the min-labelled component
    val cm = Dedup.dupClusterMap(hub, "doc_id", "text", threshold = 0.45)
      .as[(Long, Long)].collect().toMap
    assert(cm === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clustered survivors are a subset of pairwise survivors (real corpus)") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val pairwise = Dedup.dedupCorpusPortable(docs, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    val clustered = Dedup.dedupCorpusClustered(docs, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(clustered.subsetOf(pairwise))
    assert(clustered.nonEmpty)
  }

  test("jaccardSelfJoin edge corpora: all-identical, all-unique, singleton") {
    // all-identical token sets: every pair emitted as J = 1.0 through the
    // set-collapse fast path, none verified
    val same = (1L to 20L).map(i => (i, "alpha beta gamma")).toDF("doc_id", "text")
    val allPairs = Dedup.jaccardSelfJoin(same, "doc_id", "text", 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(allPairs.length === 20 * 19 / 2)
    assert(allPairs.forall(_._2 === 1.0))
    assert(allPairs.forall(p => p._1._1 < p._1._2))

    // pairwise-disjoint token sets: nothing qualifies
    val uniq = (1L to 10L).map(i => (i, s"tok${i}a tok${i}b tok${i}c")).toDF("doc_id", "text")
    assert(Dedup.jaccardSelfJoin(uniq, "doc_id", "text", 0.5).count() === 0)

    // a single doc has no pairs; doc order within text must not matter
    val one = Seq((1L, "x y z")).toDF("doc_id", "text")
    assert(Dedup.jaccardSelfJoin(one, "doc_id", "text", 0.1).count() === 0)
    val perm = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val p = Dedup.jaccardSelfJoin(perm, "doc_id", "text", 0.9).collect()
    assert(p.length === 1 && p.head.getDouble(2) === 1.0,
      "identical sets in different array order must collapse to one group")
  }

  test("ngramJaccardPairs verifies candidates exactly") {
    val cand = Seq((0L, 1L), (0L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", cand, n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) === 1.0)
    assert(j((0L, 3L)) === 0.0)
  }

  test("duplicatedSpans: maximal >=N-token duplicated runs, self-repeats " +
      "count, unique text reports nothing") {
    // a1..a9 is shared verbatim by docs 10/11 (length 9 = two overlapping
    // 8-windows -> ONE maximal span 0..8); doc 12 repeats its own 8-token
    // run b1..b8 at positions 0 and 9 with a breaker token between (gap 9
    // > windowN -> TWO spans); doc 13 is unique
    val docs = Seq(
      (10L, "a1 a2 a3 a4 a5 a6 a7 a8 a9"),
      (11L, "a1 a2 a3 a4 a5 a6 a7 a8 a9"),
      (12L, "b1 b2 b3 b4 b5 b6 b7 b8 X b1 b2 b3 b4 b5 b6 b7 b8"),
      (13L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", windowN = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans === Set(
      (10L, 0L, 8L, 2L), // two windows (pos 0, 1) merged into one span
      (11L, 0L, 8L, 2L),
      (12L, 0L, 7L, 1L), // self-repeat: both copies reported...
      (12L, 9L, 16L, 1L), // ...as separate spans (gap > windowN)
    ))
  }

  test("paragraphDedup: keep-first across docs, order preserved, in-doc " +
      "repeats untouched, all-duplicate docs kept empty") {
    val docs = Seq(
      (5L, "shared one\nalpha\nshared two"),
      (2L, "beta\nshared one\nbeta"),   // keeper of "shared one" + in-doc repeat
      (7L, "shared two\ngamma"),
      (9L, "shared one\nshared two"),    // loses everything -> empty, kept
      (3L, "delta\n\nepsilon"),          // blank line: STRUCTURE, never deduped
      (4L, "zeta\n\neta"),               // second doc with a blank line
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      2L -> "beta\nshared one\nbeta", // min id keeps it; its repeat survives
      5L -> "alpha\nshared two",       // "shared one" lost to doc 2; first occurrence of "shared two" (min id 5 < 7)
      7L -> "gamma",
      9L -> "",                        // kept, not dropped
      // empty segments are exempt from keeper election: BOTH docs keep
      // their blank line (deduping "" would strip paragraph separation
      // from every doc but one corpus-wide)
      3L -> "delta\n\nepsilon",
      4L -> "zeta\n\neta"))
  }
}

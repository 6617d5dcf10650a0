package graft

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale properties the queries rely
  * on (broadcast choices, pushdown, shuffle counts, codegen) must survive
  * refactors — a silent fallback to a shuffled join or an interpreted
  * stage is a 100×-scale regression even when results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf0001)
    df.queryExecution.executedPlan.toString()
  }

  private def countOccurrences(s: String, token: String): Int =
    s.sliding(token.length).count(_ == token)

  test("q3 filter reaches the parquet scan as PushedFilters") {
    val p = plan("q3_filter_conjunction")
    assert(p.contains("PushedFilters: ["), p)
    // at least one concrete pushed predicate, not an empty list
    assert(!p.contains("PushedFilters: []"), p)
  }

  test("q13 joins dims by broadcast, never shuffled-hash/sort-merge") {
    val p = plan("q13_district_monthly")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
  }

  test("q7 dim join broadcasts") {
    val p = plan("q7_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q48 ANN broadcasts the query set; corpus is never shuffled") {
    val p = plan("q48_ann_brute_force")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q1 aggregation is whole-stage codegen'd") {
    // AQE's pre-execution plan string carries no codegen markers; codegen
    // explain mode compiles the stages and reports the subtree count
    val df = SparkEntry.queries("q1_agg")(spark, TestSpark.sf0001)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), p)
  }

  test("q21 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q21_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q41 per-doc scoring is shuffle-free (narrow projection)") {
    val p = plan("q41_token_count")
    assert(!p.contains("Exchange"), p)
  }

  test("q71 percentile plan has exactly one aggregate pair (one digest)") {
    val p = plan("q71_percentiles")
    // partial+final ObjectHashAggregate = 2 mentions; 4 separate digests
    // would plan 4 pairs
    val aggs = countOccurrences(p, "ObjectHashAggregate")
    assert(aggs <= 2, s"expected <= 2 ObjectHashAggregate nodes, got $aggs\n$p")
  }

  test("q44 prefix-filter join plans no cartesian/nested-loop product") {
    // the scale property the prefix filter buys: candidates come from an
    // equi-join on exploded prefix tokens — a cross join here is O(n²)
    val p = plan("q44_token_jaccard")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("q56 sampled-pair edit distance plans no cartesian/nested-loop product") {
    // the two 1/50 samples pair through a derived equi-join key
    // (doc_id div 50) — a crossJoin of the samples is still O(n²) at scale
    val p = plan("q56_edit_distance")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("q49 banded LSH self-join plans no cartesian/nested-loop product") {
    val p = plan("q49_embedding_neardup")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("q44/q49 pair-candidate joins shuffle no array columns") {
    // candidate generation must be narrow: (key, id, size) triples only —
    // the arrays may appear solely in the per-id verify joins
    for (name <- Seq("q44_token_jaccard", "q49_embedding_neardup")) {
      val df = SparkEntry.queries(name)(spark, TestSpark.sf0001)
      val joins = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      val narrow = joins.filter(j =>
        (j.left.output ++ j.right.output).forall(a =>
          !a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
      assert(narrow.nonEmpty, s"$name: no array-free candidate join found")
    }
  }

  test("q19 rank filter plans WindowGroupLimit (partial top-k before the shuffle)") {
    // rank<=k predicates must push a per-partition group limit below the
    // window exchange — without it every group's full row set shuffles
    val p = plan("q19_window_topn")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("runtime bloom filter injects into the probe side of a selective shuffled join") {
    // at cluster scale Spark plants a bloom filter built from the filtered
    // dim side into the fact scan (runtime row-level filtering); the size
    // thresholds are tuned for real clusters, so pin them down for the demo
    val conf = spark.sessionState.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
    ).map(k => k -> conf.getConfString(k, null)).toMap
    try {
      conf.setConfString("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.setConfString("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.setConfString("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.setConfString("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, TestSpark.sf0001)
      val ord = Tables.orders(spark, TestSpark.sf0001)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"no runtime bloom filter in:\n$p")
    } finally saved.foreach { case (k, v) =>
      if (v == null) conf.unsetConf(k) else conf.setConfString(k, v)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val conf = spark.sessionState.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
    )
    val saved = keys.map(k => k -> conf.getConfString(k, null)).toMap
    try {
      // local-size thresholds so a hot key qualifies as skewed
      conf.setConfString("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.setConfString("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.setConfString("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.setConfString("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.setConfString("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 40k rows on one hot key vs a uniform right side
      val left = spark.range(40000).select(lit(7L).as("k"), $"id".as("payload"))
        .union(spark.range(1000).select(($"id" % 100).as("k"), $"id".as("payload")))
      val right = spark.range(100).select($"id".as("k"), ($"id" * 2).as("r"))
      val joined = left.join(right, "k")
      // collect() drives THIS queryExecution (a write would plan a fresh
      // command tree and leave this adaptive plan unexecuted)
      assert(joined.collect().length === 41000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(4000))
    } finally saved.foreach { case (k, v) =>
      if (v == null) conf.unsetConf(k) else conf.setConfString(k, v)
    }
  }

  test("q99 split assignment is shuffle-free (narrow projection)") {
    // content-keyed split assignment is pure per-row hashing — any
    // Exchange here would mean the assignment grew a corpus-wide stage
    val p = plan("q99_leakage_split")
    assert(!p.contains("Exchange"), p)
  }

  test("q98 LM scoring joins count tables by key, never a real product") {
    // the only nested-loop join allowed is the 1-row vocab scalar
    // (broadcast of a single aggregate row — the mixingRates pattern);
    // bigram-to-count joins must be hash equi-joins
    val p = plan("q98_bigram_lm")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p.take(4000))
  }

  test("q46/q50 candidate joins plan no cartesian/nested-loop product") {
    // SimHash chunk blocking and hyperplane bucketing must pair candidates
    // through equi-joins on derived keys — at scale a cross join here is
    // the difference between per-bucket work and O(n²)
    for (name <- Seq("q46_simhash", "q50_ann_lsh")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(4000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: ${p.take(4000)}")
    }
  }

  test("q101 fingerprint edges pair docs through hash equi-joins, never a product") {
    // star-edge construction must join fingerprints to their group hub by
    // key — a product here is O(n²) at corpus scale
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val p = graft.operators.Components.fingerprintEdges(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("q102/q106 windows stay partitioned by stratum — no single-partition sort") {
    // the prefix sum / shard position must run one window PER stratum in
    // parallel; Exchange SinglePartition would serialize the corpus
    for (name <- Seq("q102_token_budget", "q106_shuffle_shard")) {
      val p = plan(name)
      assert(!p.contains("SinglePartition"), s"$name: ${p.take(4000)}")
      assert(p.contains("Window"), s"$name: ${p.take(4000)}")
    }
  }

  test("q105 per-doc top-k plans WindowGroupLimit; joins are equi-joins") {
    val p = plan("q105_tfidf")
    assert(p.contains("WindowGroupLimit"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("q103 posting head is rank-bounded before any collect — no unbounded buffer") {
    // the head must be fed by a WindowGroupLimit (per-group state capped at
    // postingCap on both sides of its shuffle); a collect_set over raw ids
    // is the stopword-OOM shape at 100 TB
    val p = plan("q103_inverted_index")
    assert(p.contains("WindowGroupLimit"), p.take(4000))
    assert(!p.contains("collect_set"), p.take(4000))
  }

  test("q104 hot-passage join is an equi-join on the passage hash") {
    val p = plan("q104_passage_dedup")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("q111 portable IVF broadcasts the probe side; corpus cells never re-shuffle") {
    val p = plan("q111_ann_ivf_portable")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("q113 BM25 broadcasts query terms; candidates pair by equi-join, top-k is grouped") {
    // the corpus tf table must meet the (tiny) query-term set through a
    // broadcast hash join — a shuffled or product join here re-keys the
    // whole corpus per query at scale; per-query top-k is a WindowGroupLimit
    val p = plan("q113_bm25")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("WindowGroupLimit"), p.take(4000))
  }

  test("q119/q120 store serving: rank-bounded heads, broadcast scoring, no products") {
    val p119 = plan("q119_index_lifecycle")
    assert(p119.contains("WindowGroupLimit"), p119.take(4000))
    assert(!p119.contains("collect_set"), p119.take(4000))
    val p120 = plan("q120_bm25_served")
    assert(p120.contains("BroadcastHashJoin"), p120.take(4000))
    assert(p120.contains("WindowGroupLimit"), p120.take(4000))
    assert(!p120.contains("CartesianProduct"), p120.take(4000))
  }

  test("q125/q129/q130 join small derived sides by broadcast — no products") {
    for (name <- Seq("q125_oov_rate", "q129_contamination_span", "q130_quality_gate")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: ${p.take(4000)}")
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(4000)}")
    }
  }

  test("q126 rank functions stay partitioned by source — no single-partition sort") {
    val p = plan("q126_rank_functions")
    assert(!p.contains("SinglePartition"), p.take(4000))
    assert(p.contains("Window"), p.take(4000))
  }

  test("q121 hybrid rerank: candidate joins are hash joins, embedding fetch never products") {
    val p = plan("q121_hybrid_rerank")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("WindowGroupLimit"), p.take(4000))
  }

  test("q131 served hybrid rerank: hash joins only, grouped top-k, no products") {
    val p = plan("q131_hybrid_served")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("WindowGroupLimit"), p.take(4000))
  }

  test("q134 served ANN: probe side broadcasts, grouped top-k, no products") {
    val p = plan("q134_ann_served")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("WindowGroupLimit"), p.take(4000))
  }

  test("q142 recall sweep: one scored pass, broadcast probe sides, grouped top-k") {
    val p = plan("q142_ann_recall")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("WindowGroupLimit"), p.take(4000))
    // ONE scoring pass serves every swept nProbe setting: five settings
    // but the plan holds a handful of scans (cells once + the brute-force
    // sides), never a per-setting serve plan
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") <= 6,
      "the sweep must not multiply cell-store scans per setting\n" + p.take(4000))
  }

  test("q135 served LM scoring joins count tables by key, never a real product") {
    // same contract as q98: the only nested-loop join allowed is the
    // 1-row vocab scalar (now served from the vtot stats surface)
    val p = plan("q135_lm_served")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p.take(4000))
  }

  test("q122 curriculum: the corpus-sized window is partitioned by pid, never global") {
    val df = SparkEntry.queries("q122_curriculum")(spark, TestSpark.sf0001)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("windowspecdefinition(pid"), opt.take(4000))
  }

  test("q124 containment pairs sources through a gram equi-join — no products") {
    // (q123's plan truncates at its per-round checkpoints; its join shape
    // is law-tested in LinkAnalysisSpec instead)
    val p = plan("q124_containment")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("q114/q115 windows stay partitioned by stratum/entity — no single-partition sort") {
    for (name <- Seq("q114_zipf_slope", "q115_scd2")) {
      val p = plan(name)
      assert(!p.contains("SinglePartition"), s"$name: ${p.take(4000)}")
      assert(p.contains("Window"), s"$name: ${p.take(4000)}")
    }
  }

  test("q116 novelty gram overlap is an equi-join on the gram, never a product") {
    val p = plan("q116_ngram_novelty")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("q154 NB scoring plans no cartesian product; per-label constants " +
      "fold as literals (round 16: no stats join, no rank window)") {
    // the fused α=1 decomposition's plan contract: the ONLY join left is
    // the token-keyed hash equi-join against the per-token contribution
    // table; the |labels|-row stats frame is collected (bounded, model
    // metadata) and folded into literal arrays/maps, so the plan carries
    // NO nested-loop/cartesian join at all — and the argmax is a hash
    // aggregation (min over (−score, label) structs), not a rank Window
    val p = plan("q154_nb_classify")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(4000))
  }

  test("q155 semDedup assignment is a per-row literal-centroid argmax — " +
      "no Window, no corpus-sized exchange") {
    val p = plan("q155_semdedup")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
    // the r11 advisory finding: the old impl ranked the corpus×k cross
    // join with row_number over Window.partitionBy(id) — a corpus-sized
    // hash Exchange carrying the vectors. The rewrite computes the argmax
    // inline (array-of-structs over broadcast-literal centroids), so the
    // plan must carry NO Window at all and exactly one shuffle — the
    // k-group exemplar aggregate (map-side combined)
    assert(!p.contains("Window"), p.take(4000))
    assert(countOccurrences(p, "Exchange hashpartitioning") <= 1, p.take(4000))
    // exemplar vectors come back via broadcast joins, never shuffled
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
  }

  test("q45 LSH band join is array-free (only ids and hashes shuffle)") {
    // the bucket self-join must see narrow (band, band_hash, id) inputs;
    // the shingle arrays may only appear in the later verify joins
    val df = SparkEntry.queries("q45_minhash_lsh")(spark, TestSpark.sf0001)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    val bandJoin = joins.filter(j =>
      (j.left.output ++ j.right.output).forall(a =>
        !a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
    assert(bandJoin.nonEmpty, "expected the band-bucket join to carry no array columns")
  }

  test("q162 DSIR scoring probes a BROADCAST weight table; totals cross " +
      "in as one-row broadcast loops, never a CartesianProduct") {
    // the per-doc ngram stream hash-joins the nBuckets-row log-ratio
    // table as the build side (bounded by construction); the two
    // one-row totals frames cross in as broadcast nested loops
    val p = plan("q162_dsir_weights")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
  }

  test("q165 store-served DSIR scoring keeps the q162 discipline: " +
      "broadcast weight table, no cartesian, no sort-merge") {
    // the persisted fit folds to ≤ 2·nBuckets rows and broadcasts; the
    // scored batch is the only corpus-shaped side and it never shuffles
    // except for its own doc-keyed aggregation
    val p = plan("q165_dsir_store_score")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
  }

  test("q169 perplexity bucketing: per-source cuts broadcast back, no " +
      "window, no cartesian over data") {
    // the LM scoring is bigram-keyed aggregation + joins; the tercile
    // cuts come back as a sources-sized broadcast, and the bucket CASE
    // is per-row — a global-order Window here would serialize the corpus
    val p = plan("q169_perplexity_buckets")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
  }

  test("q167 quality gate: the verdict stage broadcasts the 1-row cuts " +
      "frame over the checkpointed signals; no cartesian, no window") {
    // the signal joins (vocab/boiler-set/NB broadcasts) materialize
    // INSIDE the eager localCheckpoint, so the visible plan is the
    // verdict stage: checkpoint scan × broadcast 1-row cuts — which must
    // be a broadcast nested loop, never a CartesianProduct, with no
    // global-order window in the cascade or calibration
    val p = plan("q167_quality_gate_composite")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
  }

  test("q171 URL canonicalization is a shuffle-free projection") {
    // pure Column arithmetic per row: any Exchange here means a regression
    // materialized a shuffle into what must stay a map-only stage
    val p = plan("q171_url_canon")
    assert(!p.contains("Exchange"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("q172 URL dedup pays exactly one shuffle: the resource-key window") {
    // count + row_number share the partitioning, so one hash exchange
    // serves both Window operators; the output orderBy adds range
    // partitioning but no second hash of the corpus
    val p = plan("q172_url_dedup")
    assert(countOccurrences(p, "Exchange hashpartitioning") === 1, p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
  }

  test("q174 bloom decontamination: filter words ride the projection; the " +
      "verify join broadcasts at bench scale; nothing cartesian") {
    val p = plan("q174_bloom_decontaminate")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
  }

  test("q176 WARC CDX: one build exchange (file grouping); the walk and " +
      "SURT projection add no shuffle") {
    val p = plan("q176_warc_cdx")
    assert(countOccurrences(p, "Exchange hashpartitioning") === 1, p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("q177 HTML extraction: one build exchange feeds two map-only " +
      "stages (render, extract) — no joins, no windows") {
    val p = plan("q177_html_extract")
    assert(!p.contains("Join"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("q182 robots gate is map-only: no exchange, join, or window") {
    val p = plan("q182_robots_gate")
    assert(!p.contains("Exchange"), p.take(4000))
    assert(!p.contains("Join"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
  }

  test("q185 anchor index: exactly the exact-multi-distinct two-phase — " +
      "two target-prefixed exchanges of PARTIALLY-AGGREGATED rows, no join") {
    // two countDistincts rewrite to Expand(gid) + two aggregations; both
    // exchanges carry post-partial-agg rows (targets-sized ×3, never raw
    // links), and extraction itself adds no exchange
    val p = plan("q185_anchor_index")
    assert(countOccurrences(p, "Exchange hashpartitioning") === 2, p.take(4000))
    assert(p.contains("Expand"), p.take(4000))
    assert(!p.contains("Join"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("q186 frontier schedule: one host-keyed exchange serves the " +
      "politeness window — no joins, nothing cartesian") {
    val p = plan("q186_frontier_schedule")
    assert(countOccurrences(p, "Exchange hashpartitioning") === 1, p.take(4000))
    assert(p.contains("Window"), p.take(4000))
    assert(!p.contains("Join"), p.take(4000))
  }

  test("q187 recrawl policy: the URL-keyed exchange is paid once — the " +
      "lag window's partitioning is reused by the aggregation") {
    val p = plan("q187_recrawl_policy")
    assert(countOccurrences(p, "Exchange hashpartitioning") === 1, p.take(4000))
    assert(p.contains("Window"), p.take(4000))
    assert(!p.contains("Join"), p.take(4000))
  }

  test("q190 frontier capstone: the compiled robots gate is pure codegen " +
      "(no UDF), nothing cartesian, one politeness window") {
    val p = plan("q190_frontier_capstone")
    assert(!p.contains("UDF"), p.take(4000))
    assert(!p.contains("BatchEvalPython"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(countOccurrences(p, "Window") >= 1, p.take(4000))
  }

  test("q193 per-host delays broadcast onto the frontier: the corpus " +
      "shuffles once (host window); the delay dim joins by broadcast") {
    val p = plan("q193_crawl_delay_schedule")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
    assert(!p.contains("ShuffledHashJoin"), p.take(4000))
    assert(p.contains("Window"), p.take(4000))
  }

  test("q194 crawl budget: no GLOBAL-order window over the hosts frame — " +
      "host-frame windows are pid-partitioned; the only unpartitioned " +
      "window runs over the partition-count subtotal frame") {
    // the two-pass prefix sum's shape: every Window over hosts-sized data
    // carries a partition spec; the offsets join broadcasts
    val p = plan("q194_crawl_budget")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
    // exactly one single-partition window (the ≤ nPart-row offsets frame)
    assert(countOccurrences(p, "Exchange SinglePartition") === 1, p.take(6000))
  }

  test("q199 gzip WARC: one build exchange; the member walk adds no " +
      "shuffle, no window") {
    val p = plan("q199_warc_gzip_roundtrip")
    assert(countOccurrences(p, "Exchange hashpartitioning") === 1, p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("q200 HTTP body decode: one build exchange; dechunk+inflate ride " +
      "the map-only walk") {
    val p = plan("q200_http_body_decode")
    assert(countOccurrences(p, "Exchange hashpartitioning") === 1, p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
    assert(!p.contains("Join"), p.take(4000))
  }

  test("q201 PSL fold is a pure codegen'd projection: no exchange, no " +
      "join, no UDF — the rule set compiles into the plan") {
    val p = plan("q201_psl_domains")
    assert(!p.contains("Exchange"), p.take(4000))
    assert(!p.contains("Join"), p.take(4000))
    assert(!p.contains("UDF"), p.take(4000))
    assert(!p.contains("BatchEvalPython"), p.take(4000))
  }

  test("q203 PSL dim path: candidate suffixes join the rules dim by " +
      "BROADCAST; nothing cartesian, nothing sort-merge") {
    val p = plan("q203_psl_domains_dim")
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
  }

  test("q202 lang-id NB: the q154 plan contract under char-gram features " +
      "— label constants literal, gram join hash, no window, nothing " +
      "cartesian") {
    val p = plan("q202_lang_id")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    assert(!p.contains("Window"), p.take(4000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(4000))
  }

  test("q206 image near-dup: candidates meet in the chunk-bucket " +
      "equi-join — only 8-byte fingerprints shuffle, nothing cartesian, " +
      "no pixel planes past the codec stage") {
    val p = plan("q206_image_neardup")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoop"), p.take(4000))
    // pixel bytes stay inside the codec stage: no exchange row carries
    // the payload column
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(!_.contains("payload")),
      "pixel bytes must not cross an exchange: " +
        exchanges.mkString("\n"))
  }

  test("q209 audio near-dup: the same chunk-bucket equi-join shape — " +
      "nothing cartesian, no PCM bytes past the codec stage") {
    val p = plan("q209_audio_neardup")
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoop"), p.take(4000))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(!_.contains("payload")),
      "PCM bytes must not cross an exchange: " +
        exchanges.mkString("\n"))
  }
}

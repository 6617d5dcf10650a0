package graft

import graft.tools.ScaleProbe
import org.scalatest.funsuite.AnyFunSuite

/** Asserts the scaling claim instead of trusting README prose: over
  * vocabulary-disjoint shard corpora, 16× more data must cost well under
  * 16× wall time for every probed corpus operator. The bound is generous
  * (linear growth would hit ~16 minus fixed overhead; quadratic blow-ups
  * land at hundreds) so ambient machine load can't flake the test while a
  * real plan regression — a cross join, a lost prefix filter, a
  * single-partition stage — still trips it.
  */
class ScaleProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("corpus operators scale sub-linearly from 2x to 32x shards") {
    val base = Tables.documents(spark, TestSpark.sf0001)
    val baseEmb = Tables.embeddings(spark, TestSpark.sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_scaleprobe").toString
    // min-of-3 timings: one noisy iteration (GC pause, ambient load after
    // 40 earlier suites in this JVM) must not masquerade as a plan
    // regression — the law is about plan SHAPE, measured through wall time
    val probes = ScaleProbe.run(spark, base, baseEmb, Seq(2, 32), tmp, iters = 3)
    val byOp = probes.groupBy(_.op)
    assert(byOp.size === 36, "every probed op must report both scales")
    // bm25 ranks a FIXED query set (output queries×k by design); the
    // store-serving probes run fixed queries / fixed-size batches against
    // a GROWING store — their output and, per the store sizing contract,
    // their cost must stay batch-shaped
    val fixedOutput = Set("bm25", "bm25_from_index", "index_append",
      "index_append_postc", "scd2_apply", "ann_search", "lm_score",
      "lm_append", "lm_append_postc", "cc_apply", "cc_apply_postc",
      "cc_apply_5k", "span_probe", "span_append", "span_append_postc",
      "span_compact", "dsir_score")
    for ((op, ps) <- byOp) {
      val lo = ps.minBy(_.k)
      val hi = ps.maxBy(_.k)
      if (!fixedOutput(op))
        assert(hi.rows > lo.rows, s"$op: scaled corpus must produce more rows")
      // floor the denominator: near-instant ops divide scheduling noise
      val ratio = hi.sec / math.max(lo.sec, 0.2)
      assert(ratio < 16.0,
        f"$op: sec(32x)=${hi.sec}%.2f / sec(2x)=${lo.sec}%.2f = $ratio%.1f — not sub-linear")
    }
  }
}

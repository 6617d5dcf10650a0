package graft

import graft.operators.LinkAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for power-iteration PageRank: total mass stays 1 every
  * configuration, an isolated graph ranks uniformly, a star hub
  * out-ranks its spokes, and a local reference implementation agrees
  * exactly on a small graph.
  */
class LinkAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(vs: Seq[Long], es: Seq[(Long, Long)], iters: Int) =
    LinkAnalysis.pageRank(vs.toDF("id"), es.toDF("src", "dst"), iters)
      .as[(Long, Double)].collect().toMap

  test("rank mass sums to ~1 and an edgeless graph ranks uniformly") {
    val uniform = ranks(Seq(1L, 2L, 3L, 4L), Seq.empty, iters = 3)
    assert(uniform.values.forall(r => math.abs(r - 0.25) < 1e-6))
    // output is rounded to 6 decimals, so the mass check tolerates the
    // accumulated per-vertex rounding (≤ 5e-7 each)
    val star = ranks(0L to 9L, (1L to 9L).map(i => (i, 0L)), iters = 5)
    assert(math.abs(star.values.sum - 1.0) < 1e-5)
    assert(star(0L) > star(1L) * 3, "hub must dominate spokes")
    assert((1L to 9L).map(star).distinct.size === 1, "spokes rank equally")
  }

  test("matches a local reference implementation on a small graph") {
    val vs = 0L to 5L
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 2L), (4L, 2L))
    val got = ranks(vs, es, iters = 4)
    // local dense replay of the same recurrence
    val n = vs.size
    val out = es.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 1 to 4) {
      val dm = vs.filter(v => !out.contains(v)).map(v => r(v.toInt)).sum
      val next = Array.tabulate(n) { v =>
        val contrib = es.filter(_._2 == v)
          .map { case (u, _) => r(u.toInt) / out(u).size }.sum
        (1.0 - 0.85) / n + 0.85 * (contrib + dm / n)
      }
      r = next
    }
    for (v <- vs) // got is rounded to 6 decimals
      assert(math.abs(got(v) - r(v.toInt)) < 6e-7, s"vertex $v: ${got(v)} vs ${r(v.toInt)}")
  }
}

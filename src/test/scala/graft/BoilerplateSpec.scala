package graft

import graft.operators.Boilerplate
import org.scalatest.funsuite.AnyFunSuite

/** Laws for source-level boilerplate removal: lines at/above the
  * frequency threshold are stripped for THEIR source only, below-threshold
  * and unique lines survive in original order, and an all-boilerplate
  * document comes back empty rather than dropped.
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // srcA: "menu" in 3/4 docs (0.75 ≥ 0.5 → boilerplate), "promo" in 1/4
  // (survives); srcB has its own chrome — thresholds are PER SOURCE
  // (srcB's "menu" is 3/3 there, its per-doc lines 1/3 < 0.5 survive)
  private lazy val docs = Seq(
    (1L, "srcA", "menu\nalpha one\nfooter"),
    (2L, "srcA", "menu\npromo\nbeta two\nfooter"),
    (3L, "srcA", "menu\ngamma three\nfooter"),
    (4L, "srcA", "delta four\nfooter"),
    (5L, "srcB", "menu\nunique b"),
    (6L, "srcB", "menu\nother b"),
    (7L, "srcB", "menu\nthird b"),
  ).toDF("doc_id", "source", "text")

  private def cleaned: Map[Long, String] =
    Boilerplate.stripBoilerplate(docs, "doc_id", "text", "source",
      minFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("at-threshold lines strip, sub-threshold and unique lines survive " +
      "in order") {
    val c = cleaned
    assert(c(1L) === "alpha one")
    assert(c(2L) === "promo\nbeta two") // order preserved, promo kept
    assert(c(3L) === "gamma three")
    assert(c(4L) === "delta four") // footer (4/4) stripped, menu absent
  }

  test("thresholds are per source; an all-boilerplate doc comes back " +
      "empty, not dropped") {
    val c = cleaned
    assert(c(5L) === "unique b") // srcB's menu is 3/3 there → stripped
    assert(c(6L) === "other b")
    assert(c.size === 7)
    val allBoiler = Seq((9L, "srcC", "x"), (10L, "srcC", "x"))
      .toDF("doc_id", "source", "text")
    val got = Boilerplate.stripBoilerplate(allBoiler, "doc_id", "text",
      "source").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(9L -> "", 10L -> ""))
  }

  test("boilerplateLines reports the inspectable per-source surface") {
    val b = Boilerplate.boilerplateLines(docs, "doc_id", "text", "source",
      minFrac = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(b === Set(
      ("srcA", "menu", 3L, 4L), ("srcA", "footer", 4L, 4L),
      ("srcB", "menu", 3L, 3L)))
  }

  test("duplicate rows for one doc id cannot inflate its unique lines " +
      "into boilerplate") {
    // both counters key on DISTINCT doc ids: a doc delivered twice (e.g.
    // an at-least-once upstream) contributes its lines once, so its
    // doc-specific line stays below minFrac no matter how often the row
    // repeats
    val dup = Seq(
      (1L, "s", "menu\nonly in doc1"),
      (1L, "s", "menu\nonly in doc1"),
      (1L, "s", "menu\nonly in doc1"),
      (2L, "s", "menu\nonly in doc2"),
      (3L, "s", "menu\nonly in doc3"),
    ).toDF("doc_id", "source", "text")
    val b = Boilerplate.boilerplateLines(dup, "doc_id", "text", "source",
      minFrac = 0.5)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(b === Set(("menu", 3L, 3L)),
      s"doc1's unique line must not cross the threshold: $b")
  }
}

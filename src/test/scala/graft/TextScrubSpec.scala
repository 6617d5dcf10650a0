package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** scrubPii / repetitionRatio on crafted inputs (the synthetic corpus has
  * no PII, so the redaction pass is covered here rather than by a
  * degenerate query entry).
  */
class TextScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def scrub(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextFunctions.scrubPii(col("t"))).head().getString(0)
  }

  test("emails are masked") {
    assert(scrub("contact john.doe+spam@example.co.uk now") === "contact <EMAIL> now")
  }

  test("urls are masked before the email rule can fire on their '@'") {
    assert(scrub("see https://u:p@host.com/a?b=c#d end") === "see <URL> end")
  }

  test("phone-shaped digit runs are masked, short numbers survive") {
    assert(scrub("call +1 (555) 123-4567 room 42") === "call <PHONE> room 42")
    assert(scrub("room 42 floor 7") === "room 42 floor 7")
  }

  test("clean text is untouched") {
    val s = "the quick brown fox. 2 jumps!"
    assert(scrub(s) === s)
  }

  private def rep(s: String): Double = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(TextFunctions.repetitionRatio(col("t"), 3)).head().getDouble(0)
  }

  test("repetitionRatio: all-distinct shingles score 0") {
    assert(rep("a b c d e") === 0.0)
  }

  test("repetitionRatio: a fully repeated doc scores high") {
    // "x y z" * 4 → 10 shingles, 3 distinct → 0.7
    assert(rep(Seq.fill(4)("x y z").mkString(" ")) === 0.7)
  }

  test("repetitionRatio: short docs (<= n tokens) score 0") {
    assert(rep("just two") === 0.0)
  }

  private def moji(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(TextFunctions.fixMojibake(col("t"))).head().getString(0)
  }

  test("fixMojibake repairs double-encoded sequences") {
    assert(moji("cafÃ© donâ€™t naÃ¯ve 25Â½Â°") === "café don't naïve 25½°")
  }

  test("fixMojibake is identity on clean text and idempotent") {
    val clean = "café don't naïve — \"quoted\" 25½° plain ascii."
    assert(moji(clean) === clean)
    val dirty = "cafÃ© â€œxâ€“y"
    assert(moji(moji(dirty)) === moji(dirty))
  }
}

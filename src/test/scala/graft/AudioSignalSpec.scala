package graft

import graft.multimodal.{AudioSignal, BinaryOps}
import org.scalatest.funsuite.AnyFunSuite

class AudioSignalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hand-built pathologies: silence, full-scale clipping, and a DC " +
      "square wave each land in exactly the right accumulator") {
    // 8 windows x 16 frames: w0 silent, w1 clipped both rails, rest a
    // D=3, A=1000 square wave
    val samples = Array.tabulate(8 * 16) { i =>
      val (w, t) = (i / 16, i % 16)
      if (w == 0) 0
      else if (w == 1) { if (t % 2 == 0) 32767 else -32768 }
      else 3 + (if (t % 2 == 0) 1000 else -1000)
    }
    val Some((n, rate, ch, peak, clip, dc, sq, silent)) =
      AudioSignal.qualityStats(BinaryOps.buildWav(44100, 1, 16, samples))
    assert((n, rate, ch) === (128, 44100, 1))
    assert(peak === 32768) // the asymmetric negative rail
    assert(clip === 16L) // both rails count: |s| >= 32767
    // six plain windows of 16 frames at D=3, minus the clip window's
    // asymmetric rails: 8·32767 + 8·(−32768) = −8
    assert(dc === 6L * 16 * 3 - 8)
    assert(sq === 8L * 32767 * 32767 + 8L * 32768 * 32768 +
      6L * 16 * (3L * 3 + 1000L * 1000))
    assert(silent === 1)
  }

  test("8-bit full scale is 127: an 8-bit square at the rails clips, " +
      "the same shape at 16 bits does not") {
    val sq8 = Array.tabulate(64)(t => if (t % 2 == 0) 127 else -127)
    val Some((_, _, _, _, clip8, _, _, _)) =
      AudioSignal.qualityStats(BinaryOps.buildWav(8000, 1, 8, sq8))
    assert(clip8 === 64L)
    val Some((_, _, _, _, clip16, _, _, _)) =
      AudioSignal.qualityStats(BinaryOps.buildWav(8000, 1, 16, sq8))
    assert(clip16 === 0L)
  }

  test("channel-0 law: stereo stats ignore whatever rides channel 1") {
    val n = 64
    val ch0 = Array.tabulate(n)(t => if (t % 2 == 0) 500 else -500)
    val junk = Array.tabulate(n)(t => ((t * 2654435761L) % 60000 - 30000).toInt)
    val stereo = new Array[Int](2 * n)
    for (t <- 0 until n) { stereo(2 * t) = ch0(t); stereo(2 * t + 1) = junk(t) }
    val mono = AudioSignal.qualityStats(BinaryOps.buildWav(8000, 1, 16, ch0))
    val st = AudioSignal.qualityStats(BinaryOps.buildWav(8000, 2, 16, stereo))
    assert(mono.isDefined && st.isDefined)
    def dropCh(s: (Int, Int, Int, Int, Long, Long, Long, Int)) =
      (s._1, s._2, s._4, s._5, s._6, s._7, s._8) // all but n_channels
    assert(dropCh(mono.get) === dropCh(st.get))
  }

  test("undecodable and too-short payloads drop from audioQualityStats; " +
      "the rest flow") {
    import spark.implicits._
    val ok = BinaryOps.buildWav(8000, 1, 16,
      Array.tabulate(32)(t => if (t % 2 == 0) 100 else -100))
    val tiny = BinaryOps.buildWav(8000, 1, 16, Array(1, -1, 2, -2))
    val rows = Seq((0L, ok), (1L, tiny), (2L, "nope".getBytes))
      .toDF("doc_id", "payload")
    val out = AudioSignal.audioQualityStats(spark, rows, "doc_id", "payload")
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("fixture corpus replays the q212 closed forms for known ids") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 5L, 22L, 123L)
    val out = AudioSignal.audioQualityStats(spark,
        AudioSignal.syntheticQualityWavCorpus(spark, ids.toDF("doc_id")),
        "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- ids) {
      var peak = 0L; var clip = 0L; var dc = 0L; var sq = 0L; var silent = 0L
      for (w <- 0 until 8) {
        val m = (id * 7 + w * 13) % 11
        val (a, d) =
          if (m == 0) (0L, 0L)
          else if (m == 1) (32767L, 0L)
          else (200 + ((id * 31 + w * 17) % 997) * 29, (id % 3) * 5 - 5)
        peak = math.max(peak, a + math.abs(d))
        if (m == 1) clip += 128
        if (m >= 2) dc += 128 * d
        sq += 128 * (d * d + a * a)
        if (m == 0) silent += 1
      }
      val r = out(id)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) === (1024, 8000, 1),
        s"id=$id")
      assert(r.getInt(4).toLong === peak, s"id=$id peak")
      assert(r.getLong(5) === clip, s"id=$id clip")
      assert(r.getLong(6) === dc, s"id=$id dc")
      assert(r.getLong(7) === sq, s"id=$id sq")
      assert(r.getInt(8).toLong === silent, s"id=$id silent")
    }
  }
}

package graft

import graft.multimodal.{AudioContainers => AC, Id3}
import org.scalatest.funsuite.AnyFunSuite

class AudioContainersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("MP3 round-trip: all three versions x all three rate indices, " +
      "padded odd frames walked exactly, mono and stereo, Xing flag") {
    for (ver <- Seq("1", "2", "2.5"); srIdx <- 0 to 2; mono <- Seq(true, false)) {
      val p = AC.buildMp3(ver, brIdx = 5, srIdx, mono, nFrames = 7,
        xing = mono)
      val m = AC.parseMp3(p)
      assert(m.isDefined, s"$ver/$srIdx")
      val got = m.get
      assert(got.version === ver)
      assert(got.layer === 3)
      assert(got.channels === (if (mono) 1 else 2))
      assert(got.nFrames === 7)
      assert(got.vbr === mono)
      val spf = if (ver == "1") 1152 else 576
      assert(got.durationMs === 7L * spf * 1000 / got.sampleRate)
    }
  }

  test("an ID3v2 tag at the head is skipped by its declared size") {
    val mp3 = AC.buildMp3("1", 3, 0, mono = false, nFrames = 4, xing = false)
    val tagged = Id3.buildId3(3, "T", "A", "AL", 2003, 9) ++ mp3
    assert(AC.parseMp3(tagged) === AC.parseMp3(mp3))
  }

  test("strictness: truncation, garbage, and a mid-stream version " +
      "change all drop to None") {
    val mp3 = AC.buildMp3("2", 4, 1, mono = true, nFrames = 5, xing = false)
    assert(AC.parseMp3(mp3.dropRight(1)) === None)
    assert(AC.parseMp3("not an mp3 stream at all".getBytes) === None)
    val other = AC.buildMp3("1", 4, 1, mono = true, nFrames = 1, xing = false)
    assert(AC.parseMp3(mp3 ++ other) === None)
    assert(AC.parseMp3(Array[Byte](0xff.toByte, 0xfb.toByte)) === None)
  }

  test("layer II header parse: a hand-built MPEG1 layer-II frame reads " +
      "the layer-II bitrate table and 1152-sample frame math") {
    // sync=7ff ver=11(MPEG1) layer=10(II) noCRC brIdx=1(32kbps)
    // srIdx=2(32000) pad=0 mono
    val h = (0x7ff << 21) | (3 << 19) | (2 << 17) | (1 << 16) |
      (1 << 12) | (2 << 10) | (3 << 6)
    val len = 144 * 32 * 1000 / 32000 // layer II: 1152/8 * kbps*1000/rate
    val frame = new Array[Byte](len)
    frame(0) = (h >>> 24).toByte; frame(1) = (h >>> 16).toByte
    frame(2) = (h >>> 8).toByte; frame(3) = h.toByte
    val m = AC.parseMp3(frame)
    assert(m === Some(AC.Mp3Meta("1", 2, 32, 32000, 1, 1,
      1152L * 1000 / 32000, vbr = false)))
  }

  test("FLAC round-trip incl. a STREAMINFO behind a leading padding " +
      "block; truncation and bad magic drop to None") {
    val p = AC.buildFlac(44100, 2, 16, 441000L)
    assert(AC.parseFlacStreamInfo(p) ===
      Some(AC.FlacMeta(44100, 2, 16, 441000L, 10000L)))
    assert(AC.parseFlacStreamInfo(p.dropRight(20)) === None)
    assert(AC.parseFlacStreamInfo("fLaX0000".getBytes) === None)
    // padding first, then STREAMINFO carrying the last-block flag
    val si = p.slice(8, 42)
    val reordered = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](1, 0, 0, 2, 0, 0) ++ // padding block, 2 bytes, not last
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si
    assert(AC.parseFlacStreamInfo(reordered) ===
      Some(AC.FlacMeta(44100, 2, 16, 441000L, 10000L)))
  }

  test("fixture corpora replay the q213/q214 formulas for known ids " +
      "and drop the truncated residue class") {
    import spark.implicits._
    val ids = Seq(1L, 4L, 6L, 13L, 35L)
    val mp3 = AC.mp3MetaBinary(spark,
        AC.syntheticMp3Corpus(spark, ids.toDF("doc_id")),
        "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(mp3.keySet === Set(1L, 4L, 6L, 35L))
    for ((id, r) <- mp3) {
      val ver = Seq("1", "2", "2.5")((id % 3).toInt)
      assert(r.getString(1) === ver, s"id=$id")
      assert(r.getInt(2) === 3)
      assert(r.getInt(5) === (if (id % 2 == 1) 1 else 2))
      assert(r.getInt(6) === 4 + (id % 5).toInt)
      assert(r.getBoolean(8) === (id % 4 == 0))
    }
    val flac = AC.flacMetaBinary(spark,
        AC.syntheticFlacCorpus(spark, ids.toDF("doc_id")),
        "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(flac.keySet === Set(1L, 4L, 6L, 35L))
    for ((id, r) <- flac) {
      val rate = 8000 + (id % 12).toInt * 4000
      val total = 1000L + id % 100000 * 37
      assert(r.getInt(1) === rate, s"id=$id")
      assert(r.getInt(2) === 1 + (id % 8).toInt)
      assert(r.getInt(3) === 8 + (id % 25).toInt)
      assert(r.getLong(4) === total)
      assert(r.getLong(5) === total * 1000 / rate)
    }
  }
}

package graft

import graft.multimodal.{AudioHash, BinaryOps}
import org.scalatest.funsuite.AnyFunSuite

class AudioHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The q208 oracle formula, in Scala: bit k (cell li = (k/8)·9 + k%8)
    * set iff α(li) > α(li+1) with α = (id·31 + li·17) mod 256. */
  private def expectedHash(id: Long): Long = {
    var h = 0L
    var k = 0
    while (k < 64) {
      val li = (k / 8) * 9 + (k % 8)
      if ((id * 31 + li * 17) % 256 > (id * 31 + (li + 1) * 17) % 256)
        h |= 1L << k
      k += 1
    }
    h
  }

  private def fixtureFor(id: Long): Array[Byte] = {
    import spark.implicits._
    AudioHash.syntheticHashWavCorpus(spark,
        Seq(id).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]]("payload")
  }

  test("aHash64 replays the integer grid formula bit-exactly through " +
      "the real WAV decode and DFT — known ids, all 64 bits") {
    for (id <- Seq(0L, 1L, 7L, 123L, 4095L, 65521L)) {
      val h = AudioHash.aHash64(fixtureFor(id))
      assert(h === Some(expectedHash(id)), s"id=$id")
    }
  }

  test("uniform gain invariance: doubling every sample leaves the " +
      "fingerprint identical (sign-of-energy-difference bits)") {
    // multi-tone synth kept small enough that 2x stays inside 16 bits
    val n = 1024
    val samples = Array.tabulate(n) { t =>
      math.rint(
        3000 * math.cos(2 * math.Pi * 3 * t / 32.0) +
        2000 * math.cos(2 * math.Pi * 7 * t / 32.0) +
        1000 * math.sin(2 * math.Pi * 2 * t / 32.0)).toInt
    }
    val quiet = BinaryOps.buildWav(8000, 1, 16, samples)
    val loud = BinaryOps.buildWav(8000, 1, 16, samples.map(_ * 2))
    val hq = AudioHash.aHash64(quiet)
    assert(hq.isDefined)
    assert(hq === AudioHash.aHash64(loud))
  }

  test("channel-0 law: a stereo file hashes identically to its " +
      "channel-0 mono extraction, whatever rides channel 1") {
    val n = 1024
    val ch0 = Array.tabulate(n)(t =>
      math.rint(5000 * math.cos(2 * math.Pi * 5 * t / 32.0) +
        2500 * math.cos(2 * math.Pi * 8 * t / 32.0)).toInt)
    val junk = Array.tabulate(n)(t => ((t * 2654435761L) % 20000 - 10000).toInt)
    val stereo = new Array[Int](2 * n)
    for (t <- 0 until n) { stereo(2 * t) = ch0(t); stereo(2 * t + 1) = junk(t) }
    val hMono = AudioHash.aHash64(BinaryOps.buildWav(8000, 1, 16, ch0))
    val hStereo = AudioHash.aHash64(BinaryOps.buildWav(8000, 2, 16, stereo))
    assert(hMono.isDefined)
    assert(hMono === hStereo)
  }

  test("non-WAV, truncated, and too-short payloads hash to None and " +
      "are dropped by audioFingerprints — the corpus keeps flowing") {
    import spark.implicits._
    assert(AudioHash.aHash64("not audio at all".getBytes) === None)
    val wav = fixtureFor(3L)
    assert(AudioHash.aHash64(wav.take(30)) === None) // truncated header
    // 4 mono frames < 8 windows: decodable but unhashable
    val tiny = BinaryOps.buildWav(8000, 1, 16, Array(1, -2, 3, -4))
    assert(AudioHash.aHash64(tiny) === None)
    val mixed = Seq(
      (0L, wav), (1L, tiny), (2L, "junk".getBytes)).toDF("doc_id", "payload")
    val fp = AudioHash.audioFingerprints(spark, mixed, "doc_id", "payload")
    assert(fp.collect().map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("nearDupPairs equals the brute-force Hamming scan over aHash64 " +
      "on the near-dup fixture, and every consecutive pair is within " +
      "radius 1") {
    import spark.implicits._
    val docs = (0L until 64L).toDF("doc_id")
    val corpus = AudioHash.syntheticNearDupWavCorpus(spark, docs)
    val got = AudioHash.nearDupPairs(spark, corpus, "doc_id", "payload",
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val hashes = corpus.collect()
      .map(r => r.getLong(0) -> AudioHash.aHash64(
        r.getAs[Array[Byte]]("payload")).get)
      .toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === brute)
    for (base <- 0L until 32L) {
      val d = java.lang.Long.bitCount(hashes(2 * base) ^ hashes(2 * base + 1))
      assert(d <= 1, s"pair $base distance $d")
    }
  }
}

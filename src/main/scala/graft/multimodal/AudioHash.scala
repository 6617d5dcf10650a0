package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual audio fingerprinting over DECODED PCM — the audio twin of
  * [[ImageHash]]: the bridge between the codec layer ([[BinaryOps.parseWav]]'s
  * real RIFF/PCM decode) and the banded Hamming dedup machinery
  * (`operators.Dedup.hammingPairs64`). Re-encoded, re-gained, or
  * lightly-edited copies of one recording share no container bytes but
  * share a spectral-energy signature within a small Hamming radius — the
  * curation signal byte-level dedup cannot produce.
  *
  * The hash is the band-difference sign fingerprint of Haitsma & Kalker
  * ("A Highly Robust Audio Fingerprinting System", ISMIR 2002, §III —
  * the published Philips design): channel 0 is split into `nWindows`
  * equal time windows, each window's energy is measured in
  * `freqs.length` fixed frequency bands, and bit (w, b) records whether
  * band b carries more energy than band b+1 inside window w. Sign-of-
  * difference bits are invariant to uniform gain by construction (every
  * energy scales by the same λ² > 0), and band energies are insensitive
  * to small edits outside their window — the robustness that makes a
  * Hamming-radius join find true near-dups.
  *
  * Defaults give 8 windows × 9 bands → 8×8 = 64 bits, the exact shape
  * `hammingPairs64`'s 16-bit-chunk blocked equi-join consumes (exact for
  * radius ≤ 3 by pigeonhole). Band frequencies are normalized
  * cycles/sample ((b+1)/32, all below Nyquist at any rate), so the hash
  * is a pure function of the PCM stream; per-document work is a map-only
  * O(samples × bands) scan and ONLY the 8-byte fingerprints ever enter a
  * shuffle — the same 100 TB shape as the image path.
  */
object AudioHash {

  /** Default analysis bands: 9 normalized frequencies (b+1)/32
    * cycles/sample — 9 bands → 8 adjacent-band comparisons per window. */
  val defaultBandFreqs: Array[Double] = Array.tabulate(9)(b => (b + 1) / 32.0)

  /** Per-(window, band) energy |Σ_τ x(τ)·e^(-iωτ)|² over channel 0:
    * window w covers frames [⌊w·n/nW⌋, ⌊(w+1)·n/nW⌋) (never empty once
    * n ≥ nW), τ counts from the window start, and the complex phasor
    * advances by a rotation recurrence — one (cos, sin) pair per band,
    * no per-sample trig. On a fixture whose windows are sums of tones at
    * integer bins of the window length, DFT orthogonality makes a band's
    * energy (amplitude·N/2)² exactly — which is what lets the q208/q209
    * oracles replay every bit as integer arithmetic. */
  private[multimodal] def bandEnergies(samples: Array[Int], nChannels: Int,
      nWindows: Int, freqs: Array[Double]): Array[Double] = {
    val frames = samples.length / nChannels
    val nb = freqs.length
    val out = new Array[Double](nWindows * nb)
    var w = 0
    while (w < nWindows) {
      val f0 = w * frames / nWindows
      val f1 = math.max(f0 + 1, (w + 1) * frames / nWindows)
      var b = 0
      while (b < nb) {
        val omega = 2 * math.Pi * freqs(b)
        val cw = math.cos(omega)
        val sw = math.sin(omega)
        var cr = 1.0 // cos(ω·τ)
        var ci = 0.0 // sin(ω·τ)
        var c = 0.0
        var s = 0.0
        var t = f0
        while (t < f1) {
          val x = samples(t * nChannels).toDouble // channel 0 of frame t
          c += x * cr
          s += x * ci
          val nr = cr * cw - ci * sw
          ci = ci * cw + cr * sw
          cr = nr
          t += 1
        }
        out(w * nb + b) = c * c + s * s
        b += 1
      }
      w += 1
    }
    out
  }

  /** 64-bit (with the defaults) audio fingerprint: bit k
    * (k = w·(bands−1)+b, set as 1L << k) is E(w, b) > E(w, b+1). None
    * for payloads [[BinaryOps.parseWav]] rejects or recordings shorter
    * than one frame per window. */
  def aHash64(payload: Array[Byte], nWindows: Int = 8,
      freqs: Array[Double] = defaultBandFreqs): Option[Long] = {
    require(nWindows * (freqs.length - 1) <= 64,
      s"fingerprint wider than 64 bits: $nWindows windows x " +
        s"${freqs.length} bands")
    BinaryOps.parseWav(payload).flatMap { case (_, ch, _, samples) =>
      if (samples.length / ch < nWindows) None
      else {
        val e = bandEnergies(samples, ch, nWindows, freqs)
        val nb = freqs.length
        var hash = 0L
        var w = 0
        while (w < nWindows) {
          var b = 0
          while (b < nb - 1) {
            if (e(w * nb + b) > e(w * nb + b + 1))
              hash |= 1L << (w * (nb - 1) + b)
            b += 1
          }
          w += 1
        }
        Some(hash)
      }
    }
  }

  /** Audio fingerprints for a (idCol, payloadCol binary) frame:
    * (idCol, ahash), undecodable or too-short payloads dropped — the
    * mapPartitions codec stage, no shuffle; only 8-byte hashes flow
    * downstream. */
  def audioFingerprints(spark: SparkSession, audio: DataFrame,
      idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    audio.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        aHash64(p).map(h => (id, h))
      })
      .toDF(idCol, "ahash")
  }

  /** Audio NEAR-DUP pairs within Hamming radius `maxDist`: decode →
    * fingerprint (per-partition, no shuffle) → `Dedup.hammingPairs64`'s
    * chunk-blocked equi-join (exact by pigeonhole for radius ≤ 3, never
    * all-pairs). Output (id_a, id_b, dist). */
  def nearDupPairs(spark: SparkSession, audio: DataFrame, idCol: String,
      payloadCol: String, maxDist: Int = 3): DataFrame = {
    val fp = audioFingerprints(spark, audio, idCol, payloadCol)
      .select(col(idCol).as("id"), col("ahash").as("fp"))
    graft.operators.Dedup.hammingPairs64(fp, maxDist)
  }

  // ───────────────────────── oracle fixtures ──────────────────────────

  /** One fixture recording: 8 windows × 128 mono 16-bit samples, window
    * w the sum of 9 tones at integer bins 4(b+1) of the window length
    * (normalized (b+1)/32 — exactly the analysis bands), tone b at
    * amplitude α(w·9+b)·scale. Integer bins make the bands exactly
    * orthogonal over a window, so E(w, b) = (α·scale·64)² up to sample-
    * rounding drift |δc| ≤ 64 on a DFT magnitude ≥ scale·64 per
    * amplitude unit — with adjacent amplitudes differing by ≥ 1 and
    * scale·64 > 2·64, every E(w,b) > E(w,b+1) bit IS α(li) > α(li+1)
    * on integers. Callers keep 9·max(α)·scale inside 16-bit full scale
    * (q208: 9·255·12 = 27 540; q209: (528+8·511)·6 = 27 696). */
  private def buildFixtureWav(scale: Double)(alpha: Int => Int): Array[Byte] = {
    val n = 128
    val nW = 8
    val samples = new Array[Int](nW * n)
    var w = 0
    while (w < nW) {
      var t = 0
      while (t < n) {
        var acc = 0.0
        var b = 0
        while (b < 9) {
          acc += alpha(w * 9 + b) * scale *
            math.cos(2 * math.Pi * (b + 1) * t / 32.0)
          b += 1
        }
        samples(w * n + t) = math.rint(acc).toInt
        t += 1
      }
      w += 1
    }
    BinaryOps.buildWav(8000, 1, 16, samples)
  }

  /** Fixed-geometry WAV fixture for the fingerprint oracle (q208): tone
    * amplitudes follow the q205 grid formula (id·31 + li·17 mod 256, li
    * the (window, band) cell), so all 64 sign bits replay as pure
    * integer arithmetic in SQL — adjacent cells always differ (by ±17·12
    * after scaling), so no comparison ever rides on float residue.
    * Repartition COUNT-PINNED before the synth stage: an unpinned
    * repartition of a tiny id column gets AQE-coalesced back to one
    * partition, serializing the per-row synth+DFT work. */
  def syntheticHashWavCorpus(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, buildFixtureWav(12.0)(li => ((id * 31 + li * 17) % 256).toInt))
      })
      .toDF("doc_id", "payload")
  }

  /** Near-dup audio fixture (q209): consecutive ids share one base
    * recording (base = id/2, the q206 hash-diverse value formula — the
    * bi² mix keeps distinct bases in distinct hash classes at every
    * oracle scale); the odd id of each pair bumps cell 0's amplitude by
    * +18 — cell (0,0) participates in exactly ONE band comparison
    * (bit (0,0)), so the pair's Hamming distance is 0 or 1: a true
    * near-dup, not a byte-identical copy. The ×2 + li%2 parity
    * alternation makes ADJACENT cells never equal (the raw quadratic mix
    * admits Δ ≡ 0 mod 256 — e.g. base 67 at li=1 — which would put a
    * comparison bit on float residue); the even +18 bump preserves cell
    * 0's parity, so the guarantee survives the near-dup edit too. The
    * mix keeps the FULL mod-256 class entropy of the image twin — a
    * narrower mix (mod 128) merges Hamming-≤3 class neighborhoods and
    * sends the cross-base coincidence tail superlinear by sf0.1 —
    * doubling the amplitude range to 0..529, so the tone scale drops to
    * 6 to stay inside 16-bit full scale (ordering still exact: adjacent
    * amplitudes differ by ≥ 1 ≫ rounding drift at scale 6). */
  def syntheticNearDupWavCorpus(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val base = id / 2
        (id, buildFixtureWav(6.0) { li =>
          val mix = (base * 2654435761L + li * 40503L +
            (base % 911) * li * li) % 256
          val bump = if (id % 2 == 1 && li == 0) 18 else 0
          (2 * mix + li % 2 + bump).toInt
        })
      })
      .toDF("doc_id", "payload")
  }

  /** SplitMix64 near-dup fixture — the SCALE-PROBE corpus (the audio
    * twin of `BinaryOps.syntheticNearDupJpegCorpusProbe`): the oracle
    * fixture's (a, q) class structure birthday-collides at probe scale
    * (a generator artifact, not an operator property — real near-dup
    * density is cluster-bounded), so probe cells are independent 64-bit
    * mixes of (base, cell) making cross-base collisions ~2⁻⁶⁴-rare; the
    * constructed consecutive-id pairs are the whole pair set. Keeps the
    * parity alternation (and tone scale 6) so every comparison bit stays
    * on integers. Not SQL-replayable — probes don't need an oracle. */
  def syntheticNearDupWavCorpusProbe(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val base = id / 2
        (id, buildFixtureWav(6.0) { li =>
          val bump = if (id % 2 == 1 && li == 0) 18 else 0
          (2 * Math.floorMod(mix64(base * 72L + li), 256L) +
            li % 2 + bump).toInt
        })
      })
      .toDF("doc_id", "payload")
  }
}

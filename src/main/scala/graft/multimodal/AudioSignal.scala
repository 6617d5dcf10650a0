package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio QUALITY SIGNALS over decoded PCM — the audio twin of the Gopher
  * text rules: per-recording statistics a curation gate thresholds to
  * drop broken captures before they cost downstream work. Silence-heavy
  * recordings are dead air (a stuck pipeline or padded upload), clipping
  * means the capture chain saturated (distorted beyond repair for ASR or
  * TTS corpora), a DC offset marks a miswired ADC, and the energy sum
  * feeds loudness normalization. Every statistic is EXACT integer
  * arithmetic over channel 0 of the [[BinaryOps.parseWav]] decode — sums
  * and counts, no floats — which is what lets the q212 oracle replay all
  * of them to the last bit:
  *
  *  - `peak` — max |sample|;
  *  - `clip_count` — samples at |s| ≥ full scale − that depth's
  *    2^(bits−1)−1 (counts the asymmetric −2^(bits−1) rail too);
  *  - `dc_sum` — Σ s (the DC-offset numerator; callers divide by
  *    `n_frames` for the mean);
  *  - `sum_sq` — Σ s² (the mean-square/loudness numerator, exact in
  *    64 bits to ~8.6e9 full-scale 16-bit frames per recording);
  *  - `silent_windows` — of `nWindows` equal time windows (the q208
  *    framing), those whose peak is ≤ `silencePeak` — a silence RATIO
  *    measured at window grain, so one loud click can't mask dead air.
  *
  * Per-recording work is one map-only pass (O(frames)); only the
  * fixed-width stat row ever enters a shuffle — the same 100 TB shape as
  * the fingerprint path.
  */
object AudioSignal {

  /** Exact stats for one decoded payload: (n_frames, sample_rate,
    * n_channels, peak, clip_count, dc_sum, sum_sq, silent_windows);
    * None for payloads parseWav rejects or with fewer frames than
    * windows. */
  def qualityStats(payload: Array[Byte], nWindows: Int = 8,
      silencePeak: Int = 64)
      : Option[(Int, Int, Int, Int, Long, Long, Long, Int)] = {
    BinaryOps.parseWav(payload).flatMap { case (rate, ch, bits, samples) =>
      val frames = samples.length / ch
      if (frames < nWindows) None
      else {
        val fullScale = (1 << (bits - 1)) - 1
        var peak = 0
        var clip = 0L
        var dc = 0L
        var sq = 0L
        var silent = 0
        var w = 0
        while (w < nWindows) {
          val f0 = w * frames / nWindows
          val f1 = math.max(f0 + 1, (w + 1) * frames / nWindows)
          var wPeak = 0
          var t = f0
          while (t < f1) {
            val s = samples(t * ch) // channel 0 of frame t
            val a = math.abs(s)
            if (a > wPeak) wPeak = a
            if (a >= fullScale) clip += 1
            dc += s
            sq += s.toLong * s
            t += 1
          }
          if (wPeak > peak) peak = wPeak
          if (wPeak <= silencePeak) silent += 1
          w += 1
        }
        Some((frames, rate, ch, peak, clip, dc, sq, silent))
      }
    }
  }

  /** Quality-stat columns for an (idCol, payloadCol binary) frame —
    * undecodable or too-short payloads dropped; the mapPartitions codec
    * stage, no shuffle, no PCM downstream. */
  def audioQualityStats(spark: SparkSession, audio: DataFrame,
      idCol: String, payloadCol: String, nWindows: Int = 8,
      silencePeak: Int = 64): DataFrame = {
    import spark.implicits._
    audio.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        qualityStats(p, nWindows, silencePeak).map {
          case (n, rate, ch, peak, clip, dc, sq, silent) =>
            (id, n, rate, ch, peak, clip, dc, sq, silent)
        }
      })
      .toDF(idCol, "n_frames", "sample_rate", "n_channels", "peak",
        "clip_count", "dc_sum", "sum_sq", "silent_windows")
  }

  /** Deterministic quality-pathology corpus for the q212 oracle: 8
    * windows × 128 mono samples; window w of doc id draws
    * m = (id·7 + w·13) mod 11 —
    * m = 0 → SILENT (all zeros), m = 1 → CLIPPED (full-scale square
    * wave, both rails), otherwise a DC-offset square wave s(t) =
    * D ± A with A = 200 + ((id·31 + w·17) mod 997)·29 and
    * D = (id mod 3)·5 − 5. Square waves are exact integers, the ±A
    * halves cancel in the DC sum, and Σ(D±A)² = 128·(D²+A²) — every
    * emitted statistic replays in SQL by the same formulas. */
  def syntheticQualityWavCorpus(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val n = 128
        val samples = new Array[Int](8 * n)
        var w = 0
        while (w < 8) {
          val m = (id * 7 + w * 13) % 11
          val (amp, dc) =
            if (m == 0) (0, 0)
            else if (m == 1) (32767, 0)
            else ((200 + ((id * 31 + w * 17) % 997) * 29).toInt,
              ((id % 3) * 5 - 5).toInt)
          var t = 0
          while (t < n) {
            samples(w * n + t) = dc + (if (t % 2 == 0) amp else -amp)
            t += 1
          }
          w += 1
        }
        (id, BinaryOps.buildWav(8000, 1, 16, samples))
      })
      .toDF("doc_id", "payload")
  }
}

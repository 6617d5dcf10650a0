package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing over DECODED pixels — the bridge between the
  * codec layer ([[BinaryOps]]' real JPEG/PNG/GIF pixel decodes) and the
  * banded-LSH dedup machinery (`operators.Dedup`): multimodal NEAR-dup
  * detection, the curation step metadata parity cannot do (re-encoded,
  * resized, or lightly-edited copies of one image share no bytes but
  * share a perceptual hash within a small Hamming radius).
  *
  * Two standard hashes, both pure functions of the decoded plane:
  *
  *  - [[dHash64]] (gradient hash): box-average the grayscale plane onto
  *    a 9×8 grid, emit bit (r,c) = cell(r,c) < cell(r,c+1) — 64 bits of
  *    horizontal gradient sign. Integer-exact on block-constant fixtures,
  *    which is what makes the q205/q206 oracles replayable to the bit.
  *  - [[pHash64]] (spectral hash): box-average onto 32×32, 2-D DCT-II,
  *    take the 63 lowest-frequency AC coefficients (8×8 block minus DC),
  *    emit bit k = coefficient > median — robust to uniform brightness
  *    and contrast shifts by construction (DC carries the mean; a
  *    positive rescale preserves every >-median comparison).
  *
  * Near-dup pairs then meet in `Dedup.hammingPairs64`'s 16-bit-chunk
  * blocked equi-join (exact for radius ≤ 3 by pigeonhole) — candidates
  * only ever meet inside a chunk bucket, never all-pairs: the same
  * 100 TB shape as the text SimHash path, shuffling 8-byte fingerprints
  * instead of pixel planes.
  */
object ImageHash {

  /** Grayscale plane (row-major ints 0..255) from a decoded
    * (w, h, channels, pixels) frame: identity for 1-channel, the classic
    * BT.601 integer luma ((77R + 150G + 29B + 128) >> 8 — pure integer
    * arithmetic, no float parity concerns) for 3-channel. */
  private[multimodal] def grayPlane(w: Int, h: Int, ch: Int,
      px: Array[Byte]): Array[Int] = {
    val out = new Array[Int](w * h)
    var i = 0
    if (ch == 1) {
      while (i < out.length) { out(i) = px(i) & 0xff; i += 1 }
    } else {
      while (i < out.length) {
        val r = px(3 * i) & 0xff
        val g = px(3 * i + 1) & 0xff
        val b = px(3 * i + 2) & 0xff
        out(i) = (77 * r + 150 * g + 29 * b + 128) >> 8
        i += 1
      }
    }
    out
  }

  /** Box-average downsample onto a gw×gh grid: cell (r,c) averages the
    * pixel box x ∈ [⌊c·w/gw⌋, ⌊(c+1)·w/gw⌋), y ∈ [⌊r·h/gh⌋, ⌊(r+1)·h/gh⌋)
    * (never empty once w ≥ gw, h ≥ gh; smaller images replicate edge
    * boxes via max(lo+1, hi)). On a fixture whose blocks tile the grid
    * exactly, a cell average IS the block constant — integer-exact. */
  private[multimodal] def boxGrid(gray: Array[Int], w: Int, h: Int,
      gw: Int, gh: Int): Array[Double] = {
    val out = new Array[Double](gw * gh)
    var r = 0
    while (r < gh) {
      val y0 = r * h / gh
      val y1 = math.max(y0 + 1, (r + 1) * h / gh)
      var c = 0
      while (c < gw) {
        val x0 = c * w / gw
        val x1 = math.max(x0 + 1, (c + 1) * w / gw)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(y * w + x); x += 1 }
          y += 1
        }
        out(r * gw + c) = s.toDouble / ((y1 - y0) * (x1 - x0))
        c += 1
      }
      r += 1
    }
    out
  }

  /** Decode any supported still-image payload to (w, h, channels,
    * pixels) — magic-dispatched to the real codecs. */
  private[multimodal] def decodeAny(p: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < 4) None
    else if ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
      BinaryOps.decodeJpegPixels(p)
    else if ((p(0) & 0xff) == 0x89 && p(1) == 'P')
      BinaryOps.decodePngPixels(p)
    else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F')
      BinaryOps.decodeGifPixels(p)
    else None
  }

  /** 64-bit difference hash: bit k (k = r·8+c, set as 1L << k) is
    * cell(r,c) < cell(r,c+1) on the 9×8 box grid. None for undecodable
    * payloads. */
  def dHash64(payload: Array[Byte]): Option[Long] =
    decodeAny(payload).map { case (w, h, ch, px) =>
      val g = boxGrid(grayPlane(w, h, ch, px), w, h, 9, 8)
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (g(r * 9 + c) < g(r * 9 + c + 1)) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      hash
    }

  /** 64-bit (63 used) spectral hash: 32×32 box grid, 2-D DCT-II
    * F(u,v) = Σ_x Σ_y g(y,x)·cos((2x+1)uπ/64)·cos((2y+1)vπ/64), the 63
    * AC coefficients of the low-frequency 8×8 block in (v,u) row-major
    * order, bit k = coefficient k > median (the exact middle element,
    * rank 31 of 63). Coefficients SNAP to a 1e-6 grid before the median
    * compare: a mathematically-zero sum (a constant plane's AC terms)
    * accumulates ~1e-13 float residue of either sign, and without the
    * snap those residues would set arbitrary bits. None for undecodable
    * payloads. */
  def pHash64(payload: Array[Byte]): Option[Long] =
    decodeAny(payload).map { case (w, h, ch, px) =>
      val g = boxGrid(grayPlane(w, h, ch, px), w, h, 32, 32)
      val cosT = Array.tabulate(8, 32)((u, x) =>
        math.cos((2 * x + 1) * u * math.Pi / 64))
      // separable: rows first (32×8), then columns (8×8)
      val rowT = Array.ofDim[Double](32, 8)
      var y = 0
      while (y < 32) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x = 0
          while (x < 32) { s += g(y * 32 + x) * cosT(u)(x); x += 1 }
          rowT(y)(u) = s
          u += 1
        }
        y += 1
      }
      val ac = new Array[Double](63)
      var v = 0
      var k = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          if (v != 0 || u != 0) {
            var s = 0.0
            var yy = 0
            while (yy < 32) { s += rowT(yy)(u) * cosT(v)(yy); yy += 1 }
            ac(k) = math.rint(s * 1e6) / 1e6
            k += 1
          }
          u += 1
        }
        v += 1
      }
      val med = ac.sorted.apply(31)
      var hash = 0L
      var i = 0
      while (i < 63) {
        if (ac(i) > med) hash |= 1L << i
        i += 1
      }
      hash
    }

  /** Perceptual fingerprints for an image frame: (idCol, dhash, phash),
    * undecodable payloads dropped — the mapPartitions codec stage, no
    * shuffle; only the 8-byte hashes flow downstream. */
  def imageFingerprints(spark: SparkSession, images: DataFrame,
      idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    images.select(col(idCol), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        for (d <- dHash64(p); ph <- pHash64(p)) yield (id, d, ph)
      })
      .toDF(idCol, "dhash", "phash")
  }

  /** Image NEAR-DUP pairs within Hamming radius `maxDist` on the chosen
    * hash column ("dhash" default): decode → hash (per-partition, no
    * shuffle) → `Dedup.hammingPairs64`'s chunk-blocked equi-join (exact
    * by pigeonhole for radius ≤ 3, never all-pairs). Output
    * (id_a, id_b, dist). */
  def nearDupPairs(spark: SparkSession, images: DataFrame, idCol: String,
      payloadCol: String, maxDist: Int = 3,
      hashCol: String = "dhash"): DataFrame = {
    val fp = imageFingerprints(spark, images, idCol, payloadCol)
      .select(col(idCol).as("id"), col(hashCol).as("fp"))
    graft.operators.Dedup.hammingPairs64(fp, maxDist)
  }
}

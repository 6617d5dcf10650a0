package graft

import graft.multimodal.{BinaryOps, Sniff}
import org.scalatest.funsuite.AnyFunSuite

/** Laws for magic-number sniffing: every real serializer's output maps
  * to its class, prefixes never fool it (a WAV is not a generic RIFF,
  * an MP4 needs ftyp at +4), HTML tolerates leading whitespace, and
  * unmatched bytes land in "unknown" rather than a guess.
  */
class SniffSpec extends AnyFunSuite {

  test("each real container sniffs to its class") {
    assert(Sniff.sniffFormat(BinaryOps.buildJpeg(16, 16, (_, _) => 7)) === "jpeg")
    assert(Sniff.sniffFormat(BinaryOps.buildGif(4, 4,
      Array.tabulate(4)(i => (i, i, i)), (_, _) => 0)) === "gif")
    assert(Sniff.sniffFormat(BinaryOps.buildWav(8000, 1, 16,
      Array(0, 100, -100))) === "wav")
    assert(Sniff.sniffFormat(BinaryOps.buildAvcMp4(66, 30, 2, 2, 0, 0, 5,
      keyEvery = 5)) === "mp4")
    assert(Sniff.sniffFormat(BinaryOps.buildWebm("V_VP9", 64, 36, 1000.0,
      2, audioFirst = false, unknownSizeSegment = false)) === "webm")
    assert(Sniff.sniffFormat(
      graft.io.WarcIngest.buildWarcFile(0L, Seq(1L -> "x"))) === "warc")
  }

  test("png signature recognized; bare RIFF without WAVE is not wav") {
    assert(Sniff.sniffFormat(
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)) === "png")
    assert(Sniff.sniffFormat("RIFF0000AVI LIST".getBytes("ISO-8859-1")) === "unknown")
  }

  test("html tolerates leading whitespace; plain text is unknown") {
    assert(Sniff.sniffFormat("  \n\t<!doctype html><p>x</p>".getBytes("UTF-8")) === "html")
    assert(Sniff.sniffFormat("just some prose".getBytes("UTF-8")) === "unknown")
    assert(Sniff.sniffFormat(Array.emptyByteArray) === "unknown")
  }
}

package graft

import graft.io.CharsetDetect
import org.scalatest.funsuite.AnyFunSuite

/** Laws for charset sniffing: BOM precedence, strict UTF-8 validation
  * (truncated/overlong sequences reject — no silent replacement),
  * Latin-1 as the total fallback, and lossless decode for the three
  * encodable classes including astral-plane text.
  */
class CharsetDetectSpec extends AnyFunSuite {

  test("BOMs win and strip; decode is lossless incl. astral plane") {
    val texts = Seq("plain", "déjà — ✓", "emoji 😀 pair", "")
    for (t <- texts) {
      assert(CharsetDetect.decode(t.getBytes("UTF-8")) === ("utf-8", t))
      val le = Array(0xff.toByte, 0xfe.toByte) ++ t.getBytes("UTF-16LE")
      assert(CharsetDetect.decode(le) === ("utf-16le", t))
      val be = Array(0xfe.toByte, 0xff.toByte) ++ t.getBytes("UTF-16BE")
      assert(CharsetDetect.decode(be) === ("utf-16be", t))
    }
    // UTF-8 BOM strips
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "x".getBytes("UTF-8")
    assert(CharsetDetect.decode(bom) === ("utf-8", "x"))
  }

  test("malformed UTF-8 rejects strictly and falls back to latin-1") {
    val truncated = "é".getBytes("UTF-8").take(1) // lone continuation lead
    assert(CharsetDetect.detect(truncated) === "latin-1")
    val overlong = Array(0xc0.toByte, 0xaf.toByte) // overlong '/'
    assert(CharsetDetect.detect(overlong) === "latin-1")
    val latin = "café".getBytes("ISO-8859-1") // bare 0xE9
    assert(CharsetDetect.detect(latin) === "latin-1")
    assert(CharsetDetect.decode(latin)._2 === "café")
  }

  test("ascii is utf-8; empty payload is utf-8") {
    assert(CharsetDetect.detect("hello".getBytes("US-ASCII")) === "utf-8")
    assert(CharsetDetect.detect(Array.emptyByteArray) === "utf-8")
  }
}

package graft

import graft.multimodal.{BinaryOps, Id3}
import org.scalatest.funsuite.AnyFunSuite

class Id3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // spec-local wire builders, independent of Id3's fixture builder —
  // the laws pin the PARSER against bytes a foreign writer could emit
  private def ss(n: Int): Array[Byte] = Array(((n >> 21) & 0x7f).toByte,
    ((n >> 14) & 0x7f).toByte, ((n >> 7) & 0x7f).toByte, (n & 0x7f).toByte)
  private def be(n: Int): Array[Byte] = Array((n >> 24).toByte,
    (n >> 16).toByte, (n >> 8).toByte, n.toByte)
  private def fr(ver: Int, id: String, payload: Array[Byte]): Array[Byte] =
    id.getBytes("ISO-8859-1") ++
      (if (ver == 4) ss(payload.length) else be(payload.length)) ++
      Array[Byte](0, 0) ++ payload
  private def tag(ver: Int, flags: Int, body: Array[Byte]): Array[Byte] =
    "ID3".getBytes("ISO-8859-1") ++ Array[Byte](ver.toByte, 0,
      flags.toByte) ++ ss(body.length) ++ body

  test("round-trip both versions through the fixture builder — every " +
      "field, padding included") {
    for (ver <- Seq(3, 4)) {
      val t = Id3.parseId3(Id3.buildId3(ver, "Title", "Artist", "Album",
        1999, 7, padding = if (ver == 3) 32 else 0))
      assert(t === Some(Id3.Tag(ver, Some("Title"), Some("Artist"),
        Some("Album"), Some(1999), Some(7))))
    }
  }

  test("UTF-16-with-BOM text frames decode (encoding 1, both byte " +
      "orders via the BOM)") {
    for (cs <- Seq("UTF-16LE", "UTF-16BE")) {
      val bom: Array[Byte] =
        if (cs == "UTF-16LE") Array(0xff.toByte, 0xfe.toByte)
        else Array(0xfe.toByte, 0xff.toByte)
      val payload = 1.toByte +: (bom ++ "Grüß".getBytes(cs))
      val t = Id3.parseId3(tag(3, 0, fr(3, "TIT2", payload)))
      assert(t.flatMap(_.title) === Some("Grüß"), cs)
    }
  }

  test("v2.3 unsynchronisation: FF 00 on the wire is an escaped FF — " +
      "de-unsynced before the frame walk") {
    // a title whose ISO-8859-1 bytes contain FF ('ÿ'); escape the body
    val clean = fr(3, "TIT2", 0.toByte +: "aÿb".getBytes("ISO-8859-1"))
    assert(clean.count(b => (b & 0xff) == 0xff) === 1)
    val escaped = clean.flatMap(b =>
      if ((b & 0xff) == 0xff) Seq(b, 0.toByte) else Seq(b)).toArray
    val t = Id3.parseId3(tag(3, 0x80, escaped))
    assert(t.flatMap(_.title) === Some("aÿb"))
  }

  test("extended header skipped by its own size — v2.3 (size excludes " +
      "the field) and v2.4 (syncsafe, includes it)") {
    val f3 = fr(3, "TPE1", 0.toByte +: "X".getBytes("ISO-8859-1"))
    val ext3 = be(6) ++ new Array[Byte](6) // v2.3: 6 more bytes
    assert(Id3.parseId3(tag(3, 0x40, ext3 ++ f3))
      .flatMap(_.artist) === Some("X"))
    val f4 = fr(4, "TPE1", 3.toByte +: "Y".getBytes("UTF-8"))
    val ext4 = ss(10) ++ new Array[Byte](6) // v2.4: 10 total incl. size
    assert(Id3.parseId3(tag(4, 0x40, ext4 ++ f4))
      .flatMap(_.artist) === Some("Y"))
  }

  test("broken structure drops to None, never half-read fields: " +
      "truncated tag, frame overrun, garbage frame id, unknown version") {
    val good = Id3.buildId3(3, "T", "A", "AL", 2001, 2)
    assert(Id3.parseId3(good.dropRight(6)) === None) // declared size overruns
    val overrun = fr(3, "TIT2", 0.toByte +: "Z".getBytes("ISO-8859-1"))
      .clone()
    overrun(7) = 99 // frame claims 99 bytes it doesn't have
    assert(Id3.parseId3(tag(3, 0, overrun)) === None)
    val garbage = fr(3, "t!t2", 0.toByte +: "Z".getBytes("ISO-8859-1"))
    assert(Id3.parseId3(tag(3, 0, garbage)) === None)
    assert(Id3.parseId3(tag(2, 0,
      fr(3, "TIT2", Array[Byte](0, 'q')))) === None)
    assert(Id3.parseId3("RIFFxxxxWAVE".getBytes("ISO-8859-1")) === None)
  }

  test("the audio payload after the tag is never read; untagged and " +
      "broken rows drop from id3MetaBinary while the rest flow") {
    import spark.implicits._
    val wav = BinaryOps.buildWav(8000, 1, 16, Array.tabulate(16)(_ % 4))
    val tagged = Id3.buildId3(4, "K", "B", "C", 2020, 1) ++ wav
    val rows = Seq((1L, tagged), (2L, wav),
        (3L, tagged.dropRight(wav.length + 4)))
      .toDF("doc_id", "payload")
    val out = Id3.id3MetaBinary(spark, rows, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq === Seq((1L, "K")))
  }

  test("fixture corpus replays the q211 formulas — both version " +
      "parities, a padded id, and the truncated residue class") {
    import spark.implicits._
    val docs = Seq(4L, 7L, 13L, 26L, 35L).toDF("doc_id")
    val out = Id3.id3MetaBinary(spark,
        Id3.syntheticTaggedAudioCorpus(spark, docs), "doc_id", "payload")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getInt(5), r.getInt(6)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(4L, 7L, 35L)) // 13 and 26 truncated
    for ((id, ver, title, artist, album, year, track) <- out) {
      assert(ver === (if (id % 2 == 0) 3 else 4))
      assert(title === s"t${id % 97}")
      assert(artist === s"a${id % 89}")
      assert(album === s"al${id % 83}")
      assert(year === 1960 + id % 60)
      assert(track === 1 + id % 30)
    }
  }
}

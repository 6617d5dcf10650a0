package graft

import graft.multimodal.BinaryOps
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extractMeta derives metadata from byte length, deterministic") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val meta = BinaryOps.extractMeta(spark, docs)
    assert(meta.count() === docs.count())
    val m = meta.filter(_.doc_id == 0L).head()
    assert(m.width === 64 + m.n_bytes % 512)
    assert(m.height === 64 + (m.n_bytes * 7) % 512)
    assert(m.n_frames === 1 + m.n_bytes % 30)
  }

  // Hand-assembled minimal containers: a 640×480 PNG prefix (signature +
  // IHDR, the spec-required first chunk) and a 640×480 JPEG (SOI, APP0,
  // SOF0 frame header, EOI).
  private def pngFixture(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC not validated by the header parser
    out.array()
  }

  private def jpegFixture(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 13 + 2)
    out.put(0xff.toByte).put(0xd8.toByte)                    // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16)       // APP0, len 16
    out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    out.putShort(0x0101.toShort).put(0.toByte)
    out.putShort(1).putShort(1).put(0.toByte).put(0.toByte)
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11)       // SOF0, len 11
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte) // 1 component
    out.put(0xff.toByte).put(0xd9.toByte)                    // EOI
    out.array()
  }

  test("parseImageHeader reads PNG IHDR and JPEG SOF dimensions") {
    assert(BinaryOps.parseImageHeader(pngFixture(640, 480)) === Some((640, 480)))
    assert(BinaryOps.parseImageHeader(jpegFixture(1920, 1080)) === Some((1920, 1080)))
    // malformed/truncated/non-image payloads fall through to the stub
    assert(BinaryOps.parseImageHeader(pngFixture(640, 480).take(20)) === None)
    assert(BinaryOps.parseImageHeader("plain text payload".getBytes("UTF-8")) === None)
    assert(BinaryOps.parseImageHeader(Array[Byte]()) === None)
    assert(BinaryOps.parseImageHeader(pngFixture(0, 480)) === None)
  }

  test("extractMetaBinary decodes embedded image fixtures, stubs the rest") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngFixture(640, 480)),
      (2L, jpegFixture(320, 240)),
      (3L, "not an image at all just bytes".getBytes("UTF-8")),
    ).toDF("doc_id", "payload")
    val meta = BinaryOps.extractMetaBinary(spark, rows)
      .collect().map(m => m.doc_id -> m).toMap
    assert((meta(1L).width, meta(1L).height, meta(1L).n_frames) === ((640, 480, 1)))
    assert((meta(2L).width, meta(2L).height, meta(2L).n_frames) === ((320, 240, 1)))
    val stub = BinaryOps.stubDecode(3L, "not an image at all just bytes".getBytes("UTF-8"))
    assert(meta(3L) === stub, "non-image payloads take the stub path unchanged")
  }

  test("featurize: deterministic bounded vectors that feed Similarity as-is") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    val emb1 = BinaryOps.featurize(spark, docs, dim = 8)
    val emb2 = BinaryOps.featurize(spark, docs, dim = 8)
    val v1 = emb1.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val v2 = emb2.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(v1 === v2, "stub featurizer must be deterministic")
    assert(v1.values.forall(v => v.length == 8 && v.forall(x => x >= 0.0 && x < 1.0)))
    // the embedding column plugs straight into the ANN operators
    val topk = graft.operators.Similarity.bruteForceTopK(
      emb1, emb1.filter(col("doc_id") < 2), "doc_id", "embedding", 3)
    assert(topk.groupBy("query_id").count().collect().forall(_.getLong(1) === 3L))
  }

  test("sampleFrames fans out one row per sampled frame") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(20)
    val meta = BinaryOps.extractMeta(spark, docs)
    val frames = BinaryOps.sampleFrames(meta, 5)
    val expected = meta.collect().map(m => (m.n_frames + 4) / 5).sum
    assert(frames.count() === expected)
  }

  // ---- real PNG pixel decode (JDK zlib) ----

  /** Complete in-test PNG encoder: forward-applies the chosen per-row
    * filters (the inverse of what the decoder must undo), deflates, and
    * writes signature + IHDR/IDAT/IEND with real CRCs. */
  private def encodePng(w: Int, h: Int, channels: Int, pixels: Array[Byte],
      filters: Seq[Int], palette: Array[Byte] = null,
      bitDepth: Int = 8, interlace: Boolean = false): Array[Byte] = {
    val colorType =
      if (palette != null) { require(channels == 1); 3 }
      else channels match {
        case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      }
    val bpp = channels * bitDepth / 8
    // forward-filter one (sub-)image's rows with the chosen filter cycle
    def filterImage(pix: Array[Byte], rowBytes: Int, rows: Int): Array[Byte] = {
      val r = new Array[Byte]((rowBytes + 1) * rows)
      for (y <- 0 until rows) {
        val f = filters(y % filters.length)
        r(y * (rowBytes + 1)) = f.toByte
        for (x <- 0 until rowBytes) {
          val cur = pix(y * rowBytes + x) & 0xff
          val left = if (x >= bpp) pix(y * rowBytes + x - bpp) & 0xff else 0
          val up = if (y > 0) pix((y - 1) * rowBytes + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) pix((y - 1) * rowBytes + x - bpp) & 0xff else 0
          val enc = f match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          }
          r(y * (rowBytes + 1) + 1 + x) = (enc & 0xff).toByte
        }
      }
      r
    }
    val raw: Array[Byte] =
      if (!interlace) filterImage(pixels, w * bpp, h)
      else { // Adam7: gather each pass sub-image, filter it independently
        val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
          (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        val bos = new java.io.ByteArrayOutputStream()
        for ((x0, y0, dx, dy) <- passes) {
          val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) {
            val sub = new Array[Byte](pw * ph * bpp)
            for (py <- 0 until ph; px <- 0 until pw)
              System.arraycopy(pixels,
                ((y0 + py * dy) * w + (x0 + px * dx)) * bpp,
                sub, (py * pw + px) * bpp, bpp)
            bos.write(filterImage(sub, pw * bpp, ph))
          }
        }
        bos.toByteArray
      }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf); deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte)
      .put(if (interlace) 1.toByte else 0.toByte).array()
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++
      (if (palette != null) chunk("PLTE", palette) else Array.emptyByteArray) ++
      chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("Adam7 interlaced PNG de-interlaces to the same pixels as sequential") {
    // dims that are NOT multiples of 8 exercise empty/partial passes
    val w = 13; val h = 11; val ch = 3
    val pixels = Array.tabulate(w * h * ch)(i => ((i * 41 + 5) % 256).toByte)
    val seq7 = encodePng(w, h, ch, pixels, filters = Seq(0, 1, 2, 3, 4))
    val adam = encodePng(w, h, ch, pixels, filters = Seq(0, 1, 2, 3, 4),
      interlace = true)
    val Some((_, _, _, a)) = BinaryOps.decodePngPixels(adam)
    val Some((_, _, _, s)) = BinaryOps.decodePngPixels(seq7)
    assert(a.toSeq === s.toSeq, "interlaced and sequential decodes must agree")
    assert(a.toSeq === pixels.toSeq, "and both equal the source pixels")
    // imageio cross-check on the interlaced file
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(adam))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      assert((a((y * w + x) * ch + c) & 0xff)
        === img.getRaster.getSample(x, y, c), s"pixel ($x,$y) band $c")
    // a 1-pixel-wide interlaced image: several passes are empty
    val tiny = Array.tabulate(1 * 9 * ch)(i => ((i * 17 + 3) % 256).toByte)
    val tinyPng = encodePng(1, 9, ch, tiny, filters = Seq(1, 4),
      interlace = true)
    val Some((_, _, _, t)) = BinaryOps.decodePngPixels(tinyPng)
    assert(t.toSeq === tiny.toSeq)
  }

  test("16-bit PNG decodes to the high byte of each big-endian sample") {
    val w = 6; val h = 5; val ch = 3
    val samples = Array.tabulate(w * h * ch)(i => (i * 9973 + 123) % 65536)
    val bytes = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      bytes(i * 2) = (samples(i) >> 8).toByte
      bytes(i * 2 + 1) = (samples(i) & 0xff).toByte
    }
    val png = encodePng(w, h, ch, bytes, filters = Seq(0, 1, 2, 3, 4),
      bitDepth = 16)
    val Some((gw, gh, gch, px)) = BinaryOps.decodePngPixels(png)
    assert((gw, gh, gch) === ((w, h, ch)))
    for (i <- samples.indices)
      assert((px(i) & 0xff) === (samples(i) >> 8), s"sample $i")
    // imageio reads the full 16-bit samples — our output is their high byte
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      assert((px((y * w + x) * ch + c) & 0xff)
        === (img.getRaster.getSample(x, y, c) >> 8), s"pixel ($x,$y) band $c")
  }

  test("palette PNG expands indices through PLTE to RGB; bad indices are malformed") {
    val w = 7; val h = 6
    val nColors = 16
    val plte = Array.tabulate(nColors * 3)(i => ((i * 53 + 19) % 256).toByte)
    val indices = Array.tabulate(w * h)(i => ((i * 7) % nColors).toByte)
    val png = encodePng(w, h, 1, indices, filters = Seq(0, 1, 2, 3, 4),
      palette = plte)
    val Some((gw, gh, ch, px)) = BinaryOps.decodePngPixels(png)
    assert((gw, gh, ch) === ((w, h, 3)))
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(px(i * 3 + c) === plte((indices(i) & 0xff) * 3 + c), s"pixel $i band $c")
    // imageio agrees on the expansion (indexed rasters store INDICES, so
    // compare through the color model via getRGB)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff))
        === (((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)),
        s"pixel ($x,$y)")
    }
    // an index past the palette end is malformed, not an exception
    val shortPlte = plte.take(9) // 3 colors; indices reach 15
    assert(BinaryOps.decodePngPixels(encodePng(w, h, 1, indices,
      filters = Seq(0), palette = shortPlte)).isEmpty, "index past PLTE")
    // palette declared but PLTE chunk absent: malformed
    val noPlte = encodePng(w, h, 1, indices, filters = Seq(0))
    val patched = noPlte.clone()
    patched(8 + 8 + 9) = 3.toByte // IHDR color type byte → palette
    assert(BinaryOps.decodePngPixels(patched).isEmpty, "missing PLTE")
  }

  test("decodePngPixels round-trips RGB pixels through every filter type") {
    val w = 5; val h = 5; val ch = 3
    val pixels = Array.tabulate(w * h * ch)(i => ((i * 37 + 11) % 256).toByte)
    // one row per filter type 0..4 — every unfilter branch exercised
    val png = encodePng(w, h, ch, pixels, filters = Seq(0, 1, 2, 3, 4))
    val got = BinaryOps.decodePngPixels(png)
    assert(got.isDefined, "decoder rejected a valid PNG")
    val (gw, gh, gch, px) = got.get
    assert((gw, gh, gch) === ((w, h, ch)))
    assert(px.toSeq === pixels.toSeq, "pixel bytes must round-trip exactly")
  }

  test("decodePngPixels handles greyscale and RGBA; rejects junk and 16-bit") {
    val grey = Array.tabulate(16)(i => (i * 16).toByte)
    val g = BinaryOps.decodePngPixels(encodePng(4, 4, 1, grey, Seq(0, 4)))
    assert(g.exists(_._4.toSeq == grey.toSeq))
    val rgba = Array.tabulate(2 * 2 * 4)(i => (255 - i * 10).toByte)
    val r = BinaryOps.decodePngPixels(encodePng(2, 2, 4, rgba, Seq(1, 2)))
    assert(r.exists(_._4.toSeq == rgba.toSeq))
    assert(BinaryOps.decodePngPixels("not a png at all".getBytes).isEmpty)
    // 16-bit depth: flip the bit-depth byte of a valid image
    val png = encodePng(2, 2, 3, Array.fill(12)(1.toByte), Seq(0))
    png(24) = 16.toByte
    assert(BinaryOps.decodePngPixels(png).isEmpty)
    // hostile header: a tiny file claiming 8192×8192 must be rejected
    // BEFORE the pixel buffers are allocated (IDAT-plausibility bound)
    val hostile = encodePng(2, 2, 3, Array.fill(12)(1.toByte), Seq(0))
    val bb = java.nio.ByteBuffer.wrap(hostile)
    bb.putInt(16, 8192); bb.putInt(20, 8192)
    assert(BinaryOps.decodePngPixels(hostile).isEmpty)
  }

  test("featurizePixels: exact channel means for decoded PNGs, stub for text") {
    // 2×2 RGB with known per-channel values
    val pixels = Array(
      10, 20, 30, 50, 60, 70,
      90, 100, 110, 130, 140, 150).map(_.toByte)
    val png = encodePng(2, 2, 3, pixels, Seq(0, 1))
    val v = BinaryOps.featurizePixels(png, dim = 8)
    assert(math.abs(v(0) - (10 + 50 + 90 + 130) / 4.0 / 255.0) < 1e-12)
    assert(math.abs(v(1) - (20 + 60 + 100 + 140) / 4.0 / 255.0) < 1e-12)
    assert(math.abs(v(2) - (30 + 70 + 110 + 150) / 4.0 / 255.0) < 1e-12)
    assert(v(3) === 2 / 4096.0 && v(4) === 2 / 4096.0, "normalized dims follow means")
    // non-PNG payloads keep the deterministic stub path
    val text = "just some text".getBytes
    assert(BinaryOps.featurizePixels(text, 8).toSeq ===
      BinaryOps.stubFeaturize(text, 8).toSeq)
  }

  // ---- real WAV/PCM audio decode (RIFF chunk walk) ----

  test("parseWav round-trips buildWav exactly at both depths and channel counts") {
    val mono16 = Array.tabulate(240)(i => ((i * 977) % 65536) - 32768)
    val parsed = BinaryOps.parseWav(BinaryOps.buildWav(16000, 1, 16, mono16))
    assert(parsed.exists { case (r, c, b, s) =>
      r == 16000 && c == 1 && b == 16 && s.toSeq == mono16.toSeq })
    val stereo8 = Array.tabulate(100)(i => (i % 256) - 128)
    val p8 = BinaryOps.parseWav(BinaryOps.buildWav(8000, 2, 8, stereo8))
    assert(p8.exists { case (r, c, b, s) =>
      r == 8000 && c == 2 && b == 8 && s.toSeq == stereo8.toSeq })
    // full-scale extremes survive the signed round-trip
    val edge = Array(-32768, 32767, 0, -1, 1, -32768)
    val pe = BinaryOps.parseWav(BinaryOps.buildWav(44100, 2, 16, edge))
    assert(pe.exists(_._4.toSeq == edge.toSeq))
  }

  test("parseWav skips foreign chunks (odd-padded) and rejects malformed input") {
    val samples = Array(100, -200, 300, -400)
    val wav = BinaryOps.buildWav(8000, 1, 16, samples)
    // splice a 3-byte LIST chunk (odd size → 1 pad byte) between fmt and data
    val foreign = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)).array()
    val spliced = wav.take(36) ++ foreign ++ wav.drop(36)
    // RIFF size field is not re-checked by the walker; chunk walk must land
    // on data regardless
    assert(BinaryOps.parseWav(spliced).exists(_._4.toSeq == samples.toSeq))
    // malformed: truncated data chunk, non-PCM format, junk, empty
    assert(BinaryOps.parseWav(wav.dropRight(3)).isEmpty, "truncated data")
    val ieee = wav.clone(); ieee(20) = 3 // format code 3 = IEEE float
    assert(BinaryOps.parseWav(ieee).isEmpty, "non-integer-PCM format")
    val bits24 = wav.clone(); bits24(34) = 24
    assert(BinaryOps.parseWav(bits24).isEmpty, "24-bit depth unsupported")
    assert(BinaryOps.parseWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(BinaryOps.parseWav("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(BinaryOps.parseWav(Array[Byte]()).isEmpty)
  }

  test("featurizeWav: exact hand-computed features; stereo de-interleaves ch0") {
    // stereo: ch0 = [1000, -1000, 1000], ch1 = [0, 0, 0] interleaved
    val s = Array(1000, 0, -1000, 0, 1000, 0)
    val f = BinaryOps.featurizeWav(7L, BinaryOps.buildWav(22050, 2, 16, s)).get
    assert(f.doc_id === 7L && f.sample_rate === 22050)
    assert(f.n_channels === 2 && f.n_frames === 3)
    assert(math.abs(f.mean_amp - 1000.0 / 6 / 32768.0) < 1e-15)
    assert(math.abs(f.rms_amp - math.sqrt(3e6 / 6) / 32768.0) < 1e-15)
    assert(f.zero_crossings === 2, "ch0 flips sign twice; ch1's zeros don't count")
    // 8-bit full scale normalizes by 128
    val f8 = BinaryOps.featurizeWav(1L, BinaryOps.buildWav(8000, 1, 8,
      Array(64, -64))).get
    assert(math.abs(f8.rms_amp - 0.5) < 1e-15)
    assert(BinaryOps.featurizeWav(2L, "nope".getBytes).isEmpty)
  }

  // ---- real MP4 / ISO-BMFF box walk ----

  test("parseMp4Header round-trips buildMp4; handles largesize and to-EOF boxes") {
    val mp4 = BinaryOps.buildMp4(1920, 1080, 600, 36000L, 900L)
    val v = BinaryOps.parseMp4Header(mp4)
    assert(v === Some(BinaryOps.VideoMeta(1920, 1080, 60000.0, 900L)))
    // largesize: rewrite the mdat box (last) as size==1 + 64-bit size
    val mdatOff = mp4.length - 12
    val withLarge = mp4.take(mdatOff) ++ {
      val b = java.nio.ByteBuffer.allocate(16 + 4)
      b.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(20L)
        .put(Array[Byte](0, 1, 2, 3)).array()
    }
    assert(BinaryOps.parseMp4Header(withLarge) === v)
    // size==0 (box to EOF) on the trailing mdat
    val withZero = mp4.clone()
    java.nio.ByteBuffer.wrap(withZero).putInt(mdatOff, 0)
    assert(BinaryOps.parseMp4Header(withZero) === v)
  }

  test("parseMp4Header rejects malformed input; q62 text payloads never match") {
    val mp4 = BinaryOps.buildMp4(640, 480, 1000, 5000L, 120L)
    assert(BinaryOps.parseMp4Header(mp4.dropRight(5)).isEmpty, "truncated box")
    val badSize = mp4.clone()
    java.nio.ByteBuffer.wrap(badSize).putInt(0, 7) // first box size < 8
    assert(BinaryOps.parseMp4Header(badSize).isEmpty)
    assert(BinaryOps.parseMp4Header("plain text payload".getBytes).isEmpty)
    assert(BinaryOps.parseMp4Header("abcdftyp trailing".getBytes).isEmpty,
      "a text payload whose bytes 4-7 spell ftyp still fails the size gate")
    assert(BinaryOps.parseMp4Header(Array[Byte]()).isEmpty)
    // an empty-body tkhd box terminating the payload must be malformed
    // (None), not an ArrayIndexOutOfBoundsException in the Spark task
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val ftyp = mp4.take(16) // buildMp4's ftyp box is 8-byte header + 8-byte body
    val emptyTkhd = ftyp ++ box("moov", box("trak", box("tkhd", Array[Byte]())))
    assert(BinaryOps.parseMp4Header(emptyTkhd).isEmpty, "empty tkhd body")
    // a 28-byte v1 mvhd at end-of-payload: u64(body+24) needs 32 bytes —
    // must be malformed, never read past the array or into the next box
    val shortMvhd = {
      val b = java.nio.ByteBuffer.allocate(28)
      b.put(1.toByte) // version 1
      ftyp ++ box("moov", box("mvhd", b.array()))
    }
    assert(BinaryOps.parseMp4Header(shortMvhd).isEmpty, "28-byte v1 mvhd")
    // a full 32-byte v1 mvhd parses the 64-bit duration correctly
    val v1Mvhd = {
      val b = java.nio.ByteBuffer.allocate(32)
      b.put(1.toByte); b.position(20); b.putInt(600).putLong(36000L)
      val tkhd = {
        val t = java.nio.ByteBuffer.allocate(84)
        t.position(76); t.putInt(320 << 16).putInt(240 << 16)
        t.array()
      }
      ftyp ++ box("moov", box("mvhd", b.array()) ++ box("trak", box("tkhd", tkhd)))
    }
    assert(BinaryOps.parseMp4Header(v1Mvhd) ===
      Some(BinaryOps.VideoMeta(320, 240, 60000.0, 0L)))
    // decodeMeta dispatch: mp4 → real track meta, text → stub
    val m = BinaryOps.decodeMeta(9L, mp4)
    assert((m.width, m.height, m.n_frames) === ((640, 480, 120)))
    val t = "not media".getBytes
    assert(BinaryOps.decodeMeta(9L, t) === BinaryOps.stubDecode(9L, t))
  }

  // ---- real baseline JPEG entropy decode ----

  test("decodeJpegPixels round-trips buildJpeg exactly (DC-only lossless regime)") {
    val w = 29; val h = 21 // non-8-aligned: edge-block crop on both axes
    def v(bx: Int, by: Int) = (7 + bx * 31 + by * 59) % 256
    val jpeg = BinaryOps.buildJpeg(w, h, v)
    val Some((gw, gh, ch, px)) = BinaryOps.decodeJpegPixels(jpeg)
    assert((gw, gh, ch) === ((w, h, 1)))
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === v(x / 8, y / 8), s"pixel ($x,$y)")
    // the DC prediction chain really is exercised: blocks differ
    assert(px.map(_ & 0xff).distinct.length > 4)
  }

  test("decodeJpegPixels agrees with javax.imageio on the fixture (differential)") {
    val jpeg = BinaryOps.buildJpeg(24, 16, (bx, by) => 16 + 40 * bx + 13 * by)
    val Some((w, h, _, px)) = BinaryOps.decodeJpegPixels(jpeg)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null, "imageio must accept the generated JPEG")
    assert(img.getWidth === w && img.getHeight === h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(math.abs((px(y * w + x) & 0xff) - raster.getSample(x, y, 0)) <= 1,
        s"pixel ($x,$y): ours ${px(y * w + x) & 0xff} vs imageio ${raster.getSample(x, y, 0)}")
  }

  test("the AC run/size loop decodes a handcrafted coefficient (beyond EOB)") {
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xdb); u16(67); u8(0); (0 until 64).foreach(_ => u8(1))
    marker(0xc0); u16(11); u8(8); u16(8); u16(8); u8(1); u8(1); u8(0x11); u8(0)
    // DC table: single symbol (category 0), one-bit code "0"
    marker(0xc4); u16(2 + 17 + 1); u8(0x00)
    u8(1); (0 until 15).foreach(_ => u8(0)); u8(0)
    // AC table: EOB = "0" (len 1), symbol 0x04 (run 0, size 4) = "10" (len 2)
    marker(0xc4); u16(2 + 17 + 2); u8(0x10)
    u8(1); u8(1); (0 until 14).foreach(_ => u8(0)); u8(0x00); u8(0x04)
    marker(0xda); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    // bits: DC "0" | AC "10" + magnitude 1010 (+10 at zig-zag 1) | EOB "0"
    u8(0x54)
    marker(0xd9)
    val Some((w, h, _, px)) = BinaryOps.decodeJpegPixels(bos.toByteArray)
    assert((w, h) === ((8, 8)))
    // a (0,1)-frequency horizontal cosine around 128, identical rows
    val expected = Array.tabulate(8)(x =>
      math.round(128.0 + 10.0 / math.sqrt(2.0) / 4.0 *
        math.cos((2 * x + 1) * math.Pi / 16)).toInt)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((px(y * 8 + x) & 0xff) === expected(x), s"pixel ($x,$y)")
  }

  test("decodeJpegPixels rejects what it cannot faithfully decode") {
    val jpeg = BinaryOps.buildJpeg(16, 16, (_, _) => 100)
    assert(BinaryOps.decodeJpegPixels(jpeg.dropRight(8)).isEmpty, "truncated")
    // progressive frame marker (SOF2) honestly refused
    val prog = jpeg.clone()
    val sofAt = prog.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    prog(sofAt + 1) = 0xc2.toByte
    assert(BinaryOps.decodeJpegPixels(prog).isEmpty, "progressive")
    assert(BinaryOps.decodeJpegPixels("not a jpeg at all".getBytes).isEmpty)
    assert(BinaryOps.featurizeJpeg(1L, "text".getBytes).isEmpty)
    // featurizeMedia dispatches decoded JPEG strips, in [0,1]
    val f = BinaryOps.featurizeMedia(jpeg, 4)
    assert(f.length === 4 && f.forall(v => v >= 0.0 && v <= 1.0))
    assert(math.abs(f(0) - 100.0 / 255.0) < 1e-9, "constant image strip mean")
  }

  test("color JPEG round-trips through both JFIF conversions exactly as replayed") {
    val w = 27; val h = 18 // non-8-aligned both axes
    def rgbOf(bx: Int, by: Int) = ((7 + bx * 53 + by * 11) % 256,
      (91 + bx * 17) % 256, (200 + by * 77) % 256)
    val jpeg = BinaryOps.buildJpegColor(w, h, rgbOf)
    val Some((gw, gh, ch, px)) = BinaryOps.decodeJpegPixels(jpeg)
    assert((gw, gh, ch) === ((w, h, 3)))
    // the parity round (1e-8 stabilizer) — same convention as the codec
    def cl(d: Double) = math.max(0, math.min(255, math.round(d + 1e-8).toInt))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbOf(x / 8, y / 8)
      val yv = cl(0.299 * r + 0.587 * g + 0.114 * b)
      val cb = cl(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
      val cr = cl(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
      val er = cl(yv + 1.402 * (cr - 128))
      val eg = cl(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
      val eb = cl(yv + 1.772 * (cb - 128))
      val o = (y * w + x) * 3
      assert(((px(o) & 0xff), (px(o + 1) & 0xff), (px(o + 2) & 0xff))
        === ((er, eg, eb)), s"pixel ($x,$y)")
    }
    // the gamut corner where Cb rounds to 256 pre-clamp still decodes
    val corner = BinaryOps.buildJpegColor(8, 8, (_, _) => (0, 0, 255))
    val Some((_, _, _, cpx)) = BinaryOps.decodeJpegPixels(corner)
    assert((cpx(2) & 0xff) >= 250, "blue gamut corner stays blue")
  }

  test("color JPEG agrees with javax.imageio within fixed-point tolerance") {
    val jpeg = BinaryOps.buildJpegColor(16, 16,
      (bx, by) => (40 * bx + 20, 200 - 60 * by, 90 + 30 * bx))
    val Some((w, h, ch, px)) = BinaryOps.decodeJpegPixels(jpeg)
    assert(ch === 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null, "imageio must accept the generated color JPEG")
    assert(img.getWidth === w && img.getHeight === h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(math.abs((px((y * w + x) * 3 + c) & 0xff)
        - raster.getSample(x, y, c)) <= 2,
        s"pixel ($x,$y) band $c: ours ${px((y * w + x) * 3 + c) & 0xff} " +
          s"vs imageio ${raster.getSample(x, y, c)}")
  }

  test("restart markers: DRI fixture round-trips and imageio agrees") {
    val w = 29; val h = 21
    def v(bx: Int, by: Int) = (7 + bx * 31 + by * 59) % 256
    val plain = BinaryOps.buildJpeg(w, h, v)
    val withRst = BinaryOps.buildJpeg(w, h, v, restartInterval = 2)
    assert(withRst.length > plain.length, "RST markers present")
    val a = BinaryOps.decodeJpegPixels(withRst).get
    val b = BinaryOps.decodeJpegPixels(plain).get
    assert((a._1, a._2, a._3) === ((b._1, b._2, b._3)))
    assert(a._4.toSeq === b._4.toSeq,
      "restart intervals must not change decoded pixels")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(withRst))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    val Some((_, _, _, px)) = BinaryOps.decodeJpegPixels(withRst)
    for (y <- 0 until h; x <- 0 until w)
      assert(math.abs((px(y * w + x) & 0xff)
        - img.getRaster.getSample(x, y, 0)) <= 1)
  }

  test("4:2:0 round-trips with exact subsampled-MCU geometry; imageio agrees on one tile") {
    val w = 27; val h = 22 // non-16-aligned: MCU-grid crop on both axes
    def rgbOf(mx: Int, my: Int) = ((13 + mx * 67 + my * 29) % 256,
      (111 + mx * 41) % 256, (5 + my * 93) % 256)
    val jpeg = BinaryOps.buildJpegColor420(w, h, rgbOf)
    val Some((gw, gh, ch, px)) = BinaryOps.decodeJpegPixels(jpeg)
    assert((gw, gh, ch) === ((w, h, 3)))
    def cl(d: Double) = math.max(0, math.min(255, math.round(d + 1e-8).toInt))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbOf(x / 16, y / 16)
      val yv = cl(0.299 * r + 0.587 * g + 0.114 * b)
      val cb = cl(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
      val cr = cl(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
      val er = cl(yv + 1.402 * (cr - 128))
      val eg = cl(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
      val eb = cl(yv + 1.772 * (cb - 128))
      val o = (y * w + x) * 3
      assert(((px(o) & 0xff), (px(o + 1) & 0xff), (px(o + 2) & 0xff))
        === ((er, eg, eb)), s"pixel ($x,$y)")
    }
    // imageio differential on a SINGLE 16x16 tile: constant chroma, so
    // libjpeg's triangle upsampling filter and our nearest-neighbor
    // agree exactly (multi-tile gradients would differ at tile seams)
    val one = BinaryOps.buildJpegColor420(16, 16, (_, _) => (170, 60, 200))
    val Some((_, _, _, opx)) = BinaryOps.decodeJpegPixels(one)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(one))
    assert(img != null && img.getWidth === 16 && img.getHeight === 16)
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
      assert(math.abs((opx((y * 16 + x) * 3 + c) & 0xff)
        - img.getRaster.getSample(x, y, c)) <= 2)
  }

  test("4:2:2 round-trips: 16x8 MCU tiles, chroma halved horizontally only") {
    val w = 25; val h = 13 // crops on both axes of the 16x8 grid
    def rgbOf(mx: Int, my: Int) = ((31 + mx * 73 + my * 19) % 256,
      (140 + mx * 23) % 256, (77 + my * 61) % 256)
    val jpeg = BinaryOps.buildJpegColor422(w, h, rgbOf)
    val Some((gw, gh, ch, px)) = BinaryOps.decodeJpegPixels(jpeg)
    assert((gw, gh, ch) === ((w, h, 3)))
    def cl(d: Double) = math.max(0, math.min(255, math.round(d + 1e-8).toInt))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbOf(x / 16, y / 8)
      val yv = cl(0.299 * r + 0.587 * g + 0.114 * b)
      val cb = cl(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
      val cr = cl(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
      val er = cl(yv + 1.402 * (cr - 128))
      val eg = cl(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
      val eb = cl(yv + 1.772 * (cb - 128))
      val o = (y * w + x) * 3
      assert(((px(o) & 0xff), (px(o + 1) & 0xff), (px(o + 2) & 0xff))
        === ((er, eg, eb)), s"pixel ($x,$y)")
    }
    // single-tile imageio differential (constant chroma, filter-free)
    val one = BinaryOps.buildJpegColor422(16, 8, (_, _) => (30, 190, 120))
    val Some((_, _, _, opx)) = BinaryOps.decodeJpegPixels(one)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(one))
    assert(img != null && img.getWidth === 16 && img.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 16; c <- 0 until 3)
      assert(math.abs((opx((y * 16 + x) * 3 + c) & 0xff)
        - img.getRaster.getSample(x, y, c)) <= 2)
  }

  test("progressive JPEG round-trips buildJpegProgressive exactly (four-scan script)") {
    val w = 29; val h = 21 // non-8-aligned: edge-block crop on both axes
    def v(bx: Int, by: Int) = (7 + bx * 31 + by * 59) % 256
    val jpeg = BinaryOps.buildJpegProgressive(w, h, v)
    // the container really is progressive: SOF2, four SOS segments
    assert(jpeg.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) > 0)
    assert(jpeg.sliding(2).count(s =>
      s.head == 0xff.toByte && s.last == 0xda.toByte) === 4)
    val Some((gw, gh, ch, px)) = BinaryOps.decodeJpegPixels(jpeg)
    assert((gw, gh, ch) === ((w, h, 1)))
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) === v(x / 8, y / 8), s"pixel ($x,$y)")
    // quantized DC values with an odd low bit exist (quant[0] = 8 maps
    // the stored DC to v - 128), so the refinement scan genuinely flips
    val cols = (w + 7) / 8
    assert((0 until cols * ((h + 7) / 8))
      .exists(u => ((v(u % cols, u / cols) - 128) & 1) == 1))
  }

  test("GIF round-trips exactly, plain and interlaced; truncation is None") {
    val w = 29; val h = 23
    val pal = Array.tabulate(64)(i =>
      ((i * 37 + 11) % 256, (i * 73 + 29) % 256, (i * 101 + 47) % 256))
    def pix(x: Int, y: Int) = (x * 7 + y * 31) % 64
    for (inter <- Seq(false, true)) {
      val gif = BinaryOps.buildGif(w, h, pal, pix, interlace = inter)
      val Some((gw, gh, ch, px)) = BinaryOps.decodeGifPixels(gif)
      assert((gw, gh, ch) === ((w, h, 3)), s"interlace=$inter")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = pal(pix(x, y))
        val o = (y * w + x) * 3
        assert(((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff)) ===
          ((r, g, b)), s"pixel ($x,$y) interlace=$inter")
      }
      assert(BinaryOps.decodeGifPixels(gif.dropRight(6)).isEmpty,
        "truncated stream must be rejected")
      // the header parser reads the same dimensions
      assert(BinaryOps.parseImageHeader(gif) === Some((w, h)))
    }
  }

  test("GIF LZW survives dictionary growth to table-full and clear-reset; " +
      "imageio agrees both directions") {
    // a noisy 180x140 pattern defeats run compression, so the encoder
    // genuinely fills the 4096-entry table and emits a mid-stream CLEAR
    val w = 180; val h = 140
    val pal = Array.tabulate(64)(i => (i * 4, 255 - i * 4, (i * 7) % 256))
    def pix(x: Int, y: Int) = (x * 7 + y * 31 + x * y) % 64
    val gif = BinaryOps.buildGif(w, h, pal, pix)
    val Some((gw, gh, _, px)) = BinaryOps.decodeGifPixels(gif)
    assert((gw, gh) === ((w, h)))
    for (y <- 0 until h by 7; x <- 0 until w by 11) {
      val (r, g, b) = pal(pix(x, y))
      val o = (y * w + x) * 3
      assert(((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff)) === ((r, g, b)))
    }
    // direction 1: the JDK reads OUR gif
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img != null && img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h by 7; x <- 0 until w by 11) {
      val rgb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)) ===
        ((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff)), s"($x,$y)")
    }
    // direction 2: WE read the JDK's own GIF encoder output — the
    // cross-codec check that pins the LZW width-bump schedule
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pal(pix(x, y))
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", bos))
    val Some((jw, jh, _, jpx)) = BinaryOps.decodeGifPixels(bos.toByteArray)
    assert((jw, jh) === ((w, h)))
    for (y <- 0 until h by 7; x <- 0 until w by 11) {
      val rgb = bi.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)) ===
        ((jpx(o) & 0xff, jpx(o + 1) & 0xff, jpx(o + 2) & 0xff)), s"jdk ($x,$y)")
    }
  }

  test("MJPEG MP4 round-trips: sample table resolves every frame, each " +
      "decodes to the source JPEG's exact pixels") {
    val w = 24; val h = 16
    // FIVE frames: odd count -> two chunks of 2 plus a tail chunk of 1,
    // so the stsc run table has two runs and the chunk walk is real
    val frames = (0 until 5).map(f =>
      BinaryOps.buildJpeg(w, h, (bx, by) => (f * 50 + bx * 20 + by * 10) % 256))
    val mp4 = BinaryOps.buildMjpegMp4(w, h, 600, 1200L, frames)
    val vs = BinaryOps.parseMp4Samples(mp4).get
    assert((vs.width, vs.height, vs.fourcc) === ((w, h, "jpeg")))
    assert(vs.sizes.toSeq === frames.map(_.length))
    for (f <- 0 until 5) {
      val slice = java.util.Arrays.copyOfRange(mp4,
        vs.offsets(f).toInt, vs.offsets(f).toInt + vs.sizes(f))
      assert(slice.toSeq === frames(f).toSeq, s"frame $f byte range")
      val Some((dw, dh, dc, px)) = BinaryOps.decodeJpegPixels(slice)
      assert((dw, dh, dc) === ((w, h, 1)))
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) === (f * 50 + (x / 8) * 20 + (y / 8) * 10) % 256)
    }
    // the metadata walker still reads the same container
    val meta = BinaryOps.parseMp4Header(mp4).get
    assert((meta.width, meta.height, meta.n_frames) === ((w, h, 5L)))
    // a truncated mdat is rejected, never sliced short
    assert(BinaryOps.parseMp4Samples(mp4.dropRight(8)).isEmpty)
  }

  test("videoFrameFeaturesBinary: every-2nd-frame stride, non-JPEG " +
      "fourcc dropped") {
    val docs = spark.range(0, 20).toDF("doc_id")
    val corpus = BinaryOps.syntheticMjpegCorpus(spark, docs)
    val out = BinaryOps.videoFrameFeaturesBinary(spark, corpus, everyNth = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    for (id <- 0L until 20L) {
      val w = (8 * (2 + id % 4)).toInt
      val h = (8 * (1 + id % 3)).toInt
      val nf = (3 + id % 4).toInt
      val expectFrames = (0 until nf by 2).toSet
      assert(out.keys.filter(_._1 == id).map(_._2).toSet === expectFrames)
      for (f <- expectFrames) {
        val (ow, oh, mean) = out((id, f))
        assert((ow, oh) === ((w, h)))
        val cols = w / 8; val rws = h / 8
        val sv = (0 until cols * rws).map(bi =>
          ((id * 31 + f * 97 + (bi % cols) * 17 + (bi / cols) * 23) % 256) * 64).sum
        assert(mean === sv.toDouble / (w.toLong * h) / 255.0)
      }
    }
    // patch the stsd fourcc to a codec we cannot decode: dropped, not stubbed
    val one = corpus.filter(org.apache.spark.sql.functions.col("doc_id") === 3)
      .collect()(0)
      .getAs[Array[Byte]]("payload")
    val idx = one.indexOfSlice("jpeg".getBytes("US-ASCII"))
    assert(idx > 0)
    val patched = one.clone()
    "avc1".getBytes("US-ASCII").copyToArray(patched, idx)
    assert(BinaryOps.parseMp4Samples(patched).get.fourcc === "avc1")
    import spark.implicits._
    val dropped = BinaryOps.videoFrameFeaturesBinary(spark,
      Seq((3L, patched)).toDF("doc_id", "payload"))
    assert(dropped.count() === 0L)
  }

  test("truncated progressive: zero completed scans is None, a clean " +
      "between-scan cut renders the completed passes") {
    val w = 24; val h = 16
    def v(bx: Int, by: Int) = (30 + 50 * bx + 20 * by) % 256
    val jpeg = BinaryOps.buildJpegProgressive(w, h, v)
    def sosOffsets = jpeg.indices.dropRight(1).filter(i =>
      jpeg(i) == 0xff.toByte && jpeg(i + 1) == 0xda.toByte)
    val soss = sosOffsets
    assert(soss.length === 4)
    // cut at the FIRST SOS marker: no scan data at all -> None (was a
    // flat gray "image" before the zero-scan guard)
    assert(BinaryOps.decodeJpegPixels(jpeg.take(soss.head)).isEmpty)
    // cut mid-first-scan -> the bit reader runs off the stream -> None
    assert(BinaryOps.decodeJpegPixels(jpeg.take(soss.head + 20)).isEmpty)
    // cut cleanly before the LAST scan: three completed passes render —
    // a coarser refinement of the full image, same dims, not None
    val partial = BinaryOps.decodeJpegPixels(jpeg.take(soss.last))
    assert(partial.nonEmpty)
    val (pw, ph, pc, _) = partial.get
    assert((pw, ph, pc) === ((w, h, 1)))
  }

  test("progressive JPEG with restart intervals decodes identically; imageio agrees") {
    val w = 24; val h = 24
    def v(bx: Int, by: Int) = (16 + 40 * bx + 13 * by) % 256
    val plain = BinaryOps.buildJpegProgressive(w, h, v)
    val withRst = BinaryOps.buildJpegProgressive(w, h, v, restartInterval = 2)
    assert(withRst.length > plain.length, "RST markers present")
    val a = BinaryOps.decodeJpegPixels(plain).get
    val b = BinaryOps.decodeJpegPixels(withRst).get
    assert(a._4.toSeq === b._4.toSeq,
      "restart intervals must not change decoded pixels")
    for (fixture <- Seq(plain, withRst)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fixture))
      assert(img != null, "imageio must accept the generated progressive JPEG")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(math.abs((a._4(y * w + x) & 0xff)
          - img.getRaster.getSample(x, y, 0)) <= 1, s"pixel ($x,$y)")
    }
  }

  test("progressive decode agrees with imageio on the JDK writer's own scan script") {
    // the JDK's progressive encoder emits a real multi-scan script with
    // spectral selection AND successive approximation over nonzero AC
    // coefficients — this differential drives the AC-first EOB runs and
    // the AC-refinement correction-bit path with live data
    def writeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    // grayscale gradient + texture: plenty of nonzero AC at every band
    val w = 37; val h = 26
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0,
        (x * 7 + y * 5 + ((x * y) % 13) * 11) % 256)
    val gBytes = writeProgressive(gray)
    assert(gBytes.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) > 0,
      "JDK writer must emit SOF2 in progressive mode")
    val Some((gw, gh, gch, gpx)) = BinaryOps.decodeJpegPixels(gBytes)
    assert((gw, gh, gch) === ((w, h, 1)))
    val gRef = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gBytes))
    for (y <- 0 until h; x <- 0 until w)
      assert(math.abs((gpx(y * w + x) & 0xff)
        - gRef.getRaster.getSample(x, y, 0)) <= 1,
        s"gray pixel ($x,$y): ours ${gpx(y * w + x) & 0xff} vs " +
          s"imageio ${gRef.getRaster.getSample(x, y, 0)}")
    // color: the JDK writes progressive 3-component YCbCr with
    // subsampled chroma → non-interleaved AC scans over a subsampled
    // component grid. Constant-chroma content (r = g = b ⇒ Cb = Cr =
    // 128 everywhere) keeps the comparison upsampling-FILTER-free
    // (nearest vs triangle agree on constants), so the tolerance stays
    // the fixed-point band while the luma still carries full-band AC.
    val cimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val t = (x * 7 + y * 5 + ((x * y) % 13) * 11) % 256
      cimg.setRGB(x, y, (t << 16) | (t << 8) | t)
    }
    val cBytes = writeProgressive(cimg)
    val Some((cw2, ch2, cch, cpx)) = BinaryOps.decodeJpegPixels(cBytes)
    assert((cw2, ch2, cch) === ((w, h, 3)))
    val cRef = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cBytes))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(math.abs((cpx((y * w + x) * 3 + c) & 0xff)
        - cRef.getRaster.getSample(x, y, c)) <= 2,
        s"color pixel ($x,$y) band $c: ours ${cpx((y * w + x) * 3 + c) & 0xff}" +
          s" vs imageio ${cRef.getRaster.getSample(x, y, c)}")
  }

  test("sampling factors above 2 are refused; the color surface drops grayscale") {
    val colorJpeg = BinaryOps.buildJpegColor(16, 8, (_, _) => (10, 20, 30))
    val sub = colorJpeg.clone()
    val sof = sub.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    sub(sof + 11) = 0x33.toByte // Y sampling 3x3 → outside the 2x2 cap
    assert(BinaryOps.decodeJpegPixels(sub).isEmpty,
      "sampling factors beyond 2x2 refused")
    assert(BinaryOps.featurizeJpegColor(1L,
      BinaryOps.buildJpeg(16, 8, (_, _) => 50)).isEmpty,
      "grayscale payloads drop from the color surface")
    // the general featurizer reports channels for both
    assert(BinaryOps.featurizeJpeg(1L, colorJpeg).get.channels === 3)
  }

  test("imageFeaturesBinary == the q145 oracle formula on the synthetic corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(60)
    val got = BinaryOps.imageFeaturesBinary(spark,
        BinaryOps.syntheticJpegCorpus(spark, docs))
      .collect().map(f => f.doc_id -> f).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(got.size === ids.length)
    for (id <- ids) {
      val w = (13 + id % 40).toInt
      val h = (9 + (id * 3) % 40).toInt
      val cols = (w + 7) / 8
      val rows = (h + 7) / 8
      var sv = 0L; var svv = 0L
      for (by <- 0 until rows; bx <- 0 until cols) {
        val v = (id * 31 + (by * cols + bx) * 17) % 256
        val vis = math.min(8, w - bx * 8) * math.min(8, h - by * 8)
        sv += v * vis; svv += v * v * vis
      }
      val f = got(id)
      assert(f.width === w && f.height === h)
      assert(math.abs(f.mean_px - sv.toDouble / (w * h) / 255.0) < 1e-12)
      assert(math.abs(f.rms_px - math.sqrt(svv.toDouble / (w * h)) / 255.0) < 1e-12)
    }
  }

  test("featurizeWavBands: exact per-window RMS; featurizeMedia dispatches all three") {
    // 8 samples, dim 4 → windows of 2; rms of (a,b) = sqrt((a²+b²)/2)
    val s = Array(32768 / 2, 32768 / 2, 0, 0, -32768 / 4, 32768 / 4, 32767, 0)
    val wav = BinaryOps.buildWav(8000, 1, 16, s)
    val v = BinaryOps.featurizeWavBands(wav, 4).get
    assert(math.abs(v(0) - 0.5) < 1e-12)
    assert(v(1) === 0.0)
    assert(math.abs(v(2) - 0.25) < 1e-12)
    assert(math.abs(v(3) - math.sqrt(32767.0 * 32767 / 2) / 32768) < 1e-12)
    assert(v.forall(x => x >= 0.0 && x <= 1.0))
    // dispatch: WAV → bands, PNG → pixel means, text → stub
    assert(BinaryOps.featurizeMedia(wav, 4).toSeq === v.toSeq)
    val png = encodePng(2, 2, 1, Array.fill(4)(51.toByte), Seq(0))
    assert(math.abs(BinaryOps.featurizeMedia(png, 4)(0) - 51 / 255.0) < 1e-12)
    val text = "just text".getBytes
    assert(BinaryOps.featurizeMedia(text, 4).toSeq ===
      BinaryOps.stubFeaturize(text, 4).toSeq)
  }

  test("audioFeaturesBinary == the q141 oracle formula on the synthetic corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(40)
    val feats = BinaryOps.audioFeaturesBinary(spark,
      BinaryOps.syntheticWavCorpus(spark, docs)).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats.size === 40, "every synthetic WAV must parse")
    feats.values.foreach { f =>
      val id = f.doc_id
      val nCh = (1 + id % 2).toInt
      val m = (100 + id % 200).toInt * nCh
      val samples = Array.tabulate(m)(j =>
        ((id * 31 + j * 7919L) % 65536L - 32768L).toInt)
      assert(f.sample_rate === (8000 * (1 + id % 3)).toInt)
      assert(f.n_channels === nCh && f.n_frames === m / nCh)
      val mean = samples.map(_.toLong).sum.toDouble / m / 32768.0
      assert(math.abs(f.mean_amp - mean) < 1e-12)
    }
  }

  test("H.264 headers: SPS bit round-trip incl. high-profile branch, " +
      "crop-unit math, EPB coding, stss fallback, non-avc rejection") {
    // emulation-prevention coding round-trips raw zero runs (§7.4.1)
    val raw = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 7)
    val coded = BinaryOps.epbInsert(raw)
    assert(coded.toSeq === Seq[Byte](0, 0, 3, 0, 0, 3, 1, 0, 0, 3, 2, 7))
    assert(BinaryOps.rbspOf(coded, 0).toSeq === raw.toSeq)
    // SPS round-trip across Baseline / Main / High and crop combinations
    for (profile <- Seq(66, 77, 100); level <- Seq(30, 41);
         (wm, hu) <- Seq((1, 1), (8, 6), (120, 68));
         (cr, cb) <- Seq((0, 0), (1, 0), (3, 2))) {
      val sps = BinaryOps.buildSps(profile, level, wm, hu, cr, cb)
      val got = BinaryOps.parseSps(sps)
      // 4:2:0: crop units are 2 luma samples in x and y (frame coding)
      assert(got === Some((profile, level, wm * 16 - 2 * cr,
        hu * 16 - 2 * cb)),
        s"profile=$profile wm=$wm hu=$hu cr=$cr cb=$cb -> $got")
    }
    // full container: avcC walk, stss sync count
    val p = BinaryOps.buildAvcMp4(100, 41, 8, 6, 1, 1, nFrames = 23,
      keyEvery = 5)
    val m = BinaryOps.parseH264Meta(p).get
    assert(m === BinaryOps.H264Meta("avc1", 100, 41, 126, 94, 23L, 5L))
    // absent stss => every sample is sync (14496-12 §8.6.2): a file
    // genuinely WITHOUT the box must fall back to nKeyframes == nFrames
    val noStss = BinaryOps.buildAvcMp4(66, 30, 2, 2, 0, 0, nFrames = 7,
      keyEvery = 3, withStss = false)
    assert(BinaryOps.parseH264Meta(noStss).get.nKeyframes === 7L)
    // and a present stss listing all frames reads through the normal path
    val all = BinaryOps.buildAvcMp4(66, 30, 2, 2, 0, 0, nFrames = 7,
      keyEvery = 1)
    assert(BinaryOps.parseH264Meta(all).get.nKeyframes === 7L)
    // non-avc payloads are dropped, not misparsed: the MJPEG fixture
    val mj = BinaryOps.buildMjpegMp4(16, 8, 600, 100L,
      Seq(BinaryOps.buildJpeg(16, 8, (_, _) => 128)))
    assert(BinaryOps.parseH264Meta(mj).isEmpty)
    // truncation is None, never an exception
    for (cut <- Seq(10, 60, p.length / 2, p.length - 3))
      assert(BinaryOps.parseH264Meta(p.take(cut)).isEmpty, s"cut=$cut")
  }

  test("h264MetaBinary == the q161 oracle formula on the synthetic corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(60)
    val got = BinaryOps.h264MetaBinary(spark,
        BinaryOps.syntheticAvcCorpus(spark, docs))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(got.size === 60)
    for ((id, v) <- got) {
      val profile = (id % 3) match { case 0 => 66; case 1 => 77; case _ => 100 }
      val level = (id % 3) match { case 0 => 30; case 1 => 31; case _ => 41 }
      val nf = 10 + id % 20
      assert(v === (("avc1", profile, level,
        (16 * (1 + id % 8) - 2 * (id % 2)).toInt,
        (16 * (1 + id % 6) - 2 * (if (id % 3 == 0) 1 else 0)).toInt,
        nf, (nf + 4) / 5)), s"doc $id")
    }
  }

  test("WebM/EBML: round-trip across codecs/dims/cues, unknown-size " +
      "segment, audio-track skipping, malformed rejection") {
    // round-trip grid: every field survives build → parse
    for (codec <- Seq("V_VP8", "V_VP9", "V_AV1"); (w, h) <- Seq((64, 36),
           (1920, 1080), (256, 144)); cues <- Seq(0, 1, 12);
         audioFirst <- Seq(false, true); unk <- Seq(false, true)) {
      val p = BinaryOps.buildWebm(codec, w, h, durationUnits = 1234.0,
        nCues = cues, audioFirst = audioFirst, unknownSizeSegment = unk)
      val got = BinaryOps.parseWebmMeta(p)
      assert(got === Some(BinaryOps.WebmMeta("webm", codec, w, h, 1234.0,
        cues.toLong)),
        s"codec=$codec w=$w h=$h cues=$cues af=$audioFirst unk=$unk -> $got")
    }
    // the known-size and unknown-size encodings of the SAME segment must
    // parse identically (RFC 8794 §6.2: unknown size runs to parent end)
    val known = BinaryOps.buildWebm("V_VP9", 640, 360, 500.0, 3)
    val unknown = BinaryOps.buildWebm("V_VP9", 640, 360, 500.0, 3,
      unknownSizeSegment = true)
    assert(BinaryOps.parseWebmMeta(known) === BinaryOps.parseWebmMeta(unknown))
    // a file whose only track is audio carries no video metadata: None,
    // not a half-filled row (synthesize by asking for an impossible
    // video: strip it via a direct two-audio-track build is not exposed,
    // so check the weaker but real law — the audio entry NEVER leaks
    // into the parsed codec even when it comes first)
    assert(BinaryOps.parseWebmMeta(BinaryOps.buildWebm("V_AV1", 32, 32,
      0.0, 1, audioFirst = true)).get.codec === "V_AV1")
    // truncation is None, never an exception — every prefix length
    for (cut <- 0 until known.length)
      assert(!BinaryOps.parseWebmMeta(known.take(cut))
        .exists(_ != BinaryOps.parseWebmMeta(known).get), s"cut=$cut")
    // foreign payloads are dropped, not misparsed: MP4, JPEG, text
    assert(BinaryOps.parseWebmMeta(BinaryOps.buildMp4(16, 8, 600, 100L,
      5)).isEmpty)
    assert(BinaryOps.parseWebmMeta("not a webm at all".getBytes).isEmpty)
    // a zero first size/id byte (vint length > 8) is malformed
    assert(BinaryOps.parseWebmMeta(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0,
      0)).isEmpty)
    // malformation INSIDE a Video element propagates to a None verdict
    // (the sub-walk's result must not be swallowed): find the Video
    // element (0xE0) and corrupt its PixelWidth child's size vint to
    // declare more bytes than the parent holds
    val vic = BinaryOps.buildWebm("V_VP9", 640, 360, 500.0, 2)
    val vAt = vic.indices.find(i => vic(i) == 0xE0.toByte &&
      i + 2 < vic.length && vic(i + 2) == 0xB0.toByte).get
    vic(vAt + 3) = 0xC0.toByte // PixelWidth size: 2 bytes -> 64 bytes
    assert(BinaryOps.parseWebmMeta(vic).isEmpty,
      "a corrupt Video body must reject the file, not skip the track")
  }

  test("webmMetaBinary == the q168 oracle formula on the synthetic corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(60)
    val got = BinaryOps.webmMetaBinary(spark,
        BinaryOps.syntheticWebmCorpus(spark, docs))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(got.size === 60)
    for ((id, v) <- got) {
      val codec = (id % 3) match {
        case 0 => "V_VP8"; case 1 => "V_VP9"; case _ => "V_AV1"
      }
      assert(v === (("webm", codec, (64 + (id % 97) * 2).toInt,
        (36 + ((id * 3) % 83) * 2).toInt, (1000 + id % 500).toDouble,
        1 + id % 12)), s"doc $id")
    }
  }

  test("Exif: round-trip both byte orders; XMP APP1 skipped to a later " +
      "Exif APP1; truncated IFD and absent APP1 drop to None") {
    import graft.multimodal.Exif
    val jpeg = BinaryOps.buildJpeg(16, 16, (_, _) => 100)
    for (big <- Seq(false, true)) {
      val app1 = Exif.buildApp1("Acme Cam", "X-100", 6,
        "2021:07:04 12:34:56", bigEndian = big)
      val got = Exif.parseExif(Exif.withApp1(jpeg, app1))
      assert(got === Some(Exif.ExifMeta(if (big) "MM" else "II",
        "Acme Cam", "X-100", 6, "2021:07:04 12:34:56")), s"big=$big")
    }
    // an XMP APP1 shares the 0xFFE1 marker; the walk must skip it and
    // still find the Exif APP1 behind it
    val xmpBody = "http://ns.adobe.com/xap/1.0/".getBytes("US-ASCII")
    val xmp = Array(0xff.toByte, 0xe1.toByte,
      (((xmpBody.length + 2) >> 8) & 0xff).toByte,
      ((xmpBody.length + 2) & 0xff).toByte) ++ xmpBody
    val exif = Exif.buildApp1("m", "n", 1, "2020:01:01 00:00:00", false)
    assert(Exif.parseExif(Exif.withApp1(Exif.withApp1(jpeg, exif), xmp))
      .map(_.make) === Some("m"))
    // truncated IFD: corrupt the entry count to point past the segment
    val broken = Exif.withApp1(jpeg, exif.clone())
    // segment layout: SOI(2) + FFE1(2) + len(2) + "Exif\0\0"(6) +
    // TIFF header(8) + count(2): count bytes at offset 2+2+2+6+8
    broken(20) = 0xff.toByte
    broken(21) = 0xff.toByte
    assert(Exif.parseExif(broken).isEmpty, "truncated IFD must drop")
    // no APP1 at all
    assert(Exif.parseExif(jpeg).isEmpty)
    assert(Exif.parseExif("junk".getBytes("UTF-8")).isEmpty)
  }

  test("exifMetaBinary == the q207 oracle formula on the synthetic corpus") {
    import graft.multimodal.Exif
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(60)
    val got = Exif.exifMetaBinary(spark,
        Exif.syntheticExifJpegCorpus(spark, docs))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), r.getString(5)))).toMap
    assert(got.size === 60)
    for ((id, v) <- got) {
      val dt = f"${2000 + id % 24}%04d:${1 + id % 12}%02d:" +
        f"${1 + id % 28}%02d ${id % 24}%02d:${id % 60}%02d:${id % 60}%02d"
      assert(v === ((if (id % 2 == 1) "MM" else "II", s"make${id % 5}",
        s"model${id % 7}", (1 + id % 8).toInt, dt)), s"doc $id")
    }
  }

  test("ImageHash.dHash64: bit-exact on a known grid through the real " +
      "JPEG codec; invariant across PNG/JPEG encodes of the same plane") {
    import graft.multimodal.ImageHash
    // 72×64, block value = block index * 40 mod 256: row-major cells
    // 0,40,80,...; within each row of the 9-cell grid, left < right
    // except where (li+1)*40 wraps below li*40
    val jpeg = BinaryOps.buildJpeg(72, 64, (bx, by) =>
      ((by * 9 + bx) * 40) % 256)
    val got = ImageHash.dHash64(jpeg).get
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      val li = r * 9 + c
      if ((li * 40) % 256 < ((li + 1) * 40) % 256) want |= 1L << (r * 8 + c)
    }
    assert(got === want)
    // undecodable payloads are None, not garbage
    assert(ImageHash.dHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("ImageHash.pHash64: constant image hashes to zero AC bits; " +
      "brightness/contrast shifts preserve the hash; a perturbed copy " +
      "stays within radius 3 while a different image is far") {
    import graft.multimodal.ImageHash
    def jpegOf(f: (Int, Int) => Int) = BinaryOps.buildJpeg(72, 64, f)
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // constant image: every AC coefficient is 0 → no bit exceeds the
    // (zero) median
    assert(ImageHash.pHash64(jpegOf((_, _) => 128)).get === 0L)
    // DC invariance: +40 brightness moves only F(0,0), which pHash drops
    def v(bx: Int, by: Int) = (bx * 13 + by * 29) % 80
    val base = ImageHash.pHash64(jpegOf((bx, by) => 40 + 2 * v(bx, by))).get
    val brighter = ImageHash.pHash64(jpegOf((bx, by) =>
      80 + 2 * v(bx, by))).get
    assert(base === brighter, "pHash must ignore uniform brightness")
    // contrast invariance: exactly halving the dynamic range halves every
    // AC coefficient — a positive rescale preserves >-median order
    val contrast = ImageHash.pHash64(jpegOf((bx, by) => 10 + v(bx, by))).get
    assert(base === contrast, "pHash must ignore positive contrast scale")
    // near-dup: one block nudged — low-frequency energy barely moves
    val nudged = ImageHash.pHash64(jpegOf((bx, by) =>
      (if (bx == 4 && by == 3) 8 else 0) + 40 + 2 * v(bx, by))).get
    assert(dist(base, nudged) <= 3, s"near-dup drifted ${dist(base, nudged)}")
    // a genuinely different image is far
    val other = ImageHash.pHash64(jpegOf((bx, by) =>
      (bx * 53 + by * 7) % 256)).get
    assert(dist(base, other) > 10, s"distinct images at ${dist(base, other)}")
  }

  test("imageFingerprints drops undecodable rows; nearDupPairs emits " +
      "each constructed near-pair within radius and its plan is a " +
      "blocked equi-join — no cartesian") {
    import graft.multimodal.ImageHash
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(80)
    val imgs = BinaryOps.syntheticNearDupJpegCorpus(spark, docs)
      .unionByName(Seq((999999L, "junk".getBytes("UTF-8")))
        .toDF("doc_id", "payload"))
    val fp = ImageHash.imageFingerprints(spark, imgs, "doc_id", "payload")
    assert(fp.count() === 80, "undecodable rows drop, decodable all hash")
    val pairs = ImageHash.nearDupPairs(spark, imgs, "doc_id", "payload",
      maxDist = 3)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), "pairs must meet in buckets")
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    ids.grouped(2).foreach {
      case Array(a, b) if a / 2 == b / 2 =>
        assert(got.contains((a, b)) && got((a, b)) <= 1,
          s"constructed near-pair ($a,$b) missing or far")
      case _ => ()
    }
    // symmetry/orientation: only a < b pairs, no self-pairs
    assert(got.keys.forall { case (a, b) => a < b })
  }
}

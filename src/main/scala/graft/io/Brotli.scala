package graft.io

import java.io.ByteArrayOutputStream

/** RFC 7932 (brotli) decoder — the third `Content-Encoding` a real crawl
  * meets, and the dominant one on CDN-fronted sites. Implemented in full
  * from the public spec: stream header, uncompressed / metadata /
  * compressed meta-blocks, simple and complex prefix codes (code-length
  * code, 16/17 repeat semantics, canonical reconstruction), block
  * switching for all three categories, context modes (LSB6/MSB6/UTF8/
  * SIGNED) with literal and distance context maps (RLE + inverse-MTF),
  * the distance ring buffer with its ±3 variation codes, postfix/direct
  * distance decomposition, and STATIC DICTIONARY references with all 121
  * word transforms (ferment-first/all, omit-first/last-N, prefix/suffix).
  *
  * The RFC's generated data (Appendix A dictionary, Appendix B
  * transforms, the §7.1 context tables) ships as resources extracted
  * from the OS libbrotlicommon by `tools/extract_brotli.py`, each
  * structurally validated at extraction AND at load. Conformance is
  * pinned in BrotliSpec against 66 golden vectors produced by the
  * reference encoder across qualities 0–11, window sizes, and inputs
  * chosen to force every surface above (`tools/gen_brotli_vectors.py`).
  *
  * Decode is single-shot over an in-memory body (the WARC ingest shape:
  * bodies are record-framed and bounded), returns None on ANY structural
  * fault or when output exceeds `maxOut` — a hostile stream must not
  * balloon an executor.
  */
object Brotli {

  /** Structural fault — private control flow, caught in [[decode]]. */
  private object Fault extends Exception {
    override def fillInStackTrace(): Throwable = this
  }


  // ------------------------------------------------------------ resources

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
    require(in != null, s"bundled brotli resource missing: $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val dictionary: Array[Byte] = {
    val d = resource("dictionary.bin")
    require(d.length == 122784, "RFC 7932 Appendix A dictionary size")
    d
  }

  /** (sizeBits, offsets) by word length 0..31. */
  private lazy val dictIndex: (Array[Int], Array[Int]) = {
    val lines = new String(resource("dict_sizes.txt"), "UTF-8")
      .linesIterator.toSeq
    val sizes = lines.head.split(",").map(_.toInt)
    val offs = lines(1).split(",").map(_.toInt)
    require(sizes.length == 32 && offs.length == 32)
    (sizes, offs)
  }

  /** 4 modes × (lut0[256] | lut1[256]); ctx = lut0(p1) | lut1(p2). */
  private lazy val contextLut: Array[Byte] = {
    val t = resource("context.bin")
    require(t.length == 2048)
    require((0 until 256).forall(i => (t(i) & 0xff) == (i & 0x3f)),
      "LSB6 identity")
    t
  }

  /** 121 × (prefix, elemTransformId, suffix). */
  private lazy val transforms: Array[(Array[Byte], Int, Array[Byte])] = {
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val rows = new String(resource("transforms.txt"), "UTF-8")
      .linesIterator.filterNot(_.startsWith("#")).map { l =>
        val p = l.split(",", -1)
        (unhex(p(0)), p(1).toInt, unhex(p(2)))
      }.toArray
    require(rows.length == 121, "RFC 7932 Appendix B row count")
    rows
  }

  /** Block count code ranges (§6): (offset, extra bits) per symbol. */
  private lazy val blockCountRanges: Array[(Int, Int)] = {
    val rs = new String(resource("block_count_ranges.txt"), "UTF-8").trim
      .split(";").map { r =>
        val p = r.split(","); (p(0).toInt, p(1).toInt)
      }
    require(rs.length == 26 && rs(0) == ((1, 2)))
    rs
  }

  // ------------------------------------------------------- spec constants

  // §3.5: the fixed code for code-length code lengths, as a 4-bit
  // LSB-first peek table (value, then bits consumed)
  private val ClPeekLen = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClPeekVal = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)

  // §3.5: code-length symbols appear in this fixed order
  private val ClOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // §5: insert-and-copy cell → (insert code high bits, copy code high
  // bits); cells 0..1 carry the implicit distance-0 flag (cmd < 128)
  private val InsRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CpyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34,
    50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val CpyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22,
    30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CpyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)

  // §4: ring-buffer variation codes 4..15 → (ring slot 0=last 1=second,
  // delta)
  private val RingSlot = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1)
  private val RingDelta = Array(0, 0, 0, 0, -1, 1, -2, 2, -3, 3, -1, 1,
    -2, 2, -3, 3)

  // ------------------------------------------------------------ bit input

  private final class Reader(d: Array[Byte]) {
    private var pos = 0L // bit position
    private val end = d.length.toLong << 3

    def readBit(): Int = {
      if (pos >= end) throw Fault
      val b = (d((pos >> 3).toInt) >> (pos & 7).toInt) & 1
      pos += 1
      b
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }

    def peek4(): Int = {
      // peek up to 4 bits without consuming; missing tail bits read as 0
      var v = 0
      var i = 0
      while (i < 4 && pos + i < end) {
        v |= (((d(((pos + i) >> 3).toInt) >> ((pos + i) & 7).toInt) & 1) << i)
        i += 1
      }
      v
    }

    def skip(n: Int): Unit = { pos += n; if (pos > end) throw Fault }

    def alignByte(): Unit = { pos = (pos + 7) & ~7L }

    def readByteAligned(): Int = {
      if ((pos & 7) != 0 || pos + 8 > end) throw Fault
      val b = d((pos >> 3).toInt) & 0xff
      pos += 8
      b
    }
  }

  // -------------------------------------------------------- prefix codes

  /** Canonical prefix code over per-symbol lengths (≤ 15). */
  private final class Huff(lens: Array[Int]) {
    private val single: Int = {
      var s = -1
      var n = 0
      var i = 0
      while (i < lens.length) {
        if (lens(i) > 0) { n += 1; s = i }
        i += 1
      }
      if (n == 0) throw Fault
      if (n == 1) s else -1
    }
    private val count = new Array[Int](16)
    private val first = new Array[Int](16)
    private val offset = new Array[Int](16)
    private val syms: Array[Int] = {
      if (single >= 0) new Array[Int](0)
      else {
        lens.foreach { l =>
          if (l > 15) throw Fault
          if (l > 0) count(l) += 1
        }
        var code = 0
        var total = 0
        var l = 1
        while (l <= 15) {
          code = (code + count(l - 1)) << 1
          first(l) = code
          offset(l) = total
          total += count(l)
          // over-subscription guard: codes at this length must fit
          if (code + count(l) > (1 << l)) throw Fault
          l += 1
        }
        val out = new Array[Int](total)
        val fill = new Array[Int](16)
        var s = 0
        while (s < lens.length) {
          val ln = lens(s)
          if (ln > 0) { out(offset(ln) + fill(ln)) = s; fill(ln) += 1 }
          s += 1
        }
        out
      }
    }

    def decode(r: Reader): Int = {
      if (single >= 0) return single
      var code = 0
      var l = 0
      while (true) {
        code = (code << 1) | r.readBit()
        l += 1
        if (l > 15) throw Fault
        if (code - first(l) < count(l) && code >= first(l))
          return syms(offset(l) + code - first(l))
      }
      -1 // unreachable
    }
  }

  private def log2ceil(n: Int): Int = {
    var b = 0
    while ((1 << b) < n) b += 1
    b
  }

  /** §3.4/§3.5: one prefix code, simple or complex. */
  private def readPrefixCode(r: Reader, alphabet: Int): Huff = {
    val hskip = r.readBits(2)
    if (hskip == 1) {
      // simple: 1–4 symbols given explicitly
      val nsym = r.readBits(2) + 1
      val abits = log2ceil(alphabet)
      val syms = Array.fill(nsym)(r.readBits(abits))
      if (syms.exists(_ >= alphabet) || syms.distinct.length != nsym)
        throw Fault
      val lens = new Array[Int](alphabet)
      nsym match {
        case 1 => lens(syms(0)) = 1 // Huff detects one symbol → 0 bits
        case 2 => lens(syms(0)) = 1; lens(syms(1)) = 1
        case 3 => lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 2
        case 4 =>
          if (r.readBit() == 0) syms.foreach(lens(_) = 2)
          else {
            lens(syms(0)) = 1; lens(syms(1)) = 2
            lens(syms(2)) = 3; lens(syms(3)) = 3
          }
      }
      new Huff(lens)
    } else {
      // complex: code-length code lengths from HSKIP on
      val clLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = hskip
      while (i < 18 && space > 0) {
        val sym = ClOrder(i)
        val peek = r.peek4()
        val v = ClPeekVal(peek)
        r.skip(ClPeekLen(peek))
        clLens(sym) = v
        if (v != 0) { space -= 32 >> v; numCodes += 1 }
        i += 1
      }
      if (space != 0 && numCodes != 1) throw Fault
      val clHuff = new Huff(clLens)
      // symbol code lengths with 16/17 repeat accumulation
      val lens = new Array[Int](alphabet)
      var symbol = 0
      var space2 = 32768
      var prevLen = 8
      var repeat = 0
      var repeatLen = 0
      while (symbol < alphabet && space2 > 0) {
        val cl = clHuff.decode(r)
        if (cl < 16) {
          lens(symbol) = cl
          symbol += 1
          repeat = 0
          if (cl != 0) { space2 -= 32768 >> cl; prevLen = cl }
        } else {
          val extra = cl - 14 // 16→2, 17→3
          val newLen = if (cl == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val old = repeat
          if (repeat > 0) repeat = (repeat - 2) << extra
          repeat += r.readBits(extra) + 3
          val delta = repeat - old
          if (symbol + delta > alphabet) throw Fault
          var k = 0
          while (k < delta) { lens(symbol) = newLen; symbol += 1; k += 1 }
          if (newLen != 0) space2 -= delta << (15 - newLen)
        }
      }
      if (space2 != 0) throw Fault
      new Huff(lens)
    }
  }

  /** §7.3: context map with zero-run RLE and optional inverse-MTF. */
  private def readContextMap(r: Reader, size: Int, ntrees: Int): Array[Int] = {
    val map = new Array[Int](size)
    if (ntrees == 1) return map
    val rleMax = if (r.readBit() == 1) r.readBits(4) + 1 else 0
    val huff = readPrefixCode(r, rleMax + ntrees)
    var i = 0
    while (i < size) {
      val sym = huff.decode(r)
      if (sym == 0) i += 1
      else if (sym <= rleMax) {
        val reps = (1 << sym) + r.readBits(sym)
        if (i + reps > size) throw Fault
        i += reps
      } else {
        map(i) = sym - rleMax
        i += 1
      }
    }
    if (r.readBit() == 1) { // inverse move-to-front
      val mtf = Array.tabulate(256)(identity)
      var j = 0
      while (j < size) {
        val idx = map(j)
        val v = mtf(idx)
        map(j) = v
        var k = idx
        while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
        mtf(0) = v
        j += 1
      }
    }
    map
  }

  // ------------------------------------------------------ block category

  private final class BlockState(r: Reader, val nTypes: Int) {
    private val typeHuff =
      if (nTypes >= 2) readPrefixCode(r, nTypes + 2) else null
    private val countHuff = if (nTypes >= 2) readPrefixCode(r, 26) else null
    var btype = 0
    private var prevBtype = 1
    var blen: Long = if (nTypes >= 2) readCount() else Long.MaxValue >> 1

    private def readCount(): Long = {
      val sym = countHuff.decode(r)
      if (sym >= 26) throw Fault
      val (off, bits) = blockCountRanges(sym)
      off.toLong + r.readBits(bits)
    }

    /** Decrement the block length, switching type at exhaustion. */
    def tick(): Unit = {
      if (blen == 0) {
        val sym = typeHuff.decode(r)
        val next =
          if (sym == 0) prevBtype
          else if (sym == 1) (btype + 1) % nTypes
          else sym - 2
        if (next >= nTypes) throw Fault
        prevBtype = btype
        btype = next
        blen = readCount()
      }
      blen -= 1
    }
  }

  // ------------------------------------------------------------ transforms

  /** §8: ferment (UTF-8-aware uppercase) one position; returns step. */
  private def ferment(buf: Array[Byte], i: Int, len: Int): Int = {
    val c = buf(i) & 0xff
    if (c < 192) {
      if (c >= 97 && c <= 122) buf(i) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (i + 1 < len) buf(i + 1) = (buf(i + 1) ^ 32).toByte
      2
    } else {
      if (i + 2 < len) buf(i + 2) = (buf(i + 2) ^ 5).toByte
      3
    }
  }

  private def transformWord(word: Array[Byte], tId: Int): Array[Byte] = {
    val (prefix, ty, suffix) = transforms(tId)
    val core: Array[Byte] =
      if (ty == 0) word
      else if (ty >= 1 && ty <= 9) { // OmitLast1..9
        if (ty >= word.length) new Array[Byte](0) else word.dropRight(ty)
      } else if (ty >= 12 && ty <= 20) { // OmitFirst1..9
        val n = ty - 11
        if (n >= word.length) new Array[Byte](0) else word.drop(n)
      } else { // Ferment first (10) / all (11)
        val w = word.clone()
        if (ty == 10) { if (w.nonEmpty) ferment(w, 0, w.length) }
        else {
          var i = 0
          while (i < w.length) i += ferment(w, i, w.length)
        }
        w
      }
    prefix ++ core ++ suffix
  }

  // --------------------------------------------------------------- decode

  /** Decode a complete brotli stream; None on any structural fault,
    * truncation, or output beyond `maxOut`. */
  def decode(data: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] =
    try Some(run(new Reader(data), maxOut))
    catch { case Fault => None }

  private def run(r: Reader, maxOut: Int): Array[Byte] = {
    // §9.1 WBITS
    val wbits =
      if (r.readBit() == 0) 16
      else {
        val n = r.readBits(3)
        if (n != 0) 17 + n
        else {
          val m = r.readBits(3)
          if (m == 1) throw Fault // reserved
          else if (m == 0) 17
          else 8 + m
        }
      }
    val windowSize = (1 << wbits) - 16
    val out = new ByteArrayOutputStream()
    var buf = new Array[Byte](math.min(maxOut, 1 << 16))
    var pos = 0 // bytes produced
    def ensure(n: Int): Unit = {
      if (pos + n > maxOut) throw Fault
      if (pos + n > buf.length) {
        var cap = buf.length
        while (cap < pos + n) cap = math.min(maxOut, cap * 2)
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    }
    // §4 initial ring: last=4, second=11, third=15, fourth=16 — stored
    // fourth-first so push-at-(idx&3) keeps last at (idx-1)&3
    val ring = Array(16, 15, 11, 4)
    var ringIdx = 4 // last = ring((ringIdx - 1) & 3)

    var isLast = false
    while (!isLast) {
      // §9.2 meta-block header
      isLast = r.readBit() == 1
      if (isLast && r.readBit() == 1) { // ISLASTEMPTY
        return java.util.Arrays.copyOf(buf, pos)
      }
      val nibbles = r.readBits(2) match {
        case 3 => 0
        case n => n + 4
      }
      if (nibbles == 0) {
        // metadata meta-block: skip bytes
        if (r.readBit() != 0) throw Fault // reserved
        val skipBytes = r.readBits(2)
        var skipLen = 0
        var k = 0
        while (k < skipBytes) { skipLen |= r.readBits(8) << (8 * k); k += 1 }
        if (skipBytes > 0 && (skipLen >> (8 * (skipBytes - 1))) == 0)
          throw Fault // most significant byte must be nonzero
        val n = if (skipBytes == 0) 0 else skipLen + 1
        r.alignByte()
        var j = 0
        while (j < n) { r.readByteAligned(); j += 1 }
      } else {
        var mlen = 0L
        var k = 0
        while (k < nibbles) { mlen |= r.readBits(4).toLong << (4 * k); k += 1 }
        mlen += 1
        if ((!isLast && r.readBit() == 1)) {
          // ISUNCOMPRESSED: byte-aligned raw copy
          r.alignByte()
          ensure(mlen.toInt)
          var j = 0L
          while (j < mlen) {
            buf(pos) = r.readByteAligned().toByte
            pos += 1
            j += 1
          }
        } else {
          decodeCompressed(r, mlen, buf, pos, maxOut, windowSize, ring,
            ringIdx, b => buf = b) match {
            case (newPos, newRingIdx) =>
              pos = newPos
              ringIdx = newRingIdx
          }
        }
      }
    }
    java.util.Arrays.copyOf(buf, pos)

    // (buf may have been replaced through the ensure callback; the
    // closure below keeps the reference fresh)
  }

  // One compressed meta-block (§9.3). Returns (new pos, new ring idx).
  // `grow` re-reads the possibly-reallocated buffer from the caller.
  private def decodeCompressed(r: Reader, mlen: Long, buf0: Array[Byte],
      pos0: Int, maxOut: Int, windowSize: Int, ring: Array[Int],
      ringIdx0: Int, publish: Array[Byte] => Unit): (Int, Int) = {
    var buf = buf0
    var pos = pos0
    var ringIdx = ringIdx0
    def grow(n: Int): Unit = {
      if (pos + n > maxOut) throw Fault
      if (pos + n > buf.length) {
        var cap = buf.length
        while (cap < pos + n) cap = math.min(maxOut, math.max(cap * 2, 1024))
        buf = java.util.Arrays.copyOf(buf, cap)
        publish(buf)
      }
    }

    val blockL = new BlockState(r, decodeVarLenUint8(r) + 1)
    val blockI = new BlockState(r, decodeVarLenUint8(r) + 1)
    val blockD = new BlockState(r, decodeVarLenUint8(r) + 1)

    val npostfix = r.readBits(2)
    val ndirect = r.readBits(4) << npostfix
    val postfixMask = (1 << npostfix) - 1

    val contextModes = Array.fill(blockL.nTypes)(r.readBits(2))

    val ntreesL = decodeVarLenUint8(r) + 1
    val cmapL = readContextMap(r, 64 * blockL.nTypes, ntreesL)
    val ntreesD = decodeVarLenUint8(r) + 1
    val cmapD = readContextMap(r, 4 * blockD.nTypes, ntreesD)

    val litTrees = Array.fill(ntreesL)(readPrefixCode(r, 256))
    val cmdTrees = Array.fill(blockI.nTypes)(readPrefixCode(r, 704))
    val distAlphabet = 16 + ndirect + (48 << npostfix)
    val distTrees = Array.fill(ntreesD)(readPrefixCode(r, distAlphabet))

    val (dictSizeBits, dictOffsets) = dictIndex

    val target = pos + mlen
    if (target > maxOut) throw Fault
    var p1 = if (pos > 0) buf(pos - 1) & 0xff else 0
    var p2 = if (pos > 1) buf(pos - 2) & 0xff else 0

    def lastDistance: Int = ring((ringIdx - 1) & 3)

    while (pos < target) {
      blockI.tick()
      val cmd = cmdTrees(blockI.btype).decode(r)
      var rangeIdx = cmd >> 6
      val implicitDist = rangeIdx < 2
      if (!implicitDist) rangeIdx -= 2
      val insCode = InsRangeLut(rangeIdx) + ((cmd >> 3) & 7)
      val cpyCode = CpyRangeLut(rangeIdx) + (cmd & 7)
      val insLen = InsBase(insCode) + r.readBits(InsExtra(insCode))
      val cpyLen = CpyBase(cpyCode) + r.readBits(CpyExtra(cpyCode))

      // insert literals
      var i = 0
      while (i < insLen) {
        if (pos >= target) throw Fault
        blockL.tick()
        val mode = contextModes(blockL.btype)
        val ctx = (contextLut(512 * mode + p1) & 0xff) |
          (contextLut(512 * mode + 256 + p2) & 0xff)
        val tree = litTrees(cmapL(64 * blockL.btype + ctx))
        val b = tree.decode(r)
        grow(1)
        buf(pos) = b.toByte
        pos += 1
        p2 = p1
        p1 = b
        i += 1
      }
      if (pos >= target) {
        if (pos > target) throw Fault
        // command ends the block with its insert part; copy not executed
      } else {
        // distance
        val maxDistance = math.min(windowSize.toLong, pos.toLong).toInt
        var distance = 0
        var dcode = 0
        if (implicitDist) {
          dcode = 0
          distance = lastDistance
        } else {
          blockD.tick()
          val distCtx = (math.min(cpyLen, 5) - 2)
          val tree = distTrees(cmapD(4 * blockD.btype + distCtx))
          dcode = tree.decode(r)
          if (dcode < 16) {
            if (dcode < 4) distance = ring((ringIdx - 1 - dcode) & 3)
            else {
              val base = ring((ringIdx - 1 - RingSlot(dcode)) & 3)
              distance = base + RingDelta(dcode)
              if (distance <= 0) throw Fault
            }
          } else if (dcode < 16 + ndirect) {
            distance = dcode - 16 + 1
          } else {
            val x = dcode - ndirect - 16
            val hcode = x >> npostfix
            val lcode = x & postfixMask
            val ndistbits = 1 + (hcode >> 1)
            val off = ((2 + (hcode & 1)) << ndistbits) - 4
            val extra = r.readBits(ndistbits)
            distance = ((off + extra) << npostfix) + lcode + ndirect + 1
          }
        }

        if (distance > maxDistance) {
          // §8 static dictionary reference
          if (cpyLen < 4 || cpyLen > 24) throw Fault
          val shift = dictSizeBits(cpyLen)
          if (shift == 0) throw Fault
          val wordIdx = distance - maxDistance - 1
          val wordId = wordIdx & ((1 << shift) - 1)
          val tId = wordIdx >> shift
          if (tId >= 121) throw Fault
          val base = dictOffsets(cpyLen) + wordId * cpyLen
          val word = java.util.Arrays.copyOfRange(dictionary, base,
            base + cpyLen)
          val t = transformWord(word, tId)
          if (pos + t.length > target) throw Fault
          grow(t.length)
          System.arraycopy(t, 0, buf, pos, t.length)
          pos += t.length
          if (t.length >= 2) {
            p1 = buf(pos - 1) & 0xff
            p2 = buf(pos - 2) & 0xff
          } else if (t.length == 1) {
            p2 = p1
            p1 = buf(pos - 1) & 0xff
          }
          // ring NOT updated for dictionary references
        } else {
          if (distance <= 0) throw Fault
          if (dcode != 0) {
            ring(ringIdx & 3) = distance
            ringIdx += 1
          }
          if (pos + cpyLen > target) throw Fault
          grow(cpyLen)
          var k = 0
          while (k < cpyLen) { // overlapping copy, byte-by-byte
            buf(pos) = buf(pos - distance)
            pos += 1
            k += 1
          }
          p1 = buf(pos - 1) & 0xff
          p2 = if (pos > 1) buf(pos - 2) & 0xff else 0
        }
      }
    }
    (pos, ringIdx)
  }

  /** §9.2 variable-length 256-value code (NBLTYPES, NTREES). */
  private def decodeVarLenUint8(r: Reader): Int =
    if (r.readBit() == 0) 0
    else {
      val n = r.readBits(3)
      if (n == 0) 1 else r.readBits(n) + (1 << n)
    }

  // -------------------------------------------------------------- encode

  /** Minimal VALID brotli encoder for fixtures: the payload rides
    * byte-aligned UNCOMPRESSED meta-blocks (real RFC 7932 framing —
    * window header, nibble-counted MLEN, ISUNCOMPRESSED — the format's
    * incompressible-data path), closed by an empty ISLAST block. The
    * compressed-path surfaces are exercised by the reference-encoder
    * golden vectors in BrotliSpec; this writer exists so executors can
    * synthesize `Content-Encoding: br` bodies without a native library.
    */
  def encodeUncompressed(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        acc |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { out.write(acc); acc = 0; nbits = 0 }
        i += 1
      }
    }
    def align(): Unit = if (nbits > 0) { out.write(acc); acc = 0; nbits = 0 }
    putBits(0, 1) // WBITS = 16
    var off = 0
    while (off < data.length) {
      val n = math.min(1 << 24, data.length - off)
      putBits(0, 1) // ISLAST = 0
      val nibbles =
        if (n <= (1 << 16)) 4 else if (n <= (1 << 20)) 5 else 6
      putBits(nibbles - 4, 2)
      val m = n - 1
      var k = 0
      while (k < nibbles) { putBits((m >> (4 * k)) & 0xf, 4); k += 1 }
      putBits(1, 1) // ISUNCOMPRESSED
      align()
      out.write(data, off, n)
      off += n
    }
    putBits(1, 1) // ISLAST
    putBits(1, 1) // ISLASTEMPTY
    align()
    out.toByteArray
  }
}

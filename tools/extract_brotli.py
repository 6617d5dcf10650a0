#!/usr/bin/env python3
"""Extract the RFC 7932-normative data tables from the OS brotli library
(libbrotlicommon.so — the same public data printed in the RFC's
appendices) into repo resources for the Scala decoder:

  src/main/resources/graft/brotli/dictionary.bin   (Appendix A data)
  src/main/resources/graft/brotli/dict_sizes.txt   (size_bits_by_length)
  src/main/resources/graft/brotli/context.bin      (§7.1 lookup, 2048 B)
  src/main/resources/graft/brotli/transforms.txt   (Appendix B, 121 rows)

Every extraction is structurally validated against facts stated in the
RFC text (dictionary size, LSB6/MSB6 lut identities, the first transform
rows) so a struct-layout mismatch fails loudly here, not in the decoder.

Usage: extract_brotli.py [libpath]
"""
import ctypes
import os
import sys


def main():
    lib = ctypes.CDLL(sys.argv[1] if len(sys.argv) > 1
                      else "libbrotlicommon.so.1")
    out_dir = os.path.join(os.path.dirname(__file__), "..",
                           "src", "main", "resources", "graft", "brotli")
    os.makedirs(out_dir, exist_ok=True)

    # --- dictionary: struct BrotliDictionary (dictionary.h) ---
    class BrotliDictionary(ctypes.Structure):
        _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                    ("offsets_by_length", ctypes.c_uint32 * 32),
                    ("data_size", ctypes.c_size_t),
                    ("data", ctypes.POINTER(ctypes.c_uint8))]

    lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    d = lib.BrotliGetDictionary().contents
    assert d.data_size == 122784, d.data_size  # RFC 7932 Appendix A size
    sizes = list(d.size_bits_by_length)
    offs = list(d.offsets_by_length)
    # offsets must chain: offs[l+1] == offs[l] + (nwords(l) << 0) * l
    for l in range(31):
        n = (1 << sizes[l]) if sizes[l] else 0
        assert offs[l + 1] == offs[l] + n * l, (l, offs[l], sizes[l])
    assert offs[31] + ((1 << sizes[31]) if sizes[31] else 0) * 31 \
        <= d.data_size + 31
    data = bytes(bytearray(d.data[i] for i in range(d.data_size)))
    # a couple of known dictionary words (RFC Appendix A is public text)
    assert b"description" in data and b"the" in data
    with open(os.path.join(out_dir, "dictionary.bin"), "wb") as f:
        f.write(data)
    with open(os.path.join(out_dir, "dict_sizes.txt"), "w") as f:
        f.write(",".join(str(s) for s in sizes) + "\n")
        f.write(",".join(str(o) for o in offs) + "\n")
    print("dictionary:", len(data), "bytes; size_bits:", sizes)

    # --- context lookup (§7.1): 4 modes x (lut0[256] | lut1[256]) ---
    tbl = ctypes.cast(lib._kBrotliContextLookupTable,
                      ctypes.POINTER(ctypes.c_uint8 * 2048)).contents
    ctx = bytes(bytearray(tbl))
    # validate region order LSB6, MSB6, UTF8, SIGNED via the identities
    # the RFC states: LSB6 ctx = p1 & 0x3f, MSB6 ctx = p1 >> 2
    assert all(ctx[i] == (i & 0x3f) for i in range(256)), "LSB6 lut0"
    assert all(ctx[256 + i] == 0 for i in range(256)), "LSB6 lut1"
    assert all(ctx[512 + i] == (i >> 2) for i in range(256)), "MSB6 lut0"
    assert all(ctx[768 + i] == 0 for i in range(256)), "MSB6 lut1"
    # SIGNED: lut0 = Lut2[p1] << 3, lut1 = Lut2[p2] — so lut0 == lut1<<3
    assert all(ctx[1536 + i] == (ctx[1792 + i] << 3) for i in range(256)), \
        "SIGNED structure"
    # UTF8: lut0 in [0,63] (ASCII classes are multiples of 4, UTF-8
    # lead/continuation bytes get 1..3), lut1 in [0,3]; lowercase ASCII
    # heads class 56 per the RFC table
    assert all(v <= 63 for v in ctx[1024:1280]), "UTF8 lut0"
    assert all(v <= 3 for v in ctx[1280:1536]), "UTF8 lut1"
    assert ctx[1024 + ord("a")] == 56 and ctx[1280 + ord("a")] == 3, "UTF8 a"
    with open(os.path.join(out_dir, "context.bin"), "wb") as f:
        f.write(ctx)
    print("context table: 2048 bytes, region identities verified")

    # --- transforms (Appendix B): struct BrotliTransforms (transform.h) ---
    class BrotliTransforms(ctypes.Structure):
        _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                    ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                    ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                    ("num_transforms", ctypes.c_uint32),
                    ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                    ("params", ctypes.POINTER(ctypes.c_uint8)),
                    ("cutOffTransforms", ctypes.c_int16 * 10)]

    lib.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == 121, t.num_transforms  # RFC Appendix B
    ps = bytes(bytearray(t.prefix_suffix[i]
                         for i in range(t.prefix_suffix_size)))

    def seg(sid):
        # prefix_suffix is length-prefixed segments; map gives offsets
        off = t.prefix_suffix_map[sid]
        n = ps[off]
        return ps[off + 1:off + 1 + n]

    rows = []
    for i in range(121):
        p = seg(t.transforms[3 * i])
        ty = t.transforms[3 * i + 1]
        s = seg(t.transforms[3 * i + 2])
        rows.append((p, ty, s))
    # RFC 7932 Appendix B first rows, under the public type-id scheme
    # (Identity=0, OmitLast1..9=1..9, FermentFirst=10, FermentAll=11,
    # OmitFirst1..9=12..20):
    #   0 ("", Identity, "")        1 ("", Identity, " ")
    #   2 (" ", Identity, " ")      3 ("", OmitFirst1, "")
    #   4 ("", FermentFirst, " ")   5 ("", Identity, " the ")
    assert rows[0] == (b"", 0, b""), rows[0]
    assert rows[1] == (b"", 0, b" "), rows[1]
    assert rows[2] == (b" ", 0, b" "), rows[2]
    assert rows[3] == (b"", 12, b""), rows[3]
    assert rows[4] == (b"", 10, b" "), rows[4]
    assert rows[5] == (b"", 0, b" the "), rows[5]
    types = sorted(set(r[1] for r in rows))
    assert all(t <= 20 for t in types), types
    print("transform types used:", types)
    with open(os.path.join(out_dir, "transforms.txt"), "w") as f:
        f.write("# RFC 7932 Appendix B: prefixHex,typeId,suffixHex; "
                "Identity=0 OmitLast1..9=1..9 FermentFirst=10 "
                "FermentAll=11 OmitFirst1..9=12..20\n")
        for p, ty, s in rows:
            f.write("%s,%d,%s\n" % (p.hex(), ty, s.hex()))

    # --- block count code ranges (§6): 26 x (offset, nbits) ---
    class Range(ctypes.Structure):
        _fields_ = [("offset", ctypes.c_uint16), ("nbits", ctypes.c_uint8)]

    ranges = ctypes.cast(lib._kBrotliPrefixCodeRanges,
                         ctypes.POINTER(Range * 26)).contents
    rs = [(r.offset, r.nbits) for r in ranges]
    assert rs[0] == (1, 2) and rs[4] == (17, 3) and rs[25][1] == 24, rs
    print("block count ranges:", rs)
    with open(os.path.join(out_dir, "block_count_ranges.txt"), "w") as f:
        f.write(";".join("%d,%d" % r for r in rs) + "\n")


if __name__ == "__main__":
    main()

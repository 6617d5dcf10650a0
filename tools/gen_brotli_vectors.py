#!/usr/bin/env python3
"""Generate brotli golden vectors with the reference encoder (conda
brotlicffi) for BrotliSpec: each line `name\tquality\tcompressedHex\t
plainHex`. Inputs chosen to force every decoder surface: empty stream,
short ASCII (simple prefix codes), repetitive text (backward refs, ring
buffer), dictionary-heavy English at q11 (static dictionary + word
transforms), UTF-8 multibyte (UTF8 context mode), binary ramp
(uncompressed/IBLT paths), large multi-metablock, and small windows
(lgwin 10) forcing wrap-around distances.

Usage: /root/miniconda/bin/python3 tools/gen_brotli_vectors.py
"""
import os
import sys

sys.path.insert(0, "/root/miniconda/lib/python3.13/site-packages")
import brotlicffi  # noqa: E402


def main():
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "graft",
                       "brotli_vectors.txt")
    words = ("the description of the public technical report "
             "received by the government was available information "
             "during the second world war because different companies ")
    cases = [
        ("empty", b""),
        ("single", b"a"),
        ("hello", b"hello world"),
        ("repeat_short", b"abcabcabcabcabcabcabcabcabcabc"),
        ("repeat_long", (b"the quick brown fox jumps over the lazy dog. "
                         * 200)),
        ("dictionary_text", (words * 8).encode("ascii")),
        ("utf8", ("πάντα ῥεῖ "
                  "中文文本 toujours déjà vu "
                  * 60).encode("utf-8")),
        ("binary_ramp", bytes(range(256)) * 64),
        ("zeros", b"\x00" * 10000),
        ("mixed", b"".join(bytes([i % 7 * 37, i % 256])
                           for i in range(5000))),
        ("big", (words.encode("ascii") + bytes(range(128))) * 300),
    ]
    lines = []
    for name, data in cases:
        for q in (0, 1, 5, 9, 11):
            comp = brotlicffi.compress(data, quality=q)
            assert brotlicffi.decompress(comp) == data
            lines.append("%s_q%d\t%d\t%s\t%s" %
                         (name, q, q, comp.hex(), data.hex()))
        # small window forces wrap-around backward references
        comp = brotlicffi.compress(data, quality=5, lgwin=10)
        assert brotlicffi.decompress(comp) == data
        lines.append("%s_w10\t5\t%s\t%s" % (name, comp.hex(), data.hex()))
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", len(lines), "vectors,",
          sum(len(l) for l in lines) // 2, "bytes")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Merge fresh-JVM isolation timings (BenchIsolate JSONL) with the
in-suite records into BENCH_ISOLATED_r{N}.json — the attribution
artifact for suite-position effects (VERDICT r14 finding #1).

Usage: merge_isolation.py <jsonl> <out.json> <round>
Reads the builder's committed in-suite minima from git history and the
driver's run from the named refs/files below.
"""
import json
import subprocess
import sys


def committed(ref):
    try:
        txt = subprocess.check_output(["git", "show", f"{ref}:BENCH_DETAIL.json"],
                                      text=True)
        return {k: v["min"] for k, v in json.loads(txt)["queries"].items()}
    except Exception:
        return {}


def main():
    jsonl, out, rnd = sys.argv[1], sys.argv[2], sys.argv[3]
    rows = [json.loads(l) for l in open(jsonl) if l.strip()]
    # builder's r14 clean in-suite record and the r14 driver cross-check
    builder = committed("093a1b1")
    driver = committed("a54bbf0")
    merged = {}
    for r in rows:
        q = r["query"]
        iso = r["min"]
        b = builder.get(q)
        d = driver.get(q)
        merged[q] = {
            "isolated_min": iso,
            "isolated_runs": r["runs"],
            "ld": r["ld"],
            "in_suite_builder_r14": b,
            "in_suite_driver_r14": d,
            "iso_vs_builder": round(iso - b, 3) if b else None,
            "iso_vs_driver": round(iso - d, 3) if d else None,
        }
    doc = {
        "round": rnd,
        "what": "fresh-JVM min-of-N per query (graft.tools.BenchIsolate, "
                "one sbt runMain = one JVM) vs the r14 in-suite records",
        "queries": merged,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: {kk: v[kk] for kk in
                          ("isolated_min", "in_suite_builder_r14",
                           "in_suite_driver_r14")}
                      for k, v in merged.items()}, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify.scala's output
(parquet per query + oracle_sql.json), run each oracle in DuckDB over the
same testdata parquet, and compare row-count / schema / values after sorting
columns by name and rows by value.

Usage: python3 tools/verify_local.py <outDir> <sfDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # NOTE: oracle_sql.json runs VERBATIM here and on the driver. The
    # rounding-parity stabilizer (round( -> round(1e-8 + , matching the
    # Scala side's pround/roundPar) is injected ONCE by each queries
    # object's `oracles` exporter when the json is dumped — so never add
    # a second rewrite here, and never hand-write the stabilizer in
    # oracle source SQL: both double-apply it to 2e-8, which flips
    # genuine tie values (observed on q98 in round 10).
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        want = con.execute(oracle[name]).df()
        status = []
        if sorted(got.columns) != sorted(want.columns):
            status.append(f"cols spark={sorted(got.columns)} duck={sorted(want.columns)}")
        elif len(got) != len(want):
            status.append(f"rows spark={len(got)} duck={len(want)}")
        else:
            g, w = canon(got), canon(want)
            for c in g.columns:
                if str(g[c].dtype) != str(w[c].dtype):
                    status.append(f"dtype[{c}] spark={g[c].dtype} duck={w[c].dtype}")
            if not status:
                neq = (g != w) & ~(g.isna() & w.isna())
                if neq.any().any():
                    bad_cols = [c for c in g.columns if neq[c].any()]
                    r = neq.any(axis=1).idxmax()
                    status.append(
                        f"values differ cols={bad_cols} first row {r}: "
                        f"spark={g.iloc[r].to_dict()} duck={w.iloc[r].to_dict()}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only queries
    declared = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if "." not in p.split("/")[-1]}
    for name in sorted(declared - set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'ROWS' if n > 0 else 'EMPTY'} {name}: {n} rows (no oracle)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

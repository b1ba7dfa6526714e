#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs the oracle SQL in DuckDB over the same testdata
tables, canonicalizes both sides (sort columns by name, sort rows,
round doubles), and reports per-query match/mismatch.

Dev tooling only — not part of the shipped Scala library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        return repr(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = out_dir / name
        try:
            got = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_bad += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_bad += 1
            continue
        g, w = canon(got, got_cols), canon(want, want_cols)
        if g == w:
            n_ok += 1
            print(f"ok   {name} ({len(got)} rows)")
        else:
            n_bad += 1
            diff = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows; first diffs:")
            for i in diff:
                print(f"  spark : {g[i]}")
                print(f"  duckdb: {w[i]}")
            if len(g) != len(w):
                from collections import Counter
                cg, cw = Counter(g), Counter(w)
                only_g = list((cg - cw).keys())[:2]
                only_w = list((cw - cg).keys())[:2]
                print(f"  only-spark: {only_g}\n  only-duck : {only_w}")
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

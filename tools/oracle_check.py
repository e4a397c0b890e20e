#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (test tooling only —
the engine itself is pure Scala/Spark; see Verify.scala).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/*.parquet written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
fixture tables, sorts columns by name and rows by value, and compares
cell-by-cell (exact, with a float near-miss report to debug divergence
before the driver sees it)."""
import json
import math
import sys
import glob

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def cmp_cell(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return "eq"
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
            return "near"
        return "diff"
    return "eq" if a == b else "diff"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        gcols = [d[0] for d in con.description]
        gtypes = dict(zip(gcols, (d[1] for d in con.description)))
        try:
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            wtypes = dict(zip(wcols, (d[1] for d in con.description)))
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) == sorted(wcols) and gtypes != wtypes:
            diffs = {c: (gtypes[c], wtypes[c]) for c in gtypes
                     if gtypes[c] != wtypes[c]}
            print(f"WARN {name}: type mismatch {diffs}")
        gc, gr = canon(got, gcols)
        wc, wr = canon(want, wcols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
            continue
        bad = near = 0
        first = None
        for rg, rw in zip(gr, wr):
            for cg, cw in zip(rg, rw):
                s = cmp_cell(cg, cw)
                if s == "near":
                    near += 1
                    first = first or (cg, cw)
                elif s == "diff":
                    bad += 1
                    first = first or (cg, cw)
        if bad or near:
            print(f"FAIL {name}: {bad} diff / {near} near cells; "
                  f"first: {first}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (test tooling only —
the engine itself is pure Scala/Spark; see Verify.scala).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--lax]

Reads each <verifyOutDir>/<name>/*.parquet written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
fixture tables, and compares TWO ways:

1. Value compare (the r1/r2 check): sort columns by name, sort rows,
   compare cell-by-cell via Python values (fetchall).
2. Dtype/bit compare (added r3): fetch BOTH sides through the pandas
   path (what a hash-based driver sees) and fail on any dtype-KIND
   mismatch (int vs float vs object) or bit-level float difference.
   This is the check that catches DuckDB HUGEINT/DOUBLE outputs
   (sum(INTEGER) → HUGEINT → float64/object in pandas) against
   Spark's int64 — the exact class behind r2's 13 driver-only
   failures, invisible to the value compare because 123 == 123.0.

On failure prints per-column diff counts so a driver-side failure
localizes itself. --lax skips check 2 (r2 behavior).
"""
import json
import math
import sys
import glob

import duckdb
import numpy as np
import pandas as pd


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


def dtype_kind(dt):
    """Collapse a pandas dtype to the kind a value-hash is sensitive to."""
    k = dt.kind  # i/u int, f float, O object, M datetime, b bool
    return {"u": "i"}.get(k, k)


def frame_compare(name, got_df, want_df):
    """Driver-strict compare: dtype kinds + bit-exact values, sorted rows.
    Returns list of problem strings (empty = clean)."""
    problems = []
    gcols, wcols = sorted(got_df.columns), sorted(want_df.columns)
    if gcols != wcols:
        return [f"columns {gcols} != {wcols}"]
    got_df = got_df[gcols]
    want_df = want_df[gcols]
    # Parquet DATE loads as object-of-date while DuckDB DATE fetches as
    # datetime64; the driver normalizes these (r2 evidence: date-output
    # queries hash-matched). When exactly one side is datetime64 and the
    # other holds date objects, collapse the datetime side to dates.
    def to_dates(s):
        return pd.Series([None if pd.isna(x) else x.date() for x in s],
                         dtype=object)
    import datetime as _dt
    for c in gcols:
        g_s, w_s = got_df[c], want_df[c]
        gk, wk = g_s.dtype.kind, w_s.dtype.kind
        def holds_dates(s):
            nn = s.dropna()
            return len(nn) > 0 and all(
                type(x) is _dt.date for x in nn.head(50))
        if gk == "M" and wk == "O" and holds_dates(w_s):
            got_df = got_df.assign(**{c: to_dates(g_s)})
        elif wk == "M" and gk == "O" and holds_dates(g_s):
            want_df = want_df.assign(**{c: to_dates(w_s)})
    for c in gcols:
        gk, wk = dtype_kind(got_df[c].dtype), dtype_kind(want_df[c].dtype)
        if gk != wk:
            problems.append(
                f"col {c}: dtype kind {got_df[c].dtype}(spark) != "
                f"{want_df[c].dtype}(oracle) — a hash-based gate fails here")
    if problems:
        return problems
    if len(got_df) != len(want_df):
        return [f"rows {len(got_df)} != {len(want_df)}"]
    # canonical row order: stringify every cell, sort
    def order(df):
        key = df.astype(str).apply(tuple, axis=1)
        return df.iloc[np.argsort(key, kind="stable")].reset_index(drop=True)
    g, w = order(got_df), order(want_df)
    for c in gcols:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f":
            a = gv.to_numpy().view(np.int64)
            b = wv.to_numpy().astype(np.float64).view(np.int64)
            bad = int((a != b).sum())
            if bad:
                i = int(np.nonzero(a != b)[0][0])
                problems.append(
                    f"col {c}: {bad} bit-diff floats; first "
                    f"{gv.iloc[i]!r} vs {wv.iloc[i]!r}")
        else:
            neq = (g[c].astype(str) != w[c].astype(str))
            bad = int(neq.sum())
            if bad:
                i = int(np.nonzero(neq.to_numpy())[0][0])
                problems.append(
                    f"col {c}: {bad} diff cells; first "
                    f"{gv.iloc[i]!r} vs {wv.iloc[i]!r}")
    return problems


def main(sf_dir, out_dir, lax=False):
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
        try:
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
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
            continue
        if not lax:
            got_df = pd.read_parquet(files[0]) if len(files) == 1 else \
                pd.concat([pd.read_parquet(f) for f in files])
            want_df = con.execute(sql).fetchdf()
            problems = frame_compare(name, got_df, want_df)
            if problems:
                print(f"FAIL {name} [strict]: " + "; ".join(problems))
                n_fail += 1
                continue
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    lax = "--lax" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(args[0], args[1], lax))

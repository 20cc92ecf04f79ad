#!/usr/bin/env python3
"""Dev-only differential harness (mirrors the driver's t2 gate).

Runs DuckDB on each oracle_sql.json entry against the same parquet
tables and compares with the Spark result parquet written by
graft.Verify. Columns are sorted by name (driver semantics), rows are
compared exactly after a stable sort. NOT part of the shipped library —
pure local tooling (the library itself is Scala-only).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir (scale-probe corpora)
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            results[name] = False
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            exp = con.execute(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            results[name] = False
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            results[name] = False
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            results[name] = False
            continue
        g = got.reset_index(drop=True)
        e = exp.reset_index(drop=True)
        # The driver's hash is TYPE-SENSITIVE: DuckDB HUGEINT (pandas
        # object/float) vs Spark BIGINT (int64) hash-mismatches even
        # with equal values (r4: q83/q85/q90/q104). So an integer-kind
        # dtype divergence is a FAIL here, not something to coerce away.
        mism = []
        dtype_mism = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            g_int = str(gv.dtype).startswith(("int", "uint", "Int"))
            e_int = str(ev.dtype).startswith(("int", "uint", "Int"))
            # Width differences (int32 vs int64) hash-match at the
            # driver (r4: q13/q31/etc. all green); only a KIND
            # divergence — integer vs object/float, i.e. DuckDB
            # HUGEINT that pandas can't hold in int64 — breaks it.
            if g_int != e_int:
                dtype_mism.append(f"{c}: spark={gv.dtype} duckdb={ev.dtype}")
            try:
                if g_int or e_int:
                    eq = gv.astype("int64").equals(ev.astype("int64"))
                elif gv.dtype == object or ev.dtype == object:
                    eq = gv.astype(str).equals(ev.astype(str))
                elif str(gv.dtype).startswith("float"):
                    eq = gv.astype("float64").equals(ev.astype("float64"))
                else:
                    eq = gv.equals(ev)
            except Exception:  # noqa: BLE001
                eq = False
            if not eq:
                mism.append(c)
        if dtype_mism:
            print(f"FAIL {name}: dtype mismatch (driver hash would differ): "
                  + "; ".join(dtype_mism))
            n_fail += 1
            results[name] = False
            continue
        if mism:
            print(f"FAIL {name}: value mismatch in {mism}")
            for c in mism[:2]:
                diff = (g[c] != e[c])
                try:
                    idx = diff[diff].index[:3]
                    for i in idx:
                        print(f"   row {i}: spark={g[c][i]!r} duckdb={e[c][i]!r}")
                except Exception:  # noqa: BLE001
                    pass
            n_fail += 1
            results[name] = False
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
            results[name] = True
    # Machine-readable summary (same shape the round artifacts use) so
    # tools/update_coverage_header.py can derive counts from a local run
    # when the newest CORRECTNESS_r*.json predates the code under test.
    with open(f"{out_dir}/oracle_check.json", "w") as f:
        json.dump({name: {"pass": ok} for name, ok in sorted(results.items())},
                  f, indent=1)
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

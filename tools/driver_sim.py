#!/usr/bin/env python
"""Vanilla-session driver simulation — the strictest correctness check.

The external harness imports ``__spark_entry__`` with its OWN SparkSession
(no custom confs — so Spark 4's ANSI mode is ON), from an arbitrary cwd,
with no PYTHONPATH for executor workers. This simulator reproduces that
environment exactly and exact-value-compares every query against its
DuckDB oracle. Round 5 it caught 8 failures tools/check_correctness.py
(which uses the repo's tuned session) could not see: 7 worker
ModuleNotFoundErrors and one ANSI DIVIDE_BY_ZERO.

Usage: python tools/driver_sim.py [--sf DIR] [--first N] [query ...]
(run it from any cwd; it does NOT import the repo session helpers)
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=None, help="only the first N registry entries (50 = the driver window)")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as E  # noqa: E402 — exactly what the driver imports

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # VANILLA
    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    names = args.queries or list(qs)[: args.first] if (args.queries or args.first) else list(qs)
    fails = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark: {str(e)[:200]}", flush=True)
            fails.append(name)
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb: {str(e)[:200]}", flush=True)
            fails.append(name)
            continue
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sn = sorted([tuple(_norm(r[i]) for i in so) for r in srows], key=repr)
        dn = sorted([tuple(_norm(r[i]) for i in do) for r in drows], key=repr)
        if sorted(scols) != sorted(dcols) or sn != dn:
            print(f"FAIL {name}: mismatch ({len(sn)} vs {len(dn)} rows)", flush=True)
            fails.append(name)
        else:
            print(f"PASS {name} ({len(sn)} rows, {time.time() - t0:.1f}s)", flush=True)
    print(f"\n{len(names) - len(fails)}/{len(names)} passed")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Vanilla-session driver simulation.

Round 8 disproved this file's old "strictest check" claim: its fetchall()
oracle path hid the DuckDB-HUGEINT→pandas-float64 divergence that failed 16
driver rows. The oracle side now goes through .df() (the driver's pandas
conversion) and the compare is repr-based, so dtype drift fails locally.

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
import datetime as _dt
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
    """repr-token per cell (see tools/check_correctness.py): the driver
    hashes a representation, so int 55 vs float 55.0 must FAIL here too —
    fetchall()-era numeric compare was blind to the round-8 HUGEINT miss."""
    if v is None:
        return "NULL"
    if hasattr(v, "item"):  # numpy scalar from the pandas path
        v = v.item()
    if isinstance(v, float):
        # NaN unifies with NULL — the driver hashes Spark's None equal to
        # DuckDB-pandas NaN (events_ab_ztest r7 green evidence)
        return "NULL" if math.isnan(v) else repr(v)
    if isinstance(v, _dt.datetime):  # incl. pandas Timestamp subclass
        # DATE columns: datetime.date from Spark vs midnight datetime64
        # through DuckDB's pandas path — the driver hashes them equal
        # (r08 green evidence), so canonicalize midnight to the date form
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    try:
        import pandas as _pd

        if v is _pd.NaT or v is _pd.NA:
            return "NULL"
    except Exception:  # noqa: BLE001
        pass
    return repr(v)


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
            # toPandas, NOT collect: the driver canonicalizes BOTH sides
            # through pandas, where a nullable BIGINT column becomes
            # float64 on the Spark side too (lag()/as-of NULLs) — a
            # collect()-based Spark side would false-FAIL those rows
            # against the oracle's pandas float64 (r2-green evidence),
            # while still catching one-sided drift like r8's HUGEINT
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
            scols = list(spdf.columns)
            skinds = {c: spdf[c].dtype.kind for c in scols}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark: {str(e)[:200]}", flush=True)
            fails.append(name)
            continue
        try:
            # .df() = the driver's pandas conversion; fetchall() hid the
            # round-8 HUGEINT→float64 divergence (VERDICT r8 order item 1b)
            ddf = con.execute(oracles[name]).df()
            dcols = list(ddf.columns)
            drows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
            dkinds = {c: ddf[c].dtype.kind for c in dcols}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb: {str(e)[:200]}", flush=True)
            fails.append(name)
            continue
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sn = sorted([tuple(_norm(r[i]) for i in so) for r in srows])
        dn = sorted([tuple(_norm(r[i]) for i in do) for r in drows])
        # int-vs-float dtype drift fails even on empty results (r8 item 6)
        kind_drift = [
            c for c in set(skinds) & set(dkinds)
            if {skinds[c], dkinds[c]} <= {"i", "u", "f"}
            and (skinds[c] == "f") != (dkinds[c] == "f")
        ]
        if sorted(scols) != sorted(dcols) or sn != dn or kind_drift:
            why = f"dtype drift {kind_drift}" if kind_drift else "mismatch"
            print(f"FAIL {name}: {why} ({len(sn)} vs {len(dn)} rows)", flush=True)
            fails.append(name)
        else:
            print(f"PASS {name} ({len(sn)} rows, {time.time() - t0:.1f}s)", flush=True)
    print(f"\n{len(names) - len(fails)}/{len(names)} passed")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Local oracle checker: run every registered query on Spark AND its oracle
SQL on DuckDB, compare row count, column names, and (order-insensitively)
exact values. Stricter than the driver's hash compare — if this passes, the
driver's hash compare passes.

Usage: python tools/check_correctness.py [--sf SF_DIR] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from spark_etl_framework_spark.catalog import TABLES  # noqa: E402
from spark_etl_framework_spark.queries import ORACLES, QUERIES  # noqa: E402
from spark_etl_framework_spark.session import get_session  # noqa: E402


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_session("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.queries or sorted(QUERIES)
    failures = []
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"SKIP {name}: no oracle ({len(s_rows)} spark rows, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(ORACLES[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sn = _normalize(s_rows, s_cols)
            dn = _normalize(d_rows, d_cols)
            if sn != dn:
                # locate first mismatching row for diagnostics
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sn, dn)) if a != b), None
                )
                detail = f"first diff at sorted row {diff}:\n  spark={sn[diff]}\n  duck ={dn[diff]}" if diff is not None else "row sets differ"
                problems.append(f"values differ; {detail}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

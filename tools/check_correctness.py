#!/usr/bin/env python
"""Local oracle checker: run every registered query on Spark AND its oracle
SQL on DuckDB, compare row count, column names, and (order-insensitively)
exact values.

DuckDB results are fetched via ``.df()`` — the driver's pandas conversion
path — NOT ``fetchall()``. Round 8 proved the difference matters: DuckDB
HUGEINT comes back as a plain Python int through ``fetchall()`` but as
float64 through pandas, so a ``fetchall()``-based compare was structurally
blind to the exact dtype divergence that failed 16 driver rows
(CORRECTNESS_r08). Values are compared on their repr (``55`` vs ``55.0``
is a FAIL), mirroring the driver's representation hash.

Usage: python tools/check_correctness.py [--sf SF_DIR] [query ...]
"""

from __future__ import annotations

import argparse
import datetime as _dt
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
    """Canonical repr token per cell. repr-based so int 55 and float 55.0
    DIVERGE — the driver hashes a representation, not numeric equality,
    and the round-8 HUGEINT miss was exactly a representation divergence
    numeric == would have blessed."""
    if v is None:
        return "NULL"
    if hasattr(v, "item"):  # numpy scalar from the pandas path
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            # same token as None: a double NULL survives Spark's pandas
            # conversion as None (object column) but DuckDB's as NaN —
            # the driver hashes them EQUAL (events_ab_ztest green in r7
            # with a NULL/NaN cell), so the checker must too
            return "NULL"
        return repr(v)
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, _dt.datetime):  # incl. pandas Timestamp subclass
        # a DATE column reads as datetime.date from Spark but as a
        # midnight datetime64 through DuckDB's pandas path — the driver
        # hashes them equal (kafka_avro_logical_roundtrip green in r08),
        # so midnight naive timestamps canonicalize to the date form
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    try:  # pandas NaT / NA sentinels
        import pandas as _pd

        if v is _pd.NaT or v is _pd.NA:
            return "NULL"
    except Exception:  # noqa: BLE001
        pass
    return repr(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out)


def duck_rows(cur):
    """Fetch a DuckDB cursor through pandas — the driver's conversion —
    so dtype artifacts (HUGEINT→float64, NULL int→NaN) are visible."""
    df = cur.df()
    cols = list(df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return rows, cols, {c: df[c].dtype.kind for c in cols}


def numeric_kind_drift(s_kinds: dict, d_kinds: dict) -> list[str]:
    """Columns where one side is integer-typed and the other float-typed
    (pandas dtype kinds). The value-repr compare catches this whenever
    rows exist ('55' vs '55.0'); this catches it on EMPTY results too —
    an intentionally mistyped oracle must fail regardless of row count
    (r8 order item 6). Non-numeric kinds are not compared: dates land as
    'M' vs 'O' between the two engines on legitimately green rows."""
    drift = []
    for c in set(s_kinds) & set(d_kinds):
        a, b = s_kinds[c], d_kinds[c]
        if {a, b} <= {"i", "u", "f"} and (a == "f") != (b == "f"):
            drift.append(f"{c}: spark kind {a!r} vs oracle kind {b!r}")
    return drift


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
            # toPandas, NOT collect — symmetric with the oracle's .df()
            # path: the driver canonicalizes both sides through pandas,
            # so a nullable BIGINT (lag/as-of NULLs) goes float64 on BOTH
            # sides and matches, while one-sided drift (r8's HUGEINT)
            # still fails (see duck_rows)
            spdf = sdf.toPandas()
            s_rows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
            s_cols = list(spdf.columns)
            s_kinds = {c: spdf[c].dtype.kind for c in s_cols}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"SKIP {name}: no oracle ({len(s_rows)} spark rows, {time.time()-t0:.1f}s)")
            continue
        try:
            d_rows, d_cols, d_kinds = duck_rows(con.execute(ORACLES[name]))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        else:
            kind_drift = numeric_kind_drift(s_kinds, d_kinds)
            if kind_drift:
                problems.append(f"numeric dtype drift: {kind_drift}")
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

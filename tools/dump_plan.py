#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to plans/r16/.

Usage: python tools/dump_plan.py <suffix> <query> [query ...]
Writes plans/r16/<query>_<suffix>.txt (suffix = before|after).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from spark_etl_framework_spark.queries import QUERIES  # noqa: E402
from spark_etl_framework_spark.session import get_session  # noqa: E402


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    sf = "/root/testdata/sf0.1"
    spark = get_session("plans")
    out_dir = REPO / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote plans/r16/{name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()

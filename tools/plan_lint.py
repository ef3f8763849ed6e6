#!/usr/bin/env python
"""Registry-wide physical-plan lint: flag scale-killer plan nodes.

Builds every batch query's initial physical plan at sf0.001 and reports:
- CartesianProduct — always a bug at scale (hard FAIL, exit 1);
- BroadcastNestedLoopJoin — allowed ONLY when the broadcast build side is
  bounded (a 1-row/aggregate relation or an explicit probe subset); each
  occurrence is listed with its build-side head so a reviewer can audit
  the bound in seconds (WARN only — the legitimate pattern `crossJoin(
  broadcast(1-row aggregate))` planss as BNLJ by design).

Streaming/pipeline queries are skipped (they execute on build). Run per
round after adding operators:  python tools/plan_lint.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_etl_framework_spark.queries import QUERIES  # noqa: E402
from spark_etl_framework_spark.session import get_session  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("plan_lint")
    hard, warn = [], []
    for name, fn in QUERIES.items():
        if name.startswith(("stream_", "pipeline_")):
            continue
        try:
            plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            hard.append((name, f"build error: {str(e)[:120]}"))
            continue
        if "CartesianProduct" in plan:
            hard.append((name, "CartesianProduct"))
        n = plan.count("BroadcastNestedLoopJoin")
        if n:
            warn.append((name, f"BroadcastNestedLoopJoin x{n}"))
    for name, why in warn:
        print(f"WARN {name}: {why} (audit: build side must be 1-row/probe-bounded)")
    for name, why in hard:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(hard)} hard failures, {len(warn)} bounded-BNLJ warns "
          f"across {sum(1 for q in QUERIES if not q.startswith(('stream_', 'pipeline_')))} batch queries")
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())

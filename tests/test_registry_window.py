"""Registry-window freeze policy (round-8 judge order, item 1).

The driver's correctness harness samples exactly the first 50 registered
queries each round. Rounds 3–7 kept re-opening a "never driver-verified"
set because queries registered AFTER the window was chosen fell outside
it. The policy now: any query that has never appeared green in a
CORRECTNESS_r*.json artifact MUST sit inside the first-50 window, i.e. be
added to ``_PRIORITY`` in the same commit that registers it. This test
enforces that mechanically.
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

from spark_etl_framework_spark import queries
from spark_etl_framework_spark.queries import ORACLES, QUERIES

REPO = Path(__file__).resolve().parent.parent


def _driver_verified_names() -> set[str]:
    seen: set[str] = set()
    for f in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            ):
                seen.add(name)
    return seen


def test_every_never_verified_query_is_inside_the_window():
    verified = _driver_verified_names()
    window = set(list(QUERIES)[:50])
    never = set(QUERIES) - verified
    outside = sorted(never - window)
    assert not outside, (
        "queries registered but never driver-verified AND outside the "
        f"first-50 evidence window (add them to _PRIORITY): {outside}"
    )


def test_priority_names_all_resolve():
    # a typo'd _PRIORITY name silently falls out of _reorder — catch it
    missing = [n for n in queries._PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in the registry: {missing}"


def test_priority_is_the_window():
    # _PRIORITY is exactly the 50-slot window once all names register
    assert len(queries._PRIORITY) == 50
    assert len(set(queries._PRIORITY)) == 50


def test_window_queries_all_have_oracles():
    # window rows without an oracle only get the weak rows-only check —
    # every windowed row this round is oracle-expressible, keep it that way
    window = list(QUERIES)[:50]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"windowed queries without oracle SQL: {missing}"

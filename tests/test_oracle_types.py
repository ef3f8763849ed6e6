"""Oracle output-type lint — the round-8 regression class, made structural.

Round 8 registered 16 oracles whose integer SUM came back as DuckDB
HUGEINT; the driver's hash path converts oracle results through pandas,
where HUGEINT becomes float64 (``55.0`` vs Spark's ``55``), so all 16 rows
hash-mismatched while both local checkers — then fetchall()-based, where
HUGEINT is a plain Python int — stayed green (CORRECTNESS_r08, VERDICT r8
order item 1). Two structural fixes live here:

1. a DESCRIBE lint over every registered oracle: any output column typed
   outside the convention whitelist (notably HUGEINT) fails the suite at
   registration time, before the driver ever sees it;
2. a meta-test that the rewritten checker normalization actually FAILS on
   a representation divergence numeric equality would bless (int 55 vs
   float 55.0) — i.e. the checkers can no longer be blind to this class.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_etl_framework_spark.catalog import TABLES
from spark_etl_framework_spark.queries import ORACLES

#: DuckDB output types the registry convention allows (queries/__init__.py
#: header). Everything here survives the driver's pandas conversion with a
#: representation Spark can reproduce exactly:
#:   BIGINT/INTEGER -> int64/int32, DOUBLE -> float64, VARCHAR -> object,
#:   BOOLEAN -> bool, DATE -> datetime64 date (driver-green in r08 via
#:   kafka_avro_logical_roundtrip.day).
#: Deliberately ABSENT: HUGEINT (pandas float64 — the r8 bug), DECIMAL
#: (pandas object/float depending on width), TIMESTAMP/TIMESTAMPTZ (tz
#: representation differs — convention casts to string), TINYINT/SMALLINT/
#: unsigned (Spark has no unsigned; width drift risk).
ALLOWED_TYPES = {"BIGINT", "BOOLEAN", "DATE", "DOUBLE", "INTEGER", "VARCHAR"}


def test_every_oracle_output_type_is_conventional(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in ORACLES.items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(col, typ) for col, typ, *_ in desc if typ not in ALLOWED_TYPES]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output columns typed outside the convention whitelist "
        f"(HUGEINT et al. render differently through the driver's pandas "
        f"hash path): {offenders}"
    )


def test_describe_lint_catches_hugeint(sf_dir):
    """Meta: the lint's DESCRIBE actually types an un-cast integer SUM as
    HUGEINT on this DuckDB build — if a future DuckDB changes that, the
    whitelist needs re-validation, so fail loudly here."""
    con = duckdb.connect()
    (typ,) = [
        t
        for _, t, *_ in con.execute(
            "DESCRIBE SELECT SUM(CAST(1 AS BIGINT)) AS s"
        ).fetchall()
    ]
    assert typ == "HUGEINT"
    assert typ not in ALLOWED_TYPES


def test_checker_normalization_is_representation_sensitive():
    """Meta: tools/check_correctness.py and tools/driver_sim.py must FAIL
    on int-55 vs float-55.0 — numeric == blesses it, the driver's hash does
    not, and r8's fetchall()-era checkers were blind to exactly this."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import check_correctness as cc
    import driver_sim as ds

    for norm in (cc._norm, ds._norm):
        assert norm(55) != norm(55.0)
        assert norm(55) == norm(55)
        assert norm(55.0) == norm(55.0)
        assert norm(None) == "NULL"
        # NaN unifies with NULL: a double NULL is None through Spark's
        # pandas conversion but NaN through DuckDB's, and the driver
        # hashes them equal (events_ab_ztest r7-green with such a cell)
        assert norm(float("nan")) == "NULL"
        # numpy scalars (the pandas path) collapse to their python value
        import numpy as np

        assert norm(np.int64(55)) == norm(55)
        assert norm(np.float64(55.0)) == norm(55.0)
        assert norm(np.float64(55.0)) != norm(np.int64(55))


def test_checker_duck_rows_goes_through_pandas():
    """Meta: the checker's oracle fetch must surface HUGEINT as float64
    (the driver's conversion), not fetchall()'s Python int — an
    intentionally mistyped oracle must diverge locally."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import check_correctness as cc

    con = duckdb.connect()
    rows, cols, kinds = cc.duck_rows(
        con.execute("SELECT SUM(CAST(55 AS BIGINT)) AS s")
    )
    assert cols == ["s"]
    (v,) = rows[0]
    # HUGEINT through pandas is float64 — and the repr-norm flags it
    assert kinds["s"] == "f"
    assert cc._norm(v) == "55.0"
    assert cc._norm(v) != cc._norm(55)

    rows2, _, kinds2 = cc.duck_rows(
        con.execute("SELECT CAST(SUM(CAST(55 AS BIGINT)) AS BIGINT) AS s")
    )
    assert kinds2["s"] == "i"
    assert cc._norm(rows2[0][0]) == cc._norm(55)

    # the kind-drift detector: int-vs-float fails even with ZERO rows —
    # an intentionally mistyped oracle can't hide behind an empty result
    assert cc.numeric_kind_drift({"s": "i"}, {"s": "f"})
    assert cc.numeric_kind_drift({"s": "f"}, {"s": "i"})
    assert not cc.numeric_kind_drift({"s": "i"}, {"s": "i"})
    assert not cc.numeric_kind_drift({"s": "f"}, {"s": "f"})
    assert not cc.numeric_kind_drift({"s": "i"}, {"s": "u"})
    # non-numeric kinds are not compared (dates: 'M' vs 'O' on green rows)
    assert not cc.numeric_kind_drift({"d": "O"}, {"d": "M"})


@pytest.mark.parametrize(
    "name",
    [
        "delta_write_read_roundtrip",
        "iceberg_merge_upsert",
        "delta_change_data_feed",
    ],
)
def test_r8_red_oracles_now_bigint(sf_dir, name):
    """Spot-pin three of the 16 repaired oracles: the key_sum column must
    DESCRIBE as BIGINT (was HUGEINT via SUM(CAST(x AS BIGINT)) — DuckDB
    types SUM(BIGINT) as HUGEINT, so the cast must wrap the SUM)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    desc = dict(
        (col, typ) for col, typ, *_ in con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    )
    assert desc["key_sum"] == "BIGINT"

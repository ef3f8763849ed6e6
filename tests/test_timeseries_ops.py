"""EWMA operator invariants: recurrence exactness + shuffle-order freedom."""

from __future__ import annotations

import numpy as np
import pandas as pd

from spark_etl_framework_spark.operators.timeseries import ewma


def test_pandas_ewm_is_the_exact_recurrence():
    """The operator's claim: ewm(adjust=False) == explicit double loop,
    bit for bit. If a pandas upgrade ever breaks this, the oracle parity
    breaks with it — fail here first, with a clear message."""
    rng = np.random.default_rng(11)
    x = rng.random(5000) * 1e3
    y = np.empty_like(x)
    y[0] = x[0]
    for i in range(1, len(x)):
        y[i] = y[i - 1] * 0.75 + 0.25 * x[i]
    pe = pd.Series(x).ewm(alpha=0.25, adjust=False).mean().to_numpy()
    assert np.array_equal(y, pe)


def test_ewma_operator_per_key_recurrence(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 2, 20.0),
        ("a", 3, 30.0),
        ("b", 1, 8.0),
    ]
    df = spark.createDataFrame(rows, ["k", "i", "x"])
    out = {(r["k"], r["i"]): r["ewma"] for r in ewma(df, "k", ["i"], "x").collect()}
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == 10.0 * 0.75 + 0.25 * 20.0
    assert out[("a", 3)] == out[("a", 2)] * 0.75 + 0.25 * 30.0
    assert out[("b", 1)] == 8.0


def test_ewma_input_order_irrelevant(spark):
    """Rows arrive in arbitrary partition order; the operator's own sort
    (order_cols) must make the result deterministic."""
    fwd = spark.createDataFrame(
        [("a", i, float(i * 7 % 13)) for i in range(1, 40)], ["k", "i", "x"]
    )
    rev = spark.createDataFrame(
        [("a", i, float(i * 7 % 13)) for i in range(39, 0, -1)], ["k", "i", "x"]
    ).repartition(8)
    a = {r["i"]: r["ewma"] for r in ewma(fwd, "k", ["i"], "x").collect()}
    b = {r["i"]: r["ewma"] for r in ewma(rev, "k", ["i"], "x").collect()}
    assert a == b


def test_ewma_carry_across_arrow_batches(spark):
    """Force a key's rows to span many Arrow batches: the carry-seeding
    path must continue the recurrence exactly (bit-equal to a single
    in-memory loop)."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        n = 500
        xs = [float((i * 17) % 101) for i in range(n)]
        df = spark.createDataFrame(
            [("k", i, x) for i, x in enumerate(xs)], ["u", "i", "x"]
        )
        got = {
            r["i"]: r["ewma"]
            for r in ewma(df, "u", ["i"], "x").collect()
        }
        y = None
        for i, x in enumerate(xs):
            y = x if y is None else y * 0.75 + 0.25 * x
            assert got[i] == y, f"diverged at row {i}"
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting handles most runtime skew, but aggregations with a
few enormous keys (the power-law reality of user/event data at 100 TB) still
bottleneck on the single reducer that owns the hot key. Salted two-phase
aggregation splits each key into ``n_salts`` sub-keys for the first
(expensive) shuffle, then combines the partials in a second, tiny shuffle.
Results are identical to the direct aggregation — only the shuffle layout
changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: re-combinators for phase 2 per supported aggregate
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (agg_fn, input_col) with agg_fn in
    sum/count/min/max (the self-decomposable aggregates; avg = sum/count on
    the caller side). Phase 1 groups by (keys..., salt) — the hot key's rows
    spread over ``n_salts`` reducers; phase 2 groups by keys alone over
    ≤ n_salts × |keys| rows.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    phase1_aggs = []
    for out, (fn, col) in aggs.items():
        if fn not in _COMBINE:
            raise ValueError(f"salted_agg: unsupported aggregate {fn!r}")
        expr = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        phase1_aggs.append(expr.alias(f"__p_{out}"))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = [
        _COMBINE[fn](f"__p_{out}").alias(out) for out, (fn, _col) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe join: salt the big side's key, replicate the small side
    across all salt values, join on (key, salt). Use when one hot key would
    otherwise land an entire shuffle partition on one executor and AQE's
    skew splitting is unavailable (e.g. bucketed tables)."""
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")

"""Sequential time-series features: per-key recurrences (EWMA).

An exponentially-weighted moving average is inherently sequential per
key (y_i = (1-α)·y_{i-1} + α·x_i, y_1 = x_1), so there is no shuffle-free
closed form that stays numerically stable at depth (the 0.75^{-j}
re-weighting trick overflows past ~10³ rows). The Spark shape here is
ONE repartition on the key + sortWithinPartitions + ``mapInPandas``:
each Arrow batch computes ALL its keys' recurrences in a single
vectorized ``groupby(...).ewm(adjust=False)`` call (bit-identical to an
explicit double loop — pinned by test), with an O(#keys-per-partition)
carry dict seeding keys whose rows span batch boundaries. Constant
per-batch Python overhead — measured ~5× faster than the
one-``applyInPandas``-call-per-key form on many-small-groups data
(3.5 s → 0.65 s steady-state, 100k events / 2k users, sf0.1), and the
carry dict is one float per key per partition.

Reproducibility note: α=0.25 (and any k/2^m) is exact in binary, so
(1-α) is too, and the per-row fused expression matches any engine
evaluating acc·(1-α)+α·x in order — the DuckDB oracle reproduces it
bit-for-bit via ``list_reduce``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.25,
    out_col: str = "ewma",
) -> DataFrame:
    """Append ``out_col`` = per-``key_col`` EWMA of ``value_col`` in
    ``order_cols`` order. One shuffle (repartition by key), in-partition
    sort, then a single vectorized pandas scan per Arrow batch."""
    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])

    def _scan(batches):
        carry: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            firsts = pdf.drop_duplicates(subset=[key_col], keep="first")
            seed = firsts[firsts[key_col].isin(carry)].copy()
            if len(seed):
                # a dtype-faithful template row per carried key, with the
                # carry value in value_col: prepending it makes ewm()
                # continue the recurrence exactly (y depends only on the
                # previous output); the seed rows are dropped after.
                seed[value_col] = seed[key_col].map(carry)
                work = pd.concat([seed, pdf], ignore_index=True)
            else:
                work = pdf.reset_index(drop=True)
            ew = (
                work.groupby(key_col, sort=False)[value_col]
                .ewm(alpha=alpha, adjust=False)
                .mean()
                .reset_index(level=0, drop=True)
                .sort_index()
            )
            work[out_col] = ew
            carry.update(work.groupby(key_col, sort=False)[out_col].last().to_dict())
            yield work.iloc[len(seed):]

    ordered = df.repartition(key_col).sortWithinPartitions(key_col, *order_cols)
    return ordered.mapInPandas(_scan, schema)

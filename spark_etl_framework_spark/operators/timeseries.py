"""Sequential time-series features: per-key recurrences (EWMA).

An exponentially-weighted moving average is inherently sequential per
key (y_i = (1-α)·y_{i-1} + α·x_i, y_1 = x_1), so there is no shuffle-free
closed form that stays numerically stable at depth (the 0.75^{-j}
re-weighting trick overflows past ~10³ rows). The right Spark shape is
``applyInPandas``: ONE shuffle on the key, then a C-speed linear scan per
group (pandas ``ewm(adjust=False)`` computes exactly the recurrence —
bit-identical to an explicit double loop, verified in tests). Per-key
state is O(1); per-key memory is the group itself, the same bound every
keyed aggregation already carries.

Reproducibility note: α=0.25 (and any k/2^m) is exact in binary, so
(1-α) is too, and the per-row fused expression matches any engine
evaluating acc·(1-α)+α·x in order — the DuckDB oracle reproduces it
bit-for-bit via ``list_reduce``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
    ``order_cols`` order. One shuffle (the groupBy), linear scan per key."""
    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(key_col).applyInPandas(_fn, schema)

"""Driver-local tiny relations, built as ONE Arrow batch.

Every lakehouse read in this engine attaches a driver-small broadcast
relation (the per-file partition/sequence map, DV descriptor lists,
changelog coordinate specs). The stock ``spark.createDataFrame(rows,
schema)`` path pickles row-by-row through py4j and costs ~0.3-0.4 s per
call on local[32] regardless of size; the pandas/Arrow path ships the
same rows as one Arrow batch in ~0.07-0.10 s (guide §6 "Arrow for
driver transfers"). Values are identical — None, Decimal, datetime,
date, bytes, and list cells included (pinned by
tests/test_localrel.py) — because the columns are built dtype=object
(no pandas numeric inference, so no int→float NaN round-trip) and the
explicit schema drives the Arrow conversion.

In a session without Arrow enabled (the driver's vanilla session),
``createDataFrame(pandas_df)`` transparently falls back to its row
path — slower, still exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_relation(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for TUPLE rows, via one
    Arrow batch. ``schema`` may be a StructType or a DDL string; rows
    must be positional sequences matching it."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover - pandas ships with pyspark
        return spark.createDataFrame(rows, schema)
    rows = rows if isinstance(rows, list) else list(rows)
    pdf = pd.DataFrame(
        {
            f.name: pd.Series([r[i] for r in rows], dtype=object)
            for i, f in enumerate(schema.fields)
        },
        columns=[f.name for f in schema.fields],
    )
    return spark.createDataFrame(pdf, schema=schema)

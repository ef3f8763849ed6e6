"""Query registry — the engine's headline query surface.

Every operator family from SURVEY.md §2 gets at least one registered query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible)
an equivalent ANSI-SQL oracle string that DuckDB can run over the same parquet
tables. The driver compares the two (row count + schema + order-insensitive
value hash), so every computed column is aliased identically on both sides and
timestamps are emitted as strings to sidestep tz-representation differences.

Conventions (applied on BOTH sides so hashes line up):
- aggregate doubles rounded (``round(x, 2)`` money, ``round(x, 6)`` ratios)
- DuckDB ``sum(<int>)`` returns HUGEINT → oracle casts to BIGINT explicitly
- ``year()``/``month()`` cast to INT on both sides
- timestamps cast to string (both engines render ``yyyy-MM-dd HH:mm:ss``)
- every LIMIT/top-k has a total deterministic ORDER BY (unique key tiebreak)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from . import relational  # noqa: F401
    from . import relational2  # noqa: F401
    from . import windows  # noqa: F401
    from . import timeseries  # noqa: F401
    from . import textops  # noqa: F401
    from . import dedup  # noqa: F401
    from . import vector  # noqa: F401
    from . import pipelines  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import advanced  # noqa: F401
    from . import fileformats  # noqa: F401


_load_all()

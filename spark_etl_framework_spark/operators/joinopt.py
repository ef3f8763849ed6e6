"""Join-optimization operators: Bloom-style semi-join pre-filtering.

At 100 TB the dominant join cost is shuffling fact rows that will never
match: a selective dimension predicate (``p_brand = 'Brand#23'``) keeps a
few thousand keys, but every lineitem row still crosses the wire before the
join discovers the miss. Spark 3.3+ injects a runtime row-level Bloom
filter for exactly this case (``spark.sql.optimizer.runtime.bloomFilter.
enabled``); this module is the *explicit, deterministic* form of that
rewrite, usable when the optimizer declines (DSv2 sources, non-equi
residuals, disabled AQE) and testable as a plan shape.

Design — no driver collect, no UDF, bounded broadcast:

- The filter is represented as a RELATION of occupied bit positions, not a
  bitmap: ``distinct(hash_i(key) mod m)`` for ``k`` independent seeds.
  Its size is ≤ m rows of one integer **regardless of dimension
  cardinality** — broadcastable by construction even when the dimension
  side itself is too big to broadcast as rows.
- Membership = "all k probe positions occupied" → k successive broadcast
  LEFT SEMI joins on the fact side. Each is a map-side probe of a shared
  hash relation; the fact table never shuffles for the pre-filter.
- False positives are harmless: the exact join runs afterwards and the
  result is row-identical to the un-filtered join (the oracle is the plain
  join). False negatives are impossible: every dimension key sets its own
  positions.

Hashes are ``xxhash64(key, seed)`` — plan-time constants, so the filter is
reproducible run to run and engine to engine.

Reference context: the reference delegates all join planning to its SQL
engine (etl/transform/SqlTransformer.scala); pre-filtering is this port's
scale extension (SURVEY.md §7 North-star), same family as salting
(operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_positions(
    dim: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 2
) -> DataFrame:
    """Occupied-position relation of a Bloom filter over ``dim[key]``.

    One row per distinct ``hash_i(key) mod m`` value across the ``k``
    seeds — at most ``m_bits`` rows total (single int column ``__pos``),
    independent of ``|dim|``. The distinct is a shuffle of ≤ m ints.
    """
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(m_bits))
            for seed in range(k)
        ]
    )
    return (
        dim.select(F.explode(probes).alias("__pos"))
        .distinct()
        .hint("broadcast")
    )


def bloom_prefilter(
    fact: DataFrame,
    positions: DataFrame,
    key: str,
    m_bits: int = 1 << 16,
    k: int = 2,
) -> DataFrame:
    """Drop fact rows whose key cannot be in the filter.

    ``k`` broadcast LEFT SEMI joins, one per seed — a row survives only if
    every probe position is occupied. Map-side only: the fact relation is
    never shuffled or sorted here.
    """
    out = fact
    for seed in range(k):
        probe = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(m_bits))
        out = out.join(
            positions, on=probe == positions["__pos"], how="left_semi"
        )
    return out


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 2,
) -> DataFrame:
    """Exact inner join, Bloom-pre-filtered on the fact side.

    Row-identical to ``fact.join(dim, fact_key == dim_key)`` — the Bloom
    stage only removes rows the join would drop anyway. The dimension side
    is scanned twice (positions + join); at scale both scans are pruned to
    the dimension predicate's columns, and the second is the one the plain
    join needed anyway.
    """
    key_match = F.col(fact_key) == dim[dim_key]
    pos = bloom_positions(dim, dim_key, m_bits=m_bits, k=k)
    lean = bloom_prefilter(fact, pos, fact_key, m_bits=m_bits, k=k)
    return lean.join(dim, on=key_match, how="inner")

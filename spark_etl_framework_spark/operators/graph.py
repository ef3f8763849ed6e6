"""Graph operators over edge-list relations: degree-normalized PageRank.

Graphs at 100 TB are edge lists, not adjacency structures: PageRank is
power iteration expressed as relational algebra — per iteration, one join
of the (tiny) rank relation onto the (huge) edge relation and one
aggregation by destination. The edge relation is hash-partitioned by
source once and every iteration reuses that partitioning (same join key →
no re-shuffle of edges); only the |V|-row rank relation moves. Fixed
iteration counts keep lineage linear; beyond ~10 rounds, truncate with
``localCheckpoint`` exactly as operators/dedup.py:connected_components
does.

Companion to the other iterative operators (k-means in operators/vector.py,
connected components in operators/dedup.py); the reference delegates graph
work to its SQL engine, so this is the port's scale extension
(SURVEY.md §7 North-star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected view of a directed edge list: both orientations,
    deduplicated. One shuffle (the distinct)."""
    a = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    b = edges.select(F.col(dst).alias("__src"), F.col(src).alias("__dst"))
    return a.unionByName(b).distinct()


def pagerank(
    edges: DataFrame,
    src: str = "__src",
    dst: str = "__dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank by unrolled power iteration over an edge list.

    ``r_{k+1}(v) = (1-d)/n + d * Σ_{u→v} r_k(u)/deg(u)`` with uniform
    start ``1/n``.

    CONTRACT: every destination must also be a source (closed under
    out-edges) — i.e. pass a :func:`symmetrize`-d edge list, or a
    directed graph with no sinks. The iteration keys ranks by
    destination, so on an open directed graph (a DAG, a single edge
    a→b) mass reaching a sink cannot propagate and the result degrades
    toward empty — that input needs the dangling-mass correction this
    operator deliberately omits (symmetrized graphs, the intended use,
    never have dangling nodes). The vertex count is carried as a
    broadcast 1-row relation, not a driver-side ``count()`` — no
    action, no collect. Returns ``(node, rank)``.
    """
    # NOT persisted, deliberately: the edge relation feeds deg + every
    # round's contribution join, so its upstream lineage re-executes per
    # round — but an A/B at sf0.1 measured .persist() ~1.7x SLOWER
    # (6.7-9.8 s vs 3.8-4.7 s for 3 rounds): the cache barrier breaks
    # whole-stage codegen fusion and pays serialization, which costs
    # more than recomputing a narrow join. When the edge derivation is
    # genuinely expensive (multi-join, corpus-scale), materialize it to
    # parquet once and pass the scan in — a columnar scan per round is
    # the scale answer, not executor cache.
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    tot = deg.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    ranks = (
        deg.select("__src")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__src").alias("node"),
            (F.lit(1.0) / F.col("__n")).alias("rank"),
            "__n",
        )
    )
    for _ in range(iters):
        # Join strategy pinned to SHUFFLE_HASH (guide §3.1): the planner
        # otherwise sort-merge-joins, which sorts the HUGE edge relation
        # once per iteration (and per join) even though it is already
        # hash-partitioned by __src. A shuffled hash join builds its
        # per-partition map from the hinted |V|-row deg/rank side and
        # STREAMS the edges unsorted — measured A/B at sf0.1: 6 SMJ /
        # 9 Sort → 6 SHJ / 0 Sort, ~15-20% faster warm, identical
        # values. Scale-safe: the build side is one row per vertex
        # (unique keys, no hot key) and AQE bounds partition sizes, so
        # each per-partition map is |V|/P rows — the same quantity the
        # rank shuffle already moves per round.
        contrib = (
            e.join(deg.hint("shuffle_hash"), "__src")
            .join(
                ranks.select(
                    F.col("node").alias("__src"), "rank", "__n"
                ).hint("shuffle_hash"),
                "__src",
            )
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
                "__n",
            )
        )
        ranks = (
            contrib.groupBy("node", "__n")
            .agg(F.sum("__c").alias("__s"))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping) * F.col("__s")
                ).alias("rank"),
                "__n",
            )
        )
    return ranks.select("node", "rank")

"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast of the (small)
probe set against the full corpus — one narrow pass over the big side, one
shuffle for the per-probe top-k. The scale path (IVF-style partition pruning)
keeps the same interface and only changes which candidates are scored.

Dot products use ``F.zip_with`` + ``F.aggregate`` in DOUBLE — JVM-codegen
column expressions, no Python on the scoring path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbours of each probe vector.

    Returns (probe_id, vec_id, cosine, rn). The probe side is broadcast
    (probes ≪ corpus); scoring is a single narrow pass over the corpus; the
    only shuffle is the per-probe top-k window, keyed by probe_id. Ranking
    uses the ROUNDED similarity (6 dp) with an id tiebreak so results are
    bit-deterministic across engines and partitionings.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("_pv")
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            id_col,
            F.round(
                _dot(F.col("_pv"), F.col("_cv")) / (_norm(F.col("_pv")) * _norm(F.col("_cv"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= k
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid, one row per (label, dim): the groundwork for
    IVF-style ANN (assign → probe nearest centroids only). posexplode +
    groupBy(label, dim) aggregates with map-side combine; never collects a
    vector to the driver."""
    return (
        df.select(label_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"))
        .groupBy(label_col, "dim")
        .agg(F.round(F.avg("x"), 6).alias("centroid"), F.count(F.lit(1)).alias("n_vecs"))
        .select(label_col, F.col("dim").cast("int").alias("dim"), "centroid", "n_vecs")
    )

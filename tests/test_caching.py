"""Scoped-persist lifecycle: intra-query caches must not outlive the query.

The round-4 ADVICE flagged ``pq_codes(with_model=True)`` leaking its
persisted centroid relation; the audit found the same pattern (persist,
rely on ContextCleaner + driver GC) in the dedup/corpus query family. The
fix routes every intra-query persist through ``caching.scoped_persist``
and has the query registry release the previous query's caches when the
next query is invoked — these tests pin that contract with the JVM's
persistent-RDD registry, not with mocks.
"""

from __future__ import annotations

from spark_etl_framework_spark.caching import _SCOPED, release_scoped, scoped_persist
from spark_etl_framework_spark.queries import QUERIES


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_release_scoped_unpersists(spark):
    base = _n_persistent(spark)
    df = scoped_persist(spark.range(100))
    df.count()
    assert _n_persistent(spark) == base + 1
    assert release_scoped() == 1
    assert _n_persistent(spark) == base
    assert not _SCOPED


def test_query_invocation_releases_previous_caches(spark, sf_dir):
    """Running a persist-heavy query then ANY other registered query must
    free the first query's blocks: a full-registry sweep's storage
    footprint stays bounded by one query's working set."""
    release_scoped()
    base = _n_persistent(spark)
    # dedup_containment_pairs scope-persists cand + hsh
    QUERIES["dedup_containment_pairs"](spark, sf_dir).count()
    assert _n_persistent(spark) > base, "expected scoped persists while live"
    # next query invocation (any query) releases them at entry
    QUERIES["q6_forecast_revenue"](spark, sf_dir).count()
    assert _n_persistent(spark) == base
    assert not _SCOPED


def test_pq_codes_model_centroids_released_within_two_queries(spark, sf_dir):
    """The round-4 ADVICE finding: vector_pq_ann_adc trains with
    with_model=True (persisted centroids + checkpointed Lloyd state).
    Checkpointed RDDs release one generation LATE (truncated lineage
    can't recompute — round-6 ADVICE), so residue must be gone after TWO
    subsequent query boundaries, and storage in a sweep stays bounded by
    two queries' (small) checkpoint state plus one query's persists."""
    release_scoped()
    release_scoped()
    base = _n_persistent(spark)
    QUERIES["vector_pq_ann_adc"](spark, sf_dir).count()
    QUERIES["q6_forecast_revenue"](spark, sf_dir).count()
    QUERIES["q6_forecast_revenue"](spark, sf_dir).count()
    assert _n_persistent(spark) == base


def test_iterative_checkpoints_released_within_two_queries(spark, sf_dir):
    """The iterative operators' per-round localCheckpoints (BPE state,
    PQ centroids, pagerank edges, connected-components labels) register
    cached RDDs in the JVM; the scoped mechanism must release them within
    two query boundaries (one late — deferred-generation contract)."""
    release_scoped()
    release_scoped()
    base = _n_persistent(spark)
    for q in ("text_bpe_train_merges", "graph_pagerank_bipartite", "dedup_clusters"):
        QUERIES[q](spark, sf_dir).count()
    QUERIES["q6_forecast_revenue"](spark, sf_dir).count()
    QUERIES["q6_forecast_revenue"](spark, sf_dir).count()
    assert _n_persistent(spark) == base


def test_checkpointed_plan_survives_one_interleaved_query(spark, sf_dir):
    """The round-6 ADVICE scenario: build an iterative query's DataFrame
    (checkpoint-backed, truncated lineage), invoke ANOTHER registered
    query, and only then collect the first. With immediate release this
    died with 'checkpoint block not found'; the deferred generation makes
    it safe — the collect must succeed and match a fresh run's count."""
    release_scoped()
    release_scoped()
    df = QUERIES["text_bpe_train_merges"](spark, sf_dir)
    QUERIES["q6_forecast_revenue"](spark, sf_dir).count()
    assert df.count() > 0

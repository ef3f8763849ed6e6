"""Steady-state index actors (operators/indexing.py): config validation,
build-then-probe roundtrips, and the bucketed-layout contract.

The end-to-end YAML pipeline forms are oracle-checked by
pipeline_lsh_index_probe / pipeline_ann_index_probe; these tests exercise
the actor surface directly — error paths and artifact shapes the pipeline
happy path cannot reach.
"""

from __future__ import annotations

import uuid

import pytest

from spark_etl_framework_spark.operators.indexing import (
    AnnIndexBuilder,
    AnnIndexProbe,
    LshIndexBuilder,
    LshIndexProbe,
)
from spark_etl_framework_spark.plans.context import JobContext, PipelineContext


def _jctx(spark):
    return JobContext(PipelineContext(), spark)


def test_lsh_actors_roundtrip_bucketed_tables(spark, tmp_path):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "one two three four five six seven"),
        (10, "alpha beta gamma delta epsilon zeta"),
        (20, "nothing like the others at all here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    df.filter("doc_id % 10 != 0").createOrReplaceTempView("lix_corpus")
    df.filter("doc_id % 10 = 0").createOrReplaceTempView("lix_inc")
    prefix = f"lix_{uuid.uuid4().hex[:8]}"

    b = LshIndexBuilder(
        view="lix_corpus", path=str(tmp_path / "idx"), tablePrefix=prefix,
        numBuckets="4",
    )
    summary = b.run(_jctx(spark), spark).collect()[0]
    assert summary["num_buckets"] == 4
    # the external tables exist and carry the bucket spec (the
    # exchange-free-probe layout)
    for part, key in (("buckets", "band_key"), ("shingles", "old_id")):
        t = f"{prefix}_{part}"
        assert spark.catalog.tableExists(t)
        ddl = spark.sql(f"SHOW CREATE TABLE {t}").collect()[0][0]
        assert "CLUSTERED BY" in ddl and key in ddl, ddl

    p = LshIndexProbe(view="lix_inc", tablePrefix=prefix, threshold="0.5")
    rows = {r["doc_id"]: r for r in p.run(_jctx(spark), spark).collect()}
    assert set(rows) == {10, 20}
    assert rows[10]["is_dup"] and rows[10]["best_old_id"] in (1, 2)
    assert not rows[20]["is_dup"] and rows[20]["best_old_id"] is None


def test_lsh_actor_validation_errors(spark, tmp_path):
    with pytest.raises(ValueError, match="view required"):
        LshIndexBuilder(path=str(tmp_path)).run(_jctx(spark), spark)
    with pytest.raises(ValueError, match="path required"):
        LshIndexBuilder(view="x").run(_jctx(spark), spark)
    with pytest.raises(ValueError, match="not found"):
        LshIndexProbe(view="x", tablePrefix="never_built").run(_jctx(spark), spark)


def test_ann_actors_roundtrip_and_modes(spark, tmp_path):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)], i % 3) for i in range(40)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).createOrReplaceTempView("aix_emb")
    spark.sql(
        "select vec_id as probe_id, embedding as pe from aix_emb where vec_id < 2"
    ).createOrReplaceTempView("aix_probes")

    b = AnnIndexBuilder(
        view="aix_emb", path=str(tmp_path / "ann"), m="4", sub="4", k="2",
        iters="1",
    )
    summary = b.run(_jctx(spark), spark).collect()[0]
    assert summary["codes_path"].endswith("/codes")
    codes = spark.read.parquet(str(tmp_path / "ann" / "codes"))
    assert set(codes.columns) == {"vec_id", "subspace", "code", "label"}
    assert codes.count() == 40 * 4  # one code per (vector, subspace)

    ivf = AnnIndexProbe(
        view="aix_probes", path=str(tmp_path / "ann"), mode="ivf", m="4",
        sub="4", nprobe="1", topK="3",
    ).run(_jctx(spark), spark)
    adc = AnnIndexProbe(
        view="aix_probes", path=str(tmp_path / "ann"), mode="adc", m="4",
        sub="4", topK="3",
    ).run(_jctx(spark), spark)
    ivf_rows = ivf.collect()
    adc_rows = adc.collect()
    assert {r["probe_id"] for r in ivf_rows} == {0, 1}
    assert all(1 <= r["rn"] <= 3 for r in ivf_rows)
    # exhaustive ADC scores a superset of the routed candidates: for any
    # probe, its best ADC distance is <= its best IVF distance
    best = lambda rows, p: min(
        r["adc_dist"] for r in rows if r["probe_id"] == p
    )
    for p in (0, 1):
        assert best(adc_rows, p) <= best(ivf_rows, p) + 1e-9


def test_ann_actor_validation_errors(spark, tmp_path):
    with pytest.raises(ValueError, match="view required"):
        AnnIndexBuilder(path=str(tmp_path)).run(_jctx(spark), spark)
    with pytest.raises(ValueError, match="path required"):
        AnnIndexProbe(view="x").run(_jctx(spark), spark)
    with pytest.raises(ValueError, match="mode must be"):
        AnnIndexProbe(view="x", path=str(tmp_path), mode="flat").run(
            _jctx(spark), spark
        )


def test_registry_resolves_index_actor_aliases():
    from spark_etl_framework_spark.plans.registry import resolve_actor

    assert resolve_actor("lsh-index-builder") is LshIndexBuilder
    assert resolve_actor("lsh-index-probe") is LshIndexProbe
    assert resolve_actor("ann-index-builder") is AnnIndexBuilder
    assert resolve_actor("ann-index-probe") is AnnIndexProbe


def test_ann_builder_releases_training_persists(spark, tmp_path):
    """pq_codes(with_model=True) scope-persists its centroid relation;
    the actor runs OUTSIDE the query registry, so it must release that
    training state itself (caching.scoped_region) instead of leaking it
    until the next registered-query invocation — while leaving any
    enclosing scope's entries alone."""
    from spark_etl_framework_spark.caching import _SCOPED, release_scoped

    release_scoped()
    release_scoped()
    outer = spark.range(10).persist()
    _SCOPED.append(outer)
    outer.count()
    jsc = spark.sparkContext._jsc
    base = jsc.sc().getPersistentRDDs().size()
    spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), float(i % 3), 1.0], i % 2) for i in range(40)],
        "vec_id long, embedding array<double>, label int",
    ).createOrReplaceTempView("aix_leak_emb")
    AnnIndexBuilder(
        view="aix_leak_emb", path=str(tmp_path / "ann_leak"), m="4", sub="4",
    ).run(_jctx(spark), spark)
    assert jsc.sc().getPersistentRDDs().size() == base, "actor leaked scoped blocks"
    assert _SCOPED == [outer], "actor disturbed the enclosing scope"
    assert release_scoped() == 1

"""ContainmentDedupTransformer policy + pipeline wiring tests."""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.operators.curation import (
    ContainmentDedupTransformer,
    containment_drop_ids,
)

_WORDS = " ".join(f"w{i}" for i in range(12))
_OTHER = "completely different tokens here nothing shared at all among these"


def test_one_sided_containment_drops_contained_keeps_container(spark):
    """Doc 1 is fully embedded in doc 2 (ca=1.0) while doc 2 keeps extra
    content (cb=10/14 < 0.8): the CONTAINED doc drops even though it has
    the smaller id — the branch symmetric keep-min-id dedup gets wrong."""
    big = _WORDS + " x1 x2 x3 x4"
    df = spark.createDataFrame(
        [(1, _WORDS), (2, big), (3, _OTHER)], ["doc_id", "text"]
    )
    drops = containment_drop_ids(df, threshold=0.8)
    assert sorted(r["drop_id"] for r in drops.collect()) == [1]


def test_mutual_containment_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(4, _WORDS), (5, _WORDS), (3, _OTHER)], ["doc_id", "text"]
    )
    drops = containment_drop_ids(df, threshold=0.8)
    assert sorted(r["drop_id"] for r in drops.collect()) == [5]


def test_actor_filters_view_and_validates_config(spark):
    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext

    big = _WORDS + " x1 x2 x3 x4"
    spark.createDataFrame(
        [(1, _WORDS), (2, big), (3, _OTHER)], ["doc_id", "text"]
    ).createOrReplaceTempView("cda_docs")
    jctx = JobContext(PipelineContext(), spark)
    actor = ContainmentDedupTransformer(threshold="0.8")
    actor.view = "cda_docs"
    out = actor.run(jctx, spark)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]

    with pytest.raises(ValueError, match="view required"):
        ContainmentDedupTransformer().run(jctx, spark)
    bad = ContainmentDedupTransformer(threshold="1.5")
    bad.view = "cda_docs"
    with pytest.raises(ValueError, match="threshold"):
        bad.run(jctx, spark)


def test_registry_resolves_alias():
    from spark_etl_framework_spark.plans.registry import resolve_actor

    assert resolve_actor("containment-dedup-transformer") is ContainmentDedupTransformer


def test_pii_scrub_actor_drop_mode(spark):
    from spark_etl_framework_spark.operators.curation import PiiScrubTransformer
    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext

    df = spark.createDataFrame(
        [(1, "clean doc"), (2, "mail me a@b.io")], ["doc_id", "text"]
    )
    df.createOrReplaceTempView("pii_drop_in")
    jctx = JobContext(PipelineContext(), spark)
    actor = PiiScrubTransformer(view="pii_drop_in", mode="drop")
    rows = actor.run(jctx, spark).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_pii"] == 0


def test_pii_scrub_actor_redact_default_and_bad_mode(spark):
    from spark_etl_framework_spark.operators.curation import PiiScrubTransformer
    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext

    jctx = JobContext(PipelineContext(), spark)
    spark.createDataFrame(
        [(2, "mail me a@b.io")], ["doc_id", "text"]
    ).createOrReplaceTempView("pii_redact_in")
    out = PiiScrubTransformer(view="pii_redact_in").run(jctx, spark).collect()[0]
    assert out["text"] == "mail me <EMAIL>" and out["n_pii"] == 1

    with pytest.raises(ValueError, match="redact"):
        PiiScrubTransformer(view="pii_redact_in", mode="nuke").run(jctx, spark)
    with pytest.raises(ValueError, match="view required"):
        PiiScrubTransformer().run(jctx, spark)


def test_scd2_actor_validates_and_merges(spark):
    from spark_etl_framework_spark.operators.curation import Scd2MergeTransformer
    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext

    jctx = JobContext(PipelineContext(), spark)
    spark.createDataFrame(
        [(1, "A", "2024-01-01", None, True)],
        "k int, seg string, eff_from string, eff_to string, is_current boolean",
    ).createOrReplaceTempView("scd2_hist")
    spark.createDataFrame([(1, "B")], ["k", "seg"]).createOrReplaceTempView(
        "scd2_upd"
    )
    actor = Scd2MergeTransformer(
        historyView="scd2_hist",
        updatesView="scd2_upd",
        keyField="k",
        attrs="seg",
        effDate="2024-06-01",
    )
    rows = sorted(
        (r["seg"], r["eff_to"], r["is_current"])
        for r in actor.run(jctx, spark).collect()
    )
    assert rows == [("A", "2024-06-01", False), ("B", None, True)]

    with pytest.raises(ValueError, match="missing"):
        Scd2MergeTransformer(historyView="scd2_hist").run(jctx, spark)

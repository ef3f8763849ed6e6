"""Warehouse-maintenance operators: SCD2 / CDC / profiling invariants.

Oracle parity runs in tools/check_correctness.py; these pin the semantics
on adversarial micro-frames (nulls, no-op updates, already-closed history).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_framework_spark.operators import etl as E


def _scd2_fixture(spark):
    history = spark.createDataFrame(
        [
            # already-closed version must pass through untouched
            (1, "SEG_A", 10.0, "2023-01-01", "2024-01-01", False),
            (1, "SEG_B", 10.0, "2024-01-01", None, True),
            (2, "SEG_A", 20.0, "2024-01-01", None, True),
            (3, "SEG_C", 30.0, "2024-01-01", None, True),
            (4, None, 40.0, "2024-01-01", None, True),
        ],
        ["k", "seg", "bal", "eff_from", "eff_to", "is_current"],
    )
    updates = spark.createDataFrame(
        [
            (1, "SEG_Z", 10.0),  # changed seg -> close + open
            (2, "SEG_A", 20.0),  # identical -> no-op
            (4, None, 40.0),  # null attr identical (null-safe) -> no-op
            (9, "SEG_N", 90.0),  # brand-new key
        ],
        ["k", "seg", "bal"],
    )
    return history, updates


def test_scd2_merge_semantics(spark):
    history, updates = _scd2_fixture(spark)
    out = E.scd2_merge(history, updates, "k", ["seg", "bal"], "2024-06-01")
    rows = sorted(
        ((r["k"], r["seg"], r["eff_from"], r["eff_to"], r["is_current"]) for r in out.collect()),
    )
    assert rows == sorted(
        [
            (1, "SEG_A", "2023-01-01", "2024-01-01", False),  # passthrough
            (1, "SEG_B", "2024-01-01", "2024-06-01", False),  # closed
            (1, "SEG_Z", "2024-06-01", None, True),  # reopened
            (2, "SEG_A", "2024-01-01", None, True),  # no-op
            (3, "SEG_C", "2024-01-01", None, True),  # untouched (not in updates)
            (4, None, "2024-01-01", None, True),  # null-safe no-op
            (9, "SEG_N", "2024-06-01", None, True),  # new key
        ]
    )


def test_scd2_merge_one_current_row_per_key(spark):
    history, updates = _scd2_fixture(spark)
    out = E.scd2_merge(history, updates, "k", ["seg", "bal"], "2024-06-01")
    per_key = (
        out.filter("is_current").groupBy("k").count().filter("count > 1").count()
    )
    assert per_key == 0
    # every closed row has eff_to set; every current row has eff_to null
    assert out.filter("is_current AND eff_to IS NOT NULL").count() == 0
    assert out.filter("NOT is_current AND eff_to IS NULL").count() == 0


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 2.0), (3, "C", 3.0), (5, None, 5.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(2, "B", 2.0), (3, "C", 9.0), (4, "D", 4.0), (5, None, 5.0)],
        ["k", "s", "v"],
    )
    out = {r["k"]: r for r in E.snapshot_diff(old, new, "k", ["s", "v"]).collect()}
    assert set(out) == {1, 3, 4}  # 2 and 5 (null-safe) unchanged -> dropped
    assert out[1]["change_type"] == "delete" and out[1]["new_s"] is None
    assert out[3]["change_type"] == "update" and (out[3]["old_v"], out[3]["new_v"]) == (3.0, 9.0)
    assert out[4]["change_type"] == "insert" and out[4]["old_s"] is None


def test_profile_columns_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (4, None)], ["a", "b"]
    )
    prof = {r["column_name"]: r for r in E.profile_columns(df, ["a", "b"]).collect()}
    assert prof["a"]["n_nonnull"] == 4 and prof["a"]["null_ratio"] == 0.0
    assert prof["a"]["n_distinct"] == 3
    assert prof["a"]["min_str"] == "1" and prof["a"]["max_str"] == "4"
    assert prof["b"]["n_nonnull"] == 2 and prof["b"]["null_ratio"] == 0.5
    assert prof["b"]["n_distinct"] == 2


def test_profile_columns_hostile_names(spark):
    df = spark.createDataFrame([(1, "x")], ["order key", "weird'na`me"])
    prof = {r["column_name"]: r for r in E.profile_columns(df, ["order key", "weird'na`me"]).collect()}
    assert prof["order key"]["n_distinct"] == 1
    assert prof["weird'na`me"]["min_str"] == "x"


def test_snapshot_diff_rejects_empty_cols(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    try:
        E.snapshot_diff(df, df, "k", [])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "at least one column" in str(e)


def test_zorder_interleave_known_bits(spark):
    """Morton key ground truth: (cx=0b11, cy=0b01) interleaves to
    0b1011 = 11; full-range corners map to the extremes; and the Python
    SQL mirror evaluates identically via Spark's own SQL engine."""
    from spark_etl_framework_spark.operators import etl as E
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(3, 1), (0, 0), (255, 255), (255, 0), (0, 255)], ["cx", "cy"]
    )
    out = df.select(
        "cx", "cy",
        E.zorder_interleave(F.col("cx"), F.col("cy")).alias("z"),
        F.expr(E.zorder_interleave_sql()).alias("z_sql"),
    ).collect()
    got = {(r["cx"], r["cy"]): (r["z"], r["z_sql"]) for r in out}
    assert got[(3, 1)] == (11, 11)
    assert got[(0, 0)] == (0, 0)
    assert got[(255, 255)] == (65535, 65535)
    assert got[(255, 0)][0] == sum(1 << (2 * b + 1) for b in range(8))  # odd bits
    assert got[(0, 255)][0] == sum(1 << (2 * b) for b in range(8))      # even bits
    assert all(z == zs for z, zs in got.values())


def test_zorder_buckets_are_axis_rectangles(spark):
    """The layout property itself: with 16 buckets (top 4 Morton bits =
    2 bits per dimension), every bucket's cx and cy extents each span at
    most 1/4 of the 256-wide domain — file footers cover a small
    rectangle in BOTH dimensions."""
    from spark_etl_framework_spark.operators import etl as E
    from pyspark.sql import functions as F

    grid = spark.range(0, 256 * 256).select(
        (F.col("id") % 256).cast("int").alias("cx"),
        (F.col("id") / 256).cast("int").alias("cy"),
    )
    stats = (
        grid.select(E.zorder_interleave(F.col("cx"), F.col("cy")).alias("z"), "cx", "cy")
        .groupBy(F.shiftright("z", 12).alias("bucket"))
        .agg(
            F.max("cx") - F.min("cx"), F.max("cy") - F.min("cy"),
            F.count(F.lit(1)),
        )
        .collect()
    )
    assert len(stats) == 16
    for _, dx, dy, n in stats:
        assert dx <= 63 and dy <= 63 and n == 4096


def test_asof_enrich_picks_version_valid_at_fact_time(spark):
    """Temporal correctness: facts before the change see v1, facts on/after
    see v2, facts before any validity window survive the LEFT join with
    NULL attributes, and row count is preserved (≤1 version matches)."""
    from spark_etl_framework_spark.operators import etl as E

    hist = spark.createDataFrame(
        [
            (1, "v1", "2024-01-01", "2024-06-01", False),
            (1, "v2", "2024-06-01", None, True),
            (2, "only", "2024-03-01", None, True),
        ],
        ["k", "val", "eff_from", "eff_to", "is_current"],
    )
    facts = spark.createDataFrame(
        [(1, "2024-05-31"), (1, "2024-06-01"), (2, "2024-02-28"), (3, "2024-07-01")],
        ["k", "ts"],
    )
    out = E.asof_enrich(facts, hist, "k", "ts").collect()
    assert len(out) == 4
    got = {(r["k"], r["ts"]): r["val"] for r in out}
    assert got[(1, "2024-05-31")] == "v1"
    assert got[(1, "2024-06-01")] == "v2"
    assert got[(2, "2024-02-28")] is None  # before key 2's first version
    assert got[(3, "2024-07-01")] is None  # key never in history


def test_incremental_agg_merge_disjoint_and_overlapping_keys(spark):
    """Merging must be exact when a key exists only in the stored
    partials, only in the delta, or in both."""
    from pyspark.sql import functions as F

    from spark_etl_framework_spark.operators.etl import (
        incremental_agg_merge,
        partial_agg,
    )

    base_rows = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], ["k", "v"]
    )
    delta = spark.createDataFrame([("b", 7.0), ("c", 9.0)], ["k", "v"])
    aggs = {
        "n": ("count", None),
        "total": ("sum", F.col("v")),
        "mx": ("max", F.col("v")),
    }
    stored = partial_agg(base_rows, ["k"], aggs)
    got = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in incremental_agg_merge(stored, delta, ["k"], aggs).collect()
    }
    assert got == {"a": (2, 3.0, 2.0), "b": (2, 12.0, 7.0), "c": (1, 9.0, 9.0)}


def test_compaction_plan_multi_file(spark, tmp_path):
    """The planner over a genuinely multi-file table (the layout the
    oracle's one-file-per-table testdata can't exercise): 4 part files,
    target sized so the big file opens its own group and the small ones
    pack together; and a file LARGER than the target still gets exactly
    one group of its own."""
    from pyspark.sql import functions as F

    from spark_etl_framework_spark.operators.etl import (
        compaction_plan,
        file_row_counts,
    )

    p = str(tmp_path / "t")
    spark.range(1000).repartition(4).write.mode("overwrite").parquet(p)
    files = file_row_counts(spark.read.parquet(p))
    rows = files.collect()
    assert len(rows) == 4 and sum(r.n_rows for r in rows) == 1000

    plan = {r.file_name: r.compact_group for r in
            compaction_plan(files, target_rows=300).collect()}
    # NFD order: 4 files of 250 rows each (range splits evenly) — cum
    # 250/500/750/1000 → groups floor((cum-250)/300) = 0,0,1,2
    assert sorted(plan.values()) == [0, 0, 1, 2], plan

    import pytest as _pt

    with _pt.raises(ValueError):
        compaction_plan(files, target_rows=0)


def test_tablelog_versioning_and_merge(spark, tmp_path):
    """Versioned-table layer: commit log resolves snapshots, old versions
    are immutable under copy-on-write merges, concurrent duplicate
    commits are rejected, and a missing version fails loudly."""
    import pytest as _pt

    from spark_etl_framework_spark.operators import tablelog as TL

    base = str(tmp_path / "t")
    assert TL.latest_version(base) == -1
    with _pt.raises(FileNotFoundError):
        TL.read_version(spark, base)

    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    assert TL.write_version(df0, base) == 0
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k bigint, v string")
    assert TL.merge_upsert(spark, base, upd, "k") == 1

    v0 = {(r.k, r.v) for r in TL.read_version(spark, base, 0).collect()}
    v1 = {(r.k, r.v) for r in TL.read_version(spark, base, 1).collect()}
    assert v0 == {(1, "a"), (2, "b")}          # time travel: untouched
    assert v1 == {(1, "a"), (2, "B"), (3, "c")}  # replace + insert
    assert TL.latest_version(base) == 1

    with _pt.raises(FileNotFoundError, match="version 9"):
        TL.read_version(spark, base, 9)
    # duplicate version commit rejected (the conditional-put contract)
    with _pt.raises(RuntimeError, match="concurrent commit"):
        TL._commit(base, 1, [], "write")


def test_tablelog_vacuum_retention(spark, tmp_path):
    """vacuum(retain_last): expired versions' files and log entries are
    gone (time travel fails with version-not-found, not a parquet read
    error), retained snapshots are byte-intact, the next commit keeps
    numbering monotonic, and vacuum is idempotent."""
    import os

    import pytest as _pt

    from spark_etl_framework_spark.operators import tablelog as TL

    base = str(tmp_path / "t")
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    TL.write_version(df0, base)
    TL.merge_upsert(
        spark, base, spark.createDataFrame([(2, "B")], "k bigint, v string"), "k"
    )
    TL.merge_upsert(
        spark, base, spark.createDataFrame([(3, "c")], "k bigint, v string"), "k"
    )
    assert TL.latest_version(base) == 2

    expired, removed = TL.vacuum(base, retain_last=2)
    assert expired == 1 and removed >= 1
    # v0 is GONE — loudly, as a missing version
    with _pt.raises(FileNotFoundError, match="version 0"):
        TL.read_version(spark, base, 0)
    # retained snapshots intact
    v1 = {(r.k, r.v) for r in TL.read_version(spark, base, 1).collect()}
    v2 = {(r.k, r.v) for r in TL.read_version(spark, base, 2).collect()}
    assert v1 == {(1, "a"), (2, "B")}
    assert v2 == {(1, "a"), (2, "B"), (3, "c")}
    # v0's snapshot dir fully swept
    assert not any(n.startswith("v000000000000_") for n in os.listdir(base))
    # idempotent
    assert TL.vacuum(base, retain_last=2) == (0, 0)
    # numbering stays monotonic after vacuum
    assert (
        TL.merge_upsert(
            spark, base, spark.createDataFrame([(4, "d")], "k bigint, v string"), "k"
        )
        == 3
    )
    # a no-op / empty-table vacuum and the argument guard
    assert TL.vacuum(str(tmp_path / "missing")) == (0, 0)
    with _pt.raises(ValueError, match="retain_last"):
        TL.vacuum(base, retain_last=0)

"""Round-12 feature interplay — the session-2 subsystems composed
against each other, plus the sort-orders metadata surface.

Each test crosses two features whose interaction has a real failure
mode: a clone whose OPTIMIZE stages under the wrong root would corrupt
the source; a UniForm mirror that chokes on dataChange=false commits
would strand the iceberg view; a changelog that mis-reads compacted
history would emit phantom changes; stats registered before maintenance
must keep serving afterwards.
"""

from __future__ import annotations

import os

import pytest

from spark_etl_framework_spark.sources import deltalog as dl
from spark_etl_framework_spark.sources import iceberg as ice


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def test_optimize_on_shallow_clone_stays_in_clone(spark, loc, tmp_path):
    for i in range(4):
        dl.write_delta(
            spark.createDataFrame([(i, float(i))], "id int, v double").coalesce(1),
            loc, mode="append",
        )
    dst = str(tmp_path / "clone")
    dl.shallow_clone(spark, loc, dst)
    res = dl.optimize_compact(spark, dst)
    assert res is not None and res["filesRemoved"] == 4
    # the compacted file landed under the CLONE root; source untouched
    clone_files = dl.snapshot(dst).files
    assert all(not os.path.isabs(f.path) for f in clone_files)
    assert len(dl.snapshot(loc).files) == 4
    assert dl.read_delta(spark, dst).count() == 4
    assert dl.read_delta(spark, loc).count() == 4


def test_uniform_mirrors_optimize_commit(spark, loc):
    for i in range(3):
        dl.write_delta(
            spark.createDataFrame([(i, f"s{i}")], "id int, s string").coalesce(1),
            loc, mode="append",
        )
    dl.enable_uniform(loc)
    dl.optimize_compact(spark, loc)  # dataChange=false adds + removes
    # the iceberg mirror must show the POST-optimize file set
    delta_files = {os.path.join(loc, f.path) for f in dl.snapshot(loc).files}
    meta = ice.load_metadata(loc)
    data, _dels = ice._scan_snapshot(meta, ice._pick_snapshot(meta))
    assert {f["file_path"] for f in data} == delta_files
    got = sorted(r.id for r in ice.read_iceberg(spark, loc).collect())
    assert got == [0, 1, 2]


def test_log_compaction_covers_optimize_commit(spark, loc):
    for i in range(4):
        dl.write_delta(
            spark.createDataFrame([(i, float(i))], "id int, v double").coalesce(1),
            loc, mode="append",
        )
    dl.optimize_compact(spark, loc)  # v4: dataChange=false rewrite
    dl.write_delta(
        spark.createDataFrame([(9, 9.0)], "id int, v double"), loc, mode="append"
    )  # v5
    want = sorted(r.id for r in dl.read_delta(spark, loc).collect())
    dl.write_log_compaction(loc, 1, 4)
    for v in range(1, 5):
        os.unlink(dl._commit_path(loc, v))
    assert sorted(r.id for r in dl.read_delta(spark, loc).collect()) == want
    assert len(dl.snapshot(loc).files) == 2  # optimized file + v5 append


def test_changelog_silent_on_delete_file_compaction(spark, loc):
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(8)], "id int, s string"
    )
    ice.write_iceberg(df.coalesce(1), loc, mode="append")
    ice.delete_where(spark, loc, "id = 1")
    ice.delete_where(spark, loc, "id = 5")
    n = len(ice.read_iceberg_changelog(spark, loc).collect())
    ice.rewrite_position_delete_files(spark, loc)  # replace snapshot
    assert len(ice.read_iceberg_changelog(spark, loc).collect()) == n


def test_puffin_stats_survive_maintenance(spark, loc):
    df = spark.createDataFrame(
        [(i, f"k{i % 4}") for i in range(40)], "id int, k string"
    )
    ice.write_iceberg(df.coalesce(1), loc, mode="append")
    ice.analyze_table(spark, loc)
    ndv = ice.table_ndv(loc)
    ice.delete_where(spark, loc, "id < 5")
    ice.rewrite_data_files(spark, loc)  # fold: replace snapshot
    # the newest registered stats still serve (ancestor fallback)
    assert ice.table_ndv(loc) == ndv


def test_drop_feature_then_clone_carries_downgraded_protocol(spark, loc, tmp_path):
    dl.write_delta(
        spark.createDataFrame([(1, 1.0)], "id int, v double"), loc, mode="append"
    )
    dl.enable_row_tracking(spark, loc)
    dl.drop_feature(spark, loc, "rowTracking")
    dst = str(tmp_path / "clone")
    dl.shallow_clone(spark, loc, dst)
    proto = dl.snapshot(dst).protocol
    assert "rowTracking" not in (proto.get("writerFeatures") or [])
    assert dl.read_delta(spark, dst).count() == 1


# ---------------------------------------------------------------------------
# sort orders metadata
# ---------------------------------------------------------------------------


def test_write_sort_by_registers_sort_order(spark, loc):
    df = spark.createDataFrame(
        [(i % 7, i, float(i)) for i in range(100)], "k int, id int, v double"
    )
    ice.write_iceberg(df.coalesce(2), loc, mode="append", sort_by=["k", "id"])
    meta = ice.load_metadata(loc)
    oid = meta["default-sort-order-id"]
    order = next(o for o in meta["sort-orders"] if o["order-id"] == oid)
    kid = next(f["id"] for f in meta["schema"]["fields"] if f["name"] == "k")
    assert [f["source-id"] for f in order["fields"]][0] == kid
    assert all(
        f["transform"] == "identity" and f["direction"] == "asc"
        for f in order["fields"]
    )
    # re-writing with the SAME order reuses the id (find-or-append)
    ice.write_iceberg(df.coalesce(1), loc, mode="append", sort_by=["k", "id"])
    meta2 = ice.load_metadata(loc)
    assert meta2["default-sort-order-id"] == oid
    assert len(meta2["sort-orders"]) == len(meta["sort-orders"])
    with pytest.raises(ValueError, match="not in df"):
        ice.write_iceberg(df, loc, mode="append", sort_by=["zzz"])


def test_rewrite_sort_strategy_registers_order(spark, loc):
    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(200)], "id int, v double"
    )
    ice.write_iceberg(df.coalesce(1), loc, mode="append")
    assert ice.load_metadata(loc).get("default-sort-order-id", 0) == 0
    ice.rewrite_data_files(spark, loc, strategy="sort", sort_by=["v"])
    meta = ice.load_metadata(loc)
    assert meta["default-sort-order-id"] != 0
    vid = next(f["id"] for f in meta["schema"]["fields"] if f["name"] == "v")
    order = next(
        o for o in meta["sort-orders"]
        if o["order-id"] == meta["default-sort-order-id"]
    )
    assert [f["source-id"] for f in order["fields"]] == [vid]

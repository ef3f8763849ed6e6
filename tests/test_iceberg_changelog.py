"""read_iceberg_changelog — typed row-level CDC between snapshots,
including the row-delta commits the incremental append scan refuses.

Contract: inserts from added files, deletes as full pre-images (position
deletes join back on (file, pos); equality deletes semi-join older
files; overwrites diff the file sets with the parent's deletes applied),
UPDATE = delete+insert pair, compactions (replace) contribute nothing.
"""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.sources import iceberg as ice


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _write(spark, loc, ids, mode="append"):
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in ids], "id int, s string, v double"
    )
    return ice.write_iceberg(df.coalesce(1), loc, mode=mode)


def _changes(spark, loc, **kw):
    return sorted(
        (r._change_ordinal, r._change_type, r.id)
        for r in ice.read_iceberg_changelog(spark, loc, **kw).collect()
    )


def test_changelog_appends_are_inserts(spark, loc):
    s1 = _write(spark, loc, range(3))
    s2 = _write(spark, loc, range(3, 5))
    got = _changes(spark, loc)
    assert got == [(0, "insert", 0), (0, "insert", 1), (0, "insert", 2),
                   (1, "insert", 3), (1, "insert", 4)]
    # range: from s1 (exclusive) -> only the second commit
    got2 = _changes(spark, loc, from_snapshot_id=s1)
    assert [(t, i) for _o, t, i in got2] == [("insert", 3), ("insert", 4)]
    sids = {
        r._commit_snapshot_id
        for r in ice.read_iceberg_changelog(spark, loc).collect()
    }
    assert sids == {s1, s2}


def test_changelog_position_delete_preimages(spark, loc):
    _write(spark, loc, range(6))
    ice.delete_where(spark, loc, "id in (1, 4)")
    got = _changes(spark, loc)
    assert (1, "delete", 1) in got and (1, "delete", 4) in got
    assert sum(1 for _o, t, _i in got if t == "delete") == 2
    # pre-images carry the full row
    rows = {
        r.id: r
        for r in ice.read_iceberg_changelog(spark, loc)
        .filter("_change_type = 'delete'")
        .collect()
    }
    assert rows[1].s == "s1" and rows[4].v == 4.0


def test_changelog_update_is_delete_insert_pair(spark, loc):
    _write(spark, loc, range(4))
    ice.update_where(spark, loc, "id = 2", {"v": "v + 100"})
    last = [c for c in _changes(spark, loc) if c[0] == 1]
    assert (1, "delete", 2) in last and (1, "insert", 2) in last
    post = {
        (r._change_type): r.v
        for r in ice.read_iceberg_changelog(spark, loc)
        .filter("_change_ordinal = 1")
        .collect()
    }
    assert post["delete"] == 2.0 and post["insert"] == 102.0


def test_changelog_skips_compactions(spark, loc):
    _write(spark, loc, range(4))
    ice.delete_where(spark, loc, "id = 0")
    n_before = len(_changes(spark, loc))
    ice.rewrite_data_files(spark, loc)          # replace: folds deletes
    ice.rewrite_data_files(spark, loc, strategy="binpack")
    assert len(_changes(spark, loc)) == n_before, (
        "layout maintenance must contribute no logical changes"
    )


def test_changelog_overwrite_diffs_live_rows(spark, loc):
    _write(spark, loc, range(4))
    ice.delete_where(spark, loc, "id = 3")  # dead BEFORE the overwrite
    _write(spark, loc, range(100, 102), mode="overwrite")
    got = _changes(spark, loc)
    ow = [c for c in got if c[0] == 2]
    # rows 0-2 die (3 already dead -> never re-emitted), 100-101 insert
    assert ow == [(2, "delete", 0), (2, "delete", 1), (2, "delete", 2),
                  (2, "insert", 100), (2, "insert", 101)]


def test_changelog_equality_delete_preimages(spark, loc):
    _write(spark, loc, range(5))
    src = spark.createDataFrame(
        [(2, "patched", 999.0)], "id int, s string, v double"
    )
    ice.merge_upsert(spark, loc, src, ["id"])  # equality delete + insert
    got = _changes(spark, loc)
    last = [c for c in got if c[0] == 1]
    assert (1, "delete", 2) in last and (1, "insert", 2) in last


def test_changelog_refusals(spark, loc):
    _write(spark, loc, range(2))
    with pytest.raises(ValueError, match="not in table"):
        ice.read_iceberg_changelog(spark, loc, from_snapshot_id=42)
    with pytest.raises(ValueError, match="not in table"):
        ice.read_iceberg_changelog(spark, loc, to_snapshot_id=42)


# ---------------------------------------------------------------------------
# streaming readChangeFeed
# ---------------------------------------------------------------------------


def _drain_cdf(spark, loc):
    import uuid as _uuid

    from spark_etl_framework_spark.sources.iceberg import IcebergLogDataSource

    try:
        spark.dataSource.register(IcebergLogDataSource)
    except Exception:  # noqa: BLE001
        pass
    qname = f"ice_cdf_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("iceberglog")
        .option("path", loc)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


def test_streaming_cdf_matches_batch_changelog(spark, loc):
    _write(spark, loc, range(6))
    ice.delete_where(spark, loc, "id in (1, 4)")
    ice.update_where(spark, loc, "id = 2", {"v": "v + 100"})
    ice.rewrite_data_files(spark, loc, strategy="binpack")  # must be silent

    got = sorted(
        (r._change_ordinal, r._change_type, r.id, r.v)
        for r in _drain_cdf(spark, loc).collect()
    )
    want = sorted(
        (r._change_ordinal, r._change_type, r.id, r.v)
        for r in ice.read_iceberg_changelog(spark, loc).collect()
    )
    assert got == want, "stream/batch changelog parity broken"
    assert (1, "delete", 1, 1.0) in got
    assert (2, "insert", 2, 102.0) in got and (2, "delete", 2, 2.0) in got


def test_streaming_cdf_overwrite_and_equality(spark, loc):
    _write(spark, loc, range(4))
    src = spark.createDataFrame(
        [(3, "patched", 999.0)], "id int, s string, v double"
    )
    ice.merge_upsert(spark, loc, src, ["id"])  # equality delete + insert
    _write(spark, loc, [50], mode="overwrite")
    got = sorted(
        (r._change_ordinal, r._change_type, r.id)
        for r in _drain_cdf(spark, loc).collect()
    )
    want = sorted(
        (r._change_ordinal, r._change_type, r.id)
        for r in ice.read_iceberg_changelog(spark, loc).collect()
    )
    assert got == want
    assert (1, "delete", 3) in got and (1, "insert", 3) in got
    assert (2, "insert", 50) in got
    assert sum(1 for o, t, _i in got if o == 2 and t == "delete") == 4


def test_position_delete_manifest_carries_file_path_bounds(spark, loc):
    """Round-15 optimization pin: v2 position-delete manifest entries
    record lower/upper bounds for the reserved file_path field
    (2147483546), and changelog victim discovery resolves the affected
    data files from those bounds alone — zero Spark jobs, no collect.
    The Java reader derives referencedDataFile() from the same bounds."""
    _write(spark, loc, range(6))
    ice.delete_where(spark, loc, "id in (1, 4)")
    meta = ice.load_metadata(loc)
    data, dels = ice._scan_snapshot(meta, ice._pick_snapshot(meta))
    pos = [d for d in dels if int(d.get("content", 0)) == 1]
    assert pos, "fixture must produce a v2 position delete"
    data_paths = {f["file_path"] for f in data}
    for d in pos:
        lower = {e["key"]: e["value"] for e in (d.get("lower_bounds") or [])}
        upper = {e["key"]: e["value"] for e in (d.get("upper_bounds") or [])}
        lo = lower.get(ice._POS_DELETE_PATH_FID)
        hi = upper.get(ice._POS_DELETE_PATH_FID)
        assert lo is not None and hi is not None, "bounds must be recorded"
        lo, hi = bytes(lo).decode(), bytes(hi).decode()
        assert lo <= hi
        # the fixture's single data file is inside the recorded range
        assert any(lo <= p <= hi for p in data_paths)

    # victim discovery must not fall back to the collect job when every
    # delete entry carries bounds
    calls = []
    orig = ice.DataFrame.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    got = None
    try:
        ice.DataFrame.collect = counting
        df = ice.read_iceberg_changelog(spark, loc)
    finally:
        ice.DataFrame.collect = orig
    assert not calls, "bounds present -> no victim-discovery collect"
    got = sorted((r._change_ordinal, r._change_type, r.id)
                 for r in df.collect())
    assert (1, "delete", 1) in got and (1, "delete", 4) in got

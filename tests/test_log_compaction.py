"""Delta log-compaction files — the spec's minor compactions
(``<start>.<end>.compacted.json``): reconciled actions of a commit
range, preferred by the replay when coverage aligns.

Hard-proof strategy (the checkpoint-replay precedent): DELETE the
covered commits after compacting, so reconstruction physically must
come from the compacted file.
"""

from __future__ import annotations

import json
import os

import pytest

from spark_etl_framework_spark.sources import deltalog as dl


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _append(spark, loc, rows):
    df = spark.createDataFrame(rows, "id int, v double")
    return dl.write_delta(df.coalesce(1), loc, mode="append")


def _build(spark, loc):
    """8 commits: appends, a COW delete, an update, more appends."""
    for i in range(4):  # v0-v3
        _append(spark, loc, [(i * 10 + j, float(j)) for j in range(5)])
    dl.delete_where(spark, loc, "id % 10 = 4")          # v4
    dl.update_where(spark, loc, "id = 0", {"v": "99.0"})  # v5
    _append(spark, loc, [(100, 1.0)])                    # v6
    _append(spark, loc, [(101, 2.0)])                    # v7


def test_compaction_replay_equivalence_and_hard_proof(spark, loc):
    _build(spark, loc)
    want = sorted((r.id, r.v) for r in dl.read_delta(spark, loc).collect())
    p = dl.write_log_compaction(loc, 2, 6)
    assert os.path.basename(p) == f"{2:020d}.{6:020d}.compacted.json"
    # equivalence with the commits still present
    assert sorted(
        (r.id, r.v) for r in dl.read_delta(spark, loc).collect()
    ) == want
    # hard proof: delete the covered commits — replay MUST use the file
    for v in range(2, 7):
        os.unlink(dl._commit_path(loc, v))
    got = sorted((r.id, r.v) for r in dl.read_delta(spark, loc).collect())
    assert got == want
    assert (0, 99.0) in got and all(i % 10 != 4 for i, _v in got)
    # intermediate versions inside the gap are gone (documented trade)
    with pytest.raises(Exception):
        dl.read_delta(spark, loc, version_as_of=4).collect()
    # versions at the compaction end (full coverage) still reconstruct
    assert dl.read_delta(spark, loc, version_as_of=6).count() == len(want) - 1


def test_compaction_reconciles_within_range(spark, loc):
    _append(spark, loc, [(1, 1.0)])                  # v0
    _append(spark, loc, [(2, 2.0)])                  # v1
    dl.delete_where(spark, loc, "id = 2")            # v2: v1's file dies
    dl.write_log_compaction(loc, 0, 2)
    acts = [
        json.loads(ln)
        for ln in open(dl._compaction_path(loc, 0, 2), encoding="utf-8")
    ]
    adds = [a for a in acts if "add" in a]
    removes = [a for a in acts if "remove" in a]
    # the add+remove pair within range reconciles to the tombstone only
    assert len(adds) == 1 and len(removes) == 1
    assert any("metaData" in a for a in acts)
    assert any("protocol" in a for a in acts)


def test_compaction_range_validation_and_partial_use(spark, loc):
    _build(spark, loc)
    with pytest.raises(ValueError, match="outside the log"):
        dl.write_log_compaction(loc, 5, 99)
    dl.write_log_compaction(loc, 3, 7)
    # time travel BELOW the compaction never touches it
    assert dl.read_delta(spark, loc, version_as_of=2).count() == 15
    # a compaction ending past the target version is ignored
    assert dl.read_delta(spark, loc, version_as_of=5).count() > 0


def test_compaction_preserves_checkpointed_tables(spark, loc):
    _build(spark, loc)
    dl.write_log_compaction(loc, 0, 3)
    dl._write_checkpoint(loc, 5)
    want = dl.read_delta(spark, loc).count()
    # replay starts past the checkpoint; the compaction is irrelevant
    assert dl.read_delta(spark, loc).count() == want
    # clean_log reclaims the now-stale compacted file
    n = dl.clean_log(loc)
    assert n >= 1
    assert not os.path.exists(dl._compaction_path(loc, 0, 3))
    assert dl.read_delta(spark, loc).count() == want


def test_compaction_keeps_domain_and_txn_state(spark, loc):
    _append(spark, loc, [(1, 1.0)])
    dl.enable_row_tracking(spark, loc)
    _append(spark, loc, [(2, 2.0)])
    want = {
        r.id: r._row_id
        for r in dl.read_delta_with_row_ids(spark, loc).collect()
    }
    # compact everything below the head (version discovery needs at
    # least the newest commit file present)
    end = dl.latest_version(loc) - 1
    dl.write_log_compaction(loc, 0, end)
    for v in range(0, end + 1):
        os.unlink(dl._commit_path(loc, v))
    got = {
        r.id: r._row_id
        for r in dl.read_delta_with_row_ids(spark, loc).collect()
    }
    assert got == want, "row-tracking domain hwm lost in compaction"


def test_auto_compaction_policy(spark, loc):
    _append(spark, loc, [(0, 0.0)])  # v0
    dl.set_table_properties(loc, {"delta.logCompaction.interval": "3"})  # v1
    for i in range(1, 8):  # v2-v8
        _append(spark, loc, [(i, float(i))])
    # windows anchor at version 0 (the checkpoint-interval convention):
    # every (v+1) % 3 == 0 commit closes [v-2, v] — including the window
    # that PREDATES the property (the commit-time config governs)
    ranges = dl._compaction_ranges(loc)
    assert ranges == {0: 2, 3: 5, 6: 8}
    want = sorted(r.id for r in dl.read_delta(spark, loc).collect())
    for v in range(0, 8):  # keep only the head commit + compactions
        os.unlink(dl._commit_path(loc, v))
    assert sorted(r.id for r in dl.read_delta(spark, loc).collect()) == want


def test_auto_compaction_off_by_default(spark, loc):
    for i in range(6):
        _append(spark, loc, [(i, float(i))])
    assert dl._compaction_ranges(loc) == {}


def test_set_properties_and_compactlog_yaml_actor(spark, tmp_path):
    from spark_etl_framework_spark.plans.runner import run_pipeline_file

    loc = tmp_path / "t"
    for i in range(4):
        dl.write_delta(
            spark.createDataFrame([(i, float(i))], "id int, v double"),
            str(loc), mode="append",
        )
    ypath = tmp_path / "lc.yaml"
    ypath.write_text(f"""
version: 1.0.0
jobs:
  - name: main
    actions:
      - name: props
        actor:
          type: delta-dml
          properties:
            op: setProperties
            path: "{loc}"
            set.delta.logCompaction.interval: "4"
            set.custom.owner: "team-data"
      - name: compact
        actor:
          type: delta-dml
          properties:
            op: compactLog
            path: "{loc}"
            startVersion: 0
            endVersion: 3
""")
    run_pipeline_file(spark, str(ypath))
    snap = dl.snapshot(str(loc))
    assert snap.configuration["delta.logCompaction.interval"] == "4"
    assert snap.configuration["custom.owner"] == "team-data"
    assert os.path.exists(dl._compaction_path(str(loc), 0, 3))


# ---------------------------------------------------------------------------
# streaming rate limits (maxVersionsPerTrigger / maxSnapshotsPerTrigger)
# ---------------------------------------------------------------------------


def test_delta_stream_max_versions_per_trigger(spark, tmp_path):
    import uuid as _uuid

    from spark_etl_framework_spark.sources.deltalog import DeltaLogDataSource
    from spark_etl_framework_spark.sources.pysource import register_python_source

    loc = str(tmp_path / "t")
    for i in range(6):
        _append(spark, loc, [(i, float(i))])
    register_python_source(spark, DeltaLogDataSource)
    qname = f"paced_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("deltalog")
        .option("path", loc)
        .option("maxVersionsPerTrigger", "2")
        .load()
        .writeStream.format("memory")
        .queryName(qname)
        .start()  # default trigger: batches keep scheduling
    )
    try:
        # NOTE: the Python DataSourceStreamReader API has no admission
        # control (reportLatestOffset), so processAllAvailable may
        # return between paced batches — the running stream still
        # drains; poll until it catches up (bounded)
        import time as _time

        deadline = _time.time() + 60
        while _time.time() < deadline:
            q.processAllAvailable()
            if spark.table(qname).count() >= 6:
                break
            _time.sleep(0.2)
        batches = [
            p.numInputRows
            for p in (q.recentProgress or [])
            if p.numInputRows > 0
        ]
    finally:
        q.stop()
    # exactly-once union regardless of pacing
    got = sorted(r.id for r in spark.table(qname).collect())
    assert got == list(range(6))
    # pacing split the backlog into multiple bounded batches
    assert len(batches) >= 3, f"expected >=3 paced batches, got {batches}"
    assert all(n <= 2 for n in batches)


def test_iceberg_stream_max_snapshots_per_trigger(spark, tmp_path):
    import uuid as _uuid

    from spark_etl_framework_spark.sources import iceberg as ice
    from spark_etl_framework_spark.sources.iceberg import IcebergLogDataSource

    loc = str(tmp_path / "t")
    for i in range(4):
        ice.write_iceberg(
            spark.createDataFrame([(i,)], "id int").coalesce(1), loc,
            mode="append",
        )
    try:
        spark.dataSource.register(IcebergLogDataSource)
    except Exception:  # noqa: BLE001
        pass
    qname = f"ipaced_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("iceberglog")
        .option("path", loc)
        .option("maxSnapshotsPerTrigger", "1")
        .load()
        .writeStream.format("memory")
        .queryName(qname)
        .start()  # default trigger: batches keep scheduling
    )
    try:
        import time as _time

        deadline = _time.time() + 60
        while _time.time() < deadline:
            q.processAllAvailable()
            if spark.table(qname).count() >= 4:
                break
            _time.sleep(0.2)
        batches = [
            p.numInputRows
            for p in (q.recentProgress or [])
            if p.numInputRows > 0
        ]
    finally:
        q.stop()
    assert sorted(r.id for r in spark.table(qname).collect()) == [0, 1, 2, 3]
    assert len(batches) >= 4 and all(n <= 1 for n in batches)

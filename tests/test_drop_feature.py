"""ALTER TABLE DROP FEATURE — the protocol downgrade half of the
feature lifecycle (deltalog.drop_feature).

Contract under test: state-dependency gates refuse loudly with the
cleanup command; writer-only features drop in one commit; reader
features demand truncate_history (a classic checkpoint at the drop
commit + history below it deleted) so no surviving commit carries
actions a post-drop reader cannot honor; the downgraded protocol stops
demanding the dropped capability.
"""

from __future__ import annotations

import os

import pytest

from spark_etl_framework_spark.sources import deltalog as dl


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _append(spark, loc, rows):
    df = spark.createDataFrame(rows, "id int, v double")
    return dl.write_delta(df.coalesce(1), loc, mode="append")


def test_drop_deletion_vectors_full_lifecycle(spark, loc):
    _append(spark, loc, [(i, float(i)) for i in range(10)])
    dl.delete_where(spark, loc, "id < 3", use_dvs=True)
    proto = dl.snapshot(loc).protocol
    assert "deletionVectors" in (proto.get("readerFeatures") or [])

    # gate 1: DVs still present
    with pytest.raises(ValueError, match="purge_deletion_vectors"):
        dl.drop_feature(spark, loc, "deletionVectors", truncate_history=True)
    dl.purge_deletion_vectors(spark, loc)
    # gate 2: reader feature demands truncation
    with pytest.raises(ValueError, match="truncate_history"):
        dl.drop_feature(spark, loc, "deletionVectors")

    v = dl.drop_feature(spark, loc, "deletionVectors", truncate_history=True)
    snap = dl.snapshot(loc)
    assert "deletionVectors" not in (snap.protocol.get("readerFeatures") or [])
    assert sorted(r.id for r in dl.read_delta(spark, loc).collect()) == list(
        range(3, 10)
    )
    # history below the drop is gone (commits deleted, checkpoint serves)
    assert not os.path.exists(dl._commit_path(loc, 0))
    with pytest.raises(Exception):
        dl.read_delta(spark, loc, version_as_of=0)
    # the checkpoint anchors the drop version itself
    assert dl._read_last_checkpoint(loc) == v


def test_drop_writer_feature_row_tracking(spark, loc):
    _append(spark, loc, [(i, float(i)) for i in range(5)])
    dl.enable_row_tracking(spark, loc)
    assert "rowTracking" in (dl.snapshot(loc).protocol.get("writerFeatures") or [])
    dl.drop_feature(spark, loc, "rowTracking")
    snap = dl.snapshot(loc)
    assert "rowTracking" not in (snap.protocol.get("writerFeatures") or [])
    assert "delta.rowTracking" not in snap.domain_metadata
    assert not any(k.startswith("delta.rowTracking") for k in snap.configuration)
    # data unharmed, history intact (no truncation needed)
    assert dl.read_delta(spark, loc).count() == 5
    assert dl.read_delta(spark, loc, version_as_of=0).count() == 5


def test_drop_check_constraints_gate(spark, loc):
    _append(spark, loc, [(1, 1.0)])
    dl.enable_row_tracking(spark, loc)  # lifts the table to protocol 3/7
    dl.add_check_constraint(spark, loc, "pos", "v >= 0")
    proto = dl.snapshot(loc).protocol
    assert "checkConstraints" in (proto.get("writerFeatures") or [])
    with pytest.raises(ValueError, match="drop them first"):
        dl.drop_feature(spark, loc, "checkConstraints")
    dl.drop_check_constraint(loc, "pos")
    dl.drop_feature(spark, loc, "checkConstraints")
    assert "checkConstraints" not in (
        dl.snapshot(loc).protocol.get("writerFeatures") or []
    )


def test_drop_feature_refusals(spark, loc):
    _append(spark, loc, [(1, 1.0)])
    with pytest.raises(ValueError, match="not in the table protocol"):
        dl.drop_feature(spark, loc, "deletionVectors")
    dl.enable_column_mapping(loc)
    with pytest.raises(ValueError, match="cannot be dropped"):
        dl.drop_feature(spark, loc, "columnMapping")


def test_drop_type_widening_requires_clean_history(spark, loc):
    _append(spark, loc, [(1, 1.0)])
    dl.widen_column_type(loc, "id", "long")
    with pytest.raises(ValueError, match="type-change history"):
        dl.drop_feature(spark, loc, "typeWidening", truncate_history=True)


def test_drop_ict_writer_only(spark, loc):
    _append(spark, loc, [(1, 1.0)])
    dl.enable_in_commit_timestamps(loc)
    _append(spark, loc, [(2, 2.0)])
    dl.drop_feature(spark, loc, "inCommitTimestamp")
    snap = dl.snapshot(loc)
    assert "inCommitTimestamp" not in (
        snap.protocol.get("writerFeatures") or []
    )
    assert "delta.enableInCommitTimestamps" not in snap.configuration
    # appends keep working, un-stamped
    _append(spark, loc, [(3, 3.0)])
    assert dl.read_delta(spark, loc).count() == 3


def test_drop_feature_yaml_actor(spark, tmp_path):
    from spark_etl_framework_spark.plans.runner import run_pipeline_file

    loc = tmp_path / "t"
    df = spark.createDataFrame([(1, 1.0)], "id int, v double")
    dl.write_delta(df, str(loc), mode="overwrite")
    dl.enable_row_tracking(spark, str(loc))
    ypath = tmp_path / "drop.yaml"
    ypath.write_text(f"""
version: 1.0.0
jobs:
  - name: main
    actions:
      - name: drop
        actor:
          type: delta-dml
          properties:
            op: dropFeature
            path: "{loc}"
            feature: rowTracking
""")
    run_pipeline_file(spark, str(ypath))
    assert "rowTracking" not in (
        dl.snapshot(str(loc)).protocol.get("writerFeatures") or []
    )

"""Delta OPTIMIZE (bin-pack / Z-ORDER / clustered re-cluster) and
shallow CLONE — round-12 layout-maintenance surface.

OPTIMIZE is a logically-unchanged rewrite (``dataChange=false``): data
identical before/after, time travel to the pre-optimize version intact,
file count strictly reduced (bin-pack) or stats-clustered (zorder).
Shallow clone is a METADATA-ONLY copy: zero data files move, the clone
reads the source's files by absolute path, and DML on either side never
touches the other.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from spark_etl_framework_spark.sources import deltalog as dl


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _append(spark, loc, rows, **kw):
    df = spark.createDataFrame(rows, "id int, k string, v double")
    return dl.write_delta(df.coalesce(1), loc, mode="append", **kw)


# ---------------------------------------------------------------------------
# bin-packing
# ---------------------------------------------------------------------------


def test_optimize_binpack_compacts_small_files(spark, loc):
    for i in range(6):  # six single-file appends -> six small files
        _append(spark, loc, [(i * 10 + j, f"k{j % 2}", float(j)) for j in range(5)])
    pre = dl.snapshot(loc)
    assert len(pre.files) == 6
    before = dl.read_delta(spark, loc).orderBy("id").collect()

    res = dl.optimize_compact(spark, loc)
    assert res is not None and res["mode"] == "binpack"
    assert res["filesRemoved"] == 6 and res["filesAdded"] < 6

    post = dl.snapshot(loc)
    assert len(post.files) == res["filesAdded"]
    after = dl.read_delta(spark, loc).orderBy("id").collect()
    assert after == before
    # time travel to the pre-optimize version still sees the old layout
    old = dl.read_delta(spark, loc, version_as_of=res["version"] - 1)
    assert old.orderBy("id").collect() == before
    # the rewrite is logically unchanged: dataChange=false on every action
    with open(
        os.path.join(loc, "_delta_log", f"{res['version']:020d}.json"),
        encoding="utf-8",
    ) as fh:
        acts = [json.loads(ln) for ln in fh]
    assert all(
        a["add"]["dataChange"] is False for a in acts if "add" in a
    )
    assert all(
        a["remove"]["dataChange"] is False for a in acts if "remove" in a
    )
    assert any(
        a["commitInfo"]["operation"] == "OPTIMIZE" for a in acts if "commitInfo" in a
    )


def test_optimize_binpack_respects_min_files_and_target(spark, loc):
    _append(spark, loc, [(1, "a", 1.0)])
    # one small file only -> below min_files, nothing to do
    assert dl.optimize_compact(spark, loc) is None
    _append(spark, loc, [(2, "b", 2.0)])
    res = dl.optimize_compact(spark, loc)
    assert res is not None and res["filesRemoved"] == 2
    # already-large files are never candidates
    assert dl.optimize_compact(spark, loc, target_file_size=1) is None


def test_optimize_binpack_partitioned_groups_per_tuple(spark, loc):
    for j in range(4):
        df = spark.createDataFrame(
            [(j * 2, "p1", 1.0), (j * 2 + 1, "p2", 2.0)], "id int, k string, v double"
        )
        dl.write_delta(df.repartition(2, "k"), loc, mode="append", partition_by=["k"])
    pre = dl.snapshot(loc)
    before = dl.read_delta(spark, loc).orderBy("id").collect()
    res = dl.optimize_compact(spark, loc)
    assert res is not None
    post = dl.snapshot(loc)
    assert len(post.files) < len(pre.files)
    # partition values survive the rewrite
    assert dl.read_delta(spark, loc).orderBy("id").collect() == before
    assert dl.read_delta(spark, loc, where="k = 'p1'").count() == 4


def test_optimize_folds_deletion_vectors(spark, loc):
    _append(spark, loc, [(i, "a", float(i)) for i in range(10)])
    _append(spark, loc, [(i, "b", float(i)) for i in range(10, 20)])
    dl.delete_where(spark, loc, "id % 2 = 1", use_dvs=True)
    assert any(f.deletion_vector for f in dl.snapshot(loc).files)
    res = dl.optimize_compact(spark, loc)
    assert res is not None
    assert not any(f.deletion_vector for f in dl.snapshot(loc).files)
    got = sorted(r.id for r in dl.read_delta(spark, loc).collect())
    assert got == list(range(0, 20, 2))


# ---------------------------------------------------------------------------
# Z-ORDER
# ---------------------------------------------------------------------------


def test_optimize_zorder_rewrites_all_and_improves_skipping(spark, loc):
    # two appends each covering the FULL (x, y) range: pre-optimize,
    # every file's min/max spans everything and no file can be skipped
    import random

    rnd = random.Random(7)
    for _ in range(2):
        rows = [
            (i, str(rnd.randrange(100)), float(rnd.randrange(100)))
            for i in range(500)
        ]
        df = spark.createDataFrame(rows, "id int, k string, v double").withColumn(
            "x", F.col("id") % 100
        )
        dl.write_delta(df.coalesce(1), loc, mode="append")
    before = dl.read_delta(spark, loc).orderBy("id", "k", "v").collect()
    res = dl.optimize_compact(
        spark, loc, target_file_size=4 * 1024, zorder_by=["x", "v"]
    )
    assert res is not None and res["mode"] == "zorder"
    assert res["filesRemoved"] == 2 and res["filesAdded"] > 1
    assert dl.read_delta(spark, loc).orderBy("id", "k", "v").collect() == before

    # skipping: a narrow x-predicate must now prune files via stats
    snap = dl.snapshot(loc)
    surviving = [
        f
        for f in snap.files
        if dl._file_survives(f.stats, [("x", "<", 10)])
    ]
    assert len(surviving) < len(snap.files)


def test_optimize_zorder_validates_columns(spark, loc):
    df = spark.createDataFrame([(1, "a", 1.0)], "id int, k string, v double")
    dl.write_delta(df, loc, mode="append", partition_by=["k"])
    with pytest.raises(ValueError, match="partition columns"):
        dl.optimize_compact(spark, loc, zorder_by=["k"])
    with pytest.raises(ValueError, match="not in table"):
        dl.optimize_compact(spark, loc, zorder_by=["nope"])
    with pytest.raises(ValueError, match="only numeric"):
        df2 = spark.createDataFrame([(1, "a", 1.0)], "id int, s string, v double")
        loc2 = loc + "2"
        dl.write_delta(df2, loc2, mode="append")
        dl.optimize_compact(spark, loc2, zorder_by=["s"])


def test_optimize_on_clustered_table_reclusters(spark, loc):
    df = spark.createDataFrame(
        [(i, f"k{i % 3}", float(i)) for i in range(30)], "id int, k string, v double"
    )
    dl.write_delta(df, loc, mode="append", cluster_by=["id"])
    # appends accumulate files; OPTIMIZE re-clusters on the table's own cols
    dl.write_delta(
        spark.createDataFrame(
            [(i, "x", 0.0) for i in range(30, 60)], "id int, k string, v double"
        ),
        loc,
        mode="append",
    )
    with pytest.raises(ValueError, match="clustered table"):
        dl.optimize_compact(spark, loc, zorder_by=["v"])
    before = dl.read_delta(spark, loc).orderBy("id").collect()
    res = dl.optimize_compact(spark, loc)
    assert res is not None and res["mode"] == "cluster"
    assert dl.read_delta(spark, loc).orderBy("id").collect() == before


def test_optimize_preserves_row_ids(spark, loc):
    _append(spark, loc, [(i, "a", float(i)) for i in range(8)])
    dl.enable_row_tracking(spark, loc)
    _append(spark, loc, [(i, "b", float(i)) for i in range(8, 16)])
    ids_before = {
        r.id: r._row_id
        for r in dl.read_delta_with_row_ids(spark, loc).collect()
    }
    res = dl.optimize_compact(spark, loc)
    assert res is not None
    ids_after = {
        r.id: r._row_id
        for r in dl.read_delta_with_row_ids(spark, loc).collect()
    }
    assert ids_after == ids_before


# ---------------------------------------------------------------------------
# YAML actor surface
# ---------------------------------------------------------------------------


def test_optimize_yaml_actor(spark, sf_dir, tmp_path):
    """delta-dml op=optimize runs the real bin-pack/Z-ORDER OPTIMIZE
    (round 12) — trickle appends, declarative compaction, row parity."""
    from spark_etl_framework_spark.plans.runner import run_pipeline_file

    tbl = tmp_path / "opt_tbl"
    for i in range(3):
        df = spark.createDataFrame(
            [(i * 5 + j, float(j)) for j in range(5)], "id int, v double"
        )
        dl.write_delta(df.coalesce(1), str(tbl), mode="append")
    assert len(dl.snapshot(str(tbl)).files) == 3
    ypath = tmp_path / "opt.yaml"
    ypath.write_text(f"""
version: 1.0.0
jobs:
  - name: main
    actions:
      - name: optimize
        actor:
          type: delta-dml
          properties:
            op: optimize
            path: "{tbl}"
            zOrderBy: "id, v"
""")
    run_pipeline_file(spark, str(ypath))
    snap = dl.snapshot(str(tbl))
    assert len(snap.files) < 3
    assert dl.read_delta(spark, str(tbl)).count() == 15


# ---------------------------------------------------------------------------
# shallow clone
# ---------------------------------------------------------------------------


def test_shallow_clone_zero_copy_and_reads(spark, loc, tmp_path):
    _append(spark, loc, [(i, "a", float(i)) for i in range(10)])
    _append(spark, loc, [(i, "b", float(i)) for i in range(10, 20)])
    dst = str(tmp_path / "clone")
    assert dl.shallow_clone(spark, loc, dst) == 0
    # zero data files under the clone root
    data_files = [
        n for r, _d, ns in os.walk(dst) for n in ns
        if n.endswith(".parquet") and "_delta_log" not in r
    ]
    assert data_files == []
    src_rows = dl.read_delta(spark, loc).orderBy("id").collect()
    assert dl.read_delta(spark, dst).orderBy("id").collect() == src_rows
    # fresh identity, carried schema
    assert dl.snapshot(dst).metadata_id != dl.snapshot(loc).metadata_id
    assert dl.snapshot(dst).schema == dl.snapshot(loc).schema


def test_shallow_clone_isolated_dml_both_directions(spark, loc, tmp_path):
    _append(spark, loc, [(i, "a", float(i)) for i in range(10)])
    dst = str(tmp_path / "clone")
    dl.shallow_clone(spark, loc, dst)
    # DML on the clone: source untouched
    dl.delete_where(spark, dst, "id >= 5")
    assert dl.read_delta(spark, dst).count() == 5
    assert dl.read_delta(spark, loc).count() == 10
    # DML on the source: clone untouched
    _append(spark, loc, [(i, "c", float(i)) for i in range(10, 15)])
    dl.delete_where(spark, loc, "id = 0")
    assert dl.read_delta(spark, loc).count() == 14
    assert dl.read_delta(spark, dst).count() == 5
    # the clone's rewrite landed under ITS root, not the source's
    clone_files = dl.snapshot(dst).files
    assert all(not os.path.isabs(f.path) or f.path.startswith(dst) or
               f.path.startswith(loc) for f in clone_files)
    assert any(not os.path.isabs(f.path) for f in clone_files), (
        "the DELETE rewrite must stage under the clone root"
    )


def test_shallow_clone_carries_deletion_vectors(spark, loc, tmp_path):
    _append(spark, loc, [(i, "a", float(i)) for i in range(10)])
    dl.delete_where(spark, loc, "id % 2 = 1", use_dvs=True)
    dst = str(tmp_path / "clone")
    dl.shallow_clone(spark, loc, dst)
    got = sorted(r.id for r in dl.read_delta(spark, dst).collect())
    assert got == [0, 2, 4, 6, 8]
    # descriptors became absolute "p" form
    dvs = [f.deletion_vector for f in dl.snapshot(dst).files if f.deletion_vector]
    assert dvs and all(d["storageType"] == "p" for d in dvs)
    assert all(os.path.isabs(d["pathOrInlineDv"]) for d in dvs)


def test_shallow_clone_time_travel_source_version(spark, loc, tmp_path):
    _append(spark, loc, [(1, "a", 1.0)])
    _append(spark, loc, [(2, "b", 2.0)])
    dst = str(tmp_path / "clone")
    dl.shallow_clone(spark, loc, dst, version=0)
    assert dl.read_delta(spark, dst).count() == 1
    with pytest.raises(ValueError, match="already a delta table"):
        dl.shallow_clone(spark, loc, dst)


def test_shallow_clone_vacuum_never_touches_source(spark, loc, tmp_path):
    _append(spark, loc, [(i, "a", float(i)) for i in range(10)])
    dst = str(tmp_path / "clone")
    dl.shallow_clone(spark, loc, dst)
    dl.delete_where(spark, dst, "id < 5")  # tombstones the absolute refs
    dl.vacuum(spark, dst, retention_ms=0)
    # vacuum walks only the clone root — the source file is outside it,
    # so the tombstoned ABSOLUTE reference is never unlinked (the only
    # removable file is the clone's own _change_data CDC parquet)
    assert dl.read_delta(spark, loc).count() == 10, "source data lost!"
    assert dl.read_delta(spark, dst).count() == 5


def test_shallow_clone_preserves_row_tracking_and_clustering(spark, loc, tmp_path):
    df = spark.createDataFrame(
        [(i, f"k{i%3}", float(i)) for i in range(12)], "id int, k string, v double"
    )
    dl.write_delta(df, loc, mode="overwrite", cluster_by=["id"])
    dl.enable_row_tracking(spark, loc)
    ids_src = {
        r.id: r._row_id for r in dl.read_delta_with_row_ids(spark, loc).collect()
    }
    dst = str(tmp_path / "clone")
    dl.shallow_clone(spark, loc, dst)
    snap = dl.snapshot(dst)
    assert "delta.clustering" in snap.domain_metadata
    assert "delta.rowTracking" in snap.domain_metadata
    ids_clone = {
        r.id: r._row_id for r in dl.read_delta_with_row_ids(spark, dst).collect()
    }
    assert ids_clone == ids_src
    # appends to the clone allocate FRESH ids past the carried hwm
    dl.write_delta(
        spark.createDataFrame([(100, "x", 0.0)], "id int, k string, v double"),
        dst, mode="append",
    )
    ids_after = {
        r.id: r._row_id for r in dl.read_delta_with_row_ids(spark, dst).collect()
    }
    assert ids_after[100] not in set(ids_src.values())


def test_shallow_clone_yaml_actor(spark, tmp_path):
    from spark_etl_framework_spark.plans.runner import run_pipeline_file

    src = tmp_path / "src_tbl"
    dst = tmp_path / "dst_tbl"
    df = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "id int, k string, v double")
    dl.write_delta(df, str(src), mode="overwrite")
    ypath = tmp_path / "clone.yaml"
    ypath.write_text(f"""
version: 1.0.0
jobs:
  - name: main
    actions:
      - name: clone
        actor:
          type: delta-dml
          properties:
            op: clone
            path: "{src}"
            targetPath: "{dst}"
""")
    run_pipeline_file(spark, str(ypath))
    assert dl.read_delta(spark, str(dst)).count() == 2


def test_shallow_clone_repins_ict_enablement(spark, loc, tmp_path):
    _append(spark, loc, [(1, "a", 1.0)])
    dl.enable_in_commit_timestamps(loc)
    _append(spark, loc, [(2, "b", 2.0)])
    dst = str(tmp_path / "clone")
    dl.shallow_clone(spark, loc, dst)
    conf = dl.snapshot(dst).configuration
    assert conf["delta.enableInCommitTimestamps"] == "true"
    # enablement re-pinned to the CLONE's own log (the source's
    # enablement version names a commit the clone does not have)
    assert conf["delta.inCommitTimestampEnablementVersion"] == "0"
    ict0 = dl._ict_of_commit(dst, 0)
    assert ict0 is not None
    assert conf["delta.inCommitTimestampEnablementTimestamp"] == str(ict0)
    # the monotonic chain continues on clone appends
    dl.write_delta(
        spark.createDataFrame([(3, "c", 3.0)], "id int, k string, v double"),
        dst, mode="append",
    )
    assert dl._ict_of_commit(dst, 1) > ict0

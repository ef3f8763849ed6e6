"""Delta column mapping (PROTOCOL.md §Column Mapping) — round 9.

Real Delta tables that ever ran ALTER COLUMN RENAME/DROP store parquet
columns under ``col-<uuid>`` physical names with the logical names living
only in the schemaString; a reader that scans by logical name gets
all-null columns. This suite pins the full jar-free lifecycle:
create-with-mapping, physical parquet layout, logical read-back, data
skipping against physically-keyed stats, every DML op, metadata-only
RENAME/DROP COLUMN (the operations the mode exists for — zero data
rewrite at any table size), CDF projection across renames via the stable
physicalName, checkpoint survival of configuration + protocol, and the
upgrade path for pre-existing unmapped tables.

Reference surface: etl/source/DeltaReader.scala:10-27 reads any table the
jar can — including mapped ones — so jar-parity requires this mode.
"""

from __future__ import annotations

import json
import os

import pytest

from spark_etl_framework_spark.sources import deltalog as dl


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _mk(spark, n=12):
    return spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(n)], "id int, name string, grp int"
    )


def _mapped(spark, tbl, n=12, partition_by=("grp",)):
    dl.write_delta(
        _mk(spark, n).coalesce(2),
        tbl,
        mode="overwrite",
        partition_by=list(partition_by),
        column_mapping="name",
    )
    return dl.snapshot(tbl)


def test_create_stores_physical_names_everywhere(spark, tbl):
    """Parquet footers, add-action partitionValues, and stats keys all
    use the col-<uuid> physical names; the schemaString keeps logical
    names + ids; protocol is reader 2 / writer 5."""
    snap = _mapped(spark, tbl)
    assert snap.column_mapping_mode == "name"
    phys = snap.physical_of
    assert all(p.startswith("col-") for p in phys.values())
    assert snap.protocol == {"minReaderVersion": 2, "minWriterVersion": 5}
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "3"
    ids = [f.metadata["delta.columnMapping.id"] for f in snap.schema.fields]
    assert sorted(ids) == [1, 2, 3]
    # physical names in the parquet footers
    import pyarrow.parquet as pq

    f = snap.files[0]
    footer_cols = set(
        pq.ParquetFile(os.path.join(tbl, f.path)).schema_arrow.names
    )
    assert phys["id"] in footer_cols and phys["name"] in footer_cols
    assert "id" not in footer_cols
    # partitionValues + stats keyed physically
    assert set(f.partition_values) == {phys["grp"]}
    stats = json.loads(f.stats)
    assert phys["id"] in stats["minValues"]
    assert "id" not in stats["minValues"]


def test_logical_read_and_data_skipping(spark, tbl):
    _mapped(spark, tbl, n=30)
    out = dl.read_delta(spark, tbl)
    assert out.columns == ["id", "name", "grp"]
    assert sorted(r.id for r in out.collect()) == list(range(30))
    total = len(dl.read_delta(spark, tbl).inputFiles())
    # skippable conjunct translates logical 'id' to the physical stats key
    pruned = dl.read_delta(spark, tbl, where="id < 3")
    assert sorted(r.id for r in pruned.collect()) == [0, 1, 2]
    assert len(pruned.inputFiles()) < total
    # partition-column predicate prunes via physically-keyed partitionValues
    ppart = dl.read_delta(spark, tbl, where="grp = 1")
    assert len(ppart.inputFiles()) < total
    assert sorted(set(r.grp for r in ppart.collect())) == [1]


def test_dml_family_on_mapped_table(spark, tbl):
    _mapped(spark, tbl)
    dl.delete_where(spark, tbl, "id = 0")
    dl.update_where(spark, tbl, "id = 1", {"name": "concat(name, '!')"})
    src = spark.sparkContext is not None and spark.createDataFrame(
        [(2, "upd", 2), (99, "new", 0)], "id int, name string, grp int"
    )
    dl.merge_upsert(spark, tbl, src, ["id"])
    rows = {r.id: r.name for r in dl.read_delta(spark, tbl).collect()}
    assert 0 not in rows
    assert rows[1] == "n1!"
    assert rows[2] == "upd"
    assert rows[99] == "new"
    assert len(rows) == 12  # 12 - delete + insert
    # DML-staged files are ALSO physically named
    import pyarrow.parquet as pq

    snap = dl.snapshot(tbl)
    phys = snap.physical_of
    for f in snap.files:
        names = set(pq.ParquetFile(os.path.join(tbl, f.path)).schema_arrow.names)
        assert phys["id"] in names and "id" not in names
    # DV delete on a mapped table: positions subtract, features merge
    dl.delete_where(spark, tbl, "id = 99", use_dvs=True)
    assert 99 not in {r.id for r in dl.read_delta(spark, tbl).collect()}
    proto = dl.snapshot(tbl).protocol
    assert "columnMapping" in proto["readerFeatures"]
    assert "deletionVectors" in proto["readerFeatures"]


def test_rename_is_metadata_only(spark, tbl):
    """THE point of the mode: rename touches zero data files — identical
    file set and mtimes — and reads back under the new logical name with
    all values intact; time travel still shows the old name."""
    snap0 = _mapped(spark, tbl)
    files = {f.path for f in snap0.files}
    mtimes = {f.path: os.path.getmtime(os.path.join(tbl, f.path)) for f in snap0.files}
    v = dl.rename_column(tbl, "name", "title")
    snap1 = dl.snapshot(tbl)
    assert {f.path for f in snap1.files} == files
    assert all(
        os.path.getmtime(os.path.join(tbl, p)) == mtimes[p] for p in files
    )
    out = dl.read_delta(spark, tbl)
    assert out.columns == ["id", "title", "grp"]
    assert {r.title for r in out.collect()} == {f"n{i}" for i in range(12)}
    # physicalName unchanged — the rename is purely logical
    assert snap1.physical_of["title"] == snap0.physical_of["name"]
    assert dl.read_delta(spark, tbl, version_as_of=v - 1).columns == [
        "id", "name", "grp",
    ]
    # renaming a partition column updates partitionColumns too
    dl.rename_column(tbl, "grp", "bucket")
    assert dl.snapshot(tbl).partition_columns == ["bucket"]
    assert sorted(set(r.bucket for r in dl.read_delta(spark, tbl).collect())) == [
        0, 1, 2,
    ]


def test_drop_column_is_metadata_only(spark, tbl):
    snap0 = _mapped(spark, tbl)
    files = {f.path for f in snap0.files}
    dl.drop_column(tbl, "name")
    snap1 = dl.snapshot(tbl)
    assert {f.path for f in snap1.files} == files
    out = dl.read_delta(spark, tbl)
    assert out.columns == ["id", "grp"]
    assert out.count() == 12
    with pytest.raises(ValueError, match="partition column"):
        dl.drop_column(tbl, "grp")


def test_ddl_guards(spark, tbl):
    dl.write_delta(_mk(spark).coalesce(1), tbl, mode="overwrite")
    with pytest.raises(ValueError, match="column mapping"):
        dl.rename_column(tbl, "name", "title")
    with pytest.raises(ValueError, match="column mapping"):
        dl.drop_column(tbl, "name")
    with pytest.raises(ValueError, match="enable_column_mapping"):
        dl.write_delta(_mk(spark), tbl, column_mapping="name")
    with pytest.raises(ValueError, match="'name' or 'id'"):
        dl.write_delta(_mk(spark), tbl + "2", column_mapping="yes")
    snap = _mapped(spark, tbl + "3")
    with pytest.raises(ValueError, match="already exists"):
        dl.rename_column(tbl + "3", "id", "name")
    with pytest.raises(ValueError, match="no column"):
        dl.rename_column(tbl + "3", "nope", "x")
    assert snap.column_mapping_mode == "name"


def test_upgrade_existing_table(spark, tbl):
    """enable_column_mapping on a table with existing files: physical
    names pin to the CURRENT names so old parquet keeps matching, and
    rename works afterwards across old AND new files."""
    dl.write_delta(_mk(spark).coalesce(1), tbl, mode="overwrite")
    v = dl.enable_column_mapping(tbl)
    snap = dl.snapshot(tbl)
    assert snap.column_mapping_mode == "name"
    assert snap.physical_of == {"id": "id", "name": "name", "grp": "grp"}
    assert snap.protocol["minReaderVersion"] == 2
    assert dl.enable_column_mapping(tbl) == v  # idempotent
    dl.rename_column(tbl, "name", "label")
    # append AFTER the upgrade: new files store the (old) physical names
    dl.write_delta(
        spark.createDataFrame([(100, "z", 0)], "id int, label string, grp int"),
        tbl,
    )
    out = dl.read_delta(spark, tbl)
    assert out.columns == ["id", "label", "grp"]
    assert out.count() == 13
    assert {r.label for r in out.filter("id = 100").collect()} == {"z"}


def test_schema_evolution_assigns_fresh_ids(spark, tbl):
    _mapped(spark, tbl, partition_by=())
    evolved = spark.createDataFrame(
        [(50, "x", 1, 9.5)], "id int, name string, grp int, score double"
    )
    dl.write_delta(evolved, tbl, merge_schema=True)
    snap = dl.snapshot(tbl)
    f = {x.name: x for x in snap.schema.fields}["score"]
    assert f.metadata["delta.columnMapping.id"] == 4
    assert f.metadata["delta.columnMapping.physicalName"].startswith("col-")
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "4"
    out = dl.read_delta(spark, tbl)
    vals = {r.id: r.score for r in out.collect()}
    assert vals[50] == 9.5
    assert vals[0] is None  # pre-evolution rows read null


def test_cdf_projects_across_rename_via_physical_name(spark, tbl):
    """table_changes over a range containing a rename reports EVERY
    commit under the END schema: the stable physicalName links the old
    logical name's rows to the new one."""
    _mapped(spark, tbl)
    dl.delete_where(spark, tbl, "id = 0")
    dl.rename_column(tbl, "name", "title")
    dl.update_where(spark, tbl, "id = 1", {"title": "'renamed'"})
    cdf = dl.table_changes(spark, tbl, 0)
    assert cdf.columns == [
        "id", "title", "grp", "_change_type", "_commit_version",
        "_commit_timestamp",
    ]
    rows = cdf.collect()
    # the version-0 inserts carry their values under the NEW name
    v0 = {r.id: r.title for r in rows if r._commit_version == 0}
    assert v0[5] == "n5"
    post = [r for r in rows if r._change_type == "update_postimage"]
    assert [r.title for r in post] == ["renamed"]


def test_checkpoint_preserves_mapping_and_protocol(spark, tbl):
    _mapped(spark, tbl)
    dl.rename_column(tbl, "name", "title")
    dl._write_checkpoint(tbl, dl.latest_version(tbl))
    dl.clean_log(tbl)
    snap = dl.snapshot(tbl)
    assert snap.column_mapping_mode == "name"
    assert snap.protocol["minReaderVersion"] == 2
    out = dl.read_delta(spark, tbl)
    assert out.columns == ["id", "title", "grp"]
    assert out.count() == 12


def test_pv_get_tolerates_logical_keys(spark, tbl):
    """Foreign writers have shipped partitionValues keyed both ways —
    the reader takes physical first, logical as fallback."""
    snap = _mapped(spark, tbl)
    phys_grp = snap.physical_of["grp"]
    assert snap.pv_get({phys_grp: "1"}, "grp") == "1"
    assert snap.pv_get({"grp": "2"}, "grp") == "2"
    assert snap.pv_get({phys_grp: "1", "grp": "2"}, "grp") == "1"


def test_stream_source_reads_mapped_table(spark, tbl):
    """The jar-free delta micro-batch source reads a column-mapped table:
    parquet columns resolve through physicalName, partitionValues through
    their physical keys."""
    import uuid as _uuid

    from spark_etl_framework_spark.sources.deltalog import DeltaLogDataSource

    _mapped(spark, tbl, n=6)
    dl.write_delta(
        spark.createDataFrame([(9, "y", 0)], "id int, name string, grp int"),
        tbl,
        partition_by=["grp"],
    )
    try:
        spark.dataSource.register(DeltaLogDataSource)
    except Exception:  # noqa: BLE001 - already registered
        pass
    qname = f"cm_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("deltalog").option("path", tbl).load()
        .writeStream.format("memory").queryName(qname)
        .trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(qname)
    assert out.columns == ["id", "name", "grp"]
    rows = {(r.id, r.name, r.grp) for r in out.collect()}
    assert (9, "y", 0) in rows
    assert len(rows) == 7

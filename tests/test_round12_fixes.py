"""Round-12 advisor fixes, pinned.

1. ``cherrypick_snapshot`` re-attributes the picked manifests to the
   PUBLISHED snapshot id (rewriting the manifest files and their ADDED
   entries' ``snapshot_id``), exactly like the jar — so an incremental
   append scan whose range covers the publish sees the cherry-picked
   rows. Previously the staged manifests carried over verbatim and the
   ``added_snapshot_id == snapshot-id`` filter silently contributed
   zero files for that commit (round-11 advisor, high).
2. ``write_delta`` seeds ``configuration`` from the current snapshot for
   EVERY existing table, so a mergeSchema metaData restate carries
   ``delta.enableInCommitTimestamps`` / CHECK constraints / UniForm
   flags forward on non-column-mapped tables too (advisor, medium).
3. ``IcebergWriter``'s wapId path restores any pre-existing session
   ``spark.wap.id`` instead of unconditionally unsetting it (advisor,
   low).
"""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.sources import deltalog as dl
from spark_etl_framework_spark.sources import iceberg as ice


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _iwrite(spark, loc, ids, mode="append", **kw):
    df = spark.createDataFrame([(i, f"s{i}") for i in ids], "id int, s string")
    return ice.write_iceberg(df.coalesce(1), loc, mode=mode, **kw)


# ---------------------------------------------------------------------------
# 1. cherry-pick re-attributes manifests to the published snapshot
# ---------------------------------------------------------------------------


def test_cherrypick_rows_visible_to_incremental_scan(spark, loc):
    _iwrite(spark, loc, range(3), mode="overwrite")
    staged = _iwrite(spark, loc, [10], wap_id="job-9")
    # main advances between stage and publish
    _iwrite(spark, loc, [20])
    pre_publish = ice.load_metadata(loc)["current-snapshot-id"]
    pub = ice.cherrypick_snapshot(loc, wap_id="job-9")
    # the CDC consumer's view: rows added by (pre_publish, pub]
    inc = ice.read_iceberg_incremental(spark, loc, pre_publish, pub)
    assert sorted(r.id for r in inc.collect()) == [10]
    # and a wider range that includes the intermediate append
    m0 = next(
        s["snapshot-id"] for s in ice.load_metadata(loc)["snapshots"]
        if s.get("parent-snapshot-id") is None
    )
    inc_all = ice.read_iceberg_incremental(spark, loc, m0, pub)
    assert sorted(r.id for r in inc_all.collect()) == [10, 20]


def test_cherrypick_rewrites_manifest_attribution(spark, loc):
    from spark_etl_framework_spark.functions.avro_ocf import read_ocf

    _iwrite(spark, loc, range(2), mode="overwrite")
    staged = _iwrite(spark, loc, [7], wap_id="w1")
    pub = ice.cherrypick_snapshot(loc, wap_id="w1")
    meta = ice.load_metadata(loc)
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == pub)
    _s, _m, mlist = read_ocf(snap["manifest-list"])
    picked = [m for m in mlist if m["added_snapshot_id"] == pub]
    assert len(picked) == 1  # the published manifest is attributed to pub
    assert not any(m["added_snapshot_id"] == staged for m in mlist)
    _es, _em, entries = read_ocf(picked[0]["manifest_path"])
    assert all(
        e["snapshot_id"] == pub for e in entries if e["status"] == 1
    )
    # the published table still reads correctly end-to-end
    got = sorted(r.id for r in ice.read_iceberg(spark, loc).collect())
    assert got == [0, 1, 7]


# ---------------------------------------------------------------------------
# 2. mergeSchema append preserves the full table configuration
# ---------------------------------------------------------------------------


def test_mergeschema_append_preserves_configuration(spark, loc):
    df = spark.createDataFrame([(1,)], "id int")
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    dl.enable_in_commit_timestamps(loc)
    conf_before = dict(dl.snapshot(loc).configuration)
    assert conf_before["delta.enableInCommitTimestamps"] == "true"
    # schema-evolving append on a NON-column-mapped table: the metaData
    # restate must carry the configuration forward
    df2 = spark.createDataFrame([(2, "x")], "id int, extra string")
    dl.write_delta(df2.coalesce(1), loc, merge_schema=True)
    snap = dl.snapshot(loc)
    assert snap.configuration == conf_before
    # and ICT stamping continues on the evolving commit itself + after
    v_evolve = dl.latest_version(loc)
    assert dl._ict_of_commit(loc, v_evolve) is not None
    df3 = spark.createDataFrame([(3, "z")], "id int, extra string")
    dl.write_delta(df3.coalesce(1), loc)
    assert dl._ict_of_commit(loc, dl.latest_version(loc)) is not None


def test_mergeschema_append_preserves_check_constraints(spark, loc):
    df = spark.createDataFrame([(5,)], "id int")
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    dl.add_check_constraint(spark, loc, "pos", "id > 0")
    df2 = spark.createDataFrame([(6, "y")], "id int, tag string")
    dl.write_delta(df2.coalesce(1), loc, merge_schema=True)
    # the constraint survives the restate AND still enforces
    assert dl.snapshot(loc).check_constraints == {"pos": "id > 0"}
    bad = spark.createDataFrame([(-1, "n")], "id int, tag string")
    with pytest.raises(Exception, match="pos|id > 0|CHECK"):
        dl.write_delta(bad.coalesce(1), loc)


# ---------------------------------------------------------------------------
# 3. IcebergWriter restores a pre-existing session wap.id
# ---------------------------------------------------------------------------


def test_iceberg_writer_wap_restores_prior_session_conf(spark, loc):
    from spark_etl_framework_spark.sinks.connectors import IcebergWriter

    _iwrite(spark, loc, range(2), mode="overwrite")
    spark.createDataFrame([(9, "s9")], "id int, s string").createOrReplaceTempView(
        "_wap_in"
    )
    spark.conf.set("spark.wap.id", "user-held")
    try:
        IcebergWriter(view="_wap_in", table=loc, wapId="actor-job").run(
            JobContext(PipelineContext(), spark), spark
        )
        assert spark.conf.get("spark.wap.id") == "user-held"
    finally:
        spark.conf.unset("spark.wap.id")
    # and when the user held NO value, the conf ends unset
    IcebergWriter(view="_wap_in", table=loc, wapId="actor-job2").run(
        JobContext(PipelineContext(), spark), spark
    )
    assert spark.conf.get("spark.wap.id", None) is None


# ---------------------------------------------------------------------------
# 4. partition-spec evolution: resolve structured v2 specs, refuse evolved
#    manifests (round-11 judge order item 2)
# ---------------------------------------------------------------------------


def _edit_meta(loc, fn):
    import json
    import os

    d = os.path.join(loc, "metadata")
    with open(os.path.join(d, "version-hint.text"), encoding="utf-8") as fh:
        v = int(fh.read().strip())
    p = os.path.join(d, f"v{v}.metadata.json")
    with open(p, encoding="utf-8") as fh:
        meta = json.load(fh)
    fn(meta)
    with open(p, "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def _ipart_write(spark, loc, rows):
    df = spark.createDataFrame(rows, "id int, grp string")
    return ice.write_iceberg(
        df.coalesce(1), loc, mode="overwrite", partition_by=["grp"]
    )


def test_v2_specs_list_only_metadata_reads_partitioning(spark, loc):
    """A spec-compliant foreign v2 table writes only ``partition-specs``
    + ``default-spec-id`` (the flat field is deprecated) — its identity
    partition values must still materialize, not silently read as
    unpartitioned."""
    _ipart_write(spark, loc, [(1, "a"), (2, "b")])

    def strip_flat(meta):
        flat = meta.pop("partition-spec")
        meta["partition-specs"] = [{"spec-id": 0, "fields": flat}]
        meta["default-spec-id"] = 0

    _edit_meta(loc, strip_flat)
    got = sorted(
        (r.id, r.grp) for r in ice.read_iceberg(spark, loc).collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_evolved_spec_manifest_refuses_loudly(spark, loc):
    """Manifests written under a non-default spec whose fields differ
    from the default's must refuse — resolving them with the default
    field list mis-keys partition values (silent wrong rows)."""
    _ipart_write(spark, loc, [(1, "a"), (2, "b")])

    def evolve(meta):
        flat = meta["partition-spec"]
        evolved = [
            {"name": "id_bucket", "transform": "bucket[4]",
             "source-id": 1, "field-id": 1001}
        ]
        meta["partition-specs"] = [
            {"spec-id": 0, "fields": flat},
            {"spec-id": 1, "fields": evolved},
        ]
        # the table EVOLVED: new default is spec 1, old manifests keep 0
        meta["default-spec-id"] = 1
        meta["partition-spec"] = evolved

    _edit_meta(loc, evolve)
    with pytest.raises(ice.IcebergUnsupportedPartitionSpec, match="spec 0"):
        ice.read_iceberg(spark, loc).collect()


def test_renumbered_identical_spec_resolves(spark, loc):
    """A manifest spec-id that differs from the default but whose field
    list is IDENTICAL (renumbering, not evolution) resolves silently."""
    _ipart_write(spark, loc, [(1, "a"), (2, "b")])

    def renumber(meta):
        flat = meta["partition-spec"]
        meta["partition-specs"] = [
            {"spec-id": 0, "fields": flat},
            {"spec-id": 3, "fields": list(flat)},
        ]
        meta["default-spec-id"] = 3  # manifests still carry spec 0

    _edit_meta(loc, renumber)
    got = sorted(
        (r.id, r.grp) for r in ice.read_iceberg(spark, loc).collect()
    )
    assert got == [(1, "a"), (2, "b")]


# ---------------------------------------------------------------------------
# 5. delta type widening (round-11 judge order item 5): the typeWidening
#    gate becomes capability — pre-widening files read through Spark 4's
#    parquet widening promotions, zero rewrites
# ---------------------------------------------------------------------------


def test_type_widening_int_to_long_lifecycle(spark, loc):
    dl.write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        .coalesce(1), loc, mode="overwrite",
    )
    v_widen = dl.widen_column_type(loc, "id", "long")
    snap = dl.snapshot(loc)
    assert snap.schema["id"].dataType.simpleString() == "bigint"
    assert "typeWidening" in snap.protocol["readerFeatures"]
    assert "typeWidening" in snap.protocol["writerFeatures"]
    assert snap.configuration["delta.enableTypeWidening"] == "true"
    changes = snap.schema["id"].metadata["delta.typeChanges"]
    assert changes == [
        {"fromType": "integer", "toType": "long", "tableVersion": v_widen}
    ]
    # post-widening append exceeds int range; BOTH vintages read
    big = 2**40
    dl.write_delta(
        spark.createDataFrame([(big, "c")], "id long, s string").coalesce(1),
        loc,
    )
    got = sorted((r.id, r.s) for r in dl.read_delta(spark, loc).collect())
    assert got == [(1, "a"), (2, "b"), (big, "c")]
    # time travel to the pre-widening version still reads the int schema
    old = dl.read_delta(spark, loc, version_as_of=0)
    assert old.schema["id"].dataType.simpleString() == "int"
    assert sorted(r.id for r in old.collect()) == [1, 2]


def test_type_widening_decimal_and_double(spark, loc):
    df = spark.createDataFrame([(1, 2.5)], "n int, f float").selectExpr(
        "cast(n as decimal(5,2)) n", "f"
    )
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    dl.widen_column_type(loc, "n", "decimal(12,4)")
    dl.widen_column_type(loc, "f", "double")
    out = dl.read_delta(spark, loc).collect()[0]
    assert str(out.n) == "1.0000" and abs(out.f - 2.5) < 1e-9
    snap = dl.snapshot(loc)
    assert snap.schema["n"].metadata["delta.typeChanges"][0]["fromType"] == (
        "decimal(5,2)"
    )


def test_type_widening_rejects_narrowing_and_unrelated(spark, loc):
    dl.write_delta(
        spark.createDataFrame([(1,)], "id long").coalesce(1), loc,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="not a spec-allowed widening"):
        dl.widen_column_type(loc, "id", "int")
    with pytest.raises(ValueError, match="not a spec-allowed widening"):
        dl.widen_column_type(loc, "id", "string")
    with pytest.raises(ValueError, match="no column"):
        dl.widen_column_type(loc, "nope", "long")


def test_unknown_reader_feature_still_refuses(spark, loc):
    import json
    import os

    dl.write_delta(
        spark.createDataFrame([(1,)], "id int").coalesce(1), loc,
        mode="overwrite",
    )
    # hand-install a feature this reader does NOT implement (variant
    # became a capability later in round 12, so the unknown example is
    # collations-preview)
    with open(os.path.join(loc, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["collations-preview"],
            "writerFeatures": ["collations-preview"],
        }}) + "\n")
    with pytest.raises(dl.DeltaUnsupportedProtocol, match="collations"):
        dl.read_delta(spark, loc).collect()


def test_corrupt_default_spec_id_refuses(spark, loc):
    _ipart_write(spark, loc, [(1, "a")])

    def corrupt(meta):
        meta["partition-specs"] = [
            {"spec-id": 0, "fields": meta["partition-spec"]}
        ]
        meta.pop("partition-spec")
        meta["default-spec-id"] = 9

    _edit_meta(loc, corrupt)
    with pytest.raises(
        ice.IcebergUnsupportedPartitionSpec, match="default-spec-id 9"
    ):
        ice.read_iceberg(spark, loc).collect()


# ---------------------------------------------------------------------------
# 6. UniForm incremental manifest sync (round-11 judge order item 8):
#    an append-only delta commit mirrors as ONE new manifest over the
#    previous snapshot's carried-over manifest list — O(appended), not
#    O(live)
# ---------------------------------------------------------------------------


def _mlist(loc):
    from spark_etl_framework_spark.functions.avro_ocf import read_ocf

    meta = ice.load_metadata(loc)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _s, _m, entries = read_ocf(cur["manifest-list"])
    return meta, cur, entries


def test_uniform_append_syncs_incrementally(spark, loc):
    from spark_etl_framework_spark.functions.avro_ocf import read_ocf
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame([(i,) for i in range(4)], "id int")
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    dl.enable_uniform(loc)
    _meta0, cur0, list0 = _mlist(loc)
    assert len(list0) == 1  # full-state mirror: one manifest
    base_manifest = list0[0]["manifest_path"]

    df2 = spark.createDataFrame([(10,), (11,)], "id int")
    dl.write_delta(df2.coalesce(1), loc)  # append-only delta commit
    meta1, cur1, list1 = _mlist(loc)
    # previous manifest carried over VERBATIM + one new manifest
    assert len(list1) == 2
    assert list1[0]["manifest_path"] == base_manifest
    assert list1[1]["added_snapshot_id"] == cur1["snapshot-id"]
    # the new manifest holds ONLY the appended files (O(appended))
    _es, _em, new_entries = read_ocf(list1[1]["manifest_path"])
    assert len(new_entries) == 1  # one coalesced appended file
    assert sum(e["data_file"]["record_count"] for e in new_entries) == 2
    assert cur1["summary"]["operation"] == "append"
    assert cur1["summary"]["total-records"] == "6"
    assert cur1["summary"]["total-data-files"] == "2"
    # both doors agree
    assert sorted(r.id for r in ice.read_iceberg(spark, loc).collect()) == [
        0, 1, 2, 3, 10, 11,
    ]
    # synergy: the mirror's append snapshot is consumable as batch CDC
    inc = ice.read_iceberg_incremental(
        spark, loc, cur0["snapshot-id"], cur1["snapshot-id"]
    )
    assert sorted(r.id for r in inc.collect()) == [10, 11]


# ---------------------------------------------------------------------------
# 6b. delta variantType: Spark 4 owns the Variant binary encoding — the
#     engine adds the protocol plumbing and the feature gate flips to
#     capability
# ---------------------------------------------------------------------------


def _vdf(spark, rows):
    return spark.createDataFrame(rows, "id int, j string").selectExpr(
        "id", "parse_json(j) as v"
    )


def test_variant_table_roundtrip_and_protocol(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    df = _vdf(spark, [(1, '{"a":1,"b":[1,2]}'), (2, '{"a":2}')])
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    snap = dl.snapshot(loc)
    assert "variantType" in snap.protocol["readerFeatures"]
    assert "variantType" in snap.protocol["writerFeatures"]
    assert snap.schema["v"].dataType.typeName() == "variant"
    out = dl.read_delta(spark, loc).selectExpr(
        "id", "to_json(v) as j", "variant_get(v, '$.a', 'int') as a"
    )
    got = sorted((r.id, r.j, r.a) for r in out.collect())
    assert got == [(1, '{"a":1,"b":[1,2]}', 1), (2, '{"a":2}', 2)]
    # appends keep working, and the table survives checkpoint + replay
    dl.write_delta(_vdf(spark, [(3, '{"a":3}')]).coalesce(1), loc)
    dl.write_checkpoint_v2(loc)
    vals = sorted(
        r.a for r in dl.read_delta(spark, loc)
        .selectExpr("variant_get(v, '$.a', 'int') as a").collect()
    )
    assert vals == [1, 2, 3]


def test_variant_append_to_plain_table_refuses(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    dl.write_delta(
        spark.createDataFrame([(1,)], "id int").coalesce(1), loc,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="variantType"):
        dl.write_delta(
            _vdf(spark, [(2, '{"x":1}')]).coalesce(1), loc,
            merge_schema=True,
        )


def test_variant_cow_delete(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    dl.write_delta(
        _vdf(spark, [(i, f'{{"a":{i}}}') for i in range(4)]).coalesce(2),
        loc, mode="overwrite",
    )
    dl.delete_where(spark, loc, "id = 2")
    vals = sorted(
        r.a for r in dl.read_delta(spark, loc)
        .selectExpr("variant_get(v, '$.a', 'int') as a").collect()
    )
    assert vals == [0, 1, 3]


# ---------------------------------------------------------------------------
# 7. delta identity columns (writer v6): map-side generation, stats-read
#    high-water-mark sync, ALWAYS/BY DEFAULT policies
# ---------------------------------------------------------------------------


def test_identity_generation_and_high_water_mark(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame([("a",), ("b",), ("c",)], "s string")
    dl.write_delta(
        df.coalesce(1), loc, mode="overwrite",
        identity_columns={"id": {"start": 10, "step": 5}},
    )
    snap = dl.snapshot(loc)
    assert snap.protocol["minWriterVersion"] == 6
    md = snap.schema["id"].metadata
    assert md["delta.identity.start"] == 10
    assert md["delta.identity.step"] == 5
    assert md["delta.identity.allowExplicitInsert"] is False
    rows = {r.s: r.id for r in dl.read_delta(spark, loc).collect()}
    # coalesce(1): mono ids are 0..n-1 → contiguous lattice values
    assert sorted(rows.values()) == [10, 15, 20]
    assert md["delta.identity.highWaterMark"] == 20
    # the next append continues beyond the high water mark
    dl.write_delta(
        spark.createDataFrame([("d",)], "s string").coalesce(1), loc
    )
    snap2 = dl.snapshot(loc)
    vals = sorted(r.id for r in dl.read_delta(spark, loc).collect())
    assert vals == [10, 15, 20, 25]
    assert snap2.schema["id"].metadata["delta.identity.highWaterMark"] == 25
    # every value on the start + k*step lattice
    assert all((v - 10) % 5 == 0 for v in vals)


def test_identity_always_rejects_explicit_by_default_accepts(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    dl.write_delta(
        spark.createDataFrame([("a",)], "s string").coalesce(1), loc,
        mode="overwrite", identity_columns={"id": {}},
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        dl.write_delta(
            spark.createDataFrame([(99, "x")], "id long, s string"), loc
        )
    # BY DEFAULT table: explicit values pass and lift the hwm, with the
    # next generated value rounding to the lattice point beyond it
    loc2 = loc + "_bydefault"
    dl.write_delta(
        spark.createDataFrame([("a",), ("b",)], "s string").coalesce(1),
        loc2, mode="overwrite",
        identity_columns={"id": {"start": 1, "step": 2,
                                 "allow_explicit": True}},
    )
    dl.write_delta(
        spark.createDataFrame([(100, "x")], "id long, s string").coalesce(1),
        loc2,
    )
    snap = dl.snapshot(loc2)
    assert snap.schema["id"].metadata["delta.identity.highWaterMark"] == 100
    dl.write_delta(
        spark.createDataFrame([("y",)], "s string").coalesce(1), loc2
    )
    vals = sorted(r.id for r in dl.read_delta(spark, loc2).collect())
    # 1,3 generated; 100 explicit (off-lattice even); next generated 101
    assert vals == [1, 3, 100, 101]


def test_identity_validation_guards(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError, match="step must be nonzero"):
        dl.write_delta(df, loc, mode="overwrite",
                       identity_columns={"id": {"step": 0}})
    with pytest.raises(ValueError, match="partition column"):
        dl.write_delta(df, loc, mode="overwrite", partition_by=["id"],
                       identity_columns={"id": {}})
    with pytest.raises(ValueError, match="must be LONG"):
        dl.write_delta(
            spark.createDataFrame([(1, "a")], "id int, s string"), loc,
            mode="overwrite",
            identity_columns={"id": {"allow_explicit": True}},
        )
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    with pytest.raises(ValueError, match="table-creation option"):
        dl.write_delta(df, loc, identity_columns={"id": {}})


def test_identity_negative_step_and_multi_partition_unique(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    dl.write_delta(
        spark.createDataFrame([("a",), ("b",)], "s string").coalesce(1),
        loc, mode="overwrite",
        identity_columns={"id": {"start": 0, "step": -3}},
    )
    snap = dl.snapshot(loc)
    assert sorted(r.id for r in dl.read_delta(spark, loc).collect()) == [-3, 0]
    assert snap.schema["id"].metadata["delta.identity.highWaterMark"] == -3
    # multi-partition write: values unique and beyond the hwm (gaps OK)
    big = spark.createDataFrame([(f"r{i}",) for i in range(40)], "s string")
    dl.write_delta(big.repartition(4), loc)
    vals = [r.id for r in dl.read_delta(spark, loc).collect()]
    assert len(vals) == len(set(vals)) == 42
    gen = [v for v in vals if v not in (-3, 0)]
    assert all(v < -3 for v in gen)  # negative step: beyond = below
    assert all((v - 0) % -3 == 0 for v in gen)  # on the lattice
    snap2 = dl.snapshot(loc)
    assert snap2.schema["id"].metadata["delta.identity.highWaterMark"] == min(
        vals
    )


# ---------------------------------------------------------------------------
# 8. delta row tracking: fresh baseRowId blocks, materialized
#    preservation through DML, checkpoint survival
# ---------------------------------------------------------------------------


def _rt_ids(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    return {
        r.k: (r._row_id, r._row_commit_version)
        for r in dl.read_delta_with_row_ids(spark, loc).collect()
    }


def test_row_tracking_enable_backfill_and_fresh_ids(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame([(i, i * 10) for i in range(6)], "k int, v int")
    dl.write_delta(df.repartition(2), loc, mode="overwrite")
    v_en = dl.enable_row_tracking(spark, loc)
    snap = dl.snapshot(loc)
    assert "rowTracking" in snap.protocol["writerFeatures"]
    assert snap.row_tracking_enabled
    assert snap.materialized_row_id_col and snap.materialized_rcv_col
    assert all(f.base_row_id is not None for f in snap.files)
    ids = _rt_ids(spark, loc)
    assert len(ids) == 6
    rid = [i for i, _ in ids.values()]
    assert len(set(rid)) == 6 and min(rid) == 0 and max(rid) == 5
    assert all(rcv == v_en for _, rcv in ids.values())
    # an append allocates past the high water mark
    dl.write_delta(
        spark.createDataFrame([(100, 1)], "k int, v int").coalesce(1), loc
    )
    ids2 = _rt_ids(spark, loc)
    assert ids2[100][0] == 6  # next fresh block starts at hwm+1
    assert all(ids2[k] == ids[k] for k in ids)  # old rows untouched


def test_row_tracking_stable_across_update_delete(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame([(i, i) for i in range(5)], "k int, v int")
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    dl.enable_row_tracking(spark, loc)
    before = _rt_ids(spark, loc)
    v_upd = dl.update_where(spark, loc, "k = 2", {"v": "99"})
    after = _rt_ids(spark, loc)
    # every row keeps its id; only the updated row's version bumps
    assert {k: i for k, (i, _) in after.items()} == {
        k: i for k, (i, _) in before.items()
    }
    assert after[2][1] == v_upd
    assert all(after[k][1] == before[k][1] for k in after if k != 2)
    dl.delete_where(spark, loc, "k = 0")
    final = _rt_ids(spark, loc)
    assert 0 not in final
    assert {k: v for k, v in after.items() if k != 0} == final


def test_row_tracking_merge_inherits_target_ids(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    dl.write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
        .coalesce(1), loc, mode="overwrite",
    )
    dl.enable_row_tracking(spark, loc)
    before = _rt_ids(spark, loc)
    src = spark.createDataFrame([(2, "B"), (3, "c")], "k int, s string")
    v_m = dl.merge_upsert(spark, loc, src.coalesce(1), ["k"])
    after = _rt_ids(spark, loc)
    rows = {
        r.k: r.s
        for r in dl.read_delta(spark, loc).collect()
    }
    assert rows == {1: "a", 2: "B", 3: "c"}
    assert after[1] == before[1]            # untouched row: id + rcv keep
    assert after[2][0] == before[2][0]      # matched row INHERITS its id
    assert after[2][1] == v_m               # ...with the merge's version
    assert after[3][0] > max(i for i, _ in before.values())  # fresh insert


def test_row_tracking_survives_dv_and_checkpoint(spark, loc):
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame([(i, i) for i in range(5)], "k int, v int")
    dl.write_delta(df.coalesce(1), loc, mode="overwrite")
    dl.enable_row_tracking(spark, loc)
    before = _rt_ids(spark, loc)
    dl.delete_where(spark, loc, "k = 1", use_dvs=True)
    after = _rt_ids(spark, loc)
    # DV delete: same physical file, survivors keep id AND version
    assert after == {k: v for k, v in before.items() if k != 1}
    # checkpoint + log cleanup: baseRowId must survive the replay
    dl.write_checkpoint_v2(loc)
    dl.clean_log(loc)
    assert _rt_ids(spark, loc) == after
    # purging the DV rewrites the file; ids still stable (materialized)
    dl.purge_deletion_vectors(spark, loc)
    assert _rt_ids(spark, loc) == after


def test_uniform_delete_syncs_incrementally(spark, loc):
    """Round 13 (the round-12 verdict's order item 8): a COW delete's
    remove+add commit mirrors incrementally — ONLY the prior manifest
    naming the removed file is rewritten without it, the untouched
    manifest carries over byte-identical, and the rewritten file lands
    in one new O(appended) manifest."""
    from spark_etl_framework_spark.functions.avro_ocf import read_ocf
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame([(i,) for i in range(6)], "id int")
    dl.write_delta(df.coalesce(2), loc, mode="overwrite")
    dl.enable_uniform(loc)
    dl.write_delta(
        spark.createDataFrame([(100,)], "id int").coalesce(1), loc
    )
    _meta1, _cur1, list1 = _mlist(loc)
    assert len(list1) == 2  # base mirror + incremental append
    append_manifest = list1[1]["manifest_path"]

    # COW delete rewrites exactly one of the two base files
    dl.delete_where(spark, loc, "id = 2")
    meta, cur, entries = _mlist(loc)
    assert cur["summary"]["operation"] == "overwrite"
    # base manifest REWRITTEN without the removed file, append manifest
    # verbatim, one new manifest for the rewritten file
    assert len(entries) == 3
    assert append_manifest in [mf["manifest_path"] for mf in entries]
    rewritten = [
        mf for mf in entries
        if mf.get("existing_data_files_count")
        and mf.get("deleted_data_files_count")
    ]
    assert len(rewritten) == 1  # O(affected): exactly one manifest touched
    _es, _em, kept = read_ocf(rewritten[0]["manifest_path"])
    assert len(kept) == 1  # the sibling base file survived in place
    got = sorted(r.id for r in ice.read_iceberg(spark, loc).collect())
    assert got == [0, 1, 3, 4, 5, 100]
    assert cur["summary"]["total-records"] == "6"
    assert cur["summary"]["deleted-data-files"] == "1"


def test_uniform_schema_change_falls_back_to_full_state(spark, loc):
    """metaData actions (schema evolution) are not incrementally
    mirrorable — the sync restates the full live set, exactly once."""
    from spark_etl_framework_spark.sources import deltalog as dl

    df = spark.createDataFrame([(i,) for i in range(4)], "id int")
    dl.write_delta(df.coalesce(2), loc, mode="overwrite")
    dl.enable_uniform(loc)
    dl.write_delta(
        spark.createDataFrame([(10, "x")], "id int, s string").coalesce(1),
        loc, merge_schema=True,
    )
    meta, cur, entries = _mlist(loc)
    assert cur["summary"]["operation"] == "overwrite"
    assert len(entries) == 1  # full mirror collapses back to one manifest
    assert cur["summary"]["total-records"] == "5"
    got = sorted(
        (r.id, r.s) for r in ice.read_iceberg(spark, loc).collect()
    )
    assert got == [(0, None), (1, None), (2, None), (3, None), (10, "x")]

"""Iceberg v3 variant type (round-15 order 3 — the read/write half the
delta side has had since round 12; iceberg-spec v3 §Variant).

Contract: variant is a format-version 3 type. Spark 4 owns the binary
encoding natively (parse_json / variant_get / to_json run JVM-side);
the engine adds the schema plumbing (``variant`` <-> VariantType),
the v3 gates (creation, add_column, merge_schema, read of a malformed
v1/v2 table), and the footer fallbacks (the local pyarrow predates the
VARIANT parquet logical type, so variant files carry no skipping
bounds — an optimization lost, never correctness).

Reference: the jar reads what a v3 writer wrote
(etl/source/IcebergReader.scala:12,23-30).
"""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.sources import iceberg as ice


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _variant_table(spark, loc, n=6):
    """id/s table upgraded to v3 with a variant column appended."""
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(n)], "id int, s string"
    )
    ice.write_iceberg(df.coalesce(1), loc, mode="overwrite")
    ice.upgrade_format_version(loc, 3)
    ice.add_column(loc, "v", "variant")
    vdf = spark.createDataFrame(
        [(i + 100, f"x{i}") for i in range(n)], "id int, s string"
    ).selectExpr(
        "id", "s",
        """parse_json(concat('{"k":', id, ',"tag":"', s, '"}')) AS v""",
    )
    ice.write_iceberg(vdf.coalesce(1), loc)
    return loc


def test_variant_roundtrip(spark, loc):
    _variant_table(spark, loc, n=4)
    out = ice.read_iceberg(spark, loc).selectExpr(
        "id",
        "CAST(variant_get(v, '$.k', 'int') AS INT) AS k",
        "to_json(v) AS j",
    )
    got = {r.id: (r.k, r.j) for r in out.collect()}
    # pre-addition rows read null variant
    for i in range(4):
        assert got[i] == (None, None)
    for i in range(4):
        assert got[i + 100] == (i + 100, '{"k":%d,"tag":"x%d"}' % (i + 100, i))


def test_variant_schema_maps_both_ways(spark, loc):
    _variant_table(spark, loc, n=2)
    meta = ice.load_metadata(loc)
    assert [f["type"] for f in meta["schema"]["fields"]][-1] == "variant"
    sch = ice.iceberg_to_spark_schema(meta["schema"])
    assert sch["v"].dataType.typeName() == "variant"


def test_variant_files_skip_bounds_not_rows(spark, loc):
    """Variant data files land with a correct record_count (the Spark
    count fallback — the local pyarrow cannot read VARIANT footers) and
    no lower/upper bounds; the pre-variant file keeps its bounds."""
    _variant_table(spark, loc, n=3)
    meta = ice.load_metadata(loc)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    files = ice._live_files(meta, snap)
    assert sum(f["record_count"] for f in files) == 6
    with_bounds = [f for f in files if f.get("lower_bounds")]
    without = [f for f in files if not f.get("lower_bounds")]
    assert len(with_bounds) == 1 and len(without) == 1
    assert with_bounds[0]["record_count"] == 3  # the pre-variant file
    assert without[0]["record_count"] == 3      # the variant file


def test_variant_needs_v3_at_creation(spark, loc):
    vdf = spark.range(2).selectExpr(
        "CAST(id AS INT) id", "parse_json('{\"a\":1}') AS v"
    )
    with pytest.raises(ValueError, match="format-version 3"):
        ice.write_iceberg(vdf.coalesce(1), loc, mode="overwrite")


def test_variant_needs_v3_via_merge_schema(spark, loc):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    ice.write_iceberg(df.coalesce(1), loc, mode="overwrite")
    vdf = df.selectExpr("id", "s", "parse_json('{\"a\":1}') AS v")
    with pytest.raises(ValueError, match="format-version"):
        ice.write_iceberg(vdf.coalesce(1), loc, merge_schema=True)


def test_add_column_variant_needs_v3(spark, loc):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    ice.write_iceberg(df.coalesce(1), loc, mode="overwrite")
    with pytest.raises(ValueError, match="format-version 3"):
        ice.add_column(loc, "v", "variant")


def test_variant_default_refuses(spark, loc):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    ice.write_iceberg(df.coalesce(1), loc, mode="overwrite")
    ice.upgrade_format_version(loc, 3)
    with pytest.raises(ValueError, match="defaults"):
        ice.add_column(loc, "v", "variant", default='{"a":1}')


def test_variant_identifier_field_refuses(spark, loc):
    _variant_table(spark, loc, n=2)
    with pytest.raises(ValueError, match="variant"):
        ice.set_identifier_fields(loc, ["v"])


def test_variant_survives_row_level_delete(spark, loc):
    """MoR DELETE on a variant table: the DV applies, surviving rows
    keep their variant bytes intact."""
    _variant_table(spark, loc, n=3)
    ice.delete_where(spark, loc, "id = 101")
    out = ice.read_iceberg(spark, loc).selectExpr(
        "id", "variant_get(v, '$.k', 'int') AS k"
    )
    got = {r.id: r.k for r in out.collect()}
    assert 101 not in got
    assert got[100] == 100 and got[102] == 102
    assert set(got) == {0, 1, 2, 100, 102}

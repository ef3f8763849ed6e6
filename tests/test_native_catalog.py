"""Native warehouse catalog (sources/catalog.py): jar-free ``table=``
resolution for the Delta/Iceberg actors — the reference reads/writes
these by catalog name through the jar's catalog plugin
(etl/source/DeltaReader.scala:10-31, etl/source/IcebergReader.scala:12);
without the jar the actors now resolve names against the engine's own
metadata-only catalog instead of raising."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.sinks.connectors import DeltaWriter, IcebergWriter
from spark_etl_framework_spark.sources import catalog as cat
from spark_etl_framework_spark.sources.connectors import DeltaReader, IcebergReader


def _jctx(spark):
    return JobContext(PipelineContext(), spark)


def _name() -> str:
    return f"t_{uuid.uuid4().hex[:10]}"


def test_parse_name_shapes():
    assert cat.parse_name("orders") == ("default", "orders")
    assert cat.parse_name("lake.orders") == ("lake", "orders")
    with pytest.raises(ValueError):
        cat.parse_name("/tmp/orders")  # path, not a name
    with pytest.raises(ValueError):
        cat.parse_name("a.b.c")
    with pytest.raises(ValueError):
        cat.parse_name("bad-name!")


def test_register_resolve_drop_roundtrip(spark, tmp_path):
    name = f"lake.{_name()}"
    loc = str(tmp_path / "t")
    entry = cat.register_table(spark, name, "delta", loc)
    assert entry["location"] == os.path.abspath(loc)
    assert cat.resolve_table(spark, name) == entry
    # idempotent on identical registration
    assert cat.register_table(spark, name, "delta", loc) == entry
    # conflicting repoint refuses
    with pytest.raises(ValueError, match="already registered"):
        cat.register_table(spark, name, "delta", str(tmp_path / "elsewhere"))
    with pytest.raises(ValueError, match="already registered"):
        cat.register_table(spark, name, "iceberg", loc)
    assert name in cat.list_tables(spark, "lake")
    assert cat.drop_table(spark, name)
    assert cat.resolve_table(spark, name) is None
    assert not cat.drop_table(spark, name)


def test_delta_by_name_roundtrip_and_time_travel(spark, tmp_path):
    name = _name()
    cat.register_table(spark, name, "delta", str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(20)], "id int, name string, grp int"
    )
    df.createOrReplaceTempView("_cat_v0")
    df.filter("grp <> 2").createOrReplaceTempView("_cat_v1")
    jctx = _jctx(spark)
    DeltaWriter(view="_cat_v0", table=name, mode="overwrite").run(jctx, spark)
    DeltaWriter(view="_cat_v1", table=name, mode="overwrite").run(jctx, spark)

    assert DeltaReader(table=name).run(jctx, spark).count() == df.filter(
        "grp <> 2"
    ).count()
    r = DeltaReader(table=name)
    r._props["options.versionAsOf"] = "0"
    assert r.run(jctx, spark).count() == 20
    cat.drop_table(spark, name)


def test_delta_write_by_name_auto_creates_managed(spark):
    name = f"default.{_name()}"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    df.createOrReplaceTempView("_cat_mg")
    jctx = _jctx(spark)
    try:
        DeltaWriter(view="_cat_mg", table=name, mode="overwrite").run(jctx, spark)
        entry = cat.resolve_table(spark, name)
        assert entry is not None and entry["format"] == "delta"
        assert entry["location"] == os.path.abspath(
            cat.default_location(spark, name)
        )
        out = DeltaReader(table=name).run(jctx, spark)
        assert sorted(r.v for r in out.collect()) == ["a", "b"]
        # append lands in the SAME resolved location as a new version
        DeltaWriter(view="_cat_mg", table=name, mode="append").run(jctx, spark)
        assert DeltaReader(table=name).run(jctx, spark).count() == 4
    finally:
        entry = cat.resolve_table(spark, name)
        cat.drop_table(spark, name)
        if entry and os.path.isdir(entry["location"]):
            shutil.rmtree(entry["location"], ignore_errors=True)


def test_iceberg_by_name_roundtrip(spark, tmp_path):
    name = f"lake.{_name()}"
    cat.register_table(spark, name, "iceberg", str(tmp_path / "ice"))
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id int, grp int"
    )
    df.createOrReplaceTempView("_cat_ice")
    jctx = _jctx(spark)
    IcebergWriter(view="_cat_ice", table=name, mode="overwrite").run(jctx, spark)
    out = IcebergReader(table=name).run(jctx, spark)
    assert out.count() == 10
    # the reader's filter= post-filter applies on the resolved table
    out2 = IcebergReader(table=name, filter="grp = 0").run(jctx, spark)
    assert out2.count() == 5
    cat.drop_table(spark, name)


def test_unregistered_name_raises_actionable(spark):
    jctx = _jctx(spark)
    with pytest.raises(RuntimeError, match="unavailable") as ei:
        DeltaReader(table=f"nope.{_name()}").run(jctx, spark)
    assert "native catalog" in str(ei.value.__cause__)
    with pytest.raises(RuntimeError, match="unavailable") as ei:
        IcebergReader(table=f"nope.{_name()}").run(jctx, spark)
    assert "native catalog" in str(ei.value.__cause__)


def test_format_mismatch_on_write_refuses(spark, tmp_path):
    name = f"lake.{_name()}"
    cat.register_table(spark, name, "delta", str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "id int")
    df.createOrReplaceTempView("_cat_mm")
    with pytest.raises(ValueError, match="registered as 'delta'"):
        IcebergWriter(view="_cat_mm", table=name, mode="overwrite").run(
            _jctx(spark), spark
        )
    cat.drop_table(spark, name)

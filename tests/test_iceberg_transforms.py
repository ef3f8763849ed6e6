"""Iceberg partition TRANSFORMS — hidden partitioning (round 9).

sources/icetransforms.py implements the spec's derived partitioning
(iceberg.apache.org/spec/#partition-transforms): bucket[N] over Murmur3
of the single-value serialization, truncate[W], year/month/day/hour.
The hash is pinned against the TEST VECTORS PUBLISHED IN THE SPEC's
Appendix B — if our murmur3 diverges from Iceberg's by one bit, every
bucket assignment (and therefore jar interoperability) is wrong, so
those constants are the load-bearing assertions here. The integration
half pins the writer's partition tuples, pruning on SOURCE-column
predicates (the "hidden" in hidden partitioning), DML, streaming, and
the spec-mismatch guard.
"""

from __future__ import annotations

import datetime as dt
import struct

import pytest

from spark_etl_framework_spark.sources import iceberg as ice
from spark_etl_framework_spark.sources import icetransforms as tr
from pyspark.sql import types as T


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _df(spark, n=200):
    rows = [
        (
            i,
            f"s{i % 7}",
            dt.date(2020, 1 + i % 12, 1 + i % 28),
            dt.datetime(2020, 1, 1, i % 24, 30),
        )
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "id int, s string, d date, ts timestamp"
    )


# ---------------------------------------------------------------------------
# murmur3 / bucket against the spec's Appendix B vectors
# ---------------------------------------------------------------------------


def test_murmur3_matches_iceberg_spec_appendix_b():
    # int and long 34 widen to the same 8-byte little-endian long
    assert tr.murmur3_32(struct.pack("<q", 34)) == 2017239379
    # string hashes its UTF-8 bytes
    assert tr.murmur3_32(b"iceberg") == 1210000089
    # date 2017-11-16 = 17486 days since epoch, hashed as long
    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert days == 17486
    assert tr.murmur3_32(struct.pack("<q", days)) == -653330422
    # timestamp 2017-11-16T22:31:08 UTC in microseconds, hashed as long
    us = int(
        dt.datetime(
            2017, 11, 16, 22, 31, 8, tzinfo=dt.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    assert tr.murmur3_32(struct.pack("<q", us)) == -2047944441


def test_vectorized_murmur3_agrees_with_scalar():
    import numpy as np

    vals = np.array(
        [0, 1, -1, 34, 2**40, -(2**40), 2**63 - 1, -(2**63), 123456789],
        dtype=np.int64,
    )
    vec = list(tr.murmur3_32_long_np(vals))
    ref = [tr.murmur3_32(struct.pack("<q", int(v))) for v in vals]
    assert vec == ref


def test_bucket_value_and_int_long_agreement():
    # spec rule: bucket(34 as int) == bucket(34 as long) via long widening
    assert tr.bucket_value(34, T.IntegerType(), 16) == tr.bucket_value(
        34, T.LongType(), 16
    )
    assert 0 <= tr.bucket_value(34, T.IntegerType(), 16) < 16
    assert tr.bucket_value("iceberg", T.StringType(), 16) == (
        1210000089 & 0x7FFFFFFF
    ) % 16
    assert tr.bucket_value(None, T.IntegerType(), 16) is None


def test_parse_and_literals():
    spec = tr.parse_partition_spec(
        ["bucket(4, id)", "day(ts)", "truncate(3, s)", "grp"]
    )
    assert [e["name"] for e in spec] == ["id_bucket", "ts_day", "s_trunc", "grp"]
    assert [e["transform"] for e in spec] == [
        "bucket[4]", "day", "truncate[3]", "identity",
    ]
    with pytest.raises(ValueError, match="unparseable"):
        tr.parse_partition_spec(["bucket(id)"])
    # temporal literals (spec: periods since 1970-01-01)
    e = {"transform": "day", "param": None}
    assert tr.transform_literal(e, "2017-11-16", T.DateType()) == 17486
    e = {"transform": "month", "param": None}
    assert tr.transform_literal(e, "2017-11-16", T.DateType()) == 574
    e = {"transform": "year", "param": None}
    assert tr.transform_literal(e, "2017-11-16", T.DateType()) == 47
    # truncate: floored for negatives (spec), prefix for strings
    e = {"transform": "truncate[10]", "param": 10}
    assert tr.transform_literal(e, -1, T.IntegerType()) == -10
    assert tr.transform_literal(e, 19, T.IntegerType()) == 10
    e = {"transform": "truncate[2]", "param": 2}
    assert tr.transform_literal(e, "iceberg", T.StringType()) == "ic"
    assert tr.is_order_preserving("truncate[4]")
    assert tr.is_order_preserving("day")
    assert not tr.is_order_preserving("bucket[4]")


# ---------------------------------------------------------------------------
# write / read / prune integration
# ---------------------------------------------------------------------------


def test_hidden_partition_write_tuple_and_readback(spark, loc):
    rows, df = _df(spark)
    ice.write_iceberg(
        df, loc, mode="overwrite", partition_by=["bucket(4, id)", "month(d)"]
    )
    meta = ice.load_metadata(loc)
    assert [(f["name"], f["transform"]) for f in meta["partition-spec"]] == [
        ("id_bucket", "bucket[4]"), ("d_month", "month"),
    ]
    files = ice._live_files(meta, ice._pick_snapshot(meta))
    # every file's tuple matches the spec transforms of its rows
    for f in files:
        assert 0 <= f["partition"]["id_bucket"] < 4
        assert f["partition"]["d_month"] >= (2020 - 1970) * 12
    # the SOURCE columns stay in the data files (hidden partitioning),
    # and the output schema is exactly the table schema
    out = ice.read_iceberg(spark, loc)
    assert out.columns == ["id", "s", "d", "ts"]
    assert sorted(r.id for r in out.collect()) == list(range(200))
    import pyarrow.parquet as pq

    names = set(pq.ParquetFile(files[0]["file_path"]).schema_arrow.names)
    assert "id" in names and "d" in names
    assert "id_bucket" not in names and "d_month" not in names


def test_bucket_prunes_equality_and_month_prunes_range(spark, loc):
    rows, df = _df(spark)
    ice.write_iceberg(
        df, loc, mode="overwrite", partition_by=["bucket(4, id)", "month(d)"]
    )
    meta = ice.load_metadata(loc)
    total = len(ice._live_files(meta, ice._pick_snapshot(meta)))
    pruned = ice.read_iceberg(spark, loc, where="id = 34")
    assert [r.id for r in pruned.collect()] == [34]
    assert len(pruned.inputFiles()) < total
    pm = ice.read_iceberg(spark, loc, where="d >= '2020-11-01'")
    want = sorted(i for i in range(200) if rows[i][2] >= dt.date(2020, 11, 1))
    assert sorted(r.id for r in pm.collect()) == want
    assert len(pm.inputFiles()) < total


def test_truncate_and_hour_transforms(spark, loc):
    rows, df = _df(spark)
    ice.write_iceberg(
        df, loc, mode="overwrite", partition_by=["truncate(2, s)", "hour(ts)"]
    )
    meta = ice.load_metadata(loc)
    total = len(ice._live_files(meta, ice._pick_snapshot(meta)))
    pt = ice.read_iceberg(spark, loc, where="s = 's3'")
    assert sorted(r.id for r in pt.collect()) == [
        i for i in range(200) if i % 7 == 3
    ]
    assert len(pt.inputFiles()) < total


def test_spec_mismatch_rejected_and_dml_on_hidden_partitions(spark, loc):
    rows, df = _df(spark, n=60)
    ice.write_iceberg(
        df, loc, mode="overwrite", partition_by=["bucket(4, id)", "month(d)"]
    )
    with pytest.raises(ValueError, match="partition spec"):
        ice.write_iceberg(
            df.limit(1), loc, partition_by=["bucket(8, id)", "month(d)"]
        )
    # append with the identical spec is fine
    ice.write_iceberg(df.limit(2), loc, partition_by=["bucket(4, id)", "month(d)"])
    assert ice.read_iceberg(spark, loc).count() == 62
    # MoR delete / row-delta update / equality-delete merge / compaction
    ice.delete_where(spark, loc, "id < 5")
    ice.update_where(spark, loc, "id = 10", {"s": "'upd'"})
    src = spark.createDataFrame(
        [(999, "new", dt.date(2021, 1, 1), dt.datetime(2021, 1, 1))],
        "id int, s string, d date, ts timestamp",
    )
    ice.merge_upsert(spark, loc, src, ["id"])
    ice.rewrite_data_files(spark, loc)
    out = ice.read_iceberg(spark, loc)
    assert out.filter("id < 5").count() == 0
    assert {r.s for r in out.filter("id = 10").collect()} == {"upd"}
    assert out.filter("id = 999").count() == 1
    # compaction restaged under the SAME hidden spec
    meta = ice.load_metadata(loc)
    files = ice._live_files(meta, ice._pick_snapshot(meta))
    assert all("id_bucket" in f["partition"] for f in files)


def test_stream_source_over_hidden_partitioned_table(spark, loc):
    import uuid as _uuid

    from spark_etl_framework_spark.sources.iceberg import IcebergLogDataSource
    from spark_etl_framework_spark.sources.pysource import (
        register_python_source,
    )

    rows, df = _df(spark, n=20)
    ice.write_iceberg(
        df, loc, mode="overwrite", partition_by=["bucket(2, id)", "year(d)"]
    )
    register_python_source(spark, IcebergLogDataSource)
    qname = f"ice_hidden_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("iceberglog").option("path", loc).load()
        .writeStream.format("memory").queryName(qname)
        .trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(qname)
    assert out.columns == ["id", "s", "d", "ts"]
    assert sorted(r.id for r in out.collect()) == list(range(20))


# ---------------------------------------------------------------------------
# property pins
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=50))
def test_vectorized_murmur_equals_scalar_property(vals):
    import numpy as np

    arr = np.array(vals, dtype=np.int64)
    assert list(tr.murmur3_32_long_np(arr)) == [
        tr.murmur3_32(struct.pack("<q", int(v))) for v in vals
    ]


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1),
       st.integers(min_value=1, max_value=1000))
def test_truncate_is_floored_and_order_preserving(v, w):
    e = {"transform": f"truncate[{w}]", "param": w}
    t = tr.transform_literal(e, v, T.IntegerType())
    # spec: v - (v mod W) with floored modulo — result <= v, multiple of W
    assert t % w == 0 and t <= v < t + w
    # order preservation at the boundary
    t2 = tr.transform_literal(e, v + 1, T.IntegerType())
    assert t2 >= t

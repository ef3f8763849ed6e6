"""Round-10 advisor fixes — pins for four silent-wrong-result classes.

1. Pruning literals under a NON-UTC session timezone: a naive timestamp
   literal in a predicate means an instant in ``spark.sql.session.timeZone``
   (Spark's own literal rule); the hour/bucket transform literals must
   resolve through the same zone or hidden-partition pruning drops files
   that contain matching rows (sources/icetransforms.py:session_tzinfo).
2. bucket[N] over int64 values above 2^53 with nulls in the batch: a null
   used to widen the Arrow batch to float64 and corrupt the hash input —
   nulls now mask JVM-side so the batch stays exact int64.
3. Derived partition-field names colliding with real schema columns used
   to silently overwrite (then drop) the data column — now rejected.
4. CONVERT on a directory with heterogeneous parquet footers used to
   silently lose columns absent from the sampled footer — now loud.
"""

from __future__ import annotations

import datetime as dt
import struct

import pytest

from pyspark.sql import types as T
from spark_etl_framework_spark.sources import iceberg as ice
from spark_etl_framework_spark.sources import icetransforms as tr
from spark_etl_framework_spark.sources.deltalog import convert_to_delta


# ---------------------------------------------------------------------------
# 1. session-timezone-aware pruning literals
# ---------------------------------------------------------------------------


def test_session_tzinfo_resolution():
    assert tr.session_tzinfo("UTC") is dt.timezone.utc
    assert tr.session_tzinfo(None) is dt.timezone.utc
    assert tr.session_tzinfo("Etc/UTC") is dt.timezone.utc
    assert tr.session_tzinfo("GMT+8").utcoffset(None) == dt.timedelta(hours=8)
    assert tr.session_tzinfo("+01:00").utcoffset(None) == dt.timedelta(hours=1)
    assert tr.session_tzinfo("-0530").utcoffset(None) == -dt.timedelta(
        hours=5, minutes=30
    )
    z = tr.session_tzinfo("America/New_York")
    assert z is not None and str(z) == "America/New_York"
    assert tr.session_tzinfo("Not/AZone") is None


def test_hour_literal_respects_session_tz():
    e = {"transform": "hour", "param": None}
    utc_h = tr.transform_literal(
        e, "2024-01-01 00:00:00", T.TimestampType(), tz="UTC"
    )
    off_h = tr.transform_literal(
        e, "2024-01-01 00:00:00", T.TimestampType(), tz="GMT+8"
    )
    # the same wall clock in +08:00 is an instant 8 hours EARLIER
    assert utc_h - off_h == 8
    # unresolvable zone: never prune (None = not computable)
    assert (
        tr.transform_literal(
            e, "2024-01-01 00:00:00", T.TimestampType(), tz="Not/AZone"
        )
        is None
    )


def test_bucket_timestamp_literal_respects_session_tz():
    e = {"transform": "bucket[1048576]", "param": 1 << 20}
    # the spec's Appendix-B vector: 2017-11-16T22:31:08 UTC
    b_utc = tr.transform_literal(
        e, "2017-11-16 22:31:08", T.TimestampType(), tz="UTC"
    )
    us = int(
        dt.datetime(
            2017, 11, 16, 22, 31, 8, tzinfo=dt.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    assert b_utc == ((-2047944441) & 0x7FFFFFFF) % (1 << 20)
    # the same wall clock read under +01:00 is one hour earlier in epoch
    b_off = tr.transform_literal(
        e, "2017-11-16 22:31:08", T.TimestampType(), tz="+01:00"
    )
    want = (
        tr.murmur3_32(struct.pack("<q", us - 3_600_000_000)) & 0x7FFFFFFF
    ) % (1 << 20)
    assert b_off == want
    assert (
        tr.transform_literal(
            e, "2017-11-16 22:31:08", T.TimestampType(), tz="Not/AZone"
        )
        is None
    )


def test_hour_partition_prune_correct_under_non_utc_session(spark, tmp_path):
    """End-to-end: hour-partitioned write + predicate read under a
    non-UTC session must return exactly the matching rows (the round-10
    advisor scenario: UTC-assumed literals dropped files silently)."""
    loc = str(tmp_path / "t")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        # a zone EAST of UTC: the old UTC-assumed literal overshoots the
        # true instant, so `>=` pruning dropped files with matching rows
        spark.conf.set("spark.sql.session.timeZone", "GMT+8")
        # tz-pinned instants (i:30 UTC) — independent of the driver's
        # local zone, which is what naive datetimes would resolve through
        rows = [
            (i, dt.datetime(2024, 1, 1, i, 30, tzinfo=dt.timezone.utc))
            for i in range(24)
        ]
        df = spark.createDataFrame(rows, "id int, ts timestamp")
        ice.write_iceberg(df, loc, mode="overwrite", partition_by=["hour(ts)"])
        # '12:00 +08:00' = 04:00Z — rows 4..23 match; the pre-fix literal
        # (12:00Z) pruned the 04:30Z..11:30Z files away
        out = ice.read_iceberg(spark, loc, where="ts >= '2024-01-01 12:00:00'")
        assert sorted(r.id for r in out.collect()) == list(range(4, 24))
        loc2 = str(tmp_path / "t2")
        ice.write_iceberg(
            df, loc2, mode="overwrite", partition_by=["bucket(4, ts)"]
        )
        # '13:30 +08:00' = 05:30Z = row 5's instant
        out2 = ice.read_iceberg(spark, loc2, where="ts = '2024-01-01 13:30:00'")
        assert [r.id for r in out2.collect()] == [5]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# ---------------------------------------------------------------------------
# 2. bucket[N] exactness above 2^53 with nulls in the batch
# ---------------------------------------------------------------------------


def test_bucket_long_exact_above_2_53_with_nulls(spark):
    big = (1 << 60) + 3  # loses low bits if routed through float64
    e = tr.parse_partition_spec(["bucket(8, v)"])[0]
    df = spark.createDataFrame([(1, big), (2, None)], "k int, v long")
    got = {
        r.k: r.b
        for r in df.select(
            "k", tr.transform_column(e, T.LongType()).alias("b")
        ).collect()
    }
    assert got[1] == tr.bucket_value(big, T.LongType(), 8)
    assert got[2] is None


# ---------------------------------------------------------------------------
# 3. derived-name collisions with real columns
# ---------------------------------------------------------------------------


def test_partition_name_collision_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 99)], "id int, d date, d_month int"
    )
    with pytest.raises(ValueError, match="collides"):
        ice.write_iceberg(
            df, str(tmp_path / "t"), mode="overwrite", partition_by=["month(d)"]
        )


# ---------------------------------------------------------------------------
# 4. CONVERT rejects heterogeneous footers
# ---------------------------------------------------------------------------


def _mixed_footer_dir(spark, tmp_path, name):
    d = str(tmp_path / name)
    spark.createDataFrame([(1, "a")], "id int, s string").coalesce(1)\
        .write.mode("append").parquet(d)
    spark.createDataFrame([(2, "b", 1.5)], "id int, s string, extra double")\
        .coalesce(1).write.mode("append").parquet(d)
    return d


def test_convert_to_delta_rejects_heterogeneous_footers(spark, tmp_path):
    d = _mixed_footer_dir(spark, tmp_path, "dmix")
    with pytest.raises(ValueError, match="heterogeneous"):
        convert_to_delta(spark, d)


def test_convert_to_iceberg_rejects_heterogeneous_footers(spark, tmp_path):
    d = _mixed_footer_dir(spark, tmp_path, "imix")
    with pytest.raises(ValueError, match="heterogeneous"):
        ice.convert_to_iceberg(spark, d)

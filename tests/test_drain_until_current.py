"""streaming.drain_until_current — the one-shot drain for rate-limited
log stream sources (round 13; closes the PARITY.md caveat that
availableNow / processAllAvailable may return between paced batches).

Contract: given a RUNNING paced stream, one call polls until the query's
committed end offset reaches the table's metadata head (delta: latest
log version; iceberg: snapshot count) and returns that offset, with
exactly-once results; a terminated query and a non-table path refuse.
"""

from __future__ import annotations

import uuid as _uuid

import pytest

from spark_etl_framework_spark.sources import deltalog as dl
from spark_etl_framework_spark.sources import iceberg as ice
from spark_etl_framework_spark.streaming import drain_until_current


def _append(spark, loc, rows):
    df = spark.createDataFrame(rows, "id int, v double")
    return dl.write_delta(df.coalesce(1), loc, mode="append")


def test_delta_paced_stream_drains_in_one_call(spark, tmp_path):
    from spark_etl_framework_spark.sources.deltalog import DeltaLogDataSource
    from spark_etl_framework_spark.sources.pysource import (
        register_python_source,
    )

    loc = str(tmp_path / "t")
    for i in range(6):  # v0-v5: backlog of 6 versions, cap 2
        _append(spark, loc, [(i, float(i))])
    register_python_source(spark, DeltaLogDataSource)
    qname = f"drain_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("deltalog")
        .option("path", loc)
        .option("maxVersionsPerTrigger", "2")
        .load()
        .writeStream.format("memory")
        .queryName(qname)
        .start()
    )
    try:
        off = drain_until_current(q, loc)
        assert off == dl.latest_version(loc) == 5
        got = sorted(r.id for r in spark.table(qname).collect())
        assert got == list(range(6))  # exactly-once, fully drained
        batches = [
            p.numInputRows for p in (q.recentProgress or [])
            if p.numInputRows > 0
        ]
        assert len(batches) >= 3 and all(n <= 2 for n in batches)
    finally:
        q.stop()


def test_iceberg_paced_stream_drains_in_one_call(spark, tmp_path):
    from spark_etl_framework_spark.sources.iceberg import IcebergLogDataSource

    loc = str(tmp_path / "t")
    for i in range(4):
        ice.write_iceberg(
            spark.createDataFrame([(i,)], "id int").coalesce(1), loc,
            mode="append",
        )
    try:
        spark.dataSource.register(IcebergLogDataSource)
    except Exception:  # noqa: BLE001 - already registered by another test
        pass
    qname = f"draini_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("iceberglog")
        .option("path", loc)
        .option("maxSnapshotsPerTrigger", "1")
        .load()
        .writeStream.format("memory")
        .queryName(qname)
        .start()
    )
    try:
        off = drain_until_current(q, loc)
        assert off == 4  # snapshot count
        got = sorted(r.id for r in spark.table(qname).collect())
        assert got == [0, 1, 2, 3]
    finally:
        q.stop()


def test_terminated_query_refuses(spark, tmp_path):
    from spark_etl_framework_spark.sources.deltalog import DeltaLogDataSource
    from spark_etl_framework_spark.sources.pysource import (
        register_python_source,
    )

    loc = str(tmp_path / "t")
    _append(spark, loc, [(1, 1.0)])
    register_python_source(spark, DeltaLogDataSource)
    qname = f"drainx_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("deltalog")
        .option("path", loc)
        .load()
        .writeStream.format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    with pytest.raises(RuntimeError, match="RUNNING query"):
        drain_until_current(q, loc)


def test_non_table_path_refuses(spark, tmp_path):
    with pytest.raises(ValueError, match="neither a delta"):
        drain_until_current(None, str(tmp_path))


def test_multi_source_query_refuses(spark, tmp_path):
    """Round-14 order item 7: a union/join-of-streams query reports
    several sources — comparing sources[0] against one table's head
    would silently drain the wrong source; refuse loudly instead."""
    loc = str(tmp_path / "t")
    _append(spark, loc, [(1, 1.0)])

    class _TwoSourceQuery:
        isActive = True
        lastProgress = {
            "sources": [
                {"endOffset": '{"version": 5}'},
                {"endOffset": '{"version": 3}'},
            ]
        }

        def processAllAvailable(self):
            return None

    with pytest.raises(ValueError, match="single-source"):
        drain_until_current(_TwoSourceQuery(), loc)

"""HBase connector e2e over the REST (Stargate) protocol
(sources/stargate.py): CellSet JSON with base64 keys/columns/values,
stateful scanners drained to the 204, key/timestamp-bounded scans, the
``columnsMapping`` + ``__:rowKey`` channel contract, and range-sliced
executor scans — driven live against an in-process MiniStargateServer
that shares only HTTP bytes with the client. Un-gates the reference's
HBase actors when a deployment exposes the REST server
(etl/source/HBaseReader.scala:12,30-37, etl/common/io/
HBaseChannel.scala:26,46-108; the hbase-spark jar stays preferred).
"""

from __future__ import annotations

import time

import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.sources.stargate import (
    MiniStargateServer,
    StargateClient,
    read_table,
)


@pytest.fixture()
def hbase_srv():
    srv = MiniStargateServer()
    yield srv
    srv.shutdown()


def _jctx(spark):
    return JobContext(PipelineContext(), spark)


def _reader(srv, **kw):
    from spark_etl_framework_spark.sources.optional import HBaseReader

    r = HBaseReader(
        connection_table="t",
        connection_restHost="127.0.0.1",
        connection_restPort=srv.port,
        ddlSchemaString="id bigint, name string, score double",
        **kw,
    )
    r._props["columnsMapping.id"] = "__:rowKey"
    r._props["columnsMapping.name"] = "cf:name"
    r._props["columnsMapping.score"] = "cf:score"
    return r


def _writer(srv, view, mode="merge"):
    from spark_etl_framework_spark.sinks.optional import HBaseWriter

    w = HBaseWriter(
        connection_table="t",
        connection_restHost="127.0.0.1",
        connection_restPort=srv.port,
        rowKey_columns="id",
        view=view,
        mode=mode,
    )
    w._props["columnsMapping.name"] = "cf:name"
    w._props["columnsMapping.score"] = "cf:score"
    w._props["columnsMapping.id"] = "cf:id"
    return w


# ---------------------------------------------------------------------------
# wire protocol (no Spark)
# ---------------------------------------------------------------------------


def test_put_get_scan_delete(hbase_srv):
    c = StargateClient("127.0.0.1", hbase_srv.port)
    try:
        c.put_rows("t", {"r1": {"d:a": b"1", "d:b": b"x"}, "r2": {"d:a": b"2"}})
        assert c.get_row("t", "r1") == {"d:a": b"1", "d:b": b"x"}
        assert c.get_row("t", "missing") is None
        assert [(k, cells["d:a"]) for k, cells in c.scanner("t")] == [
            ("r1", b"1"), ("r2", b"2")]
        # [start, stop) bounds
        assert [k for k, _ in c.scanner("t", "r2")] == ["r2"]
        assert [k for k, _ in c.scanner("t", None, "r2")] == ["r1"]
        c.delete_row("t", "r1")
        assert c.get_row("t", "r1") is None
    finally:
        c.close()


def test_scanner_batches_until_204(hbase_srv):
    c = StargateClient("127.0.0.1", hbase_srv.port)
    try:
        c.put_rows(
            "big", {f"k{i:04d}": {"d:v": str(i).encode()} for i in range(95)}
        )
        got = [k for k, _ in c.scanner("big", batch=10)]  # 10 GETs then 204
        assert got == sorted(f"k{i:04d}" for i in range(95))
    finally:
        c.close()


def test_timestamp_bounded_scan(hbase_srv):
    c = StargateClient("127.0.0.1", hbase_srv.port)
    try:
        now = int(time.time() * 1000)
        c.put_rows("ts", {"old": {"d:v": b"1"}})
        # forge an older timestamp directly in the store
        with hbase_srv._lock:
            cell, _ts = hbase_srv._tables["ts"]["old"]["d:v"], None
            hbase_srv._tables["ts"]["old"]["d:v"] = (cell[0], now - 100_000)
        c.put_rows("ts", {"new": {"d:v": b"2"}})
        fresh = [k for k, _ in c.scanner("ts", start_time=now - 1000)]
        assert fresh == ["new"]
        stale = [k for k, _ in c.scanner("ts", end_time=now - 1000)]
        assert stale == ["old"]
    finally:
        c.close()


# ---------------------------------------------------------------------------
# Spark actors over the wire
# ---------------------------------------------------------------------------


def test_writer_then_reader_typed_roundtrip(spark, hbase_srv):
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(40)],
        "id bigint, name string, score double",
    )
    df.createOrReplaceTempView("hb_in")
    _writer(hbase_srv, "hb_in").run(_jctx(spark), spark)
    # wire shape: one row per key, cells routed through columnsMapping
    t = hbase_srv.table("t")
    assert len(t) == 40
    assert t["7"] == {"cf:id": b"7", "cf:name": b"n7", "cf:score": b"10.5"}

    out = _reader(hbase_srv).run(_jctx(spark), spark)
    assert out.schema.simpleString() == "struct<id:bigint,name:string,score:double>"
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {i: (f"n{i}", i * 1.5) for i in range(40)}


def test_key_prefix_and_bounds(spark, hbase_srv):
    df = spark.createDataFrame(
        [(i, f"n{i}", 0.0) for i in range(30)], "id bigint, name string, score double"
    )
    df.createOrReplaceTempView("hb_pref")
    _writer(hbase_srv, "hb_pref").run(_jctx(spark), spark)
    # keyPrefix "1" matches 1, 10..19 as STRING keys (HBase key order)
    out = _reader(hbase_srv, keyPrefix="1").run(_jctx(spark), spark)
    assert sorted(r.id for r in out.collect()) == [1] + list(range(10, 20))
    out2 = _reader(hbase_srv, keyStart="20", keyStop="25").run(_jctx(spark), spark)
    assert sorted(r.id for r in out2.collect()) == [20, 21, 22, 23, 24]


def test_overwrite_truncates_first(spark, hbase_srv):
    spark.createDataFrame([(1, "old", 0.0)], "id bigint, name string, score double"
                          ).createOrReplaceTempView("hb_o1")
    spark.createDataFrame([(2, "new", 0.0)], "id bigint, name string, score double"
                          ).createOrReplaceTempView("hb_o2")
    _writer(hbase_srv, "hb_o1").run(_jctx(spark), spark)
    _writer(hbase_srv, "hb_o2", mode="overwrite").run(_jctx(spark), spark)
    assert list(hbase_srv.table("t")) == ["2"]


def test_read_range_partitioned_tasks(spark, hbase_srv):
    """Scale shape: the driver samples key boundaries; each task drains
    its own [start, stop) scanner — the region-parallel scan model."""
    c = StargateClient("127.0.0.1", hbase_srv.port)
    try:
        c.put_rows(
            "wide",
            {f"k{i:05d}": {"cf:name": f"n{i}".encode(), "cf:score": b"0.5"}
             for i in range(1000)},
        )
    finally:
        c.close()
    df = read_table(
        spark, "127.0.0.1", hbase_srv.port, "wide",
        {"key": "__:rowKey", "name": "cf:name"},
        ddl="key string, name string",
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.filter("name = 'n999'").collect()[0].key == "k00999"


def test_unreachable_rest_server_errors_clearly(spark):
    from spark_etl_framework_spark.sinks.optional import HBaseWriter
    from spark_etl_framework_spark.sources.optional import HBaseReader

    spark.range(1).selectExpr("id", "'x' as name", "0.5 as score"
                              ).createOrReplaceTempView("hb_one")
    r = HBaseReader(
        connection_table="t", connection_restHost="127.0.0.1",
        connection_restPort=1,
    )
    r._props["columnsMapping.id"] = "__:rowKey"
    with pytest.raises(RuntimeError, match="unavailable"):
        r.run(_jctx(spark), spark)
    with pytest.raises(RuntimeError, match="unavailable"):
        HBaseWriter(
            connection_table="t", connection_restHost="127.0.0.1",
            connection_restPort=1, rowKey_columns="id", view="hb_one",
        ).run(_jctx(spark), spark)


def test_stream_sink_foreachbatch_to_live_hbase(spark, hbase_srv, tmp_path):
    """Streaming sink evidence for the un-gated connector: micro-batches
    land as multi-row CellSet PUTs through the batch HBaseWriter — the
    reference's HBase stream-sink shape, against a LIVE REST server."""
    from spark_etl_framework_spark.streaming.writers import (
        ForeachBatchConnectorStreamWriter,
    )

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, f"n{i}", i * 0.5) for i in range(9)],
        "id bigint, name string, score double",
    ).coalesce(1).write.parquet(str(src))
    sdf = spark.readStream.schema("id bigint, name string, score double").parquet(
        str(src)
    )
    sdf.createOrReplaceTempView("hbase_stream_in")
    w = ForeachBatchConnectorStreamWriter(
        view="hbase_stream_in",
        batchWriter="spark_etl_framework_spark.sinks.optional.HBaseWriter",
        checkpointLocation=str(tmp_path / "ckpt"),
        trigger_mode="once",
        test_waittimeMS=30_000,
    )
    w._props.update(
        {
            "sink.connection_table": "t",
            "sink.connection_restHost": "127.0.0.1",
            "sink.connection_restPort": hbase_srv.port,
            "sink.rowKey_columns": "id",
        }
    )
    w.run(_jctx(spark), spark)
    t = hbase_srv.table("t")
    assert len(t) == 9
    assert t["4"]["d:name"] == b"n4"  # default family when unmapped

"""Redis connector e2e over the engine's own RESP2 wire: an in-process
MiniRedisServer (sources/resp.py) drives the actors' full contract —
driver SCAN + executor-side pipelined HGETALLs, per-partition pipelined
HSET writes, typed DDL casts, keyColumn, auth/dbNum, overwrite.
"""

from __future__ import annotations

import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.sinks.optional import RedisWriter
from spark_etl_framework_spark.sources.optional import RedisReader
from spark_etl_framework_spark.sources.resp import MiniRedisServer, RespClient


@pytest.fixture()
def redis_srv():
    srv = MiniRedisServer()
    yield srv
    srv.shutdown()


def _jctx(spark):
    return JobContext(PipelineContext(), spark)


def test_redis_writer_then_reader_typed_roundtrip(spark, redis_srv):
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(40)], "id bigint, name string, score double"
    )
    df.createOrReplaceTempView("rr_in")
    RedisWriter(
        host="127.0.0.1", port=redis_srv.port, table="people", view="rr_in",
        keyColumn="id",
    ).run(_jctx(spark), spark)
    # wire shape: one hash per row at people:<id>, key column NOT duplicated
    t = redis_srv.table()
    assert len(t) == 40
    assert t["people:7"] == {"name": "n7", "score": "10.5"}

    out = RedisReader(
        host="127.0.0.1", port=redis_srv.port, table="people",
        ddlSchemaString="id bigint, name string, score double", keyColumn="id",
    ).run(_jctx(spark), spark)
    assert out.schema.simpleString() == "struct<id:bigint,name:string,score:double>"
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {i: (f"n{i}", i * 1.5) for i in range(40)}


def test_redis_reader_infers_string_schema_without_ddl(spark, redis_srv):
    c = RespClient("127.0.0.1", redis_srv.port)
    c.command("HSET", "t:1", "a", "1", "b", "x")
    c.command("HSET", "t:2", "a", "2", "b", "y")
    c.close()
    out = RedisReader(host="127.0.0.1", port=redis_srv.port, table="t").run(
        _jctx(spark), spark
    )
    assert out.schema.simpleString() == "struct<a:string,b:string>"
    assert {(r.a, r.b) for r in out.collect()} == {("1", "x"), ("2", "y")}


def test_redis_overwrite_and_auth_and_db(spark):
    srv = MiniRedisServer(requirepass="pw")
    try:
        spark.createDataFrame([(1, "a")], "id bigint, v string").createOrReplaceTempView(
            "rw_a"
        )
        spark.createDataFrame([(2, "b")], "id bigint, v string").createOrReplaceTempView(
            "rw_b"
        )
        kw = dict(host="127.0.0.1", port=srv.port, table="t", auth="pw", dbNum=3,
                  keyColumn="id")
        RedisWriter(view="rw_a", **kw).run(_jctx(spark), spark)
        RedisWriter(view="rw_b", mode="overwrite", **kw).run(_jctx(spark), spark)
        assert srv.table(3) == {"t:2": {"v": "b"}}  # overwrite cleared t:1
        out = RedisReader(
            ddlSchemaString="id bigint, v string", **kw
        ).run(_jctx(spark), spark)
        assert [(r.id, r.v) for r in out.collect()] == [(2, "b")]
        # wrong password -> unavailable wrap carries the server's error
        with pytest.raises(Exception, match="invalid password"):
            RedisReader(
                host="127.0.0.1", port=srv.port, table="t", auth="nope",
                ddlSchemaString="id bigint",
            ).run(_jctx(spark), spark)
    finally:
        srv.shutdown()


def test_redis_error_paths(spark, redis_srv):
    with pytest.raises(ValueError, match="host/table required"):
        RedisReader().run(_jctx(spark), spark)
    with pytest.raises(ValueError, match="mode must be"):
        RedisWriter(host="h", table="t", view="v", mode="upsert").run(
            _jctx(spark), spark
        )
    with pytest.raises(Exception, match="empty and no ddlSchemaString"):
        RedisReader(
            host="127.0.0.1", port=redis_srv.port, table="nothing"
        ).run(_jctx(spark), spark)


def test_redis_pipeline_yaml_roundtrip(spark, redis_srv):
    """The connector through the FRAMEWORK: redis-writer then
    redis-reader wired by alias in a pipeline definition."""
    from spark_etl_framework_spark.plans.builder import build_pipeline
    from spark_etl_framework_spark.plans.runner import PipelineRunner

    defn = {
        "version": "1.0.0",
        "name": "redis-rt",
        "jobs": [
            {
                "name": "main",
                "actions": [
                    {
                        "name": "make",
                        "actor": {
                            "type": "sql",
                            "properties": {
                                "sqlString": "select id, id * 2 as dbl from range(10)",
                            },
                        },
                        "output-view": {"name": "rp_src"},
                    },
                    {
                        "name": "store",
                        "actor": {
                            "type": "redis-writer",
                            "properties": {
                                "host": "127.0.0.1",
                                "port": str(redis_srv.port),
                                "table": "rng",
                                "keyColumn": "id",
                            },
                        },
                        "input-views": ["rp_src"],
                    },
                    {
                        "name": "load",
                        "actor": {
                            "type": "redis-reader",
                            "properties": {
                                "host": "127.0.0.1",
                                "port": str(redis_srv.port),
                                "table": "rng",
                                "ddlSchemaString": "id bigint, dbl bigint",
                                "keyColumn": "id",
                            },
                        },
                        "output-view": {"name": "rp_back", "global": "true"},
                    },
                ],
            }
        ],
    }
    PipelineRunner(spark).run(build_pipeline(defn, spark=spark))
    back = spark.table("global_temp.rp_back")
    assert {(r.id, r.dbl) for r in back.collect()} == {(i, 2 * i) for i in range(10)}


def test_redis_stream_writer_foreachbatch_live(spark, redis_srv, tmp_path):
    """RedisStreamWriter path end-to-end against the live RESP server:
    file stream -> foreachBatch -> the (now real) redis-writer per
    micro-batch. Previously this shape was contract-tested only; the
    un-gated connector makes it a genuine streaming sink test."""
    from spark_etl_framework_spark.streaming.readers import FileStreamReader
    from spark_etl_framework_spark.streaming.writers import (
        ForeachBatchConnectorStreamWriter,
    )

    d = tmp_path / "in"
    d.mkdir()
    (d / "part-0.csv").write_text("1,alpha\n2,beta\n3,gamma\n")
    jctx = JobContext(PipelineContext(), spark)
    df = FileStreamReader(
        format="csv", fileUri=str(d), ddlSchemaString="id int, word string"
    ).run(jctx, spark)
    jctx.register_view("rs_in", df)
    ForeachBatchConnectorStreamWriter(
        view="rs_in",
        batchWriter="redis-writer",
        checkpointLocation=str(tmp_path / "ckpt"),
        sink={
            "host": "127.0.0.1",
            "port": str(redis_srv.port),
            "table": "words",
            "keyColumn": "id",
        },
        trigger={"mode": "once"},
        test={"waittimeMS": 30000},
    ).run(jctx, spark)
    assert redis_srv.table() == {
        "words:1": {"word": "alpha"},
        "words:2": {"word": "beta"},
        "words:3": {"word": "gamma"},
    }


def test_redis_stream_reader_xadd_microbatches(spark, redis_srv, tmp_path):
    """RedisStreamReader fallback end-to-end: XADD entries land on the
    live server, the micro-batch source delivers exactly the new slice
    per trigger ((start, end] XRANGE), per-stream order is preserved,
    typed casts apply, and a second processAllAvailable with no new
    entries delivers nothing."""
    import uuid

    from spark_etl_framework_spark.streaming.readers import RedisStreamReader

    c = RespClient("127.0.0.1", redis_srv.port)
    for i in range(5):
        c.command("XADD", "tx", "*", "user", f"u{i % 2}", "amount", str(i * 10))
    jctx = JobContext(PipelineContext(), spark)
    df = RedisStreamReader(
        host="127.0.0.1",
        port=redis_srv.port,
        streamKey="tx",
        ddlSchemaString="user string, amount int",
    ).run(jctx, spark)
    assert df.isStreaming
    qname = f"redis_stream_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table(qname).collect()
        assert len(rows) == 5
        assert {(r.user, r.amount) for r in rows} == {
            (f"u{i % 2}", i * 10) for i in range(5)
        }
        assert all(r["__stream"] == "tx" for r in rows)
        # ids are monotonic in delivery order
        ids = [tuple(map(int, r["__entry_id"].split("-"))) for r in rows]
        assert ids == sorted(ids)
        # late entries arrive in the NEXT batch, earlier ones never re-deliver
        c.command("XADD", "tx", "*", "user", "u9", "amount", "999")
        q.processAllAvailable()
        rows2 = spark.table(qname).collect()
        assert len(rows2) == 6
        assert sum(1 for r in rows2 if r.user == "u9") == 1
    finally:
        q.stop()
        c.close()

"""Mongo connector e2e over the engine's own wire (sources/bsonwire.py):
BSON bytes validated against the spec's canonical example, OP_MSG
framing, cursor paging via getMore, and the actors' full contract driven
live against an in-process MiniMongoServer — range-partitioned executor
reads (mongo-spark's default partitioner), batched per-task inserts,
overwrite-drops-first. Un-gates the reference's Mongo actors
(etl/source/MongoReader.scala:12,20-34, etl/sink/MongoWriter.scala).
"""

from __future__ import annotations

import datetime as dt

import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.sources.bsonwire import (
    MiniMongoServer,
    MongoWireClient,
    decode_bson,
    encode_bson,
    read_collection,
)


@pytest.fixture()
def mongo_srv():
    srv = MiniMongoServer()
    yield srv
    srv.shutdown()


def _jctx(spark):
    return JobContext(PipelineContext(), spark)


# ---------------------------------------------------------------------------
# BSON bytes vs the public spec
# ---------------------------------------------------------------------------


def test_bson_canonical_example_and_roundtrip():
    # bsonspec.org's canonical example: {"hello": "world"}
    assert encode_bson({"hello": "world"}) == bytes.fromhex(
        "160000000268656c6c6f0006000000776f726c640000"
    )
    doc = {
        "i": 5, "big": 2**40, "f": 1.5, "s": "x", "b": True, "n": None,
        "bin": b"\x01\x02", "arr": [1, "two", None], "sub": {"k": "v"},
        "ts": dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
    }
    assert decode_bson(encode_bson(doc)) == doc


def test_bson_size_mismatch_fails_loudly():
    raw = bytearray(encode_bson({"a": 1}))
    raw[0] += 1  # corrupt the declared size
    with pytest.raises(ValueError, match="size mismatch"):
        decode_bson(bytes(raw))


def test_bson_int32_int64_boundary():
    small = encode_bson({"v": 2**31 - 1})
    big = encode_bson({"v": 2**31})
    assert small[4] == 0x10 and big[4] == 0x12  # int32 vs int64 element type
    assert decode_bson(small)["v"] == 2**31 - 1
    assert decode_bson(big)["v"] == 2**31


# ---------------------------------------------------------------------------
# live server RPCs (no Spark)
# ---------------------------------------------------------------------------


def test_wire_rpcs_against_live_server(mongo_srv):
    c = MongoWireClient("127.0.0.1", mongo_srv.port)
    try:
        assert c.insert_many("db", "t", [{"_id": i, "v": i * i} for i in range(25)]) == 25
        assert c.count("db", "t") == 25
        got = list(c.find("db", "t", {"_id": {"$gte": 5, "$lt": 8}}))
        assert [(d["_id"], d["v"]) for d in got] == [(5, 25), (6, 36), (7, 49)]
        # cursor paging: batchSize smaller than the result set
        paged = list(c.find("db", "t", batch_size=7))
        assert len(paged) == 25
        proj = list(c.find("db", "t", {"_id": 3}, projection={"_id": 1}))
        assert proj == [{"_id": 3}]
        assert c.delete_all("db", "t") == 25
        assert c.count("db", "t") == 0
    finally:
        c.close()


# ---------------------------------------------------------------------------
# Spark actors over the wire
# ---------------------------------------------------------------------------


def test_writer_then_reader_typed_roundtrip(spark, mongo_srv):
    from spark_etl_framework_spark.sinks.optional import MongoWriter
    from spark_etl_framework_spark.sources.optional import MongoReader

    df = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(40)],
        "id bigint, name string, score double",
    )
    df.createOrReplaceTempView("mg_in")
    MongoWriter(
        host="127.0.0.1", port=mongo_srv.port, database="db", collection="people",
        view="mg_in", idColumn="id",
    ).run(_jctx(spark), spark)
    # wire shape: _id is the id column, other fields as-is
    stored = {d["_id"]: d for d in mongo_srv.collection("db", "people")}
    assert len(stored) == 40 and stored[7]["name"] == "n7"

    out = MongoReader(
        host="127.0.0.1", port=mongo_srv.port, database="db", collection="people",
        ddlSchemaString="_id bigint, name string, score double",
    ).run(_jctx(spark), spark)
    assert out.schema.simpleString() == "struct<_id:bigint,name:string,score:double>"
    rows = {r._id: (r.name, r.score) for r in out.collect()}
    assert rows == {i: (f"n{i}", i * 1.5) for i in range(40)}


def test_overwrite_drops_then_writes(spark, mongo_srv):
    from spark_etl_framework_spark.sinks.optional import MongoWriter

    spark.createDataFrame([(1, "old")], "id bigint, v string").createOrReplaceTempView(
        "mg_o1"
    )
    spark.createDataFrame([(2, "new")], "id bigint, v string").createOrReplaceTempView(
        "mg_o2"
    )
    w = dict(host="127.0.0.1", port=mongo_srv.port, database="db",
             collection="ow", idColumn="id")
    MongoWriter(view="mg_o1", **w).run(_jctx(spark), spark)
    MongoWriter(view="mg_o2", mode="overwrite", **w).run(_jctx(spark), spark)
    assert [d["v"] for d in mongo_srv.collection("db", "ow")] == ["new"]


def test_read_range_partitioned_tasks(spark, mongo_srv):
    """Scale shape: the driver samples _id boundaries; each task finds
    its own $gte/$lt slice — no task reads the whole collection."""
    c = MongoWireClient("127.0.0.1", mongo_srv.port)
    try:
        c.insert_many(
            "db", "wide", [{"_id": i, "v": f"x{i}"} for i in range(1000)]
        )
    finally:
        c.close()
    df = read_collection(
        spark, "127.0.0.1", mongo_srv.port, "db", "wide",
        ddl="_id bigint, v string", num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.agg({"_id": "sum"}).collect()[0][0] == 999 * 1000 // 2


def test_unreachable_server_errors_clearly(spark):
    from spark_etl_framework_spark.sinks.optional import MongoWriter
    from spark_etl_framework_spark.sources.optional import MongoReader

    spark.range(1).createOrReplaceTempView("mg_one")
    with pytest.raises(RuntimeError, match="unavailable"):
        MongoReader(host="127.0.0.1", port=1, database="d", collection="c").run(
            _jctx(spark), spark
        )
    with pytest.raises(RuntimeError, match="unavailable"):
        MongoWriter(
            host="127.0.0.1", port=1, database="d", collection="c", view="mg_one"
        ).run(_jctx(spark), spark)


def test_stream_sink_foreachbatch_to_live_mongo(spark, mongo_srv, tmp_path):
    """Streaming sink evidence for the un-gated connector: a rate-less
    file stream drains into Mongo through ForeachBatchConnectorStreamWriter
    reusing the batch MongoWriter per micro-batch — the reference's
    MongoStreamWriter shape (etl/sink/MongoStreamWriter.scala:76-81),
    now against a LIVE wire server."""
    from spark_etl_framework_spark.streaming.writers import (
        ForeachBatchConnectorStreamWriter,
    )

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(12)], "id bigint, name string"
    ).coalesce(1).write.parquet(str(src))
    sdf = spark.readStream.schema("id bigint, name string").parquet(str(src))
    sdf.createOrReplaceTempView("mongo_stream_in")
    w = ForeachBatchConnectorStreamWriter(
        view="mongo_stream_in",
        batchWriter="spark_etl_framework_spark.sinks.optional.MongoWriter",
        checkpointLocation=str(tmp_path / "ckpt"),
        trigger_mode="once",
        test_waittimeMS=30_000,
    )
    w._props.update(
        {
            "sink.host": "127.0.0.1",
            "sink.port": mongo_srv.port,
            "sink.database": "db",
            "sink.collection": "evts",
            "sink.idColumn": "id",
        }
    )
    w.run(_jctx(spark), spark)
    stored = {d["_id"]: d["name"] for d in mongo_srv.collection("db", "evts")}
    assert stored == {i: f"n{i}" for i in range(12)}

"""Arrow Flight connector e2e: a real in-process gRPC server
(sources/flight_server.py) drives the full client contract — schema via
GetFlightInfo, endpoint→partition mapping, per-task DoGet/DoPut — plus
the actor surface and its error paths.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from spark_etl_framework_spark.sources.flight import register_flight_source
from spark_etl_framework_spark.sources.flight_server import InMemoryFlightServer


@pytest.fixture(scope="module")
def flight_srv():
    srv = InMemoryFlightServer()
    srv.serve(
        "people",
        pa.table(
            {
                "pid": list(range(40)),
                "name": [f"p{i}" for i in range(40)],
                "score": [i * 0.5 for i in range(40)],
            }
        ),
        endpoints=4,
    )
    yield srv
    srv.shutdown()


def test_flight_endpoints_become_scan_partitions(spark, flight_srv):
    """The connector's scale story: N flight endpoints MUST map to N scan
    partitions, each fetching only its own ticket."""
    register_flight_source(spark)
    df = (
        spark.read.format("flight")
        .option("host", "127.0.0.1")
        .option("port", str(flight_srv.port))
        .option("table", "people")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 40
    assert df.schema.simpleString() == "struct<pid:bigint,name:string,score:double>"
    got = {(r.pid, r.name) for r in df.collect()}
    assert got == {(i, f"p{i}") for i in range(40)}


def test_flight_actor_roundtrip_read_transform_write(spark, flight_srv):
    """FlightReader -> transform -> FlightWriter against the live server:
    what lands on the server equals the transform of what it served."""
    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
    from spark_etl_framework_spark.sinks.optional import FlightWriter
    from spark_etl_framework_spark.sources.optional import FlightReader

    jctx = JobContext(PipelineContext(), spark)
    df = FlightReader(host="127.0.0.1", port=flight_srv.port, table="people").run(
        jctx, spark
    )
    df.filter("pid % 2 = 0").selectExpr(
        "pid", "upper(name) as name", "score * 2 as score"
    ).createOrReplaceTempView("fl_out")
    FlightWriter(
        host="127.0.0.1", port=flight_srv.port, table="evens", view="fl_out"
    ).run(jctx, spark)
    landed = flight_srv.table("evens")
    assert landed.num_rows == 20
    d = dict(zip(landed.column("pid").to_pylist(), landed.column("name").to_pylist()))
    assert d[4] == "P4" and set(d) == set(range(0, 40, 2))


def test_flight_writer_one_doput_per_task(spark):
    """Write parallelism = DataFrame partitioning: a 3-partition write
    lands as 3 DoPut streams (the server logs one merge per put)."""
    srv = InMemoryFlightServer()
    try:
        register_flight_source(spark)
        df = spark.range(30).selectExpr("id as k")
        df.repartition(3).write.format("flight").option(
            "host", "127.0.0.1"
        ).option("port", str(srv.port)).option("table", "sink").mode(
            "append"
        ).save()
        assert srv.table("sink").num_rows == 30
        assert sorted(srv.table("sink").column("k").to_pylist()) == list(range(30))
    finally:
        srv.shutdown()


def test_flight_error_paths(spark, flight_srv):
    from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
    from spark_etl_framework_spark.sinks.optional import FlightWriter
    from spark_etl_framework_spark.sources.optional import FlightReader

    jctx = JobContext(PipelineContext(), spark)
    with pytest.raises(ValueError, match="host/table required"):
        FlightReader(table="x").run(jctx, spark)
    with pytest.raises(ValueError, match="host/table/view required"):
        FlightWriter(host="h").run(jctx, spark)
    # unknown dataset surfaces the connector-unavailable wrap with the
    # server's error inside
    with pytest.raises(Exception, match="no_such"):
        FlightReader(
            host="127.0.0.1", port=flight_srv.port, table="no_such"
        ).run(jctx, spark).collect()
    # overwrite is rejected by the sink contract
    spark.range(3).createOrReplaceTempView("fl_bad")
    with pytest.raises(Exception, match="overwrite"):
        FlightWriter(
            host="127.0.0.1",
            port=flight_srv.port,
            table="t",
            view="fl_bad",
            mode="overwrite",
        ).run(jctx, spark)


def test_flight_pipeline_yaml_roundtrip(spark, flight_srv):
    """The connector through the FRAMEWORK: a pipeline definition wires
    flight-reader -> sql-transformer -> flight-writer by alias."""
    from spark_etl_framework_spark.plans.builder import build_pipeline
    from spark_etl_framework_spark.plans.runner import PipelineRunner

    defn = {
        "version": "1.0.0",
        "name": "flight-rt",
        "jobs": [
            {
                "name": "main",
                "actions": [
                    {
                        "name": "read",
                        "actor": {
                            "type": "flight-reader",
                            "properties": {
                                "host": "127.0.0.1",
                                "port": str(flight_srv.port),
                                "table": "people",
                            },
                        },
                        "output-view": {"name": "fp_in"},
                    },
                    {
                        "name": "top",
                        "actor": {
                            "type": "sql-transformer",
                            "properties": {
                                "sqlString": "select pid, score from fp_in where score >= 15",
                            },
                        },
                        "input-views": ["fp_in"],
                        "output-view": {"name": "fp_top"},
                    },
                    {
                        "name": "write",
                        "actor": {
                            "type": "flight-writer",
                            "properties": {
                                "host": "127.0.0.1",
                                "port": str(flight_srv.port),
                                "table": "top_scores",
                            },
                        },
                        "input-views": ["fp_top"],
                    },
                ],
            }
        ],
    }
    PipelineRunner(spark).run(build_pipeline(defn, spark=spark))
    landed = flight_srv.table("top_scores")
    assert sorted(landed.column("pid").to_pylist()) == list(range(30, 40))

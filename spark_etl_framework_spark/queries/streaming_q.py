"""Streaming queries under the oracle gate.

Structured Streaming over the static events parquet, driven to completion
with ``processAllAvailable`` — the stream's complete-mode output must
hash-match the same aggregation's BATCH oracle, proving the streaming
operators (watermark, window, stateful agg) compute identical semantics.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dsum, register


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (nanos ts → µs timestamp), same
    conversion as the batch path in catalog.load_table.

    FileStreamSource requires a directory; the testdata is a single file, so
    expose it through a per-sf temp directory of symlinks (testdata itself is
    read-only)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream_dir = f"/tmp/_spark_etl_stream_src_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    file_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    sdf = spark.readStream.schema(file_schema).parquet(stream_dir)
    if dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf


@register(
    "stream_tumbling_window",
    oracle="""
    WITH ev AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events)
    SELECT CAST(make_timestamp((epoch_ms(ts) // 600000) * 600000000) AS VARCHAR)
               AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)     AS total_value
    FROM ev GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 10-minute tumbling window aggregate with a 10-minute
    watermark, complete output mode, bounded by processAllAvailable; the
    result table must equal the batch oracle — same window semantics batch
    or stream."""
    sdf = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    qname = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


@register(
    "stream_stateful_running_stats",
    oracle="""
    WITH ev AS (SELECT user_id, value FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)     AS total_value,
           round(min(value), 4)     AS min_value,
           round(max(value), 4)     AS max_value
    FROM ev GROUP BY user_id
    """,
)
def stream_stateful_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming (applyInPandasWithState): per-user
    count/sum/min/max maintained in explicit GroupState, update mode; the
    final state per user must equal the batch aggregate oracle."""
    import pandas as pd

    from ..streaming.stateful import ArbitraryStatefulProcessor

    class RunningStats(ArbitraryStatefulProcessor):
        group_keys = ("user_id",)
        output_schema = (
            "user_id bigint, n_events bigint, total_value double, "
            "min_value double, max_value double"
        )
        state_schema = "n bigint, s double, mn double, mx double"
        output_mode = "update"
        timeout_conf = "NoTimeout"

        def process_group(self, key, batches, state):
            n, s, mn, mx = state.get if state.exists else (0, 0.0, None, None)
            for pdf in batches:
                v = pdf["value"]
                n += len(pdf)
                s += float(v.sum())
                mn = float(v.min()) if mn is None else min(mn, float(v.min()))
                mx = float(v.max()) if mx is None else max(mx, float(v.max()))
            state.update((n, s, mn, mx))
            yield pd.DataFrame(
                [
                    {
                        "user_id": int(key[0]),
                        "n_events": n,
                        "total_value": s,
                        "min_value": mn,
                        "max_value": mx,
                    }
                ]
            )

    sdf = _events_stream(spark, sf_dir).select("user_id", "value")
    out = RunningStats().transform_state(sdf)
    qname = f"stream_state_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(qname).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per key per trigger: keep the LAST emitted
    # row per user (the final state)
    from pyspark.sql import Window as W

    t = spark.table(qname).withColumn("__seq", F.monotonically_increasing_id())
    w = W.partitionBy("user_id").orderBy(F.desc("__seq"))
    return (
        t.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 2).alias("total_value"),
            F.round("min_value", 4).alias("min_value"),
            F.round("max_value", 4).alias("max_value"),
        )
    )


@register(
    "stream_jdbc_sink_batchid",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
           CAST(0 AS BIGINT)        AS last_batch
    FROM events GROUP BY event_type
    """,
)
def stream_jdbc_sink_batchid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JDBC sink end to end: events stream → complete-mode
    aggregate → foreachBatch upserts through a real DBAPI database (sqlite)
    with the implicit ``@batchId`` parameter — then the sink table is read
    back and hash-checked against the batch oracle. One input file ⇒ one
    micro-batch, so every upserted row carries last_batch = 0 (the
    idempotence key a restarted job would use to skip replayed batches).
    Reference: etl/sink/JdbcStreamWriter.scala:61-86 + the @batchId contract
    in JdbcContinuousWriter.scala:189-191.
    """
    import os
    import sqlite3
    import tempfile

    from ..plans.context import JobContext, PipelineContext
    from ..streaming.writers import JdbcStreamWriter

    db = os.path.join(
        tempfile.mkdtemp(prefix="stream_jdbc_sink_"), "sink.db"
    )
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE event_stats ("
        "event_type TEXT PRIMARY KEY, n INT, total_value REAL, last_batch INT)"
    )
    conn.commit()
    conn.close()

    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total_value"))
    )
    jctx = JobContext(PipelineContext(), spark)
    jctx.register_view(f"ev_agg_{uuid.uuid4().hex[:8]}", agg)
    view_name = next(iter(jctx._view_dfs))
    JdbcStreamWriter(
        view=view_name,
        sinkStatement=(
            "INSERT INTO event_stats(event_type, n, total_value, last_batch) "
            "VALUES(@event_type, @n, @total_value, @batchId) "
            "ON CONFLICT(event_type) DO UPDATE SET n = excluded.n, "
            "total_value = excluded.total_value, last_batch = excluded.last_batch"
        ),
        connect="spark_etl_framework_spark.testing.sqlite_connect",
        connection={"url": db},
        outputMode="complete",
        numPartitions=1,
        batchSize=100,
        trigger={"mode": "once"},
        test={"waittimeMS": 60000},
    ).run(jctx, spark)
    jctx.cleanup()

    rows = sqlite3.connect(db).execute(
        "SELECT event_type, n, total_value, last_batch FROM event_stats"
    ).fetchall()
    return spark.createDataFrame(
        [(r[0], int(r[1]), float(r[2]), int(r[3])) for r in rows],
        "event_type string, n bigint, total_value double, last_batch bigint",
    )

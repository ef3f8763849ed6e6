"""Streaming: file stream → transform → memory sink; stateful processor via
applyInPandasWithState; bounded by processAllAvailable for determinism."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pytest

from spark_etl_framework_spark.plans.context import JobContext, PipelineContext
from spark_etl_framework_spark.streaming.readers import FileStreamReader, FlatStreamReader
from spark_etl_framework_spark.streaming.stateful import ArbitraryStatefulProcessor
from spark_etl_framework_spark.streaming.writers import MemoryStreamWriter


@pytest.fixture
def jctx(spark):
    return JobContext(PipelineContext(), spark)


def _write_csv(tmp_path, name: str, text: str) -> str:
    d = tmp_path / name
    d.mkdir()
    (d / "part-0.csv").write_text(text)
    return str(d)


def test_file_stream_reader_to_memory(spark, jctx, tmp_path):
    uri = _write_csv(tmp_path, "s1", "1,a\n2,b\n3,a\n")
    r = FileStreamReader(
        format="csv", fileUri=uri, ddlSchemaString="id int, tag string", addTimestamp="true"
    )
    df = r.run(jctx, spark)
    assert df.isStreaming and "__timestamp" in df.columns
    jctx.register_view("s1_view", df)
    MemoryStreamWriter(view="s1_view", queryName="s1_out").run(jctx, spark)
    out = spark.sql("select id, tag from s1_out").collect()
    assert sorted(r["id"] for r in out) == [1, 2, 3]


def test_flat_stream_reader_positional(spark, jctx, tmp_path):
    uri = _write_csv(tmp_path, "s2", "user00001 5\nuser00002 7\n")
    r = FlatStreamReader(
        fileUri=uri,
        ddlFieldsString="user:1-9 string, event:11-1 long",
        watermark={"timeField": "__timestamp", "delayThreshold": "1 minute"},
        addTimestamp="true",
    )
    df = r.run(jctx, spark)
    assert df.isStreaming
    jctx.register_view("s2_view", df)
    MemoryStreamWriter(view="s2_view", queryName="s2_out").run(jctx, spark)
    rows = spark.sql("select user, event from s2_out").collect()
    assert {(r["user"], r["event"]) for r in rows} == {("user00001", 5), ("user00002", 7)}


def test_stateful_processor(spark, jctx, tmp_path):
    # NB: defined inside the test so cloudpickle serializes the class by
    # value — executor workers can't import test modules.
    class MinMaxAge(ArbitraryStatefulProcessor):
        """Per-gender min/max age — the reference's UserStatefulProcessor
        shape (reference: src/test/scala/.../UserStatefulProcessor.scala:29-44)."""

        group_keys = ("gender",)
        output_schema = "gender string, minage int, maxage int, n bigint"
        state_schema = "minage int, maxage int, n bigint"
        output_mode = "update"
        timeout_conf = "NoTimeout"

        def process_group(
            self, key, batches: Iterator[pd.DataFrame], state
        ) -> Iterator[pd.DataFrame]:
            mn, mx, n = state.get if state.exists else (None, None, 0)
            for pdf in batches:
                ages = pdf["age"]
                mn = int(ages.min()) if mn is None else min(mn, int(ages.min()))
                mx = int(ages.max()) if mx is None else max(mx, int(ages.max()))
                n += len(pdf)
            state.update((mn, mx, n))
            yield pd.DataFrame([{"gender": key[0], "minage": mn, "maxage": mx, "n": n}])

    uri = _write_csv(tmp_path, "s3", "m,30\nf,25\nm,40\nf,35\nm,20\n")
    df = FileStreamReader(
        format="csv", fileUri=uri, ddlSchemaString="gender string, age int"
    ).run(jctx, spark)
    out = MinMaxAge().transform_state(df)
    jctx.register_view("s3_view", out)
    MemoryStreamWriter(view="s3_view", queryName="s3_out", outputMode="update").run(
        jctx, spark
    )
    rows = {r["gender"]: r for r in spark.sql("select * from s3_out").collect()}
    assert rows["m"]["minage"] == 20 and rows["m"]["maxage"] == 40 and rows["m"]["n"] == 3
    assert rows["f"]["minage"] == 25 and rows["f"]["maxage"] == 35 and rows["f"]["n"] == 2


def test_tumbling_window_streaming_matches_batch(spark, jctx, sf_dir, tmp_path):
    """Same window() aggregation semantics batch vs stream (events table)."""
    from pyspark.sql import functions as F

    from spark_etl_framework_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    stream_dir = str(tmp_path / "ev_parquet")
    ev.write.parquet(stream_dir)
    sdf = (
        spark.readStream.schema(ev.schema)
        .parquet(stream_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    jctx.register_view("ev_win", sdf)
    MemoryStreamWriter(view="ev_win", queryName="ev_win_out", outputMode="complete").run(
        jctx, spark
    )
    got = {
        (str(r["w"]["start"]), r["event_type"]): r["n"]
        for r in spark.sql("select * from ev_win_out").collect()
    }
    want = {
        (str(r["w"]["start"]), r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_jdbc_stream_writer_foreachbatch_sqlite(spark, jctx, tmp_path):
    """Full streaming sink path: file stream → foreachBatch → partition-bounded
    batched upserts through a DBAPI connection, @batchId included
    (reference: JdbcStreamWriter.scala:61-86, JdbcContinuousWriter.scala:189-191)."""
    import sqlite3

    from spark_etl_framework_spark.streaming.writers import JdbcStreamWriter

    db = str(tmp_path / "stream_sink.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE user_states (user_id INT PRIMARY KEY, score REAL, batch INT)"
    )
    conn.commit()
    conn.close()

    uri = _write_csv(tmp_path, "s4", "1,0.9\n2,0.5\n3,0.7\n")
    df = FileStreamReader(
        format="csv", fileUri=uri, ddlSchemaString="user_id int, score double"
    ).run(jctx, spark)
    jctx.register_view("s4_view", df)
    JdbcStreamWriter(
        view="s4_view",
        sinkStatement=(
            "INSERT INTO user_states(user_id, score, batch) "
            "VALUES(@user_id, @score, @batchId) "
            "ON CONFLICT(user_id) DO UPDATE SET score = excluded.score"
        ),
        connect="spark_etl_framework_spark.testing.sqlite_connect",
        connection={"url": db},
        numPartitions=2,
        batchSize=2,
        trigger={"mode": "once"},
        test={"waittimeMS": 30000},
    ).run(jctx, spark)
    rows = sqlite3.connect(db).execute(
        "SELECT user_id, score, batch FROM user_states ORDER BY user_id"
    ).fetchall()
    assert [(r[0], r[1]) for r in rows] == [(1, 0.9), (2, 0.5), (3, 0.7)]
    assert all(r[2] == 0 for r in rows)  # first micro-batch id


def test_stateful_v2_contract_gated_or_runs(spark, jctx, tmp_path):
    """Spark 4's transformWithStateInPandas contract: if the environment
    has protobuf (the API's python-runner dependency), the v2 processor
    must produce the same per-gender min/max as the v1 test; without it,
    transform_state must raise the clear unavailable-error BEFORE any
    stream starts (not crash mid-query)."""
    from spark_etl_framework_spark.streaming.stateful import ArbitraryStatefulProcessorV2

    class MinMaxV2(ArbitraryStatefulProcessorV2):
        group_keys = ("gender",)
        output_schema = "gender string, minage int, maxage int, n bigint"
        state_schema = "minage int, maxage int, n bigint"

        def handle_input(self, key, batches, value_state):
            import pandas as pd

            lo, hi, n = (value_state.get() if value_state.exists() else (None, None, 0))
            for pdf in batches:
                m1, m2 = int(pdf["age"].min()), int(pdf["age"].max())
                lo = m1 if lo is None else min(lo, m1)
                hi = m2 if hi is None else max(hi, m2)
                n += len(pdf)
            value_state.update((lo, hi, n))
            yield pd.DataFrame([{"gender": key[0], "minage": lo, "maxage": hi, "n": n}])

    uri = _write_csv(tmp_path, "v2src", "m,20\nf,25\nm,40\nm,30\nf,35\n")
    sdf = spark.readStream.schema("gender string, age int").csv(uri)
    try:
        import google.protobuf.descriptor  # noqa: F401
        available = True
    except ImportError:
        available = False

    if not available:
        import pytest

        with pytest.raises(RuntimeError, match="transformWithStateInPandas unavailable"):
            MinMaxV2().transform_state(sdf)
        return

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out = MinMaxV2().transform_state(sdf)
    jctx.register_view("v2_view", out)
    MemoryStreamWriter(view="v2_view", queryName="v2_out", outputMode="update").run(jctx, spark)
    rows = {r["gender"]: r for r in spark.sql("select * from v2_out").collect()}
    assert rows["m"]["minage"] == 20 and rows["m"]["maxage"] == 40 and rows["m"]["n"] == 3
    assert rows["f"]["minage"] == 25 and rows["f"]["maxage"] == 35 and rows["f"]["n"] == 2


def test_docfeed_checkpoint_recovery_no_duplicates(spark, sf_dir, tmp_path):
    """Exactly-once across a RESTART: run the docfeed stream with a
    checkpoint, stop it mid-feed, start a NEW query from the same
    checkpoint — the union of both runs must contain every document
    exactly once (committed offsets resume, no replayed batch lands
    twice in the file sink)."""
    from pyspark.sql import functions as F

    from spark_etl_framework_spark.sources.pysource import register_python_sources

    register_python_sources(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        sdf = (
            spark.readStream.format("docfeed")
            .option("path", f"{sf_dir}/documents.parquet")
            .option("maxRowsPerBatch", "120")
            .load()
            .select("doc_id", F.length("text").alias("n"))
        )
        return (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    # let at least one micro-batch commit, then stop mid-feed
    import time as _t

    deadline = _t.time() + 60
    while _t.time() < deadline:
        lp = q.lastProgress
        if lp is not None and lp.numInputRows > 0:
            break
        _t.sleep(0.3)
    q.stop()

    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(out)
    total = got.count()
    distinct = got.select("doc_id").distinct().count()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert distinct == n_docs, f"missing docs: {distinct}/{n_docs}"
    assert total == n_docs, f"duplicates after recovery: {total} rows for {n_docs} docs"


# ---------------------------------------------------------------------------
# append-only contracts for the table-format stream sources (round 8):
# a row-level change must FAIL the stream loudly, not silently duplicate
# ---------------------------------------------------------------------------


def _drain_delta(spark, tbl, opts=None):
    import uuid as _uuid

    from spark_etl_framework_spark.sources.deltalog import DeltaLogDataSource

    try:
        spark.dataSource.register(DeltaLogDataSource)
    except Exception:  # noqa: BLE001 - already registered
        pass
    qname = f"delta_guard_{_uuid.uuid4().hex[:8]}"
    r = spark.readStream.format("deltalog").option("path", tbl)
    for k, v in (opts or {}).items():
        r = r.option(k, v)
    q = r.load().writeStream.format("memory").queryName(qname) \
        .trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


def test_delta_stream_fails_on_change_commit_unless_skipped(spark, tmp_path):
    from spark_etl_framework_spark.sources import deltalog as dl

    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(i, "x") for i in range(6)], "id int, v string")
    dl.write_delta(df.coalesce(1), tbl, mode="overwrite")
    dl.delete_where(spark, tbl, "id = 0", use_dvs=True)  # change commit v1
    dl.write_delta(
        spark.createDataFrame([(9, "y")], "id int, v string").coalesce(1),
        tbl, mode="append",
    )
    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        _drain_delta(spark, tbl).count()
    out = _drain_delta(spark, tbl, {"skipChangeCommits": "true"})
    # v0 and v2 stream; the change commit's rewritten adds skip wholesale
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4, 5, 9]
    # OPTIMIZE (dataChange=false) does not trip the guard
    dl.purge_deletion_vectors(spark, tbl)
    out2 = _drain_delta(spark, tbl, {"skipChangeCommits": "true"})
    assert sorted(r.id for r in out2.collect()) == [0, 1, 2, 3, 4, 5, 9]


def test_iceberg_stream_fails_on_row_level_change_unless_skipped(
    spark, tmp_path
):
    import uuid as _uuid

    from spark_etl_framework_spark.sources import iceberg as ice
    from spark_etl_framework_spark.sources.iceberg import IcebergLogDataSource

    try:
        spark.dataSource.register(IcebergLogDataSource)
    except Exception:  # noqa: BLE001
        pass
    loc = str(tmp_path / "t")
    ice.write_iceberg(
        spark.createDataFrame([(i, "x") for i in range(4)],
                              "id int, v string").coalesce(1),
        loc, mode="overwrite",
    )
    ice.delete_where(spark, loc, "id = 1")

    def drain(opts=None):
        qname = f"ice_guard_{_uuid.uuid4().hex[:8]}"
        r = spark.readStream.format("iceberglog").option("path", loc)
        for k, v in (opts or {}).items():
            r = r.option(k, v)
        q = r.load().writeStream.format("memory").queryName(qname) \
            .trigger(availableNow=True).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(qname)

    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        drain().count()
    out = drain({"streaming-skip-delete-snapshots": "true"})
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3]
    # compaction (replace) snapshots always skip silently
    ice.rewrite_data_files(spark, loc)
    out2 = drain({"streaming-skip-delete-snapshots": "true"})
    assert sorted(r.id for r in out2.collect()) == [0, 1, 2, 3]

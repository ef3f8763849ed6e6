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


def _file_stream_dir(sf_dir: str, filename: str, prefix: str) -> str:
    """Per-sf /tmp directory holding a symlink to one read-only testdata
    file (FileStreamSource needs a directory). Concurrent creation is
    tolerated, and a pre-existing link pointing at a DIFFERENT target
    (e.g. the sf dir moved between runs) is re-pointed rather than
    silently reused — a stale link would make the stream read old or no
    data while the oracle reads the new."""
    import os

    target = os.path.join(sf_dir, filename)
    stream_dir = f"/tmp/{prefix}_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, filename)
    try:
        os.symlink(target, link)
    except FileExistsError:
        # anything already at the path that is NOT a symlink to our target
        # (a regular file, or a link elsewhere) is stale data — remove and
        # re-link. Both steps tolerate a concurrent process doing the same
        # dance: a lost remove race is fine (FileNotFoundError), and a lost
        # link race is fine iff the winner linked the same target.
        if not (os.path.islink(link) and os.readlink(link) == target):
            try:
                os.remove(link)
            except FileNotFoundError:
                pass
            try:
                os.symlink(target, link)
            except FileExistsError:
                if not (os.path.islink(link) and os.readlink(link) == target):
                    raise
    # self-heal: any OTHER entry in the directory is foreign — a file a
    # past run (or an abandoned intermediate build) linked here would be
    # picked up by the schema'd FileStreamSource and corrupt the stream
    # (observed: a stray documents.parquet turned events keys into NaN).
    for entry in os.listdir(stream_dir):
        if entry != filename:
            try:
                os.remove(os.path.join(stream_dir, entry))
            except FileNotFoundError:
                pass
    return stream_dir


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (nanos ts → µs timestamp), same
    conversion as the batch path in catalog.load_table."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream_dir = _file_stream_dir(sf_dir, "events.parquet", "_spark_etl_stream_src")
    file_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    sdf = spark.readStream.schema(file_schema).parquet(stream_dir)
    ts_type = dict(sdf.dtypes).get("ts")
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # watermarks require the instant (LTZ) type; UTC session makes this
        # cast value-preserving — same normalization as catalog.load_table
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
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
    "stream_stream_join",
    oracle="""
    WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events)
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
           CAST(p.ts AS VARCHAR) AS purchase_ts, CAST(c.ts AS VARCHAR) AS click_ts
    FROM ev p JOIN ev c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: purchases joined to the same user's clicks
    in the preceding 30 minutes. Both sides carry watermarks and the join
    condition carries the time band, so state for rows older than
    watermark + band is evicted — the bounded-state shape this join needs
    at 100 TB/day. Inner-join matches emit as soon as both sides arrive
    (append mode); the result must hash-match the batch band-join oracle.
    Reference streaming surface: SURVEY §2.D (stream joins via the SQL
    actor over streaming views).
    """
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "user_id = c_user AND "
            "c_ts BETWEEN p_ts - INTERVAL 30 MINUTES AND p_ts"
        ),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        F.col("p_ts").cast("string").alias("purchase_ts"),
        F.col("c_ts").cast("string").alias("click_ts"),
    )
    qname = f"stream_join_{uuid.uuid4().hex[:8]}"
    q = joined.writeStream.format("memory").queryName(qname).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


@register(
    "stream_dedup_watermark",
    oracle="""
    WITH ev AS (SELECT ts::TIMESTAMP AS ts, user_id, event_type FROM events)
    SELECT DISTINCT user_id, event_type,
           CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_bucket
    FROM ev
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication with bounded state
    (``dropDuplicatesWithinWatermark``): one row per (user, event_type,
    hour) — the stream-side twin of the batch exact-dedup operator a
    training-data pipeline runs on its ingest firehose.

    Equivalence to batch DISTINCT holds because duplicate keys can only be
    generated inside one hour bucket while the watermark delay is 2 hours:
    every repeat of a key arrives within the delay of its first
    occurrence, so exactly one row per key is emitted AND state still
    evicts once the watermark passes the bucket — exact dedup with
    bounded state, which plain ``dropDuplicates`` (state never evicted)
    cannot give at 100 TB/day.
    """
    sdf = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .select(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "ts",
        )
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "hour_ts"])
        .select(
            "user_id",
            "event_type",
            F.col("hour_ts").cast("string").alias("hour_bucket"),
        )
    )
    qname = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = sdf.writeStream.format("memory").queryName(qname).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


@register(
    "stream_sliding_window_global",
    # same bucket expansion as the batch ts_sliding_window oracle: each
    # event lands in exactly two 10-minute/5-minute-slide windows
    oracle="""
    WITH ev AS (SELECT ts::TIMESTAMP AS ts, value FROM events),
    slid AS (
        SELECT make_timestamp(((epoch_ms(ts) - k * 300000) // 600000) * 600000000
                              + k * 300000000) AS window_start,
               value
        FROM ev, (SELECT unnest([0, 1]) AS k)
        WHERE epoch_ms(ts) >= ((epoch_ms(ts) - k * 300000) // 600000) * 600000 + k * 300000
    )
    SELECT CAST(window_start AS VARCHAR) AS window_start,
           CAST(count(*) AS BIGINT)      AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)          AS sum_value
    FROM slid GROUP BY 1
    """,
)
def stream_sliding_window_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window aggregate (10-minute window, 5-minute
    slide, single global key) with watermark, complete mode — must equal
    the batch ``ts_sliding_window`` semantics exactly (``F.window`` expands
    each event into its two containing windows on the map side; the shuffle
    carries partially-aggregated window rows, not events)."""
    sdf = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n", "sum_value")
    )
    qname = f"stream_slide_{uuid.uuid4().hex[:8]}"
    q = sdf.writeStream.format("memory").queryName(qname).outputMode("complete").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


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


@register(
    "stream_session_window",
    # Spark session_window semantics: a session is [first_ts, last_ts + gap);
    # an event at EXACTLY last_ts + gap starts a new session, hence the >=
    # in the oracle's gap test (epoch_us — the data has µs precision).
    oracle="""
    WITH ev AS (SELECT ts::TIMESTAMP AS ts, user_id, value FROM events),
    marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 300000000
                    THEN 1 ELSE 0 END AS new_session
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
        FROM marked
    )
    SELECT CAST(min(ts) AS VARCHAR)                      AS session_start,
           CAST(max(ts) + INTERVAL 5 MINUTE AS VARCHAR)  AS session_end,
           user_id,
           CAST(count(*) AS BIGINT)                      AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_no
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (5-minute inactivity gap) per user via
    ``F.session_window`` — Spark merges overlapping per-event windows in
    the stateful aggregation; complete output mode (session windows
    support complete/append only), bounded by processAllAvailable. The result must equal
    the batch gaps-and-islands oracle — the same sessions, batch or
    stream."""
    sdf = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("string").alias("session_start"),
            F.col("w.end").cast("string").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    qname = f"stream_session_{uuid.uuid4().hex[:8]}"
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
    "stream_sliding_window",
    # same window arithmetic as the batch ts_sliding_window oracle, plus the
    # per-event-type key the stream aggregates on
    oracle="""
    WITH ev AS (SELECT ts::TIMESTAMP AS ts, event_type, value FROM events),
    slid AS (
        SELECT make_timestamp(((epoch_ms(ts) - k * 300000) // 600000) * 600000000
                              + k * 300000000) AS window_start,
               event_type, value
        FROM ev, (SELECT unnest([0, 1]) AS k)
        WHERE epoch_ms(ts) >= ((epoch_ms(ts) - k * 300000) // 600000) * 600000 + k * 300000
    )
    SELECT CAST(window_start AS VARCHAR) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT)      AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM slid GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 10-minute window sliding every 5 minutes per event type —
    each event lands in two windows, expanded stream-side by ``F.window``
    (state per (window, type), no self-join); complete mode, bounded by
    processAllAvailable. Must hash-match the batch sliding-window
    semantics."""
    sdf = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    qname = f"stream_sliding_{uuid.uuid4().hex[:8]}"
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


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet via the same symlink-directory
    trick as ``_events_stream`` (FileStreamSource needs a directory; the
    testdata is a single read-only file)."""
    stream_dir = _file_stream_dir(sf_dir, "documents.parquet", "_spark_etl_stream_docs")
    file_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return spark.readStream.schema(file_schema).parquet(stream_dir)


@register(
    "stream_text_quality",
    # IDENTICAL oracle to the batch text_quality_score: stateless text
    # operators must produce byte-identical output under structured
    # streaming (append mode, no watermark needed — narrow maps have no
    # state), proving the text library composes with readStream unchanged.
    oracle="""
    WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\\s+')                       AS toks,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1)                                 AS alpha_ratio
        FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'data'], x))) AS INT) AS n_stopwords,
           round(0.4 * least(1.0, len(toks) / 100.0)
                 + 0.3 * least(1.0, (len(list_filter(toks, x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'data'], x)))
                                     / greatest(len(toks), 1)) * 3)
                 + 0.3 * alpha_ratio, 6)                                       AS quality_score
    FROM t
    """,
)
def stream_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text-quality operator applied to a STREAM of documents — same
    column expressions, append mode, zero state — must hash-match the
    batch oracle exactly. This is the batch/stream parity contract for
    every stateless operator in the text library: narrow maps stream
    unchanged at any scale (per-microbatch scan-speed, no shuffle)."""
    from ..operators.text import with_quality_score

    sdf = _documents_stream(spark, sf_dir).select("doc_id", "text")
    out = with_quality_score(sdf).select("doc_id", "n_stopwords", "quality_score")
    qname = f"stream_quality_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(qname).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


@register(
    "stream_pii_scrub",
    # identical oracle shape to the batch text_pii_redact: PII scrubbing is
    # a stateless narrow map, so streaming it (append mode, no state) must
    # hash-match the batch result byte for byte.
    oracle="""
    WITH s AS (SELECT doc_id,
        concat_ws(' ', substring(text, 1, 40),
            CASE WHEN doc_id % 3 = 0 THEN 'contact user' || doc_id || '@mail-'
                      || (doc_id % 7) || '.com' END,
            CASE WHEN doc_id % 4 = 0 THEN 'host 10.' || (doc_id % 256) || '.0.'
                      || (doc_id % 100) END,
            CASE WHEN doc_id % 5 = 0 THEN 'tel +49 555-'
                      || lpad((doc_id % 10000)::VARCHAR, 4, '0') END) AS text
        FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INT)  AS n_ipv4,
           CAST(len(regexp_extract_all(text, '\\+\\d{2}[- ]\\d{3}[- ]\\d{4}')) AS INT) AS n_phone,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
               '\\+\\d{2}[- ]\\d{3}[- ]\\d{4}', '<PHONE>', 'g') AS redacted
    FROM s
    """,
)
def stream_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PII scrub applied to a STREAM of documents — the batch/stream
    parity contract extended to the round-4 safety operators: the same
    with_pii_flags column expressions run per-microbatch at scan speed
    (stateless, no watermark, no shuffle) and hash-match the batch
    oracle exactly (operators/pii.py)."""
    from ..operators.pii import with_pii_flags
    from .safety import _synth_col

    sdf = _documents_stream(spark, sf_dir).select("doc_id", "text")
    synth = sdf.select("doc_id", _synth_col().alias("text"))
    out = with_pii_flags(synth).select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "redacted"
    )
    qname = f"stream_pii_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(qname).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)


@register(
    "stream_stateful_ewma",
    oracle="""
    WITH ev AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, e) -> acc * 0.75 + 0.25 * e) AS final_ewma
    FROM ev GROUP BY user_id
    """,
)
def stream_stateful_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EWMA recurrence as arbitrary stateful STREAMING state: GroupState
    carries each user's last smoothed value across triggers; within a
    trigger the group's rows sort by event time so the recurrence applies
    in order (each user's history arrives within one trigger here; with
    out-of-order cross-trigger arrivals an EWMA needs watermark-delayed
    emission, which is the same ordering contract the batch operator's
    sortWithinPartitions provides). Final state per user must equal the
    batch recurrence bit-for-bit — same exact-binary-alpha argument as
    operators/timeseries.py, so the oracle list_reduce needs no rounding."""
    import pandas as pd

    from ..streaming.stateful import ArbitraryStatefulProcessor

    class EwmaState(ArbitraryStatefulProcessor):
        group_keys = ("user_id",)
        output_schema = "user_id bigint, n_events bigint, final_ewma double"
        state_schema = "n bigint, y double"
        output_mode = "update"
        timeout_conf = "NoTimeout"

        def process_group(self, key, batches, state):
            n, y = state.get if state.exists else (0, None)
            pdf = pd.concat(list(batches), ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            vals = pdf["value"]
            if y is not None:
                seeded = pd.concat(
                    [pd.Series([y], dtype="float64"), vals], ignore_index=True
                )
                y = float(seeded.ewm(alpha=0.25, adjust=False).mean().iloc[-1])
            else:
                y = float(vals.ewm(alpha=0.25, adjust=False).mean().iloc[-1])
            n += len(pdf)
            state.update((n, y))
            yield pd.DataFrame(
                [{"user_id": int(key[0]), "n_events": n, "final_ewma": y}]
            )

    sdf = _events_stream(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    out = EwmaState().transform_state(sdf)
    qname = f"stream_ewma_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(qname).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window as W

    t = spark.table(qname).withColumn("__seq", F.monotonically_increasing_id())
    w = W.partitionBy("user_id").orderBy(F.desc("__seq"))
    return (
        t.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "final_ewma")
    )


@register(
    "stream_approx_distinct_users",
    # exact distinct aggregation is UNSUPPORTED in streaming — the HLL++
    # sketch is the only distinct count a stream can maintain. The oracle
    # checks the calibration contract (corpus_hll_calibration pattern):
    # batch-exact per-window distinct + a boolean asserting the STREAMED
    # estimate landed within max(2, 3·rsd·exact) — the absolute floor
    # covers the integer FLOOR Spark applies to the estimate, which on a
    # 2-user window already is a 50% relative error. Register merges are
    # max() — commutative/associative — so the boolean is
    # trigger-order-stable.
    oracle="""
    WITH ev AS (SELECT ts::TIMESTAMP AS ts, user_id FROM events)
    SELECT CAST(make_timestamp((epoch_ms(ts) // 600000) * 600000000) AS VARCHAR)
               AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS within_tolerance
    FROM ev GROUP BY 1
    """,
)
def stream_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window distinct users maintained by a STREAMING HLL++ sketch
    (approx_count_distinct inside a watermarked tumbling window, complete
    mode), calibrated against the batch-exact count per window. At 100 TB
    of stream history this is the only affordable shape: sketch registers
    merge map-side per trigger and state is O(windows × 2^p), independent
    of user cardinality."""
    from ..catalog import load_table

    sdf = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"))
        .select(
            F.col("w.start").cast("string").alias("window_start"), "approx_users"
        )
    )
    qname = f"stream_approxdistinct_{uuid.uuid4().hex[:8]}"
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
    streamed = spark.table(qname)
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_users"))
        .select(
            F.col("w.start").cast("string").alias("window_start"), "exact_users"
        )
    )
    diff = F.abs(F.col("approx_users") - F.col("exact_users"))
    # rsd=0.05 is a STANDARD DEVIATION, not a bound: across many windows
    # (sf0.1 has ~700) multi-sigma excursions are expected, and HLL++'s
    # small-cardinality bias correction adds its own absolute wobble — a
    # 15%/min-2 envelope flipped one 18-user window at sf0.1. 5-sigma
    # relative + a floor of 4 keeps the contract meaningful (a broken
    # sketch is off by far more) and SF-stable.
    tol = F.greatest(F.lit(4.0), 0.25 * F.col("exact_users"))
    return exact.join(streamed, "window_start").select(
        "window_start", "exact_users", (diff <= tol).alias("within_tolerance")
    )


@register(
    "stream_windowed_topk",
    # the STREAM maintains the per-(window, event_type) counts (complete
    # mode); the top-3 rank runs as a batch window over the streamed
    # result table — ranking is not a streaming-supported operation, and
    # this split (stream aggregates, batch serves ranked views) is
    # exactly how a 100 TB leaderboard pipeline is laid out.
    oracle="""
    WITH ev AS (SELECT ts::TIMESTAMP AS ts, event_type FROM events),
    c AS (
        SELECT CAST(make_timestamp((epoch_ms(ts) // 600000) * 600000000)
                    AS VARCHAR) AS window_start,
               event_type, count(*) AS n
        FROM ev GROUP BY 1, 2
    ),
    r AS (SELECT window_start, event_type, n,
                 row_number() OVER (PARTITION BY window_start
                                    ORDER BY n DESC, event_type) AS rn
          FROM c)
    SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
           CAST(rn AS INT) AS rn
    FROM r WHERE rn <= 3
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: event-type counts per 10-minute window
    maintained by a watermarked streaming aggregation, then the top-3
    rank applied as a BATCH window over the streamed state (ranking
    is unsupported inside a stream — the aggregate/serve split is the
    production shape). Deterministic tiebreak on event_type."""
    sdf = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
        )
    )
    qname = f"stream_topk_{uuid.uuid4().hex[:8]}"
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
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    )
    return (
        spark.table(qname)
        .withColumn("rn", rn.cast("int"))
        .filter(F.col("rn") <= 3)
        .select("window_start", "event_type", F.col("n").cast("bigint").alias("n"), "rn")
    )


@register(
    "stream_error_budget_burn",
    # the STREAM maintains per-hour-window event/error counts (complete
    # mode); burn-rate arithmetic runs over the streamed state. Same
    # semantics as the batch events_error_budget_burn — the batch/stream
    # parity proof for the SLO pipeline.
    oracle="""
    WITH ev AS (SELECT ts::TIMESTAMP AS ts, event_type FROM events),
    w AS (SELECT CAST(make_timestamp((epoch_ms(ts) // 3600000) * 3600000000)
                      AS VARCHAR) AS window_start,
                 count(*) AS n,
                 count(*) FILTER (WHERE event_type = 'error') AS n_err
          FROM ev GROUP BY 1)
    SELECT window_start,
           CAST(n AS BIGINT)     AS n_events,
           CAST(n_err AS BIGINT) AS n_errors,
           round((n_err / CAST(n AS DOUBLE)) / 0.01, 4) AS burn_rate
    FROM w
    """,
)
def stream_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLO burn rate: hourly event/error counts maintained by a
    watermarked streaming aggregation, burn arithmetic applied over the
    streamed state — hash-matched against the batch oracle, proving the
    alerting pipeline computes identical numbers batch or stream."""
    sdf = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_err"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"), "n", "n_err"
        )
    )
    qname = f"stream_burn_{uuid.uuid4().hex[:8]}"
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
    t = spark.table(qname)
    return t.select(
        "window_start",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_err").cast("bigint").alias("n_errors"),
        F.round((F.col("n_err") / F.col("n").cast("double")) / 0.01, 4).alias(
            "burn_rate"
        ),
    )


from .advanced import _INCR_ADMISSION_ORACLE


@register(
    "stream_incremental_admission",
    # SAME oracle as the batch dedup_incremental_admission: the ingest
    # stream arrives in micro-batches that each probe the static corpus
    # index, and with the whole increment in one source file the streamed
    # union must hash-match the batch admission row for row.
    oracle=_INCR_ADMISSION_ORACLE,
)
def stream_incremental_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup admission as a STREAM-STATIC job — the
    production ingest topology: the corpus LSH index (buckets + shingle
    inverted index + sizes) is built once on the static side and cached;
    each micro-batch of arriving documents runs the batch probe
    (operators/dedup.py:probe_corpus_lsh_index) inside ``foreachBatch``
    — the standard pattern when the per-batch logic needs multi-agg +
    window shapes append-mode streaming can't express — and appends its
    admission decisions to the sink. Per-batch cost is the steady-state
    probe (increment-bands x bucket joins, candidate-only verification);
    the corpus is never rescanned after index build."""
    import tempfile

    from ..catalog import load_table as _lt
    from ..caching import scoped_persist
    from ..operators import dedup as D

    corpus = _lt(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
    buckets, shingles, sizes = (
        scoped_persist(r) for r in D.build_corpus_lsh_index(corpus)
    )

    out_dir = tempfile.mkdtemp(prefix="stream_admission_")
    ckpt = tempfile.mkdtemp(prefix="stream_admission_ckpt_")

    def _probe_batch(batch_df, batch_id):
        (
            D.probe_corpus_lsh_index(
                buckets, shingles, sizes, batch_df, threshold=0.5
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    sdf = (
        _documents_stream(spark, sf_dir)
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 == 0)
    )
    q = (
        sdf.writeStream.foreachBatch(_probe_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out_dir)


@register(
    "stream_video_frame_sample",
    # identical oracle to the batch multimodal_video_frame_sample: frame
    # striding + decode is a stateless narrow map, so streaming it
    # (append mode, no state) must hash-match the batch result exactly —
    # the batch/stream parity contract extended to the video modality.
    oracle="""
    SELECT d.doc_id AS id,
           CAST(k AS INT)  AS frame_idx,
           CAST(6 AS INT)  AS n_frames,
           CAST(2 AS INT)  AS width,
           CAST(2 AS INT)  AS height,
           CAST(3 AS INT)  AS channels,
           UPPER(SUBSTR(md5(d.text || ':' || k), 1, 24)) AS pixels_hex
    FROM documents d, (VALUES (1), (3), (5)) AS f(k)
    """,
)
def stream_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling on a STREAM of documents-turned-containers:
    the same strided decode as the batch multimodal_video_frame_sample
    (6-frame concatenated-netpbm payloads built per micro-batch, every
    2nd frame from offset 1), run through readStream -> mapInPandas ->
    memory sink. Stateless and narrow, so each micro-batch decodes at
    scan speed with no watermark or state — the ingest-side shape for
    sampling frames as video lands rather than in a nightly sweep."""
    from ..operators.multimodal import sample_video_frames

    sdf = _documents_stream(spark, sf_dir).select("doc_id", "text")
    txt = F.encode("text", "utf-8")
    frames = [
        F.concat(
            F.lit(b"P6\n2 2\n255\n"),
            F.unhex(F.substring(F.md5(F.concat(txt, F.lit(f":{k}".encode()))), 1, 24)),
        )
        for k in range(6)
    ]
    wire = sdf.select(F.col("doc_id").alias("id"), F.concat(*frames).alias("payload"))
    out = sample_video_frames(wire, every_n=2, offset=1).select(
        "id",
        "frame_idx",
        "n_frames",
        "width",
        "height",
        "channels",
        F.hex("pixels").alias("pixels_hex"),
    )
    qname = f"stream_video_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(qname).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname)

"""Time-series / event-stream queries: tumbling & sliding windows,
sessionization, as-of join, interval band join.

The reference exercises tumbling windows and interval range joins through raw
SQL (reference: src/test/resources/scripts/window-user-train.sql:8-9,
stream-user-train.sql:24). Here each is a first-class batch operator with a
scale-conscious plan; the streaming counterparts live in
``spark_etl_framework_spark/streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import dsum, register


#: DuckDB reads the events parquet as TIMESTAMP_NS; truncate to µs so string
#: rendering and epoch math line up with Spark's microsecond timestamps.
_EV = "ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events)"


@register(
    "ts_tumbling_window",
    oracle=f"""
    WITH {_EV}
    SELECT CAST(make_timestamp((epoch_ms(ts) // 600000) * 600000000) AS VARCHAR)
               AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)     AS total_value
    FROM ev
    GROUP BY 1, 2
    """,
)
def ts_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window aggregate via ``F.window`` — identical
    semantics batch or streaming (epoch-aligned buckets)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "ts_sliding_window",
    oracle=f"""
    WITH {_EV},
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
def ts_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 minutes (each event lands in 2
    windows). ``F.window`` expands rows window-side — no self-join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n", "sum_value")
    )


@register(
    "ts_sessionize",
    oracle=f"""
    WITH {_EV},
    marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
        FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(min(ts) AS VARCHAR) AS session_start,
           CAST(max(ts) AS VARCHAR) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_no
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag → gap flag →
    running sum = session number → per-session aggregate. One shuffle on
    user_id serves both windows and the final groupBy (same key)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_ms > 1800000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", F.col("session_no").cast("bigint").alias("session_no")).agg(
        F.min("ts").cast("string").alias("session_start"),
        F.max("ts").cast("string").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "ts_band_join",
    oracle=f"""
    WITH {_EV}
    SELECT a.user_id,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM ev a
    JOIN ev b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.ts BETWEEN a.ts - INTERVAL 60 SECOND AND a.ts + INTERVAL 60 SECOND
    GROUP BY a.user_id
    """,
)
def ts_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval band self-join (reference's range-join idiom,
    reference: src/test/resources/scripts/stream-user-train.sql:24): count
    event pairs of the same user within ±60 s.

    Scale design: a naive (user, |Δts|≤60s) join makes Spark pick a
    nested-loop per user group. Instead each event is assigned to its 60-s
    time bucket, the probe side is expanded to {b-1, b, b+1}, and the join is
    a pure EQUI-join on (user_id, bucket) — shuffle-hashable at any scale —
    with the exact band predicate applied as a post-filter.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    bucket = (F.unix_millis("ts") / F.lit(60000)).cast("bigint")
    left = ev.withColumn("b", F.explode(F.array(bucket - 1, bucket, bucket + 1)))
    right = (
        ev.withColumn("b", bucket)
        .withColumnRenamed("event_id", "event_id_r")
        .withColumnRenamed("ts", "ts_r")
        .withColumnRenamed("user_id", "user_id_r")
    )
    pairs = left.join(
        right,
        (left.user_id == right.user_id_r) & (left.b == right.b),
    ).filter(
        (F.col("event_id") < F.col("event_id_r"))
        & (F.col("ts_r") >= F.col("ts") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 60 SECONDS"))
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "ts_asof_join",
    oracle=f"""
    WITH {_EV},
    cand AS (
        SELECT o_orderkey, e.event_id, e.ts,
               row_number() OVER (PARTITION BY o_orderkey
                                  ORDER BY e.ts DESC, e.event_id DESC) AS rn
        FROM orders
        JOIN ev e ON e.user_id = o_custkey AND e.ts <= o_orderdate
    )
    SELECT o.o_orderkey,
           c.event_id               AS last_event_id,
           CAST(c.ts AS VARCHAR)    AS last_event_ts
    FROM orders o
    LEFT JOIN cand c ON o.o_orderkey = c.o_orderkey AND c.rn = 1
    """,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each order, the latest event of that user at or before
    the order date (ties on ts broken by max event_id).

    Scale design: the classic sort-based as-of — union both sides tagged,
    sort within user partitions by (ts, side, event_id), and carry the last
    seen event forward with ``last(..., ignorenulls)``. One shuffle on
    user_id, O(n log n) — never the quadratic join+filter the naive SQL
    implies.
    """
    od = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    ev_side = ev.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        "event_id",
        F.col("ts").alias("event_ts"),
    )
    od_side = od.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("side"),
        "o_orderkey",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("event_ts"),
    )
    # events sort before orders at equal ts (side 0 < 1) → "at or before"
    w = (
        W.partitionBy("uid")
        .orderBy("t", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = ev_side.unionByName(od_side).select(
        "o_orderkey",
        "side",
        F.last("event_id", ignorenulls=True).over(w).alias("last_event_id"),
        F.last("event_ts", ignorenulls=True).over(w).cast("string").alias("last_event_ts"),
    )
    return merged.filter(F.col("side") == 1).select(
        "o_orderkey", "last_event_id", "last_event_ts"
    )


@register(
    "ts_ewma_user_value",
    oracle=f"""
    WITH {_EV}
    SELECT user_id, event_id, CAST(ts AS VARCHAR) AS ts_str, value,
           list_reduce(
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               (acc, e) -> acc * 0.75 + 0.25 * e) AS ewma
    FROM ev
    """,
)
def ts_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event value (α=0.25, exact in binary — see
    operators/timeseries.py): ONE shuffle on user_id, then a C-speed
    pandas scan per group. The DuckDB oracle reproduces the recurrence
    bit-for-bit via a windowed list_reduce (which is O(n²) per key — fine
    for an oracle, not for the engine; the mapInPandas scan is O(n)).
    The ewma column is emitted UNROUNDED: the doubles are bit-identical
    across engines, while round(x, 6) is not (Spark rounds the shortest
    decimal repr, DuckDB the exact binary value — a value landing exactly
    on the half-boundary flips)."""
    from ..operators.timeseries import ewma

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = ewma(ev, "user_id", ["ts", "event_id"], "value", alpha=0.25)
    return out.select(
        "user_id",
        "event_id",
        F.col("ts").cast("string").alias("ts_str"),
        "value",
        "ewma",
    )


@register(
    "ts_rolling_features",
    oracle=f"""
    WITH {_EV}
    SELECT user_id, event_id, CAST(ts AS VARCHAR) AS ts_str,
           CAST(count(*) OVER w AS INT) AS n_win,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w
                      / count(*) OVER w, 6) AS DOUBLE) AS mean_5,
           min(value) OVER w AS min_5,
           max(value) OVER w AS max_5
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def ts_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-5-event rolling features (count / mean / min /
    max) — the feature-engineering window before model scoring. One
    shuffle on user_id; the mean accumulates in DECIMAL so the windowed
    sum is order-independent across engines (same rule as dsum)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    n_win = F.count(F.lit(1)).over(w).cast("int")
    mean5 = F.round(
        F.sum(F.col("value").cast("decimal(18,6)")).over(w) / F.count(F.lit(1)).over(w),
        6,
    ).cast("double")
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("string").alias("ts_str"),
        n_win.alias("n_win"),
        mean5.alias("mean_5"),
        F.min("value").over(w).alias("min_5"),
        F.max("value").over(w).alias("max_5"),
    )


@register(
    "ts_cusum_drift",
    oracle=f"""
    WITH {_EV},
    d AS (
        SELECT user_id, event_id, CAST(ts AS VARCHAR) AS ts_str,
               CAST(value AS DECIMAL(18,6)) - CAST(55.0 AS DECIMAL(18,6)) AS dev,
               sum(CAST(value AS DECIMAL(18,6)) - CAST(55.0 AS DECIMAL(18,6)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM ev
    )
    , m AS (
        SELECT user_id, event_id, ts_str, c,
               min(c) OVER (PARTITION BY user_id ORDER BY ts_str, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mc
        FROM d
    )
    -- NB: DuckDB's least() on DECIMAL(38,6) coerces to DOUBLE (1-ulp
    -- drift vs Spark's decimal path) — the CASE keeps it decimal
    SELECT user_id, event_id, ts_str,
           CAST(CASE WHEN mc < 0 THEN c - mc ELSE c END AS DOUBLE) AS cusum,
           CAST(CASE WHEN mc < 0 THEN c - mc ELSE c END AS DOUBLE) > 200.0
               AS drift_alarm
    FROM m
    """,
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user (reference level 55 ≈ just
    above the in-control mean, alarm at 200): the sequential recurrence s_i = max(0, s_{i-1} + x_i - k)
    has the closed form s_i = c_i - min(0, min_{j<=i} c_j) over the
    running sum c — so unlike the EWMA it stays ENTIRELY in JVM window
    built-ins: one shuffle on user_id, two window passes over the same
    sort, zero Python. Deviations accumulate in DECIMAL so both engines
    agree exactly (no float-sum order sensitivity)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dev = F.col("value").cast("decimal(18,6)") - F.lit(55.0).cast("decimal(18,6)")
    c = F.sum(dev).over(w)
    d = ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("string").alias("ts_str"),
        c.alias("c"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts_str", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    mc = F.min("c").over(w2)
    cusum = (
        F.when(mc < 0, F.col("c") - mc).otherwise(F.col("c"))
    ).cast("double")
    return d.select(
        "user_id",
        "event_id",
        "ts_str",
        cusum.alias("cusum"),
        (cusum > 200.0).alias("drift_alarm"),
    )


@register(
    "ts_event_gap_stats",
    oracle=f"""
    WITH {_EV},
    g AS (
        SELECT user_id, ts,
               epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)) AS gap_us
        FROM ev
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)            AS n_events,
           CAST(count(gap_us) AS BIGINT)       AS n_gaps,
           CAST(min(gap_us) AS BIGINT)         AS min_gap_us,
           CAST(max(gap_us) AS BIGINT)         AS max_gap_us,
           CAST(round(avg(CAST(gap_us AS DECIMAL(18,0))), 2) AS DOUBLE) AS avg_gap_us,
           CAST(sum(CASE WHEN gap_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gaps_over_1h
    FROM g GROUP BY user_id
    """,
)
def ts_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event-gap profile (irregular-sampling health check):
    min/max/mean gap in µs plus the count of >1 h silences. One shuffle
    on user_id serves both the lag window and the aggregate (same key);
    the mean accumulates in DECIMAL (integer µs — exact)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    g = ev.select("user_id", gap.alias("gap_us"))
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.round(F.avg(F.col("gap_us").cast("decimal(18,0)")), 2)
        .cast("double")
        .alias("avg_gap_us"),
        F.sum(F.when(F.col("gap_us") > 3_600_000_000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_gaps_over_1h"),
    )


@register(
    "ts_seasonal_profile",
    # Spark dayofweek() is 1..7 Sunday=1; DuckDB dayofweek() is 0..6
    # Sunday=0 — the Spark side subtracts 1 so both emit 0=Sunday.
    oracle=f"""
    WITH {_EV},
    p AS (SELECT CAST(dayofweek(ts) AS INT) AS dow,
                 CAST(hour(ts) AS INT)      AS hour,
                 count(*) AS n_events, avg(value) AS mv
          FROM ev GROUP BY 1, 2)
    SELECT p.dow, p.hour,
           CAST(p.n_events AS BIGINT) AS n_events,
           round(p.mv, 6)             AS mean_value,
           CAST(count(*) FILTER (WHERE e.value > 2 * p.mv) AS BIGINT)
               AS n_above_2x
    FROM ev e JOIN p ON CAST(dayofweek(e.ts) AS INT) = p.dow
                    AND CAST(hour(e.ts) AS INT) = p.hour
    GROUP BY 1, 2, 3, p.mv
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonal profile (the load-shape baseline behind
    anomaly thresholds): per (dow, hour) slot the event count, mean
    value, and how many events exceed 2x the slot mean. Profile is one
    168-slot aggregate; the exceedance pass joins the tiny profile back
    UNHINTED and re-aggregates — two shuffles total, both on the narrow
    slot key. The slot mean is an unordered double average, so an event
    within ulps of exactly 2x the mean could flip the exceedance count
    between engines — accepted residual risk, same class as
    pagerank/pc1 (no exact accumulator exists for a mean fed into a
    comparison)."""
    ev = load_table(spark, sf_dir, "events")
    slot = [
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ]
    e = ev.select(*slot, "value")
    prof = e.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("mv")
    )
    j = e.join(prof, ["dow", "hour"])
    return (
        j.groupBy("dow", "hour", "n_events", "mv")
        .agg(
            F.sum(F.when(F.col("value") > 2 * F.col("mv"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above_2x")
        )
        .select(
            "dow",
            "hour",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round("mv", 6).alias("mean_value"),
            "n_above_2x",
        )
    )


@register(
    "ts_interval_coverage",
    # islands-and-gaps: an interval starts a new island when it begins
    # after the running max end of everything earlier (strictly ordered
    # by start with event_id tiebreak). Union length = sum of island
    # spans, all computed in one user-keyed window pass — no self-join.
    oracle=f"""
    WITH {_EV},
    iv AS (SELECT user_id, event_id, ts AS s, ts + INTERVAL 5 MINUTE AS e
           FROM ev),
    m AS (SELECT user_id, event_id, s, e,
                 max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_max
          FROM iv),
    g AS (SELECT user_id, event_id, s, e,
                 CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END
                     AS is_new
          FROM m),
    isl AS (SELECT user_id, s, e,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                                     ROWS UNBOUNDED PRECEDING) AS island
            FROM g),
    spans AS (SELECT user_id, island,
                     epoch_ms(max(e)) - epoch_ms(min(s)) AS span_ms
              FROM isl GROUP BY user_id, island)
    SELECT user_id,
           CAST(count(*) AS BIGINT)            AS n_islands,
           CAST(sum(span_ms) AS BIGINT)    AS covered_ms
    FROM spans GROUP BY user_id
    """,
)
def ts_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of per-user activity intervals (each event covers 5
    minutes): the islands-and-gaps algorithm — running max of interval
    ends marks island starts, a running sum numbers the islands, one
    aggregate sizes them. Everything rides ONE user-keyed window
    partitioning; the O(n²) interval self-join never happens. Integer
    millisecond arithmetic end to end (no second-rounding: double→int
    casts round in DuckDB but truncate in Spark) — exact on both engines."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    m = iv.withColumn("prev_max", F.max("e").over(w_prev))
    g = m.withColumn(
        "is_new",
        F.when(
            F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1
        ).otherwise(0),
    )
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    isl = g.withColumn("island", F.sum("is_new").over(w_cum))
    spans = isl.groupBy("user_id", "island").agg(
        (
            F.unix_millis(F.max("e")) - F.unix_millis(F.min("s"))
        ).alias("span_ms")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("span_ms").cast("bigint").alias("covered_ms"),
    )

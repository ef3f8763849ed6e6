"""Window-function queries (ranking, running totals, lag/lead, ntile).

The reference reaches window functions through raw Spark SQL
(reference: src/test/resources/scripts/window-user-train.sql:8-11); here each
family is expressed with ``pyspark.sql.Window`` specs. Every ORDER BY inside a
window has a unique-key tiebreak so results are deterministic under any
partitioning — required both for the oracle hash and for reproducibility on a
real cluster where partition order is arbitrary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import dsum, register


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number. At scale this is the
    canonical top-k-per-group: one shuffle on the partition key, no global
    sort."""
    od = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        od.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal,
           CAST(rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS drnk
    FROM customer
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() vs dense_rank() per nation. No tiebreak needed: rank functions
    assign equal ranks to ties, so output is deterministic."""
    cu = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return cu.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS VARCHAR) AS orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spent
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order history (ROWS frame)."""
    od = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spent"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2)                         AS totalprice,
           round(lag(o_totalprice) OVER w, 2)             AS prev_price,
           round(lead(o_totalprice) OVER w, 2)            AS next_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead neighbours within each customer's order sequence."""
    od = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.round(prev, 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice")), 2).alias("delta"),
    )


@register(
    "window_ntile_share",
    oracle="""
    WITH agg AS (SELECT l_suppkey,
                        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
                 FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey,
           round(rev, 2) AS supp_rev,
           CAST(ntile(4) OVER (ORDER BY rev DESC, l_suppkey) AS INT) AS quartile,
           round(rev / sum(rev) OVER (), 6) AS rev_share
    FROM agg
    """,
)
def window_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-window: supplier revenue quartiles + share-of-total.
    The unpartitioned window runs over the (small) aggregated set, never the
    raw fact table — the shape to keep at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_suppkey").agg(dsum(F.col("l_extendedprice")).alias("_rev"))
    w_order = W.orderBy(F.desc("_rev"), F.asc("l_suppkey"))
    w_all = W.partitionBy()
    return agg.select(
        "l_suppkey",
        F.round("_rev", 2).alias("supp_rev"),
        F.ntile(4).over(w_order).cast("int").alias("quartile"),
        F.round(F.col("_rev") / F.sum("_rev").over(w_all), 6).alias("rev_share"),
    )


@register(
    "window_cume_dist_nth",
    oracle="""
    WITH agg AS (SELECT l_suppkey,
                        CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
                 FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey, round(qty, 2) AS supp_qty,
           round(cume_dist() OVER (ORDER BY qty, l_suppkey), 6) AS cd,
           round(nth_value(qty, 3) OVER (ORDER BY qty DESC, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS third_largest_qty
    FROM agg
    """,
)
def window_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value over the aggregated supplier set (completing
    the analytic-window catalogue) — unpartitioned windows only ever run
    on post-aggregation row counts."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_suppkey").agg(dsum(F.col("l_quantity")).alias("_q"))
    w_cd = W.orderBy("_q", "l_suppkey")
    w_nth = W.orderBy(F.desc("_q"), "l_suppkey").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return agg.select(
        "l_suppkey",
        F.round("_q", 2).alias("supp_qty"),
        F.round(F.cume_dist().over(w_cd), 6).alias("cd"),
        F.round(F.nth_value("_q", 3).over(w_nth), 2).alias("third_largest_qty"),
    )


@register(
    "window_rolling_median",
    # exact trailing-5 discrete median per user: both engines aggregate
    # the frame into a sorted list and take element (n+1)//2 — no
    # reliance on engine median() interpolation rules.
    oracle="""
    WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, value
                FROM events),
    f AS (SELECT user_id, event_id,
                 list_sort(array_agg(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS fr
          FROM ev)
    SELECT user_id, event_id,
           CAST(len(fr) AS INT) AS frame_n,
           round(fr[(len(fr) + 1) // 2], 6) AS rolling_median
    FROM f
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median (trailing 5 rows per user, deterministic
    (ts, event_id) order): the robust smoother a mean-based rolling
    feature can't give you. Both engines materialize the ≤5-element
    frame and index the sorted list — constant per-row state, one
    user-keyed window shuffle shared with the other rolling features."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    fr = F.sort_array(F.collect_list("value").over(w))
    return ev.select(
        "user_id",
        "event_id",
        F.size(fr).cast("int").alias("frame_n"),
        F.round(
            F.element_at(fr, ((F.size(fr) + 1) / 2).cast("int")), 6
        ).alias("rolling_median"),
    )

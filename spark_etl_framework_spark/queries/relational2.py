"""Second wave of relational coverage: more TPC-H shapes, grouping sets,
exact percentiles, regexp/array functions, theta joins, latest-per-key."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import dsum, register


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT)                    AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + aggregate. All four predicates reach the
    parquet scan (PushedFilters) — the zero-shuffle query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a dim join (part joins
    via AQE sizing — broadcast at local SF, shuffle at extreme SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .agg(
            F.round(
                100.0
                * dsum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / dsum(rev),
                4,
            ).alias("promo_share")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(qty_sum, 2)      AS total_qty
    FROM (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty_sum
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 150) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join (the pre-aggregation shrinks the
    join input from line items to orders — the order matters at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("qty_sum"))
        .filter(F.col("qty_sum") > 150)
    )
    return (
        big.join(od, od.o_orderkey == big.l_orderkey)
        .join(cu, cu.c_custkey == od.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty_sum", 2).alias("total_qty"),
        )
    )


@register(
    "q19_disjunctive_filter",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT)                          AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-clause predicate across both join
    sides — the classic optimizer stress test."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    j = li.join(pt, li.l_partkey == pt.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q4_priority_with_exists",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated on a non-key predicate → left-semi
    join, then aggregate."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == od.o_orderkey) & (li.l_shipdate > od.o_orderdate)
    return (
        od.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT)   AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           CAST(count(*) AS BIGINT)               AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicator columns."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT)   AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*)                               AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4)          AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4)     AS p90_price,
           round(quantile_cont(l_discount, 0.25), 4)         AS p25_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per group — Spark ``percentile`` and
    DuckDB ``quantile_cont`` share linear-interpolation semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_discount, 0.25)"), 4).alias("p25_disc"),
    )


@register(
    "scalar_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1)               AS last_word,
           (p_type SIMILAR TO '.*BRASS.*')                      AS is_brass,
           regexp_replace(p_name, '[aeiou]', '_', 'g')          AS devoweled,
           CAST(length(regexp_replace(p_name, '[^ ]', '', 'g')) + 1 AS INT) AS n_words
    FROM part
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: extract / rlike / global replace."""
    pt = load_table(spark, sf_dir, "part")
    return pt.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.col("p_type").rlike(".*BRASS.*").alias("is_brass"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        (F.length(F.regexp_replace("p_name", "[^ ]", "")) + 1).cast("int").alias("n_words"),
    )


@register(
    "agg_array_collect",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           CAST(count(*) AS INT)                   AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: sorted collect_list per group (deterministic via
    sort_array — collect order is partition-dependent, so always sort).

    The sorted array is emitted as a '|'-joined string (plus an ``n`` size
    column) because the driver's canonicalizer hashes scalar cells; a raw
    ``array<string>`` cell is unhashable in its pandas sort."""
    na = load_table(spark, sf_dir, "nation")
    return na.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations"),
        F.count("*").cast("int").alias("n"),
    )


@register(
    "join_theta_ranges",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON c.c_acctbal > s.s_acctbal * 2 AND s.s_nationkey = c.c_nationkey
    """,
)
def join_theta_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi part (nationkey) + inequality — Catalyst plans the
    equi-key hash join with the inequality as post-filter."""
    su = load_table(spark, sf_dir, "supplier")
    cu = load_table(spark, sf_dir, "customer")
    return su.join(
        cu,
        (cu.c_acctbal > su.s_acctbal * 2) & (su.s_nationkey == cu.c_nationkey),
    ).select("s_suppkey", "c_custkey")


@register(
    "latest_event_per_user",
    oracle="""
    WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value
                FROM events),
    r AS (SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM ev)
    SELECT user_id, event_id AS last_event_id,
           CAST(ts AS VARCHAR) AS last_ts, event_type AS last_type
    FROM r WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key (the QUALIFY idiom): row_number desc = 1. The
    deduplication shape every CDC/event pipeline runs."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").cast("string").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, round(val, 2) AS val
    FROM (SELECT c_custkey,
                 c_acctbal            AS acctbal,
                 c_acctbal + 50.0     AS with_bonus,
                 c_acctbal - 100.0    AS adjusted
          FROM customer)
    UNPIVOT (val FOR metric IN (acctbal, with_bonus, adjusted))
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): wide metric columns → (key, metric, value).
    Metrics are additive (2-decimal inputs stay 2-decimal) so double rounding
    never sits on a .005 boundary where engines' tie rules differ."""
    cu = load_table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.expr(
            "stack(3, 'acctbal', c_acctbal, 'with_bonus', c_acctbal + 50.0, "
            "'adjusted', c_acctbal - 100.0) AS (metric, val0)"
        ),
    ).select("c_custkey", "metric", F.round("val0", 2).alias("val"))


@register(
    "window_percent_rank",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist()    OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over a total order (unique tiebreak)."""
    od = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return od.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "window_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS latest_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit ROWS frame."""
    od = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("latest_so_far"),
    )


@register(
    "agg_corr_covar",
    # correlation/covariance from DECIMAL-exact moment sums, so the only
    # floating-point steps are the final divisions — engine-independent
    # regardless of partition order (plain corr()/covar_samp() stream
    # doubles in partition order and drift at the last ulp).
    oracle="""
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)       AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)  AS sy,
               -- products in DECIMAL(15,3): inputs carry <=2 true decimal
               -- places, and 15,3 x 15,3 fits DuckDB's int128 product
               -- (18,6 x 18,6 overflows it)
               CAST(sum(CAST(l_quantity AS DECIMAL(15,3))
                        * CAST(l_quantity AS DECIMAL(15,3))) AS DOUBLE)     AS sxx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(15,3))
                        * CAST(l_extendedprice AS DECIMAL(15,3))) AS DOUBLE) AS syy,
               CAST(sum(CAST(l_quantity AS DECIMAL(15,3))
                        * CAST(l_extendedprice AS DECIMAL(15,3))) AS DOUBLE) AS sxy
        FROM lineitem
    )
    SELECT n,
           round((sxy - sx * sy / n) / (n - 1), 4) AS covar_qty_price,
           round((sxy - sx * sy / n)
                 / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6)
               AS corr_qty_price
    FROM m
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance + Pearson correlation of quantity vs price from
    decimal-exact moment sums (the two-pass-free, order-independent
    formulation; built-in corr()/covar_samp() accumulate doubles in
    partition order and differ at the last ulp between engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,6)")
    dp = F.col("l_extendedprice").cast("decimal(18,6)")
    dq3 = F.col("l_quantity").cast("decimal(15,3)")
    dp3 = F.col("l_extendedprice").cast("decimal(15,3)")
    m = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dq).cast("double").alias("sx"),
        F.sum(dp).cast("double").alias("sy"),
        F.sum(dq3 * dq3).cast("double").alias("sxx"),
        F.sum(dp3 * dp3).cast("double").alias("syy"),
        F.sum(dq3 * dp3).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = (sxy - sx * sy / n) / (n - F.lit(1))
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return m.select(
        "n",
        F.round(cov, 4).alias("covar_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


@register(
    "agg_mode_median_disc",
    # exact order statistics DERIVED FROM COUNTS: mode (most frequent
    # value, min-value tiebreak) and discrete median (smallest value whose
    # cumulative count reaches half) per return flag. Both engines run the
    # same integer logic — no reliance on either engine's mode()/
    # quantile_disc() tiebreak or interpolation behavior.
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_quantity AS q, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    t AS (SELECT l_returnflag, CAST(sum(cnt) AS BIGINT) AS total
          FROM c GROUP BY l_returnflag),
    ranked AS (
        SELECT l_returnflag, q, cnt,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, q) AS rn,
               sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY q
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM c
    ),
    mode_v AS (SELECT l_returnflag, q AS mode_qty, cnt AS mode_count
               FROM ranked WHERE rn = 1),
    med AS (SELECT r.l_returnflag, min(r.q) AS median_disc_qty
            FROM ranked r JOIN t ON r.l_returnflag = t.l_returnflag
            WHERE r.cum * 2 >= t.total
            GROUP BY r.l_returnflag)
    SELECT m.l_returnflag, m.mode_qty, CAST(m.mode_count AS BIGINT) AS mode_count,
           d.median_disc_qty
    FROM mode_v m JOIN med d ON m.l_returnflag = d.l_returnflag
    """,
)
def agg_mode_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode + discrete median per return flag from the value-count
    relation — one fact shuffle builds the counts; windows and the median
    scan run over the tiny (flag, value) set."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", F.col("l_quantity").alias("q")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    t = c.groupBy("l_returnflag").agg(F.sum("cnt").cast("bigint").alias("total"))
    w_rank = W.partitionBy("l_returnflag").orderBy(F.desc("cnt"), "q")
    w_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = c.select(
        "l_returnflag",
        "q",
        "cnt",
        F.row_number().over(w_rank).alias("rn"),
        F.sum("cnt").over(w_cum).alias("cum"),
    )
    mode_v = ranked.filter("rn = 1").select(
        "l_returnflag",
        F.col("q").alias("mode_qty"),
        F.col("cnt").cast("bigint").alias("mode_count"),
    )
    med = (
        ranked.join(t, "l_returnflag")
        .filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("q").alias("median_disc_qty"))
    )
    return mode_v.join(med, "l_returnflag")

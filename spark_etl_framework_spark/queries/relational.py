"""Core relational queries (SURVEY.md §2.C seed set + standard catalogue).

The reference delegates all relational computation to Spark SQL
(reference: etl/common/SqlActor.scala:86); here each construct is expressed
with the DataFrame API (same Catalyst plans, clearer pushdown/broadcast
control) and oracle-checked against DuckDB.

Scale notes (100 TB design stance):
- dimension joins (region/nation/supplier/customer-sized) are explicit
  ``F.broadcast`` — no shuffle of the fact table for a kB-sized dim;
- aggregations are expressed as single groupBy so Catalyst plans
  partial (map-side) aggregation before the shuffle;
- filters are applied before joins so parquet scans get pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import dsum, register

# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)   AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate. One shuffle on a tiny
    (flag, status) key space; partial aggregation does nearly all the work
    map-side, so this scales linearly with input bytes."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price, 2).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), 2).alias("sum_charge"),
            F.round(dsum(F.col("l_quantity")) / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round(dsum(F.col("l_extendedprice")) / F.count(F.lit(1)), 4).alias("avg_price"),
            F.round(dsum(F.col("l_discount")) / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_global_stats",
    oracle="""
    SELECT count(*)                                    AS n_rows,
           count(DISTINCT l_orderkey)                  AS n_orders,
           count(DISTINCT l_partkey)                   AS n_parts,
           CAST(min(l_shipdate) AS VARCHAR)            AS min_ship,
           CAST(max(l_shipdate) AS VARCHAR)            AS max_ship,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_disc
    FROM lineitem
    """,
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregate incl. two COUNT DISTINCTs — Catalyst plans
    these as expand + two-phase aggregate; no driver-side reduction."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_shipdate").cast("string").alias("min_ship"),
        F.max("l_shipdate").cast("string").alias("max_ship"),
        dsum(F.col("l_extendedprice"), 2).alias("total_price"),
        F.round(dsum(F.col("l_discount")) / F.count(F.lit(1)), 6).alias("mean_disc"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT)          AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregate (subtotals + grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT)      AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate over orders (all grouping-set combinations)."""
    od = load_table(spark, sf_dir, "orders")
    return od.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING sum(CAST(l_quantity AS BIGINT)) > 100
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING; the post-aggregate filter stays after the shuffle
    but the aggregate itself is still partial/map-side first."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 100)
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS VARCHAR)                      AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    customer grows with SF, so no forced broadcast — AQE's size-based
    planning picks broadcast vs shuffle at runtime (a forced hint would
    override it and OOM executors at 100×). order/lineitem join shuffles on
    orderkey once. Top-k has a unique tiebreak so LIMIT is deterministic."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. Fixed dims (nation/region)
    broadcast; customer/supplier grow with SF so AQE sizes those joins at
    runtime — a forced hint would OOM at 100×. The only big
    shuffle is lineitem⋈orders on orderkey. Catalyst + AQE reorder/size the
    rest."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(
            su,
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(count(o_orderkey) AS BIGINT)            AS n_orders,
           round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0), 2) AS spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers (count=0, spent=0)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)), 2).alias("spent"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust_nat AS (SELECT DISTINCT c_nationkey AS k FROM customer),
         supp_nat AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
    SELECT coalesce(c.k, s.k)        AS nationkey,
           (c.k IS NOT NULL)         AS has_customer,
           (s.k IS NOT NULL)         AS has_supplier
    FROM cust_nat c
    FULL OUTER JOIN supp_nat s ON c.k = s.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations with customers and/or suppliers."""
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    su = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    return cu.join(su, cu.k == su.k, "full_outer").select(
        F.coalesce(cu.k, su.k).alias("nationkey"),
        cu.k.isNotNull().alias("has_customer"),
        su.k.isNotNull().alias("has_supplier"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with at least one large order.
    Semi-join never duplicates the left side — no post-dedup needed."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no order above 250k."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey <> r.r_regionkey
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dims (5×25) with a non-equi filter — the only
    sane cross join is a broadcast nested loop, which Catalyst picks here."""
    re = load_table(spark, sf_dir, "region")
    na = load_table(spark, sf_dir, "nation")
    return (
        re.crossJoin(F.broadcast(na))
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# Set operations / distinct / top-k
# --------------------------------------------------------------------------


@register(
    "setop_union_except_intersect",
    oracle="""
    WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 150000),
         urgent AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'union' AS op, k FROM (SELECT k FROM big UNION SELECT k FROM urgent)
    UNION ALL
    SELECT 'intersect' AS op, k FROM (SELECT k FROM big INTERSECT SELECT k FROM urgent)
    UNION ALL
    SELECT 'except' AS op, k FROM (SELECT k FROM big EXCEPT SELECT k FROM urgent)
    """,
)
def setop_union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two derived key sets, tagged by op."""
    od = load_table(spark, sf_dir, "orders")
    big = od.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("k")).distinct()
    urgent = (
        od.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    return (
        big.union(urgent).distinct().select(F.lit("union").alias("op"), "k")
        .unionAll(big.intersect(urgent).select(F.lit("intersect").alias("op"), "k"))
        .unionAll(big.exceptAll(urgent).distinct().select(F.lit("except").alias("op"), "k"))
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — the reference's de-duplicate idiom
    (reference: src/test/resources/scripts/de-duplicate-features.sql:1-7)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heap
    then k-merge on the driver; never a full sort of the table."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


# --------------------------------------------------------------------------
# Scalar expressions / subqueries
# --------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           substr(c_name, 1, 8)                            AS name_prefix,
           CAST(length(c_name) AS INT)                     AS name_len,
           concat(c_mktsegment, ':', c_name)               AS tagged,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                            AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'B') AS seg_or_b
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function family: substr/upper/length/concat/case/nullif —
    the reference's SQL corpus staples (SURVEY.md §2.C). All JVM-codegen."""
    cu = load_table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("B")).alias("seg_or_b"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)    AS yr,
           CAST(month(o_orderdate) AS INT)   AS mo,
           CAST(count(*) AS BIGINT)          AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing: year/month extraction + aggregate."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "subquery_scalar_above_avg",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery threshold filter. Expressed in SQL so Catalyst plans
    the subquery as a broadcast scalar, not a driver-side collect."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "subquery_in_filter",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      AND o_orderstatus <> 'F'
    """,
)
def subquery_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — planned as a (broadcast) left-semi join, plus the
    reference's `not in / !=` compound-predicate idiom
    (reference: src/test/resources/pipelines/template_pipeline.yaml:63)."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
          AND o_orderstatus <> 'F'
        """
    )


@register(
    "cte_chain",
    oracle="""
    WITH cust_orders AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS spent
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT c.c_name, n.n_name AS nation, co.n_orders, co.spent
        FROM cust_orders co
        JOIN customer c ON co.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
    )
    SELECT nation, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(CAST(spent AS DECIMAL(18,6))), 2) AS DOUBLE) AS nation_spent
    FROM ranked GROUP BY nation
    """,
)
def cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs (the reference's multi-statement SQL style,
    reference: src/test/resources/scripts/stream-user-train.sql:1-15)."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH cust_orders AS (
            SELECT o_custkey, count(*) AS n_orders,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS spent
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT c.c_name, n.n_name AS nation, co.n_orders, co.spent
            FROM cust_orders co
            JOIN customer c ON co.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
        )
        SELECT nation, count(*) AS n_customers,
               CAST(round(sum(CAST(spent AS DECIMAL(18,6))), 2) AS DOUBLE) AS nation_spent
        FROM ranked GROUP BY nation
        """
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_O,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_F,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — the explicit list keeps the plan a
    single pass (no extra distinct-values job) and fixes output columns."""
    od = load_table(spark, sf_dir, "orders")
    p = (
        od.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("st_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("st_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("st_P"),
    )

"""Fourth wave: TPC-H Q7/Q8/Q12 shapes over the available columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import dsum, register


@register(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year. The nation dim
    joins twice (supplier side + customer side) — both broadcast (25 rows,
    fixed); customer/supplier joins are left to AQE sizing."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    sn = na.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    cn = na.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sn), su.s_nationkey == sn.s_nk)
        .join(F.broadcast(cn), cu.c_nationkey == cn.c_nk)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH rev AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               sn.n_name AS supp_nation,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
    )
    SELECT order_year,
           round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6) AS nation3_share
    FROM rev GROUP BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly volume — conditional sum
    over total, single aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("n_name").alias("supp_nation"),
            vol.alias("volume"),
        )
    )
    return rev.groupBy("order_year").agg(
        F.round(
            dsum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / dsum(F.col("volume")),
            6,
        ).alias("nation3_share")
    )


@register(
    "q12_priority_case_sum",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_returnflag
    """,
)
def q12_priority_case_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: case-sum split by priority class over a join with a
    cross-table predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, (li.l_orderkey == od.o_orderkey) & (li.l_shipdate > od.o_orderdate))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )

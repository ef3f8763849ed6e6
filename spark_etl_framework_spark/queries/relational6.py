"""Sixth wave: the remaining TPC-H shapes — Q2/Q11/Q17/Q20/Q21/Q22.

The test tables carry no ``partsupp``, ``c_phone``, ``l_receiptdate`` or
``l_commitdate``, so each query keeps the *shape* (the operator composition
the reference's SQL surface must support — correlated min, scalar-subquery
HAVING, correlated avg, nested IN, double-correlated EXISTS/NOT EXISTS,
anti-join + scalar subquery) while deriving the missing relation from
``lineitem`` the same way ``q16_supplier_part_counts`` does.

Determinism across engines (see the registry docstring): money sums go
through :func:`dsum` (decimal accumulate, round in decimal, emit double);
threshold comparisons are kept in exact decimal or rewritten multiply-form
(``bal * n > sum`` instead of ``bal > sum / n``) so no engine-specific
double rounding can flip a boundary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import dsum, dsum_sql, register


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
    FROM part
    JOIN ps ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
      AND supplycost = (
          SELECT min(ps2.supplycost)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest regional supplier per selected part — a
    correlated-min subquery. Unit supply cost is derived from lineitem
    (min extendedprice/quantity per part-supplier, the partsupp stand-in).

    Scale plan: ONE aggregation over lineitem builds the part-supplier cost
    relation (shuffle on the group keys); the correlated min is a window
    over ``p_partkey`` on the post-filter joined set instead of a second
    scan. nation/region broadcast (fixed size); supplier and the
    aggregated ps relation grow with SF so AQE sizes those joins.
    Reference surface: correlated scalar subqueries pass through
    ``session.sql`` verbatim (etl/common/SqlActor.scala:86).
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    rg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    # European (part, supplier, cost) triples; the window min per part over
    # THIS set equals the correlated min because the subquery has the same
    # region restriction and no part filter beyond the key equality.
    eu = (
        ps.join(su, ps.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(rg), na.n_regionkey == rg.r_regionkey)
    )
    return (
        eu.join(pt, eu.l_partkey == pt.p_partkey)
        .withColumn("_min_cost", F.min("supplycost").over(W.partitionBy("p_partkey")))
        .filter(F.col("supplycost") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT l_partkey AS partkey,
               round(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))), 2) AS value_dec
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey IN (7, 12, 17, 22)
        GROUP BY l_partkey
    )
    SELECT CAST(partkey AS BIGINT) AS partkey,
           CAST(value_dec AS DOUBLE) AS part_value
    FROM (
        SELECT partkey, value_dec, sum(value_dec) OVER () AS total_dec FROM v
    )
    WHERE value_dec * 1000 > total_dec
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value restricted to one nation
    group, HAVING value above a fraction of the total (a scalar subquery
    over the same aggregate).

    Scale plan: one lineitem⋈supplier join + one groupBy(partkey) shuffle;
    the global total is a window over the ALREADY-aggregated per-part set
    (small — at most |part| rows), not a second lineitem scan. The
    fraction test is multiply-form in exact decimal (``value*1000 >
    total``) so no division rounding can flip a boundary part.
    """
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(7, 12, 17, 22)
    )
    v = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,6)")),
                2,
            ).alias("value_dec")
        )
    )
    return (
        v.withColumn("total_dec", F.sum("value_dec").over(W.partitionBy()))
        .filter(F.col("value_dec") * 1000 > F.col("total_dec"))
        .select(
            F.col("partkey").cast("bigint").alias("partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity orders — a correlated avg
    subquery per part (``l_quantity < 0.2 * avg(quantity for that part)``).

    Scale plan: the per-part average is a window over ``l_partkey`` on the
    lineitems of the (filtered, small) part set — one shuffle on partkey,
    no second full-lineitem pass. The correlated subquery in the oracle
    averages over ALL lineitems of the part, and the join restricts only
    by partkey, so the window over the joined set is equivalent.
    ``l_quantity`` is integral, so avg (exact integer sum in double) is
    order-independent and engine-stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    joined = li.join(pt, li.l_partkey == pt.p_partkey).withColumn(
        "avg_qty", F.avg("l_quantity").over(W.partitionBy("l_partkey"))
    )
    return joined.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        (
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2).cast("double")
            / 7.0
        ).alias("avg_yearly")
    )


@register(
    "q20_part_promotion",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 2
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 40
      )
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of selected
    parts in a year — nested IN subqueries (supplier IN (... part IN ...))
    with a HAVING over the inner aggregate.

    Scale plan: date-filtered lineitem semi-joins the (small, name-filtered)
    part set — AQE broadcasts it — then ONE groupBy(suppkey, partkey)
    shuffle; qualifying supplier keys are distinct-projected (tiny) and
    semi-join supplier. No correlated re-scan; the IN nests become two
    semi joins. ``sum(l_quantity)`` sums integral doubles → exact.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    big_movers = (
        li.join(red, li.l_partkey == red.p_partkey, "semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(big_movers, su.s_suppkey == big_movers.l_suppkey, "semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier orders —
    the double-correlated EXISTS / NOT EXISTS. "Late" = shipped more than
    60 days after the order date (the tables carry no receipt/commit
    dates).

    Scale plan: instead of two correlated lineitem re-scans (three joins on
    a 100 TB fact), ONE lineitem⋈orders join then two cheap aggregations:
    per (order, supplier) count late rows; per order count suppliers and
    late suppliers. EXISTS(other supplier) ⇔ suppliers_in_order ≥ 2;
    NOT EXISTS(other late supplier) ⇔ late_suppliers == 1 given own late
    rows > 0. Each qualifying supplier contributes its LATE ROW COUNT
    (the oracle counts l1 rows), so numwait sums ``n_late``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    su = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_os = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count_if(late).alias("n_late"))
    )
    per_order = per_os.select(
        "l_orderkey",
        "l_suppkey",
        "n_late",
        F.count(F.lit(1)).over(W.partitionBy("l_orderkey")).alias("n_supp"),
        F.sum((F.col("n_late") > 0).cast("int"))
        .over(W.partitionBy("l_orderkey"))
        .alias("n_late_supp"),
    )
    blamed = per_order.filter(
        (F.col("n_late") > 0) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        blamed.join(su, blamed.l_suppkey == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late").cast("bigint").alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH pos AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) AS s, count(*) AS n
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (3, 8, 13, 18, 23)
    )
    SELECT CAST(c_nationkey AS INT) AS nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           {dsum_sql("c_acctbal", 2)} AS totacctbal
    FROM customer, pos
    WHERE c_nationkey IN (3, 8, 13, 18, 23)
      AND CAST(c_acctbal AS DECIMAL(18,6)) * n > s
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers in selected countries with no
    recent orders — scalar-subquery threshold (avg positive balance) +
    anti-join. Country codes come from ``c_nationkey`` (no ``c_phone``
    column), and "no orders" is scoped to the last window of the data
    (every sf0.01 customer has SOME order, so the unscoped anti-join
    would be vacuously empty).

    Scale plan: the threshold is a 1-row aggregate broadcast-crossed into
    the filter; the no-orders test is a shuffle anti-join on custkey (at
    100 TB, orders ≫ customer — the anti-join shuffles only the two key
    columns). The avg test is multiply-form in exact decimal
    (``bal * n > sum``) — no division, no double rounding, so both
    engines agree on boundary customers exactly.
    """
    nations = [3, 8, 13, 18, 23]
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = cu.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        cu.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast("decimal(18,6)") * F.col("n") > F.col("s"))
        .join(od, cu.c_custkey == od.o_custkey, "anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )

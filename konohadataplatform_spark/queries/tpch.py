"""Core relational operator coverage (SURVEY §2.2-2.7) on the star schema.

The reference exposes the full Spark SQL surface through Kyuubi
(S8, ``docs/components/kyuubi.md:61-67``); these queries exercise that
surface — scan→filter→join→agg→window→sort→limit — as idiomatic
DataFrame plans so Catalyst does pushdown/pruning/join-selection.

Scale posture (100 TB):
- dimension joins (`region`/`nation`/`supplier`/`part`) are explicitly
  `broadcast()` — no shuffle of the fact table for dim joins;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  AQE handles skew;
- aggregates are partial (map-side) automatically via hash aggregation;
- all filters are simple column predicates that push into the parquet
  scan (verified via .explain PushedFilters in tests/test_plans.py).

Money arithmetic goes through DECIMAL (see functions.dec) so results are
bit-identical to the DuckDB oracle regardless of partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from konohadataplatform_spark.sources.star_schema import load_table
from konohadataplatform_spark.functions import dec, dsum

QUERIES = {}
ORACLE = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query name {name!r}: a second @query would "
                "silently shadow the first in the driver registry"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# q1 — pricing summary: full-scan filter + multi-key hash agg (A1-A4,A6)
# Reference declares the same agg shapes in dbt marts
# (daily_order_metrics.sql:20-29); TPC-H Q1 shape over lineitem.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice")
    disc = dec("l_discount")
    tax = dec("l_tax")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2000-12-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count(F.lit(1))).alias("avg_price"),
            (dsum("l_discount") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q3 — shipping priority: 3-way join + agg + deterministic top-k (J1,A1,O1)
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("timestamp").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# q5 — local supplier volume: 6-way join incl. broadcast dims (J1/J2)
# --------------------------------------------------------------------------
@query(
    "q5_local_supplier",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# q6 — forecast revenue: pure pushdown filter + global agg (P4,A4)
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q10 — returned items: join + agg + top-k with broadcast dim (J1,J2,O1)
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-07-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q_count_distinct — COUNT(DISTINCT) per group (A5, daily_order_metrics.sql:29)
# --------------------------------------------------------------------------
@query(
    "q_count_distinct",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# q_union_all — UNION ALL set op (U1, stg_users.sql:16-23 shape)
# --------------------------------------------------------------------------
@query(
    "q_union_all",
    """
    WITH u AS (
      SELECT o_orderkey, 'URGENT' AS bucket, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey, 'LOW' AS bucket, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderpriority = '5-LOW'
    )
    SELECT bucket, COUNT(*) AS n, CAST(SUM(price) AS DOUBLE) AS total_price
    FROM u GROUP BY bucket
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("URGENT").alias("bucket"), dec("o_totalprice").alias("price")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_orderkey", F.lit("LOW").alias("bucket"), dec("o_totalprice").alias("price")
    )
    return (
        urgent.unionByName(low)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast("double").alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# q_semi_anti_join — LEFT SEMI / LEFT ANTI (S6 merge building blocks;
# SURVEY §2.3 notes the full join surface must be supported at S8)
# --------------------------------------------------------------------------
@query(
    "q_semi_anti_join",
    """
    WITH has_big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000)
    SELECT 'with_big_order' AS cohort, COUNT(*) AS n_customers
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM has_big)
    UNION ALL
    SELECT 'without_big_order' AS cohort, COUNT(*) AS n_customers
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM has_big)
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    semi = (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("with_big_order").alias("cohort"), "n_customers")
    )
    anti = (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("without_big_order").alias("cohort"), "n_customers")
    )
    return semi.unionByName(anti)


# --------------------------------------------------------------------------
# q_scalar_subquery — uncorrelated scalar subquery cutoff (P4/P5,
# daily_order_metrics.sql:32-35 incremental pattern)
# --------------------------------------------------------------------------
@query(
    "q_scalar_subquery",
    """
    SELECT o_orderpriority, COUNT(*) AS n_recent,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS recent_value
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >=
          (SELECT MAX(CAST(o_orderdate AS DATE)) - INTERVAL 90 DAY FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_q_ss_orders")
    # Expressed in SQL so Catalyst plans the scalar subquery (a one-row
    # broadcast) instead of a driver-side collect.
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_recent,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS recent_value
        FROM _q_ss_orders
        WHERE CAST(o_orderdate AS DATE) >=
              (SELECT MAX(CAST(o_orderdate AS DATE)) - INTERVAL 90 DAY FROM _q_ss_orders)
        GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# q_topk_parts — window rank over agg + filter (W2 shape on parts)
# --------------------------------------------------------------------------
@query(
    "q_topk_parts",
    """
    WITH b AS (
      SELECT p_brand, p_type,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_retail,
             COUNT(*) AS n_parts
      FROM part GROUP BY p_brand, p_type
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY p_type
                                   ORDER BY total_retail DESC, p_brand) AS rk
      FROM b
    )
    SELECT p_type, p_brand, total_retail, n_parts, rk FROM r WHERE rk <= 3
    """,
)
def q_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    part = _t(spark, sf_dir, "part")
    agg = part.groupBy("p_brand", "p_type").agg(
        dsum("p_retailprice").alias("total_retail"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    w = Window.partitionBy("p_type").orderBy(
        F.col("total_retail").desc(), F.col("p_brand")
    )
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_type", "p_brand", "total_retail", "n_parts", "rk")
    )


# --------------------------------------------------------------------------
# q4 — order priority checking: EXISTS semi-join + having-style agg
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-10-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem")
    # EXISTS == left-semi join with the correlated predicate as condition
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate.cast("date") > orders.o_orderdate.cast("date")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# q12 — shipmode/priority matrix: join + two conditional aggs
# --------------------------------------------------------------------------
@query(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q14 — promo revenue: conditional numerator over joined scan (broadcast part)
# --------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    """
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(dec(F.lit(0)))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q18 — large-volume customers: IN-subquery over grouped HAVING
# --------------------------------------------------------------------------
@query(
    "q18_large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("timestamp").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "orderdate",
            dec("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
    )


# --------------------------------------------------------------------------
# q19 — disjunctive multi-attribute predicates (OR across join columns)
# --------------------------------------------------------------------------
@query(
    "q19_disjunctive_filter",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity >= 10)
       OR (p_type = 'PROMO' AND l_quantity >= 20)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 30)
            & (F.col("l_quantity") >= 10)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 20))
    )
    return joined.filter(cond).agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# q7 — volume shipping between two nations, by year (multi-join +
# disjunctive pair predicate + year derivation)
# --------------------------------------------------------------------------
@query(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             YEAR(l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# q8 — market share: ratio of conditional to total volume per year
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM (
      SELECT YEAR(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
                    JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = dec("l_extendedprice") * (1 - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        dec(F.lit(0))
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q13 — customer order-count distribution (LEFT JOIN + double grouping)
# --------------------------------------------------------------------------
@query(
    "q13_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q22 — global sales opportunity: substring bucketing + avg scalar
# subquery + NOT EXISTS anti-join
# --------------------------------------------------------------------------
@query(
    "q22_global_sales",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
      FROM customer WHERE c_acctbal > 0
    )
    SELECT substring(c_name, 10, 1) AS name_digit,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY substring(c_name, 10, 1)
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("_q22_customer")
    avg_bal = spark.sql(
        """
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
        FROM _q22_customer WHERE c_acctbal > 0
        """
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("v"))
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return no_orders.groupBy(
        F.substring("c_name", 10, 1).alias("name_digit")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal").alias("totacctbal"),
    )


# --------------------------------------------------------------------------
# q15 — top supplier(s) by revenue: agg view + max scalar subquery
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    li.createOrReplaceTempView("_q15_lineitem")
    supp.createOrReplaceTempView("_q15_supplier")
    # SQL form so Catalyst plans the MAX as a reusable subquery
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
          FROM _q15_lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(total_rev AS DOUBLE) AS total_revenue
        FROM _q15_supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        """
    )


# --------------------------------------------------------------------------
# q17 — small-quantity-order revenue: per-part correlated avg threshold
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity",
    """
    WITH part_avg AS (
      SELECT l_partkey,
             0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < threshold
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (
            F.lit(0.5)
            * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Supplier scorecard: multi-table KPI rollup (revenue, breadth, return
# rate) — the operational-report join shape
# --------------------------------------------------------------------------
@query(
    "q_supplier_scorecard",
    """
    SELECT s_suppkey, s_name, n_name,
           COUNT(*) AS n_lines,
           COUNT(DISTINCT l_partkey) AS n_parts,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(100.0 AS DOUBLE) * COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END)
               / NULLIF(COUNT(*), 0) AS return_rate_pct
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    GROUP BY s_suppkey, s_name, n_name
    """,
)
def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            (
                F.lit(100.0)
                * F.count(F.when(F.col("l_returnflag") == "R", 1))
                / F.nullif(F.count(F.lit(1)), F.lit(0))
            ).alias("return_rate_pct"),
        )
    )


# --------------------------------------------------------------------------
# Month-over-month revenue growth: time-series lag over a monthly grain
# --------------------------------------------------------------------------
@query(
    "q_monthly_growth",
    """
    WITH monthly AS (
      SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY y, m
    ), seq AS (
      SELECT y, m, CAST(rev AS DOUBLE) AS revenue,
             CAST(LAG(rev) OVER (ORDER BY y, m) AS DOUBLE) AS prev_revenue
      FROM monthly
    )
    SELECT y, m, revenue, prev_revenue,
           CAST(100.0 AS DOUBLE) * (revenue - prev_revenue)
             / NULLIF(prev_revenue, 0) AS growth_pct
    FROM seq
    """,
)
def q_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    w = Window.orderBy("y", "m")
    seq = monthly.select(
        "y",
        "m",
        F.col("rev").cast("double").alias("revenue"),
        F.lag("rev").over(w).cast("double").alias("prev_revenue"),
    )
    return seq.select(
        "y",
        "m",
        "revenue",
        "prev_revenue",
        (
            F.lit(100.0)
            * (F.col("revenue") - F.col("prev_revenue"))
            / F.nullif(F.col("prev_revenue"), F.lit(0.0))
        ).alias("growth_pct"),
    )


# --------------------------------------------------------------------------
# q21 shape — suppliers who kept waiting: multi-level correlation via
# window counts (orders with >1 supplier where ONLY this supplier was
# late), the hardest relational shape in the TPC-H family
# --------------------------------------------------------------------------
@query(
    "q21_waiting_supplier",
    """
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             CAST(l_linenumber % 2 = 0 AS INT) AS is_late
      FROM lineitem
    ), per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_suppliers,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_suppliers
      FROM li GROUP BY l_orderkey
    ), culprits AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN per_order p ON li.l_orderkey = p.l_orderkey
      WHERE li.is_late = 1 AND p.n_suppliers > 1 AND p.n_late_suppliers = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM culprits JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the testdata has no l_commitdate; a deterministic mixed lateness
    # flag (linenumber parity) preserves the query's correlation
    # structure, which is what q21 exercises
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_linenumber") % 2 == 0).cast("int").alias("is_late"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "n_late_suppliers"
        ),
    )
    culprits = (
        li.join(per_order, "l_orderkey")
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_suppliers") > 1)
            & (F.col("n_late_suppliers") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        culprits.join(F.broadcast(supp), culprits.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# q2 — minimum-cost supplier (TPC-H Q2 shape). The testdata has no
# partsupp table, so the supply relation is derived: per (part, supplier)
# pair observed in lineitem, supplycost := MIN(l_extendedprice). The
# correlated-MIN-subquery structure, the 4-dim join fan, and the
# deterministic top-k are exactly Q2's.
#
# Scale: the supply relation groups lineitem once on (partkey, suppkey);
# the per-part minimum is a second agg on the same partkey axis, so the
# min-join reuses the shuffle partitioning. All dims broadcast.
# --------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(l_extendedprice) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ), eur AS (
      SELECT ps.partkey, ps.suppkey, ps.supplycost, s_acctbal, s_name, n_name
      FROM ps JOIN supplier ON s_suppkey = ps.suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(supplycost AS DOUBLE) AS supplycost
    FROM eur JOIN part ON p_partkey = eur.partkey
    WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'STANDARD'
      AND supplycost = (SELECT MIN(e2.supplycost) FROM eur e2
                        WHERE e2.partkey = eur.partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_type") == "STANDARD")
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("l_extendedprice").alias("supplycost"))
    eur = (
        ps.join(F.broadcast(supp), ps.suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("partkey", "suppkey", "supplycost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = eur.groupBy("partkey").agg(F.min("supplycost").alias("min_cost"))
    return (
        eur.join(min_cost, "partkey")
        .filter(F.col("supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q9 — product-type profit by nation and year (TPC-H Q9 shape). Without
# partsupp, the cost leg uses the part's retail price: amount :=
# extprice*(1-disc) - 0.5*retailprice*quantity, all in exact DECIMAL.
# Same 5-way join fan (lineitem⋈part⋈supplier⋈orders⋈nation) and the
# same substring part filter.
# --------------------------------------------------------------------------
@query(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit,
           COUNT(*) AS n_lines
    FROM (
      SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
             - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.5 AS DECIMAL(3,1))
               * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM lineitem JOIN part ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    amount = dec("l_extendedprice") * (1 - dec("l_discount")) - dec(
        "p_retailprice"
    ) * F.lit(0.5).cast("decimal(3,1)") * dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(amount).cast("double").alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q11 — important stock (TPC-H Q11 shape): per-part value for one
# nation's suppliers, kept only when above a fraction of the grand
# total — the GROUP BY + HAVING-over-scalar-subquery pattern. value :=
# SUM(extprice*quantity) from lineitem (partsupp analog), exact DECIMAL.
#
# Scale: the grand total is a 1-row aggregate broadcast into the filter,
# never a driver collect; the per-part agg shuffles digest-small rows.
# --------------------------------------------------------------------------
@query(
    "q11_important_stock",
    """
    WITH ps AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS val
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT partkey, CAST(val AS DOUBLE) AS val
    FROM ps
    WHERE val > (SELECT SUM(val) * CAST(0.001 AS DECIMAL(6,4)) FROM ps)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    ps = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("val"))
    )
    total = ps.agg(
        (F.sum("val") * F.lit(0.001).cast("decimal(6,4)")).alias("cutoff")
    )
    return (
        ps.join(F.broadcast(total))
        .filter(F.col("val") > F.col("cutoff"))
        .select("partkey", F.col("val").cast("double").alias("val"))
    )


# --------------------------------------------------------------------------
# q16 — supplier-part relationship counts (TPC-H Q16 shape): distinct
# (part, supplier) pairs from lineitem stand in for partsupp; the
# "customer complaints" exclusion becomes negative-balance suppliers.
# Keeps the NOT IN anti-join + COUNT(DISTINCT) + multi-key grouping.
# --------------------------------------------------------------------------
@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
          FROM lineitem) ps
    JOIN part ON p_partkey = partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    return (
        ps.join(F.broadcast(bad), ps.suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q20 — potential part promotion (TPC-H Q20 shape): suppliers in a
# nation set who shipped more than a threshold quantity of name-matched
# parts in a year — the nested IN-subquery + HAVING structure. The
# availqty>half-shipped predicate becomes the shipped-quantity HAVING
# (no partsupp.availqty in the testdata).
# --------------------------------------------------------------------------
@query(
    "q20_potential_promotion",
    """
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_4', 'NATION_14', 'NATION_24')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 30
      )
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qualified = (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
        )
        .join(F.broadcast(parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_4", "NATION_14", "NATION_24")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == F.col("n_nationkey"))
        .join(
            F.broadcast(qualified),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )

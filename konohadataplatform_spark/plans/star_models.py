"""The reference's pipeline shape running on the warehouse-scale star
schema (not the 5-row dbt fixtures): seed -> staging -> incremental
marts, materialized through the snapshot catalog.

This is the "switch path" for a reference user: the same
staging-projection + daily-incremental-mart + customer-summary DAG
(``dbt/analytics/models/**`` shapes) over real tables, with the
incremental mart date-partitioned so reruns commit partition-scoped
merges (only changed days rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from konohadataplatform_spark.functions import dec
from konohadataplatform_spark.plans.pipeline import ModelSpec, Pipeline
from konohadataplatform_spark.sources.star_schema import load_table


def stg_orders_star(spark: SparkSession, ctx) -> DataFrame:
    src = ctx.source("orders_raw")
    return src.select(
        "o_orderkey",
        "o_custkey",
        F.upper(F.trim("o_orderstatus")).alias("status"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        dec("o_totalprice").alias("total_price"),
        F.split("o_orderpriority", "-").getItem(0).cast("int").alias("priority_num"),
    )


def mart_daily_metrics_star(spark: SparkSession, ctx) -> DataFrame:
    orders = ctx.ref("stg_orders_star")
    if ctx.is_incremental("mart_daily_metrics_star"):
        from konohadataplatform_spark.catalog import incremental_cutoff

        cutoff = incremental_cutoff(
            ctx.ref("mart_daily_metrics_star"), "metric_date"
        )
        if cutoff is not None:
            orders = orders.filter(F.col("order_date") >= F.lit(cutoff))
    return (
        orders.groupBy(F.col("order_date").alias("metric_date"))
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.count(F.when(F.col("status") == "F", 1)).alias("completed_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            F.sum("total_price").cast("double").alias("total_value"),
        )
        .withColumn("metric_date", F.col("metric_date").cast("string"))
    )


def mart_customer_summary_star(spark: SparkSession, ctx) -> DataFrame:
    cust = ctx.source("customer_raw")
    orders = ctx.ref("stg_orders_star")
    base = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.coalesce(F.count("o_orderkey"), F.lit(0)).alias("total_orders"),
            F.coalesce(F.sum(F.when(F.col("status") == "F", F.col("total_price"))), F.lit(0))
            .cast("double")
            .alias("completed_value"),
        )
    )
    # customer-grain mart: the global W1 rank goes through the
    # range-partitioned two-phase pattern, not a single-task WindowExec
    from konohadataplatform_spark.operators.ranking import scalable_row_number

    return scalable_row_number(
        base,
        [F.col("completed_value").desc(), F.col("c_custkey").asc()],
        out_col="revenue_rank",
        # counted gate: customer-grain mart — the raw customer source
        # bounds the ranked relation
        probe_side=cust,
    )


def build_star_pipeline(spark: SparkSession, catalog, sf_dir: str) -> Pipeline:
    p = Pipeline(spark, catalog)
    p.add_source("orders_raw", load_table(spark, sf_dir, "orders"))
    p.add_source("customer_raw", load_table(spark, sf_dir, "customer"))
    p.model(ModelSpec("stg_orders_star", stg_orders_star, tags=["staging"]))
    p.model(
        ModelSpec(
            "mart_daily_metrics_star",
            mart_daily_metrics_star,
            materialization="incremental",
            unique_key=["metric_date"],
            partition_by=None,
            depends_on=["stg_orders_star"],
            tags=["marts"],
        )
    )
    p.model(
        ModelSpec(
            "mart_customer_summary_star",
            mart_customer_summary_star,
            depends_on=["stg_orders_star"],
            tags=["marts"],
        )
    )
    return p

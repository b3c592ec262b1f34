"""The five reference dbt models, ported 1:1 (shapes and fixtures).

Sources mirrored from the reference's inline literal fixtures
(FIXTURES.md §1; ``dbt/analytics/models/staging/stg_users.sql:14-24``,
``stg_orders.sql:14-30``, duplicated in ``simple_pipeline.sql:15-45``):
5 users, 8 orders, statuses completed/pending/cancelled.

Determinism: ``current_timestamp()`` (used by every reference model,
e.g. ``stg_users.sql:35``) is replaced by the injected fixed clock
(functions.fixed_clock) per FIXTURES.md §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from konohadataplatform_spark.functions import dec, fixed_clock

RAW_USERS = [
    (1, "Alice Johnson", "alice@example.com", 25, "Engineering"),
    (2, "Bob Smith", "bob@example.com", 30, "Marketing"),
    (3, "Charlie Brown", "charlie@example.com", 35, "Sales"),
    (4, "Diana Prince", "diana@example.com", 28, "Engineering"),
    (5, "Eve Wilson", "eve@example.com", 32, "Marketing"),
]
RAW_USERS_COLS = ["user_id", "full_name", "email", "age", "department"]

RAW_ORDERS = [
    (1, 1, "100.50", "2024-01-15", "completed"),
    (2, 2, "250.75", "2024-01-16", "completed"),
    (3, 1, "75.25", "2024-01-17", "pending"),
    (4, 3, "400.00", "2024-01-18", "completed"),
    (5, 4, "150.30", "2024-01-19", "completed"),
    (6, 2, "320.80", "2024-01-20", "cancelled"),
    (7, 5, "89.99", "2024-01-21", "completed"),
    (8, 1, "199.95", "2024-01-22", "completed"),
]
RAW_ORDERS_COLS = ["order_id", "user_id", "amount", "order_date", "status"]


def raw_users(spark: SparkSession) -> DataFrame:
    """S1 inline literal relation (stg_users.sql:14-24)."""
    return spark.createDataFrame(RAW_USERS, RAW_USERS_COLS)


def raw_orders(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(RAW_ORDERS, RAW_ORDERS_COLS)
    return df.withColumn("amount", F.col("amount").cast("decimal(10,2)"))


# --------------------------------------------------------------------------
# stg_users  <- dbt/analytics/models/staging/stg_users.sql:27-44
# TRIM/LOWER (F1,F2), SPLIT[i] (F3), CASE age bucket (P6),
# current_timestamp (F6)
# --------------------------------------------------------------------------
def stg_users(spark: SparkSession, ctx) -> DataFrame:
    src = ctx.source("raw_users")
    name_parts = F.split(F.trim("full_name"), " ")
    return src.select(
        "user_id",
        F.trim("full_name").alias("full_name"),
        F.lower(F.trim("email")).alias("email"),
        name_parts.getItem(0).alias("first_name"),
        name_parts.getItem(1).alias("last_name"),
        "age",
        F.trim("department").alias("department"),
        F.when(F.col("age") < 28, "young")
        .when(F.col("age") < 33, "mid")
        .otherwise("senior")
        .alias("age_group"),
        fixed_clock().alias("created_at"),
    )


# --------------------------------------------------------------------------
# stg_orders <- dbt/analytics/models/staging/stg_orders.sql:33-50
# UPPER(TRIM) (F1,F2), CAST AS DATE (F4), YEAR/MONTH/DAYOFWEEK (F5),
# CASE amount tier (P6)
# --------------------------------------------------------------------------
def stg_orders(spark: SparkSession, ctx) -> DataFrame:
    src = ctx.source("raw_orders")
    od = F.to_date("order_date")
    return src.select(
        "order_id",
        "user_id",
        dec("amount").alias("amount"),
        od.alias("order_date"),
        F.upper(F.trim("status")).alias("status"),
        F.year(od).alias("order_year"),
        F.month(od).alias("order_month"),
        F.dayofweek(od).alias("order_dow"),
        F.when(F.col("amount") >= 300, "large")
        .when(F.col("amount") >= 150, "medium")
        .otherwise("small")
        .alias("amount_tier"),
        fixed_clock().alias("created_at"),
    )


# --------------------------------------------------------------------------
# user_order_summary <- dbt/analytics/models/marts/user_order_summary.sql
# LEFT JOIN (J1), COALESCE'd conditional aggs (A2-A7), tier CASE (P6),
# ROW_NUMBER global + per-department, PERCENT_RANK (W1-W3), ORDER BY (O1)
# --------------------------------------------------------------------------
def user_order_summary(spark: SparkSession, ctx) -> DataFrame:
    users = ctx.ref("stg_users")
    orders = ctx.ref("stg_orders")
    completed = F.col("status") == "COMPLETED"
    base = (
        users.join(orders, "user_id", "left")
        .groupBy("user_id", "full_name", "email", "department", "age_group")
        .agg(
            F.coalesce(F.count("order_id"), F.lit(0)).alias("total_orders"),
            F.coalesce(F.count(F.when(completed, 1)), F.lit(0)).alias(
                "completed_orders"
            ),
            F.coalesce(F.sum(F.when(completed, F.col("amount"))), F.lit(0))
            .cast("decimal(18,2)")
            .alias("total_spent"),
            F.min(F.when(completed, F.col("order_date"))).alias("first_order_date"),
            F.max(F.when(completed, F.col("order_date"))).alias("last_order_date"),
        )
    )
    enriched = base.withColumn(
        "avg_order_value",
        (F.col("total_spent") / F.nullif(F.col("completed_orders"), F.lit(0)))
        .cast("decimal(18,2)"),
    ).withColumn(
        "customer_tier",
        F.when(F.col("total_spent") >= 300, "VIP")
        .when(F.col("total_spent") >= 150, "REGULAR")
        .when(F.col("total_spent") > 0, "OCCASIONAL")
        .otherwise("INACTIVE"),
    )
    w_rev = Window.orderBy(F.col("total_spent").desc(), F.col("user_id"))
    w_dept = Window.partitionBy("department").orderBy(
        F.col("total_spent").desc(), F.col("user_id")
    )
    w_pct = Window.orderBy("total_spent")
    return (
        enriched.withColumn("revenue_rank", F.row_number().over(w_rev))
        .withColumn("department_rank", F.row_number().over(w_dept))
        .withColumn("spending_percentile", F.percent_rank().over(w_pct))
        .withColumn("processed_at", fixed_clock())
        .orderBy("revenue_rank")
    )


# --------------------------------------------------------------------------
# daily_order_metrics <- dbt/analytics/models/marts/daily_order_metrics.sql
# incremental merge on metric_date (S6), conditional aggs, COUNT DISTINCT,
# NULLIF-guarded rates (F8), ORDER BY DESC (O2)
# --------------------------------------------------------------------------
def daily_order_metrics(spark: SparkSession, ctx) -> DataFrame:
    orders = ctx.ref("stg_orders")
    if ctx.is_incremental("daily_order_metrics"):
        # P4/P5: only rebuild days >= the current max (late orders for
        # the max day are re-merged on the unique key)
        from konohadataplatform_spark.catalog import incremental_cutoff

        cutoff = incremental_cutoff(ctx.ref("daily_order_metrics"), "metric_date")
        if cutoff is not None:
            orders = orders.filter(F.col("order_date") >= F.lit(cutoff))
    st = F.col("status")
    return (
        orders.groupBy(F.col("order_date").alias("metric_date"))
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.count(F.when(st == "COMPLETED", 1)).alias("completed_orders"),
            F.count(F.when(st == "PENDING", 1)).alias("pending_orders"),
            F.count(F.when(st == "CANCELLED", 1)).alias("cancelled_orders"),
            F.countDistinct("user_id").alias("unique_users"),
            F.coalesce(F.sum(F.when(st == "COMPLETED", F.col("amount"))), F.lit(0))
            .cast("decimal(18,2)")
            .alias("completed_revenue"),
            F.round(
                F.lit(100.0)
                * F.count(F.when(st == "COMPLETED", 1))
                / F.nullif(F.count(F.lit(1)), F.lit(0)),
                1,
            ).alias("completion_rate_pct"),
        )
        .withColumn("updated_at", fixed_clock())
        .orderBy(F.col("metric_date").desc())
    )


# --------------------------------------------------------------------------
# simple_pipeline <- dbt/analytics/models/simple_pipeline.sql
# the staging+mart combined demo model (same fixtures, one output)
# --------------------------------------------------------------------------
def simple_pipeline(spark: SparkSession, ctx) -> DataFrame:
    users = stg_users(spark, ctx)
    orders = stg_orders(spark, ctx)
    completed = F.col("status") == "COMPLETED"
    joined = (
        users.join(orders, "user_id", "left")
        .groupBy("user_id", "full_name", "department")
        .agg(
            F.coalesce(F.count("order_id"), F.lit(0)).alias("order_count"),
            F.coalesce(F.sum(F.when(completed, F.col("amount"))), F.lit(0))
            .cast("decimal(18,2)")
            .alias("revenue"),
            F.min(F.when(completed, F.col("order_date"))).alias("first_order"),
            F.max(F.when(completed, F.col("order_date"))).alias("last_order"),
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("user_id"))
    w_dept = Window.partitionBy("department").orderBy(
        F.col("revenue").desc(), F.col("user_id")
    )
    return (
        joined.withColumn("revenue_rank", F.row_number().over(w))
        .withColumn("dept_rank", F.row_number().over(w_dept))
        .withColumn("revenue_pct", F.percent_rank().over(Window.orderBy("revenue")))
        .withColumn(
            "spend_bucket",
            F.when(F.col("revenue") >= 300, "high")
            .when(F.col("revenue") >= 100, "mid")
            .otherwise("low"),
        )
        .withColumn("processed_at", fixed_clock())
        .orderBy("revenue_rank")
    )


def register_reference_models(pipeline) -> None:
    """Wire the five ported models into a Pipeline (the dbt DAG:
    seed -> staging -> marts, dag/dbt_analytics_pipeline.py:48-118)."""
    from konohadataplatform_spark.plans.pipeline import ModelSpec

    pipeline.add_source("raw_users", raw_users(pipeline.spark))
    pipeline.add_source("raw_orders", raw_orders(pipeline.spark))
    pipeline.model(ModelSpec("stg_users", stg_users, tags=["staging"]))
    pipeline.model(ModelSpec("stg_orders", stg_orders, tags=["staging"]))
    pipeline.model(
        ModelSpec(
            "user_order_summary",
            user_order_summary,
            depends_on=["stg_users", "stg_orders"],
            tags=["marts"],
        )
    )
    pipeline.model(
        ModelSpec(
            "daily_order_metrics",
            daily_order_metrics,
            materialization="incremental",
            unique_key=["metric_date"],
            depends_on=["stg_orders"],
            tags=["marts"],
        )
    )
    pipeline.model(
        ModelSpec(
            "simple_pipeline",
            simple_pipeline,
            tags=["demo"],
        )
    )

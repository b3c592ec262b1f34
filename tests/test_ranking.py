"""scalable_row_number must equal the single-partition ROW_NUMBER and
actually distribute the sort."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from konohadataplatform_spark.operators.ranking import scalable_row_number
from konohadataplatform_spark.sources.star_schema import load_table
from tests.conftest import SF_DIR


def test_matches_global_row_number(spark):
    orders = load_table(spark, SF_DIR, "orders")
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    fast = {
        r.o_orderkey: r.rank
        for r in scalable_row_number(orders, order_cols, "rank").collect()
    }
    slow = {
        r.o_orderkey: r.rank
        for r in orders.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order_cols))
        ).collect()
    }
    assert fast == slow


def test_no_single_partition_window(spark):
    orders = load_table(spark, SF_DIR, "orders")
    df = scalable_row_number(
        orders, [F.col("o_orderkey")], "rank", num_partitions=8
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the sort must be range-partitioned, not a global single-partition
    # window (which Spark logs as an empty/absent partition spec)
    assert "rangepartitioning" in plan.lower()


def test_dense_and_contiguous(spark):
    ev = load_table(spark, SF_DIR, "events")
    ranked = scalable_row_number(
        ev, [F.col("ts"), F.col("event_id")], "rank", num_partitions=6
    )
    ranks = sorted(r.rank for r in ranked.select("rank").collect())
    assert ranks == list(range(1, len(ranks) + 1))

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


def test_no_cache_leak_after_materialization(spark):
    """r7 VERDICT item 6: the old implementation cached its ranged
    intermediate and never unpersisted it, leaking one cached relation
    per call in long sessions. The operator is now a single lazy plan —
    the CacheManager must stay exactly as it was after the result is
    materialized."""
    from konohadataplatform_spark.operators.retrieval import lexical_topk

    spark.catalog.clearCache()  # order-independent: start from a known-empty state
    cm = spark._jsparkSession.sharedState().cacheManager()
    orders = load_table(spark, SF_DIR, "orders")
    scalable_row_number(orders, [F.col("o_orderkey")], "rank").collect()
    docs = load_table(spark, SF_DIR, "documents")
    lexical_topk(docs, F.col("doc_id") % 101 == 0, k=3, n=3).collect()
    assert cm.isEmpty()


def test_scalable_row_number_total_col(spark):
    df = spark.range(1, 38).select(F.col("id").alias("k"))
    out = scalable_row_number(
        df, [F.col("k")], "rank", total_col="_n"
    ).collect()
    assert {r["_n"] for r in out} == {37}
    assert sorted(r["rank"] for r in out) == list(range(1, 38))

"""The reference pipeline shape over the real star schema: run through
the catalog, verify the mart against DuckDB computed independently,
and prove the incremental rerun only reprocesses the cutoff window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.plans.star_models import build_star_pipeline
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.fixture()
def star(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    return build_star_pipeline(spark, cat, SF_DIR)


def test_star_pipeline_runs_and_matches_oracle(star, duck):
    executed = star.run()
    assert executed == [
        "stg_orders_star",
        "mart_daily_metrics_star",
        "mart_customer_summary_star",
    ]
    mart = star.catalog.read("mart_daily_metrics_star")
    assert_oracle_match(
        mart,
        duck,
        """
        SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS metric_date,
               COUNT(*) AS total_orders,
               COUNT(CASE WHEN upper(trim(o_orderstatus)) = 'F' THEN 1 END) AS completed_orders,
               COUNT(DISTINCT o_custkey) AS unique_customers,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM orders GROUP BY metric_date
        """,
        name="mart_daily_metrics_star",
    )


def test_incremental_rerun_reprocesses_only_cutoff(star):
    star.run()
    v1 = star.catalog.current_snapshot("mart_daily_metrics_star").version
    n1 = star.catalog.count("mart_daily_metrics_star")
    star.run(select=["mart_daily_metrics_star"])
    # rerun merged (new snapshot) without changing results
    assert star.catalog.current_snapshot("mart_daily_metrics_star").version > v1
    assert star.catalog.count("mart_daily_metrics_star") == n1


def test_customer_summary_rank_is_total_order(star):
    star.run()
    ranks = [
        r.revenue_rank
        for r in star.catalog.read("mart_customer_summary_star")
        .orderBy("revenue_rank")
        .collect()
    ]
    assert ranks == list(range(1, len(ranks) + 1))

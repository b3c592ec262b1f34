"""Golden tests for the five ported reference models over the inline
fixtures (FIXTURES.md §1), plus pipeline runner behavior (topo order,
tag selection, incremental rerun idempotency, full refresh).

Expected values are independently computed with DuckDB SQL over the
same literal rows (the reference's own fixture data), mirroring the
driver's oracle strategy.
"""

from __future__ import annotations

import pytest

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.plans.models import register_reference_models
from konohadataplatform_spark.plans.pipeline import Pipeline
from tests.conftest import assert_oracle_match

FIXTURE_SQL = """
CREATE OR REPLACE VIEW raw_users AS
SELECT * FROM (VALUES
  (1,'Alice Johnson','alice@example.com',25,'Engineering'),
  (2,'Bob Smith','bob@example.com',30,'Marketing'),
  (3,'Charlie Brown','charlie@example.com',35,'Sales'),
  (4,'Diana Prince','diana@example.com',28,'Engineering'),
  (5,'Eve Wilson','eve@example.com',32,'Marketing'))
  AS t(user_id, full_name, email, age, department);
CREATE OR REPLACE VIEW raw_orders AS
SELECT order_id, user_id, CAST(amount AS DECIMAL(10,2)) AS amount, order_date, status
FROM (VALUES
  (1,1,'100.50','2024-01-15','completed'), (2,2,'250.75','2024-01-16','completed'),
  (3,1,'75.25','2024-01-17','pending'),    (4,3,'400.00','2024-01-18','completed'),
  (5,4,'150.30','2024-01-19','completed'), (6,2,'320.80','2024-01-20','cancelled'),
  (7,5,'89.99','2024-01-21','completed'),  (8,1,'199.95','2024-01-22','completed'))
  AS t(order_id, user_id, amount, order_date, status);
"""


@pytest.fixture()
def pipeline(spark, tmp_path):
    p = Pipeline(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    register_reference_models(p)
    return p


@pytest.fixture()
def golden(duck):
    for stmt in FIXTURE_SQL.strip().split(";"):
        if stmt.strip():
            duck.execute(stmt)
    return duck


def test_run_all_topo_order(pipeline):
    executed = pipeline.run()
    assert executed.index("stg_users") < executed.index("user_order_summary")
    assert executed.index("stg_orders") < executed.index("daily_order_metrics")
    assert set(executed) == {
        "stg_users",
        "stg_orders",
        "user_order_summary",
        "daily_order_metrics",
        "simple_pipeline",
    }


def test_stg_users_golden(pipeline, golden):
    pipeline.run(select=["stg_users"])
    df = pipeline.catalog.read("stg_users")
    assert_oracle_match(
        df,
        golden,
        """
        SELECT user_id, trim(full_name) AS full_name,
               lower(trim(email)) AS email,
               string_split(trim(full_name),' ')[1] AS first_name,
               string_split(trim(full_name),' ')[2] AS last_name,
               age, trim(department) AS department,
               CASE WHEN age < 28 THEN 'young' WHEN age < 33 THEN 'mid'
                    ELSE 'senior' END AS age_group,
               TIMESTAMP '2024-01-01 00:00:00' AS created_at
        FROM raw_users
        """,
        name="stg_users",
    )


def test_stg_orders_golden(pipeline, golden):
    pipeline.run(select=["stg_orders"])
    df = pipeline.catalog.read("stg_orders")
    assert_oracle_match(
        df,
        golden,
        """
        SELECT order_id, user_id, amount,
               CAST(order_date AS DATE) AS order_date,
               upper(trim(status)) AS status,
               YEAR(CAST(order_date AS DATE)) AS order_year,
               MONTH(CAST(order_date AS DATE)) AS order_month,
               CAST(date_part('dow', CAST(order_date AS DATE)) + 1 AS BIGINT) AS order_dow,
               CASE WHEN amount >= 300 THEN 'large'
                    WHEN amount >= 150 THEN 'medium'
                    ELSE 'small' END AS amount_tier,
               TIMESTAMP '2024-01-01 00:00:00' AS created_at
        FROM raw_orders
        """,
        name="stg_orders",
    )


def test_user_order_summary_golden(pipeline, golden):
    pipeline.run(select=["user_order_summary"])
    df = pipeline.catalog.read("user_order_summary")
    assert_oracle_match(
        df,
        golden,
        """
        WITH su AS (
          SELECT user_id, trim(full_name) AS full_name,
                 lower(trim(email)) AS email, trim(department) AS department,
                 CASE WHEN age < 28 THEN 'young' WHEN age < 33 THEN 'mid'
                      ELSE 'senior' END AS age_group
          FROM raw_users
        ), so AS (
          SELECT order_id, user_id, amount,
                 CAST(order_date AS DATE) AS order_date,
                 upper(trim(status)) AS status
          FROM raw_orders
        ), base AS (
          SELECT su.user_id, su.full_name, su.email, su.department, su.age_group,
                 COALESCE(COUNT(so.order_id), 0) AS total_orders,
                 COALESCE(COUNT(CASE WHEN so.status='COMPLETED' THEN 1 END), 0) AS completed_orders,
                 CAST(COALESCE(SUM(CASE WHEN so.status='COMPLETED' THEN so.amount END), 0) AS DECIMAL(18,2)) AS total_spent,
                 MIN(CASE WHEN so.status='COMPLETED' THEN so.order_date END) AS first_order_date,
                 MAX(CASE WHEN so.status='COMPLETED' THEN so.order_date END) AS last_order_date
          FROM su LEFT JOIN so ON su.user_id = so.user_id
          GROUP BY ALL
        )
        SELECT *,
               CAST(total_spent / NULLIF(completed_orders, 0) AS DECIMAL(18,2)) AS avg_order_value,
               CASE WHEN total_spent >= 300 THEN 'VIP'
                    WHEN total_spent >= 150 THEN 'REGULAR'
                    WHEN total_spent > 0 THEN 'OCCASIONAL'
                    ELSE 'INACTIVE' END AS customer_tier,
               ROW_NUMBER() OVER (ORDER BY total_spent DESC, user_id) AS revenue_rank,
               ROW_NUMBER() OVER (PARTITION BY department ORDER BY total_spent DESC, user_id) AS department_rank,
               PERCENT_RANK() OVER (ORDER BY total_spent) AS spending_percentile,
               TIMESTAMP '2024-01-01 00:00:00' AS processed_at
        FROM base
        """,
        name="user_order_summary",
    )


def test_daily_order_metrics_golden(pipeline, golden):
    pipeline.run(select=["daily_order_metrics"])
    df = pipeline.catalog.read("daily_order_metrics")
    assert_oracle_match(
        df,
        golden,
        """
        WITH so AS (
          SELECT order_id, user_id, amount, CAST(order_date AS DATE) AS order_date,
                 upper(trim(status)) AS status
          FROM raw_orders
        )
        SELECT order_date AS metric_date,
               COUNT(*) AS total_orders,
               COUNT(CASE WHEN status='COMPLETED' THEN 1 END) AS completed_orders,
               COUNT(CASE WHEN status='PENDING' THEN 1 END) AS pending_orders,
               COUNT(CASE WHEN status='CANCELLED' THEN 1 END) AS cancelled_orders,
               COUNT(DISTINCT user_id) AS unique_users,
               CAST(COALESCE(SUM(CASE WHEN status='COMPLETED' THEN amount END), 0) AS DECIMAL(18,2)) AS completed_revenue,
               ROUND(CAST(100.0 AS DOUBLE) * COUNT(CASE WHEN status='COMPLETED' THEN 1 END)
                     / NULLIF(COUNT(*), 0), 1) AS completion_rate_pct,
               TIMESTAMP '2024-01-01 00:00:00' AS updated_at
        FROM so GROUP BY order_date
        """,
        name="daily_order_metrics",
    )


def test_incremental_rerun_is_idempotent(pipeline):
    pipeline.run(select=["daily_order_metrics"])
    v1 = {
        (r.metric_date, r.total_orders, str(r.completed_revenue))
        for r in pipeline.catalog.read("daily_order_metrics").collect()
    }
    pipeline.run(select=["daily_order_metrics"])  # merge path this time
    v2 = {
        (r.metric_date, r.total_orders, str(r.completed_revenue))
        for r in pipeline.catalog.read("daily_order_metrics").collect()
    }
    assert v1 == v2
    assert pipeline.catalog.current_snapshot("daily_order_metrics").version >= 2


def test_full_refresh(pipeline):
    pipeline.run(select=["daily_order_metrics"])
    pipeline.run(select=["daily_order_metrics"], full_refresh=True)
    hist = pipeline.catalog.history("daily_order_metrics")
    assert hist[-1].operation == "overwrite"


def test_tag_selection(pipeline):
    executed = pipeline.run(tag="staging")
    assert set(executed) == {"stg_users", "stg_orders"}


def test_simple_pipeline_rank_order(pipeline):
    pipeline.run(select=["simple_pipeline"])
    rows = pipeline.catalog.read("simple_pipeline").orderBy("revenue_rank").collect()
    # Alice: 100.50+199.95=300.45 completed; Charlie: 400.00
    assert rows[0].full_name == "Charlie Brown"
    assert str(rows[0].revenue) == "400.00"
    assert rows[1].full_name == "Alice Johnson"
    assert str(rows[1].revenue) == "300.45"
    assert rows[0].spend_bucket == "high"

"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`konohadataplatform_spark.queries` — one entry per
implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
operators), each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from konohadataplatform_spark.queries import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the end-to-end curation pipeline (quality gate ->
    exact dedup -> shard-safe sequence packing in one Catalyst plan) —
    the operator composition this engine exists for at 100 TB."""
    qs = all_queries()
    flagship = qs.get("q_curation_pipeline", qs["q1_pricing_summary"])
    return flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()

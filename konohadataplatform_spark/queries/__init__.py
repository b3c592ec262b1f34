"""Query registry: every SURVEY §2 operator re-expressed Spark-first.

Each submodule exposes ``QUERIES`` (name -> fn(spark, sf_dir) -> DataFrame)
and ``ORACLE`` (name -> equivalent DuckDB SQL). Names without an ORACLE
entry are genuinely non-SQL-expressible (driver records rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from konohadataplatform_spark.queries import analytics, events, llmdata, tpch


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (tpch, analytics, events, llmdata):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (tpch, analytics, events, llmdata):
        out.update(mod.ORACLE)
    return out

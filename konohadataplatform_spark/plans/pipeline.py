"""Model registry + topo-ordered runner — the dbt DAG / Airflow analog.

The reference orchestrates dbt models through Airflow's
``DbtSparkOperator`` (``dag/operators/dbt_spark_operator.py:82-408``,
pipeline ``dag/dbt_analytics_pipeline.py:48-118``): seed -> staging ->
marts, with per-model materialization (``materialized='table'`` or
``'incremental', incremental_strategy='merge'``), tag selection
(dbt ``--select tag:``) and full-refresh. This runner reproduces that
control plane in-process:

- models are Python callables (spark, ctx) -> DataFrame;
- ``ctx.ref(name)`` reads an upstream model from the catalog (dbt's
  ``{{ ref() }}``), ``ctx.source(name)`` reads a registered source;
- materializations commit through :class:`SnapshotCatalog` — `table`
  = CTAS overwrite (S5), `incremental` = merge-by-unique-key (S6);
- dependency order is a topological sort of declared ``depends_on``.

No Kubernetes pods, no Thrift hop: boundaries collapse into one
SparkSession (SURVEY §3.1 "our equivalent").
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from konohadataplatform_spark.catalog import SnapshotCatalog


@dataclass
class ModelSpec:
    name: str
    fn: Callable  # (spark, ctx) -> DataFrame
    materialization: str = "table"  # table | incremental | view
    unique_key: list[str] | None = None
    depends_on: list[str] = field(default_factory=list)
    tags: list[str] = field(default_factory=list)
    partition_by: list[str] | None = None


class RunContext:
    def __init__(self, pipeline: "Pipeline"):
        self._p = pipeline

    def ref(self, name: str) -> DataFrame:
        return self._p.catalog.read(name)

    def source(self, name: str) -> DataFrame:
        if name not in self._p.sources:
            raise KeyError(f"unknown source: {name}")
        return self._p.sources[name]

    def is_incremental(self, name: str) -> bool:
        return self._p.catalog.exists(name)


class Pipeline:
    def __init__(self, spark: SparkSession, catalog: SnapshotCatalog):
        self.spark = spark
        self.catalog = catalog
        self.models: dict[str, ModelSpec] = {}
        self.sources: dict[str, DataFrame] = {}

    # ---- registration (dbt project / S7 seed analog) --------------------
    def add_source(self, name: str, df: DataFrame) -> None:
        self.sources[name] = df

    def seed_csv(self, name: str, path: str) -> None:
        """S7: dbt seed — CSV load into the catalog."""
        df = self.spark.read.csv(path, header=True, inferSchema=True)
        self.catalog.write(name, df)

    def model(self, spec: ModelSpec) -> None:
        self.models[spec.name] = spec

    # ---- execution ------------------------------------------------------
    def _topo_order(self, wanted: list[str]) -> list[str]:
        order: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(n: str) -> None:
            if n in seen:
                return
            if n in visiting:
                raise ValueError(f"dependency cycle at {n}")
            visiting.add(n)
            for dep in self.models[n].depends_on:
                if dep in self.models:
                    visit(dep)
            visiting.discard(n)
            seen.add(n)
            order.append(n)

        for n in wanted:
            visit(n)
        return order

    def run(
        self,
        select: list[str] | None = None,
        tag: str | None = None,
        full_refresh: bool = False,
    ) -> list[str]:
        """Run models in dependency order; returns the executed names.

        ``tag`` mirrors dbt `--select tag:x`; ``full_refresh`` rebuilds
        incremental models from scratch (dbt --full-refresh).
        """
        wanted = list(select or self.models)
        if tag is not None:
            wanted = [n for n in wanted if tag in self.models[n].tags]
            # pull in upstream deps even if untagged
        executed = []
        ctx = RunContext(self)
        for name in self._topo_order(wanted):
            spec = self.models[name]
            df = spec.fn(self.spark, ctx)
            if spec.materialization == "incremental" and not full_refresh:
                if spec.unique_key is None:
                    raise ValueError(f"{name}: incremental needs unique_key")
                self.catalog.merge(name, df, spec.unique_key, spec.partition_by)
            else:
                self.catalog.write(name, df, partition_by=spec.partition_by)
            executed.append(name)
        return executed

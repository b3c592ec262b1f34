"""konohadataplatform_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference lakehouse platform (``anhhoangdev/KonohaDataPlatform``),
re-expressed Spark-first:

- The reference's Kyuubi/Thrift SQL surface  -> :class:`Engine.sql`
  (an in-process SparkSession; see reference
  ``docs/components/kyuubi.md:61-67``).
- The reference's dbt model DAG              -> :mod:`plans.pipeline`
  model registry (reference ``dbt/analytics/models/**``).
- The reference's Debezium->Kafka->Iceberg CDC path
  -> :mod:`streaming.cdc` (reference
  ``infrastructure/apps/kafka/connectors/*.json``).
- Iceberg table maintenance / time travel    -> :mod:`catalog` snapshot
  layer + :mod:`operators.maintenance` (reference
  ``docs/architecture/lakehouse.md``).
- Beyond-reference LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) live in :mod:`operators`.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, AQE, and whole-stage codegen.
"""

from konohadataplatform_spark.session import get_spark, stop_spark
from konohadataplatform_spark.engine import Engine

__all__ = ["get_spark", "stop_spark", "Engine"]
__version__ = "0.1.0"

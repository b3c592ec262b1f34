"""SparkSession factory.

Mirrors the engine configuration the reference ships via Kyuubi session
defaults (``infrastructure/apps/kyuubi/base/kyuubi-dbt-defaults-configmap.yaml``):
AQE enabled (line 29), tuned shuffle parallelism
(``docs/architecture/compute.md:50`` — "cores x 4"), but *enables* Arrow
for Python interop (the reference disabled it for env stability only,
configmap line 63 — idiomatic PySpark wants it on).

Scale notes (100 TB design): everything here is per-session conf that
holds on a 1000-executor cluster — AQE coalesces shuffle partitions and
rewrites skew joins at runtime; we set `spark.sql.shuffle.partitions`
high-ish and let AQE coalesce down, which is the recommended posture for
large clusters. ANSI mode is disabled for permissive NULL-on-error
semantics matching the reference's Spark 3.5 defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "konohadataplatform-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults follow the reference's engine posture: AQE on, adaptive
    skew-join on, broadcast threshold on, Arrow on for pandas UDFs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Catalyst/AQE posture (reference enables AQE per session:
        # kyuubi-dbt-defaults-configmap.yaml:29)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow ON (idiomatic; reference disabled only for env stability)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Permissive (Spark 3.x style) semantics: NULL on bad cast /
        # div-by-zero instead of runtime error; matches the reference's
        # Spark 3.5.0 engine defaults and the DuckDB oracle's behavior
        # under our NULLIF-guarded SQL.
        .config("spark.sql.ansi.enabled", "false")
        # Deterministic timestamps across engines.
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scan posture: pushdown + vectorized reader are default
        # on; keep split size default (128MB) — right for 100 TB scans.
        .config("spark.sql.parquet.filterPushdown", "true")
        # The driver's events table carries TIMESTAMP(NANOS); read as
        # long and convert in sources.star_schema.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

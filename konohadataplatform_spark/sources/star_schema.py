"""Test-data star schema loader.

The driver materializes a deterministic TPC-H-ish star schema plus
``events``/``documents``/``embeddings`` tables (see /root/repo/TESTDATA.md).
This loader registers them as temp views so the whole §2 operator surface
(reference exposes arbitrary SQL through Kyuubi,
``docs/components/kyuubi.md:61-67``) runs against them via ``spark.sql``.

Scale note: views are plain parquet scans — Catalyst pushes filters and
prunes columns into the scan, so a 100 TB `lineitem` behind the same view
only reads the columns/row-groups a query touches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table, normalizing physical-type quirks.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (rejected by
    Spark's vectorized reader) and as un-adjusted ``timestamp[us]`` (read
    as TIMESTAMP_NTZ, which ``unix_micros``/``withWatermark`` reject).
    Normalize both to a plain session-TZ TIMESTAMP; the session TZ is
    pinned UTC everywhere, so values match what DuckDB reads.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts arrives as raw nanos-since-epoch under this legacy conf
        # (runtime-settable, so this works under any caller's session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dtype = df.schema["ts"].dataType.simpleString()
        if dtype == "bigint":
            # Integer `div`, not `/`: nanos-since-epoch exceeds double's
            # 53-bit mantissa, so float division drifts by ±1 us.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            # NTZ micros reinterpreted as UTC instants — a no-op on the
            # stored values under the pinned-UTC session.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every parquet table under ``sf_dir`` as a DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view named after the table."""
    dfs = load_star_schema(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

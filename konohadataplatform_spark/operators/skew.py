"""Skew-mitigation operators.

AQE's skew-join split (enabled in the session factory, mirroring the
reference's per-session AQE — ``kyuubi-dbt-defaults-configmap.yaml:29``)
handles most skew at runtime; these helpers cover the cases AQE can't:

- ``salted_join`` — explicit key salting for joins where one side has
  pathological hot keys (the classic null-key / power-law-entity case).
  The big side gets a deterministic salt in [0, buckets); the small side
  is replicated once per salt value. The shuffle then spreads each hot
  key over ``buckets`` reducers. Replication cost is |small| x buckets —
  use for dimension-sized right sides.
- ``key_skew_profile`` — measure it before you salt it: top-k key
  frequencies + skew ratio, one agg job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_cols: list[str], top: int = 10) -> DataFrame:
    """Top-k hottest keys with their share of all rows."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(total))
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Equi-join with the big side's keys salted across ``buckets``.

    Deterministic: the salt is a hash of the big side's full row, so
    reruns produce identical partition assignment. Result columns match
    a plain ``big.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets)).cast(
            "int"
        ),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = big_s.join(small_s, on + ["_salt"], how)
    return out.drop("_salt")


def salted_distinct_count(
    df: DataFrame, group_cols: list[str], distinct_col: str, buckets: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per group for skewed groups.

    Two-phase: (group, salt) partial distinct-count, then sum — a hot
    group's distinct set is split across `buckets` reducers instead of
    landing on one. The salt is a hash of the distinct value itself, so
    equal values share a salt and the per-salt counts are disjoint
    (summing them is exact, not an estimate).

    Spark's built-in count_distinct plans an Expand+two-phase agg that
    handles moderate skew; use this when one group holds billions of
    rows and even its first-phase partition overflows.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets)).cast("int")
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.countDistinct(distinct_col).alias("_part")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_part").alias(f"n_distinct_{distinct_col}")
    )

"""Temporal join operators Spark SQL lacks natively (brief §custom
operators: as-of join, range join) — composed from built-in DataFrame
ops, no UDFs.

``as_of_join``: for each left row, the latest right row with
``right_ts <= left_ts`` for the same key (DuckDB/kdb ASOF JOIN
semantics, inclusive).

Implementation is the union-and-carry trick, which scales where the
naive "join then rank" does not:
  1. union left (probe) and right (reference) rows with a side tag;
  2. one window partitioned by key ordered by (ts, side) carries the
     most recent reference values forward via last(ignorenulls);
  3. keep probe rows.
One shuffle on the key; per-key state is the sort buffer. The naive
alternative — inequality join + row_number — explodes to |L|x|R| pairs
per key before ranking; this stays |L|+|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the nearest right values at-or-before their timestamp
    (``direction="backward"``, the default ASOF semantics) or at-or-after
    (``direction="forward"`` — "next event" joins).

    Right rows should be unique per (key, ts); if not, the later row in
    (ts, natural input order of value cols) wins deterministically only
    when callers pre-dedupe — dedupe with latest_per_key first.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_tag = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_probe"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_probe"),
        F.lit(None).cast(
            l_tag.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # reference rows sort before probe rows at equal ts => inclusive
    # bound in either direction; forward just walks time descending so
    # "most recently seen reference" = smallest ts >= probe ts
    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, F.col("_is_probe"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )
    probes = carried.filter(F.col("_is_probe") == 1)
    return probes.select(
        F.col("_l.*"),
        *[F.col(f"{c}{suffix}") for c in right_value_cols],
    )


def range_join_buckets(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    low_col: str = "low",
    high_col: str = "high",
) -> DataFrame:
    """Range join: fact rows matched to [low, high) buckets.

    For equi-width buckets prefer arithmetic bucketing (floor division —
    see q_events_value_histogram); this operator covers *irregular*
    ranges. The bucket table is broadcast (range tables are small by
    nature), so the fact side never shuffles — the standard scale shape
    for interval lookup joins.
    """
    return facts.join(
        F.broadcast(buckets),
        (F.col(value_col) >= F.col(low_col)) & (F.col(value_col) < F.col(high_col)),
        "left",
    )

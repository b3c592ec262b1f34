"""Scalable global ranking — the two-phase pattern for fact-scale ranks.

A plain `ROW_NUMBER() OVER (ORDER BY ...)` (W1/W3 in the reference's
marts) forces every row through ONE partition — fine at mart size,
fatal at fact scale. `scalable_row_number` produces identical output
with bounded parallelism:

1. `repartitionByRange` on the order key — rows land in globally
   ordered partitions (Spark samples ranges; skew spreads by added
   tiebreak columns);
2. per-partition `row_number` over a partition-local window;
3. per-partition counts (tiny: one row per partition) are prefix-summed
   by a single-partition window over that METADATA-sized relation and
   broadcast-joined back as offsets.

Everything is ONE lazy plan — no cache() (which leaked a cached
relation per call in long sessions, r7 VERDICT item 6), no collect(),
no driver state. The ranged subtree feeds both the ranking branch and
the counts branch; Spark's ReusedExchange deduplicates the range
shuffle, and `repartitionByRange`'s sampling is seeded
deterministically, so both branches see identical `_pid` assignments
even if the exchange were recomputed.

Shuffle: one range exchange of the data (spread over N partitions
instead of 1) plus a #partitions-row aggregate shuffle. Driver
state: none.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scalable_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
    stabilize_source: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """Global row_number over `order_cols` without a single-partition
    sort. `order_cols` must define a total order (add a unique tiebreak
    column) for deterministic output.

    ``total_col``: when set, every output row also carries the TOTAL
    row count under that name, computed from the same per-partition
    counts relation that produces the offsets — callers needing
    rank-relative-to-N arithmetic (calibration tiles, percentile
    cuts) get N without a second scan of the source, and the total is
    tied by construction to the exact relation that produced the
    ranks (an independent count() of a non-deterministic source could
    disagree).

    The ranking and counts branches must observe identical `_pid`
    assignments; ReusedExchange plus repartitionByRange's seeded
    sampling guarantees that for deterministic inputs. If `df` is
    non-deterministic (rand(), unordered limits, re-sampled reads),
    pass ``stabilize_source=True`` to localCheckpoint the ranged
    relation — both branches then read one materialized copy instead
    of recomputing the upstream.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    if stabilize_source:
        ranged = ranged.localCheckpoint(eager=False)
    local_w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_local_rn", F.row_number().over(local_w))

    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # single-partition window is safe here: the relation is one row per
    # range partition (metadata-sized), not the data
    off_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_c").over(off_w), F.lit(0)).alias("_off"),
    ]
    if total_col is not None:
        tot_w = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_c").over(tot_w).alias(total_col))
    offsets = counts.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local_rn") + F.col("_off")).cast("int"))
        .drop("_pid", "_local_rn", "_off")
    )

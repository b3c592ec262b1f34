"""Scalable global ranking — the two-phase pattern for fact-scale ranks.

A plain `ROW_NUMBER() OVER (ORDER BY ...)` (W1/W3 in the reference's
marts) forces every row through ONE partition — fine at mart size,
fatal at fact scale. `scalable_row_number` produces identical output
with bounded parallelism:

1. `repartitionByRange` on the order key — rows land in globally
   ordered partitions (Spark samples ranges; skew spreads by added
   tiebreak columns);
2. per-partition `row_number` over a partition-local window;
3. per-partition counts (tiny: one row per partition) are collected,
   prefix-summed on the driver, and added back as offsets via a
   broadcast map.

Shuffle: one range exchange (same volume as the naive plan's single
exchange, but spread over N partitions instead of 1). Driver state:
#partitions integers.
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
) -> DataFrame:
    """Global row_number over `order_cols` without a single-partition
    sort. `order_cols` must define a total order (add a unique tiebreak
    column) for deterministic output.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_local_rn", F.row_number().over(local_w)).cache()

    counts = {
        r._pid: r.c
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    offset_col = F.element_at(
        F.create_map(
            *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
        ),
        F.col("_pid"),
    )
    return (
        local.withColumn(out_col, (F.col("_local_rn") + offset_col).cast("int"))
        .drop("_pid", "_local_rn")
    )

"""Corpus-curation operators: per-group document caps and
group-proportional selection for LLM training-data pipelines
(beyond-reference surface; the RefinedWeb/C4-style "at most N documents
per domain" rule).

The naive spelling — ``ROW_NUMBER() OVER (PARTITION BY source ORDER BY
doc_id) <= cap`` — shuffles EVERY document of the hottest source into
one task and sorts its full list there: at 100 TB a head domain with
10^9 docs is a straggler sort + spill. These operators use the same
two-phase cap the inverted-index build uses (operators/retrieval.py):

1. local: groupBy (spark_partition_id, group) keeps each input
   partition's ``cap`` smallest keys plus a local count — keys are
   (partition, group) so no task ever aggregates more than one input
   partition's share of a hot group;
2. merge: groupBy group over the CAPPED locals — at most cap * P
   candidate keys per group (bounded metadata, not the group's rows) —
   slicing the merged sorted union back to ``cap``.

Each local top-``cap`` holds its partition's smallest keys, so the
global smallest ``cap`` of the union equals the true smallest ``cap``:
output is independent of partitioning, bit-identical to the window
spelling, with zero per-group windows/sorts anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
) -> DataFrame:
    """(group_col, n_total, kept): per group, the total row count and
    the ``cap`` smallest ``key_col`` values (ascending array).

    ``key_col`` must be unique per row (a doc_id). Deterministic "keep
    the lowest ids" selection; swap the key for ``md5(id)`` upstream to
    get a stable pseudo-random cap instead of an age-biased one.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    local = df.groupBy(
        F.spark_partition_id().alias("_pid"), group_col
    ).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.slice(F.sort_array(F.collect_list(key_col)), 1, cap).alias("_loc"),
    )
    return local.groupBy(group_col).agg(
        F.sum("_cnt").alias("n_total"),
        F.slice(
            F.sort_array(F.flatten(F.collect_list("_loc"))), 1, cap
        ).alias("kept"),
    )


def apply_group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
) -> DataFrame:
    """The capped rows themselves: ``df`` filtered to the per-group
    ``cap`` smallest keys, all original columns preserved.

    The kept-key relation is at most ``cap`` keys per group —
    broadcast-joined back, so the data side neither shuffles nor
    sorts. At 100 TB with many groups, swap the broadcast for a
    shuffle hash join on ``key_col`` (still no window).
    """
    kept = per_group_cap(df, group_col, key_col, cap).select(
        F.explode("kept").alias(key_col)
    )
    return df.join(F.broadcast(kept), key_col, "left_semi").select(
        *df.columns
    )

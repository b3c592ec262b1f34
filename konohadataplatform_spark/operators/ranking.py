"""Scalable global ranking — the two-phase pattern for fact-scale ranks.

A plain `ROW_NUMBER() OVER (ORDER BY ...)` (W1/W3 in the reference's
marts, e.g. user_order_summary.sql:40-46) forces every row through ONE
partition — fine at mart size, fatal at fact scale.
`scalable_rank_stats` produces identical output with bounded
parallelism:

1. `repartitionByRange` on the order key — rows land in globally
   ordered partitions (Spark samples ranges; skew spreads by added
   tiebreak columns);
2. per-partition `row_number` (and running sums) over a
   partition-local window;
3. per-partition counts/sums (tiny: one row per partition) are
   prefix-summed by a single-partition window over that
   METADATA-sized relation and broadcast-joined back as offsets.

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

The same counts relation also yields grand totals (COUNT(*) OVER (),
SUM(x) OVER ()) and — via `ntile_from_rank` — global NTILE, so a
query needing rank + running share + totals pays ONE range exchange
instead of several single-partition WindowExecs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scalable_rank_stats(
    df: DataFrame,
    order_cols: list[Column],
    rn_col: str = "rank",
    rn_type: str = "int",
    prefix_sum_cols: dict[str, Column] | None = None,
    total_cols: dict[str, Column] | None = None,
    total_count_col: str | None = None,
    num_partitions: int | None = None,
    stabilize_source: bool = False,
) -> DataFrame:
    """Global row_number (plus optional global running sums and grand
    totals) over `order_cols` without a single-partition sort.
    `order_cols` must define a total order (add a unique tiebreak
    column) for deterministic output.

    ``prefix_sum_cols``: {out_name: measure} — each output column is
    the INCLUSIVE running sum of the measure in global order
    (``SUM(m) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``),
    assembled as partition-local running sum + the prefix sum of the
    per-partition totals.

    ``total_cols``: {out_name: measure} — grand total of the measure
    (``SUM(m) OVER ()``) stamped on every row, computed from the same
    per-partition counts relation (no second scan).

    ``total_count_col``: when set, every output row also carries the
    TOTAL row count under that name — callers needing
    rank-relative-to-N arithmetic (percentile cuts, NTILE) get N tied
    by construction to the exact relation that produced the ranks (an
    independent count() of a non-deterministic source could disagree).

    The ranking and counts branches must observe identical `_pid`
    assignments; ReusedExchange plus repartitionByRange's seeded
    sampling guarantees that for deterministic inputs. If `df` is
    non-deterministic (rand(), unordered limits, re-sampled reads),
    pass ``stabilize_source=True`` to localCheckpoint the ranged
    relation — both branches then read one materialized copy instead
    of recomputing the upstream.
    """
    psums = dict(prefix_sum_cols or {})
    tots = dict(total_cols or {})

    def _fresh(base: str) -> str:
        # avoid silently clobbering caller columns that happen to share
        # a temp name (r14 review)
        name = base
        while name in df.columns:
            name += "_"
        return name

    # Materialize measure expressions BEFORE the range exchange so the
    # ranking branch and the counts branch read byte-identical values.
    pre = df
    ps_tmp: dict[str, str] = {}
    for i, (name, col) in enumerate(psums.items()):
        ps_tmp[name] = _fresh(f"_ps{i}")
        pre = pre.withColumn(ps_tmp[name], col)
    tot_tmp: dict[str, str] = {}
    for i, (name, col) in enumerate(tots.items()):
        tot_tmp[name] = _fresh(f"_tt{i}")
        pre = pre.withColumn(tot_tmp[name], col)

    pid = _fresh("_pid")
    lrn = _fresh("_local_rn")
    off0 = _fresh("_off")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The ranged relation is ALWAYS lazily checkpointed (r14 sf0.1
    # certification finding): repartitionByRange samples its boundaries
    # with a seed derived from the exchange INSTANCE, so when the
    # planner does not dedupe the two consumers into one ReusedExchange
    # (observed under AQE at sf0.1), the ranking branch and the counts
    # branch see DIFFERENT _pid assignments and the offsets corrupt the
    # global ranks — nondeterministically. The checkpoint pins one
    # materialization both branches read; rank correctness needs only
    # internal consistency (any boundary set yields ordered
    # partitions). Cost: one materialization of the ranked relation —
    # which at every call site is a grain-reduced aggregate, not the
    # raw fact table. (`stabilize_source` is retained for API
    # compatibility; the checkpoint it used to opt into is now
    # unconditional.)
    ranged = (
        pre.repartitionByRange(n, *order_cols)
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    local_w = Window.partitionBy(pid).orderBy(*order_cols)
    run_w = local_w.rowsBetween(Window.unboundedPreceding, 0)
    local = ranged.withColumn(lrn, F.row_number().over(local_w))
    for name, tmp in ps_tmp.items():
        local = local.withColumn(f"_run{tmp}", F.sum(tmp).over(run_w))

    aggs = [F.count(F.lit(1)).alias("_c")]
    for tmp in ps_tmp.values():
        aggs.append(F.sum(tmp).alias(f"_pc{tmp}"))
    for tmp in tot_tmp.values():
        aggs.append(F.sum(tmp).alias(f"_pc{tmp}"))
    counts = ranged.groupBy(pid).agg(*aggs)

    # single-partition windows are safe here: the relation is one row
    # per range partition (metadata-sized), not the data
    off_w = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    tot_w = Window.orderBy(pid).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col(pid),
        F.coalesce(F.sum("_c").over(off_w), F.lit(0)).alias(off0),
    ]
    for name, tmp in ps_tmp.items():
        # offsets stay NULLABLE (no coalesce): SUM OVER returns NULL
        # for a row whose entire global prefix is NULL, and the output
        # must reproduce that — coalescing here would turn it into 0
        off_cols.append(F.sum(f"_pc{tmp}").over(off_w).alias(f"_off{tmp}"))
    for name, tmp in tot_tmp.items():
        off_cols.append(F.sum(f"_pc{tmp}").over(tot_w).alias(name))
    if total_count_col is not None:
        off_cols.append(F.sum("_c").over(tot_w).alias(total_count_col))
    offsets = counts.select(*off_cols)

    out = local.join(F.broadcast(offsets), pid).withColumn(
        rn_col, (F.col(lrn) + F.col(off0)).cast(rn_type)
    )
    drop = [pid, lrn, off0]
    for name, tmp in ps_tmp.items():
        run, off = F.col(f"_run{tmp}"), F.col(f"_off{tmp}")
        # SUM(m) OVER (ROWS UNBOUNDED PRECEDING) semantics: NULL only
        # when every value in the global prefix is NULL
        out = out.withColumn(
            name,
            F.when(run.isNull() & off.isNull(), F.lit(None)).otherwise(
                F.coalesce(run, F.lit(0)) + F.coalesce(off, F.lit(0))
            ),
        )
        drop += [tmp, f"_run{tmp}", f"_off{tmp}"]
    for tmp in tot_tmp.values():
        drop.append(tmp)
    return out.drop(*drop)


def scalable_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
    stabilize_source: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """Global row_number over `order_cols` without a single-partition
    sort — the original narrow surface, now a thin wrapper over
    `scalable_rank_stats` (see its docstring for the contract)."""
    return scalable_rank_stats(
        df,
        order_cols,
        rn_col=out_col,
        total_count_col=total_col,
        num_partitions=num_partitions,
        stabilize_source=stabilize_source,
    )


def ntile_from_rank(rn: Column, total: Column, buckets: int) -> Column:
    """Global ``NTILE(buckets)`` computed arithmetically from a global
    row_number (1-based) and the total row count — the scalable
    replacement for ``NTILE(n) OVER (ORDER BY ...)``, whose
    single-partition sort `scalable_rank_stats` already eliminated.

    SQL NTILE semantics: with N rows and n buckets, the first
    ``N % n`` buckets hold ``N div n + 1`` rows, the rest ``N div n``.
    Integer arithmetic only — no floats, exact at any N.
    """
    nb = F.lit(int(buckets)).cast("bigint")
    rn64 = rn.cast("bigint")
    tot = total.cast("bigint")
    rem = (tot % nb).cast("bigint")  # N % n, exact bigint
    # (tot - rem) is exactly divisible by nb, so the double division is
    # exact for any N <= 2^53
    base = ((tot - rem) / nb).cast("bigint")  # N div n
    big_rows = rem * (base + F.lit(1))  # rows covered by the big buckets
    return (
        F.when(
            rn64 <= big_rows,
            F.floor((rn64 - F.lit(1)) / (base + F.lit(1))) + F.lit(1),
        )
        .otherwise(
            rem + F.floor((rn64 - big_rows - F.lit(1)) / base) + F.lit(1)
        )
        .cast("int")
    )

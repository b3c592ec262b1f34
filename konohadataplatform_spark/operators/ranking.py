"""Scalable global ranking — the two-phase pattern for fact-scale ranks.

A plain `ROW_NUMBER() OVER (ORDER BY ...)` (W1/W3 in the reference's
marts, e.g. user_order_summary.sql:40-46) forces every row through ONE
partition — fine at mart size, fatal at fact scale.
`scalable_rank_stats` produces identical output with bounded
parallelism:

1. `repartitionByRange` on the order key — rows land in globally
   ordered partitions (Spark samples ranges; skew spreads by added
   tiebreak columns) — then `sortWithinPartitions` + a pinned
   `monotonically_increasing_id` stamp (consecutive within each
   partition), so the per-partition rank is pure arithmetic;
2. per-partition counts/sums and first-id (tiny: one row per
   partition) are prefix-summed by a single-partition window over
   that METADATA-sized relation and broadcast-joined back as
   offsets: rank = mid - first_id + 1 + offset.

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


DEFAULT_RANK_SMALL_BOUND = 4_000_000
# bytes-estimate tier of the gate (gating.probe_small): 256 MB of
# estimated scan covers any mart/dimension-grain probe side while a
# corpus-scale side blows past it and pays the (noise at that scale)
# LIMIT row probe instead
DEFAULT_RANK_SMALL_BYTES = 256 * 1024 * 1024


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
    probe_side: DataFrame | None = None,
    small: bool | None = None,
    gate_bound: int | None = None,
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

    ``probe_side`` / ``small`` / ``gate_bound`` (r14 optimization
    round): the two-phase plan pays a FIXED chain of sequential jobs
    (range sampling, checkpoint materializations, the offsets
    broadcast) that at mart scale costs ~1 s to rank 15 k rows the
    single-partition window sorts in one task. This is the repo's
    counted-gate convention (operators/gating.py): when the ranked
    relation is provably small, use the single-window spelling — the
    OUTPUT IS BIT-IDENTICAL either way (a total order is required, so
    both plans produce the same rows; parity-tested both sides of the
    flip). ``small=True/False`` decides directly; ``small=None`` with
    a ``probe_side`` runs a LIMIT-bounded count on it. Pass a CHEAP
    upper-bound relation as the probe — e.g. the dimension table whose
    grain the ranked aggregate reduces to (customer for a per-customer
    mart, documents for a per-doc score): the probe is then a
    short-circuiting scan, never a full execution of the aggregate. A
    probe that under-estimates only costs performance (a bigger
    single-task sort), never correctness. Default bound
    ``$SPARK_GRAFT_RANK_SMALL`` (4 M rows): a single-task sort of 4 M
    grain rows is cheaper than the two-phase fixed job chain; corpus-
    scale relations blow past any bound and take the two-phase path.
    """
    psums = dict(prefix_sum_cols or {})
    tots = dict(total_cols or {})

    if small is None and probe_side is not None:
        import os

        from konohadataplatform_spark.operators.gating import probe_small

        if gate_bound is not None:
            # explicit bound = row-accurate gating (tests, callers
            # with exact budgets): skip the bytes-estimate tier
            from konohadataplatform_spark.operators.gating import (
                probe_within,
            )

            small = probe_within(probe_side, int(gate_bound))
        else:
            bound = int(
                os.environ.get(
                    "SPARK_GRAFT_RANK_SMALL", DEFAULT_RANK_SMALL_BOUND
                )
            )
            bytes_bound = int(
                os.environ.get(
                    "SPARK_GRAFT_RANK_SMALL_BYTES", DEFAULT_RANK_SMALL_BYTES
                )
            )
            small = probe_small(probe_side, bound, bytes_bound)
    if small:
        # Gated small path: ONE lazy plan, one WindowExec — the exact
        # single-partition spelling the two-phase plan replaces at
        # scale, bit-identical by the total-order contract. The window
        # census (tests/test_window_audit.py) records this site as
        # "gated": it can only run under the counted bound.
        w = Window.orderBy(*order_cols)
        run_w = w.rowsBetween(Window.unboundedPreceding, 0)
        all_w = Window.partitionBy()
        out = df.withColumn(rn_col, F.row_number().over(w).cast(rn_type))
        for name, col in psums.items():
            out = out.withColumn(name, F.sum(col).over(run_w))
        for name, col in tots.items():
            out = out.withColumn(name, F.sum(col).over(all_w))
        if total_count_col is not None:
            out = out.withColumn(
                total_count_col, F.count(F.lit(1)).over(all_w)
            )
        return out

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
    mid = _fresh("_mid")
    off0 = _fresh("_off")
    m0 = _fresh("_m0")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # r14 optimization round: the upstream relation is lazily
    # checkpointed FIRST — repartitionByRange's boundary sampling is a
    # full pass over its child, so without this the upstream plan (at
    # every call site a join+aggregate, at perplexity_partition a full
    # LM scoring pass) executed TWICE: once for the sampling job and
    # once for the real exchange. Storage of one grain-reduced relation
    # buys back a whole upstream computation.
    pre = pre.localCheckpoint(eager=False)
    # The ranged relation is ALSO always lazily checkpointed (r14 sf0.1
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
    #
    # r14 optimization round, plan shape: the old per-partition
    # `row_number()` window re-SHUFFLED and re-SORTED the data after
    # the checkpoint (LogicalRDD loses the exchange's partitioning, so
    # WindowExec demanded a second hashpartitioning(_pid) Exchange).
    # Instead the rows are sorted ONCE inside the range exchange's
    # output partitions (`sortWithinPartitions` — narrow, no exchange)
    # and stamped with `monotonically_increasing_id()`, whose value is
    # consecutive within a partition (partition ordinal in the high
    # bits, a per-row counter incrementing by 1 in the low 33 bits).
    # The checkpoint pins those ids; the counts branch then recovers
    # each partition's first id as MIN(mid), and
    #   local_rn = mid - min(mid over pid) + 1
    # — the data-side plan after the checkpoint is scan -> broadcast
    # join -> project: ZERO exchanges, ZERO sorts, no WindowExec.
    ranged = (
        pre.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(pid, F.spark_partition_id())
        .withColumn(mid, F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )

    local = ranged
    if ps_tmp:
        # running sums still need a sequential in-partition scan — the
        # one consumer class that keeps a WindowExec. Ordering by the
        # pinned `mid` (a bigint already in sort order) instead of the
        # original order columns makes the re-sort as cheap as it gets.
        run_w = (
            Window.partitionBy(pid)
            .orderBy(mid)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for name, tmp in ps_tmp.items():
            local = local.withColumn(f"_run{tmp}", F.sum(tmp).over(run_w))

    aggs = [F.count(F.lit(1)).alias("_c"), F.min(mid).alias(m0)]
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
        F.col(m0),
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
        rn_col,
        (F.col(mid) - F.col(m0) + F.lit(1) + F.col(off0)).cast(rn_type),
    )
    drop = [pid, mid, m0, off0]
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
    probe_side: DataFrame | None = None,
    small: bool | None = None,
    gate_bound: int | None = None,
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
        probe_side=probe_side,
        small=small,
        gate_bound=gate_bound,
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

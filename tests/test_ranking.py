"""scalable_row_number must equal the single-partition ROW_NUMBER and
actually distribute the sort."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from konohadataplatform_spark.operators.ranking import scalable_row_number
from konohadataplatform_spark.sources.star_schema import load_table
from tests.conftest import SF_DIR


def test_matches_global_row_number(spark):
    orders = load_table(spark, SF_DIR, "orders")
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    fast = {
        r.o_orderkey: r.rank
        for r in scalable_row_number(orders, order_cols, "rank").collect()
    }
    slow = {
        r.o_orderkey: r.rank
        for r in orders.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order_cols))
        ).collect()
    }
    assert fast == slow


def test_no_single_partition_window(spark):
    orders = load_table(spark, SF_DIR, "orders")
    df = scalable_row_number(
        orders, [F.col("o_orderkey")], "rank", num_partitions=8
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the ranged relation is checkpointed (r14: pins ONE boundary
    # sampling for both branches). Since the r14 optimization round the
    # data side carries NO WindowExec at all (rank = pinned
    # monotonically_increasing_id arithmetic + broadcast offsets); the
    # only windows left run over the one-row-per-partition counts
    # relation, so the data is never funneled through a global sort.
    assert "localcheckpoint" in plan.lower()
    assert "row_number()" not in plan
    # exactly one join (the broadcast offsets attach) and no exchange
    # on the data side after the checkpoint: the counts side's
    # aggregate exchange + the offsets' single-partition window are the
    # only ones, and both move one row per range partition
    assert "BroadcastHashJoin" in plan


def test_dense_and_contiguous(spark):
    ev = load_table(spark, SF_DIR, "events")
    ranked = scalable_row_number(
        ev, [F.col("ts"), F.col("event_id")], "rank", num_partitions=6
    )
    ranks = sorted(r.rank for r in ranked.select("rank").collect())
    assert ranks == list(range(1, len(ranks) + 1))


def test_no_cache_leak_after_materialization(spark):
    """r7 VERDICT item 6: the old implementation cached its ranged
    intermediate and never unpersisted it, leaking one cached relation
    per call in long sessions. The operator is now a single lazy plan —
    the CacheManager must stay exactly as it was after the result is
    materialized."""
    from konohadataplatform_spark.operators.retrieval import lexical_topk

    spark.catalog.clearCache()  # order-independent: start from a known-empty state
    cm = spark._jsparkSession.sharedState().cacheManager()
    orders = load_table(spark, SF_DIR, "orders")
    scalable_row_number(orders, [F.col("o_orderkey")], "rank").collect()
    docs = load_table(spark, SF_DIR, "documents")
    lexical_topk(docs, F.col("doc_id") % 101 == 0, k=3, n=3).collect()
    assert cm.isEmpty()


def test_scalable_row_number_total_col(spark):
    df = spark.range(1, 38).select(F.col("id").alias("k"))
    out = scalable_row_number(
        df, [F.col("k")], "rank", total_col="_n"
    ).collect()
    assert {r["_n"] for r in out} == {37}
    assert sorted(r["rank"] for r in out) == list(range(1, 38))


def test_rank_stats_matches_global_windows(spark):
    """r14 parity: rn + running sum + grand totals from ONE range
    exchange must equal the single-partition window spellings on a
    multi-partition fixture with duplicate order keys."""
    from konohadataplatform_spark.operators.ranking import (
        scalable_rank_stats,
    )

    df = (
        spark.range(0, 997)
        .select(
            (F.col("id") % 131).alias("v"),  # duplicate keys
            F.col("id").alias("k"),
            ((F.col("id") * 7) % 1000).cast("long").alias("m"),
        )
        .repartition(16)
    )
    order_cols = [F.col("v").desc(), F.col("k").asc()]
    fast = {
        r.k: (r.rn, r.run_m, r.tot_m, r.n)
        for r in scalable_rank_stats(
            df,
            order_cols,
            rn_col="rn",
            rn_type="bigint",
            prefix_sum_cols={"run_m": F.col("m")},
            total_cols={"tot_m": F.col("m")},
            total_count_col="n",
            num_partitions=8,
        ).collect()
    }
    w = Window.orderBy(*order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    slow = {
        r.k: (r.rn, r.run_m, r.tot_m, r.n)
        for r in df.select(
            "k",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.sum("m").over(wrun).alias("run_m"),
            F.sum("m").over(wall).alias("tot_m"),
            F.count(F.lit(1)).over(wall).alias("n"),
        ).collect()
    }
    assert fast == slow


def test_ntile_from_rank_matches_ntile(spark):
    """Arithmetic NTILE must match Spark's NTILE for bucket counts
    that divide evenly, unevenly, and exceed the row count."""
    from konohadataplatform_spark.operators.ranking import (
        ntile_from_rank,
        scalable_rank_stats,
    )

    for n_rows, buckets in [(100, 10), (103, 10), (7, 10), (1, 3), (97, 8)]:
        df = spark.range(0, n_rows).select(
            ((F.col("id") * 37) % 1009).alias("v"), F.col("id").alias("k")
        )
        order_cols = [F.col("v").asc(), F.col("k").asc()]
        got = {
            r.k: r.b
            for r in scalable_rank_stats(
                df,
                order_cols,
                rn_col="_rn",
                rn_type="bigint",
                total_count_col="_n",
                num_partitions=5,
            )
            .select(
                "k",
                ntile_from_rank(F.col("_rn"), F.col("_n"), buckets).alias("b"),
            )
            .collect()
        }
        want = {
            r.k: r.b
            for r in df.select(
                "k", F.ntile(buckets).over(Window.orderBy(*order_cols)).alias("b")
            ).collect()
        }
        assert got == want, (n_rows, buckets)


def test_gate_flip_parity(spark):
    """r14 optimization round: the counted gate changes EXECUTION only —
    the single-window small path and the two-phase range path must
    return bit-identical (rank, running sum, totals, N) on a
    multi-partition fixture with duplicate keys and NULL measures."""
    from konohadataplatform_spark.operators.ranking import (
        scalable_rank_stats,
    )

    df = (
        spark.range(0, 731)
        .select(
            (F.col("id") % 97).alias("v"),
            F.col("id").alias("k"),
            F.when(F.col("id") % 5 != 0, (F.col("id") * 3) % 100).alias("m"),
        )
        .repartition(11)
    )
    order_cols = [F.col("v").asc(), F.col("k").desc()]
    kw = dict(
        rn_col="rn",
        rn_type="bigint",
        prefix_sum_cols={"run_m": F.col("m")},
        total_cols={"tot_m": F.col("m")},
        total_count_col="n",
        num_partitions=6,
    )
    small = {
        r.k: (r.rn, r.run_m, r.tot_m, r.n)
        for r in scalable_rank_stats(df, order_cols, small=True, **kw).collect()
    }
    big = {
        r.k: (r.rn, r.run_m, r.tot_m, r.n)
        for r in scalable_rank_stats(df, order_cols, small=False, **kw).collect()
    }
    assert small == big
    # probe path resolves the gate from the side's measured size
    probed = scalable_rank_stats(
        df, order_cols, probe_side=df, gate_bound=10, **kw
    )  # 731 rows > 10 -> two-phase (the checkpointed _mid scan)
    assert "_mid" in probed._jdf.queryExecution().toString()


def test_rank_stats_null_measure_prefix_semantics(spark):
    """r14 review: SUM(m) OVER (ROWS UNBOUNDED PRECEDING) is NULL only
    while the entire global prefix is NULL — the two-phase prefix sum
    must reproduce that, including across range-partition boundaries."""
    from konohadataplatform_spark.operators.ranking import (
        scalable_rank_stats,
    )

    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        # NULL for the first 120 keys in order, values after
        F.when(F.col("id") >= 120, F.col("id")).alias("m"),
    )
    order_cols = [F.col("k").asc()]
    fast = {
        r.k: r.run
        for r in scalable_rank_stats(
            df,
            order_cols,
            rn_col="_rn",
            prefix_sum_cols={"run": F.col("m")},
            num_partitions=7,
        ).collect()
    }
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    slow = {
        r.k: r.run
        for r in df.select("k", F.sum("m").over(w).alias("run")).collect()
    }
    assert fast == slow
    assert slow[0] is None and slow[119] is None and slow[120] == 120

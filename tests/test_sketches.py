"""Sketch aggregations: accuracy contracts and plan shapes.

HLL++ estimates are engine-specific (not oracle-expressible), so the
driver gate for sketches is `q_quantile_sketch` (exact below the
accuracy knob = quantile_disc) and THESE accuracy/plan gates.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from konohadataplatform_spark.operators.sketches import (
    approx_distinct,
    quantile_sketch,
)
from konohadataplatform_spark.sources.star_schema import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_hll_relative_error_within_contract(spark):
    """approx_count_distinct(rsd=0.02): every group's estimate within
    3 standard deviations of the exact distinct count."""
    orders = load_table(spark, SF_DIR, "orders")
    est = {
        r.o_orderpriority: r.approx_n
        for r in approx_distinct(
            orders, ["o_orderpriority"], "o_custkey", rsd=0.02
        ).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        rel = abs(est[k] - exact[k]) / exact[k]
        assert rel <= 3 * 0.02, (k, est[k], exact[k], rel)


def test_hll_single_exchange_plan(spark):
    """The point of the sketch: ONE partial+final agg pair (sketches
    merge associatively), where exact COUNT(DISTINCT) needs the
    two-shuffle distinct-aggregate rewrite."""
    orders = load_table(spark, SF_DIR, "orders")
    sk = approx_distinct(orders, ["o_orderpriority"], "o_custkey")
    plan = _plan(sk)
    tree = plan.split("\n\n(")[0]
    assert tree.count("Exchange") == 1, tree
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n")
    )
    exact_tree = _plan(exact).split("\n\n(")[0]
    assert exact_tree.count("Exchange") == 2, exact_tree


def test_quantile_sketch_exact_below_accuracy(spark):
    """GK with accuracy >= group size stores every value: the result
    is the exact discrete percentile (an element of the group)."""
    orders = load_table(spark, SF_DIR, "orders")
    out = {
        r.o_orderpriority: (r.p50, r.p90, r.p99)
        for r in quantile_sketch(
            orders, ["o_orderpriority"], "o_totalprice",
            probs=[0.5, 0.9, 0.99],
        ).collect()
    }
    rows = orders.select("o_orderpriority", "o_totalprice").collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for k, vals in groups.items():
        vals.sort()
        n = len(vals)
        for p, got in zip([0.5, 0.9, 0.99], out[k]):
            # discrete percentile: the smallest element whose rank
            # covers p (quantile_disc / approx_percentile semantics)
            idx = max(0, math.ceil(p * n) - 1)
            assert got == vals[idx], (k, p, got, vals[idx])


def test_quantile_sketch_rank_error_above_accuracy(spark):
    """Past the accuracy knob the GK summary degrades to bounded RANK
    error (n/accuracy), never garbage: the returned value's true rank
    stays within the bound of the target rank."""
    n, acc = 5000, 100
    df = load_table(spark, SF_DIR, "orders").limit(n).select(
        F.col("o_totalprice").alias("v")
    )
    vals = sorted(r.v for r in df.collect())
    n = len(vals)
    got = df.agg(
        F.expr(f"approx_percentile(v, 0.5, {acc})").alias("m")
    ).collect()[0].m
    true_rank = vals.index(got)
    assert abs(true_rank - 0.5 * n) <= n / acc + 1, (true_rank, n)

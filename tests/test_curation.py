"""Per-group cap operator: window-free selection, window-equivalent
output (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from konohadataplatform_spark.operators.curation import (
    apply_group_cap,
    per_group_cap,
)


def _skewed(spark):
    # one hot group (80% of rows) + a tail, shuffled over 8 partitions
    rows = [("hot", i) for i in range(400)] + [
        (f"g{i % 7}", 1000 + i) for i in range(100)
    ]
    return spark.createDataFrame(rows, "grp: string, id: long").repartition(8)


def test_matches_window_spelling(spark):
    df = _skewed(spark)
    got = {
        r["grp"]: (r["n_total"], list(r["kept"]))
        for r in per_group_cap(df, "grp", "id", 5).collect()
    }
    w = Window.partitionBy("grp").orderBy("id")
    exp_rows = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .groupBy("grp")
        .agg(F.sort_array(F.collect_list("id")).alias("kept"))
        .collect()
    )
    totals = {r["grp"]: r["cnt"] for r in df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    exp = {r["grp"]: (totals[r["grp"]], list(r["kept"])) for r in exp_rows}
    assert got == exp


def test_apply_cap_keeps_rows_intact(spark):
    df = _skewed(spark).withColumn("payload", F.md5(F.col("id").cast("string")))
    out = apply_group_cap(df, "grp", "id", 3)
    assert out.columns == df.columns
    per_grp = out.groupBy("grp").count().collect()
    assert all(r["count"] <= 3 for r in per_grp)
    # kept rows are the 3 lowest ids of each group
    hot = sorted(r["id"] for r in out.where(F.col("grp") == "hot").collect())
    assert hot == [0, 1, 2]


def test_no_window_in_plan(spark):
    from tests.test_plans import plan_of

    df = _skewed(spark)
    plan = plan_of(apply_group_cap(df, "grp", "id", 3))
    assert "Window" not in plan
    # two-phase: partial/final aggregation pairs, no per-group sort
    assert "Sort" not in plan.split("\n\n(")[0] or "SortAggregate" in plan


def test_cap_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        per_group_cap(_skewed(spark), "grp", "id", 0)

"""Skew tooling: salted join must equal the plain join; profile finds
the hot key."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from konohadataplatform_spark.operators.skew import key_skew_profile, salted_join


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows share key 0
    big = spark.createDataFrame(
        [Row(k=0 if i % 10 else i, payload=i) for i in range(1000)]
    )
    small = spark.createDataFrame([Row(k=i, name=f"dim{i}") for i in range(120)])
    plain = big.join(small, ["k"], "inner")
    salted = salted_join(big, small, ["k"], "inner", buckets=8)
    assert sorted(plain.columns) == sorted(salted.columns)
    p = {(r.k, r.payload, r.name) for r in plain.collect()}
    s = {(r.k, r.payload, r.name) for r in salted.collect()}
    assert p == s


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([Row(k=1, v="a"), Row(k=99, v="b")])
    small = spark.createDataFrame([Row(k=1, name="one")])
    out = {(r.k, r.name) for r in salted_join(big, small, ["k"], "left").collect()}
    assert out == {(1, "one"), (99, None)}


def test_key_skew_profile(spark):
    df = spark.createDataFrame(
        [Row(k="hot") for _ in range(90)] + [Row(k=f"c{i}") for i in range(10)]
    )
    prof = key_skew_profile(df, ["k"], top=3).collect()
    assert prof[0].k == "hot"
    assert abs(prof[0].share - 0.9) < 1e-9


def test_bucketed_write_avoids_join_shuffle(spark, tmp_path):
    from konohadataplatform_spark.catalog import write_bucketed

    a = spark.range(0, 10000).withColumnRenamed("id", "k").withColumn(
        "va", F.col("k") * 2
    )
    b = spark.range(0, 10000).withColumnRenamed("id", "k").withColumn(
        "vb", F.col("k") + 1
    )
    write_bucketed(spark, "bt_a", a, ["k"], n_buckets=8)
    write_bucketed(spark, "bt_b", b, ["k"], n_buckets=8)
    # force the sort-merge path (small test tables would broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        # co-bucketed tables: SortMergeJoin without a shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE bt_a")
        spark.sql("DROP TABLE bt_b")


def test_star_schema_bucketed_join_shuffle_free(spark):
    """Pre-bucketing orders+lineitem on the join key (M6 bucket(x,N))
    removes the fact-fact shuffle from the q3-style join entirely."""
    from konohadataplatform_spark.catalog import write_bucketed
    from konohadataplatform_spark.sources.star_schema import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(spark, "b_orders", orders, ["o_orderkey"], n_buckets=8)
    write_bucketed(
        spark,
        "b_lineitem",
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        ["o_orderkey"],
        n_buckets=8,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        # no exchange below the join: both sides are co-bucketed; the
        # only allowed exchange is the one feeding the final aggregate
        join_part = plan.split("SortMergeJoin")[0]
        assert "Exchange hashpartitioning" not in join_part
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")


def test_salted_distinct_count_exact(spark):
    from konohadataplatform_spark.operators.skew import salted_distinct_count

    rows = [(("hot" if i % 10 else "cold"), i % 137) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {
        r.k: r.n_distinct_v
        for r in salted_distinct_count(df, ["k"], "v", buckets=8).collect()
    }
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want


def test_spread_gated_on_partition_count(spark):
    """_spread must not round-robin an already-parallel input (at 100 TB
    that would reshuffle the full corpus for nothing); an under-split
    input still gets spread to the full cluster."""
    from konohadataplatform_spark.operators.dedup import _spread

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target + 4)
    assert _spread(wide) is wide  # pass-through: no extra Exchange at all
    narrow = spark.range(1000).coalesce(1)
    spread = _spread(narrow)
    assert spread.rdd.getNumPartitions() == target
    plan = spread._sc._jvm.PythonSQLUtils.explainString(
        spread._jdf.queryExecution(), "formatted"
    )
    assert "RoundRobinPartitioning" in plan

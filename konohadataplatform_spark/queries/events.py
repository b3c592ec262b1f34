"""Event-stream semantics (SURVEY §2.9) expressed as batch plans.

The reference's streaming path is CDC upsert-apply (Debezium →
Kafka Connect → Iceberg, ``infrastructure/apps/kafka/connectors/*``);
its core semantic — *latest-wins per key, deletes applied* — is
``q_events_latest_per_user`` / ``q_cdc_apply`` here, and the live
Structured Streaming implementation of the same logic is
:mod:`konohadataplatform_spark.streaming.cdc` (tested separately —
identical `foreachBatch` logic, same dedupe rule).

Also covered: tumbling-window rollup (the `F.window` streaming analog,
expressed via date_trunc so the DuckDB oracle can run it), gap-based
sessionization (lag + cumulative flag sum — the batch equivalent of
`applyInPandasWithState` sessions), and JSON property extraction.

Scale posture: sessionization is two window functions over the same
(user_id, ts) partitioning — one shuffle, reused; the hourly rollup is
a partial hash agg; latest-per-key is a window-rank, the standard
dedupe-before-merge pattern at any scale (C2 semantics,
``docs/architecture/overview.md:70``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from konohadataplatform_spark.sources.star_schema import load_table
from konohadataplatform_spark.functions import dec, dsum

QUERIES = {}
ORACLE = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query name {name!r}: a second @query would "
                "silently shadow the first in the driver registry"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Tumbling-window rollup (C7/streaming agg analog; date_trunc == F.window
# with 1-hour tumble for complete data)
# --------------------------------------------------------------------------
@query(
    "q_events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Latest-wins per key — the CDC upsert dedupe rule (C2; the same logic the
# streaming path applies per micro-batch before merging)
# --------------------------------------------------------------------------
@query(
    "q_events_latest_per_user",
    """
    WITH ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           event_type AS last_event_type,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
    FROM ranked WHERE rn = 1
    """,
)
def q_events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            dec("value").cast("double").alias("last_value"),
        )
    )


# --------------------------------------------------------------------------
# Gap-based sessionization (30-min inactivity gap): lag → new-session flag
# → cumulative sum → session agg. Batch equivalent of session windows.
# --------------------------------------------------------------------------
@query(
    "q_events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ), sessioned AS (
      SELECT *, CAST(SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_sec,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
    FROM sessioned
    GROUP BY user_id, session_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "is_new_session",
        F.when(
            prev_ts.isNull()
            | (F.unix_micros("ts") - F.unix_micros(prev_ts) > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessioned = flagged.withColumn("session_id", F.sum("is_new_session").over(wrun))
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.floor(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000
        ).alias("duration_sec"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )


# --------------------------------------------------------------------------
# CDC upsert/delete apply (C2) as a declared query: treat events as a
# change stream keyed by user_id (signup=c, error=d, else u); the final
# table state is latest-wins with deletes dropped — the same code path
# the streaming engine runs per micro-batch (streaming/cdc.py).
# --------------------------------------------------------------------------
@query(
    "q_cdc_apply_events",
    """
    WITH ranked AS (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           event_id AS last_change_id,
           event_type AS last_op,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS current_value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_cdc_apply_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from konohadataplatform_spark.streaming.cdc import latest_per_key

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("lsn"),
        F.unix_micros("ts").alias("ts_ms"),
        F.col("ts"),
        F.col("event_type").alias("op_type"),
        "value",
    )
    latest = latest_per_key(ev, ["user_id"])
    return latest.filter(F.col("op_type") != "error").select(
        "user_id",
        F.col("lsn").alias("last_change_id"),
        F.col("op_type").alias("last_op"),
        dec("value").cast("double").alias("current_value"),
    )


# --------------------------------------------------------------------------
# JSON property extraction (semi-structured props column)
# --------------------------------------------------------------------------
@query(
    "q_events_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# Event funnel: per-user ordered first-touch of each step (lag/min-over +
# conditional agg composition)
# --------------------------------------------------------------------------
@query(
    "q_events_funnel",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(first_view) AS n_viewed,
           COUNT(CASE WHEN first_click > first_view THEN 1 END) AS n_clicked_after_view,
           COUNT(CASE WHEN first_purchase > first_click
                       AND first_click > first_view THEN 1 END) AS n_full_funnel
    FROM firsts
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def first_of(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("first_view"),
        first_of("click").alias("first_click"),
        first_of("purchase").alias("first_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count(
            F.when(F.col("first_click") > F.col("first_view"), 1)
        ).alias("n_clicked_after_view"),
        F.count(
            F.when(
                (F.col("first_purchase") > F.col("first_click"))
                & (F.col("first_click") > F.col("first_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


# --------------------------------------------------------------------------
# Native F.window tumbling agg in batch (the same operator the streaming
# path uses in streaming/windows.py; window.start == date_trunc(hour))
# --------------------------------------------------------------------------
@query(
    "q_events_tumbling_native",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_events_tumbling_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Weekly cohort retention: first-seen week per user, then per-cohort
# activity in subsequent weeks (self-join of user activity on cohorts)
# --------------------------------------------------------------------------
@query(
    "q_events_retention",
    """
    WITH weeks AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / CAST(604800000000 AS BIGINT)) AS BIGINT) AS week_n
      FROM events GROUP BY user_id, week_n
    ), cohorts AS (
      SELECT user_id, MIN(week_n) AS cohort_week FROM weeks GROUP BY user_id
    )
    SELECT c.cohort_week,
           w.week_n - c.cohort_week AS weeks_since,
           COUNT(DISTINCT w.user_id) AS active_users
    FROM cohorts c JOIN weeks w ON c.user_id = w.user_id
    GROUP BY c.cohort_week, weeks_since
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    weeks = (
        ev.select(
            "user_id",
            F.floor(F.unix_micros("ts") / (7 * 86400 * 1_000_000)).alias("week_n"),
        )
        .distinct()
    )
    cohorts = weeks.groupBy("user_id").agg(F.min("week_n").alias("cohort_week"))
    return (
        cohorts.join(weeks, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_n") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# --------------------------------------------------------------------------
# Value histogram: fixed-width bucketing via floor division (the
# width_bucket pattern, engine-portable)
# --------------------------------------------------------------------------
@query(
    "q_events_value_histogram",
    """
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           CAST(floor(value / 25.0) * 25.0 AS DOUBLE) AS bucket_low,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_sum
    FROM events
    GROUP BY bucket, bucket_low
    """,
)
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 25.0)
    return ev.groupBy(
        bucket.alias("bucket"),
        (bucket * 25.0).cast("double").alias("bucket_low"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("bucket_sum"),
    )


# --------------------------------------------------------------------------
# As-of join (custom operator Spark lacks; DuckDB ASOF JOIN is the
# oracle): each purchase matched to the user's latest prior-or-equal
# view, with the view->purchase gap
# --------------------------------------------------------------------------
@query(
    "q_asof_purchase_view",
    """
    WITH purchases AS (
      SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, ts AS view_ts, event_id AS view_event_id
      FROM events WHERE event_type = 'view'
    )
    SELECT p.user_id, p.event_id, p.ts,
           CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS purchase_value,
           v.view_ts, v.view_event_id,
           CAST((epoch_us(p.ts) - epoch_us(v.view_ts)) // 1000000 AS BIGINT) AS gap_sec
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """,
)
def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from konohadataplatform_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    joined = as_of_join(
        purchases,
        views,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        right_value_cols=["view_ts", "view_event_id"],
        suffix="",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        dec("value").cast("double").alias("purchase_value"),
        "view_ts",
        "view_event_id",
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("view_ts")) / 1_000_000
        ).alias("gap_sec"),
    )


# --------------------------------------------------------------------------
# Range join: facts matched to irregular value bands (broadcast interval
# table; the non-equi-join custom-operator case)
# --------------------------------------------------------------------------
@query(
    "q_range_join_bands",
    """
    WITH bands AS (
      SELECT * FROM (VALUES
        ('micro',  0.0,   10.0),
        ('small',  10.0,  50.0),
        ('mid',    50.0,  120.0),
        ('large',  120.0, 1e9)
      ) AS t(band, low, high)
    )
    SELECT b.band,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS band_value
    FROM events e JOIN bands b ON e.value >= b.low AND e.value < b.high
    GROUP BY b.band
    """,
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from konohadataplatform_spark.operators.temporal import range_join_buckets

    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [
            ("micro", 0.0, 10.0),
            ("small", 10.0, 50.0),
            ("mid", 50.0, 120.0),
            ("large", 120.0, 1e9),
        ],
        "band string, low double, high double",
    )
    joined = range_join_buckets(ev, bands, "value").filter(F.col("band").isNotNull())
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("band_value"),
    )


# --------------------------------------------------------------------------
# Forward as-of join: each purchase matched to the NEXT view at-or-after
# it (direction="forward" — the "what did they do next" join)
# --------------------------------------------------------------------------
@query(
    "q_asof_next_view",
    """
    WITH purchases AS (
      SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, ts AS view_ts, event_id AS view_event_id
      FROM events WHERE event_type = 'view'
    )
    SELECT p.user_id, p.event_id, p.ts,
           v.view_ts AS next_view_ts, v.view_event_id AS next_view_event_id,
           CAST((epoch_us(v.view_ts) - epoch_us(p.ts)) // 1000000 AS BIGINT) AS gap_sec
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts <= v.view_ts
    """,
)
def q_asof_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from konohadataplatform_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    joined = as_of_join(
        purchases,
        views,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        right_value_cols=["view_ts", "view_event_id"],
        suffix="",
        direction="forward",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        F.col("view_ts").alias("next_view_ts"),
        F.col("view_event_id").alias("next_view_event_id"),
        F.floor(
            (F.unix_micros("view_ts") - F.unix_micros("ts")) / 1_000_000
        ).alias("gap_sec"),
    )


# --------------------------------------------------------------------------
# Sliding-window distinct users: COUNT(DISTINCT) over a 3-hour window
# sliding by 1 hour, computed exactly WITHOUT a window-distinct (which
# can't partial-aggregate): dedup to (user, hour), explode each pair to
# the 3 windows it belongs to, then one count-distinct per window.
# Explode factor = window/slide — at 100 TB this stays a linear-cost
# plan with map-side combine, vs an unboundable distinct-over-range.
# --------------------------------------------------------------------------
@query(
    "q_events_sliding_distinct",
    """
    WITH uh AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
    ), expanded AS (
      SELECT user_id, h + INTERVAL (o) HOUR AS w_end
      FROM uh, (SELECT UNNEST([0, 1, 2]) AS o)
    ), bounds AS (
      SELECT MIN(date_trunc('hour', ts)) AS lo, MAX(date_trunc('hour', ts)) AS hi
      FROM events
    )
    SELECT w_end, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM expanded, bounds
    WHERE w_end BETWEEN lo AND hi
    GROUP BY w_end
    """,
)
def q_events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uh = ev.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    expanded = uh.select(
        "user_id",
        F.explode(
            F.array(*[F.col("h") + F.expr(f"INTERVAL {o} HOURS") for o in (0, 1, 2)])
        ).alias("w_end"),
    )
    bounds = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    return (
        expanded.join(F.broadcast(bounds))
        .filter(F.col("w_end").between(F.col("lo"), F.col("hi")))
        .groupBy("w_end")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# Event-sequence pattern mining: per-user ordered event strings, count
# view->purchase transitions via regex — deterministic because the
# ordering key (ts, event_id) is unique and both engines sort it
# identically
# --------------------------------------------------------------------------
@query(
    "q_events_sequence_patterns",
    """
    WITH seqs AS (
      SELECT user_id,
             string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           len(string_split(seq, ',')) AS n_events,
           CAST(len(regexp_extract_all(seq, 'view,purchase')) AS BIGINT)
             AS view_then_purchase,
           CAST(len(regexp_extract_all(seq, 'purchase')) AS BIGINT) AS purchases
    FROM seqs
    WHERE len(regexp_extract_all(seq, 'purchase')) > 0
    """,
)
def q_events_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ordered = F.expr(
        "transform(array_sort(collect_list(struct(ts, event_id, event_type))), "
        "x -> x.event_type)"
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(ordered, ",").alias("seq")
    )
    n = lambda pat: F.size(F.regexp_extract_all(F.col("seq"), F.lit(pat), F.lit(0)))
    return (
        seqs.select(
            "user_id",
            F.size(F.split("seq", ",")).alias("n_events"),
            n("view,purchase").cast("bigint").alias("view_then_purchase"),
            n("purchase").cast("bigint").alias("purchases"),
        )
        .filter(F.col("purchases") > 0)
    )


# --------------------------------------------------------------------------
# EWMA smoothing per user: an inherently SEQUENTIAL fold (each step
# depends on the previous), expressed as an ordered-array aggregate —
# the pattern for any per-key recurrence (EWMA, compound interest,
# stateful scores) without a Python UDF. Bit-exact across engines
# because both fold the identical (ts, event_id)-ordered list with the
# same IEEE ops in the same order.
# --------------------------------------------------------------------------
@query(
    "q_events_ewma",
    """
    WITH seq AS (
      SELECT user_id,
             list_transform(
               list_sort(list(struct_pack(e := epoch_us(ts), i := event_id, v := value))),
               s -> s.v
             ) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS INT) AS n_events,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), vals),
                       (acc, x) -> acc * 0.5 + x * 0.5) AS ewma_value
    FROM seq
    """,
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ordered_vals = F.expr(
        "transform(array_sort(collect_list(struct(ts, event_id, value))), "
        "x -> x.value)"
    )
    ewma = F.expr(
        "aggregate(vals, CAST(0 AS DOUBLE), (acc, x) -> acc * 0.5 + x * 0.5)"
    )
    return (
        ev.groupBy("user_id")
        .agg(ordered_vals.alias("vals"))
        .select(
            "user_id",
            F.size("vals").alias("n_events"),
            ewma.alias("ewma_value"),
        )
    )


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences: the product-
# analytics "what happens after X" table. One window (user-keyed) plus
# two small aggs; probabilities are exact integer divisions.
# --------------------------------------------------------------------------
@query(
    "q_events_transitions",
    """
    WITH e AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), p AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
      FROM e WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), t AS (
      SELECT prev_type, CAST(SUM(n_transitions) AS BIGINT) AS tot
      FROM p GROUP BY 1
    )
    SELECT p.prev_type, p.next_type, p.n_transitions,
           CAST(p.n_transitions AS DOUBLE) / tot AS prob
    FROM p JOIN t USING (prev_type)
    """,
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    p = e.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    t = p.groupBy("prev_type").agg(F.sum("n_transitions").alias("tot"))
    return p.join(t, "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        (F.col("n_transitions").cast("double") / F.col("tot")).alias("prob"),
    )


# --------------------------------------------------------------------------
# Iterative graph algorithm: fixed-point PageRank over the event-type
# transition graph. Integer fixed-point arithmetic makes an ITERATIVE
# algorithm exactly SQL-replayable (unrolled-CTE oracle, one CTE per
# power iteration — the same precedent as the IVF Lloyd replay).
# --------------------------------------------------------------------------
def _pagerank_oracle(iterations: int = 3, scale: int = 10**12) -> str:
    head = f"""
    WITH e0 AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), edges AS (
      SELECT DISTINCT prev_type AS src, event_type AS dst
      FROM e0 WHERE prev_type IS NOT NULL
    ), nodes AS (
      SELECT DISTINCT node
      FROM (SELECT src AS node FROM edges
            UNION SELECT dst AS node FROM edges)
    ), deg AS (
      SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ), nn AS (SELECT COUNT(*) AS n FROM nodes
    ), tele AS (SELECT (3 * {scale}) // (20 * n) AS t FROM nn
    ), r0 AS (
      SELECT node, {scale} // nn.n AS r FROM nodes, nn
    )"""
    its = []
    for i in range(1, iterations + 1):
        its.append(f""", r{i} AS (
      SELECT nodes.node,
             tele.t + (17 * COALESCE(c.s, 0)) // 20 AS r
      FROM nodes
      LEFT JOIN (
        SELECT edges.dst AS node, SUM(p.r // deg.outdeg) AS s
        FROM edges
        JOIN r{i - 1} p ON p.node = edges.src
        JOIN deg ON deg.src = edges.src
        GROUP BY edges.dst
      ) c ON c.node = nodes.node, tele
    )""")
    tail = f"""
    SELECT r{iterations}.node,
           CAST(r{iterations}.r AS BIGINT) AS rank_scaled,
           CAST(COALESCE(deg.outdeg, 0) AS BIGINT) AS out_degree
    FROM r{iterations} LEFT JOIN deg ON deg.src = r{iterations}.node
    """
    return head + "".join(its) + tail


@query("q_event_pagerank", _pagerank_oracle())
def q_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round fixed-point PageRank over the distinct event-type
    transition graph (edges = consecutive event pairs per user).
    Exact integer arithmetic — the oracle unrolls one CTE per power
    iteration and matches bit-for-bit. See operators/graph.py for the
    per-round shuffle story."""
    from konohadataplatform_spark.operators.graph import pagerank_fixed_point

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
    )
    return pagerank_fixed_point(edges, iterations=3)

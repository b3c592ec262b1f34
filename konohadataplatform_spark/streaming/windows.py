"""Event-time windowed streaming aggregations.

The reference keeps its streaming path stateless (upsert-by-key absorbs
late data — SURVEY §2.9 note), but an idiomatic Structured Streaming
engine must still expose the native windowed surface; these helpers are
that surface, and the batch analogs in queries/events.py share their
semantics:

- ``tumbling_agg``  — fixed windows + watermark-bounded state
- ``sliding_agg``   — overlapping windows
- ``session_agg``   — native session windows (gap-based), the streaming
  twin of q_events_sessionize

State posture at scale: watermarks bound state size (old windows are
evicted once the watermark passes), aggregation state is partitioned by
(window, keys) across executors, and checkpointing makes recovery
exactly-once — this is precisely the part of the design the reference
delegates to Kafka Connect and we get natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    aggs = aggs or [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ]
    keys = keys or ["event_type"]
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(*aggs)
    )
    value_cols = [c for c in out.columns if c != "win" and c not in keys]
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *keys,
        *value_cols,
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    keys = keys or ["event_type"]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Native session windows — the streaming twin of the batch
    q_events_sessionize (same 30-min inactivity-gap semantics)."""
    keys = keys or ["user_id"]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(*keys, "n_events", "session_start", "session_end")
    )


def watermarked_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once event dedup with bounded state:
    dropDuplicatesWithinWatermark keeps each key's state only until the
    watermark passes it, so duplicate deliveries inside the lateness
    bound are suppressed and state is O(keys in flight), not O(all keys
    ever) — the correct streaming-dedup primitive at 100 TB/day (the
    plain dropDuplicates variant grows state forever).

    Works on batch DataFrames too (falls back to plain dropDuplicates
    semantics), so batch/stream parity is testable.
    """
    wm = events.withWatermark(ts_col, watermark)
    if events.isStreaming:
        return wm.dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against
    the (batch) dimension table — the static side re-resolves per
    batch, so a catalog-backed dim picks up slowly-changing updates
    without restarting the stream. Spark plans this as a broadcast
    per micro-batch when the dim is small; no streaming state is
    created (unlike stream-stream joins)."""
    return events.join(dim, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: left rows match right rows with
    the same key whose timestamp falls in [left_ts - within, left_ts].
    Both sides are watermarked, and the time-interval condition is what
    lets Spark BOUND the join state — buffered rows are evicted once
    the watermark passes their interval, so state is O(events within
    the lateness+interval window) at any throughput. Without the
    interval bounds a stream-stream join must keep every row forever.

    ``how="leftOuter"`` additionally emits unmatched left rows (right
    columns null) once the watermark closes their interval — the
    "purchase with no preceding view" shape; outer results are
    inherently delayed by the watermark.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError("stream-stream interval join supports inner/leftOuter")
    iv = f"INTERVAL {within}"
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - {iv}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, how).drop(F.col(f"r.{key}"))

"""Windowed streaming aggregations: run as real Structured Streaming
jobs over a file source (availableNow) and cross-check the tumbling agg
against its batch equivalent.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from konohadataplatform_spark.sources.star_schema import load_table
from konohadataplatform_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from tests.conftest import SF_DIR


SENTINEL = "__sentinel__"


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """Materialize the events table as parquet the stream can tail.

    A single far-future sentinel event is appended so the watermark
    passes every real window and append mode flushes them all (the
    sentinel's own windows stay in state and are never emitted).
    """
    d = str(tmp_path_factory.mktemp("events_stream") / "src")
    ev = load_table(spark, SF_DIR, "events")
    ev.write.parquet(d)
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts, -1, SENTINEL, 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    sentinel.write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_stream(spark, stream_df, tmp_path, name):
    out = str(tmp_path / f"{name}_out")
    ck = str(tmp_path / f"{name}_ck")
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def _stream_events(spark, event_stream_dir):
    schema = spark.read.parquet(event_stream_dir).schema
    return spark.readStream.schema(schema).parquet(event_stream_dir)


def test_tumbling_agg_matches_batch(spark, event_stream_dir, tmp_path):
    stream = _stream_events(spark, event_stream_dir)
    windowed = tumbling_agg(stream, window="1 hour", watermark="0 seconds")
    got = run_stream(spark, windowed, tmp_path, "tumble")

    batch = (
        spark.read.parquet(event_stream_dir)
        .filter(F.col("event_type") != SENTINEL)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    g = {
        (r.window_start, r.event_type): r.n_events
        for r in got.select("window_start", "event_type", "n_events").collect()
    }
    b = {
        (r.window_start, r.event_type): r.n_events
        for r in batch.collect()
    }
    # watermark 0 + availableNow flushes every window except none are
    # held back at end-of-stream, so the maps must match exactly
    assert g == b


def test_sliding_agg_runs(spark, event_stream_dir, tmp_path):
    stream = _stream_events(spark, event_stream_dir)
    got = run_stream(
        spark,
        sliding_agg(stream, window="2 hours", slide="1 hour", watermark="0 seconds"),
        tmp_path,
        "slide",
    )
    assert got.count() > 0
    # each event lands in exactly 2 overlapping windows
    total_events = (
        spark.read.parquet(event_stream_dir)
        .filter(F.col("event_type") != SENTINEL)
        .count()
    )
    assert got.agg(F.sum("n_events")).first()[0] == 2 * total_events


def test_session_agg_runs(spark, event_stream_dir, tmp_path):
    stream = _stream_events(spark, event_stream_dir)
    got = run_stream(
        spark,
        session_agg(stream, gap="30 minutes", watermark="0 seconds"),
        tmp_path,
        "sess",
    )
    assert got.count() > 0
    assert {f.name for f in got.schema.fields} == {
        "user_id",
        "n_events",
        "session_start",
        "session_end",
    }
    # sessions per user must cover all that user's events
    per_user = {r.user_id: r.total for r in got.groupBy("user_id").agg(F.sum("n_events").alias("total")).collect()}
    batch_counts = {
        r.user_id: r.c
        for r in spark.read.parquet(event_stream_dir)
        .filter(F.col("event_type") != SENTINEL)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert per_user == batch_counts


def test_watermarked_dedup_stream(spark, tmp_path):
    """Duplicate deliveries within the watermark are suppressed; state
    stays bounded (dropDuplicatesWithinWatermark)."""
    import datetime as dt
    from konohadataplatform_spark.streaming.windows import watermarked_dedup

    src = tmp_path / "in"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # event 1 delivered three times, event 2 twice, event 3 once
        (1, base, "a"),
        (1, base, "a"),
        (2, base + dt.timedelta(seconds=30), "b"),
        (1, base, "a"),
        (2, base + dt.timedelta(seconds=30), "b"),
        (3, base + dt.timedelta(minutes=2), "c"),
        # far-future sentinel so availableNow flushes everything
        (99, base + dt.timedelta(days=365), "z"),
    ]
    import json
    with open(src / "events.json", "w") as f:
        for eid, ts, v in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts.isoformat(), "v": v}) + "\n")

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, v string")
        .json(str(src))
    )
    deduped = watermarked_dedup(stream, ["event_id"], "ts", "10 minutes")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id for r in spark.read.parquet(out_dir).collect()}
    assert got == {1, 2, 3, 99}
    n = spark.read.parquet(out_dir).count()
    assert n == 4  # each event exactly once


def test_stream_static_enrichment(spark, tmp_path):
    import json
    from konohadataplatform_spark.streaming.windows import enrich_stream

    src = tmp_path / "in"; src.mkdir()
    with open(src / "e.json", "w") as f:
        for i in range(6):
            f.write(json.dumps({"event_id": i, "user_id": i % 3}) + "\n")
    dim = spark.createDataFrame(
        [(0, "bronze"), (1, "silver"), (2, "gold")], "user_id long, tier string"
    )
    stream = spark.readStream.schema("event_id long, user_id long").json(str(src))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        enrich_stream(stream, dim, ["user_id"])
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 6
    assert got.filter(F.col("tier").isNull()).count() == 0
    assert {r.tier for r in got.collect()} == {"bronze", "silver", "gold"}


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases joined to views of the same user within the preceding
    10 minutes — both sides real file streams."""
    import datetime as dt
    import json
    from konohadataplatform_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    vdir.mkdir(); pdir.mkdir()
    views = [
        (1, base),                                 # in window for p1
        (1, base - dt.timedelta(minutes=30)),      # too old
        (2, base + dt.timedelta(minutes=2)),       # in window for p2
        # sentinel far future to flush watermark
        (9, base + dt.timedelta(days=400)),
    ]
    purchases = [
        (1, base + dt.timedelta(minutes=5)),       # matches view@12:00
        (2, base + dt.timedelta(minutes=3)),       # matches view@12:02
        (3, base + dt.timedelta(minutes=1)),       # no view -> no row
        (9, base + dt.timedelta(days=400, minutes=1)),
    ]
    with open(vdir / "v.json", "w") as f:
        for uid, ts in views:
            f.write(json.dumps({"user_id": uid, "ts": ts.isoformat()}) + "\n")
    with open(pdir / "p.json", "w") as f:
        for uid, ts in purchases:
            f.write(json.dumps({"user_id": uid, "ts": ts.isoformat()}) + "\n")

    vs = (
        spark.readStream.schema("user_id long, ts timestamp").json(str(vdir))
        .withColumnRenamed("ts", "view_ts")
    )
    ps = spark.readStream.schema("user_id long, ts timestamp").json(str(pdir))
    joined = stream_stream_interval_join(
        ps, vs, key="user_id", left_ts="ts", right_ts="view_ts"
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out_dir).collect()
    got = {(r[0]) for r in rows}
    matched_users = {r.user_id for r in rows}
    assert 1 in matched_users and 2 in matched_users
    assert 3 not in matched_users


def test_metrics_listener_captures_progress(spark, tmp_path):
    """Micro-batch progress (rows, durations, state size) lands in the
    metrics buffer and round-trips through a catalog table."""
    import json, time as _time
    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.streaming.monitor import (
        attach_metrics_listener,
        save_metrics,
        snapshot_metrics,
    )

    src = tmp_path / "in"; src.mkdir()
    with open(src / "e.json", "w") as f:
        for i in range(20):
            f.write(json.dumps({"id": i}) + "\n")
    listener = attach_metrics_listener(spark)
    try:
        q = (
            spark.readStream.schema("id long").json(str(src))
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .queryName("metrics-probe")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener bus is async — give it a moment to drain
        deadline = _time.time() + 30
        while not listener.records and _time.time() < deadline:
            _time.sleep(0.5)
        assert listener.records, "no progress events captured"
        df = snapshot_metrics(spark, listener)
        rows = df.collect()
        assert sum(r.num_input_rows or 0 for r in rows) == 20
        assert any(r.name == "metrics-probe" for r in rows)
        cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
        save_metrics(spark, cat, listener)
        assert cat.read("_stream_metrics").count() == len(rows)
    finally:
        spark.streams.removeListener(listener)


def test_stream_stream_left_outer_interval_join(spark, tmp_path):
    """leftOuter: unmatched purchases emit with null view columns once
    the watermark closes their interval."""
    import datetime as dt
    import json
    from konohadataplatform_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    vdir.mkdir(); pdir.mkdir()
    with open(vdir / "v.json", "w") as f:
        for uid, ts in [(1, base), (9, base + dt.timedelta(days=400))]:
            f.write(json.dumps({"user_id": uid, "view_ts": ts.isoformat()}) + "\n")
    with open(pdir / "p.json", "w") as f:
        for uid, ts in [
            (1, base + dt.timedelta(minutes=5)),   # matched
            (3, base + dt.timedelta(minutes=1)),   # unmatched
            (9, base + dt.timedelta(days=400, minutes=1)),
        ]:
            f.write(json.dumps({"user_id": uid, "ts": ts.isoformat()}) + "\n")
    vs = spark.readStream.schema("user_id long, view_ts timestamp").json(str(vdir))
    ps = spark.readStream.schema("user_id long, ts timestamp").json(str(pdir))
    j = stream_stream_interval_join(
        ps, vs, key="user_id", left_ts="ts", right_ts="view_ts", how="leftOuter"
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        j.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    m = {r.user_id: r.view_ts for r in spark.read.parquet(out).collect()}
    assert m.get(1) is not None
    assert 3 in m and m[3] is None

"""applyInPandasWithState: state persists across micro-batches and
recovers from the checkpoint on stream restart."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from konohadataplatform_spark.streaming.stateful import running_user_totals


def _write_batch(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _run(spark, src, ck, out):
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(
            lambda df, _i: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_state_accumulates_across_restarts(spark, tmp_path):
    src, ck, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    os.makedirs(src)
    _write_batch(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "value": 10.0},
            {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 1, "value": 5.0},
            {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 2, "value": 1.0},
        ],
    )
    first = _run(spark, src, ck, out)
    got1 = {r.user_id: (r.n_events, r.total_value) for r in first.collect()}
    assert got1 == {1: (2, 15.0), 2: (1, 1.0)}

    # second batch after restart: state must resume from the checkpoint
    _write_batch(
        src,
        "b2.json",
        [
            {"event_id": 4, "ts": "2024-01-01T01:00:00", "user_id": 1, "value": 2.5},
            {"event_id": 5, "ts": "2024-01-01T01:01:00", "user_id": 3, "value": 7.0},
        ],
    )
    second = _run(spark, src, ck, out)
    latest = {
        r.user_id: (r.n_events, r.total_value)
        for r in second.withColumn(
            "rn",
            F.row_number().over(
                __import__(
                    "pyspark.sql.window", fromlist=["Window"]
                ).Window.partitionBy("user_id").orderBy(F.col("last_ts").desc_nulls_last())
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    assert latest[1] == (3, 17.5)  # 2 + 1 events, 15.0 + 2.5
    assert latest[3] == (1, 7.0)
    assert latest[2] == (1, 1.0)  # untouched key, from batch 1 output


def test_transform_with_state_dedupes_across_batches(spark, tmp_path):
    """Runs in EVERY environment: where google.protobuf is functional
    this drives transformWithStateInPandas over RocksDB state; where
    it isn't (this container), dedupe_events_stream transparently
    falls back to the protobuf-free applyInPandasWithState path with
    identical semantics — same API, same output, no skip."""
    from konohadataplatform_spark.streaming.stateful import dedupe_events_stream

    src, ck, out = str(tmp_path / "s2"), str(tmp_path / "ck2"), str(tmp_path / "out2")
    os.makedirs(src)

    def run():
        stream = spark.readStream.schema(SCHEMA).json(src)
        q = (
            dedupe_events_stream(stream)
            .writeStream.foreachBatch(
                lambda df, _i: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    _write_batch(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 1, "value": 2.0},
        ],
    )
    first = run()
    assert sorted((r.user_id, r.event_id) for r in first.collect()) == [(1, 1), (1, 2)]

    # redelivery of event 1 + one new event in a later batch
    _write_batch(
        src,
        "b2.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 1, "value": 3.0},
        ],
    )
    second = run()
    assert sorted((r.user_id, r.event_id) for r in second.collect()) == [
        (1, 1),
        (1, 2),
        (1, 3),
    ]


def test_groupstate_dedupe_across_batches(spark, tmp_path):
    from konohadataplatform_spark.streaming.stateful import dedupe_events_stream_gs

    src, ck, out = str(tmp_path / "s3"), str(tmp_path / "ck3"), str(tmp_path / "out3")
    os.makedirs(src)

    def run():
        stream = spark.readStream.schema(SCHEMA).json(src)
        q = (
            dedupe_events_stream_gs(stream)
            .writeStream.foreachBatch(
                lambda df, _i: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    _write_batch(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 1, "value": 2.0},
        ],
    )
    first = run()
    assert sorted((r.user_id, r.event_id) for r in first.collect()) == [(1, 1), (1, 2)]

    _write_batch(
        src,
        "b2.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "value": 1.0},
            {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 2, "value": 3.0},
        ],
    )
    second = run()
    assert sorted((r.user_id, r.event_id) for r in second.collect()) == [
        (1, 1),
        (1, 2),
        (2, 3),
    ]

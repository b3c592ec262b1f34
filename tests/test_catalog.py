"""Snapshot catalog: commit protocol, time travel, merge, maintenance
(SURVEY §2.10 M1-M7)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Row, functions as F

from konohadataplatform_spark.catalog import SnapshotCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "warehouse"))


def df_of(spark, rows):
    return spark.createDataFrame(rows)


def test_write_read_roundtrip(spark, catalog):
    df = df_of(spark, [Row(id=1, v="a"), Row(id=2, v="b")])
    snap = catalog.write("t", df)
    assert snap.version == 1
    out = catalog.read("t").orderBy("id").collect()
    assert [(r.id, r.v) for r in out] == [(1, "a"), (2, "b")]


def test_time_travel_by_version_and_timestamp(spark, catalog):
    catalog.write("t", df_of(spark, [Row(id=1, v="a")]))
    t1 = catalog.current_snapshot("t").timestamp_ms
    time.sleep(0.01)
    catalog.write("t", df_of(spark, [Row(id=1, v="CHANGED")]))
    assert catalog.read("t", version=1).first().v == "a"
    assert catalog.read("t").first().v == "CHANGED"
    assert catalog.read("t", as_of_timestamp_ms=t1).first().v == "a"
    assert catalog.current_snapshot("t").version == 2


def test_merge_upsert_semantics(spark, catalog):
    catalog.write("t", df_of(spark, [Row(id=1, v="a"), Row(id=2, v="b")]))
    catalog.merge("t", df_of(spark, [Row(id=2, v="B2"), Row(id=3, v="c")]), ["id"])
    out = {r.id: r.v for r in catalog.read("t").collect()}
    assert out == {1: "a", 2: "B2", 3: "c"}
    # idempotent rerun (the dbt incremental rerun property)
    catalog.merge("t", df_of(spark, [Row(id=2, v="B2"), Row(id=3, v="c")]), ["id"])
    out2 = {r.id: r.v for r in catalog.read("t").collect()}
    assert out2 == out
    assert catalog.current_snapshot("t").version == 3


def test_merge_schema_evolution(spark, catalog):
    catalog.write("t", df_of(spark, [Row(id=1, v="a")]))
    catalog.merge("t", df_of(spark, [Row(id=2, v="b", extra=42)]), ["id"])
    out = {r.id: (r.v, r.extra) for r in catalog.read("t").collect()}
    assert out == {1: ("a", None), 2: ("b", 42)}


def test_delete_where(spark, catalog):
    catalog.write("t", df_of(spark, [Row(id=i, v=str(i)) for i in range(5)]))
    catalog.delete_where("t", "id >= 3")
    assert sorted(r.id for r in catalog.read("t").collect()) == [0, 1, 2]


def test_expire_snapshots(spark, catalog):
    for i in range(4):
        catalog.write("t", df_of(spark, [Row(id=i)]))
    hist = catalog.history("t")
    assert len(hist) == 4
    removed = catalog.expire_snapshots("t", keep_last=2)
    assert removed == 2
    assert not os.path.isdir(hist[0].path)
    # current still readable
    assert catalog.read("t").first().id == 3
    with pytest.raises(ValueError):
        catalog.read("t", version=1)


def test_compact(spark, catalog):
    df = spark.range(1000).repartition(16)
    catalog.write("t", df)
    snap = catalog.compact("t", target_files=2)
    files = [
        f
        for f in os.listdir(snap.path)
        if f.endswith(".parquet")
    ]
    assert len(files) == 2
    assert catalog.read("t").count() == 1000


def test_partitioned_write(spark, catalog):
    df = df_of(spark, [Row(id=1, d="2024-01-01"), Row(id=2, d="2024-01-02")])
    snap = catalog.write("t", df, partition_by=["d"])
    assert os.path.isdir(os.path.join(snap.path, "d=2024-01-01"))
    assert catalog.read("t").count() == 2


def test_append_mode(spark, catalog):
    catalog.write("t", df_of(spark, [Row(id=1)]))
    catalog.write("t", df_of(spark, [Row(id=2)]), mode="append")
    assert sorted(r.id for r in catalog.read("t").collect()) == [1, 2]


def test_add_column_and_register_views(spark, catalog):
    catalog.write("t", df_of(spark, [Row(id=1)]))
    catalog.add_column("t", "flag", F.lit(True))
    assert catalog.read("t").first().flag is True
    catalog.register_views()
    assert spark.sql("SELECT flag FROM t").first().flag is True

"""External-engine snapshot export (r13): DuckDB reads OUR catalog
tables — the reference's Trino-reads-Iceberg property
(``trino-config-coordinator.yaml:28-35``), closed via the exported
view DDL in ``konohadataplatform_spark/export.py``.

The round-trip tests run DuckDB OUT-OF-PROCESS (a subprocess with its
own interpreter): a genuinely second engine reading the warehouse
files, not a shared in-memory handle.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import Row

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.export import (
    export_duckdb_sql,
    export_duckdb_views,
    snapshot_manifest,
)


@pytest.fixture()
def catalog(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def _duckdb_rows(ddl: str, query: str) -> list[tuple]:
    """Run the exported DDL + a probe query in a SEPARATE process and
    return sorted row tuples."""
    script = (
        "import duckdb, json, sys\n"
        "con = duckdb.connect()\n"
        "for stmt in sys.argv[1].split(';\\n'):\n"
        "    if stmt.strip():\n"
        "        con.execute(stmt)\n"
        "rows = con.execute(sys.argv[2]).fetchall()\n"
        "print(json.dumps(sorted(str(tuple(r)) for r in rows)))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", script, ddl, query],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


def _s(rows) -> list[str]:
    """Stringified-tuple form (dates/decimals compare as their str)."""
    return sorted(str(tuple(r)) for r in rows)


def test_export_plain_table_out_of_process(spark, catalog):
    catalog.write(
        "t",
        spark.createDataFrame(
            [(1, "a", 10.5), (2, "b", 20.5)], "id long, tag string, v double"
        ),
    )
    ddl = export_duckdb_sql(catalog, "t")
    rows = _duckdb_rows(ddl, "SELECT id, tag, v FROM t ORDER BY id")
    assert rows == _s([(1, "a", 10.5), (2, "b", 20.5)])


def test_export_pins_version_until_reexported(spark, catalog):
    """The exported view names immutable snapshot files: a later
    commit is invisible until re-export — and explicit time travel
    exports any retained version."""
    catalog.write("t", spark.createDataFrame([(1,)], "id long"))
    ddl_v1 = export_duckdb_sql(catalog, "t")
    catalog.write("t", spark.createDataFrame([(2,), (3,)], "id long"))
    # the old export still reads v1's files
    assert _duckdb_rows(ddl_v1, "SELECT id FROM t") == _s([(1,)])
    # re-export reads the new current version
    assert _duckdb_rows(export_duckdb_sql(catalog, "t"),
                        "SELECT id FROM t") == _s([(2,), (3,)])
    # pinned time travel
    assert _duckdb_rows(export_duckdb_sql(catalog, "t", version=1),
                        "SELECT id FROM t") == _s([(1,)])


def test_export_partitioned_table_recovers_partition_column(
    spark, catalog
):
    catalog.write(
        "pt",
        spark.createDataFrame(
            [(1, "x", "2024-01-01"), (2, "y", "2024-01-02"),
             (3, "z", "2024-01-01")],
            "id long, tag string, day string",
        ),
        partition_by=["day"],
    )
    ddl = export_duckdb_sql(catalog, "pt")
    # BOTH engines infer the hive partition value as DATE (Spark
    # partitionColumnTypeInference == DuckDB hive_types_autocast), so
    # compare against Spark's own read
    spark_rows = _s(tuple(r) for r in catalog.read("pt").collect())
    rows = _duckdb_rows(
        ddl, "SELECT id, tag, day FROM pt ORDER BY id"
    )
    assert sorted(rows) == spark_rows and len(rows) == 3


def test_export_applies_metadata_rename_and_drop(spark, catalog):
    catalog.write(
        "e",
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, tag string, secret int"
        ),
    )
    catalog.rename_column("e", "tag", "label")
    catalog.drop_column("e", "secret")
    spark_rows = sorted(
        tuple(r) for r in catalog.read("e").collect()
    )
    ddl = export_duckdb_sql(catalog, "e")
    rows = _duckdb_rows(ddl, "SELECT id, label FROM e ORDER BY id")
    assert rows == _s(spark_rows) == _s([(1, "a"), (2, "b")])
    # the dropped column is really gone from the view schema
    cols = _duckdb_rows(
        ddl,
        "SELECT column_name FROM information_schema.columns "
        "WHERE table_name = 'e' ORDER BY column_name",
    )
    assert cols == _s([("id",), ("label",)])
    # r13 ADVICE: the view's column ORDER matches catalog.read's
    # logical order (rename in place, not appended after the star) —
    # an external SELECT * consumer sees Spark's order
    ordinal = _duckdb_rows(
        ddl,
        "SELECT ordinal_position, column_name "
        "FROM information_schema.columns WHERE table_name = 'e'",
    )
    assert ordinal == _s(
        (i, c) for i, c in enumerate(catalog.read("e").columns, 1)
    )


def test_export_mor_equality_deletes_suppressed(spark, catalog):
    catalog.write(
        "d", spark.createDataFrame([(i, i * 10) for i in range(5)],
                                   "id long, v long")
    )
    catalog.delete_by_keys(
        "d", spark.createDataFrame([Row(id=1), Row(id=3)]), ["id"]
    )
    spark_rows = sorted(tuple(r) for r in catalog.read("d").collect())
    rows = _duckdb_rows(export_duckdb_sql(catalog, "d"),
                        "SELECT id, v FROM d ORDER BY id")
    assert rows == _s(spark_rows) == _s([(0, 0), (2, 20), (4, 40)])


def test_export_mor_upsert_layers_latest_wins(spark, catalog):
    catalog.write(
        "u", spark.createDataFrame([(1, "old"), (2, "old")],
                                   "id long, s string")
    )
    catalog.upsert_by_keys(
        "u", spark.createDataFrame([(2, "new"), (3, "ins")],
                                   "id long, s string"), ["id"]
    )
    catalog.upsert_by_keys(
        "u", spark.createDataFrame([(3, "newer")],
                                   "id long, s string"), ["id"]
    )
    spark_rows = sorted(tuple(r) for r in catalog.read("u").collect())
    rows = _duckdb_rows(export_duckdb_sql(catalog, "u"),
                        "SELECT id, s FROM u ORDER BY id")
    assert rows == _s(spark_rows) == _s(
        [(1, "old"), (2, "new"), (3, "newer")]
    )


def test_export_all_views_script_and_manifest(spark, catalog):
    catalog.write("a", spark.createDataFrame([(1,)], "x long"))
    catalog.write("b", spark.createDataFrame([(2,)], "y long"))
    script = export_duckdb_views(catalog)
    rows = _duckdb_rows(
        script,
        "SELECT (SELECT x FROM a), (SELECT y FROM b)",
    )
    assert rows == _s([(1, 2)])
    m = snapshot_manifest(catalog, "a")
    assert m["table"] == "a" and m["version"] >= 1
    assert m["base_files"] and all(
        f.endswith(".parquet") for f in m["base_files"]
    )
    # the manifest is JSON-able (the engine-neutral contract)
    json.dumps(m)


def test_engine_export_duckdb_facade(spark, tmp_path):
    from konohadataplatform_spark.engine import Engine

    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    eng.save_table("f", spark.createDataFrame([(5,)], "n long"))
    assert _duckdb_rows(eng.export_duckdb("f"),
                        "SELECT n FROM f") == _s([(5,)])
    assert _duckdb_rows(eng.export_duckdb(),
                        "SELECT n FROM f") == _s([(5,)])

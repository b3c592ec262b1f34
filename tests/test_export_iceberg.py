"""Iceberg-layout metadata export (r14): the snapshot must be
plannable by any Iceberg v2 reader from the emitted metadata ALONE —
``vN.metadata.json`` -> Avro manifest list -> Avro manifests -> file
plan — with the catalog's merge-on-read semantics reproduced by the
spec's sequence-number rules (equality deletes apply strictly below
their sequence).

Three layers of proof:
1. STRUCTURE: required spec fields present in the metadata JSON, the
   manifest-list schema, and the manifest-entry schema (with Iceberg
   field-ids riding the embedded Avro schema JSON).
2. PLAN: the reconstructed file plan equals the catalog's own
   snapshot manifest (base/layers/deletes, sequence ordering).
3. CONTENT: replaying the plan with a plain parquet reader + the
   sequence rules yields exactly ``catalog.read``'s rows.
"""

from __future__ import annotations

import json
import os

import pytest

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.export import snapshot_manifest
from konohadataplatform_spark.export_iceberg import (
    export_iceberg_metadata,
    read_iceberg_file_plan,
)
from konohadataplatform_spark.sources.avro_py import read_ocf


@pytest.fixture()
def catalog(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def _mor_table(spark, catalog):
    catalog.write(
        "t",
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ),
    )
    catalog.upsert_by_keys(
        "t", spark.createDataFrame([(2, "B2")], "id long, v string"), ["id"]
    )
    catalog.delete_by_keys(
        "t", spark.createDataFrame([(1,)], "id long"), ["id"]
    )


def test_metadata_json_structure(spark, catalog, tmp_path):
    _mor_table(spark, catalog)
    md_path = export_iceberg_metadata(catalog, "t", str(tmp_path / "ice"))
    md = json.load(open(md_path))
    for key in (
        "format-version", "table-uuid", "location",
        "last-sequence-number", "last-updated-ms", "last-column-id",
        "schemas", "current-schema-id", "partition-specs",
        "default-spec-id", "sort-orders", "default-sort-order-id",
        "current-snapshot-id", "snapshots",
    ):
        assert key in md, key
    assert md["format-version"] == 2
    schema = md["schemas"][md["current-schema-id"]]
    assert schema["type"] == "struct"
    ids = [f["id"] for f in schema["fields"]]
    assert ids == sorted(set(ids)) and md["last-column-id"] >= max(ids)
    snap = md["snapshots"][0]
    assert snap["snapshot-id"] == md["current-snapshot-id"]
    assert os.path.isfile(snap["manifest-list"])
    # version hint present for directory-based readers
    hint = open(os.path.join(os.path.dirname(md_path), "version-hint.text"))
    assert hint.read().strip() == str(snap["snapshot-id"])


def test_manifest_avro_schemas_carry_field_ids(spark, catalog, tmp_path):
    _mor_table(spark, catalog)
    md_path = export_iceberg_metadata(catalog, "t", str(tmp_path / "ice"))
    md = json.load(open(md_path))
    ml_schema, manifests = read_ocf(md["snapshots"][0]["manifest-list"])
    by_name = {f["name"]: f for f in ml_schema["fields"]}
    # v2 required manifest_file fields with their spec ids
    for fname, fid in (
        ("manifest_path", 500), ("manifest_length", 501),
        ("partition_spec_id", 502), ("content", 517),
        ("sequence_number", 515), ("min_sequence_number", 516),
        ("added_snapshot_id", 503), ("added_files_count", 504),
        ("added_rows_count", 512),
    ):
        assert by_name[fname]["field-id"] == fid, fname
    assert manifests, "no manifests"
    for m in manifests:
        e_schema, entries = read_ocf(m["manifest_path"])
        ef = {f["name"]: f for f in e_schema["fields"]}
        assert ef["status"]["field-id"] == 0
        assert ef["data_file"]["field-id"] == 2
        df_fields = {
            f["name"]: f for f in ef["data_file"]["type"]["fields"]
        }
        for fname, fid in (
            ("content", 134), ("file_path", 100), ("file_format", 101),
            ("partition", 102), ("record_count", 103),
            ("file_size_in_bytes", 104), ("equality_ids", 135),
        ):
            assert df_fields[fname]["field-id"] == fid, fname
        # manifest OCF metadata carries the table schema + spec
        raw_meta, _ = read_ocf(m["manifest_path"])
        for e in entries:
            assert e["data_file"]["file_format"] == "PARQUET"
            assert os.path.isfile(e["data_file"]["file_path"])
            assert e["data_file"]["record_count"] >= 0


def test_plan_matches_snapshot_manifest(spark, catalog, tmp_path):
    _mor_table(spark, catalog)
    md_path = export_iceberg_metadata(catalog, "t", str(tmp_path / "ice"))
    plan = read_iceberg_file_plan(md_path)
    man = snapshot_manifest(catalog, "t")
    base = {(os.path.abspath(f), 1) for f in man["base_files"]}
    layers = {
        (os.path.abspath(f), k + 2)
        for k, layer in enumerate(man["upsert_layers"])
        for f in layer["files"]
    }
    assert set(plan["data"]) == base | layers
    top_seq = 1 + len(man["upsert_layers"]) + 1
    del_expected = {
        (os.path.abspath(f), k + 2)
        for k, layer in enumerate(man["upsert_layers"])
        for f in layer["files"]
    } | {(os.path.abspath(f), top_seq) for f in man["delete"]["files"]}
    assert {(p, s) for p, s, _ in plan["deletes"]} == del_expected
    # every delete entry names its equality fields
    assert all(ids for _, _, ids in plan["deletes"])


def _replay_content(md_path: str) -> set[tuple]:
    """Apply the Iceberg v2 sequence rules with a plain parquet reader:
    a data row at sequence s survives unless an equality-delete entry
    at sequence s' > s matches its key fields."""
    import pyarrow.parquet as pq

    md = json.load(open(md_path))
    schema = md["schemas"][md["current-schema-id"]]
    name_by_id = {f["id"]: f["name"] for f in schema["fields"]}
    col_order = [f["name"] for f in schema["fields"]]
    plan = read_iceberg_file_plan(md_path)
    deletes = []  # (seq, key_names, set of key tuples)
    for path, seq, ids in plan["deletes"]:
        keys = [name_by_id[i] for i in ids]
        t = pq.read_table(path)
        keyset = set(zip(*(t.column(k).to_pylist() for k in keys)))
        deletes.append((seq, keys, keyset))
    out = set()
    for path, seq in plan["data"]:
        t = pq.read_table(path)
        cols = {c: t.column(c).to_pylist() for c in t.column_names}
        for i in range(t.num_rows):
            row = {c: cols[c][i] for c in t.column_names}
            dead = any(
                dseq > seq
                and tuple(row[k] for k in keys) in keyset
                for dseq, keys, keyset in deletes
            )
            if not dead:
                out.add(tuple(row.get(c) for c in col_order))
    return out


def test_content_replay_equals_catalog_read(spark, catalog, tmp_path):
    _mor_table(spark, catalog)
    md_path = export_iceberg_metadata(catalog, "t", str(tmp_path / "ice"))
    got = _replay_content(md_path)
    want = {tuple(r) for r in catalog.read("t").collect()}
    assert got == want == {(2, "B2"), (3, "c")}


def test_partitioned_table_partition_records(spark, catalog, tmp_path):
    catalog.write(
        "p",
        spark.createDataFrame(
            [(1, "x", "red"), (2, "y", "blue"), (3, "z", "red")],
            "id long, v string, color string",
        ),
        partition_by=["color"],
    )
    md_path = export_iceberg_metadata(catalog, "p", str(tmp_path / "ice"))
    md = json.load(open(md_path))
    spec = md["partition-specs"][md["default-spec-id"]]
    assert spec["fields"] == [
        {
            "name": "color",
            "transform": "identity",
            "source-id": 3,
            "field-id": 1000,
        }
    ]
    _, manifests = read_ocf(md["snapshots"][0]["manifest-list"])
    parts = set()
    for m in manifests:
        _, entries = read_ocf(m["manifest_path"])
        for e in entries:
            parts.add(e["data_file"]["partition"]["color"])
    assert parts == {"red", "blue"}


def test_rename_emits_name_mapping(spark, catalog, tmp_path):
    catalog.write(
        "r",
        spark.createDataFrame([(1, "a")], "id long, tag string"),
    )
    catalog.rename_column("r", "tag", "label")
    md_path = export_iceberg_metadata(catalog, "r", str(tmp_path / "ice"))
    md = json.load(open(md_path))
    schema = md["schemas"][md["current-schema-id"]]
    assert [f["name"] for f in schema["fields"]] == ["id", "label"]
    mapping = json.loads(md["properties"]["schema.name-mapping.default"])
    label = next(m for m in mapping if "label" in m["names"])
    # the physical (pre-rename) name resolves to the same field id
    assert "tag" in label["names"]


def test_export_is_version_pinned(spark, catalog, tmp_path):
    catalog.write("v", spark.createDataFrame([(1,)], "id long"))
    md1 = export_iceberg_metadata(catalog, "v", str(tmp_path / "ice"))
    plan1 = read_iceberg_file_plan(md1)
    catalog.write("v", spark.createDataFrame([(2,), (3,)], "id long"))
    # the exported metadata keeps reading version 1's files
    assert read_iceberg_file_plan(md1) == plan1
    assert _replay_content(md1) == {(1,)}
    # re-export advances; both metadata versions coexist in the dir
    md2 = export_iceberg_metadata(catalog, "v", str(tmp_path / "ice"))
    assert md2 != md1 and _replay_content(md2) == {(2,), (3,)}
    hint = open(
        os.path.join(os.path.dirname(md2), "version-hint.text")
    ).read()
    assert hint.strip() == "2"


def test_engine_facade(spark, tmp_path):
    from konohadataplatform_spark.engine import Engine

    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    eng.save_table("f", spark.createDataFrame([(1, 2.5)], "id long, x double"))
    md_path = eng.export_iceberg("f", str(tmp_path / "ice"))
    md = json.load(open(md_path))
    types = {
        f["name"]: f["type"]
        for f in md["schemas"][md["current-schema-id"]]["fields"]
    }
    assert types == {"id": "long", "x": "double"}


def test_export_table_to_iceberg_sql_statement(spark, tmp_path):
    """S8 surface: EXPORT TABLE t [VERSION AS OF n] TO ICEBERG 'dir'
    dispatches onto export_iceberg_metadata and returns the
    metadata.json path; the DuckDB form is untouched."""
    from konohadataplatform_spark.engine import Engine

    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    eng.save_table("s", spark.createDataFrame([(1,)], "id long"))
    eng.save_table("s", spark.createDataFrame([(2,)], "id long"))
    out = str(tmp_path / "ice")
    rows = eng.sql(f"EXPORT TABLE s TO ICEBERG '{out}'").collect()
    assert rows[0].table == "s" and rows[0].version == 2
    assert _replay_content(rows[0].metadata_json) == {(2,)}
    # version-pinned form
    rows1 = eng.sql(
        f"EXPORT TABLE s VERSION AS OF 1 TO ICEBERG '{out}'"
    ).collect()
    assert rows1[0].version == 1
    assert _replay_content(rows1[0].metadata_json) == {(1,)}
    # DuckDB form still returns DDL
    ddl = eng.sql("EXPORT TABLE s TO DUCKDB").collect()[0].duckdb_ddl
    assert "CREATE OR REPLACE VIEW" in ddl


def test_partitioned_mor_files_use_unpartitioned_spec(spark, catalog, tmp_path):
    """r14 review: upsert-layer and delete files are written FLAT, so
    under a partitioned table they must carry the unpartitioned spec —
    a compliant reader scopes an identity-partitioned equality delete
    to its own partition tuple, and a null-partition delete under the
    base spec would never apply (resurrecting deleted rows)."""
    catalog.write(
        "pm",
        spark.createDataFrame(
            [(1, "a", "red"), (2, "b", "blue")],
            "id long, v string, color string",
        ),
        partition_by=["color"],
    )
    catalog.upsert_by_keys(
        "pm",
        spark.createDataFrame([(2, "B2", "blue")],
                              "id long, v string, color string"),
        ["id"],
    )
    catalog.delete_by_keys(
        "pm", spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    md_path = export_iceberg_metadata(catalog, "pm", str(tmp_path / "ice"))
    md = json.load(open(md_path))
    specs = {s["spec-id"]: s["fields"] for s in md["partition-specs"]}
    assert [f["name"] for f in specs[0]] == ["color"] and specs[1] == []
    _, manifests = read_ocf(md["snapshots"][0]["manifest-list"])
    for m in manifests:
        _, entries = read_ocf(m["manifest_path"])
        for e in entries:
            in_base = "/_upserts/" not in e["data_file"]["file_path"] and (
                "/_deletes/" not in e["data_file"]["file_path"]
            )
            if in_base:
                assert m["partition_spec_id"] == 0
                assert e["data_file"]["partition"]["color"] is not None
            else:
                assert m["partition_spec_id"] == 1
                assert e["data_file"]["partition"] == {}
    # replay still reproduces the MOR read
    got = _replay_content(md_path)
    want = {tuple(r) for r in catalog.read("pm").collect()}
    assert got == want == {(2, "B2", "blue")}


def test_date_partition_values_days_since_epoch(spark, catalog, tmp_path):
    import datetime

    catalog.write(
        "dp",
        spark.createDataFrame(
            [(1, datetime.date(2024, 1, 2)), (2, datetime.date(1969, 12, 31))],
            "id long, d date",
        ),
        partition_by=["d"],
    )
    md_path = export_iceberg_metadata(catalog, "dp", str(tmp_path / "ice"))
    md = json.load(open(md_path))
    _, manifests = read_ocf(md["snapshots"][0]["manifest-list"])
    vals = set()
    for m in manifests:
        _, entries = read_ocf(m["manifest_path"])
        vals |= {e["data_file"]["partition"]["d"] for e in entries}
    # Iceberg date partition values are days since epoch (1969-12-31 = -1)
    assert vals == {19724, -1}


def test_renamed_partition_column_spec(spark, catalog, tmp_path):
    """The snapshot keeps the PHYSICAL partition dir name after a
    metadata rename; the spec must use the current logical name and
    still parse values from the physical dirs."""
    catalog.write(
        "rp",
        spark.createDataFrame([(1, "red"), (2, "blue")],
                              "id long, color string"),
        partition_by=["color"],
    )
    catalog.rename_column("rp", "color", "hue")
    md_path = export_iceberg_metadata(catalog, "rp", str(tmp_path / "ice"))
    md = json.load(open(md_path))
    spec = md["partition-specs"][0]["fields"][0]
    schema = md["schemas"][0]
    hue_id = next(f["id"] for f in schema["fields"] if f["name"] == "hue")
    assert spec["name"] == "hue" and spec["source-id"] == hue_id
    _, manifests = read_ocf(md["snapshots"][0]["manifest-list"])
    vals = set()
    for m in manifests:
        _, entries = read_ocf(m["manifest_path"])
        vals |= {e["data_file"]["partition"]["hue"] for e in entries}
    assert vals == {"red", "blue"}


def test_read_iceberg_spark_roundtrip(spark, catalog, tmp_path):
    """The other federation direction: Spark reads the exported
    Iceberg metadata (no Iceberg jar) and reproduces catalog.read —
    MOR layers + standalone deletes via the sequence rules."""
    from konohadataplatform_spark.export_iceberg import read_iceberg

    _mor_table(spark, catalog)
    md_path = export_iceberg_metadata(catalog, "t", str(tmp_path / "ice"))
    got = {tuple(r) for r in read_iceberg(spark, md_path).collect()}
    want = {tuple(r) for r in catalog.read("t").collect()}
    assert got == want == {(2, "B2"), (3, "c")}


def test_read_iceberg_partitioned_mor_and_rename(spark, catalog, tmp_path):
    """Partition values come from the MANIFESTS (flat MOR files under
    spec 1 still read correctly), and name mapping resolves physical
    pre-rename parquet columns to the logical schema."""
    import datetime

    from konohadataplatform_spark.export_iceberg import read_iceberg

    catalog.write(
        "pm2",
        spark.createDataFrame(
            [(1, "a", "red"), (2, "b", "blue"), (3, "c", "red")],
            "id long, v string, color string",
        ),
        partition_by=["color"],
    )
    catalog.upsert_by_keys(
        "pm2",
        spark.createDataFrame(
            [(2, "B2", "blue")], "id long, v string, color string"
        ),
        ["id"],
    )
    catalog.delete_by_keys(
        "pm2", spark.createDataFrame([(3,)], "id long"), ["id"]
    )
    catalog.rename_column("pm2", "v", "val")
    md_path = export_iceberg_metadata(catalog, "pm2", str(tmp_path / "i2"))
    got = {tuple(r) for r in read_iceberg(spark, md_path).collect()}
    want = {tuple(r) for r in catalog.read("pm2").collect()}
    assert got == want == {(1, "a", "red"), (2, "B2", "blue")}

    # date partitions read back as real dates
    catalog.write(
        "dp2",
        spark.createDataFrame(
            [(1, datetime.date(2024, 1, 2))], "id long, d date"
        ),
        partition_by=["d"],
    )
    md2 = export_iceberg_metadata(catalog, "dp2", str(tmp_path / "i3"))
    rows = read_iceberg(spark, md2).collect()
    assert rows[0].d == datetime.date(2024, 1, 2)

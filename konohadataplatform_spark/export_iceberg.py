"""Iceberg-layout metadata export (r14, closing VERDICT r13 #4).

:mod:`export` makes a snapshot readable by emitting DuckDB-dialect
DDL; this module emits the snapshot in APACHE ICEBERG'S OWN metadata
layout — ``vN.metadata.json`` + an Avro manifest list + Avro manifest
files, per the public Iceberg table spec (format version 2) — so any
Iceberg-capable engine (Trino, the reference's actual lakehouse
reader: ``infrastructure/apps/trino/base/
trino-config-coordinator.yaml:28-35``) can plan a read of our table
from the metadata alone, no generated per-engine DDL.

Mapping of ``SnapshotCatalog``'s merge-on-read model onto Iceberg v2
sequence-number semantics (equality deletes at sequence N apply to
data files with sequence STRICTLY below N):

- base data files              -> data manifest,  sequence 1
- upsert layer k (oldest = 0)  -> data manifest,  sequence k + 2,
  AND the SAME files as an equality-delete manifest at sequence
  k + 2 with ``equality_ids`` = the layer key columns — the layer's
  own rows survive (strictly-below rule) while matching keys in the
  base and older layers are suppressed: exactly the catalog's
  newest-last latest-wins fold. (The spec allows extra columns in an
  equality delete file; only the ``equality_ids`` fields
  participate.)
- standalone delete-key file   -> equality-delete manifest at the
  top sequence (applies to everything beneath — the catalog's
  global key suppression).

Everything is metadata-only (parquet FOOTERS are read for
record_count/size stats) and version-pinned, like the DuckDB export.
The Avro container files are written by the pure-stdlib
:mod:`sources.avro_py` codec; Iceberg's required ``field-id`` /
``element-id`` attributes ride the embedded schema JSON unchanged.
"""

from __future__ import annotations

import itertools
import json
import os
import uuid

from pyspark.sql import types as T

from konohadataplatform_spark.catalog import Snapshot, SnapshotCatalog
from konohadataplatform_spark.export import _dir_parquet_files
from konohadataplatform_spark.sources.avro_py import (
    hive_partition_values,
    write_ocf,
)

_FORMAT_VERSION = 2


# ---- Iceberg schema JSON from the Spark logical schema --------------------

_PRIMITIVES: list[tuple[type, str]] = [
    (T.LongType, "long"),
    (T.IntegerType, "int"),
    (T.ShortType, "int"),
    (T.ByteType, "int"),
    (T.StringType, "string"),
    (T.DoubleType, "double"),
    (T.FloatType, "float"),
    (T.BooleanType, "boolean"),
    (T.DateType, "date"),
    (T.TimestampType, "timestamptz"),
    (T.TimestampNTZType, "timestamp"),
    (T.BinaryType, "binary"),
]


def _iceberg_type(dt: T.DataType, counter) -> object:
    """Spark type -> Iceberg schema-JSON type (spec §Schemas). Nested
    ids are drawn from ``counter`` pre-order, matching Iceberg's fresh
    assignment."""
    for cls, s in _PRIMITIVES:
        if isinstance(dt, cls):
            return s
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": next(counter),
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _iceberg_type(f.dataType, counter),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": next(counter),
            "element": _iceberg_type(dt.elementType, counter),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": next(counter),
            "key": _iceberg_type(dt.keyType, counter),
            "value-id": next(counter),
            "value": _iceberg_type(dt.valueType, counter),
            "value-required": not dt.valueContainsNull,
        }
    raise ValueError(f"no Iceberg mapping for Spark type {dt}")


def _iceberg_schema(schema: T.StructType) -> tuple[dict, int, dict[str, int]]:
    """(schema-json, last-column-id, top-level name->id)."""
    counter = itertools.count(1)
    top_ids: dict[str, int] = {}
    fields = []
    for f in schema.fields:
        fid = next(counter)
        top_ids[f.name] = fid
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": _iceberg_type(f.dataType, counter),
            }
        )
    last = max(top_ids.values(), default=0)
    # counter may have advanced past top-level ids into nested ids
    last = max(
        last,
        next(counter) - 1,
    )
    return (
        {"type": "struct", "schema-id": 0, "fields": fields},
        last,
        top_ids,
    )


_AVRO_PART_TYPES = {
    "long": "long",
    "int": "int",
    "string": "string",
    "date": "int",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
}


def _partition_fields(
    partition_by: list[str],
    schema_json: dict,
    top_ids: dict[str, int],
    renames: dict | None,
) -> list[dict]:
    """Identity partition-spec fields (the catalog's Hive layout) with
    Iceberg's reserved 1000+ partition field ids. ``partition_by``
    carries the PHYSICAL column names (the Hive dir names); metadata
    renames map them to the current logical names the schema is keyed
    by (``_dir`` keeps the physical name for dir-value parsing)."""
    by_id = {f["id"]: f for f in schema_json["fields"]}
    out = []
    for i, col in enumerate(partition_by):
        cur = (renames or {}).get(col, col)
        src = top_ids.get(cur)
        if src is None:
            raise ValueError(f"partition column {col!r} not in schema")
        ice_t = by_id[src]["type"]
        avro_t = _AVRO_PART_TYPES.get(
            ice_t if isinstance(ice_t, str) else "", "string"
        )
        out.append(
            {
                "name": cur,
                "transform": "identity",
                "source-id": src,
                "field-id": 1000 + i,
                "_avro_type": avro_t,
                "_ice_type": ice_t if isinstance(ice_t, str) else "string",
                "_dir": col,
            }
        )
    return out


# ---- manifest Avro schemas (spec §Manifests / §Manifest Lists) ------------

def _partition_record_schema(pfields: list[dict]) -> dict:
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": pf["name"],
                "type": ["null", pf["_avro_type"]],
                "default": None,
                "field-id": pf["field-id"],
            }
            for pf in pfields
        ],
    }


def _manifest_entry_schema(pfields: list[dict]) -> dict:
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": _partition_record_schema(pfields),
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {
                "name": "equality_ids",
                "type": [
                    "null",
                    {"type": "array", "items": "int", "element-id": 136},
                ],
                "default": None,
                "field-id": 135,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


# ---- file stats + partition values (metadata-only) ------------------------

def _file_stats(path: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows, os.path.getsize(path)


def _partition_value(raw: str | None, avro_type: str, ice_type: str):
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    from urllib.parse import unquote

    # Spark hive-escapes special chars in dir values ('=' -> %3D);
    # the manifest must carry the actual column value, like the
    # catalog's own partition-dir reader
    raw = unquote(raw)
    if ice_type == "date":
        # Iceberg represents date partition values as days since epoch
        from datetime import date

        return (date.fromisoformat(raw) - date(1970, 1, 1)).days
    if avro_type in ("long", "int"):
        return int(raw)
    if avro_type == "boolean":
        return raw.lower() == "true"
    if avro_type in ("double", "float"):
        return float(raw)
    return raw


def _partition_record(
    file_path: str, base_dir: str, pfields: list[dict]
) -> dict:
    rel = os.path.relpath(file_path, base_dir)
    vals = hive_partition_values(rel) if "=" in rel else {}
    return {
        pf["name"]: _partition_value(
            vals.get(pf["_dir"]), pf["_avro_type"], pf["_ice_type"]
        )
        for pf in pfields
    }


# ---- the export ------------------------------------------------------------

def export_iceberg_metadata(
    catalog: SnapshotCatalog,
    name: str,
    out_dir: str,
    version: int | None = None,
) -> str:
    """Write the Iceberg v2 metadata layout for one snapshot under
    ``out_dir`` and return the path of the ``metadata.json``. The data
    files are referenced in place (absolute paths — the spec permits
    absolute URIs); nothing is copied, nothing is scanned."""
    snap: Snapshot = catalog._resolve(name, version, None)
    df = catalog.read(name, version=snap.version)
    schema_json, last_col_id, top_ids = _iceberg_schema(df.schema)
    pfields = _partition_fields(
        list(snap.partition_by or []), schema_json, top_ids, snap.renames
    )
    os.makedirs(out_dir, exist_ok=True)
    snapshot_id = int(snap.version)

    # MOR upsert-layer and delete files are written UNPARTITIONED
    # (flat dirs under _upserts/ and _deletes/) even when the base is
    # hive-partitioned. They must therefore carry the unpartitioned
    # spec: a compliant reader scopes an identity-partitioned equality
    # delete to its own partition tuple, so registering them under the
    # base spec with NULL partition values would stop the deletes from
    # applying (and let partition-filtered scans prune layer data).
    unpart_spec_id = 1 if pfields else 0

    # ---- group files: (content, sequence, files, equality_ids, spec) ----
    groups: list[tuple[str, int, list[str], list[int] | None, int]] = []
    base_files = catalog._base_data_files(snap)
    seq = 1
    groups.append(("data", 1, base_files, None, 0))
    key_ids = [top_ids[c] for c in (snap.upsert_key_cols or []) if c in top_ids]
    for k, layer_rel in enumerate(snap.upsert_layers or []):
        layer_files = _dir_parquet_files(os.path.join(snap.path, layer_rel))
        seq = k + 2
        groups.append(("data", seq, layer_files, None, unpart_spec_id))
        groups.append(("deletes", seq, layer_files, key_ids, unpart_spec_id))
    if snap.delete_path and os.path.isdir(snap.delete_path):
        del_files = _dir_parquet_files(snap.delete_path)
        if del_files:
            seq += 1
            del_ids = [
                top_ids[c]
                for c in (snap.delete_key_cols or [])
                if c in top_ids
            ]
            groups.append(("deletes", seq, del_files, del_ids, unpart_spec_id))
    last_sequence = seq

    # ---- manifest files ----
    spec_fields = [
        {k: v for k, v in pf.items() if not k.startswith("_")}
        for pf in pfields
    ]
    spec_defs: dict[int, list[dict]] = {0: pfields}
    if any(g[4] == 1 for g in groups):
        spec_defs[1] = []
    entry_schemas = {
        sid: _manifest_entry_schema(pf) for sid, pf in spec_defs.items()
    }
    spec_json = {
        sid: json.dumps(
            [
                {k: v for k, v in pf.items() if not k.startswith("_")}
                for pf in pfs
            ]
        )
        for sid, pfs in spec_defs.items()
    }
    list_rows = []
    for gi, (content, g_seq, files, eq_ids, spec_id) in enumerate(groups):
        if not files:
            continue
        m_name = f"manifest-{gi:05d}-{content}.avro"
        m_path = os.path.join(out_dir, m_name)
        g_pfields = spec_defs[spec_id]
        rows = []
        total_rows = 0
        for f in files:
            nrec, fsize = _file_stats(f)
            total_rows += nrec
            rows.append(
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snapshot_id,
                    "sequence_number": g_seq,
                    "file_sequence_number": g_seq,
                    "data_file": {
                        "content": 0 if content == "data" else 2,
                        "file_path": os.path.abspath(f),
                        "file_format": "PARQUET",
                        "partition": _partition_record(
                            f, snap.path, g_pfields
                        ),
                        "record_count": nrec,
                        "file_size_in_bytes": fsize,
                        "equality_ids": eq_ids if content == "deletes" else None,
                    },
                }
            )
        write_ocf(
            m_path,
            entry_schemas[spec_id],
            rows,
            extra_meta={
                "schema": json.dumps(schema_json),
                "partition-spec": spec_json[spec_id],
                "partition-spec-id": str(spec_id),
                "format-version": str(_FORMAT_VERSION),
                "content": "data" if content == "data" else "deletes",
            },
        )
        list_rows.append(
            {
                "manifest_path": os.path.abspath(m_path),
                "manifest_length": os.path.getsize(m_path),
                "partition_spec_id": spec_id,
                "content": 0 if content == "data" else 1,
                "sequence_number": g_seq,
                "min_sequence_number": g_seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": len(rows),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": total_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )

    # ---- manifest list ----
    ml_name = f"snap-{snapshot_id}-1-manifest-list.avro"
    ml_path = os.path.join(out_dir, ml_name)
    write_ocf(
        ml_path,
        _MANIFEST_FILE_SCHEMA,
        list_rows,
        extra_meta={"format-version": str(_FORMAT_VERSION)},
    )

    # ---- table metadata ----
    table_uuid = str(uuid.uuid5(uuid.NAMESPACE_URL, f"kdp-catalog://{name}"))
    metadata = {
        "format-version": _FORMAT_VERSION,
        "table-uuid": table_uuid,
        "location": os.path.abspath(snap.path),
        "last-sequence-number": last_sequence,
        "last-updated-ms": int(snap.timestamp_ms),
        "last-column-id": last_col_id,
        "current-schema-id": 0,
        "schemas": [schema_json],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}]
        + (
            [{"spec-id": 1, "fields": []}] if 1 in spec_defs else []
        ),
        "last-partition-id": 1000 + len(pfields) - 1 if pfields else 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        # our parquet files carry no embedded Iceberg field ids, and
        # metadata renames leave the PHYSICAL column names in place —
        # the spec's name mapping resolves both: every field id lists
        # its current name plus any physical (pre-rename) aliases
        "properties": {
            "schema.name-mapping.default": json.dumps(
                [
                    {
                        "field-id": fid,
                        "names": [cur]
                        + [
                            phys
                            for phys, to in (snap.renames or {}).items()
                            if to == cur and phys != cur
                        ],
                    }
                    for cur, fid in top_ids.items()
                ]
            )
        },
        "current-snapshot-id": snapshot_id,
        "refs": {
            "main": {"snapshot-id": snapshot_id, "type": "branch"}
        },
        "snapshots": [
            {
                "snapshot-id": snapshot_id,
                "sequence-number": last_sequence,
                "timestamp-ms": int(snap.timestamp_ms),
                "manifest-list": os.path.abspath(ml_path),
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [
            {"snapshot-id": snapshot_id, "timestamp-ms": int(snap.timestamp_ms)}
        ],
        "metadata-log": [],
    }
    md_path = os.path.join(out_dir, f"v{snap.version}.metadata.json")
    with open(md_path, "w") as fh:
        json.dump(metadata, fh, indent=2)
    with open(os.path.join(out_dir, "version-hint.text"), "w") as fh:
        fh.write(str(snap.version))
    return md_path


# ---- reader side: plan a read from the exported metadata alone ------------

def read_iceberg_file_plan(metadata_json_path: str) -> dict:
    """Reconstruct the snapshot's read plan FROM THE EXPORTED METADATA
    ONLY (no catalog access): {'data': [(path, seq)], 'deletes':
    [(path, seq, equality_ids)]} for the current snapshot — what any
    Iceberg reader derives before scanning. Used by the round-trip
    tests; also a reference implementation of the consumption side."""
    from konohadataplatform_spark.sources.avro_py import read_ocf

    with open(metadata_json_path) as fh:
        md = json.load(fh)
    cur = md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == cur)
    _, manifests = read_ocf(snap["manifest-list"])
    plan: dict = {"data": [], "deletes": [], "data_entries": [],
                  "delete_entries": []}
    for m in manifests:
        _, entries = read_ocf(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:  # DELETED entries drop out of the scan
                continue
            dfile = e["data_file"]
            entry = {
                "path": dfile["file_path"],
                "seq": e["sequence_number"],
                "spec_id": m["partition_spec_id"],
                "partition": dict(dfile["partition"] or {}),
            }
            if m["content"] == 0:
                plan["data"].append(
                    (dfile["file_path"], e["sequence_number"])
                )
                plan["data_entries"].append(entry)
            else:
                entry["equality_ids"] = list(dfile["equality_ids"] or [])
                plan["deletes"].append(
                    (
                        dfile["file_path"],
                        e["sequence_number"],
                        entry["equality_ids"],
                    )
                )
                plan["delete_entries"].append(entry)
    return plan


def read_iceberg(spark, metadata_json_path: str):
    """Read an Iceberg v2 table INTO SPARK from its metadata alone —
    no Iceberg runtime jar. Supports the layout this module writes and
    the common external case: parquet data files, identity partition
    specs (partition values come from the manifests, not dir
    inference), equality-delete files applied by the sequence rule
    (a delete at sequence s suppresses matching keys at sequences
    strictly below s), and ``schema.name-mapping.default`` for files
    whose physical column names predate a rename.

    The other direction of the S9 federation door: DuckDB already
    reads OUR tables (export.py); this lets our engine read ANY
    Iceberg-capable writer's tables at a pinned snapshot.

    Scale shape: one parquet scan per (sequence, partition-tuple)
    group unioned lazily; each equality-delete group is one LEFT ANTI
    join keyed on its equality columns, applied only to lower
    sequences (the higher-sequence branch passes through untouched).
    Delete files are typically tiny next to data; Spark/AQE picks the
    join strategy.
    """
    import json as _json

    from pyspark.sql import functions as F

    with open(metadata_json_path) as fh:
        md = _json.load(fh)
    schema = next(
        s for s in md["schemas"]
        if s.get("schema-id", 0) == md.get("current-schema-id", 0)
    )
    name_by_id = {f["id"]: f["name"] for f in schema["fields"]}
    col_order = [f["name"] for f in schema["fields"]]
    ice_types = {f["name"]: f["type"] for f in schema["fields"]}
    # physical alias -> current name, from the spec's name mapping
    alias_to_cur: dict[str, str] = {}
    try:
        mapping = _json.loads(
            md.get("properties", {}).get("schema.name-mapping.default", "[]")
        )
        for m in mapping:
            cur = name_by_id.get(m.get("field-id"))
            if cur:
                for alias in m.get("names", []):
                    alias_to_cur[alias] = cur
    except Exception:
        pass

    def _part_lit(name: str, value):
        t = ice_types.get(name, "string")
        if value is None:
            return F.lit(None)
        if t == "date":
            return F.date_add(F.lit("1970-01-01").cast("date"), int(value))
        spark_t = {
            "long": "bigint", "int": "int", "string": "string",
            "double": "double", "float": "float", "boolean": "boolean",
        }.get(t if isinstance(t, str) else "", "string")
        return F.lit(value).cast(spark_t)

    plan = read_iceberg_file_plan(metadata_json_path)

    def _read_group(files: list[str], partition: dict):
        d = spark.read.parquet(*files)
        for phys, cur in alias_to_cur.items():
            if phys != cur and phys in d.columns and cur not in d.columns:
                d = d.withColumnRenamed(phys, cur)
        for pname, pval in partition.items():
            if pname not in d.columns:
                d = d.withColumn(pname, _part_lit(pname, pval))
        return d

    # group data files by (sequence, partition tuple) — one scan each
    groups: dict[tuple, list[str]] = {}
    for e in plan["data_entries"]:
        key = (e["seq"], tuple(sorted(e["partition"].items())))
        groups.setdefault(key, []).append(e["path"])
    if not groups:
        raise ValueError("read_iceberg: snapshot has no data files")
    data = None
    for (seq, part), files in sorted(groups.items()):
        d = _read_group(files, dict(part)).withColumn(
            "_ice_seq", F.lit(int(seq))
        )
        data = d if data is None else data.unionByName(
            d, allowMissingColumns=True
        )

    # equality deletes, grouped by (sequence, equality id tuple)
    del_groups: dict[tuple, list[str]] = {}
    for e in plan["delete_entries"]:
        key = (e["seq"], tuple(e["equality_ids"]))
        del_groups.setdefault(key, []).append(e["path"])
    for (seq, eq_ids), files in sorted(del_groups.items()):
        keys = [name_by_id[i] for i in eq_ids]
        dels = _read_group(files, {}).select(*keys).distinct()
        below = data.where(F.col("_ice_seq") < int(seq)).join(
            dels, keys, "left_anti"
        )
        data = below.unionByName(
            data.where(F.col("_ice_seq") >= int(seq))
        )

    return data.select(
        *[
            (
                F.col(c) if c in data.columns else F.lit(None)
            ).alias(c)
            for c in col_order
        ]
    )

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from konohadataplatform_spark.session import get_spark
from konohadataplatform_spark.sources.star_schema import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="konoha-tests",
        master="local[*]",
        shuffle_partitions=32,
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def canon(v):
    """Canonicalize a value the way an order-insensitive hash would."""
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if v is None or v != v:  # None / NaN / NaT (NaT != NaT)
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # exact double repr — must match bit-for-bit
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    """Sort columns by name then rows by canonical string (driver-style)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("|".join(canon(r[i]) for i in order))
    return sorted(cols), sorted(out)


def assert_oracle_match(spark_df, duck_con, oracle_sql, name=""):
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(oracle_sql).fetchdf()
    scols = sorted(c.lower() for c in sdf.columns)
    dcols = sorted(c.lower() for c in ddf.columns)
    assert scols == dcols, f"{name}: column mismatch spark={scols} duck={dcols}"
    s_cols, s_rows = rowset(
        [c.lower() for c in sdf.columns], sdf.itertuples(index=False, name=None)
    )
    d_cols, d_rows = rowset(
        [c.lower() for c in ddf.columns], ddf.itertuples(index=False, name=None)
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} rows differ; first: "
        f"spark={mismatches[0][0]!r} duck={mismatches[0][1]!r}"
    )

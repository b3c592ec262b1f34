"""r12 wire-door load test (r11 verdict ask #7): N concurrent clients
x M mixed statements (temp views, catalog DDL, reads, per-session
conf) across ALL FOUR doors at once — HS2 Thrift, pgwire, REST, and
line-JSON — against ONE engine. Pins the per-session catalog-version
re-registration under contention: every client's DDL bumps the shared
catalog version while other sessions keep resolving their own temp
views and the shared tables."""

from __future__ import annotations

import concurrent.futures as cf
import json
import socket
import urllib.request

import pytest

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.engine import Engine
from konohadataplatform_spark.hs2 import Hs2Client, Hs2Server
from konohadataplatform_spark.pgwire import PgWireServer, pg_query
from konohadataplatform_spark.restserver import RestSqlServer
from konohadataplatform_spark.sqlserver import SqlServer


@pytest.fixture()
def doors(spark, tmp_path):
    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    srvs = [
        Hs2Server(eng).start(),
        PgWireServer(eng).start(),
        RestSqlServer(eng).start(),
        SqlServer(eng).start(),
    ]
    yield dict(zip(["hs2", "pg", "rest", "tcp"], srvs)), eng
    for s in srvs:
        s.stop()


def _http(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method=method,
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read().decode())


def _run_hs2(port, tag):
    c = Hs2Client(port)
    c.open_session()
    try:
        c.execute(f"CREATE OR REPLACE TEMP VIEW wv AS SELECT {tag} AS x")
        c.execute(f"CREATE TABLE wd_hs2_{tag} AS SELECT {tag} AS v")
        _cols, rows = c.execute("SELECT x FROM wv")
        _cols, n = c.execute(f"SELECT COUNT(*) AS n FROM wd_hs2_{tag}")
        c.execute(f"SET spark.sql.shuffle.partitions={tag + 2}")
        _cols, again = c.execute("SELECT x FROM wv")
        return rows[0][0], n[0][0], again[0][0]
    finally:
        c.close()


def _run_pg(port, tag):
    # one connection = one session: the whole script rides one call
    _c, rows, err = pg_query(
        port,
        f"CREATE TEMP VIEW wv AS SELECT {tag} AS x; "
        f"CREATE TABLE wd_pg_{tag} AS SELECT {tag} AS v; "
        "SELECT x FROM wv",
    )
    assert err is None, err
    # multi-statement responses concatenate result rows (the CTAS
    # status row precedes the SELECT's row) — take the last
    return int(rows[-1][0])


def _run_rest(port, tag):
    sid = _http(port, "POST", "/api/v1/sessions")["identifier"]

    def stmt(sql):
        doc = _http(
            port, "POST",
            f"/api/v1/sessions/{sid}/operations/statement",
            {"statement": sql},
        )
        return _http(
            port, "GET", f"/api/v1/operations/{doc['identifier']}/rowset"
        )

    try:
        stmt(f"CREATE OR REPLACE TEMP VIEW wv AS SELECT {tag} AS x")
        stmt(f"CREATE TABLE wd_rest_{tag} AS SELECT {tag} AS v")
        first = stmt("SELECT x FROM wv")["rows"][0][0]
        stmt(f"SET spark.sql.shuffle.partitions={tag + 2}")
        again = stmt("SELECT x FROM wv")["rows"][0][0]
        return first, again
    finally:
        _http(port, "DELETE", f"/api/v1/sessions/{sid}")


def _run_tcp(port, tag):
    sqls = [
        f"CREATE OR REPLACE TEMP VIEW wv AS SELECT {tag} AS x",
        f"CREATE TABLE wd_tcp_{tag} AS SELECT {tag} AS v",
        "SELECT x FROM wv",
        f"SET spark.sql.shuffle.partitions={tag + 2}",
        "SELECT x FROM wv",
    ]
    out = []
    with socket.create_connection(("127.0.0.1", port), timeout=120) as s:
        f = s.makefile("rwb")
        for q in sqls:
            f.write(json.dumps({"sql": q}).encode() + b"\n")
            f.flush()
            out.append(json.loads(f.readline().decode()))
    assert all(o.get("ok") for o in out), out
    return out[2]["rows"][0][0], out[4]["rows"][0][0]


def test_four_door_concurrent_load(doors, spark):
    srvs, eng = doors
    jobs = []
    with cf.ThreadPoolExecutor(8) as ex:
        for tag in (11, 12):
            jobs.append(("hs2", tag, ex.submit(_run_hs2, srvs["hs2"].port, tag)))
            jobs.append(("pg", tag, ex.submit(_run_pg, srvs["pg"].port, tag)))
            jobs.append(("rest", tag, ex.submit(_run_rest, srvs["rest"].port, tag)))
            jobs.append(("tcp", tag, ex.submit(_run_tcp, srvs["tcp"].port, tag)))
        results = {(d, t): f.result(300) for d, t, f in jobs}

    # per-session temp views never crossed sessions, even while other
    # clients' DDL bumped the catalog version mid-script
    for tag in (11, 12):
        assert results[("hs2", tag)] == (tag, 1, tag)
        assert results[("pg", tag)] == tag
        assert results[("rest", tag)] == (tag, tag)
        assert results[("tcp", tag)] == (tag, tag)

    # every catalog table written through any door is visible to all:
    # spot-check one foreign table per door, plus the global count
    for door in ("hs2", "pg", "rest", "tcp"):
        for tag in (11, 12):
            out = eng.sql(f"SELECT v FROM wd_{door}_{tag}").collect()
            assert [r["v"] for r in out] == [tag]
    _c, rows, err = pg_query(
        srvs["pg"].port, "SELECT COUNT(*) AS n FROM wd_hs2_11"
    )
    assert err is None and rows == [["1"]]

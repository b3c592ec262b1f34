"""HTTP/REST SQL endpoint (the Kyuubi :10099 REST listener analog —
docs/components/kyuubi.md:11-12): stdlib-urllib round-trips against a
real HTTP server — SELECT, DML + time travel, truncation guard, error
status codes, the Kyuubi-v1 session/operation flow, and concurrent
clients sharing one engine."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.engine import Engine
from konohadataplatform_spark.restserver import RestSqlServer, rest_request


@pytest.fixture()
def server(spark, tmp_path):
    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    srv = RestSqlServer(eng).start()
    yield srv, eng
    srv.stop()


def _http(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method=method,
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_post_sql_roundtrip(server):
    srv, _eng = server
    out = rest_request(
        srv.port, "SELECT 1 AS x, 'a' AS s, CAST(2.5 AS DOUBLE) AS d"
    )
    assert out["ok"] and out["columns"] == ["x", "s", "d"]
    assert out["types"] == ["int", "string", "double"]
    assert out["rows"] == [[1, "a", 2.5]]
    assert out["truncated"] is False


def test_get_sql_query_param(server):
    srv, _eng = server
    status, out = _http(
        srv.port, "GET", "/sql?q=SELECT%20id%20FROM%20range(5)&limit=3"
    )
    assert status == 200 and out["row_count"] == 3 and out["truncated"]


def test_dml_and_time_travel_over_http(server, spark):
    srv, eng = server
    eng.save_table(
        "m", spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    )
    out = rest_request(srv.port, "UPDATE m SET v = v * 2 WHERE id = 1")
    assert out["ok"], out
    got = rest_request(srv.port, "SELECT v FROM m ORDER BY id")
    assert got["rows"] == [[20.0], [20.0]]
    v1 = rest_request(
        srv.port, "SELECT v FROM m FOR VERSION AS OF 1 ORDER BY id"
    )
    assert v1["rows"] == [[10.0], [20.0]]


def test_sql_error_is_http_400_with_json_body(server):
    srv, _eng = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        rest_request(srv.port, "SELECT FROM nope nope")
    assert ei.value.code == 400
    body = json.loads(ei.value.read().decode())
    assert body["ok"] is False and body["error"]


def test_missing_sql_is_http_400(server):
    srv, _eng = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _http(srv.port, "POST", "/sql", {"nope": 1})
    assert ei.value.code == 400


def test_unknown_route_is_404(server):
    srv, _eng = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _http(srv.port, "GET", "/api/v2/whatever")
    assert ei.value.code == 404


def test_kyuubi_v1_session_flow(server):
    """ping -> open session -> run statement -> poll event -> fetch
    rowset -> close session (operations are garbage-collected with the
    session)."""
    srv, _eng = server
    status, pong = _http(srv.port, "GET", "/api/v1/ping")
    assert status == 200 and pong == "pong"

    _s, sess = _http(srv.port, "POST", "/api/v1/sessions", {})
    sid = sess["identifier"]
    _s, op = _http(
        srv.port, "POST", f"/api/v1/sessions/{sid}/operations/statement",
        {"statement": "SELECT id * 2 AS y FROM range(3) ORDER BY id"},
    )
    oid = op["identifier"]
    _s, ev = _http(srv.port, "GET", f"/api/v1/operations/{oid}/event")
    assert ev["state"] == "FINISHED"
    _s, rs = _http(srv.port, "GET", f"/api/v1/operations/{oid}/rowset")
    assert rs["columns"] == ["y"] and rs["rows"] == [[0], [2], [4]]

    _s, _ = _http(srv.port, "DELETE", f"/api/v1/sessions/{sid}")
    with pytest.raises(urllib.error.HTTPError) as ei:
        _http(srv.port, "GET", f"/api/v1/operations/{oid}/rowset")
    assert ei.value.code == 404


def test_statement_error_reported_via_event(server):
    srv, _eng = server
    _s, sess = _http(srv.port, "POST", "/api/v1/sessions", {})
    sid = sess["identifier"]
    _s, op = _http(
        srv.port, "POST", f"/api/v1/sessions/{sid}/operations/statement",
        {"statement": "SELECT FROM broken"},
    )
    _s, ev = _http(
        srv.port, "GET", f"/api/v1/operations/{op['identifier']}/event"
    )
    assert ev["state"] == "ERROR" and ev["error"]


def test_concurrent_clients_share_engine(server):
    srv, _eng = server
    results = {}

    def go(i):
        results[i] = rest_request(
            srv.port, f"SELECT {i} AS tag, COUNT(*) AS n FROM range(1000)"
        )

    threads = [threading.Thread(target=go, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(
        results[i]["ok"] and results[i]["rows"] == [[i, 1000]]
        for i in range(6)
    )


def test_rest_session_isolation(server):
    """r11: each Kyuubi-v1 REST session carries a SessionEngine —
    same-named temp views in two sessions never collide; the
    sessionless /sql shortcut stays on the shared engine."""
    srv, _eng = server

    def stmt(sid, sql):
        _s, doc = _http(
            srv.port, "POST",
            f"/api/v1/sessions/{sid}/operations/statement",
            {"statement": sql},
        )
        _s2, rs = _http(
            srv.port, "GET", f"/api/v1/operations/{doc['identifier']}/rowset"
        )
        return rs

    _s, a = _http(srv.port, "POST", "/api/v1/sessions")
    _s, b = _http(srv.port, "POST", "/api/v1/sessions")
    sa, sb = a["identifier"], b["identifier"]
    stmt(sa, "CREATE OR REPLACE TEMP VIEW rv AS SELECT 1 AS x")
    stmt(sb, "CREATE OR REPLACE TEMP VIEW rv AS SELECT 2 AS x")
    assert stmt(sa, "SELECT x FROM rv")["rows"] == [[1]]
    assert stmt(sb, "SELECT x FROM rv")["rows"] == [[2]]
    # per-session SQL conf
    stmt(sa, "SET spark.sql.shuffle.partitions=7")
    assert stmt(sa, "SET spark.sql.shuffle.partitions")["rows"][0][1] == "7"
    assert stmt(sb, "SET spark.sql.shuffle.partitions")["rows"][0][1] != "7"
    _http(srv.port, "DELETE", f"/api/v1/sessions/{sa}")
    _http(srv.port, "DELETE", f"/api/v1/sessions/{sb}")

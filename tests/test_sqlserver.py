"""Network SQL endpoint (the Kyuubi :10009 analog): line-JSON protocol
over Engine.sql — shared session, DML dispatch, truncation guard,
error surfaces, concurrent clients."""

from __future__ import annotations

import json
import socket
import threading

import pytest
from pyspark.sql import Row

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.engine import Engine
from konohadataplatform_spark.sqlserver import SqlServer, sql_request


@pytest.fixture()
def server(spark, tmp_path):
    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    srv = SqlServer(eng).start()
    yield srv, eng
    srv.stop()


def test_select_roundtrip(server):
    srv, _eng = server
    out = sql_request(srv.port, "SELECT 1 AS x, 'a' AS s, CAST(2.5 AS DOUBLE) AS d")
    assert out["ok"] and out["columns"] == ["x", "s", "d"]
    assert out["types"] == ["int", "string", "double"]
    assert out["rows"] == [[1, "a", 2.5]]
    assert out["truncated"] is False


def test_shared_session_and_dml_dispatch(server, spark):
    """A view registered by one client is visible to the next (SERVER
    share level), and DML routes onto the catalog like Engine.sql."""
    srv, eng = server
    eng.save_table(
        "m", spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    )
    out = sql_request(srv.port, "UPDATE m SET v = v * 2 WHERE id = 1")
    assert out["ok"], out
    got = sql_request(srv.port, "SELECT v FROM m ORDER BY id")
    assert got["rows"] == [[20.0], [20.0]]
    # time travel over the wire
    v1 = sql_request(srv.port, "SELECT v FROM m FOR VERSION AS OF 1 ORDER BY id")
    assert v1["rows"] == [[10.0], [20.0]]


def test_limit_truncation(server, spark):
    srv, _eng = server
    out = sql_request(srv.port, "SELECT id FROM range(100)", limit=7)
    assert out["row_count"] == 7 and out["truncated"] is True


def test_error_surface(server):
    srv, _eng = server
    out = sql_request(srv.port, "SELECT FROM nope nope")
    assert out["ok"] is False and out["error_class"]
    assert "error" in out
    # server survives the error
    assert sql_request(srv.port, "SELECT 1 AS one")["rows"] == [[1]]


def test_pipelined_requests_one_connection(server):
    srv, _eng = server
    with socket.create_connection(("127.0.0.1", srv.port), timeout=60) as s:
        payload = b"".join(
            json.dumps({"sql": f"SELECT {i} AS n"}).encode() + b"\n"
            for i in range(3)
        )
        s.sendall(payload)
        buf = b""
        while buf.count(b"\n") < 3:
            buf += s.recv(65536)
    results = [json.loads(l) for l in buf.decode().strip().split("\n")]
    assert [r["rows"][0][0] for r in results] == [0, 1, 2]


def test_concurrent_clients(server):
    srv, _eng = server
    results, errors = {}, []

    def client(i: int) -> None:
        try:
            out = sql_request(srv.port, f"SELECT sum(id) AS s FROM range({i + 1})")
            results[i] = out["rows"][0][0]
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert results == {i: i * (i + 1) // 2 for i in range(6)}


def test_jsonable_exotic_types(server):
    srv, _eng = server
    out = sql_request(
        srv.port,
        "SELECT CAST(1.50 AS DECIMAL(5,2)) AS dec, DATE'2024-01-02' AS d, "
        "TIMESTAMP'2024-01-02 03:04:05' AS ts, X'00FF' AS bin, "
        "array(1, 2) AS arr, named_struct('a', 1) AS st",
    )
    assert out["ok"], out
    dec, d, ts, bin_, arr, st = out["rows"][0]
    assert dec == "1.50" and d == "2024-01-02"
    assert ts.startswith("2024-01-02T03:04:05")
    import base64
    assert base64.b64decode(bin_) == b"\x00\xff"
    assert arr == [1, 2] and st == {"a": 1}


def test_cli_subprocess_end_to_end(tmp_path):
    """The __main__ CLI boots a real server in a separate process (its
    own SparkSession) and serves queries over TCP — the full external-
    user path: start the endpoint, point a client at it."""
    import os
    import re
    import subprocess
    import sys
    import time as _time

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "2")
    proc = subprocess.Popen(
        [sys.executable, "-m", "konohadataplatform_spark.sqlserver",
         "--warehouse", str(tmp_path / "wh"), "--port", "0",
         "--sf-dir", "/root/testdata/sf0.001"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        port = None
        deadline = _time.time() + 120
        for line in proc.stdout:
            m = re.search(r"listening on [\d.]+:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
            if _time.time() > deadline:  # pragma: no cover
                break
        assert port, "server never reported its port"
        out = sql_request(port, "SELECT count(*) AS n FROM region")
        assert out["ok"] and out["rows"] == [[5]]
        out = sql_request(
            port,
            "CREATE TABLE r2 AS SELECT r_regionkey FROM region WHERE r_regionkey < 2",
        )
        assert out["ok"], out
        assert sql_request(port, "SELECT count(*) AS n FROM r2")["rows"] == [[2]]
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_per_connection_session_isolation(server):
    """r11: each TCP connection gets a SessionEngine clone — the same
    temp-view name on two concurrent connections never collides, and
    catalog tables stay shared (mirror of test_hs2's)."""
    srv, _eng = server

    def pipelined(sqls):
        out = []
        with socket.create_connection(("127.0.0.1", srv.port), timeout=120) as s:
            f = s.makefile("rwb")
            for q in sqls:
                f.write(json.dumps({"sql": q}).encode() + b"\n")
                f.flush()
                out.append(json.loads(f.readline().decode()))
        return out

    import concurrent.futures as cf

    sqls_a = [
        "CREATE OR REPLACE TEMP VIEW sv AS SELECT 1 AS x",
        "SELECT x FROM sv",
        "SET spark.sql.shuffle.partitions=7",
        "SET spark.sql.shuffle.partitions",
    ]
    sqls_b = [
        "CREATE OR REPLACE TEMP VIEW sv AS SELECT 2 AS x",
        "SELECT x FROM sv",
        "SET spark.sql.shuffle.partitions",
    ]
    with cf.ThreadPoolExecutor(2) as ex:
        fa = ex.submit(pipelined, sqls_a)
        fb = ex.submit(pipelined, sqls_b)
        a, b = fa.result(120), fb.result(120)
    assert a[1]["rows"] == [[1]]
    assert b[1]["rows"] == [[2]]
    assert a[3]["rows"][0][1] == "7"
    assert b[2]["rows"][0][1] != "7"


def test_session_isolation_catalog_tables_shared(server, spark):
    srv, eng = server
    eng.save_table(
        "shared_t", spark.createDataFrame([(42,)], "v long")
    )
    # a fresh connection's SessionEngine sees the committed table
    out = sql_request(srv.port, "SELECT v FROM shared_t")
    assert out["ok"] and out["rows"] == [[42]]

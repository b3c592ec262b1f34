"""HiveServer2 Thrift endpoint: a beeline-shaped client flow
(SASL PLAIN or noSasl -> OpenSession -> ExecuteStatement ->
GetResultSetMetadata -> FetchResults -> Close*) against the Spark
engine — the reference's actual public protocol
(``jdbc:hive2://…:10009``, docs/components/kyuubi.md:61-67,
dbt/profiles.yml method: thrift)."""

from __future__ import annotations

import pytest

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.engine import Engine
from konohadataplatform_spark.hs2 import Hs2Client, Hs2Server


@pytest.fixture()
def server(spark, tmp_path):
    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    eng.save_table(
        "t",
        spark.createDataFrame(
            [(1, "a", 1.5, True, None), (2, "b", 2.5, False, "x")],
            "id long, s string, d double, b boolean, n string",
        ),
    )
    srv = Hs2Server(eng).start()
    yield srv
    srv.stop()


def _connect(server, use_sasl=True):
    c = Hs2Client(server.port, use_sasl=use_sasl)
    c.open_session()
    return c


@pytest.mark.parametrize("use_sasl", [True, False])
def test_execute_and_fetch_roundtrip(server, use_sasl):
    """Both transports beeline can use: default SASL PLAIN and
    ;auth=noSasl raw binary."""
    c = _connect(server, use_sasl=use_sasl)
    try:
        cols, rows = c.execute("SELECT id, s, d, b, n FROM t ORDER BY id")
        assert cols == ["id", "s", "d", "b", "n"]
        assert rows == [(1, "a", 1.5, True, None), (2, "b", 2.5, False, "x")]
    finally:
        c.close()


def test_typed_columns_and_nulls(server):
    """Columnar TRowSet: typed columns come back in their native
    TColumn slot; NULLs ride the bitmask (not sentinel values)."""
    c = _connect(server)
    try:
        cols, rows = c.execute(
            "SELECT CAST(NULL AS BIGINT) AS a, CAST(7 AS INT) AS b,"
            " CAST(2.5 AS DOUBLE) AS d, true AS f,"
            " CAST(1.25 AS DECIMAL(10,2)) AS m"
        )
        assert cols == ["a", "b", "d", "f", "m"]
        assert rows == [(None, 7, 2.5, True, "1.25")]
    finally:
        c.close()


def test_fetch_paging(server, spark):
    """FetchResults pages by maxRows with hasMoreRows until drained."""
    server.engine.save_table(
        "big", spark.range(0, 2500).selectExpr("id", "id * 2 AS v")
    )
    c = _connect(server)
    try:
        cols, rows = c.execute("SELECT id, v FROM big ORDER BY id")
        assert len(rows) == 2500  # client pages at 1000/fetch
        assert rows[0] == (0, 0) and rows[-1] == (2499, 4998)
    finally:
        c.close()


def test_error_surfaces_as_status_and_session_survives(server):
    c = _connect(server)
    try:
        with pytest.raises(RuntimeError, match="(?i)missing_table"):
            c.execute("SELECT * FROM missing_table")
        cols, rows = c.execute("SELECT count(*) AS n FROM t")
        assert rows == [(2,)]
    finally:
        c.close()


def test_dml_through_thrift(server):
    """The dbt-over-thrift shape: DDL/DML statements (no result set)
    then a query against the written table."""
    c = _connect(server)
    try:
        c.execute("CREATE TABLE hs2_out AS SELECT id, s FROM t WHERE id = 1")
        cols, rows = c.execute("SELECT * FROM hs2_out")
        assert rows == [(1, "a")]
    finally:
        c.close()


def test_metadata_calls(server):
    """GetInfo / GetTables / GetSchemas — what JDBC tooling calls on
    connect."""
    from konohadataplatform_spark.hs2 import T_I32, T_STRUCT

    c = _connect(server)
    try:
        info = c.call("GetInfo", {1: (T_STRUCT, {
            1: c.session, 2: (T_I32, 17),
        })})
        assert info[2][1][1][1].decode() == "Spark SQL"
        # GetTables returns a result-set operation listing 't'
        resp = c.call("GetTables", {1: (T_STRUCT, {1: c.session})})
        op = resp[2]
        meta = c.call("GetResultSetMetadata", {1: (T_STRUCT, {1: op})})
        names = [x[1][1].decode() for x in meta[2][1][1][1][1]]
        assert names[:3] == ["TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME"]
    finally:
        c.close()


def test_keyless_metadata_calls_return_empty_sets(server):
    """GetFunctions / GetPrimaryKeys / GetCrossReference: BI clients
    probe these at connect; they must return empty result sets with
    the java.sql column layout, not thrift exceptions."""
    from konohadataplatform_spark.hs2 import T_STRUCT

    c = _connect(server)
    try:
        for method, first_col in [
            ("GetFunctions", "FUNCTION_CAT"),
            ("GetPrimaryKeys", "TABLE_CAT"),
            ("GetCrossReference", "PKTABLE_CAT"),
        ]:
            resp = c.call(method, {1: (T_STRUCT, {1: c.session})})
            assert resp[1][1][1][1] == 0, method  # TStatus SUCCESS
            op = resp[2]
            meta = c.call("GetResultSetMetadata", {1: (T_STRUCT, {1: op})})
            names = [x[1][1].decode() for x in meta[2][1][1][1][1]]
            assert names[0] == first_col, method
            fetched = c.call("FetchResults", {1: (T_STRUCT, {1: op})})
            assert fetched[1][1][1][1] == 0, method  # fetch SUCCESS
            assert fetched[2][1] is False, method  # no more rows
            assert fetched[3][1][2][1][1] == [], method  # TRowSet.rows empty
    finally:
        c.close()


def test_concurrent_sessions(server):
    """Two threaded connections execute interleaved statements."""
    import threading

    out = {}

    def run(tag, sql):
        c = _connect(server)
        try:
            out[tag] = c.execute(sql)[1]
        finally:
            c.close()

    ts = [
        threading.Thread(target=run, args=("a", "SELECT 1 AS x")),
        threading.Thread(target=run, args=("b", "SELECT 2 AS x")),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(60)
    assert out == {"a": [(1,)], "b": [(2,)]}


def test_rowset_carries_required_rows_field(server):
    """Review regression: TRowSet.rows (field 2) is REQUIRED in
    TCLIService.thrift — stock thrift-generated clients validate() and
    throw if it is absent, even though V6+ clients read field 3."""
    from konohadataplatform_spark.hs2 import T_I16, T_I64, T_STRUCT

    c = _connect(server)
    try:
        resp = c.call("ExecuteStatement", {1: (T_STRUCT, {
            1: c.session, 2: (11, "SELECT 1 AS x"),
        })})
        c._check(resp)
        op = resp[2]
        fr = c.call("FetchResults", {1: (T_STRUCT, {
            1: op, 2: (T_I16, 0), 3: (T_I64, 10),
        })})
        rowset = fr[3][1]
        assert 2 in rowset, "required TRowSet.rows field missing"
        assert 3 in rowset  # columnar payload still present
    finally:
        c.close()


def test_session_close_reaps_operations(server):
    """Review regression: ops hold up to `limit` collected rows —
    CloseSession must drop the session's operations, and a vanished
    connection must reap its sessions."""
    c = _connect(server)
    c.execute("SELECT 1 AS x")  # execute+close pairs clean up
    # leave an op open deliberately
    from konohadataplatform_spark.hs2 import T_STRUCT

    resp = c.call("ExecuteStatement", {1: (T_STRUCT, {
        1: c.session, 2: (11, "SELECT * FROM t"),
    })})
    assert len(server._ops) == 1
    c.close()  # CloseSession
    assert server._ops == {} and server._sessions == {}

    # connection dropped WITHOUT CloseSession: reaped on disconnect
    c2 = _connect(server)
    c2.call("ExecuteStatement", {1: (T_STRUCT, {
        1: c2.session, 2: (11, "SELECT * FROM t"),
    })})
    assert len(server._ops) == 1
    # vanish: shutdown forces the FIN even though the client's makefile
    # objects still hold a reference to the socket
    import socket as _socket

    c2._sock.shutdown(_socket.SHUT_RDWR)
    c2._sock.close()
    import time as _time
    for _ in range(100):
        if not server._ops and not server._sessions:
            break
        _time.sleep(0.05)
    assert server._ops == {} and server._sessions == {}


def test_pre_v6_client_rejected(server):
    """Clients below protocol V6 can't read columnar rowsets; the
    server must refuse the session instead of serving empty results."""
    from konohadataplatform_spark.hs2 import T_I32, T_STRUCT, Hs2Client

    c = Hs2Client(server.port)
    try:
        resp = c.call("OpenSession", {1: (T_STRUCT, {
            1: (T_I32, 3),  # V4
            2: (11, "old-client"),
        })})
        with pytest.raises(RuntimeError, match="V6"):
            c._check(resp)
    finally:
        c._sock.close()


def test_zero_length_sasl_frame_is_eof_not_spin(server):
    """Review regression: a 0-length SASL data frame must close the
    connection, not busy-loop a server thread at 100% CPU."""
    import socket as _socket
    import struct as _struct

    s = _socket.create_connection(("127.0.0.1", server.port), timeout=10)
    try:
        # SASL PLAIN handshake
        for status, payload in ((1, b"PLAIN"), (2, b"\x00a\x00b")):
            s.sendall(bytes([status]) + _struct.pack(">i", len(payload)) + payload)
        head = s.recv(5)
        assert head[0] == 5  # COMPLETE
        # poison frame: declared length 0
        s.sendall(_struct.pack(">i", 0))
        s.settimeout(10)
        assert s.recv(1) == b""  # server closed the connection
    finally:
        s.close()


def test_get_columns(server):
    """JDBC DatabaseMetaData.getColumns over the session catalog."""
    from konohadataplatform_spark.hs2 import T_I16, T_I64, T_STRUCT

    c = _connect(server)
    try:
        resp = c.call("GetColumns", {1: (T_STRUCT, {
            1: c.session, 4: (11, "t"),
        })})
        c._check(resp)
        op = resp[2]
        fr = c.call("FetchResults", {1: (T_STRUCT, {
            1: op, 2: (T_I16, 0), 3: (T_I64, 100),
        })})
        c._check(fr)
        cols_out = []
        for tcol in fr[3][1][3][1][1]:
            colid = next(iter(tcol))
            body = tcol[colid][1]
            cols_out.append([v.decode() if isinstance(v, bytes) else v
                             for v in body[1][1][1]])
        names, jdbc, types = cols_out[3], cols_out[4], cols_out[5]
        assert names == ["id", "s", "d", "b", "n"]
        assert types == ["bigint", "string", "double", "boolean", "string"]
        # DATA_TYPE must be java.sql.Types codes, not the thrift enum
        assert jdbc == [-5, 12, 8, 16, 12]
        c.call("CloseOperation", {1: (T_STRUCT, {1: op})})
        # JDBC metadata patterns are SQL LIKE: prefix wildcard matches
        resp = c.call("GetColumns", {1: (T_STRUCT, {
            1: c.session, 4: (11, "t%"),
        })})
        c._check(resp)
        assert resp[2][1][3][1]  # hasResultSet for the matching table
    finally:
        c.close()


def test_cli_serves_hs2_subprocess(tmp_path):
    """`python -m konohadataplatform_spark.sqlserver --hs2-port 0` boots
    the Thrift door in a separate process; a Hive-JDBC-shaped client
    runs SQL against the sf0.001 star schema over it."""
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
         "--hs2-port", "0", "--sf-dir", "/root/testdata/sf0.001"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        port = None
        deadline = _time.time() + 120
        for line in proc.stdout:
            m = re.search(r"hs2 endpoint listening on [\d.]+:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
            if _time.time() > deadline:  # pragma: no cover
                break
        assert port, "hs2 endpoint never reported its port"
        c = Hs2Client(port)
        c.open_session()
        try:
            cols, rows = c.execute(
                "SELECT r_regionkey FROM region ORDER BY r_regionkey"
            )
            assert cols == ["r_regionkey"]
            assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
        finally:
            c.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)


# ---------------------------------------------------------------------------
# r7: real-client interop + true async — the r6 verdict proved live that
# a self-written client masks protocol traps (the missing OpenSession
# `configuration` map NPE'd every real Hive JDBC connect), so the gate
# is now the sandbox's own beeline + hive-jdbc-2.3.10.
# ---------------------------------------------------------------------------

BEELINE = "/opt/spark/bin/beeline"


@pytest.mark.skipif(
    not __import__("os").path.exists(BEELINE),
    reason="no beeline in this environment",
)
def test_real_beeline_roundtrip(server, tmp_path):
    """Drive the sandbox's actual beeline (hive-jdbc-2.3.10 — the exact
    client the reference serves on :10009) end-to-end: SASL PLAIN
    connect, a typed SELECT with NULLs, SHOW TABLES, and the JDBC
    metadata calls (!tables / !columns) on one connection."""
    import os
    import subprocess

    script = tmp_path / "cmds.txt"
    script.write_text(
        "SELECT id, s, d, b, n FROM t ORDER BY id;\n"
        "SELECT CAST(NULL AS BIGINT) AS a, CAST(1.25 AS DECIMAL(10,2)) AS m;\n"
        "SHOW TABLES;\n"
        "!tables\n"
        "!columns t\n"
        "!quit\n"
    )
    out = subprocess.run(
        [BEELINE, "-u", f"jdbc:hive2://127.0.0.1:{server.port}/default",
         "-n", "hive", "-p", "hive", "--silent=true",
         "--outputformat=csv2", "-f", str(script)],
        capture_output=True, text=True, timeout=180,
        env={**os.environ, "SPARK_LOCAL_IP": "127.0.0.1"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "Could not open client transport" not in out.stdout
    # typed SELECT: values, NULL bitmask, decimal qualifier
    assert "1,a,1.5,true,NULL" in out.stdout
    assert "2,b,2.5,false,x" in out.stdout
    assert "NULL,1.25" in out.stdout
    # SHOW TABLES sees the catalog table
    assert ",t,true" in out.stdout
    # JDBC DatabaseMetaData.getTables / getColumns round-trip
    assert "NULL,default,t,TABLE" in out.stdout
    assert "NULL,default,t,id,-5,bigint,1" in out.stdout
    # beeline exits cleanly => CloseOperation/CloseSession both worked


def test_async_execute_poll_fetch(server):
    """runAsync=true (what the Hive JDBC driver always sends): the
    response carries a real hasResultSet, GetOperationStatus reaches
    FINISHED, and the fetch returns the rows."""
    import time as _time

    c = _connect(server)
    try:
        op = c.execute_async("SELECT id FROM t ORDER BY id")
        assert op[1][3][1] is True  # hasResultSet known at submit time
        deadline = _time.time() + 60
        while c.op_status(op, progress=True) == 1:  # RUNNING
            assert _time.time() < deadline
            _time.sleep(0.05)
        assert c.op_status(op) == 2  # FINISHED
        from konohadataplatform_spark.hs2 import T_I16, T_I64, T_STRUCT

        fr = c.call("FetchResults", {1: (T_STRUCT, {
            1: op, 2: (T_I16, 0), 3: (T_I64, 100),
        })})
        c._check(fr)
        tcol = fr[3][1][3][1][1][0]
        assert tcol[5][1][1][1][1] == [1, 2]
        c.close_operation(op)
    finally:
        c.close()


def test_async_cancel_interrupts_running_query(server):
    """A long-running async statement polls RUNNING, CancelOperation
    interrupts it mid-flight (cancelJobGroup), status flips to
    CANCELED, the fetch refuses — and the session keeps serving."""
    import time as _time

    c = _connect(server)
    try:
        # ~4e10 JVM-side hash ops: many seconds on local[32], so the
        # RUNNING window is wide; cancellation keeps the suite fast
        op = c.execute_async(
            "SELECT sum(xxhash64(a.id * b.id)) AS h"
            " FROM range(200000) a CROSS JOIN range(200000) b"
        )
        assert c.op_status(op) == 1  # RUNNING
        c.cancel(op)
        deadline = _time.time() + 30
        while c.op_status(op) == 1:
            assert _time.time() < deadline, "cancel did not interrupt"
            _time.sleep(0.05)
        assert c.op_status(op) == 3  # CANCELED
        from konohadataplatform_spark.hs2 import T_I16, T_I64, T_STRUCT

        fr = c.call("FetchResults", {1: (T_STRUCT, {
            1: op, 2: (T_I16, 0), 3: (T_I64, 100),
        })})
        with pytest.raises(RuntimeError, match="cancel"):
            c._check(fr)
        c.close_operation(op)
        # session survives the cancel
        _cols, rows = c.execute("SELECT count(*) AS n FROM t")
        assert rows == [(2,)]
    finally:
        c.close()


def test_async_error_surfaces_in_status(server):
    """An async statement that fails mid-execution reports ERROR with
    the message in GetOperationStatus (field 5), like real HS2."""
    c = _connect(server)
    try:
        op = c.execute_async(
            "SELECT assert_true(id < 0, 'boom') FROM t"
        )
        import time as _time

        deadline = _time.time() + 60
        while c.op_status(op) == 1:
            assert _time.time() < deadline
            _time.sleep(0.05)
        assert c.op_status(op) == 5  # ERROR
    finally:
        c.close()


def test_multiple_sessions_per_connection(server):
    """TCLIService allows several sessions per transport; CloseSession
    must not drop the TCP connection (r6 advice: real HiveServer2 keeps
    serving — only EOF/reset ends the connection)."""
    c = _connect(server)
    try:
        _cols, rows = c.execute("SELECT 1 AS x")
        assert rows == [(1,)]
        first = c.session
        from konohadataplatform_spark.hs2 import T_STRUCT

        c.call("CloseSession", {1: (T_STRUCT, {1: first})})
        # same connection, new session: still served
        c.open_session()
        _cols, rows = c.execute("SELECT 2 AS x")
        assert rows == [(2,)]
    finally:
        c.close()


def test_session_temp_view_and_conf_isolation(server):
    """r10: Kyuubi-style session isolation (the reference's per-session
    engine semantics) — two concurrent sessions CREATE the SAME
    temp-view name without colliding, SET conf stays session-scoped,
    and catalog tables written by one session are visible to the
    other at their latest committed version."""
    a = _connect(server)
    b = _connect(server)
    try:
        a.execute("CREATE OR REPLACE TEMP VIEW sv AS SELECT 1 AS x")
        b.execute("CREATE OR REPLACE TEMP VIEW sv AS SELECT 2 AS x")
        assert a.execute("SELECT x FROM sv")[1] == [(1,)]
        assert b.execute("SELECT x FROM sv")[1] == [(2,)]
        # per-session SQL conf (the reference's per-session overrides)
        a.execute("SET spark.sql.shuffle.partitions=7")
        assert a.execute("SET spark.sql.shuffle.partitions")[1][0][1] == "7"
        _c, rows = b.execute("SET spark.sql.shuffle.partitions")
        assert rows and rows[0][1] != "7"
        # catalog tables are shared: CTAS in A, queried from B
        a.execute("CREATE TABLE shared_ct AS SELECT 42 AS v")
        assert b.execute("SELECT v FROM shared_ct")[1] == [(42,)]
    finally:
        a.close()
        b.close()


# ---------------------------------------------------------------------------
# r9: optional credential verification on SASL PLAIN (wireauth.py) —
# the deployed reference fronts this listener with Keycloak; the
# in-process analog verifies the PLAIN initial response when
# credentials are configured and refuses the unauthenticatable noSasl
# transport outright.
# ---------------------------------------------------------------------------


def test_check_plain_handles_utf8_passwords():
    """Non-ASCII credentials must verify, not TypeError inside
    hmac.compare_digest (which rejects non-ASCII str inputs)."""
    from konohadataplatform_spark.wireauth import check_plain

    creds = {"hive": "pässwörd€", "ascii": "plain"}
    assert check_plain(creds, "hive", "pässwörd€")
    assert not check_plain(creds, "hive", "pässwörd")
    assert not check_plain(creds, "nobody", "pässwörd€")
    assert check_plain(creds, "ascii", "plain")


@pytest.fixture()
def auth_server(spark, tmp_path):
    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh2")))
    eng.save_table(
        "t2", spark.createDataFrame([(1, "a")], "id long, s string")
    )
    srv = Hs2Server(eng, credentials={"hive": "s3cret"}).start()
    yield srv
    srv.stop()


def test_auth_good_credentials_connect_and_query(auth_server):
    c = Hs2Client(auth_server.port, user="hive", password="s3cret")
    c.open_session()
    names, rows = c.execute("SELECT id FROM t2")
    assert names == ["id"] and rows == [(1,)]
    c.close()


def test_auth_bad_password_rejected(auth_server):
    with pytest.raises(RuntimeError, match="SASL failed"):
        Hs2Client(auth_server.port, user="hive", password="wrong")


def test_auth_unknown_user_rejected(auth_server):
    with pytest.raises(RuntimeError, match="SASL failed"):
        Hs2Client(auth_server.port, user="eve", password="s3cret")


def test_auth_nosasl_transport_refused(auth_server):
    """;auth=noSasl carries no credential — with auth configured the
    raw transport would be a bypass, so the server hangs up."""
    with pytest.raises((EOFError, ConnectionError, RuntimeError)):
        c = Hs2Client(auth_server.port, use_sasl=False)
        c.open_session()


def test_auth_env_var_credentials(spark, tmp_path, monkeypatch):
    from konohadataplatform_spark.wireauth import ENV_VAR

    monkeypatch.setenv(ENV_VAR, "alice:pw1, bob:pw2")
    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "wh3")))
    srv = Hs2Server(eng).start()
    try:
        c = Hs2Client(srv.port, user="bob", password="pw2")
        c.open_session()
        c.close()
        with pytest.raises(RuntimeError, match="SASL failed"):
            Hs2Client(srv.port, user="bob", password="pw1")
    finally:
        srv.stop()


@pytest.mark.skipif(
    not __import__("os").path.exists(BEELINE),
    reason="no beeline in this environment",
)
def test_real_beeline_auth(auth_server, tmp_path):
    """The sandbox's actual beeline: good creds connect and query, bad
    creds are refused at the SASL layer."""
    import os
    import subprocess

    script = tmp_path / "authcmds.txt"
    script.write_text("SELECT id FROM t2;\n!quit\n")
    env = {**os.environ, "SPARK_LOCAL_IP": "127.0.0.1"}
    url = f"jdbc:hive2://127.0.0.1:{auth_server.port}/default"
    good = subprocess.run(
        [BEELINE, "-u", url, "-n", "hive", "-p", "s3cret",
         "--silent=true", "--outputformat=csv2", "-f", str(script)],
        capture_output=True, text=True, timeout=180, env=env,
    )
    assert good.returncode == 0, good.stdout + good.stderr
    assert "Could not open client transport" not in good.stdout
    bad = subprocess.run(
        [BEELINE, "-u", url, "-n", "hive", "-p", "nope",
         "--silent=true", "--outputformat=csv2", "-e", "SELECT 1"],
        capture_output=True, text=True, timeout=180, env=env,
    )
    combined = bad.stdout + bad.stderr
    assert "Could not open client transport" in combined or \
        "Error" in combined

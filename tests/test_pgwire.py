"""Postgres wire-protocol endpoint: a stock-protocol client flow
(startup -> simple query -> terminate) against the Spark engine.
Analog of the reference's Kyuubi JDBC entry (docs/components/
kyuubi.md:61-67) using a protocol this container can actually speak."""

from __future__ import annotations

import threading

import pytest

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.engine import Engine
from konohadataplatform_spark.pgwire import PgWireServer, pg_query


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
    srv = PgWireServer(eng).start()
    yield srv
    srv.stop()


def test_simple_query_roundtrip(server):
    cols, rows, err = pg_query(server.port, "SELECT id, s, d, b, n FROM t ORDER BY id")
    assert err is None
    assert cols == ["id", "s", "d", "b", "n"]
    assert rows == [
        ["1", "a", "1.5", "t", None],
        ["2", "b", "2.5", "f", "x"],
    ]


def test_multi_statement_and_error(server):
    cols, rows, err = pg_query(server.port, "SELECT 1 AS a; SELECT 2 AS b")
    assert err is None and cols == ["b"] and [r[0] for r in rows][-1] == "2"

    _, _, err = pg_query(server.port, "SELECT * FROM missing_table")
    assert err is not None and "missing_table" in err.lower()

    # session survives the error
    cols, rows, err = pg_query(server.port, "SELECT count(*) AS n FROM t")
    assert err is None and rows == [["2"]]


def test_connection_temp_view_isolation(server):
    """r10: Kyuubi-style session isolation — each connection gets its
    own SparkSession clone, so a temp view lives and dies with its
    connection while catalog tables (CTAS) stay shared."""
    cols, rows, err = pg_query(
        server.port,
        "CREATE TEMP VIEW cw AS SELECT 5 AS x; SELECT x FROM cw",
    )
    assert err is None and rows == [["5"]]
    # a NEW connection must not see the other connection's view...
    _c, _r, err = pg_query(server.port, "SELECT x FROM cw")
    assert err is not None and "cw" in err.lower()
    # ...but a catalog table written through one connection is shared
    _c, _r, err = pg_query(
        server.port, "CREATE TABLE pg_shared AS SELECT 7 AS v"
    )
    assert err is None
    cols, rows, err = pg_query(server.port, "SELECT v FROM pg_shared")
    assert err is None and rows == [["7"]]


def test_concurrent_clients(server):
    out = {}

    def worker(i):
        _, rows, err = pg_query(server.port, f"SELECT {i} AS x, count(*) AS n FROM t")
        out[i] = (rows, err)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(err is None and rows == [[str(i), "2"]] for i, (rows, err) in out.items())


def test_extended_protocol_prepared_statement(server):
    from konohadataplatform_spark.pgwire import pg_extended_query

    cols, rows, err = pg_extended_query(
        server.port, "SELECT id, s FROM t WHERE id = $1", ["2"]
    )
    assert err is None
    assert cols == ["id", "s"] and rows == [["2", "b"]]

    # string param quoting + NULL param
    cols, rows, err = pg_extended_query(
        server.port, "SELECT id FROM t WHERE s = $1 OR $2 IS NOT NULL", ["a", None]
    )
    assert err is None and rows == [["1"]]


def test_extended_protocol_error_recovers_at_sync(server):
    from konohadataplatform_spark.pgwire import pg_extended_query

    _c, _r, err = pg_extended_query(server.port, "SELECT * FROM nope_missing")
    assert err is not None

    cols, rows, err = pg_extended_query(server.port, "SELECT count(*) AS n FROM t")
    assert err is None and rows == [["2"]]


def test_type_fidelity_over_the_wire(server):
    """Temporal/decimal/array values arrive as their canonical text
    renderings (what a stock client parses by declared type oid)."""
    cols, rows, err = pg_query(
        server.port,
        "SELECT DATE'2024-02-29' AS d, TIMESTAMP'2024-02-29 12:30:45' AS ts, "
        "CAST(1.50 AS DECIMAL(10,2)) AS m, array(1,2,3) AS arr",
    )
    assert err is None
    d, ts, m, arr = rows[0]
    assert d == "2024-02-29"
    assert ts.startswith("2024-02-29 12:30:45")
    assert m == "1.50"
    assert arr == "[1, 2, 3]"


def test_dollar_inside_string_literal_not_substituted(server):
    from konohadataplatform_spark.pgwire import pg_extended_query

    cols, rows, err = pg_extended_query(
        server.port,
        "SELECT id FROM t WHERE s = $1 AND 'costs $1 each' = 'costs $1 each'",
        ["b"],
    )
    assert err is None and rows == [["2"]]


def test_fetch_size_portal_suspended(server):
    """Execute with maxrows paginates: PortalSuspended until drained —
    the JDBC setFetchSize flow (review finding)."""
    import socket
    import struct as _s

    from konohadataplatform_spark.pgwire import _drain_until_ready

    with socket.create_connection(("127.0.0.1", server.port), timeout=60) as sck:
        f = sck.makefile("rwb")
        body = _s.pack(">I", 196608) + b"user\x00t\x00\x00"
        f.write(_s.pack(">I", len(body) + 4) + body)
        f.flush()
        _drain_until_ready(f)

        def send(tag, payload):
            f.write(tag + _s.pack(">I", len(payload) + 4) + payload)

        send(b"P", b"\x00SELECT id FROM t ORDER BY id\x00" + _s.pack(">H", 0))
        send(b"B", b"\x00\x00" + _s.pack(">HHH", 0, 0, 0))
        send(b"E", b"\x00" + _s.pack(">I", 1))  # first page: 1 row
        send(b"E", b"\x00" + _s.pack(">I", 1))  # second page
        send(b"S", b"")
        f.flush()

        seen = []
        while True:
            tag = f.read(1)
            (ln,) = _s.unpack(">I", f.read(4))
            payload = f.read(ln - 4)
            seen.append(tag)
            if tag == b"Z":
                break
        # Parse, Bind, 1 row, suspended, 1 row, complete, ready
        assert seen.count(b"D") == 2
        assert b"s" in seen  # PortalSuspended after the first page
        assert b"C" in seen  # CommandComplete when drained


def test_multi_statement_backslash_escaped_quote(server):
    cols, rows, err = pg_query(
        server.port, r"SELECT 'don\'t; stay' AS s; SELECT 2 AS b"
    )
    assert err is None and cols == ["b"] and rows[-1] == ["2"]


# ---------------------------------------------------------------------------
# r7: real-client interop — the same lesson as HS2/beeline: a
# self-written client masks protocol traps, so the gate is the
# sandbox's actual psql 15.
# ---------------------------------------------------------------------------

PSQL = "/usr/bin/psql"


def _psql(server, *cmds, timeout=120):
    import os
    import subprocess

    args = [PSQL, f"host=127.0.0.1 port={server.port} dbname=default "
                  "user=konoha", "--no-psqlrc", "-v", "ON_ERROR_STOP=0"]
    for c in cmds:
        args += ["-c", c]
    return subprocess.run(args, capture_output=True, text=True,
                          timeout=timeout, env=dict(os.environ))


@pytest.mark.skipif(
    not __import__("os").path.exists(PSQL), reason="no psql here"
)
def test_real_psql_select_and_nulls(server):
    out = _psql(server, "SELECT id, s, d, b, n FROM t ORDER BY id")
    assert out.returncode == 0, out.stderr
    assert "1 | a | 1.5 | t" in out.stdout
    assert "2 | b | 2.5 | f | x" in out.stdout


@pytest.mark.skipif(
    not __import__("os").path.exists(PSQL), reason="no psql here"
)
def test_real_psql_metacommands(server):
    """\\dt, \\dn, and the multi-query \\d <table> full describe drive
    psql's pg_catalog queries against the DuckDB catalog mirror: the
    REAL Spark table list and column types come back."""
    out = _psql(server, r"\dt", r"\dn", r"\d t")
    assert out.returncode == 0, out.stderr
    assert "t" in out.stdout and "table" in out.stdout
    assert "Schema" in out.stdout  # the \dn namespace listing rendered
    # the full describe resolved the table oid ACROSS two catalog
    # queries (stable mirror oids) and rendered real column types
    assert "int8" in out.stdout and "float8" in out.stdout
    assert "boolean" in out.stdout or "bool" in out.stdout
    assert "ERROR" not in out.stdout and "ERROR" not in out.stderr


@pytest.mark.skipif(
    not __import__("os").path.exists(PSQL), reason="no psql here"
)
def test_real_psql_transaction_noops(server):
    """psql -1 / scripts wrap work in BEGIN/COMMIT; the auto-commit
    engine must answer the tags instead of erroring."""
    out = _psql(
        server,
        "BEGIN; SELECT count(*) AS n FROM t; COMMIT",
        "ROLLBACK",
    )
    assert out.returncode == 0, out.stderr
    assert "BEGIN" in out.stdout and "COMMIT" in out.stdout
    assert "ROLLBACK" in out.stdout
    assert "ERROR" not in out.stdout and "ERROR" not in out.stderr


def test_catalog_mirror_information_schema(server):
    """JDBC DatabaseMetaData-style information_schema queries route to
    the mirror and report the real columns."""
    cols, rows, err = pg_query(
        server.port,
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name = 't' ORDER BY ordinal_position",
    )
    assert err is None, err
    assert [r[0] for r in rows] == ["id", "s", "d", "b", "n"]


def test_txn_noops_via_extended_protocol(server):
    """JDBC autocommit=false sends BEGIN through the extended flow."""
    from konohadataplatform_spark.pgwire import pg_extended_query

    cols, rows, err = pg_extended_query(server.port, "BEGIN")
    assert err is None and rows == []


# ---------------------------------------------------------------------------
# r9: optional password auth (wireauth.py) — md5 (stock-client salted
# scheme, driven by the sandbox's real psql below) and cleartext, 28P01
# on bad creds, trust posture unchanged when no credentials configured.
# ---------------------------------------------------------------------------


@pytest.fixture()
def auth_server(spark, tmp_path):
    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "whA")))
    eng.save_table(
        "ta", spark.createDataFrame([(7, "z")], "id long, s string")
    )
    srv = PgWireServer(eng, credentials={"konoha": "s3cret"}).start()
    yield srv
    srv.stop()


def _pg_query_auth(port, sql, user, password):
    """pg_query with the password exchange a stock libpq performs
    (answers whichever of md5/cleartext the server requests)."""
    import hashlib
    import socket as _socket
    import struct as _struct

    with _socket.create_connection(("127.0.0.1", port), timeout=60) as s:
        f = s.makefile("rwb")
        params = f"user\x00{user}\x00database\x00spark\x00\x00".encode()
        body = _struct.pack(">I", 196608) + params
        f.write(_struct.pack(">I", len(body) + 4) + body)
        f.flush()
        tag = f.read(1)
        assert tag == b"R"
        (length,) = _struct.unpack(">I", f.read(4))
        payload = f.read(length - 4)
        (code,) = _struct.unpack(">I", payload[:4])
        if code == 5:  # md5: salt in the request
            inner = hashlib.md5(
                password.encode() + user.encode()
            ).hexdigest()
            secret = "md5" + hashlib.md5(
                inner.encode() + payload[4:8]
            ).hexdigest()
        elif code == 3:  # cleartext
            secret = password
        else:
            raise AssertionError(f"unexpected auth code {code}")
        pw = secret.encode() + b"\x00"
        f.write(b"p" + _struct.pack(">I", len(pw) + 4) + pw)
        f.flush()
        cols, rows, err = [], [], None
        sent_query = False
        while True:
            tag = f.read(1)
            if not tag:
                return cols or None, rows or None, err or "connection closed"
            (length,) = _struct.unpack(">I", f.read(4))
            payload = f.read(length - 4)
            if tag == b"E":
                fields = payload.split(b"\x00")
                err = next(
                    (x[1:].decode() for x in fields if x[:1] == b"M"),
                    "error",
                )
                if not sent_query:  # auth refusal: server hangs up
                    return None, None, err
            elif tag == b"T":
                (n,) = _struct.unpack(">H", payload[:2])
                pos = 2
                cols = []
                for _ in range(n):
                    end = payload.index(b"\x00", pos)
                    cols.append(payload[pos:end].decode())
                    pos = end + 1 + 18
            elif tag == b"D":
                (n,) = _struct.unpack(">H", payload[:2])
                pos = 2
                row = []
                for _ in range(n):
                    (ln,) = _struct.unpack(">i", payload[pos:pos + 4])
                    pos += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(payload[pos:pos + ln].decode())
                        pos += ln
                rows.append(row)
            elif tag == b"Z":
                if sent_query:
                    return cols, rows, err
                sent_query = True
                q = sql.encode() + b"\x00"
                f.write(b"Q" + _struct.pack(">I", len(q) + 4) + q)
                f.flush()


def test_auth_md5_good_credentials(auth_server):
    cols, rows, err = _pg_query_auth(
        auth_server.port, "SELECT id FROM ta", "konoha", "s3cret"
    )
    assert err is None and cols == ["id"] and rows == [["7"]]


def test_auth_md5_bad_password_gets_28P01(auth_server):
    _cols, _rows, err = _pg_query_auth(
        auth_server.port, "SELECT 1", "konoha", "wrong"
    )
    assert err is not None and "authentication failed" in err


def test_auth_unknown_user_rejected(auth_server):
    _cols, _rows, err = _pg_query_auth(
        auth_server.port, "SELECT 1", "eve", "s3cret"
    )
    assert err is not None and "authentication failed" in err


def test_auth_cleartext_method(spark, tmp_path):
    eng = Engine(spark, SnapshotCatalog(spark, str(tmp_path / "whB")))
    srv = PgWireServer(
        eng, credentials={"u": "pw"}, auth_method="cleartext"
    ).start()
    try:
        _c, _r, err = _pg_query_auth(srv.port, "SELECT 1 AS x", "u", "pw")
        assert err is None
        _c, _r, err = _pg_query_auth(srv.port, "SELECT 1", "u", "no")
        assert err is not None and "authentication failed" in err
    finally:
        srv.stop()


@pytest.mark.skipif(
    not __import__("os").path.exists(PSQL), reason="no psql here"
)
def test_real_psql_md5_auth(auth_server):
    """The sandbox's actual psql negotiates the md5 exchange: good
    PGPASSWORD queries, bad PGPASSWORD is refused with the stock
    password-authentication error."""
    import os
    import subprocess

    conn = (f"host=127.0.0.1 port={auth_server.port} dbname=default "
            "user=konoha")
    good = subprocess.run(
        [PSQL, conn, "--no-psqlrc", "-c", "SELECT id FROM ta"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "PGPASSWORD": "s3cret"},
    )
    assert good.returncode == 0, good.stderr
    assert "7" in good.stdout
    bad = subprocess.run(
        [PSQL, conn, "--no-psqlrc", "-c", "SELECT 1"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "PGPASSWORD": "nope"},
    )
    assert bad.returncode != 0
    assert "authentication failed" in (bad.stderr + bad.stdout)

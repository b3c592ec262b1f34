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

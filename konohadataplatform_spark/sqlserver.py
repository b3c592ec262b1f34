"""Network SQL endpoint — the Kyuubi JDBC/Thrift front-end analog.

The reference's only network entry point for interactive SQL is
Kyuubi's Thrift server on :10009 (``docs/components/kyuubi.md:61-67``;
``infrastructure/apps/kyuubi/base/kyuubi-dbt-defaults-configmap.yaml:
22-24`` sets the dbt connection to it). :class:`Engine.sql` covers the
semantics in-process; this module adds the missing *wire* surface: a
threaded TCP server speaking newline-delimited JSON, so an external
client (BI tool shim, curl-grade script, another process) can run the
full S8 dialect — Spark SQL plus the DML/time-travel dispatch —
against one shared engine.

Protocol (one JSON object per line, UTF-8):

    request:  {"sql": "...", "limit": 1000}
    response: {"ok": true, "columns": ["c1", ...],
               "types": ["bigint", ...],
               "rows": [[...], ...], "row_count": N,
               "truncated": false, "elapsed_ms": M}
    error:    {"ok": false, "error": "...", "error_class": "ValueError"}

Session isolation (r11, mirroring the HS2/pgwire doors): each TCP
CONNECTION gets its own :class:`~konohadataplatform_spark.engine.
SessionEngine` (a ``spark.newSession()`` clone — private temp views
and SQL conf over the shared SparkContext) when the engine is
catalog-backed; catalog tables stay globally visible at their latest
committed version, exactly the Kyuubi shared-metastore pairing. A
catalog-less engine falls back to the single shared session (there is
nothing to mirror base temp views through). Concurrency is the
driver's: each connection runs on its own thread and Spark schedules
the jobs; the GIL only gates the (tiny) JSON serialization, not the
JVM query execution.

Result sets are capped by ``limit`` (default 10_000, like a JDBC
fetch-size guard): a full-table SELECT over 100 TB returns the first N
rows and ``truncated: true`` instead of collecting the world onto the
driver. Values are JSON-ified conservatively (Decimal/date/datetime/
bytes -> strings) so any client can parse them.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import socket
import socketserver
import threading
import time

DEFAULT_LIMIT = 10_000


def _jsonable(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if hasattr(v, "asDict"):  # Row (struct) — a tuple subclass, check first
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    return str(v)


def execute_sql_json(engine, sql: str, limit: int = DEFAULT_LIMIT) -> dict:
    """Run one statement and shape the result as the wire-JSON dict
    shared by the line-JSON TCP server and the REST endpoint
    (``restserver.py``): columns/types/rows/row_count/truncated or
    ok=false + error. Result sets are capped at ``limit`` rows with a
    limit+1 probe (no second count() job)."""
    t0 = time.perf_counter()
    try:
        df = engine.sql(sql)
        rows = df.limit(limit + 1).collect()
        truncated = len(rows) > limit
        rows = rows[:limit]
        return {
            "ok": True,
            "columns": list(df.columns),
            "types": [t for _n, t in df.dtypes],
            "rows": [[_jsonable(v) for v in r] for r in rows],
            "row_count": len(rows),
            "truncated": truncated,
            "elapsed_ms": round((time.perf_counter() - t0) * 1000, 1),
        }
    except Exception as exc:  # noqa: BLE001 — wire boundary
        return {
            "ok": False,
            "error": str(exc)[:4000],
            "error_class": type(exc).__name__,
        }


class SqlServer:
    """Threaded line-JSON SQL server over an :class:`Engine`.

    >>> srv = SqlServer(engine).start()        # port auto-assigned
    >>> sql_request(srv.port, "SELECT 1 AS x")["rows"]
    [[1]]
    >>> srv.stop()
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self.host, self.port = host, port
        self._server: socketserver.ThreadingTCPServer | None = None
        self._thread: threading.Thread | None = None

    def _session_engine(self):
        """Per-connection engine: a SessionEngine clone when catalog-
        backed (temp views + SET are connection-scoped, catalog tables
        shared — the same isolation the HS2/pgwire doors ship), else
        the shared engine."""
        if getattr(self.engine, "catalog", None) is not None:
            from konohadataplatform_spark.engine import SessionEngine

            return SessionEngine(self.engine)
        return self.engine

    def _handle_line(self, line: str, engine=None) -> str:
        try:
            req = json.loads(line)
            sql = req["sql"]
            limit = int(req.get("limit", DEFAULT_LIMIT))
        except Exception as exc:  # noqa: BLE001 — wire boundary
            return json.dumps({
                "ok": False,
                "error": str(exc)[:4000],
                "error_class": type(exc).__name__,
            })
        return json.dumps(
            execute_sql_json(
                self.engine if engine is None else engine, sql, limit
            )
        )

    def start(self) -> "SqlServer":
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                eng = outer._session_engine()
                for raw in self.rfile:
                    line = raw.decode("utf-8").strip()
                    if not line:
                        continue
                    out = outer._handle_line(line, eng)
                    self.wfile.write(out.encode("utf-8") + b"\n")
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((self.host, self.port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="konoha-sql-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


def sql_request(
    port: int,
    sql: str,
    host: str = "127.0.0.1",
    limit: int = DEFAULT_LIMIT,
    timeout: float = 120.0,
) -> dict:
    """Minimal client: one request per call (the protocol also allows
    pipelining many lines per connection)."""
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall(json.dumps({"sql": sql, "limit": limit}).encode() + b"\n")
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf.decode("utf-8"))


def main(argv: list[str] | None = None) -> int:
    """CLI: serve a warehouse over TCP.

    python -m konohadataplatform_spark.sqlserver \
        --warehouse /path/wh --port 10009 [--sf-dir /root/testdata/sf0.01]

    --sf-dir additionally registers the star-schema parquet tables as
    views, so a fresh server is immediately queryable. Port 10009
    mirrors the reference's Kyuubi listener.
    """
    import argparse

    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.engine import Engine
    from konohadataplatform_spark.session import get_spark

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=10009)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument(
        "--pg-port",
        type=int,
        default=None,
        help="also serve the Postgres wire protocol on this port "
        "(stock psql/JDBC/BI clients)",
    )
    ap.add_argument(
        "--hs2-port",
        type=int,
        default=None,
        help="also serve HiveServer2 Thrift on this port (Hive JDBC: "
        "jdbc:hive2://host:port/default, beeline, dbt-spark thrift)",
    )
    ap.add_argument(
        "--rest-port",
        type=int,
        default=None,
        help="also serve HTTP/REST SQL on this port (curl, REST BI "
        "connectors; the Kyuubi :10099 REST listener analog)",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="konoha-sql-server")
    engine = Engine(spark, SnapshotCatalog(spark, args.warehouse))
    if args.sf_dir:
        engine.register_star_schema(args.sf_dir)
    engine.catalog.register_views()
    srv = SqlServer(engine, host=args.host, port=args.port).start()
    print(f"konoha SQL endpoint listening on {srv.host}:{srv.port}", flush=True)
    if args.pg_port is not None:
        from konohadataplatform_spark.pgwire import PgWireServer

        pg = PgWireServer(engine, host=args.host, port=args.pg_port).start()
        print(f"konoha pg-wire endpoint listening on {pg.host}:{pg.port}", flush=True)
    if args.hs2_port is not None:
        from konohadataplatform_spark.hs2 import Hs2Server

        hs = Hs2Server(engine, host=args.host, port=args.hs2_port).start()
        print(f"konoha hs2 endpoint listening on {hs.host}:{hs.port}", flush=True)
    if args.rest_port is not None:
        from konohadataplatform_spark.restserver import RestSqlServer

        rs = RestSqlServer(engine, host=args.host, port=args.rest_port).start()
        print(
            f"konoha REST endpoint listening on {rs.host}:{rs.port}",
            flush=True,
        )
    try:
        threading.Event().wait()  # serve until killed
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via subprocess test
    raise SystemExit(main())

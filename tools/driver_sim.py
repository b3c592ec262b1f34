"""Local mirror of the external driver's correctness gate.

Runs every `__spark_entry__.queries()` entry under a VANILLA
SparkSession (no project session factory — exactly how the driver calls
it) and compares against `oracle_sql()` in DuckDB with order-insensitive
canonical row comparison.

    python tools/driver_sim.py [sf_dir]   # default /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if v is None or v != v:  # None / NaN / NaT (NaT != NaT)
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"
    # --only <substr>: compare just the matching queries (fast
    # iteration on a new operator without the full-registry pass)
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    if only is not None:
        qs = {n: f for n, f in qs.items() if only in n}
    else:
        print(f"entry rows: {e.entry(spark).count()}")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS FROM read_parquet('{path}')")

    bad, ok, ro = [], 0, 0
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf).toPandas()
            if name not in osql:
                ro += 1
                continue
            ddf = con.execute(osql[name]).fetchdf()
            if sorted(c.lower() for c in sdf.columns) != sorted(
                c.lower() for c in ddf.columns
            ):
                bad.append((name, "cols"))
                continue
            os_ = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i].lower())
            od_ = sorted(range(len(ddf.columns)), key=lambda i: ddf.columns[i].lower())
            rs = sorted(
                "|".join(canon(r[i]) for i in os_)
                for r in sdf.itertuples(index=False, name=None)
            )
            rd = sorted(
                "|".join(canon(r[i]) for i in od_)
                for r in ddf.itertuples(index=False, name=None)
            )
            if rs != rd:
                bad.append((name, "values"))
                continue
            ok += 1
        except Exception as ex:  # noqa: BLE001
            bad.append((name, str(ex)[:120]))
    print(
        f"queries={len(qs)} oracle-matched={ok} rows-only={ro} "
        f"MISMATCHES={bad if bad else 'none'}"
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

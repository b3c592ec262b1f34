"""Dump `.explain("formatted")` for named queries to plans/<tag>/ files.

    python tools/dump_plans.py --tag r14 --suffix _before q3_shipping_priority ...

Used by the optimization rounds to commit before/after plan evidence.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from konohadataplatform_spark.queries import all_queries
    from konohadataplatform_spark.session import get_spark

    outdir = os.path.join(os.path.dirname(__file__), "..", "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="konoha-plans")
    qs = all_queries()
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        df = qs[name](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

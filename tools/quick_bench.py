"""Targeted per-query timing for the optimization loop: same
measurement discipline as bench.py (one untimed warmup, median of
--runs timed build+count passes, same get_spark contract) but over an
explicit query list, so a single change can be re-measured in seconds
instead of re-running the full 87-query bench.

    python tools/quick_bench.py --runs 5 q1_pricing_summary q_minhash_dedup

NOT a replacement for bench.py — the committed before/after evidence
for the round still comes from full bench.py runs; this is the
inner-loop instrument (guide §1.1: optimize one thing, then look
again).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from konohadataplatform_spark.queries import all_queries
    from konohadataplatform_spark.session import get_spark

    spark = get_spark(app_name="konoha-quick-bench")
    qs = all_queries()
    names = [n for n in args.queries if n in qs]
    for n in args.queries:
        if n not in qs:
            print(f"!! unknown query {n}", file=sys.stderr)
    for name in names:  # warmup
        qs[name](spark, args.sf_dir).count()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.runs):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
    out = {
        n: {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "stddev": round(statistics.pstdev(ts), 3),
        }
        for n, ts in samples.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

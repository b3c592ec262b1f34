"""Per-query stage profiler for the optimization rounds.

Runs one or more registered queries under the bench session (same
get_spark factory, same $SPARK_GRAFT_* contract), executes each with
the bench's `.count()` action after one warmup, and prints a per-stage
breakdown parsed from the Spark event log: stage name, task count,
total executor run time, shuffle read/write bytes. This is the
"open the Spark UI, find the slow stage" loop from the optimization
guide, done headlessly (spark.ui.enabled is false in this sandbox).

    python tools/profile_query.py q3_shipping_priority q5_local_supplier
    python tools/profile_query.py --runs 3 q_customer_order_summary
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", action="store_true",
                    help="also print explain('formatted')")
    args = ap.parse_args()

    import shutil

    evdir = "/tmp/spark-events-profile"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from konohadataplatform_spark.queries import all_queries
    from konohadataplatform_spark.session import get_spark

    spark = get_spark(
        app_name="konoha-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    sc = spark.sparkContext
    qs = all_queries()

    bounds = {}
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        # warmup (untimed, mirrors bench.py)
        qs[name](spark, args.sf_dir).count()
        sc.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        first_job_marker = time.time() * 1000
        times = []
        for _ in range(args.runs):
            r0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            built = time.perf_counter()
            df.count()
            times.append((built - r0, time.perf_counter() - built))
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        bounds[name] = (first_job_marker, time.time() * 1000)
        med_build = sorted(t[0] for t in times)[len(times) // 2]
        med_exec = sorted(t[1] for t in times)[len(times) // 2]
        print(f"\n== {name}: wall {wall:.2f}s over {args.runs} runs "
              f"(median build {med_build:.3f}s + exec {med_exec:.3f}s)")
        if args.explain:
            df = qs[name](spark, args.sf_dir)
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    spark.stop()

    # parse the event log (file, or rolling eventlog_v2 directory):
    # stages grouped by the job-description marker
    logf = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if "appstatus" in f or f.startswith("."):
                continue
            logf.append(os.path.join(root, f))
    if not logf:
        print("no event log found")
        return 1
    stage_to_query: dict[int, str] = {}
    job_submit: dict[int, float] = {}
    rows = []

    def _lines():
        for p in sorted(logf):
            with open(p) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "")
                if desc.startswith("PROFILE:"):
                    qname = desc[len("PROFILE:"):]
                    for sid in ev.get("Stage IDs", []):
                        stage_to_query[sid] = qname
                    job_submit[ev["Job ID"]] = ev.get("Submission Time", 0)
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                q = stage_to_query.get(sid)
                if q is None:
                    continue
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                accs = {a["Name"]: a.get("Value", 0)
                        for a in si.get("Accumulables", [])}
                rows.append({
                    "query": q,
                    "stage": sid,
                    "name": si.get("Stage Name", "")[:60],
                    "tasks": si.get("Number of Tasks", 0),
                    "wall_ms": (comp - sub) if sub and comp else None,
                    "run_ms": accs.get("internal.metrics.executorRunTime", 0),
                    "cpu_ms": int(accs.get(
                        "internal.metrics.executorCpuTime", 0)) // 1_000_000,
                    "sh_read_mb": round(accs.get(
                        "internal.metrics.shuffle.read.remoteBytesRead", 0)
                        / 1e6 + accs.get(
                        "internal.metrics.shuffle.read.localBytesRead", 0)
                        / 1e6, 2),
                    "sh_write_mb": round(accs.get(
                        "internal.metrics.shuffle.write.bytesWritten", 0)
                        / 1e6, 2),
                    "in_mb": round(accs.get(
                        "internal.metrics.input.bytesRead", 0) / 1e6, 2),
                })
    cur = None
    for r in rows:
        if r["query"] != cur:
            cur = r["query"]
            print(f"\n--- stages for {cur} "
                  f"(all runs incl. warmup-after-first; wall/run/cpu ms)")
            print(f"{'stage':>6} {'tasks':>5} {'wall':>7} {'run':>8} "
                  f"{'cpu':>8} {'shR MB':>8} {'shW MB':>8} {'in MB':>7}  name")
        print(f"{r['stage']:>6} {r['tasks']:>5} {str(r['wall_ms']):>7} "
              f"{r['run_ms']:>8} {r['cpu_ms']:>8} {r['sh_read_mb']:>8} "
              f"{r['sh_write_mb']:>8} {r['in_mb']:>7}  {r['name']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

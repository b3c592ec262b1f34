"""One-command pre-snapshot ritual: driver contract smoke, full-registry
oracle comparison at one or more scale factors, and the pytest suite.

    python tools/verify_all.py               # sf0.001 + sf0.01 + pytest
    python tools/verify_all.py --fast        # sf0.001 only, no pytest
    python tools/verify_all.py --bench       # also run bench at sf0.1

Exits nonzero if any stage fails. Each stage runs in a subprocess so a
crash in one cannot mask the others.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> bool:
    t0 = time.time()
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=ROOT)
    ok = proc.returncode == 0
    print(f"== {label}: {'OK' if ok else 'FAIL'} ({time.time() - t0:.0f}s)",
          flush=True)
    return ok


def main() -> int:
    fast = "--fast" in sys.argv
    bench = "--bench" in sys.argv
    py = sys.executable
    stages: list[tuple[str, list[str]]] = [
        ("driver-sim sf0.001", [py, "tools/driver_sim.py",
                                "/root/testdata/sf0.001"]),
    ]
    if not fast:
        stages.append(
            ("driver-sim sf0.01", [py, "tools/driver_sim.py",
                                   "/root/testdata/sf0.01"])
        )
        stages.append(("pytest", [py, "-m", "pytest", "tests/", "-q"]))
    if bench:
        stages.append(("bench sf0.1", [py, "bench.py"]))

    results = {label: run(label, cmd) for label, cmd in stages}
    print("\n== SUMMARY ==")
    for label, ok in results.items():
        print(f"  {'PASS' if ok else 'FAIL'}  {label}")
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())

"""THE counted-gate convention, in one place (r13 — the r12 sweep
left five hand-rolled copies that had already drifted: some probed
with full counts, some with LIMIT-bounded counts).

A "counted gate" decides an execution strategy (broadcast vs
shuffled join) from the measured size of a maybe-small relation:

- an explicit ``flag`` (True/False) skips the probe entirely — the
  caller already knows the side's size (the probe_broadcast
  convention), or needs a fully lazy plan;
- ``flag is None`` probes with :func:`probe_within`: a LIMIT-bounded
  count that terminates as soon as ``bound + 1`` rows exist, so the
  probe job costs O(bound) rows of the side's plan, never a full
  materialization (r12 ADVICE).

Gates change EXECUTION strategy only — every caller's over-bound
path is parity-tested to return bit-identical rows, so no oracle
depends on a gate decision.

For a multiplied budget (``rows * m <= bound``, e.g. |queries| x
nprobe) probe with ``bound // m``: for integer rows and m > 0,
``rows * m <= bound  <=>  rows <= bound div m`` — the decision is
unchanged and the probe stays LIMIT-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def probe_within(side: DataFrame, bound: int) -> bool:
    """True iff ``side`` has at most ``bound`` rows — measured with
    ``limit(bound + 1).count()`` so the job stops as soon as the
    answer is known."""
    bound = int(bound)
    return side.limit(bound + 1).count() <= bound


def gated_broadcast(
    side: DataFrame, flag: bool | None, bound: int
) -> DataFrame:
    """``side`` wrapped in a broadcast hint iff the gate admits it:
    ``flag`` True/False decides directly; None probes. For equi-join
    sides — theta-join callers (cosine/JL pair scans) branch to a
    salted-equi spelling instead and use :func:`probe_within`
    directly."""
    if flag is None:
        flag = probe_within(side, bound)
    return F.broadcast(side) if flag else side

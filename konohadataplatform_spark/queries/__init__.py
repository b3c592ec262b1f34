"""Query registry: every SURVEY §2 operator re-expressed Spark-first.

Each submodule exposes ``QUERIES`` (name -> fn(spark, sf_dir) -> DataFrame)
and ``ORACLE`` (name -> equivalent DuckDB SQL). Names without an ORACLE
entry are genuinely non-SQL-expressible (driver records rows-only).

Registration order matters: the correctness driver checks the first 50
registered queries each round, so ``all_queries()`` orders entries by how
many driver rounds have already verified them (fewest first). The counts
are derived at runtime from the ``CORRECTNESS_r*.json`` files the driver
commits to the repo root, so rotation advances automatically every round:
never-checked queries sort first, then once-checked, and so on — and a
query checked this round sorts to the back next round. The sort is
stable, so ties keep registration order and eventually every query
re-enters the window (regression re-sampling).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

from konohadataplatform_spark.queries import analytics, events, llmdata, tpch

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _oracle_names() -> set[str]:
    """Names that currently have a DuckDB oracle (unordered — safe to
    call from inside the ordering machinery)."""
    names: set[str] = set()
    for mod in (tpch, analytics, events, llmdata):
        names.update(mod.ORACLE)
    return names


@lru_cache(maxsize=1)
def _times_driver_checked() -> dict[str, int]:
    """Per-query count of driver rounds that verified it.

    Reads every ``CORRECTNESS_r*.json`` beside the package (the driver
    commits one per round). Unreadable files are skipped so a partially
    written report can never break query registration.
    """
    counts: dict[str, int] = {}
    oracle_backed = _oracle_names()
    pattern = os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")
    for path in sorted(glob.glob(pattern)):
        try:
            with open(path, encoding="utf-8") as fh:
                report = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(report, dict):
            continue
        for name, result in report.items():
            if not isinstance(result, dict):
                continue
            # A crash or hash mismatch leaves the count unchanged. A
            # rows-only `no_oracle` round counts ONLY for queries that
            # still have no oracle today (they can never do better, and
            # must not camp in the window forever); for an oracle-backed
            # query it does NOT count — the query must sort back into
            # the driver's window so the hash match gets recorded by
            # the driver, not just by tools/driver_sim.
            err = result.get("err")
            ok = result.get("hash_match") is not False and (
                err is None
                or (err == "no_oracle" and name not in oracle_backed)
            )
            if ok:
                counts[name] = counts.get(name, 0) + 1
    return counts


def _ordered(names: list[str]) -> list[str]:
    # Stable sort: (times checked, registration index) — new/never-checked
    # queries keep their relative registration order at the front.
    checked = _times_driver_checked()
    return sorted(range(len(names)), key=lambda i: (checked.get(names[i], 0), i))


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (tpch, analytics, events, llmdata):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(
                f"query names registered in two modules: {sorted(overlap)}"
            )
        merged.update(mod.QUERIES)
    names = list(merged)
    return {names[i]: merged[names[i]] for i in _ordered(names)}


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in (tpch, analytics, events, llmdata):
        merged.update(mod.ORACLE)
    names = list(merged)
    return {names[i]: merged[names[i]] for i in _ordered(names) if names[i] in merged}

"""Rotation logic for the driver's 50-query correctness window.

The driver verifies the first 50 registered queries each round, so
``all_queries()`` must (a) float never-verified and previously-failed
queries to the front, and (b) advance automatically as the driver
commits new ``CORRECTNESS_r*.json`` reports — no hardcoded state.
"""

from __future__ import annotations

import json

from konohadataplatform_spark import queries as qreg


def _counts_from(tmp_path, reports):
    """Run _times_driver_checked against a synthetic repo root."""
    for name, payload in reports.items():
        (tmp_path / name).write_text(json.dumps(payload))
    orig_root = qreg._REPO_ROOT
    qreg._REPO_ROOT = str(tmp_path)
    qreg._times_driver_checked.cache_clear()
    try:
        return dict(qreg._times_driver_checked())
    finally:
        qreg._REPO_ROOT = orig_root
        qreg._times_driver_checked.cache_clear()


def test_counts_accumulate_across_rounds(tmp_path):
    ok = {"err": None, "hash_match": True}
    counts = _counts_from(
        tmp_path,
        {
            "CORRECTNESS_r01.json": {"qa": ok, "qb": ok},
            "CORRECTNESS_r02.json": {"qa": ok},
        },
    )
    assert counts == {"qa": 2, "qb": 1}


def test_failed_rounds_do_not_count(tmp_path):
    counts = _counts_from(
        tmp_path,
        {
            "CORRECTNESS_r01.json": {
                "crashed": {"err": "AnalysisException ...", "hash_match": None},
                "mismatched": {"err": None, "hash_match": False},
                # a name NOT in today's oracle registry: rows-only is
                # the best this query can ever do, so it counts (it
                # must not camp in the window forever)
                "rows_only": {"err": "no_oracle", "hash_match": None},
                # a REAL oracle-backed query recorded rows-only in an
                # old round (pre-graduation): does NOT count — it must
                # re-enter the window for a driver-recorded hash match
                "q_ann_lsh": {"err": "no_oracle", "hash_match": None},
                "green": {"err": None, "hash_match": True},
            }
        },
    )
    assert counts == {"rows_only": 1, "green": 1}


def test_unreadable_report_skipped(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    counts = _counts_from(
        tmp_path, {"CORRECTNESS_r02.json": {"qa": {"err": None, "hash_match": True}}}
    )
    assert counts == {"qa": 1}


def test_never_and_failed_queries_sort_first():
    # Against the real repo reports: every registered query exists, and
    # the first-50 window must contain only the least-verified queries.
    names = list(qreg.all_queries())
    checked = qreg._times_driver_checked()
    window = [checked.get(q, 0) for q in names[:50]]
    rest = [checked.get(q, 0) for q in names[50:]]
    assert max(window) <= min(rest)


def test_no_nested_output_schema_anywhere(spark):
    """The driver's canonicalizer pandas-sorts every output column, and
    pandas cannot sort list/map/struct values (``TypeError: unhashable
    type: 'list'`` — the exact r7 ``q_inverted_index`` failure). Guard
    the WHOLE registry: every driver-checked query must surface nested
    values as scalars (the ``q_nested_types`` convention — serialize
    with array_join / to_json before returning).

    Schema-only: ``.schema`` triggers analysis, not execution, so this
    covers all registered queries in seconds."""
    import os

    from pyspark.sql.types import ArrayType, MapType, StructType

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    offenders = []
    for name, fn in qreg.all_queries().items():
        schema = fn(spark, sf).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, (
        "driver canonicalizer cannot sort nested columns: "
        + "; ".join(offenders)
    )


def test_oracles_subset_of_queries():
    qs, oracles = qreg.all_queries(), qreg.all_oracles()
    assert set(oracles) <= set(qs)
    # Round 5 closed the rows-only set entirely: simhash (portable md5
    # token hash), ann-lsh (plane literals + fold-exact signatures),
    # and ann-ivf (exact-integer Lloyd training replayed as unrolled
    # CTEs) all graduated to oracle-checked.
    assert {q for q in qs if q not in oracles} == set()

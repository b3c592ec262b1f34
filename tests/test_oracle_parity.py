"""Oracle-parity gate: every queries() entry with an oracle_sql() entry
must match DuckDB exactly (row count + columns + values) — this mirrors
the driver's CORRECTNESS check, run locally at sf0.001 for speed.
"""

from __future__ import annotations

import pytest

from konohadataplatform_spark.queries import all_oracles, all_queries
from tests.conftest import SF_DIR, assert_oracle_match

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, duck, ORACLES[name], name=name)


def test_every_query_has_an_oracle():
    """The registry's standing contract: zero rows-only queries. If a
    query is ever added without an oracle, this fails loudly (and the
    weaker rows-only check below starts covering it)."""
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES)) or [None]
)
def test_rows_only(spark, name):
    if name is None:  # empty set: everything is oracle-checked above
        return
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

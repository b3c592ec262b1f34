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


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

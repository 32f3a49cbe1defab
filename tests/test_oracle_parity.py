"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's t2 gate (row-count + column names + order-insensitive
canonical values) so regressions surface locally before the round verify.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tools.oracle_check import compare_query

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_small):
    res = compare_query(name, QUERIES[name], ORACLES.get(name), spark, sf_small)
    assert res["status"] in ("MATCH", "rows-only", "TOLERANCE-MATCH"), res


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None

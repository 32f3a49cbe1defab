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


def test_gate_window_is_fully_oracled():
    """The driver's correctness gate records the first 50 registered queries;
    every slot must carry a hash oracle (VERDICT r02 #2). The r07 rows-only
    allowlist is deleted (VERDICT r07 #2): the r08 window is fully oracled,
    so any rows-only query appearing in-window is a hard failure."""
    names = list(QUERIES)
    assert names[:50] == entry_mod.GATE_WINDOW
    missing = [n for n in names[:50] if n not in ORACLES]
    assert not missing, f"gate-window queries without oracle: {missing}"


def test_all_queries_registered_exactly_once():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert set(ORACLES) <= set(names)

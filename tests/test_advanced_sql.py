"""Spark-4 SQL surface: Python UDTF (LATERAL) and WITH RECURSIVE.

The oracle checker covers value parity vs DuckDB at sf0.001/sf0.01; these
tests pin the semantics the oracle can't see: null/empty handling inside the
UDTF, equivalence of the shuffle-free UDTF to the explode→groupBy plan, and
the zero-fill/contiguity property of the recursive month spine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from arc_maskdata_pipeline_plugin_spark.plans.advanced_sql import (
    _UDTF_SCHEMA,
    TermFreqs,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a c a"),
            (2, "  x  y x  "),  # leading/trailing/run whitespace
            (3, None),  # null text -> no rows
            (4, "solo"),
            (5, "t t t t t t"),
        ],
        "doc_id bigint, text string",
    )


def _udtf_result(spark, docs):
    from pyspark.sql.functions import udtf

    spark.udtf.register("term_freqs_t", udtf(TermFreqs, returnType=_UDTF_SCHEMA))
    docs.createOrReplaceTempView("docs_udtf_t")
    return spark.sql(
        "SELECT s.* FROM docs_udtf_t d, LATERAL term_freqs_t(d.doc_id, d.text) s"
    )


def test_udtf_matches_explode_groupby(spark, docs):
    """The row-local UDTF aggregation must equal the shuffled formulation."""
    got = {tuple(r) for r in _udtf_result(spark, docs).collect()}
    tk = F.split(F.trim(F.col("text")), r"\s+")
    exploded = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.posexplode(tk).alias("pos", "term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.min("pos").cast("int").alias("first_pos"),
        )
    )
    want = {tuple(r) for r in exploded.collect()}
    assert got == want
    assert len(got) == len(_udtf_result(spark, docs).collect())  # no dup rows


def test_udtf_null_and_counts(spark, docs):
    rows = {(r.doc_id, r.term): (r.tf, r.first_pos) for r in _udtf_result(spark, docs).collect()}
    assert not any(d == 3 for d, _ in rows)  # null text yields nothing
    assert rows[(1, "a")] == (3, 0)
    assert rows[(1, "b")] == (1, 1)
    assert rows[(2, "x")] == (2, 0)
    assert rows[(5, "t")] == (6, 0)


def test_recursive_month_spine_contiguous(spark):
    """Spine has every calendar month between min and max, zero-filled."""
    from arc_maskdata_pipeline_plugin_spark.plans.advanced_sql import (
        q_recursive_month_spine,
    )

    out = q_recursive_month_spine(spark, "/root/testdata/sf0.001").collect()
    months = sorted(r.month for r in out)
    assert len(months) == len(set(months))
    # contiguity: every month from first to last appears exactly once
    y0, m0 = map(int, months[0].split("-"))
    y1, m1 = map(int, months[-1].split("-"))
    expected = (y1 - y0) * 12 + (m1 - m0) + 1
    assert len(months) == expected
    # zero-filled months carry exactly (0, 0.0)
    for r in out:
        if r.n_orders == 0:
            assert r.revenue == 0.0
        else:
            assert r.revenue > 0.0


def test_recursive_union_distinct_unsupported_documented(spark):
    """Pin the Spark limitation the module docstring relies on: if UNION
    (distinct) recursion ever becomes supported, revisit cyclic-graph
    fixpoints (connected components) as a recursive CTE."""
    with pytest.raises(Exception, match="UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"):
        spark.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT (n % 3) + 1 FROM t) "
            "SELECT * FROM t"
        ).collect()

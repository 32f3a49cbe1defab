"""Privacy-risk queries: k-anonymity / l-diversity audits + enforcement.

Ties the masking engine's column-level treatments (``MaskDataPlugin.scala``)
to table-level re-identification risk: after masking/generalizing, is the
released table actually safe to publish? QI choice below mirrors the classic
census-style setup — a geography (nation), a category (market segment), and
a banded numeric (account balance).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.privacy import (
    band,
    k_anonymity_audit,
    l_diversity_audit,
    suppress_small_classes,
)
from .registry import T, register

_K = 5
_L = 3


@register(
    "q_k_anonymity_audit",
    oracle=f"""
SELECT c_nationkey,
       c_mktsegment,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       COUNT(*) >= {_K} AS is_k_anonymous
FROM customer
GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 1000)
""",
)
def q_k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit of the customer table under the QI tuple
    (nation, market segment, account-balance band): one row per equivalence
    class with its size and releasability at k=5. Exactly one map-side-
    combined hash aggregate — the cheapest possible full-table risk
    statistic, no joins or windows (see ``operators/privacy.py``)."""
    cust = T(spark, sf_dir, "customer").withColumn(
        "bal_band", band("c_acctbal", 1000)
    )
    return k_anonymity_audit(
        cust.select("c_nationkey", "c_mktsegment", "bal_band"),
        ["c_nationkey", "c_mktsegment", "bal_band"],
        _K,
    )


@register(
    "q_l_diversity_audit",
    oracle=f"""
SELECT c_nationkey,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
       COUNT(DISTINCT c_mktsegment) >= {_L} AS is_l_diverse
FROM customer
GROUP BY c_nationkey, floor(c_acctbal / 1000)
""",
)
def q_l_diversity_audit(spark, sf_dir):
    """Distinct l-diversity audit with market segment as the sensitive
    attribute and (nation, balance band) as the QI: a class that is
    k-anonymous but single-segment still leaks every member's segment (the
    homogeneity attack). One hash aggregate with an exact COUNT(DISTINCT)."""
    cust = T(spark, sf_dir, "customer").withColumn(
        "bal_band", band("c_acctbal", 1000)
    )
    return l_diversity_audit(
        cust.select("c_nationkey", "bal_band", "c_mktsegment"),
        ["c_nationkey", "bal_band"],
        "c_mktsegment",
        _L,
    )


@register(
    "q_k_anonymity_suppress",
    oracle=f"""
WITH sized AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS class_n
  FROM customer
)
SELECT c_custkey,
       CASE WHEN class_n >= {_K} THEN CAST(c_nationkey AS VARCHAR) ELSE '*' END
         AS c_nationkey,
       CASE WHEN class_n >= {_K} THEN c_mktsegment ELSE '*' END
         AS c_mktsegment,
       class_n >= {_K} AS is_released
FROM sized
""",
)
def q_k_anonymity_suppress(spark, sf_dir):
    """k-anonymity ENFORCEMENT: records whose (nation, segment) equivalence
    class has fewer than k=5 members get their QI columns suppressed to '*';
    all other records release their QI values unchanged. One co-partitioned
    window shuffle with no sort (unordered COUNT frame) — policy application
    costs the same single shuffle as the audit."""
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    out = suppress_small_classes(cust, ["c_nationkey", "c_mktsegment"], _K)
    return out.select("c_custkey", "c_nationkey", "c_mktsegment", "is_released")

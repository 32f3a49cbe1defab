"""Privacy-risk analytics: k-anonymity and l-diversity over quasi-identifiers.

The reference engine masks individual columns (``MaskDataPlugin.scala:60-65``)
but offers no way to MEASURE re-identification risk of the released table.
These operators close that loop: group records by their quasi-identifier (QI)
tuple into equivalence classes, audit class sizes (k-anonymity, Sweeney 2002)
and sensitive-value diversity (l-diversity, Machanavajjhala et al. 2007), and
enforce a policy by suppressing the QI columns of records whose class is too
small to release.

Scale shape (100 TB):

* Audits are ONE hash-aggregate on the QI tuple with map-side combine — the
  cheapest possible full-table statistic. No joins, no windows.
* Enforcement needs each record to see its own class size. A window
  ``count(*) over (partition by QI)`` does that with a single co-partitioned
  shuffle and NO sort (count over an unordered frame is hash-based) — the
  same shuffle the audit pays, so policy application is not more expensive
  than measurement. The class table is never collected to the driver.
* Generalization (value → band) is a pure projection, so iterating "widen the
  bands until the k-anonymous fraction clears the bar" re-pays only scan +
  one shuffle per level, and each level's audit is independent — levels can
  run in one job over a ``GROUPING SETS`` if desired.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band(col: str | Column, width: int) -> Column:
    """Generalize a numeric column into fixed-width bands (floor division).

    ``band(acctbal, 1000)`` maps 3456.78 → 3, -12.5 → -1: the standard
    numeric generalization step of a k-anonymity ladder. Exact for doubles
    whose banded quotient is far from an integer boundary relative to double
    precision — and identical in DuckDB, which evaluates the same
    ``floor(x / width)`` expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / F.lit(width)).cast("bigint")


def equivalence_classes(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """One row per QI equivalence class with its size (the k-anonymity
    statistic). Single hash-aggregate, map-side combined."""
    return df.groupBy(*qi_cols).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


def k_anonymity_audit(df: DataFrame, qi_cols: list[str], k: int) -> DataFrame:
    """Per-class audit: size and whether the class meets the k threshold."""
    return equivalence_classes(df, qi_cols).select(
        *qi_cols,
        "n",
        (F.col("n") >= F.lit(k)).alias("is_k_anonymous"),
    )


def l_diversity_audit(
    df: DataFrame, qi_cols: list[str], sensitive: str, l: int
) -> DataFrame:
    """Per-class audit of sensitive-attribute diversity.

    A class can be k-anonymous yet leak the sensitive value outright when all
    its members share it (the homogeneity attack); distinct l-diversity is
    the standard counter-measure. ``count(distinct sensitive)`` per QI class
    is exact and engine-portable.
    """
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(sensitive).cast("bigint").alias("n_sensitive"),
        )
        .select(
            *qi_cols,
            "n",
            "n_sensitive",
            (F.col("n_sensitive") >= F.lit(l)).alias("is_l_diverse"),
        )
    )


def suppress_small_classes(
    df: DataFrame, qi_cols: list[str], k: int, token: str = "*"
) -> DataFrame:
    """Enforce k-anonymity by suppressing QI columns of under-k records.

    Records whose equivalence class has fewer than ``k`` members get every QI
    column replaced by ``token`` (cast to string — suppression changes the
    release schema by design, as in ARX/Amnesia-style anonymizers); records
    in releasable classes keep their (stringified) QI values. Non-QI columns
    pass through untouched.

    One window shuffle on the QI tuple; no sort (unordered COUNT frame).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*qi_cols)
    class_n = F.count(F.lit(1)).over(w)
    out_cols: list[Column] = []
    for name in df.columns:
        if name in qi_cols:
            out_cols.append(
                F.when(class_n >= F.lit(k), F.col(name).cast("string"))
                .otherwise(F.lit(token))
                .alias(name)
            )
        else:
            out_cols.append(F.col(name))
    return df.select(*out_cols, (class_n >= F.lit(k)).alias("is_released"))

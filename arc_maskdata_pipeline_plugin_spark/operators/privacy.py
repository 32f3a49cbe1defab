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


def t_closeness_audit(
    df: DataFrame, qi_cols: list[str], sensitive: str, t_fp9: int
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007): a class
    passes when the total-variation distance between ITS sensitive-attribute
    distribution and the GLOBAL one is <= t. k-anonymity bounds re-identifiability
    and l-diversity bounds homogeneity, but a class can satisfy both while its
    sensitive distribution still leaks (skewness attack) — TVD closes that gap
    for unordered categoricals.

    Exactness at scale: TVD = (1/2)·Σ_s |n_cs/n_c − n_gs/n_g| is computed over
    the COMMON denominator n_c·n_g, so every per-segment term
    |n_cs·n_g − n_gs·n_c| is an exact integer; terms sum in DECIMAL(38,0)
    (order-independent) and ONE floor-division to fp9 closes the class — no
    double is ever summed, so the audit is bit-stable across engines and
    partitionings.

    Plan shape: one hash aggregate on (QI, sensitive) with map-side combine;
    everything after (class totals, global marginals, the class x |S| grid)
    is class-frame-sized, joined broadcast.
    """
    cls = df.groupBy(*qi_cols, sensitive).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cs")
    )
    totals = cls.groupBy(*qi_cols).agg(F.sum("n_cs").cast("bigint").alias("n_c"))
    marg = cls.groupBy(sensitive).agg(F.sum("n_cs").cast("bigint").alias("n_gs"))
    ntot = marg.agg(F.sum("n_gs").cast("bigint").alias("n_g"))
    grid = (
        totals.crossJoin(F.broadcast(marg))
        .join(cls, [*qi_cols, sensitive], "left")
        .withColumn("n_cs", F.coalesce(F.col("n_cs"), F.lit(0)))
        .crossJoin(F.broadcast(ntot))
    )
    term = F.abs(
        F.col("n_cs").cast("decimal(38,0)") * F.col("n_g")
        - F.col("n_gs").cast("decimal(38,0)") * F.col("n_c")
    )
    agg = grid.groupBy(*qi_cols, "n_c", "n_g").agg(
        F.sum(term).alias("tvd_num")
    )
    # Final division in DOUBLE, not decimal: Spark and DuckDB round decimal
    # quotients to different scales, but both run the same IEEE ops on the
    # same inputs — the floored fp9 value is cross-engine identical.
    tvd_fp9 = F.floor(
        F.col("tvd_num").cast("double")
        * 1_000_000_000.0
        / (F.lit(2.0) * F.col("n_c") * F.col("n_g"))
    ).cast("bigint")
    return agg.select(
        *qi_cols,
        F.col("n_c").alias("n"),
        tvd_fp9.alias("tvd_fp9"),
        (tvd_fp9 <= F.lit(t_fp9)).alias("is_t_close"),
    )

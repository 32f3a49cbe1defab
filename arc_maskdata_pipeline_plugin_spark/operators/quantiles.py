"""Grouped quantiles — sketch-first, exact as the explicit opt-in.

The DEFAULT path is Spark's Greenwald-Khanna sketch (``approx_percentile``):
one pass, mergeable partial state (map-side combine works), memory bounded by
``1/accuracy`` per group instead of by group size. That is the only shape
that survives a skewed 100 TB group key.

``exact=True`` opts into the ``applyInPandas`` UDAF path, which materializes
each WHOLE group as one Arrow batch on one executor: correct and bit-exact
(linear-interpolated, matches ``quantile_cont``) for bounded group
cardinalities, but a group whose values exceed executor memory OOMs — that
is the documented bound, not a corner case, on skewed keys at scale. Use it
when an oracle-exact answer over known-small groups is required
(VERDICT r01: sketch-default, exact-opt-in).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _default_name(p: float) -> str:
    """``0.5 -> q50``, ``0.975 -> q97_5`` — the full probability, so distinct
    probabilities never collide."""
    s = f"{p * 100:.10f}".rstrip("0").rstrip(".")
    return "q" + s.replace(".", "_")


def grouped_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probabilities: Sequence[float],
    out_cols: Sequence[str] | None = None,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """One row per group: ``keys…, <out_cols…> double, n bigint``.

    NULLs in ``value_col`` are skipped on BOTH paths (``approx_percentile``
    skips them natively; the exact UDF drops them before ``np.percentile``,
    which would otherwise propagate NaN across the whole group). ``n`` counts
    all rows including NULL-valued ones. Default column names carry the full
    probability (``q97_5`` for 0.975), not a truncated percent — 0.975 and
    0.97 must not both become ``q97``."""
    out_cols = list(out_cols or (_default_name(p) for p in probabilities))
    if len(out_cols) != len(probabilities):
        raise ValueError("out_cols must match probabilities")
    if len(set(out_cols)) != len(out_cols):
        raise ValueError(f"duplicate quantile column names: {out_cols}")

    if not exact:
        probs_sql = ", ".join(repr(float(p)) for p in probabilities)
        agg = df.groupBy(*keys).agg(
            F.expr(
                f"approx_percentile({value_col}, array({probs_sql}), {accuracy})"
            ).alias("_qs"),
            F.count(F.lit(1)).alias("n"),
        )
        return agg.select(
            *keys,
            *[
                F.col("_qs")[i].cast("double").alias(c)
                for i, c in enumerate(out_cols)
            ],
            "n",
        )

    import numpy as np
    import pandas as pd

    key_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"{k} {key_fields[k]}" for k in keys]
        + [f"{c} double" for c in out_cols]
        + ["n bigint"]
    )
    pcts = [p * 100 for p in probabilities]

    # No type hints on purpose: Spark tries to infer the eval type from them
    # and warns on anything it can't parse; the (fn, schema) call form needs
    # none.
    def quantiles(key, pdf):
        # dropna: np.percentile propagates NaN for ANY null in the group,
        # while approx_percentile skips nulls — keep the paths consistent
        vals_in = pdf[value_col].dropna()
        if len(vals_in):
            vals = np.percentile(vals_in, pcts)  # linear interp = quantile_cont
        else:
            vals = [None] * len(pcts)
        return pd.DataFrame(
            [[*key, *vals, len(pdf)]], columns=[*keys, *out_cols, "n"]
        )

    return (
        df.select(*keys, value_col)
        .groupBy(*keys)
        .applyInPandas(quantiles, schema)
    )


# ---------------------------------------------------------------------------
# Threshold seam for the exact-rank percentile family (VERDICT r04 #7):
# winsorize / quantile-normalize / equi-depth share this helper. Two modes:
#
# * mode="exact" (default) — PERCENTILE_DISC semantics: the threshold for
#   probability p is the smallest value whose cumulative count reaches
#   ceil(p * n), from cumulative counts over the DISTINCT-value frame
#   (bounded by value cardinality; the corpus is never globally sorted).
#   Engine-exact, DuckDB-oracle-checkable.
# * mode="approx" — one ``percentile_approx`` aggregate (mergeable GK
#   partials): no window, no distinct-value frame, O(accuracy) state at any
#   cardinality. The 100 TB path for near-unique metrics; rank error
#   <= n/accuracy makes it rows-only across engines.
# ---------------------------------------------------------------------------


def quantile_thresholds(
    df: DataFrame,
    value_col: str,
    probs: dict[str, float],
    group_cols: tuple[str, ...] = (),
    mode: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Thresholds for the given probabilities over an integer value column.

    probs maps output column name -> probability in (0, 1]. Output: one row
    per group (a single global row when ``group_cols`` is empty) carrying
    ``group_cols`` plus one BIGINT column per probs entry.
    """
    gc = list(group_cols)
    if mode == "approx":
        names = list(probs)
        pcts = F.percentile_approx(
            F.col(value_col), [probs[k] for k in names], accuracy
        )
        agg = df.groupBy(*gc).agg(pcts.alias("_q"))
        return agg.select(
            *gc,
            *[F.col("_q")[i].cast("bigint").alias(k) for i, k in enumerate(names)],
        )
    if mode != "exact":
        raise ValueError(f"unknown quantile mode: {mode!r}")
    cnt = df.groupBy(*gc, value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    totals = cnt.groupBy(*gc).agg(F.sum("_n").alias("_total"))
    if gc:
        wc = (
            Window.partitionBy(*gc)
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            cnt.join(F.broadcast(totals), gc).select(
                *gc,
                value_col,
                F.sum("_n").over(wc).alias("_r"),
                F.col("_total"),
            )
        )
    else:
        # ungrouped: the distinct-value frame grows with the data, so the
        # cumulative counts run as two-phase bucketed windows instead of an
        # Exchange SinglePartition over the whole value frame; persisted —
        # consumers: boundary sketch, bucketed windows, per-bucket totals
        from ..cache import persisted
        from ..plans.twophase import global_cumsums

        cnt = cnt.transform(persisted)
        cum = (
            global_cumsums(cnt, [value_col], {"_r": ("_n", "incl")})
            .crossJoin(F.broadcast(totals))
            .select(value_col, "_r", "_total")
        )
    return cum.groupBy(*gc).agg(
        *[
            F.min(
                F.when(
                    F.col("_r") >= F.ceil(F.lit(p) * F.col("_total")).cast("bigint"),
                    F.col(value_col),
                )
            )
            .cast("bigint")
            .alias(name)
            for name, p in probs.items()
        ]
    )

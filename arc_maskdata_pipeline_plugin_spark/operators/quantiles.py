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

from pyspark.sql import DataFrame
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

"""Plan-embedded metrics via ``Dataset.observe`` — the zero-cost version of
the reference's stage instrumentation.

The reference's ``MaskDataTransform`` measures stages by ``persist()`` +
``count()`` (`MaskDataTransform.scala:162-169`) — an extra ACTION per stage.
``observe`` attaches aggregate expressions to the plan itself: metrics are
collected DURING the one real action, cost nothing extra, and work on both
batch (via ``Observation``) and Structured Streaming (via each progress
update's ``observedMetrics``). This is how a 100 TB pipeline gets row
counts, null rates, and domain checks without a second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_metrics(df: DataFrame, columns: list[str] | None = None) -> list:
    """Standard stage metrics: row count plus per-column null counts."""
    cols = columns if columns is not None else df.columns
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
        for c in cols
    ]
    return metrics


def observe_stage(df: DataFrame, name: str, *metrics, columns: list[str] | None = None):
    """Attach stage metrics to a batch DataFrame's plan.

    Returns ``(observed_df, observation)``: run any action on the returned
    frame, then read ``observation.get`` — no extra job, no persist. For
    custom checks pass aggregate Columns as ``*metrics`` (defaults to
    ``quality_metrics``)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    mets = list(metrics) or quality_metrics(df, columns)
    return df.observe(obs, *mets), obs


def observe_stream(df: DataFrame, name: str, *metrics, columns: list[str] | None = None) -> DataFrame:
    """Attach the same metrics to a STREAMING DataFrame: each micro-batch's
    values surface in ``StreamingQueryProgress.observedMetrics[name]``
    (string-name registration — the ``Observation`` helper is batch-only)."""
    mets = list(metrics) or quality_metrics(df, columns)
    return df.observe(name, *mets)

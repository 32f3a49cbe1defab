"""Join operators Spark lacks natively: as-of join and bounded range join.

As-of join (latest right row with ``right_ts <= left_ts`` per key) is
implemented with the union+window technique rather than a theta join:

    tag left/right → align schemas → union → one window over
    (key ORDER BY ts, right-before-left) carrying last non-null right payload
    → keep left rows.

Cost: ONE shuffle on the key (the union sorts within partitions), versus a
range theta-join's per-key cross product — the difference between hours and
minutes at 100 TB. DuckDB's native ``ASOF JOIN`` provides the oracle.

Range join: kept as an equi-join on key + range predicate so Spark plans a
hash join with the range as a post-filter; for key-less pure range joins,
bucketize the range into join keys first (not needed by current queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row (right_ts ≤
    left_ts) with the same key. Inner semantics: unmatched left rows drop
    (DuckDB ASOF JOIN equivalent)."""
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    carried = [right_ts] + right_cols
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carried],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            l_tagged.schema["_lpay"].dataType
        ).alias("_lpay"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts → ties match (ASOF ≤)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in carried
        ],
    )
    out = filled.filter(F.col("_is_left") == 1).filter(
        F.col(f"_m_{right_ts}").isNotNull()
    )
    result_cols = [F.col(f"_lpay.{c}").alias(c) for c in left.columns]
    result_cols += [
        F.col(f"_m_{c}").alias(c + suffix if c in left.columns else c) for c in carried
    ]
    return out.select(result_cols)


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    max_gap_seconds: int,
    id_col: str,
) -> DataFrame:
    """Self range-join: ordered pairs (a, b) with the same key where
    ``ts_a ≤ ts_b ≤ ts_a + gap``. Planned as an equi-join on the key with the
    range predicate applied post-join; AQE handles key skew."""
    a = df.select(
        F.col(key).alias("k"), F.col(ts).alias("ts_a"), F.col(id_col).alias("id_a")
    )
    b = df.select(
        F.col(key).alias("k"), F.col(ts).alias("ts_b"), F.col(id_col).alias("id_b")
    )
    return a.join(b, "k").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("ts_b") >= F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {max_gap_seconds} SECONDS"))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated shuffle join: split each hot key's left rows across
    ``n_salts`` shuffle partitions, replicate the right side once per salt.

    The classic remedy when ONE key carries a disproportionate share of a
    100 TB fact table and a single reducer becomes the stragglers' straggler:
    shuffle cost rises by ×``n_salts`` on the (smaller) right side, while the
    hot key's work fans out over ``n_salts`` tasks. Results are identical to
    a plain join for every ``how`` that doesn't need to observe unmatched
    RIGHT rows (inner/left) — each right row meets each left row exactly
    once, because a left row holds exactly one salt value.

    AQE's skew-join handles most cases adaptively (enabled in the session
    factory); explicit salting remains the tool when skew is known up front
    or the join sits below operators AQE won't split."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: right/full/"
            "semi would observe the replicated right side (n_salts copies of "
            "unmatched right rows) and return wrong results"
        )
    salt = F.pmod(F.xxhash64(F.col(left_key), F.monotonically_increasing_id()), F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = l_salted.join(
        r_salted,
        (F.col(left_key) == F.col(right_key)) & (l_salted["_salt"] == r_salted["_salt"]),
        how,
    )
    return joined.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-bucketed) table.

    Bucketing pre-shuffles the data ONCE at write time: two tables bucketed
    the same way on their join key then sort-merge-join with ZERO runtime
    Exchange — the pattern for a 100 TB fact table that is joined on the
    same key by every downstream query. ``sort_cols`` additionally skips the
    runtime Sort. (See tests/test_bucketed_join.py for the plan assertion.)
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def _parse_bytes(raw: str) -> int:
    """Spark size-conf strings: '10485760', '10485760b', '10MB', '1g'."""
    s = raw.strip().lower()
    for suffix, mult in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(s)


def choose_join_strategy(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    how: str = "inner",
    broadcast_bytes: int | None = None,
    skew_share: float = 0.2,
    sample_fraction: float = 0.01,
    n_salts: int = 16,
) -> tuple[DataFrame, dict]:
    """Pick plain / broadcast / salted for a fact⋈dim join from MEASURED
    statistics, and return (joined, decision-audit).

    The decision inputs are the cheap ones a planner can afford at 100 TB:

    * dim size from **Catalyst's optimized-plan statistics** (file-footer
      based — no job, no action) against the session's
      ``autoBroadcastJoinThreshold`` (or an explicit ``broadcast_bytes``);
    * fact-key skew from a **sampled** key histogram (one job over
      ``sample_fraction`` of the fact): if the hottest key holds more than
      ``skew_share`` of sampled rows, a single reducer would own that share
      of the shuffle — salt it.

    Priority: broadcast beats salting (a broadcast join has no shuffle to
    skew). The audit dict records what was measured and why, so pipelines
    can log the decision — the operator-level version of what AQE does at
    runtime, usable when the strategy must be fixed at plan time (e.g. to
    feed `write_bucketed`, or on engines/configs without AQE)."""
    dim_key = dim_key or fact_key
    if broadcast_bytes is None:
        raw = fact.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
        broadcast_bytes = _parse_bytes(raw)
    dim_bytes = int(
        dim._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    decision = {
        "dim_bytes_estimate": dim_bytes,
        "broadcast_threshold": broadcast_bytes,
        "sampled_top_share": None,
        "strategy": None,
    }
    if 0 < dim_bytes <= broadcast_bytes:
        decision["strategy"] = "broadcast"
        joined = fact.join(
            F.broadcast(dim), fact[fact_key] == dim[dim_key], how
        )
        return joined, decision

    stats_row = (
        fact.sample(fraction=sample_fraction, seed=7)
        .groupBy(fact_key)
        .count()
        .agg(F.max("count").alias("top"), F.sum("count").alias("total"))
        .collect()[0]
    )  # ONE sampled job for both the mode and the denominator
    top = int(stats_row["top"] or 0)
    total = max(1, int(stats_row["total"] or 0))
    decision["sampled_top_share"] = round(top / total, 4)
    if top / total > skew_share:
        decision["strategy"] = f"salted({n_salts})"
        joined = salted_join(fact, dim, fact_key, dim_key, n_salts=n_salts, how=how)
    else:
        decision["strategy"] = "plain"
        joined = fact.join(dim, fact[fact_key] == dim[dim_key], how)
    return joined, decision

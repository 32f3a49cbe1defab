"""Property tests for the round-7 closed-form/sequential operators.

Few examples (Spark round-trip per example is seconds), high-value
invariants: the water-filling closed form must equal the iterative
reference allocator on random cap vectors, and the SPRT decision stream
must equal a plain-Python Wald replay on random Bernoulli streams.
"""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def cap_vectors(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    return draw(
        st.lists(st.integers(min_value=1, max_value=2000), min_size=n, max_size=n)
    )


def _reference_waterfill(caps, budget):
    """Iterative reference: raise the level until the budget is spent."""
    n = len(caps)
    alloc = [0] * n
    remaining = budget
    active = list(range(n))
    while remaining > 0 and active:
        # saturate any source whose cap is below the equal share
        share = remaining // len(active)
        if share == 0:
            break
        sat = [i for i in active if caps[i] - alloc[i] <= share]
        if sat:
            for i in sat:
                remaining -= caps[i] - alloc[i]
                alloc[i] = caps[i]
            active = [i for i in active if i not in sat]
        else:
            for i in active:
                alloc[i] += share
                remaining -= share
            break
    # remainder: one extra token to the first `remaining` active sources in
    # (cap, index) order — matches the query's deterministic distribution
    order = sorted(active, key=lambda i: (caps[i], i))
    for j in range(min(remaining, len(order))):
        alloc[order[j]] += 1
    return alloc


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(caps=cap_vectors())
def test_waterfill_matches_iterative_reference(spark, tmp_path, caps):
    from arc_maskdata_pipeline_plugin_spark.plans.training2 import (
        q_token_budget_waterfill,
    )

    rows = [
        (i, " ".join(["w"] * c), "en", f"s{i:02d}", c) for i, c in enumerate(caps)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out_dir = tmp_path / f"wf_{hash(tuple(caps)) & 0xFFFF}"
    out_dir.mkdir()
    df.write.mode("overwrite").parquet(str(out_dir / "documents.parquet"))
    got = {
        r.source: r for r in q_token_budget_waterfill(spark, str(out_dir)).collect()
    }
    budget = sum(caps) * 3 // 5
    ref = _reference_waterfill(caps, budget)
    for i, c in enumerate(caps):
        r = got[f"s{i:02d}"]
        assert r.cap_tokens == c
        assert r.alloc_tokens == ref[i], (caps, budget, ref, r)
        assert r.total_allocated == budget


@st.composite
def daily_streams(draw):
    n_days = draw(st.integers(min_value=2, max_value=8))
    return [
        (draw(st.integers(min_value=1, max_value=12)),
         draw(st.integers(min_value=0, max_value=12)))
        for _ in range(n_days)
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stream=daily_streams())
def test_sprt_matches_python_wald_replay(spark, tmp_path, stream):
    """stream = [(n_trials, k_successes_bounded)] per day; the query's
    cumulative LLR and decisions must equal a plain-Python Wald replay."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats5 import (
        _C1,
        _C2,
        _LN_A,
        _LN_B,
        q_sprt_ab,
    )

    rows, eid = [], 0
    for d, (n, k) in enumerate(stream, start=1):
        k = min(k, n)
        for i in range(n):
            etype = "purchase" if i < k else "view"
            ts = datetime.datetime(2024, 1, d, 9, 0, tzinfo=datetime.timezone.utc)
            rows.append((eid, ts, i, etype, 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out_dir = tmp_path / f"sprt_{eid}_{hash(tuple(stream)) & 0xFFFF}"
    out_dir.mkdir()
    df.write.mode("overwrite").parquet(str(out_dir / "events.parquet"))
    out = sorted(q_sprt_ab(spark, str(out_dir)).collect(), key=lambda r: r.day)
    c1, c2, ln_a, ln_b = float(_C1), float(_C2), float(_LN_A), float(_LN_B)
    n_cum = k_cum = 0
    for r, (n, k) in zip(out, stream):
        k = min(k, n)
        n_cum += n
        k_cum += k
        assert (r.n_cum, r.k_cum) == (n_cum, k_cum)
        llr = k_cum * c1 + (n_cum - k_cum) * c2
        assert r.llr_fp6 == math.floor(llr * 1_000_000)
        expect = (
            "reject_h0" if llr >= ln_a else ("accept_h0" if llr <= ln_b else "continue")
        )
        assert r.decision == expect

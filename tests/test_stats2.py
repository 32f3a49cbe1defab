"""Independent numpy cross-checks for the one-pass moment statistics.

The DuckDB oracles prove cross-engine agreement of the SAME formulas; these
tests verify the formulas themselves against numpy's reference
implementations (polyfit / corrcoef / cov) on the real parquet data.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
QUERIES = entry_mod.queries()


def test_group_ols_matches_numpy(spark):
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["q_group_ols"](spark, SF).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT l_returnflag, l_quantity, l_extendedprice "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    for flag, grp in data.groupby("l_returnflag"):
        x = (grp["l_quantity"].to_numpy() * 100).round()
        y = (grp["l_extendedprice"].to_numpy() * 100).round()
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        got = rows[flag]
        assert got["n"] == len(grp)
        # fp6 columns are floor(x * 1e6): compare at the fixed-point
        # resolution plus numpy's own solver noise on near-collinear data
        assert got["slope_fp6"] / 1e6 == pytest.approx(slope, abs=2e-6, rel=1e-5)
        assert got["intercept_fp6"] / 1e6 == pytest.approx(
            intercept / 100, abs=2e-6, rel=1e-4
        )
        assert got["r2_fp6"] / 1e6 == pytest.approx(r * r, abs=2e-6)


def test_embedding_covariance_matches_numpy(spark):
    cells = {
        (r["i"], r["j"]): r["cov_fp9"]
        for r in QUERIES["q_embedding_covariance"](spark, SF).collect()
    }
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT embedding FROM read_parquet('{SF}/embeddings.parquet') "
        f"ORDER BY vec_id"
    ).fetchall()
    m = np.floor(np.array([e[0] for e in emb], dtype=np.float64)[:, :8] * 1e6)
    cov = np.cov(m, rowvar=False, bias=True) / 1e12  # population covariance
    for (i, j), fp9 in cells.items():
        assert fp9 / 1e9 == pytest.approx(cov[i, j], abs=2e-9)


def test_mad_outliers_matches_numpy(spark):
    rows = {
        r["event_type"]: r
        for r in QUERIES["q_mad_outliers"](spark, SF).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT event_type, value FROM read_parquet('{SF}/events.parquet')"
    ).df()
    for etype, grp in data.groupby("event_type"):
        v = grp["value"].to_numpy()
        med = np.percentile(v, 50, method="linear")
        absdev = np.abs(v - med)
        mad = np.percentile(absdev, 50, method="linear")
        n_out = int((absdev > 3 * 1.4826 * mad).sum())
        got = rows[etype]
        assert got["med_fp6"] / 1e6 == pytest.approx(med, abs=2e-6)
        assert got["mad_fp6"] / 1e6 == pytest.approx(mad, abs=2e-6)
        assert got["n_outliers"] == n_out

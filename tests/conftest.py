from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# Reference-parity test env (reference: build.sbt:21-30) — set before any
# engine import so codec registration sees it.
os.environ.setdefault(
    "ETL_CONF_MASK_DATA_PASSPHRASE",
    "q7VqMTbj7e5dUWESfc8UjZr2r7pyq5cHP8MVkUEjyv74cHsqUt734vg6qQmHaz7a",
)
os.environ.setdefault("ETL_CONF_MASK_DATA_CODEC", "PBKDF2WithHmacSHA512")
os.environ.setdefault("ETL_CONF_MASK_DATA_PBKDF2_ITERATIONS", "1024")
os.environ.setdefault("ETL_CONF_MASK_DATA_SCRYPT_CPU", "1024")
os.environ.setdefault("ETL_CONF_MASK_DATA_SCRYPT_MEMORY", "8")
os.environ.setdefault("ETL_CONF_MASK_DATA_SCRYPT_PARALLELISM", "1")

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from arc_maskdata_pipeline_plugin_spark import get_spark

    # local[8] (r13; was local[4]): the ~1330-test suite exceeded the round
    # driver's pytest budget (VERIFY_r12 truncated at ~97%); doubling the
    # test session's cores cuts the Spark-action-bound wall clock without
    # touching semantics. shuffle_partitions stays 8 — the plan-invariant
    # bounds are written against 8 post-shuffle partitions, and all
    # plan-sensitive suites (plan_invariants*, config_matrix*,
    # plan_sha_stability) pass unchanged under local[8].
    spark = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(autouse=True)
def _clear_spark_cache(request):
    """Queries that persist internal fragments (LM vocab frames, SemDeDup
    member store, RFM range frame, shingle caches) REGISTER those caches in
    the shared session's cache manager the moment the plan is BUILT — and a
    later test's plan containing the same logical fragment then shows
    InMemoryTableScan instead of the parquet scan (the cross-query plan
    pollution ADVICE r04 flagged; oracle_check/plan_audit/bench all clear
    between queries for the same reason). Clear after every test so plan
    audits always see cold plans."""
    yield
    from arc_maskdata_pipeline_plugin_spark.cache import release_persisted

    release_persisted()  # empty the tracking list too, not just the cache
    spark = request.node.funcargs.get("spark")
    if spark is not None:
        spark.catalog.clearCache()


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium():
    return SF_MEDIUM

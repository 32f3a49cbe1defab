"""Mask-function tests: pure-Python semantics + registered-UDF SQL behavior.

Mirrors the reference suite's coverage (MaskDataPluginSuite.scala: NULL→NULL,
deterministic vs non-deterministic, custom alphabet, date/timestamp/decimal,
composition with date_trunc) plus value-level invariants the reference never
asserted (SURVEY.md §5: "no value assertions" in the reference's tests).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pandas as pd
import pytest

from arc_maskdata_pipeline_plugin_spark.codecs.pbkdf2 import PBKDF2WithHmacSHA512
from arc_maskdata_pipeline_plugin_spark.functions.masking import (
    DEFAULT_ALPHABET,
    apply_format,
    encode_as_string,
    java_rem,
    java_timestamp_str,
    mask_date_value,
    mask_decimal_value,
    mask_string_value,
    mask_timestamp_value,
    register_udfs,
)

PASSPHRASE = b"q7VqMTbj7e5dUWESfc8UjZr2r7pyq5cHP8MVkUEjyv74cHsqUt734vg6qQmHaz7a"


@pytest.fixture(scope="module")
def codec():
    return PBKDF2WithHmacSHA512()


# ---------------------------------------------------------------------------
# pure-function semantics
# ---------------------------------------------------------------------------


def test_encode_as_string_java_abs_edge():
    # Java Math.abs(-128.toInt) = 128 → index 128 % len, NOT 0
    alphabet = "abcdefghij"
    assert encode_as_string(bytes([0x80]), alphabet) == alphabet[128 % 10]
    assert encode_as_string(bytes([0xFF]), alphabet) == alphabet[1]  # -1 → 1
    assert encode_as_string(bytes([5]), alphabet) == alphabet[5]


def test_java_rem_sign_follows_dividend():
    assert java_rem(7, 3) == 1
    assert java_rem(-7, 3) == -1
    assert java_rem(-6, 3) == 0


def test_java_timestamp_str():
    assert java_timestamp_str(pd.Timestamp("2016-07-30 22:23:45")) == "2016-07-30 22:23:45.0"
    assert (
        java_timestamp_str(pd.Timestamp("2016-07-30 22:23:45.123450"))
        == "2016-07-30 22:23:45.12345"
    )


def test_mask_string_value(codec):
    m = mask_string_value(codec, PASSPHRASE, 16, DEFAULT_ALPHABET, None, True, "important")
    assert len(m) == 16 and all(c in DEFAULT_ALPHABET for c in m)
    assert m == mask_string_value(codec, PASSPHRASE, 16, DEFAULT_ALPHABET, None, True, "important")
    assert mask_string_value(codec, PASSPHRASE, 16, DEFAULT_ALPHABET, None, True, None) is None
    digits = mask_string_value(codec, PASSPHRASE, 16, "0123456789", None, True, "important")
    assert len(digits) == 16 and digits.isdigit()
    # non-deterministic varies
    a = mask_string_value(codec, PASSPHRASE, 16, DEFAULT_ALPHABET, None, False, "important")
    b = mask_string_value(codec, PASSPHRASE, 16, DEFAULT_ALPHABET, None, False, "important")
    assert a != b


def test_mask_string_length_honored_and_bounded(codec):
    assert len(mask_string_value(codec, PASSPHRASE, 4, DEFAULT_ALPHABET, None, True, "v")) == 4
    with pytest.raises(ValueError, match="cannot produce required 65"):
        mask_string_value(codec, PASSPHRASE, 65, DEFAULT_ALPHABET, None, True, "v")


def test_mask_string_format(codec):
    m = mask_string_value(
        codec, PASSPHRASE, 16, "0123456789", "4xxx-xxxx-xxxx-xxxx", True, "important"
    )
    assert len(m) == len("4xxx-xxxx-xxxx-xxxx")
    assert m[0] == "4" and m[4] == "-"
    assert m.replace("-", "")[1:].isdigit()
    assert apply_format("ABCDEF", "xx-xx", "t") == "AB-CD"


def test_mask_date_bounded_shift(codec):
    d = dt.date(2016, 7, 30)
    masked = mask_date_value(codec, PASSPHRASE, 365, True, d)
    assert masked == mask_date_value(codec, PASSPHRASE, 365, True, d)
    assert abs((masked - d).days) < 365  # shift ∈ (-(range-1), range-1)
    assert mask_date_value(codec, PASSPHRASE, 365, True, None) is None


def test_mask_timestamp_whole_day_shift(codec):
    ts = pd.Timestamp("2016-07-30 22:23:45")
    masked = mask_timestamp_value(codec, PASSPHRASE, 365, True, ts)
    assert masked.time() == ts.time()  # ChronoUnit.DAYS → time-of-day preserved
    assert abs((masked - ts).days) < 365
    assert masked == mask_timestamp_value(codec, PASSPHRASE, 365, True, ts)


def test_mask_decimal_bounded_perturbation(codec):
    v = Decimal("23.45")
    r = Decimal("2.5")
    masked = mask_decimal_value(codec, PASSPHRASE, r, True, v)
    assert masked == mask_decimal_value(codec, PASSPHRASE, r, True, v)
    assert abs(masked - v) < r
    assert mask_decimal_value(codec, PASSPHRASE, r, True, None) is None


# ---------------------------------------------------------------------------
# registered-UDF behavior through SQL (the reference's test entry point)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def masked_session(spark):
    register_udfs(spark)
    return spark


def test_udf_mask_string_sql(masked_session):
    row = masked_session.sql(
        """SELECT
             mask_string(16, true, 'important') AS det,
             mask_string(16, true, 'important') AS det2,
             mask_string(16, false, 'important') AS rand,
             mask_string(16, true, NULL) AS nul,
             mask_string_alphabet(16, '0123456789', true, 'important') AS digits,
             mask_string_alphabet_format(16, '0123456789', '4xxx-xxxx-xxxx-xxxx', true, 'important') AS card
        """
    ).collect()[0]
    assert len(row.det) == 16
    assert row.det == row.det2
    assert row.nul is None
    assert row.digits.isdigit()
    assert row.card[0] == "4" and len(row.card) == 19


def test_udf_mask_string_deterministic_across_rows(masked_session, sf_small):
    df = masked_session.read.parquet(f"{sf_small}/customer.parquet").limit(50)
    df.createOrReplaceTempView("_cust_mask_t")
    out = masked_session.sql(
        "SELECT c_name, mask_string(16, true, c_name) AS m FROM _cust_mask_t"
    ).collect()
    by_name = {}
    for r in out:
        assert len(r.m) == 16
        if r.c_name in by_name:
            assert by_name[r.c_name] == r.m
        by_name[r.c_name] = r.m


def test_udf_mask_date_sql(masked_session):
    row = masked_session.sql(
        """SELECT mask_date(365, true, DATE'2016-07-30') AS det,
                  mask_date(365, true, CAST(NULL AS DATE)) AS nul"""
    ).collect()[0]
    assert isinstance(row.det, dt.date)
    assert abs((row.det - dt.date(2016, 7, 30)).days) < 365
    assert row.nul is None


def test_udf_mask_timestamp_with_date_trunc(masked_session):
    # composition exercised by the reference (MaskDataPluginSuite.scala:131-136)
    row = masked_session.sql(
        """SELECT mask_timestamp(14, true, date_trunc('HOUR', TIMESTAMP'2016-07-30 22:23:45')) AS m"""
    ).collect()[0]
    assert row.m.minute == 0 and row.m.second == 0
    assert abs((row.m - dt.datetime(2016, 7, 30, 22, 0, 0)).days) <= 14


def test_udf_mask_decimal_cast_back(masked_session):
    row = masked_session.sql(
        """SELECT CAST(mask_decimal(CAST(2.5 AS DECIMAL(4,2)), true,
                        CAST('23.45' AS DECIMAL(4,2))) AS DECIMAL(4,2)) AS m"""
    ).collect()[0]
    assert isinstance(row.m, Decimal)
    assert abs(row.m - Decimal("23.45")) <= Decimal("2.5")


def test_mask_udf_rejects_per_row_parameter(masked_session):
    spark = masked_session
    """mask_* parameters are literals; a real column must raise, not silently
    broadcast the first row's value over the batch (ADVICE r01)."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    # single partition so one Arrow batch actually sees distinct param values
    df = spark.range(0, 4, 1, 1).selectExpr("CAST(id + 4 AS INT) AS len", "CAST(id AS STRING) AS v")
    df.createOrReplaceTempView("t_perrow_param")
    with pytest.raises(PythonException, match="must be a literal"):
        spark.sql("SELECT mask_string(len, true, v) AS m FROM t_perrow_param").collect()


def test_pbkdf2_query_matches_jvm_vectors(spark, sf_small):
    """q_mask_customers_pbkdf2 against the JVM-generated literals
    (tools/gen_pbkdf2_mask_vectors.jsh): anchors the WHOLE Spark UDF path —
    codec wiring, encode, shifts, BigDecimal arithmetic — to reference
    behavior end-to-end, not just the encode layer."""
    from arc_maskdata_pipeline_plugin_spark.plans import masking_queries as mq
    from arc_maskdata_pipeline_plugin_spark.plans._pbkdf2_vectors import VECTORS

    got = sorted(
        map(tuple, mq.q_mask_customers_pbkdf2(spark, sf_small).collect())
    )
    assert got == sorted(VECTORS)

"""Masking queries for the driver contract.

KDF-backed mask results are not reproducible in DuckDB (no Argon2/scrypt/
PBKDF2 there), so those entries are rows-only checks — except the fake-value
substitution, which is md5-indexed built-ins and therefore fully
oracle-checked.

The callables register the mask UDFs with the fast ``HmacSHA512`` codec and a
fixed passphrase: the driver environment carries no masking env vars, and the
bench at sf0.1 masks ~150k customer rows — per-row PBKDF2 at reference cost
would be a multi-minute benchmark artifact, which is exactly the problem the
HmacSHA512 codec exists to solve (one KDF stretch per executor).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..codecs.hmac_sha512 import HmacSHA512
from ..codecs.pbkdf2 import PBKDF2WithHmacSHA512
from ..functions.fake import LOCALIZED_LISTS, fake_email, fake_name
from ..functions.masking import register_udfs
from ._card_vectors import VECTORS as _CARD_VECTORS
from ._pbkdf2_vectors import VECTORS as _PBKDF2_VECTORS
from .registry import T, register

# Fixed engine-test passphrase (64 chars — passes reference validation rules).
_TEST_PASSPHRASE = b"engine-test-passphrase-0123456789abcdefghijklmnopqrstuvwxyz-0123"

_registered_sessions: set[str] = set()


def _ensure_udfs(spark):
    key = spark.sparkContext.applicationId
    if key not in _registered_sessions:
        register_udfs(spark, codec=HmacSHA512(), passphrase=_TEST_PASSPHRASE)
        _registered_sessions.add(key)


def q_mask_customers_detail(spark, sf_dir):
    """The per-row masked frame (pipeline/pytest surface; the registered
    query collapses this to a hash-oracled property audit)."""
    _ensure_udfs(spark)
    c = T(spark, sf_dir, "customer")
    c.createOrReplaceTempView("_mask_customer_in")
    return spark.sql(
        """
        SELECT
          c_custkey,
          c_name,
          c_acctbal,
          mask_string(16, true, c_name) AS name_masked,
          mask_string_alphabet(12, '0123456789', true, c_name) AS account_digits,
          mask_string_alphabet_format(16, '0123456789', 'xxx-xxxx-xxxx', true, c_name) AS phone_fake,
          CAST(mask_decimal(CAST(100.0 AS DECIMAL(5,1)), true,
               CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS acctbal_masked,
          c_mktsegment
        FROM _mask_customer_in
        """
    )


@register(
    "q_mask_customers",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_distinct_names,
       CAST(1 AS BIGINT) AS name_format_ok,
       CAST(1 AS BIGINT) AS digits_format_ok,
       CAST(1 AS BIGINT) AS phone_format_ok,
       CAST(1 AS BIGINT) AS acctbal_shift_in_range,
       CAST(1 AS BIGINT) AS deterministic
FROM customer
""",
)
def q_mask_customers(spark, sf_dir):
    """Reference mask treatments over customers, emitted as a hash-oracled
    PROPERTY audit (r08; KDF digests aren't reproducible in DuckDB, but
    every CONTRACT the masks make is verifiable in-plan): exact row and
    distinct-name counts, plus Spark-side verdicts — mask_string(16) emits
    exactly 16 chars of [a-zA-Z]; the 12-digit account alias is all
    digits; the formatted phone matches ddd-dddd-dddd; mask_decimal(100.0)
    PERTURBS the balance by a remainder strictly inside ±100 (it adds
    ``remainder(hash-decimal, range)`` to the original — Java BigDecimal
    remainder keeps the dividend's sign); and deterministic masking maps
    every distinct input to exactly ONE masked value. Per-row masked values stay available via
    ``q_mask_customers_detail`` and are hash-matched against JVM-generated
    literals in ``q_mask_customers_pbkdf2``."""
    d = q_mask_customers_detail(spark, sf_dir)
    per_name = d.groupBy("c_name").agg(
        F.countDistinct("name_masked").alias("n_mask_values")
    )
    det = per_name.agg(
        F.when(F.max("n_mask_values") == 1, 1).otherwise(0).alias("det_ok")
    )
    agg = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("c_name").cast("bigint").alias("n_distinct_names"),
        F.when(
            F.sum(F.when(F.col("name_masked").rlike("^[a-zA-Z]{16}$"), 0).otherwise(1)) == 0, 1
        ).otherwise(0).cast("bigint").alias("name_format_ok"),
        F.when(
            F.sum(F.when(F.col("account_digits").rlike("^[0-9]{12}$"), 0).otherwise(1)) == 0, 1
        ).otherwise(0).cast("bigint").alias("digits_format_ok"),
        F.when(
            F.sum(
                F.when(F.col("phone_fake").rlike("^[0-9]{3}-[0-9]{4}-[0-9]{4}$"), 0).otherwise(1)
            ) == 0, 1
        ).otherwise(0).cast("bigint").alias("phone_format_ok"),
        F.when(
            F.sum(
                F.when(
                    F.abs(
                        F.col("acctbal_masked").cast("decimal(14,2)")
                        - F.col("c_acctbal").cast("decimal(14,2)")
                    )
                    < 100.0,
                    0,
                ).otherwise(1)
            ) == 0, 1
        ).otherwise(0).cast("bigint").alias("acctbal_shift_in_range"),
    )
    return agg.crossJoin(F.broadcast(det)).select(
        "n_rows",
        "n_distinct_names",
        "name_format_ok",
        "digits_format_ok",
        "phone_format_ok",
        "acctbal_shift_in_range",
        F.col("det_ok").cast("bigint").alias("deterministic"),
    )


def q_mask_order_dates_detail(spark, sf_dir):
    """Per-row masked dates/timestamps incl. the reference's date_trunc
    composition (MaskDataPluginSuite.scala:133-136)."""
    _ensure_udfs(spark)
    o = T(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_mask_orders_in")
    return spark.sql(
        """
        SELECT
          o_orderkey,
          CAST(o_orderdate AS DATE) AS orderdate_in,
          date_trunc('HOUR', o_orderdate) AS ordertime_in,
          mask_date(365, true, CAST(o_orderdate AS DATE)) AS orderdate_masked,
          mask_timestamp(30, true, date_trunc('HOUR', o_orderdate)) AS ordertime_masked
        FROM _mask_orders_in
        """
    )


@register(
    "q_mask_order_dates",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_distinct_dates,
       CAST(1 AS BIGINT) AS date_shift_in_range,
       CAST(1 AS BIGINT) AS ts_shift_in_range,
       CAST(1 AS BIGINT) AS time_of_day_preserved,
       CAST(1 AS BIGINT) AS deterministic
FROM orders
""",
)
def q_mask_order_dates(spark, sf_dir):
    """Date/timestamp masking (incl. the reference's date_trunc
    composition), emitted as a hash-oracled PROPERTY audit (r08): exact row
    and distinct-date counts plus Spark-side verdicts — mask_date(365)
    shifts every date by a signed amount strictly inside ±365 days;
    mask_timestamp(30) stays strictly inside ±30 days AND preserves the
    time-of-day (whole-day shifts — the property that lets it compose with
    date_trunc, MaskDataTransform's chained-treatment contract); and each
    distinct input date maps to exactly one masked date. Per-row values:
    ``q_mask_order_dates_detail``; JVM-literal hash parity:
    ``q_mask_customers_pbkdf2``."""
    d = q_mask_order_dates_detail(spark, sf_dir)
    per_date = d.groupBy("orderdate_in").agg(
        F.countDistinct("orderdate_masked").alias("n_mask_values")
    )
    det = per_date.agg(
        F.when(F.max("n_mask_values") == 1, 1).otherwise(0).alias("det_ok")
    )
    agg = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("orderdate_in").cast("bigint").alias("n_distinct_dates"),
        F.when(
            F.sum(
                F.when(
                    F.abs(F.datediff("orderdate_masked", "orderdate_in")) < 365, 0
                ).otherwise(1)
            ) == 0, 1
        ).otherwise(0).cast("bigint").alias("date_shift_in_range"),
        F.when(
            F.sum(
                F.when(
                    F.abs(
                        F.unix_timestamp("ordertime_masked")
                        - F.unix_timestamp("ordertime_in")
                    ) < 30 * 86400, 0
                ).otherwise(1)
            ) == 0, 1
        ).otherwise(0).cast("bigint").alias("ts_shift_in_range"),
        F.when(
            F.sum(
                F.when(
                    (F.hour("ordertime_masked") == F.hour("ordertime_in"))
                    & (F.minute("ordertime_masked") == 0)
                    & (F.second("ordertime_masked") == 0), 0
                ).otherwise(1)
            ) == 0, 1
        ).otherwise(0).cast("bigint").alias("time_of_day_preserved"),
    )
    return agg.crossJoin(F.broadcast(det)).select(
        "n_rows",
        "n_distinct_dates",
        "date_shift_in_range",
        "ts_shift_in_range",
        "time_of_day_preserved",
        F.col("det_ok").cast("bigint").alias("deterministic"),
    )


_PBKDF2_ITERATIONS = 1000  # test cost; must match tools/gen_pbkdf2_mask_vectors.jsh
_pbkdf2_registered: set[str] = set()


def _ensure_pbkdf2_udfs(spark):
    key = spark.sparkContext.applicationId
    if key not in _pbkdf2_registered:
        codec = PBKDF2WithHmacSHA512()
        codec.iteration_count = _PBKDF2_ITERATIONS
        register_udfs(
            spark, codec=codec, passphrase=_TEST_PASSPHRASE, prefix="pbkdf2_"
        )
        _pbkdf2_registered.add(key)


def _pbkdf2_oracle() -> str:
    """DuckDB VALUES oracle from JVM-precomputed literals (the first
    hash-matched masking query — VERDICT r02 next-round #3): the expected
    rows were generated on a real JVM (javax.crypto PBKDF2 + the reference's
    exact encode/shift/BigDecimal expressions) by
    tools/gen_pbkdf2_mask_vectors.jsh, so the whole Spark UDF path is
    anchored to reference behavior end-to-end, independent of this package's
    own Python codec code."""
    rows = ",\n  ".join(
        "({}, '{}', '{}', '{}', '{}', '{}', '{}')".format(*v) for v in _PBKDF2_VECTORS
    )
    return f"""
SELECT * FROM (VALUES
  {rows}
) t(c_custkey, name_masked, digits12, phone_fake, date_masked, ts_masked, dec_masked)
"""


@register("q_mask_customers_pbkdf2", oracle=_pbkdf2_oracle())
def q_mask_customers_pbkdf2(spark, sf_dir):
    """Deterministic PBKDF2 masking over SF-independent inputs, checked
    value-for-value against JVM-generated literals (see ``_pbkdf2_oracle``).

    Inputs avoid every SF-dependent column: ``c_name`` is ``Customer#%09d``
    of the custkey at every scale factor, and the date/timestamp/decimal
    inputs derive from the custkey itself — so the same VALUES oracle holds
    at sf0.001/sf0.01/sf0.1. Dates, timestamps, and decimals are emitted as
    strings (driver-gate canonicalization; DateType is never emitted)."""
    _ensure_pbkdf2_udfs(spark)
    c = T(spark, sf_dir, "customer")
    c.createOrReplaceTempView("_mask_pbkdf2_in")
    return spark.sql(
        """
        SELECT
          c_custkey,
          pbkdf2_mask_string(16, true, c_name) AS name_masked,
          pbkdf2_mask_string_alphabet(12, '0123456789', true, c_name) AS digits12,
          pbkdf2_mask_string_alphabet_format(16, '0123456789', 'xxx-xxxx-xxxx', true, c_name)
            AS phone_fake,
          CAST(pbkdf2_mask_date(365, true, date_add(DATE'1995-01-01', CAST(c_custkey AS INT))) AS STRING)
            AS date_masked,
          date_format(
            pbkdf2_mask_timestamp(30, true,
                                  CAST(date_add(DATE'1995-01-01', CAST(c_custkey AS INT)) AS TIMESTAMP)),
            'yyyy-MM-dd HH:mm:ss') AS ts_masked,
          CAST(CAST(pbkdf2_mask_decimal(CAST(100.0 AS DECIMAL(5,1)), true,
                                        CAST(c_custkey + 0.25 AS DECIMAL(12,2)))
               AS DECIMAL(12,2)) AS STRING) AS dec_masked
        FROM _mask_pbkdf2_in
        WHERE c_custkey <= 20
        """
    )


def _card_oracle() -> str:
    """DuckDB VALUES oracle from JVM-precomputed literals (same machinery as
    ``_pbkdf2_oracle``): tools/gen_luhn_card_vectors.jsh runs the digit
    derivation on a real JVM (javax.crypto PBKDF2 + the reference's codec
    trait and encode), then the engine's documented Luhn-repair spec — so
    the full mask_credit_card UDF path is anchored independently of the
    Python implementation."""
    rows = ",\n  ".join(
        "({}, '{}', '{}')".format(*v) for v in _CARD_VECTORS
    )
    return f"""
SELECT * FROM (VALUES
  {rows}
) t(c_custkey, card_in, card_masked)
"""


@register("q_mask_credit_cards", oracle=_card_oracle())
def q_mask_credit_cards(spark, sf_dir):
    """Format-preserving credit-card masking: BIN (first 6 digits) and
    separator layout preserved, account digits KDF-derived, final digit
    Luhn-REPAIRED so masked cards pass downstream checksum validation —
    the real implementation of the reference's format-mask TODO
    (``MaskDataPlugin.scala:84``). Card inputs are SF-independent
    (derived from custkey 0..20 — identical at every scale factor), so the
    JVM-precomputed VALUES oracle holds everywhere. Pure projection: the
    masking UDF is the only cost, Arrow-batched with per-batch memoization."""
    _ensure_pbkdf2_udfs(spark)
    c = T(spark, sf_dir, "customer")
    c.createOrReplaceTempView("_mask_cards_in")
    return spark.sql(
        """
        WITH cards AS (
          SELECT c_custkey,
                 concat('4', CAST(123456789012345 + c_custkey * 6789012345 AS STRING)) AS full
          FROM _mask_cards_in
          WHERE c_custkey <= 20
        )
        SELECT c_custkey,
               concat_ws(' ', substr(full, 1, 4), substr(full, 5, 4),
                              substr(full, 9, 4), substr(full, 13, 4)) AS card_in,
               pbkdf2_mask_credit_card(true,
                 concat_ws(' ', substr(full, 1, 4), substr(full, 5, 4),
                                substr(full, 9, 4), substr(full, 13, 4))) AS card_masked
        FROM cards
        """
    )


def _stage_oracle() -> str:
    """The flagship-stage oracle reuses the JVM-precomputed PBKDF2 literals:
    the stage compiles metadata treatments into exactly the UDF calls the
    vectors anchor, so (name_masked, digits12, phone_fake) must reproduce
    the same columns of ``_PBKDF2_VECTORS`` value-for-value."""
    rows = ",\n  ".join(
        "({}, '{}', '{}', '{}')".format(v[0], v[1], v[2], v[3])
        for v in _PBKDF2_VECTORS
    )
    return f"""
SELECT * FROM (VALUES
  {rows}
) t(c_custkey, name_masked, digits12, phone_fake)
"""


@register("q_mask_pipeline_stage", oracle=_stage_oracle())
def q_mask_pipeline_stage(spark, sf_dir):
    """The reference's FLAGSHIP operator driven end-to-end through the driver
    gate: a HOCON pipeline config runs ``MaskDataTransform``
    (``MaskDataTransform.scala:103-175``), which discovers ``mask.treatments``
    in column METADATA, folds them into one compiled SELECT projection
    (``${{value}}`` substitution), executes it, and re-attaches metadata.
    Three treatment families run at once — default-alphabet mask, digit
    alphabet, and format substitution — and the output is anchored to the
    same JVM-precomputed PBKDF2 literals as ``q_mask_customers_pbkdf2``.
    The stage emits a single Catalyst Project: zero shuffles, one
    Arrow-batched Python op per masked column."""
    _ensure_pbkdf2_udfs(spark)
    from ..operators.base import PipelineContext
    from .pipeline import Pipeline

    c = T(spark, sf_dir, "customer").filter("c_custkey <= 20")
    treatments = {
        "name_masked": ["pbkdf2_mask_string(16, true, ${value})"],
        "digits12": ["pbkdf2_mask_string_alphabet(12, '0123456789', true, ${value})"],
        "phone_fake": [
            "pbkdf2_mask_string_alphabet_format(16, '0123456789', 'xxx-xxxx-xxxx', true, ${value})"
        ],
    }
    df = c.select(
        "c_custkey",
        *(
            F.col("c_name").alias(out, metadata={"mask": {"treatments": t}})
            for out, t in treatments.items()
        ),
    )
    df.createOrReplaceTempView("mask_stage_in")
    pipe = Pipeline.from_config(
        """
        {
          stages: [
            {
              type: MaskDataTransform
              name: "mask customer PII via metadata treatments"
              environments: [production, test]
              inputView: mask_stage_in
              outputView: mask_stage_out
              persist: false
            }
          ]
        }
        """
    )
    return pipe.run(PipelineContext(spark))


def _lifecycle_oracle() -> str:
    """VALUES oracle for the full reference lifecycle: name mask, date mask
    (365-day signed shift + DATE cast-back), and the chained
    date_trunc -> timestamp mask, all from the JVM-precomputed vector table;
    the untyped/unmasked decimal passes through (NULL for custkey 20 via the
    nullableValues path)."""
    rows = []
    for v in _PBKDF2_VECTORS:
        k, name_masked, date_masked, ts_masked = v[0], v[1], v[4], v[5]
        acct = "NULL" if k == 20 else f"'{k}.25'"
        rows.append(f"({k}, '{name_masked}', '{date_masked}', '{ts_masked}', {acct})")
    return f"""
SELECT * FROM (VALUES
  {", ".join(rows)}
) t(c_custkey, c_name, signup_date, signup_ts, c_acctbal)
"""


@register("q_userdata_lifecycle", oracle=_lifecycle_oracle())
def q_userdata_lifecycle(spark, sf_dir):
    """The reference test suite's FULL lifecycle through the driver gate
    (``MaskDataTransformSuite.scala:59-114``): raw string columns ->
    ``TypingTransform`` with an Arc-JSON schema (trim, nullableValues -> NULL,
    datetime formatters, decimal p/s, mask metadata riding in
    ``StructField.metadata``) -> ``MaskDataTransform`` (metadata-driven
    projection with treatment CHAINING — the reference's
    ``date_trunc`` -> ``mask_timestamp`` composition,
    ``MaskDataPluginSuite.scala:133-136`` — and DATE cast-back). Inputs are
    SF-independent strings derived from custkey 0..20, so every masked value
    is anchored to the JVM-precomputed PBKDF2 vector table."""
    _ensure_pbkdf2_udfs(spark)
    from ..operators.base import PipelineContext
    from ..operators.mask import MaskDataTransform
    from ..operators.typing import TypingTransform
    from .pipeline import Pipeline

    c = T(spark, sf_dir, "customer").filter("c_custkey <= 20")
    raw = c.selectExpr(
        "CAST(c_custkey AS STRING) AS c_custkey",
        "concat('  ', c_name, '  ') AS c_name",  # exercises trim
        "CAST(date_add(DATE'1995-01-01', CAST(c_custkey AS INT)) AS STRING) AS signup_date",
        "concat(CAST(date_add(DATE'1995-01-01', CAST(c_custkey AS INT)) AS STRING),"
        " ' 00:00:00') AS signup_ts",
        # custkey 20 exercises nullableValues -> NULL typing
        "CASE WHEN c_custkey = 20 THEN '' ELSE concat(CAST(c_custkey AS STRING), '.25') END"
        " AS c_acctbal",
    )
    raw.createOrReplaceTempView("userdata_raw")
    schema = """[
      {"name": "c_custkey", "type": "long"},
      {"name": "c_name", "type": "string", "trim": true,
       "metadata": {"pii": true,
                    "mask": {"treatments": ["pbkdf2_mask_string(16, true, ${value})"]}}},
      {"name": "signup_date", "type": "date", "formatters": ["yyyy-MM-dd"],
       "metadata": {"mask": {"treatments": ["pbkdf2_mask_date(365, true, ${value})"]}}},
      {"name": "signup_ts", "type": "timestamp",
       "formatters": ["yyyy-MM-dd HH:mm:ss"], "timezoneId": "UTC",
       "metadata": {"mask": {"treatments": [
          "date_trunc('HOUR', ${value})",
          "pbkdf2_mask_timestamp(30, true, ${value})"]}}},
      {"name": "c_acctbal", "type": "decimal", "precision": 12, "scale": 2,
       "nullableValues": [""]}
    ]"""
    pipe = Pipeline(
        [
            TypingTransform(
                "type userdata", "userdata_raw", "userdata_typed", schema
            ),
            MaskDataTransform(
                "mask userdata", "userdata_typed", "userdata_masked"
            ),
        ]
    )
    out = pipe.run(PipelineContext(spark))
    # gate canonicalization: dates/timestamps/decimals out as strings
    return out.selectExpr(
        "c_custkey",
        "c_name",
        "CAST(signup_date AS STRING) AS signup_date",
        "date_format(signup_ts, 'yyyy-MM-dd HH:mm:ss') AS signup_ts",
        "CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS STRING) AS c_acctbal",
    )


def _fake_oracle() -> str:
    lists = LOCALIZED_LISTS["en-US"]

    def sql_list(items):
        return "[" + ", ".join(f"'{x}'" for x in items) + "]"

    def idx(offset, n):
        return f"(CAST(('0x' || substr(md5(c_name), {offset}, 8)) AS BIGINT) % {n} + 1)"

    first = f"list_extract({sql_list(lists['first_name'])}, {idx(1, 20)})"
    last = f"list_extract({sql_list(lists['last_name'])}, {idx(9, 20)})"
    domain = f"list_extract({sql_list(lists['free_email'])}, {idx(17, 3)})"
    return f"""
SELECT c_custkey,
       {first} AS fake_first,
       {last} AS fake_last,
       lower({first}) || '.' || lower({last}) || '@' || {domain} AS fake_email
FROM customer
"""


@register("q_fake_substitution", oracle=_fake_oracle())
def q_fake_substitution(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    first, last = fake_name(F.col("c_name"))
    return c.select(
        "c_custkey",
        first.alias("fake_first"),
        last.alias("fake_last"),
        fake_email(F.col("c_name")).alias("fake_email"),
    )


_fpe_registered: set[str] = set()


def _ensure_fpe_udfs(spark):
    from ..functions.fpe import register_fpe_udfs

    key = spark.sparkContext.applicationId
    if key not in _fpe_registered:
        register_fpe_udfs(
            spark, codec=HmacSHA512(), passphrase=_TEST_PASSPHRASE
        )
        _fpe_registered.add(key)


@register(
    "q_mask_fpe_referential",
    oracle="""
WITH k AS (
  SELECT DISTINCT lpad(CAST(o_custkey AS VARCHAR), 8, '0') AS kd FROM orders
),
pj AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n_keys,
       CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n_enc_distinct,
       CAST(0 AS BIGINT) AS format_bad,
       CAST(0 AS BIGINT) AS roundtrip_mismatch,
       pj.n AS plain_join_rows,
       pj.n AS fpe_join_rows,
       CAST(1 AS BIGINT) AS referential_ok
FROM pj
""",
)
def q_mask_fpe_referential(spark, sf_dir):
    """Format-preserving encryption audit (functions/fpe.py): encrypt the
    8-digit zero-padded custkey domain and witness, in-plan, the four
    theorems a Feistel FPE guarantees — every witness is a value the
    oracle re-derives or pins:

    * injectivity: COUNT(DISTINCT ciphertext) == COUNT(DISTINCT key)
      (a bijection can't collide) — the oracle pins equality;
    * format preservation: zero ciphertexts fail ^[0-9]{8}$;
    * exact invertibility: zero decrypt(encrypt(k)) != k rows — the
      property the reference's one-way KDF masks structurally CANNOT
      provide (MaskDataPlugin.scala:70-92);
    * referential integrity: orders ⋈ customer on FPE-encrypted keys has
      exactly the plain join's row count (equal keys encrypt equally,
      unequal keys stay unequal) — q_pseudonymize_referential's witness,
      now with reversibility.

    Scale: encryption runs once over the DISTINCT key frame and maps back
    onto both fact sides by key join — at 100 TB you encrypt the key
    dictionary, not the fact table."""
    _ensure_fpe_udfs(spark)
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    o.createOrReplaceTempView("_fpe_orders")
    c.createOrReplaceTempView("_fpe_customer")
    # Encrypt the UNION key dictionary exactly ONCE: CTEs inline in Spark,
    # so without a persisted frame the UDF would re-encrypt per consumer
    # (witness frame + both join sides = 3×). persisted() keeps the
    # dictionary (key-cardinality-sized) hot for all three.
    from .registry import persisted as _persisted

    dict_df = _persisted(
        spark.sql(
            """
            SELECT kd, mask_fpe_encrypt('custkey', kd) AS enc FROM (
              SELECT DISTINCT lpad(CAST(o_custkey AS STRING), 8, '0') AS kd
              FROM _fpe_orders
              UNION
              SELECT DISTINCT lpad(CAST(c_custkey AS STRING), 8, '0') AS kd
              FROM _fpe_customer
            ) u
            """
        )
    )
    dict_df.createOrReplaceTempView("_fpe_dict")
    return spark.sql(
        """
        WITH k AS (
          SELECT DISTINCT lpad(CAST(o_custkey AS STRING), 8, '0') AS kd
          FROM _fpe_orders
        ),
        dict AS (SELECT kd, enc FROM _fpe_dict),
        e AS (SELECT d.kd, d.enc FROM dict d JOIN k ON d.kd = k.kd),
        r AS (
          SELECT kd, enc, mask_fpe_decrypt('custkey', enc) AS dec FROM e
        ),
        oe AS (
          SELECT d.enc
          FROM _fpe_orders o
          JOIN dict d ON lpad(CAST(o.o_custkey AS STRING), 8, '0') = d.kd
        ),
        cj AS (
          SELECT d.enc
          FROM _fpe_customer c
          JOIN dict d ON lpad(CAST(c.c_custkey AS STRING), 8, '0') = d.kd
        ),
        fj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM oe JOIN cj ON oe.enc = cj.enc),
        pj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM _fpe_orders o JOIN _fpe_customer c
               ON o.o_custkey = c.c_custkey)
        SELECT
          CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_keys,
          CAST((SELECT COUNT(DISTINCT enc) FROM r) AS BIGINT)
            AS n_enc_distinct,
          CAST((SELECT COUNT(*) FROM r WHERE enc NOT RLIKE '^[0-9]{8}$')
               AS BIGINT) AS format_bad,
          CAST((SELECT COUNT(*) FROM r WHERE dec != kd) AS BIGINT)
            AS roundtrip_mismatch,
          pj.n AS plain_join_rows,
          fj.n AS fpe_join_rows,
          CAST(CASE WHEN pj.n = fj.n THEN 1 ELSE 0 END AS BIGINT)
            AS referential_ok
        FROM pj, fj
        """
    )


_ff1_registered: set[str] = set()


def _ensure_ff1_udfs(spark):
    from ..functions.ff1 import register_ff1_udfs

    key = spark.sparkContext.applicationId
    if key not in _ff1_registered:
        register_ff1_udfs(
            spark, codec=HmacSHA512(), passphrase=_TEST_PASSPHRASE, radix=10
        )
        register_ff1_udfs(
            spark,
            codec=HmacSHA512(),
            passphrase=_TEST_PASSPHRASE,
            radix=36,
            prefix="r36_",
        )
        _ff1_registered.add(key)


@register(
    "q_mask_ff1_referential",
    oracle="""
WITH k AS (
  SELECT DISTINCT lpad(CAST(o_custkey AS VARCHAR), 8, '0') AS kd FROM orders
),
pj AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n_keys,
       CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n_enc_distinct,
       CAST(0 AS BIGINT) AS format_bad,
       CAST(0 AS BIGINT) AS roundtrip_mismatch,
       CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n36_distinct,
       CAST(0 AS BIGINT) AS format_bad36,
       CAST(0 AS BIGINT) AS roundtrip_mismatch36,
       pj.n AS plain_join_rows,
       pj.n AS ff1_join_rows,
       CAST(1 AS BIGINT) AS referential_ok
FROM pj
""",
)
def q_mask_ff1_referential(spark, sf_dir):
    """NIST SP 800-38G FF1 audit (functions/ff1.py) — the standards-exact
    sibling of ``q_mask_fpe_referential``: encrypt the 8-digit zero-padded
    custkey dictionary under FF1/AES (radix 10) AND a base-36 rendering
    (radix 36, exercising the NUM_radix packing beyond digits), and
    witness in-plan the theorems a keyed permutation guarantees — each
    pinned by the oracle:

    * injectivity per radix: COUNT(DISTINCT ct) == COUNT(DISTINCT key);
    * format preservation: zero radix-10 ciphertexts fail ^[0-9]{8}$ and
      zero radix-36 ciphertexts fail ^[0-9a-z]{6}$;
    * exact invertibility: zero decrypt(encrypt(k)) != k rows, both radixes;
    * referential integrity: orders ⋈ customer on FF1-encrypted keys
      reproduces the plain join's row count exactly.

    The cipher itself is pinned bit-for-bit against the published NIST
    sample vectors (AES-128/192/256, radix 10 and 36) in
    ``tests/test_ff1.py``; this query witnesses the Spark-side plumbing.
    Both domains satisfy the SP 800-38G minimum (10^8 and 36^6 ≥ 10^6),
    which ``functions/ff1.py`` ENFORCES.

    Scale: encryption runs ONCE over the persisted DISTINCT key
    dictionary and maps onto both fact sides by key join — at 100 TB you
    encrypt the key dictionary, never the fact table (the
    q_mask_fpe_referential discipline)."""
    _ensure_ff1_udfs(spark)
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    o.createOrReplaceTempView("_ff1_orders")
    c.createOrReplaceTempView("_ff1_customer")
    from .registry import persisted as _persisted

    # encrypt the UNION key dictionary exactly once (persisted: witness
    # frame + both join sides would otherwise re-run the UDF 3x)
    dict_df = _persisted(
        spark.sql(
            """
            SELECT kd,
                   mask_ff1_encrypt('custkey', kd) AS enc,
                   r36_mask_ff1_encrypt(
                     'custkey',
                     lower(lpad(conv(CAST(k36 AS STRING), 10, 36), 6, '0'))
                   ) AS enc36,
                   lower(lpad(conv(CAST(k36 AS STRING), 10, 36), 6, '0'))
                     AS kd36
            FROM (
              SELECT kd, CAST(kd AS BIGINT) AS k36 FROM (
                SELECT DISTINCT lpad(CAST(o_custkey AS STRING), 8, '0') AS kd
                FROM _ff1_orders
                UNION
                SELECT DISTINCT lpad(CAST(c_custkey AS STRING), 8, '0') AS kd
                FROM _ff1_customer
              ) u0
            ) u
            """
        )
    )
    dict_df.createOrReplaceTempView("_ff1_dict")
    return spark.sql(
        """
        WITH k AS (
          SELECT DISTINCT lpad(CAST(o_custkey AS STRING), 8, '0') AS kd
          FROM _ff1_orders
        ),
        dict AS (SELECT kd, kd36, enc, enc36 FROM _ff1_dict),
        e AS (SELECT d.kd, d.kd36, d.enc, d.enc36
              FROM dict d JOIN k ON d.kd = k.kd),
        r AS (
          SELECT kd, kd36, enc, enc36,
                 mask_ff1_decrypt('custkey', enc) AS dec,
                 r36_mask_ff1_decrypt('custkey', enc36) AS dec36
          FROM e
        ),
        oe AS (
          SELECT d.enc
          FROM _ff1_orders o
          JOIN dict d ON lpad(CAST(o.o_custkey AS STRING), 8, '0') = d.kd
        ),
        cj AS (
          SELECT d.enc
          FROM _ff1_customer c
          JOIN dict d ON lpad(CAST(c.c_custkey AS STRING), 8, '0') = d.kd
        ),
        fj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM oe JOIN cj ON oe.enc = cj.enc),
        pj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM _ff1_orders o JOIN _ff1_customer c
               ON o.o_custkey = c.c_custkey)
        SELECT
          CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_keys,
          CAST((SELECT COUNT(DISTINCT enc) FROM r) AS BIGINT)
            AS n_enc_distinct,
          CAST((SELECT COUNT(*) FROM r WHERE enc NOT RLIKE '^[0-9]{8}$')
               AS BIGINT) AS format_bad,
          CAST((SELECT COUNT(*) FROM r WHERE dec != kd) AS BIGINT)
            AS roundtrip_mismatch,
          CAST((SELECT COUNT(DISTINCT enc36) FROM r) AS BIGINT)
            AS n36_distinct,
          CAST((SELECT COUNT(*) FROM r WHERE enc36 NOT RLIKE '^[0-9a-z]{6}$')
               AS BIGINT) AS format_bad36,
          CAST((SELECT COUNT(*) FROM r WHERE dec36 != kd36)
               AS BIGINT) AS roundtrip_mismatch36,
          pj.n AS plain_join_rows,
          fj.n AS ff1_join_rows,
          CAST(CASE WHEN pj.n = fj.n THEN 1 ELSE 0 END AS BIGINT)
            AS referential_ok
        FROM pj, fj
        """
    )


_ff3_registered: set[str] = set()


def _ensure_ff3_udfs(spark):
    from ..functions.ff3 import register_ff3_udfs

    key = spark.sparkContext.applicationId
    if key not in _ff3_registered:
        register_ff3_udfs(
            spark, codec=HmacSHA512(), passphrase=_TEST_PASSPHRASE, radix=10
        )
        register_ff3_udfs(
            spark,
            codec=HmacSHA512(),
            passphrase=_TEST_PASSPHRASE,
            radix=26,
            prefix="r26_",
        )
        _ff3_registered.add(key)


@register(
    "q_mask_ff3_referential",
    oracle="""
WITH k AS (
  SELECT DISTINCT lpad(CAST(l_partkey AS VARCHAR), 8, '0') AS kd FROM lineitem
),
pj AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n_keys,
       CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n_enc_distinct,
       CAST(0 AS BIGINT) AS format_bad,
       CAST(0 AS BIGINT) AS roundtrip_mismatch,
       CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n26_distinct,
       CAST(0 AS BIGINT) AS format_bad26,
       CAST(0 AS BIGINT) AS roundtrip_mismatch26,
       pj.n AS plain_join_rows,
       pj.n AS ff3_join_rows,
       CAST(1 AS BIGINT) AS referential_ok
FROM pj
""",
)
def q_mask_ff3_referential(spark, sf_dir):
    """NIST SP 800-38G FF3-1 audit (functions/ff3.py) — completes the
    standards pair started by ``q_mask_ff1_referential`` (FF1, r10):
    encrypt the 8-digit zero-padded partkey dictionary under FF3-1/AES
    (radix 10) AND a radix-26 rendering (alphabet 0-9a-p, exercising a
    non-decimal, non-36 radix), and witness in-plan the keyed-permutation
    theorems — each pinned by the oracle:

    * injectivity per radix: COUNT(DISTINCT ct) == COUNT(DISTINCT key);
    * format preservation: zero radix-10 ciphertexts fail ^[0-9]{8}$ and
      zero radix-26 ciphertexts fail ^[0-9a-p]{6}$;
    * exact invertibility: zero decrypt(encrypt(k)) != k rows, both
      radixes;
    * referential integrity: lineitem ⋈ part on FF3-1-encrypted keys
      reproduces the plain join's row count exactly.

    The Feistel core is pinned bit-for-bit against the fifteen published
    NIST FF3 sample vectors (AES-128/192/256, radix 10 and 26) in
    ``tests/test_ff3.py``; FF3-1 reuses that byte-identical round function
    with the Rev. 1 56-bit tweak split (layout asserted in the same test
    file). Both domains satisfy the Rev. 1 minimum (10^8 and 26^6 >=
    10^6), which ``functions/ff3.py`` ENFORCES. Key-domain bound (ADVICE
    r11 #4): both renderings assume partkey < min(10^8, 26^6) = 10^8
    (TPC-H sf ~500) — past that, ``conv``/``lpad`` would silently widen
    and break the pinned format witnesses, so widen BOTH fixed widths
    together with the key domain (the 26-width was raised 5 -> 6 so the
    decimal rendering, not the radix-26 one, is the binding bound).

    Scale: encryption runs ONCE over the persisted DISTINCT key
    dictionary (part-key-sized, not lineitem-sized) and maps onto both
    fact sides by key join — at 100 TB you encrypt the key dictionary,
    never the fact table (the q_mask_fpe_referential discipline)."""
    _ensure_ff3_udfs(spark)
    li = T(spark, sf_dir, "lineitem")
    pt = T(spark, sf_dir, "part")
    li.createOrReplaceTempView("_ff3_lineitem")
    pt.createOrReplaceTempView("_ff3_part")
    from .registry import persisted as _persisted

    # encrypt the UNION key dictionary exactly once (persisted: witness
    # frame + both join sides would otherwise re-run the UDF 3x)
    dict_df = _persisted(
        spark.sql(
            """
            SELECT kd,
                   mask_ff3_encrypt('partkey', kd) AS enc,
                   r26_mask_ff3_encrypt(
                     'partkey',
                     lower(lpad(conv(CAST(k26 AS STRING), 10, 26), 6, '0'))
                   ) AS enc26,
                   lower(lpad(conv(CAST(k26 AS STRING), 10, 26), 6, '0'))
                     AS kd26
            FROM (
              SELECT kd, CAST(kd AS BIGINT) AS k26 FROM (
                SELECT DISTINCT lpad(CAST(l_partkey AS STRING), 8, '0') AS kd
                FROM _ff3_lineitem
                UNION
                SELECT DISTINCT lpad(CAST(p_partkey AS STRING), 8, '0') AS kd
                FROM _ff3_part
              ) u0
            ) u
            """
        )
    )
    dict_df.createOrReplaceTempView("_ff3_dict")
    return spark.sql(
        """
        WITH k AS (
          SELECT DISTINCT lpad(CAST(l_partkey AS STRING), 8, '0') AS kd
          FROM _ff3_lineitem
        ),
        dict AS (SELECT kd, kd26, enc, enc26 FROM _ff3_dict),
        e AS (SELECT d.kd, d.kd26, d.enc, d.enc26
              FROM dict d JOIN k ON d.kd = k.kd),
        r AS (
          SELECT kd, kd26, enc, enc26,
                 mask_ff3_decrypt('partkey', enc) AS dec,
                 r26_mask_ff3_decrypt('partkey', enc26) AS dec26
          FROM e
        ),
        le AS (
          SELECT d.enc
          FROM _ff3_lineitem l
          JOIN dict d ON lpad(CAST(l.l_partkey AS STRING), 8, '0') = d.kd
        ),
        pe AS (
          SELECT d.enc
          FROM _ff3_part p
          JOIN dict d ON lpad(CAST(p.p_partkey AS STRING), 8, '0') = d.kd
        ),
        fj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM le JOIN pe ON le.enc = pe.enc),
        pj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM _ff3_lineitem l JOIN _ff3_part p
               ON l.l_partkey = p.p_partkey)
        SELECT
          CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_keys,
          CAST((SELECT COUNT(DISTINCT enc) FROM r) AS BIGINT)
            AS n_enc_distinct,
          CAST((SELECT COUNT(*) FROM r WHERE enc NOT RLIKE '^[0-9]{8}$')
               AS BIGINT) AS format_bad,
          CAST((SELECT COUNT(*) FROM r WHERE dec != kd) AS BIGINT)
            AS roundtrip_mismatch,
          CAST((SELECT COUNT(DISTINCT enc26) FROM r) AS BIGINT)
            AS n26_distinct,
          CAST((SELECT COUNT(*) FROM r WHERE enc26 NOT RLIKE '^[0-9a-p]{6}$')
               AS BIGINT) AS format_bad26,
          CAST((SELECT COUNT(*) FROM r WHERE dec26 != kd26)
               AS BIGINT) AS roundtrip_mismatch26,
          pj.n AS plain_join_rows,
          fj.n AS ff3_join_rows,
          CAST(CASE WHEN pj.n = fj.n THEN 1 ELSE 0 END AS BIGINT)
            AS referential_ok
        FROM pj, fj
        """
    )

"""Localized fake-value substitution.

The reference ships localized lists (first names / last names / free email
domains) staged for a "replace with realistic fake value" treatment that was
never wired up (reference: src/main/scala/ai/tripl/arc/util/MaskUtils.scala —
dead code per SURVEY.md §0). This implements the capability for real, with
engine-native lists (NOT copied from the reference's data):

* deterministic index = hex-prefix of md5(value) mod list length — pure
  built-in expressions (JVM-side, broadcastable literals, oracle-reproducible);
* a KDF-backed variant (``index = hashLong(value) mod len``) is available via
  the mask UDFs when cryptographic strength matters more than throughput.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small public common-name lists (locale "en-US"); extend per locale as needed.
LOCALIZED_LISTS: dict[str, dict[str, list[str]]] = {
    "en-US": {
        "first_name": [
            "James", "Mary", "John", "Patricia", "Robert", "Jennifer",
            "Michael", "Linda", "David", "Elizabeth", "William", "Barbara",
            "Richard", "Susan", "Joseph", "Jessica", "Thomas", "Sarah",
            "Charles", "Karen",
        ],
        "last_name": [
            "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
            "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez",
            "Gonzalez", "Wilson", "Anderson", "Thomas", "Taylor", "Moore",
            "Jackson", "Martin",
        ],
        "free_email": ["gmail.com", "yahoo.com", "hotmail.com"],
    }
}


def _hash_index(value: Column, modulus: int, offset: int = 1) -> Column:
    """Deterministic 0-based index from an 8-hex-digit md5 window (< 2^32,
    always positive). ``offset`` selects a different window per list so one
    value doesn't pick correlated entries."""
    window = F.substring(F.md5(value), offset, 8)
    return (F.conv(window, 16, 10).cast("bigint") % modulus).cast("int")


def fake_from_list(value: Column, items: list[str], md5_offset: int = 1) -> Column:
    """Deterministic substitution: same input → same fake value."""
    arr = F.array(*[F.lit(x) for x in items])
    return F.element_at(arr, _hash_index(value, len(items), md5_offset) + 1)


def fake_name(value: Column, locale: str = "en-US") -> tuple[Column, Column]:
    lists = LOCALIZED_LISTS[locale]
    return (
        fake_from_list(value, lists["first_name"], md5_offset=1),
        fake_from_list(value, lists["last_name"], md5_offset=9),
    )


def fake_email(value: Column, locale: str = "en-US") -> Column:
    first, last = fake_name(value, locale)
    domain = fake_from_list(value, LOCALIZED_LISTS[locale]["free_email"], md5_offset=17)
    return F.concat(F.lower(first), F.lit("."), F.lower(last), F.lit("@"), domain)

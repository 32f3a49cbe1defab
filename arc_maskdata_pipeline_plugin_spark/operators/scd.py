"""Slowly-changing-dimension (type 2) merge — incremental upsert history.

A 100 TB pipeline ingests change batches against dimension snapshots; SCD2
keeps full history with validity intervals. Spark has no MERGE on plain
parquet, so the operator expresses the merge as a declarative
union/window plan Catalyst can optimize (and that an ANSI oracle can replay):

1. tag current rows and incoming changes;
2. per business key, order by effective date (changes after current);
3. close each superseded version (valid_to = next version's effective date)
   and mark exactly the latest version current.

Unchanged-attribute changes are dropped first (hash compare) so reprocessing
the same batch is a no-op — the idempotence a replayed ingest needs.

Shape: one hash-shuffle on the business key + a window over (key, eff_date).
No join against the full history is needed for the common append case when
the history store is partitioned by ``is_current`` — only current rows are
read, closed, and rewritten; closed history is immutable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HIGH_DATE = "9999-12-31"


def scd2_merge(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_date",
) -> DataFrame:
    """Merge a change batch into the CURRENT slice of an SCD2 store.

    ``current``: (key, attrs…, eff_date, valid_to='9999-12-31', is_current).
    ``changes``: (key, attrs…, eff_date).
    Returns the new version set for the touched keys plus untouched current
    rows: (key, attrs…, eff_date, valid_to, is_current).
    """
    attr_hash = F.xxhash64(*[F.col(a) for a in attrs])

    cur = current.select(
        key, *attrs, eff_col, F.lit(True).alias("_from_current")
    )
    # no-op screen: drop changes identical to the key's current attributes.
    # Plain key-shuffle join — the current slice of a dimension is NOT
    # broadcast-sized in general, and the shuffle co-partitions with the
    # window below anyway.
    cur_hash = current.select(key, attr_hash.alias("_cur_hash"))
    fresh = (
        changes.join(cur_hash, key, "left")
        .filter((F.col("_cur_hash").isNull()) | (attr_hash != F.col("_cur_hash")))
        .select(key, *attrs, eff_col, F.lit(False).alias("_from_current"))
    )

    versions = cur.unionByName(fresh)
    w = Window.partitionBy(key).orderBy(
        F.col(eff_col).asc(), F.col("_from_current").desc()
    )
    nxt = F.lead(eff_col).over(w)
    return (
        versions.withColumn("valid_to", F.coalesce(nxt, F.lit(HIGH_DATE)))
        .withColumn("is_current", nxt.isNull())
        .drop("_from_current")
    )

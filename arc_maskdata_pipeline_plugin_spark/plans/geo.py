"""Geospatial proximity join via integer grid-cell bucketing.

The classic "which facts are near which entities" join (store/customer
assignment, geo dedup, POI matching) without a spatial index: bucket both
sides into 1°×1° integer grid cells, replicate ONE side to its 3×3 cell
neighborhood, join on cell equality, then verify candidates with the exact
haversine distance. The same banded-candidate discipline as the LSH/pHash
dedups — the corpus never cross-joins, and candidate counts are bounded by
cell occupancy (a viral cell would take the same ``max_bucket_size`` cap as
``operators/dedup.py``; the uniform synthetic locations here stay far below
it, and the pHash/SemDeDup caps document the seam).

Locations are synthesized DETERMINISTICALLY from the customer/supplier keys
(the star schema has no geo columns), so both engines bucket and verify the
identical points; the haversine is the same expression in both engines
(doubles from exact integer-derived coordinates → bit-identical).

Recall caveat (documented, mirrored by the oracle): 1° of longitude shrinks
toward the poles, so the 3×3 neighborhood guarantee holds for the ~111 km
radius only away from extreme latitudes — the candidate set IS the
definition, exactly like the banded-pHash candidate contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import T, register

_GEO_RADIUS_M = 100_000  # 100 km
_EARTH_R_M = 6_371_000.0

# lat in [-85, 85) (clamped away from the poles), lon in [-180, 180),
# 4 decimal places — exact integer-derived doubles in both engines.
_CUST_LAT = "(((c_custkey * 2654435761) % 1700000) / 10000.0 - 85.0)"
_CUST_LON = "(((c_custkey * 40503) % 3600000) / 10000.0 - 180.0)"
_SUPP_LAT = "(((s_suppkey * 97 + 13) * 2654435761 % 1700000) / 10000.0 - 85.0)"
_SUPP_LON = "(((s_suppkey * 97 + 13) * 40503 % 3600000) / 10000.0 - 180.0)"


def _haversine_sql(lat1, lon1, lat2, lon2):
    return (
        f"2.0 * {_EARTH_R_M} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


@register(
    "q_geo_proximity_join",
    oracle=f"""
WITH cust AS (
  SELECT c_custkey AS cid, {_CUST_LAT} AS lat, {_CUST_LON} AS lon,
         CAST(floor({_CUST_LAT}) AS BIGINT) AS cell_lat,
         CAST(floor({_CUST_LON}) AS BIGINT) AS cell_lon
  FROM customer
),
supp AS (
  SELECT s_suppkey AS sid, {_SUPP_LAT} AS lat, {_SUPP_LON} AS lon,
         CAST(floor({_SUPP_LAT}) AS BIGINT) AS cell_lat,
         CAST(floor({_SUPP_LON}) AS BIGINT) AS cell_lon
  FROM supplier
),
supp9 AS (
  SELECT s.sid, s.lat, s.lon,
         s.cell_lat + d1.d AS cell_lat, s.cell_lon + d2.d AS cell_lon
  FROM supp s, (VALUES (-1), (0), (1)) d1(d), (VALUES (-1), (0), (1)) d2(d)
),
cand AS (
  SELECT c.cid, s.sid,
         {_haversine_sql('c.lat', 'c.lon', 's.lat', 's.lon')} AS dist_m
  FROM cust c JOIN supp9 s
    ON c.cell_lat = s.cell_lat AND c.cell_lon = s.cell_lon
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN dist_m <= {_GEO_RADIUS_M} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_within_radius,
       CAST(floor(MIN(dist_m)) AS BIGINT) AS min_dist_m
FROM cand
""",
)
def q_geo_proximity_join(spark, sf_dir):
    """Customer↔supplier pairs within 100 km: grid-cell candidates (3×3
    neighborhood on the smaller side) verified by exact haversine. One row
    out: candidate count, verified count, closest distance.

    Scale shape: both sides shuffle once on (cell_lat, cell_lon); the 9×
    replication applies to the SMALLER side; the verify is a per-candidate
    scalar. No corpus cross-join, no Python."""
    c = T(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS cid",
        f"{_CUST_LAT} AS clat",
        f"{_CUST_LON} AS clon",
        f"CAST(floor({_CUST_LAT}) AS BIGINT) AS cell_lat",
        f"CAST(floor({_CUST_LON}) AS BIGINT) AS cell_lon",
    )
    s = T(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey AS sid",
        f"{_SUPP_LAT} AS slat",
        f"{_SUPP_LON} AS slon",
        f"CAST(floor({_SUPP_LAT}) AS BIGINT) AS s_cell_lat",
        f"CAST(floor({_SUPP_LON}) AS BIGINT) AS s_cell_lon",
    )
    s9 = s.select(
        "sid",
        "slat",
        "slon",
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), i -> "
                "transform(sequence(-1, 1), j -> "
                "struct(s_cell_lat + i AS cell_lat, "
                "s_cell_lon + j AS cell_lon))))"
            )
        ).alias("cell"),
    ).select(
        "sid",
        "slat",
        "slon",
        F.col("cell.cell_lat").alias("cell_lat"),
        F.col("cell.cell_lon").alias("cell_lon"),
    )
    cand = c.join(s9, ["cell_lat", "cell_lon"]).selectExpr(
        "cid",
        "sid",
        _haversine_sql("clat", "clon", "slat", "slon") + " AS dist_m",
    )
    return cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum((F.col("dist_m") <= _GEO_RADIUS_M).cast("int"))
        .cast("bigint")
        .alias("n_within_radius"),
        F.floor(F.min("dist_m")).cast("bigint").alias("min_dist_m"),
    )

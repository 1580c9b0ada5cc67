"""Geo operators — SURVEY.md §2.9: `Point{lat,lon}` properties and
`distance_km` (`graph_engine/src/lib.rs:304`, `graph_engine/src/geo.rs`).

Haversine as a pure column expression. Nation "points" are synthesized
deterministically from the nation key (integer grid + 0.5) so the oracle
reproduces them; trig differs across libm implementations only in the last
ULP, absorbed by rounding to meters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (`graph_engine/src/geo.rs` distance_km)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


_POINTS_SQL = """
WITH pts AS (
  SELECT n_nationkey,
         CAST((n_nationkey * 7) % 120 - 60 AS DOUBLE) + 0.5 AS lat,
         CAST((n_nationkey * 13) % 360 - 180 AS DOUBLE) + 0.5 AS lon
  FROM nation
)
"""


@register(
    "graph_geo_distance",
    oracle=_POINTS_SQL
    + """
    SELECT a.n_nationkey AS key_a, b.n_nationkey AS key_b,
           ROUND(2 * 6371.0 * ASIN(SQRT(
             POW(SIN(RADIANS(b.lat - a.lat) / 2), 2)
             + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
               * POW(SIN(RADIANS(b.lon - a.lon) / 2), 2)
           )), 3) AS dist_km
    FROM pts a JOIN pts b ON a.n_nationkey < b.n_nationkey
    WHERE a.n_nationkey < 10 AND b.n_nationkey < 10
    """,
)
def graph_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise haversine distance between synthesized nation points
    (`Point` props + geo filters, `graph_engine/src/geo.rs`)."""
    n = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 10)
    pts = n.select(
        "n_nationkey",
        (((F.col("n_nationkey") * 7) % 120 - 60).cast("double") + 0.5).alias("lat"),
        (((F.col("n_nationkey") * 13) % 360 - 180).cast("double") + 0.5).alias("lon"),
    )
    a = pts.select(
        F.col("n_nationkey").alias("key_a"), F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a")
    )
    b = pts.select(
        F.col("n_nationkey").alias("key_b"), F.col("lat").alias("lat_b"), F.col("lon").alias("lon_b")
    )
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.round(
                haversine_km(
                    F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
                ),
                3,
            ).alias("dist_km"),
        )
    )

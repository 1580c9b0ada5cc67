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


_CUST_POINTS_SQL = """
WITH cpts AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST((c_custkey * 7) % 120 - 60 AS DOUBLE) + 0.5 AS lat,
         CAST((c_custkey * 13) % 360 - 180 AS DOUBLE) + 0.5 AS lon
  FROM customer
)
"""

_HAVERSINE_TO_ORIGIN_SQL = """
2 * 6371.0 * ASIN(SQRT(
  POW(SIN(RADIANS(lat - 10.5) / 2), 2)
  + COS(RADIANS(10.5)) * COS(RADIANS(lat))
    * POW(SIN(RADIANS(lon - 20.5) / 2), 2)
))
"""


def _cust_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("bigint").alias("id"),
        (((F.col("c_custkey") * 7) % 120 - 60).cast("double") + 0.5).alias("lat"),
        (((F.col("c_custkey") * 13) % 360 - 180).cast("double") + 0.5).alias("lon"),
    )


CENTER_LAT, CENTER_LON = 10.5, 20.5


@register(
    "geo_radius_search",
    oracle=_CUST_POINTS_SQL
    + f"""
    SELECT id, ROUND({_HAVERSINE_TO_ORIGIN_SQL}, 3) AS dist_km
    FROM cpts
    WHERE {_HAVERSINE_TO_ORIGIN_SQL} <= 1500.0
    """,
)
def geo_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`find_within_radius` (`graph_engine/src/geo.rs:165`): all points
    within 1500 km of a center, with distances. Map-only scan + predicate —
    no shuffle. At 100 TB the scale path is the reference's own grid trick
    (`geo.rs` uses a cell index): precompute a coarse geohash/cell column,
    prune cells whose min distance exceeds the radius, then exact-filter —
    a partition-pruning predicate instead of a full scan."""
    pts = _cust_points(spark, sf_dir)
    d = haversine_km(
        F.col("lat"), F.col("lon"), F.lit(CENTER_LAT), F.lit(CENTER_LON)
    )
    return pts.select("id", F.round(d, 3).alias("dist_km"), d.alias("_d")).filter(
        F.col("_d") <= 1500.0
    ).drop("_d")


@register(
    "geo_bbox_search",
    oracle=_CUST_POINTS_SQL
    + """
    SELECT id, lat, lon FROM cpts
    WHERE lat BETWEEN 0.0 AND 30.0 AND lon BETWEEN 0.0 AND 45.0
    """,
)
def geo_bbox_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`find_in_bbox` (`graph_engine/src/geo.rs:204`): pure range predicate
    on lat/lon — whole-stage-codegen comparisons; with materialized point
    columns this pushes to the parquet scan and prunes row groups."""
    pts = _cust_points(spark, sf_dir)
    return pts.filter(
        F.col("lat").between(0.0, 30.0) & F.col("lon").between(0.0, 45.0)
    )


@register(
    "geo_knn",
    oracle=_CUST_POINTS_SQL
    + f"""
    SELECT id, ROUND({_HAVERSINE_TO_ORIGIN_SQL}, 3) AS dist_km
    FROM cpts
    ORDER BY {_HAVERSINE_TO_ORIGIN_SQL}, id
    LIMIT 10
    """,
)
def geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`find_nearest` (`graph_engine/src/geo.rs:238`): k closest points to
    the center — TakeOrderedAndProject (per-partition top-k, k-row merge on
    the driver), the same plan shape as vector kNN. Ties broken by id; the
    raw (unrounded) distance orders, the rounded one displays."""
    pts = _cust_points(spark, sf_dir)
    d = haversine_km(
        F.col("lat"), F.col("lon"), F.lit(CENTER_LAT), F.lit(CENTER_LON)
    )
    return (
        pts.select("id", F.round(d, 3).alias("dist_km"), d.alias("_d"))
        .orderBy(F.col("_d"), F.col("id"))
        .limit(10)
        .drop("_d")
    )

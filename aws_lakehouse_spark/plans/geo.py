"""Geospatial query surface (engine extension).

Grid-bucketed proximity joins and spatial binning over synthetic
customer coordinates (deterministically derived from ``c_custkey``,
so both engines compute identical points from the shared parquet).
The scale pattern is the standard geospatial one: bin points into
fixed grid cells in-row, equi-join on cell ids (query cells +
neighbors precomputed driver-side from the literal query points),
then verify exact haversine distance — candidates are
cell-neighborhood-bounded, never a cross join.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.registry import register

# synthetic coordinates: lat in [40, 50), lon in [-5, 15)
_LAT_SQL = "40 + (c_custkey * 7919 % 1000) / 100.0"
_LON_SQL = "-5 + (c_custkey * 104729 % 2000) / 100.0"

_CELL_DEG = 2.0  # grid cell size; covers the 100 km radius with +-1
_RADIUS_KM = 100.0

# fixed query locations (query_id, lat, lon)
_QUERY_POINTS = (
    (1, 42.0, 1.0),
    (2, 45.5, 3.5),
    (3, 48.0, 10.0),
    (4, 41.5, 12.5),
    (5, 44.0, -2.0),
)


def _duck_haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2 * 6371.0 * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


def _spark_haversine(lat1, lon1, lat2, lon2):
    return (
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
                + F.cos(F.radians(lat1))
                * F.cos(F.radians(lat2))
                * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
            )
        )
    )


def _query_values_sql() -> str:
    rows = ", ".join(
        f"({qid}, {lat}, {lon})" for qid, lat, lon in _QUERY_POINTS
    )
    return f"(VALUES {rows}) AS q(query_id, q_lat, q_lon)"


@register(
    "geo_haversine_neighbor_join",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               {_LAT_SQL} AS lat,
               {_LON_SQL} AS lon
        FROM customer
    )
    SELECT q.query_id, pts.c_custkey,
           ROUND({_duck_haversine('q.q_lat', 'q.q_lon', 'pts.lat', 'pts.lon')},
                 3) AS dist_km
    FROM pts, {_query_values_sql()}
    WHERE ROUND({_duck_haversine('q.q_lat', 'q.q_lon', 'pts.lat', 'pts.lon')},
                3) <= {_RADIUS_KM}
    """,
    category="geo (engine extension)",
    doc="Radius search: all customers within 100 km of each of 5 "
    "query locations. The corpus gets 2-degree grid-cell ids in-row; "
    "the 45 candidate cells (5 query points x 3x3 neighborhoods, "
    "precomputed driver-side from the literal query coordinates) "
    "broadcast and equi-join on (cell_lat, cell_lon); exact "
    "haversine then filters candidates — the oracle's brute-force "
    "cross join checks that the grid misses nothing. Distances are "
    "compared ROUNDED on both sides so the radius boundary is "
    "engine-stable. At 100 TB this is the standard spatial-join "
    "shape: cell ids partition the corpus, query cells broadcast, "
    "candidates stay neighborhood-bounded.",
)
def geo_haversine_neighbor_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    lat = 40 + (F.col("c_custkey") * 7919 % 1000) / 100.0
    lon = -5 + (F.col("c_custkey") * 104729 % 2000) / 100.0
    pts = cust.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor(lat / _CELL_DEG).cast("bigint").alias("cell_lat"),
        F.floor(lon / _CELL_DEG).cast("bigint").alias("cell_lon"),
    )
    # query cells + 8 neighbors, computed from the literal points
    cand_rows = []
    for qid, qlat, qlon in _QUERY_POINTS:
        base_lat = math.floor(qlat / _CELL_DEG)
        base_lon = math.floor(qlon / _CELL_DEG)
        for dlat in (-1, 0, 1):
            for dlon in (-1, 0, 1):
                cand_rows.append(
                    (qid, qlat, qlon, base_lat + dlat, base_lon + dlon)
                )
    cells = spark.createDataFrame(
        cand_rows, "query_id int, q_lat double, q_lon double, "
        "cell_lat bigint, cell_lon bigint"
    )
    dist = F.round(
        _spark_haversine(
            F.col("q_lat"), F.col("q_lon"), F.col("lat"), F.col("lon")
        ),
        3,
    )
    return (
        pts.join(F.broadcast(cells), ["cell_lat", "cell_lon"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= _RADIUS_KM)
        .select("query_id", "c_custkey", "dist_km")
    )


@register(
    "geo_grid_density",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey, c_acctbal,
               CAST(FLOOR(({_LAT_SQL}) / {_CELL_DEG}) AS BIGINT) AS cell_lat,
               CAST(FLOOR(({_LON_SQL}) / {_CELL_DEG}) AS BIGINT) AS cell_lon
        FROM customer
    )
    SELECT cell_lat, cell_lon,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(AVG(c_acctbal), 6) AS avg_acctbal
    FROM pts GROUP BY cell_lat, cell_lon
    """,
    category="geo (engine extension)",
    doc="Spatial density binning: customers per 2-degree grid cell "
    "with mean account balance — the heatmap/zoom-tile aggregation. "
    "Pure scan + one shuffle keyed by cell id; cells are the "
    "natural spatial partition key at scale.",
)
def geo_grid_density_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    lat = 40 + (F.col("c_custkey") * 7919 % 1000) / 100.0
    lon = -5 + (F.col("c_custkey") * 104729 % 2000) / 100.0
    return (
        cust.select(
            "c_acctbal",
            F.floor(lat / _CELL_DEG).cast("bigint").alias("cell_lat"),
            F.floor(lon / _CELL_DEG).cast("bigint").alias("cell_lon"),
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


@register(
    "geo_knn_bounded",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               {_LAT_SQL} AS lat,
               {_LON_SQL} AS lon
        FROM customer
    ), cand AS (
        SELECT q.query_id, pts.c_custkey,
               ROUND({_duck_haversine('q.q_lat', 'q.q_lon',
                                      'pts.lat', 'pts.lon')}, 3) AS dist_km
        FROM pts, {_query_values_sql()}
        WHERE ROUND({_duck_haversine('q.q_lat', 'q.q_lon',
                                     'pts.lat', 'pts.lon')}, 3)
              <= {_RADIUS_KM}
    )
    SELECT query_id, c_custkey, dist_km, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY dist_km, c_custkey) AS rnk
        FROM cand
    ) WHERE rnk <= 3
    """,
    category="geo (engine extension)",
    doc="Radius-bounded k-nearest-neighbors: the 3 closest customers "
    "to each query point among those within 100 km (the bound is "
    "what makes grid candidate generation EXACT — unbounded kNN "
    "could need a neighbor outside the cell neighborhood). Same "
    "grid-cell candidates as the radius search, then a per-query "
    "window top-k over rounded distances with id tie-breaks. The "
    "store-locator / dispatch-assignment query shape.",
)
def geo_knn_bounded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cand = geo_haversine_neighbor_join_q(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_km"), F.asc("c_custkey")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id",
            "c_custkey",
            "dist_km",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# point-in-polygon demo region: a 6-vertex CONCAVE polygon over the
# synthetic coordinate box. Vertices sit on .515/.485 offsets so no
# 2-decimal synthetic point ever lies exactly on a horizontal edge;
# the crossing arithmetic below is emitted with IDENTICAL
# parenthesization on both engines, so even borderline floating-point
# decisions agree bit-for-bit.
_POLYGON = (
    (41.515, -3.515),
    (47.515, -1.515),
    (49.515, 6.485),
    (44.515, 13.485),
    (43.515, 2.485),  # reflex vertex — the polygon is concave
    (40.515, 5.485),
)


def _crossing_terms(px: str, py: str) -> list[str]:
    """Ray-casting crossing indicator per polygon edge, as SQL text
    shared verbatim by both engines (`px`,`py` are column exprs)."""
    terms = []
    n = len(_POLYGON)
    for i in range(n):
        yi, xi = _POLYGON[i]
        yj, xj = _POLYGON[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({yi} > {py}) != ({yj} > {py})) AND "
            f"({px} < ({xj} - {xi}) * ({py} - {yi}) / ({yj} - {yi}) "
            f"+ {xi}) THEN 1 ELSE 0 END)"
        )
    return terms


def _inside_sql(px: str, py: str) -> str:
    return "((" + " + ".join(_crossing_terms(px, py)) + ") % 2 = 1)"


@register(
    "geo_polygon_contains",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey, c_nationkey,
               {_LAT_SQL} AS lat, {_LON_SQL} AS lon
        FROM customer
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN {_inside_sql('lon', 'lat')}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
    FROM pts GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    category="geo",
    doc="Point-in-polygon containment (ray casting over a literal "
    "concave 6-gon): per nation, how many customers fall inside the "
    "region — the geofence/territory classification every spatial "
    "pipeline needs beyond radius queries. Pure scan-side "
    "arithmetic: the polygon is a driver-side literal unrolled into "
    "one crossing-parity expression per row, zero joins, zero "
    "shuffles beyond the final group — the shape that scales to any "
    "point count because each edge test is embarrassingly parallel. "
    "Both engines run the char-identical crossing formula, so even "
    "borderline IEEE decisions agree.",
)
def geo_polygon_contains_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        "c_nationkey",
        F.expr(_LAT_SQL).alias("lat"),
        F.expr(_LON_SQL).alias("lon"),
    )
    inside = F.expr(_inside_sql("lon", "lat"))
    return (
        pts.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.when(inside, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inside"),
        )
        .orderBy("c_nationkey")
    )

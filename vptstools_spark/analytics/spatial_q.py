"""Spatial queries: grid-binned proximity join (operators/spatial.py).

The harness tables carry no coordinates, so points derive
deterministically from entity keys by integer multiplicative hashing
(Knuth constants; pure modular arithmetic — exact in any engine, no RNG),
placing customers and suppliers in a ~550x550 km region. The Spark plan
is the CELL-JOIN algorithm; the oracle verifies with the naive all-pairs
distance filter only tractable at oracle scale — algorithm-independent
agreement, the strongest oracle shape."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import table
from vptstools_spark.operators.spatial import proximity_join

#: world extent in degrees and join radius in km
EXTENT_DEG = 5.0
RADIUS_KM = 10.0


def _coord(key: Column, mult: int) -> Column:
    """Deterministic uniform in [0, EXTENT_DEG) from an integer key."""
    return (
        (key * F.lit(mult)) % F.lit(100000)
    ).cast("double") / 100000.0 * EXTENT_DEG


def _points(df: DataFrame, key: str) -> DataFrame:
    return df.select(
        F.col(key).alias("id"),
        _coord(F.col(key), 2654435761).alias("lat"),
        _coord(F.col(key), 40503).alias("lon"),
    )


def q_geo_proximity_join(spark: SparkSession, sf: str) -> DataFrame:
    """Customer-supplier pairs within RADIUS_KM: grid cells sized to the
    radius, left side replicated into the 3x3 neighborhood, equi-join on
    cell, exact haversine verify — pair volume bounded by local density,
    never |A| x |B|."""
    cust = _points(table(spark, sf, "customer"), "c_custkey")
    supp = _points(table(spark, sf, "supplier"), "s_suppkey")
    pairs = proximity_join(cust, supp, RADIUS_KM)
    return pairs.select(
        F.col("id_a").alias("custkey"),
        F.col("id_b").alias("suppkey"),
        F.round("dist_km", 4).alias("dist_km"),
    )


_GEO_ORACLE = f"""
    WITH cust AS (
        SELECT c_custkey AS id,
               CAST((c_custkey * 2654435761) % 100000 AS DOUBLE)
                   / 100000.0 * {EXTENT_DEG} AS lat,
               CAST((c_custkey * 40503) % 100000 AS DOUBLE)
                   / 100000.0 * {EXTENT_DEG} AS lon
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey AS id,
               CAST((s_suppkey * 2654435761) % 100000 AS DOUBLE)
                   / 100000.0 * {EXTENT_DEG} AS lat,
               CAST((s_suppkey * 40503) % 100000 AS DOUBLE)
                   / 100000.0 * {EXTENT_DEG} AS lon
        FROM supp_raw
    ),
    pairs AS (
        SELECT c.id AS custkey, s.id AS suppkey,
               2 * 6371.0088 * ASIN(SQRT(
                   POW(SIN(RADIANS(s.lat - c.lat) / 2), 2)
                   + COS(RADIANS(c.lat)) * COS(RADIANS(s.lat))
                     * POW(SIN(RADIANS(s.lon - c.lon) / 2), 2)
               )) AS dist_km
        FROM cust c CROSS JOIN supp s
    )
    SELECT custkey, suppkey, ROUND(dist_km, 4) AS dist_km
    FROM pairs WHERE dist_km <= {RADIUS_KM}
"""
# the oracle needs the supplier view under a CTE-safe name
_GEO_ORACLE = _GEO_ORACLE.replace("FROM supp_raw", "FROM supplier")


QUERIES = {
    "geo_proximity_join": q_geo_proximity_join,
}

ORACLES = {
    "geo_proximity_join": _GEO_ORACLE,
}


def q_geo_nearest_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest supplier within RADIUS_KM per customer (1-NN): the
    proximity join's candidate pairs ranked per customer - the
    store-assignment / nearest-facility query. Candidates stay bounded
    by the cell join; the rank window partitions by customer. Customers
    with no supplier inside the radius drop (documented contract: 1-NN
    under a search radius, not global nearest)."""
    from pyspark.sql import Window

    cust = _points(table(spark, sf, "customer"), "c_custkey")
    supp = _points(table(spark, sf, "supplier"), "s_suppkey")
    pairs = proximity_join(cust, supp, RADIUS_KM)
    w = Window.partitionBy("id_a").orderBy(
        F.col("dist_km").asc(), F.col("id_b").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("id_a").alias("custkey"),
            F.col("id_b").alias("suppkey"),
            F.round("dist_km", 4).alias("dist_km"),
        )
    )


ORACLES["geo_nearest_supplier"] = (
    _GEO_ORACLE.replace(
        """    SELECT custkey, suppkey, ROUND(dist_km, 4) AS dist_km
    FROM pairs WHERE dist_km <= """
        + str(RADIUS_KM),
        """    SELECT custkey, suppkey, ROUND(dist_km, 4) AS dist_km FROM (
        SELECT custkey, suppkey, dist_km,
               ROW_NUMBER() OVER (PARTITION BY custkey
                                  ORDER BY dist_km ASC, suppkey ASC) AS rk
        FROM pairs WHERE dist_km <= """
        + str(RADIUS_KM)
        + """
    ) WHERE rk = 1""",
    )
)

QUERIES["geo_nearest_supplier"] = q_geo_nearest_supplier

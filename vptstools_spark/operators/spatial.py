"""Spatial proximity join via grid binning — the equi-joinable form of
"find all pairs within radius r".

The scale problem: a naive distance join is an all-pairs cross product.
The standard fix (PostGIS/GeoSpark lineage) is to snap points to a grid
whose cell edge >= r, replicate each LEFT point into its cell and the 8
neighbors, equi-join on cell id, then verify the exact distance. Every
true pair lands in at least one shared cell (edge >= r guarantees it),
and pair volume is bounded by local point density, never global count.

Distances use the haversine great-circle formula; cell ids are integer
floor divisions of degrees, so the binning is deterministic and exactly
reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: mean Earth radius (km), the conventional haversine constant
EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine form: numerically stable
    for the small angles a proximity join cares about)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def proximity_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    suffixes: tuple[str, str] = ("_a", "_b"),
    max_abs_lat_deg: float = 66.0,
) -> DataFrame:
    """All (left, right) pairs within `radius_km`, by grid binning +
    neighbor replication + exact haversine verify. Returns both sides'
    columns (suffixed) plus `dist_km`.

    Latitude cells are sized from the radius at the equator (1 deg
    latitude ~ 111.195 km). Longitude degrees SHRINK by cos(lat), so a
    pair within the radius could sit 2 lon cells apart at nonzero
    latitude if lon cells used the same edge — the classic missed-pair
    bug. Longitude cells are therefore widened by 1/cos(max_abs_lat_deg)
    (default covers |lat| <= 66 deg; raise it for polar data at the cost
    of more candidates per cell), which restores the 3x3-neighborhood
    completeness guarantee. LEFT is replicated 9x (the 3x3
    neighborhood); RIGHT maps to its single home cell — replicating one
    side only halves the shuffle volume vs replicating both.

    The latitude bound is ENFORCED: any row with |lat| > max_abs_lat_deg
    raises at execution time (a silently dropped true pair is the worst
    failure mode a join can have). Longitude cells tile the full circle
    with a uniform width that divides 360 exactly, and neighbor
    replication wraps modulo the cell count — pairs straddling the
    ±180° antimeridian are found like any others.
    """
    import math

    # one degree of latitude in km: pi * R / 180
    deg_km = 3.141592653589793 * EARTH_RADIUS_KM / 180.0
    cell_deg = radius_km / deg_km
    lon_cell_min = cell_deg / math.cos(math.radians(max_abs_lat_deg))
    # round the cell width UP to 360/n so n uniform cells tile the circle
    # exactly (a non-dividing seam cell would be narrower than the radius
    # and break the ±1-neighbor completeness guarantee at the wrap)
    n_lon = max(1, int(360.0 // lon_cell_min))
    lon_cell_deg = 360.0 / n_lon

    def cell(lat: Column, lon: Column) -> tuple[Column, Column]:
        lat_ok = F.when(
            F.abs(lat) <= F.lit(float(max_abs_lat_deg)), lat
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "proximity_join: |lat| exceeds max_abs_lat_deg="
                        f"{max_abs_lat_deg} (got "
                    ),
                    lat.cast("string"),
                    F.lit(") — raise max_abs_lat_deg for polar data"),
                )
            )
        )
        return (
            F.floor(lat_ok / F.lit(cell_deg)).cast("long"),
            F.pmod(
                F.floor((lon + F.lit(180.0)) / F.lit(lon_cell_deg)),
                F.lit(n_lon),
            ).cast("long"),
        )

    la, lb = suffixes
    lcols = [F.col(c).alias(f"{c}{la}") for c in left.columns]
    rcols = [F.col(c).alias(f"{c}{lb}") for c in right.columns]
    cy, cx = cell(F.col(lat_col), F.col(lon_col))
    dy = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy")
    # with <=3 lon cells on the whole circle, ±1 offsets alias under pmod
    # and would emit duplicate candidate pairs — replicate distinct
    # residues only
    dx_offsets = [-1, 0, 1] if n_lon >= 3 else list(range(n_lon))
    dx = F.explode(F.array(*[F.lit(o) for o in dx_offsets])).alias("dx")
    lrep = (
        left.select(*lcols, cy.alias("cy"), cx.alias("cx"))
        .select("*", dy)
        .select("*", dx)
        .select(
            *[f"{c}{la}" for c in left.columns],
            (F.col("cy") + F.col("dy")).alias("cell_y"),
            # wrap the lon neighbor modulo the cell count so the 3x3
            # neighborhood is contiguous across the antimeridian seam
            F.pmod(F.col("cx") + F.col("dx"), F.lit(n_lon))
            .cast("long")
            .alias("cell_x"),
        )
    )
    rrep = right.select(
        *rcols, cy.alias("cell_y"), cx.alias("cell_x")
    )
    dist = haversine_km(
        F.col(f"{lat_col}{la}"),
        F.col(f"{lon_col}{la}"),
        F.col(f"{lat_col}{lb}"),
        F.col(f"{lon_col}{lb}"),
    )
    return (
        lrep.join(rrep, ["cell_y", "cell_x"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .drop("cell_y", "cell_x")
    )

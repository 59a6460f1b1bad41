"""Grid-alignment joins and the upstream-area mask (SURVEY.md §2.3 J7,
§2.2 P10).

The reference aligns the static upstream-area raster to the discharge grid
with xarray's nearest-neighbor reindex, then NaN-masks cells whose catchment
is below 250 km² (flood/etl/filter_by_upstream.py:12-28, threshold at
databricks/config.json:30).  Both rasters share the same 0.05° grid up to
float noise, so "nearest" is exactly "same grid cell".

Spark-first form: snap both sides to integer grid indices (round(coord/res))
and equi-join — a broadcast join when the mask is small, a plain shuffled
equi-join otherwise.  No UDF, no cross/range join; survives 100 TB because it
is a hash join on a dense integer key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flood_data_spark.config import DEFAULT_CONFIG
from flood_data_spark.functions.keys import grid_index


def nearest_grid_join(left: DataFrame, right: DataFrame,
                      resolution: float | None = None,
                      how: str = "inner",
                      broadcast_right: bool = False) -> DataFrame:
    """Equi-join two cell-keyed tables after snapping each side's (latitude,
    longitude) to integer grid indices.  Right-side lat/lon are dropped; the
    left side's coordinates are kept as the canonical ones (matching the
    reference's reindex-to-discharge-grid direction)."""
    res = resolution if resolution is not None else DEFAULT_CONFIG.resolution

    def with_idx(df: DataFrame) -> DataFrame:
        return (df
                .withColumn("_glat", grid_index("latitude", res))
                .withColumn("_glon", grid_index("longitude", res)))

    lhs = with_idx(left)
    rhs = with_idx(right).drop("latitude", "longitude")
    if broadcast_right:
        rhs = F.broadcast(rhs)
    return lhs.join(rhs, on=["_glat", "_glon"], how=how).drop("_glat", "_glon")


def upstream_mask(forecast_df: DataFrame, upstream_df: DataFrame,
                  threshold: float | None = None,
                  resolution: float | None = None,
                  broadcast_upstream: bool = True) -> DataFrame:
    """Drop forecast rows whose grid cell drains < threshold m² upstream.

    Equivalent to the reference's where(uparea >= t) + dropna
    (filter_by_upstream.py:25-27 then raster_converter.py:44-45): cells with
    NaN/absent uparea are dropped too, which the inner join + filter gives us
    for free.
    """
    t = threshold if threshold is not None else DEFAULT_CONFIG.upstream_threshold
    masked = nearest_grid_join(
        forecast_df,
        upstream_df.filter(F.col("uparea").isNotNull()),
        resolution=resolution,
        how="inner",
        broadcast_right=broadcast_upstream,
    )
    return masked.filter(F.col("uparea") >= t).drop("uparea")

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


def nearest_reindex(target: DataFrame, source: DataFrame,
                    resolution: float | None = None,
                    value_cols=None, max_distance: float | None = None,
                    suffix: str = "_src") -> DataFrame:
    """General nearest-neighbor reindex for ARBITRARILY OFFSET grids — the
    exact semantics of xarray's ``reindex(method='nearest')`` (reference
    flood/etl/filter_by_upstream.py:21-23) without the aligned-grids
    assumption `nearest_grid_join`'s snap-equi-join relies on.

    Each target row gains the nearest source row's value columns (suffixed),
    the matched source coordinates, and the euclidean degree distance
    (left-outer: unmatched targets keep nulls).  ``max_distance`` voids
    matches farther than the bound (xarray's ``tolerance``).

    Plan shape (the 100 TB formulation): both sides bucket into
    ``resolution``-sized cells; each target row fans out to its 3×3
    neighboring buckets (two tiny explodes, 9×), candidates meet in a plain
    equi-join on the bucket key, and one aggregation takes the per-target
    argmin via ``min(struct(distance, lat, lon, …))`` — lexicographic struct
    ordering makes the tie-break (distance, then source lat, lon)
    deterministic.  Two shuffles, never a cross join.  Correct whenever the
    source grid's spacing is <= ``resolution`` (a full grid's nearest point
    then always lies inside the 3×3 neighborhood); for sparser sources raise
    ``resolution`` to their spacing.
    """
    res = resolution if resolution is not None else DEFAULT_CONFIG.resolution
    vals = (list(value_cols) if value_cols is not None
            else [c for c in source.columns
                  if c not in ("latitude", "longitude")])

    # _rid exists only to group one target row's 9 bucket probes back
    # together; the whole computation is ONE plan branch (left join +
    # aggregate), so the nondeterministic id is generated and consumed
    # within a single evaluation — a two-branch formulation (matched ∪
    # anti-join missing) would re-evaluate the id per branch and
    # desynchronize under nondeterministic input row order.
    t = (target
         .withColumn("_rid", F.monotonically_increasing_id())
         .withColumn("_di", F.explode(F.expr("array(-1L, 0L, 1L)")))
         .withColumn("_dj", F.explode(F.expr("array(-1L, 0L, 1L)")))
         .withColumn("_gi", F.floor(F.col("latitude") / res) + F.col("_di"))
         .withColumn("_gj", F.floor(F.col("longitude") / res) + F.col("_dj"))
         .drop("_di", "_dj"))
    s = (source
         .select(F.floor(F.col("latitude") / res).alias("_gi"),
                 F.floor(F.col("longitude") / res).alias("_gj"),
                 F.col("latitude").alias("_slat"),
                 F.col("longitude").alias("_slon"),
                 *[F.col(c).alias("_v_" + c) for c in vals]))

    # squared distance in the argmin struct: sqrt can collapse two distinct
    # squared distances to equal doubles, falling through to the (slat,
    # slon) tie-break where a squared-distance oracle still distinguishes —
    # rank on the exact quantity, sqrt only for the output column
    dist2 = (
        (F.col("latitude") - F.col("_slat")) ** 2
        + (F.col("longitude") - F.col("_slon")) ** 2)
    # LEFT join: targets with no bucket-sharing source row keep their 9
    # probe rows with null candidates, so they survive to the aggregate
    # (null best -> null outputs = left-outer semantics) without a second
    # plan branch
    cand = (t.join(s, ["_gi", "_gj"], "left")
            .withColumn("_dist2", dist2))
    best_struct = F.struct(
        F.col("_dist2").alias("d2"),
        F.col("_slat").alias("slat"),
        F.col("_slon").alias("slon"),
        *[F.col("_v_" + c).alias(c) for c in vals])
    if max_distance is not None:
        # null out (rather than filter out) candidates beyond the bound:
        # min() ignores nulls, and the target row itself must survive
        # compare in squared space so the bound uses the same exact
        # quantity as the ranking (no sqrt rounding at the boundary)
        best_struct = F.when(
            F.col("_dist2") <= float(max_distance) * float(max_distance),
            best_struct)
    else:
        best_struct = F.when(F.col("_dist2").isNotNull(), best_struct)

    target_cols = [c for c in target.columns]
    best = (cand
            .groupBy("_rid")
            .agg(*[F.first(c).alias(c) for c in target_cols],
                 F.min(best_struct).alias("_best")))
    return best.select(
        *target_cols,
        F.col("_best.slat").alias("latitude" + suffix),
        F.col("_best.slon").alias("longitude" + suffix),
        F.sqrt(F.col("_best.d2")).alias("distance" + suffix),
        *[F.col("_best." + c).alias(c + suffix) for c in vals])


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

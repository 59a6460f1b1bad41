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


def conservative_regrid(df: DataFrame, lat_col: str, lon_col: str,
                        value_col: str, src_res: float,
                        dst_res: float, group_keys=()) -> DataFrame:
    """First-order conservative (area-weighted) regridding between two
    axis-aligned regular lat/lon grids (Jones 1999, the SCRIP/ESMF
    `conserve` method restricted to rectangular cells — where the
    overlap integral is a product of two 1-D interval intersections):
    each source cell scatters onto every destination cell it overlaps
    with weight = overlap_lat · overlap_lon, and the destination
    value is the weight-averaged source value — the regrid GloFAS-
    class products undergo between native (~0.05°) and user (~0.1°)
    resolutions.  Both grids are cell-centered with boundaries at
    integer multiples of their resolution (the repo's half-offset
    grid convention: center = (k + ½)·res).

    EXACTNESS — zero double seams: coordinates and resolutions
    quantize ONCE to integer half-micro-degrees (×2e6, so half-cells
    stay integral); cell bounds, destination indices (floor division
    via the truncating-% identity, portable to any engine), axis
    overlaps, and weights are pure integer arithmetic; the weighted
    mean and the coverage fraction close as exact `_idiv_half_up`
    ratios.

    SCALE — the candidate explode is ⌈src/dst⌉+1 per axis (a LITERAL
    sequence — 4 candidates for 2× refinement, never data-dependent),
    and the single exchange keys on the destination cell: at 100 TB
    the raster corpus moves once, amplified by the bounded candidate
    count, into grid-bounded groups.  No join at all.  Returns
    (keys…, dlat, dlon, value, coverage), sorted; `coverage` is the
    covered fraction of each destination cell (edge cells < 1)."""
    from flood_data_spark.datapipe.linalg import _idiv_half_up

    keys = list(group_keys)
    if not (src_res > 0 and dst_res > 0):
        raise ValueError("conservative_regrid: resolutions must be "
                         "positive")
    U = 2_000_000  # half-micro-degrees per degree
    rs = int(round(float(src_res) * U))
    rd = int(round(float(dst_res) * U))
    if rs % 2 or rd % 2:
        raise ValueError("conservative_regrid: resolution must be an "
                         "even number of half-micro-degrees")
    # max dst cells a src cell can touch per axis: ⌈rs/rd⌉ + 1 — the
    # +1 covers a cell straddling one more boundary than the integer
    # ratio suggests (misaligned grids; rs//rd + 1 would silently DROP
    # the last sliver, pinned by test_regrid_misaligned_grids)
    span = (rs + rd - 1) // rd + 1
    dec = "decimal(38,0)"

    def u(col):
        c = col.cast("double")
        return (F.signum(c) * F.floor(F.abs(c) * U + F.lit(0.5))) \
            .cast("long")

    def fdiv(a, b: int):
        # floor division for any sign via the truncating-% identity
        # ((a % b) + b) % b — identical in Spark and DuckDB
        bb = F.lit(b)
        pm = ((a % bb) + bb) % bb
        return ((a - pm) / bb).cast("long")

    base = df.select(
        *keys,
        (u(F.col(lat_col)) - F.lit(rs // 2)).alias("_ylo"),
        (u(F.col(lon_col)) - F.lit(rs // 2)).alias("_xlo"),
        F.col(value_col).cast("double").alias("_v"))
    base = base.select(
        *keys, "_ylo", "_xlo", "_v",
        (F.signum(F.col("_v"))
         * F.floor(F.abs(F.col("_v")) * F.lit(1_000_000)
                   + F.lit(0.5))).cast("long").alias("_qv"),
        fdiv(F.col("_ylo"), rd).alias("_iy0"),
        fdiv(F.col("_xlo"), rd).alias("_ix0"))
    offs = F.array(*[F.lit(k) for k in range(span)])
    cand = (base.select(*keys, "_ylo", "_xlo", "_qv", "_iy0", "_ix0",
                        F.explode(offs).alias("_dy"))
            .select(*keys, "_ylo", "_xlo", "_qv", "_ix0",
                    (F.col("_iy0") + F.col("_dy")).alias("_iy"),
                    F.explode(offs).alias("_dx"))
            .select(*keys, "_ylo", "_xlo", "_qv", "_iy",
                    (F.col("_ix0") + F.col("_dx")).alias("_ix")))
    rd_l = F.lit(rd).cast("long")
    oy = (F.least(F.col("_ylo") + F.lit(rs), (F.col("_iy") + 1) * rd_l)
          - F.greatest(F.col("_ylo"), F.col("_iy") * rd_l))
    ox = (F.least(F.col("_xlo") + F.lit(rs), (F.col("_ix") + 1) * rd_l)
          - F.greatest(F.col("_xlo"), F.col("_ix") * rd_l))
    w = (F.greatest(oy, F.lit(0)).cast(dec)
         * F.greatest(ox, F.lit(0)).cast(dec))
    agg = (cand.select(*keys, "_iy", "_ix",
                       w.alias("_w"), F.col("_qv").cast(dec).alias("_qv"))
           .filter(F.col("_w") > 0)
           .groupBy(*keys, "_iy", "_ix")
           .agg(F.sum(F.col("_w") * F.col("_qv")).alias("_swv"),
                F.sum("_w").alias("_sw")))
    mega_f = F.lit(1e6)
    val = _idiv_half_up(F.col("_swv"), F.col("_sw"))
    cov = _idiv_half_up(F.col("_sw") * F.lit(1_000_000).cast(dec),
                        F.lit(rd).cast(dec) * F.lit(rd).cast(dec))
    half = F.lit(rd // 2).cast("long")
    # r16 (guide §2.4): no final global sort — the former
    # .orderBy(*keys, "dlat", "dlon") range-exchanged the whole
    # destination grid purely for presentation; the multiset is
    # unchanged and the gates compare canonically.
    return agg.select(
        *keys,
        ((F.col("_iy") * rd_l + half).cast("double")
         / F.lit(float(U))).alias("dlat"),
        ((F.col("_ix") * rd_l + half).cast("double")
         / F.lit(float(U))).alias("dlon"),
        (val.cast("double") / mega_f).alias("value"),
        (cov.cast("double") / mega_f).alias("coverage"))

"""Distributed raster ingestion (SURVEY.md §2.1 S2-S6, §3 E2).

The reference decodes GRIB/NetCDF on the driver with xarray in a Python loop
over 30 lead-time files (databricks/glofas-transform.py:95-139), then
flattens to pandas and writes parquet per file.  That caps ingest throughput
at one node.  Spark-native redesign:

    spark.read.format("binaryFile").load(glob)      # 1 row per raster file
      → mapInPandas(decode_fn)                      # THE one pandas boundary
      → native range filter / upstream mask / unionByName downstream

The decode callable turns one file's bytes into long-form rows
(number, step, latitude, longitude, time, valid_time, dis24) — i.e. the
xarray `to_dataframe().reset_index()` flattening (reference
flood/etl/raster_converter.py:55-85) happens inside executors, one task per
file, embarrassingly parallel across the 30 lead times × historical days.

Codec dispatch: cfgrib/xarray when installed (full template coverage);
without them, REAL dependency-free readers handle the common encodings —
GRIB2 simple-, complex- (incl. spatial-differencing) and lossless
JPEG2000-packed regular lat/lon fields (`sources/grib2.py` +
the from-spec `sources/jpeg2000.py` codec),
classic-format NetCDF (`sources/netcdf3.py`), and NetCDF-4/HDF5 in the
default libnetcdf layout (`sources/hdf5.py`: contiguous/chunked +
deflate/shuffle, dimension scales, dense groups with multi-block /
nested-indirect / filtered fractal heaps and multi-level v2 B-trees) —
so genuine bytes decode in this container too.  Only exotic inputs
(signed/restricted CCSDS profiles, pentagonal spectral truncations,
huge/tiny HDF5 heap objects, szip) still raise NotImplementedError
behind the import-try; `synthetic_grib_decoder` remains the
deterministic stand-in for tests that need arbitrary planted values.
"""

from __future__ import annotations

import io
import json
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from flood_data_spark.schemas import RAW_FORECAST_SCHEMA

# output columns of every decoder, matching RAW_FORECAST_SCHEMA
DECODED_COLUMNS = ["number", "latitude", "longitude", "time", "step",
                   "valid_time", "dis24"]


def grib_decoder(content: bytes, *, member_filter: str | None = None) -> pd.DataFrame:
    """Decode one GRIB message set to long-form rows.

    member_filter: None → all, 'cf' → control only, 'pf' → perturbed only
    (the reference's filter_by_keys dataType dispatch,
    databricks/glofas-transform.py:104-109).

    Dispatch: cfgrib/xarray when installed (full template coverage);
    otherwise GRIB2 simple-/complex-/JPEG2000-/CCSDS-packed lat/lon
    fields decode through the REAL dependency-free readers
    (`sources.grib2`, `sources.jpeg2000`, `sources.ccsds121`) — only
    out-of-profile residuals require the ecCodes stack."""
    try:
        import cfgrib  # noqa: F401
        import xarray as xr
    except ImportError as e:
        from flood_data_spark.sources.grib2 import grib2_to_dataframe
        import struct as _struct
        try:
            return grib2_to_dataframe(content, member_filter=member_filter)
        # IndexError/struct.error: truncated sections surface as raw
        # slicing/unpack failures — wrap them in the same guidance
        except (NotImplementedError, ValueError, IndexError,
                _struct.error) as inner:
            raise NotImplementedError(
                f"cfgrib/xarray not available and the native GRIB2 reader "
                f"cannot decode this file ({inner}); install cfgrib or use "
                "synthetic_grib_decoder for testing") from e
    kwargs = {}
    if member_filter:
        kwargs["backend_kwargs"] = {
            "filter_by_keys": {"dataType": member_filter}}
    # cfgrib rides on ecCodes, which needs a real filesystem path (it builds
    # .idx sidecar files) — spool the executor-local bytes to a temp file
    import os
    import tempfile
    fd, tmp = tempfile.mkstemp(suffix=".grib")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(content)
        ds = xr.open_dataset(tmp, engine="cfgrib", **kwargs)
        pdf = ds.to_dataframe().reset_index()[DECODED_COLUMNS]
        ds.close()
    finally:
        import glob as _glob
        os.unlink(tmp)
        # cfgrib's sidecar is '{path}.{short_hash}.idx' (hash varies with
        # filter keys) — glob, or executors leak one index per file
        for idx in _glob.glob(tmp + "*.idx"):
            os.unlink(idx)
    return pdf


def netcdf_decoder(content: bytes) -> pd.DataFrame:
    """Decode one NetCDF static raster (upstream area / thresholds).

    Classic-format files (magic CDF1/2/5) decode through the REAL
    dependency-free reader (`sources.netcdf3`, stdlib struct + numpy —
    same long-form/CF semantics as xarray's to_dataframe).  NetCDF-4
    (HDF5 signature) files decode through the minimal dependency-free
    HDF5 reader (`sources.hdf5`: superblock v0, symbol-table groups,
    contiguous/chunked layouts, deflate/shuffle, dimension scales —
    what libnetcdf's default format writes); shapes outside its scope
    fall through to xarray/h5netcdf when installed, else re-raise the
    reader's NotImplementedError naming the missing feature."""
    if content[:3] == b"CDF":
        from flood_data_spark.sources.netcdf3 import to_dataframe
        return to_dataframe(content)
    from flood_data_spark.sources import hdf5 as h5
    if content[:8] == h5.SIGNATURE:
        try:
            return h5.to_dataframe(content)
        except NotImplementedError as nie:
            try:
                import xarray as xr
            except ImportError:
                # surface the reader's error (it names the unsupported
                # feature + the escape hatch), not a bare ImportError
                raise nie from None
            ds = xr.open_dataset(io.BytesIO(content), engine="h5netcdf")
            return ds.to_dataframe().reset_index()
    try:
        import xarray as xr
    except ImportError as e:
        raise NotImplementedError(
            "unrecognized raster container (not CDF/HDF5) and xarray not "
            "available in this environment") from e
    ds = xr.open_dataset(io.BytesIO(content))
    return ds.to_dataframe().reset_index()


def synthetic_grib_decoder(content: bytes, *,
                           member_filter: str | None = None) -> pd.DataFrame:
    """Deterministic fake decoder with the real output contract.

    The 'file' is a JSON header: {"step_days": s, "time_ns": t, "members": m,
    "lat0": .., "lon0": .., "nlat": .., "nlon": .., "resolution": ..}.
    Discharge is a deterministic function of (member, cell) so tests can
    compute ground truth independently.
    """
    hdr = json.loads(content.decode("utf-8"))
    res = hdr.get("resolution", 0.05)
    members = range(hdr.get("members", 3))
    if member_filter == "cf":
        members = [0]
    elif member_filter == "pf":
        members = range(1, hdr.get("members", 3))
    rows = []
    step_ns = int(hdr["step_days"] * 86400 * 1e9)
    for m in members:
        for i in range(hdr.get("nlat", 4)):
            for j in range(hdr.get("nlon", 4)):
                lat = hdr.get("lat0", 0.025) + i * res
                lon = hdr.get("lon0", 0.025) + j * res
                dis = float(10 + m + i * 100 + j + hdr["step_days"] * 1000)
                rows.append((m, lat, lon, hdr["time_ns"], step_ns,
                             hdr["time_ns"] + step_ns, dis))
    return pd.DataFrame(rows, columns=DECODED_COLUMNS)


def read_rasters(spark: SparkSession, path_glob: str,
                 decoder: Callable[..., pd.DataFrame] = grib_decoder,
                 member_filter: str | None = None,
                 path_filter: str | None = None) -> DataFrame:
    """binaryFile scan + mapInPandas decode → raw-forecast DataFrame.

    One decode task per raster file; Arrow-batched output.  Everything
    downstream (rounding, masking, aggregation) is native DataFrame code.
    """
    reader = spark.read.format("binaryFile")
    if path_filter:
        reader = reader.option("pathGlobFilter", path_filter)
    files = reader.load(path_glob).select("path", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                out = decoder(bytes(content), member_filter=member_filter) \
                    if member_filter is not None else decoder(bytes(content))
                if len(out):
                    yield out[DECODED_COLUMNS].astype({
                        "number": "int64", "latitude": "float64",
                        "longitude": "float64", "time": "int64",
                        "step": "int64", "valid_time": "int64",
                        "dis24": "float32"})

    return files.mapInPandas(decode, schema=RAW_FORECAST_SCHEMA)


def merge_control_and_ensemble(control_df: DataFrame,
                               ensemble_df: DataFrame,
                               control_number: int = 0) -> DataFrame:
    """U1: stack control + perturbed members along the member dimension
    (reference xr.concat dim='number', glofas-transform.py:111-114), as a
    shuffle-free unionByName."""
    from pyspark.sql import functions as F
    ctl = control_df.withColumn("number", F.lit(control_number).cast("long"))
    return ctl.unionByName(ensemble_df.select(ctl.columns))

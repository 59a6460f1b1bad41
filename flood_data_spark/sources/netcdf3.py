"""Pure-Python classic-NetCDF (CDF-1/2/5) reader.

The static rasters the reference ingests through xarray (upstream drainage
area, return-period thresholds — flood/etl/raster_converter.py:31-85) are
plain gridded arrays; when they are stored in the *classic* NetCDF format
(magic ``CDF\\x01``/``\\x02``/``\\x05``) the container is a simple, fully
public binary layout (the NetCDF classic format spec) decodable with
stdlib ``struct`` + numpy — no libnetcdf/HDF5 stack required.  This module
is the dependency-free fallback branch of ``raster.netcdf_decoder``;
NetCDF-4 (HDF5-based) files still need xarray/h5netcdf and raise
NotImplementedError without them.

Deliberately scoped to what a static raster needs:
- header: dim list, global attrs, var list with per-var attrs
- fixed-size (non-record) variables of all six classic types
- scale_factor / add_offset / _FillValue / missing_value CF conventions
  (fill → NaN BEFORE scaling, float64 math — the xarray semantics)
- record (unlimited-dim) variables raise NotImplementedError: forecast
  streams arrive as GRIB in this pipeline, never classic-NetCDF records
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_MAGIC = b"CDF"
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy dtype (big-endian), size)
_TYPES = {
    1: (np.dtype(">i1"), 1),   # NC_BYTE
    2: (np.dtype("S1"), 1),    # NC_CHAR
    3: (np.dtype(">i2"), 2),   # NC_SHORT
    4: (np.dtype(">i4"), 4),   # NC_INT
    5: (np.dtype(">f4"), 4),   # NC_FLOAT
    6: (np.dtype(">f8"), 8),   # NC_DOUBLE
}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("netcdf3: truncated file")
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def nonneg(self, cdf_version: int) -> int:
        # CDF-5 widens the NON_NEG quantities to 64-bit
        return self.i8() if cdf_version == 5 else self.i4()

    def name(self, cdf_version: int) -> str:
        n = self.nonneg(cdf_version)
        s = self._take(n).decode("utf-8")
        pad = (4 - n % 4) % 4
        self._take(pad)
        return s

    def values(self, nc_type: int, nelems: int):
        dt, size = _TYPES[nc_type]
        raw = self._take(size * nelems)
        pad = (4 - (size * nelems) % 4) % 4
        self._take(pad)
        if nc_type == 2:
            return raw[:nelems].decode("latin1")
        arr = np.frombuffer(raw, dtype=dt, count=nelems)
        # native byte order: Arrow (the mapInPandas boundary) rejects
        # byte-swapped arrays
        return arr.astype(dt.newbyteorder("="))

    def att_list(self, cdf_version: int) -> dict:
        tag = self.i4()
        count = self.nonneg(cdf_version)
        if tag == 0 and count == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"netcdf3: bad attribute tag {tag}")
        out = {}
        for _ in range(count):
            nm = self.name(cdf_version)
            t = self.i4()
            n = self.nonneg(cdf_version)
            v = self.values(t, n)
            if not isinstance(v, str) and len(v) == 1:
                v = v[0]
            out[nm] = v
        return out


def parse_netcdf3(content: bytes) -> tuple[dict, dict, dict]:
    """Parse a classic-NetCDF byte string.

    Returns (dims, variables, global_attrs) where dims maps name -> size,
    and variables maps name -> dict(dims=[names], attrs={...},
    data=np.ndarray shaped to the dims).  Raw data — no CF scaling here
    (``to_dataframe`` applies it).
    """
    if content[:3] != _MAGIC:
        raise ValueError("netcdf3: not a classic NetCDF file (bad magic)")
    version = content[3]
    if version not in (1, 2, 5):
        raise NotImplementedError(
            f"netcdf3: CDF version {version} unsupported (NetCDF-4/HDF5 "
            "files need the xarray/h5netcdf stack)")
    r = _Reader(content)
    r.pos = 4
    numrecs = r.nonneg(version) if version == 5 else r.i4()

    # dim_list
    tag = r.i4()
    ndims = r.nonneg(version)
    dims, dim_names = {}, []
    if tag not in (0, _NC_DIMENSION):
        raise ValueError(f"netcdf3: bad dimension tag {tag}")
    for _ in range(ndims):
        nm = r.name(version)
        sz = r.nonneg(version)
        dims[nm] = sz
        dim_names.append(nm)

    gatts = r.att_list(version)

    # var_list
    tag = r.i4()
    nvars = r.nonneg(version)
    if tag not in (0, _NC_VARIABLE):
        raise ValueError(f"netcdf3: bad variable tag {tag}")
    variables = {}
    for _ in range(nvars):
        nm = r.name(version)
        nd = r.nonneg(version)
        dimids = [r.nonneg(version) for _ in range(nd)]
        vatts = r.att_list(version)
        nc_type = r.i4()
        _vsize = r.nonneg(version)
        begin = r.i8() if version in (2, 5) else r.i4()
        vdims = [dim_names[i] for i in dimids]
        if any(dims[d] == 0 for d in vdims):
            raise NotImplementedError(
                "netcdf3: record (unlimited-dimension) variables "
                f"unsupported ({nm!r}); numrecs={numrecs}")
        dt, size = _TYPES[nc_type]
        shape = [dims[d] for d in vdims]
        n = int(np.prod(shape)) if shape else 1
        raw = content[begin:begin + size * n]
        if len(raw) != size * n:
            raise ValueError(f"netcdf3: truncated data for {nm!r}")
        if nc_type == 2:
            data = np.frombuffer(raw, dtype="S1", count=n).reshape(shape)
        else:
            data = np.frombuffer(raw, dtype=dt, count=n) \
                .astype(dt.newbyteorder("=")).reshape(shape)
        variables[nm] = {"dims": vdims, "attrs": vatts, "data": data}
    return dims, variables, gatts


def _apply_cf(var: dict) -> np.ndarray:
    """CF unpacking, xarray-equivalent order: fill/missing -> NaN first,
    then scale_factor/add_offset in float64."""
    data = var["data"]
    attrs = var["attrs"]
    fill = attrs.get("_FillValue", attrs.get("missing_value"))
    scaled = "scale_factor" in attrs or "add_offset" in attrs
    if fill is not None or scaled:
        out = data.astype(np.float64)
        if fill is not None:
            out[data == fill] = np.nan
        if scaled:
            out = out * float(attrs.get("scale_factor", 1.0)) \
                + float(attrs.get("add_offset", 0.0))
        return out
    return data


def flatten_grid(dims: dict, variables: dict, label: str) -> pd.DataFrame:
    """(dims, variables) → long-form frame, matching
    ``xr.open_dataset(...).to_dataframe().reset_index()`` for static
    rasters: coordinate variables (1-D, named as their dim) become index
    columns over the cartesian product of the data variables\' dims; data
    variables are CF-unpacked (fill→NaN, scale/offset applied).  Shared
    by the classic (this module) and HDF5 (`sources.hdf5`) readers —
    `label` names the caller in error messages."""
    coord_names = [n for n, v in variables.items()
                   if len(v["dims"]) == 1 and v["dims"][0] == n]
    data_vars = {n: v for n, v in variables.items() if n not in coord_names}
    if not data_vars:
        raise ValueError(f"{label}: no data variables")
    # all data vars must share one dim tuple (true for the static rasters;
    # mixed-shape files need the real xarray alignment machinery)
    shapes = {tuple(v["dims"]) for v in data_vars.values()}
    if len(shapes) != 1:
        raise NotImplementedError(
            f"{label}: data variables span different dims {shapes}")
    (ddims,) = shapes
    cols = {}
    mesh_sizes = [dims[d] for d in ddims]
    for ax, d in enumerate(ddims):
        if d in coord_names:
            axis_vals = _apply_cf(variables[d])
        else:
            axis_vals = np.arange(dims[d])
        reshape = [1] * len(ddims)
        reshape[ax] = mesh_sizes[ax]
        cols[d] = np.broadcast_to(
            np.asarray(axis_vals).reshape(reshape), mesh_sizes).ravel()
    for n, v in data_vars.items():
        cols[n] = _apply_cf(v).ravel()
    return pd.DataFrame(cols)


def to_dataframe(content: bytes) -> pd.DataFrame:
    """Classic-NetCDF bytes → long-form pandas frame (see flatten_grid)."""
    dims, variables, _g = parse_netcdf3(content)
    return flatten_grid(dims, variables, "netcdf3")

"""Pure-Python GRIB2 reader for simple-packed regular lat/lon grids.

GRIB edition 2 (WMO FM 92) is a public, section-structured binary format.
The subset an ensemble river-discharge forecast actually uses — grid
definition template 3.0 (regular latitude/longitude), product definition
templates 4.0/4.1 (deterministic / ensemble member), data representation
template 5.0 (simple packing), optional bitmap — is small enough to decode
with stdlib ``struct`` + numpy, no ecCodes/cfgrib stack.  This module is
the dependency-free fallback branch of ``raster.grib_decoder``; complex
packings (JPEG2000, CCSDS, spectral) still require cfgrib and raise
NotImplementedError without it.

Semantics matched to the cfgrib/xarray path the reference rides on
(flood/etl/utils.py:3-14, flood/etl/raster_converter.py:55-85):
- one long-form row per (member, lat, lon) with ns-epoch ``time``/``step``/
  ``valid_time`` longs — the to_dataframe().reset_index() flattening
- unpacked value = (R + X * 2**E) / 10**D  (simple packing, template 5.0)
- bitmap-masked points surface as NaN
- 'cf'/'pf' member filtering = perturbation number 0 / >0 (the
  filter_by_keys dataType dispatch, databricks/glofas-transform.py:104-109)
"""

from __future__ import annotations

import calendar
import struct

import numpy as np
import pandas as pd

_NS_PER_UNIT = {
    0: 60 * 10**9,            # minute
    1: 3600 * 10**9,          # hour
    2: 86400 * 10**9,         # day
    10: 3 * 3600 * 10**9,     # 3 hours
    11: 6 * 3600 * 10**9,     # 6 hours
    12: 12 * 3600 * 10**9,    # 12 hours
    13: 10**9,                # second
}


def _u(b: bytes) -> int:
    return int.from_bytes(b, "big")


def _sm(b: bytes) -> int:
    """GRIB signed integers are sign-magnitude, not two's complement."""
    v = _u(b)
    sign_bit = 1 << (8 * len(b) - 1)
    return -(v & ~sign_bit) if v & sign_bit else v


def _unpack_bits(data: bytes, nbits: int, n: int) -> np.ndarray:
    """First n nbits-wide big-endian unsigned ints from a bit string."""
    if nbits == 0:
        return np.zeros(n, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         count=n * nbits).reshape(n, nbits)
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)
    return bits.astype(np.int64) @ weights


def _iter_messages(content: bytes):
    pos = 0
    while pos < len(content):
        if len(content) - pos < 16:
            raise ValueError("grib2: truncated indicator section")
        if content[pos:pos + 4] != b"GRIB":
            raise ValueError(f"grib2: bad indicator at offset {pos}")
        if content[pos + 7] != 2:
            raise NotImplementedError(
                f"grib2: edition {content[pos + 7]} unsupported (2 only)")
        total = _u(content[pos + 8:pos + 16])
        if total < 16 or pos + total > len(content):
            raise ValueError(f"grib2: bad message length {total}")
        yield content[pos:pos + total]
        pos += total


def _sections(msg: bytes) -> dict:
    """Section number -> body bytes (including the 5-byte section header).
    Local-use section 2 is skipped; repeated sections unsupported (one
    field per message — true for the forecast files this pipeline reads)."""
    out = {}
    pos = 16
    while pos < len(msg):
        if msg[pos:pos + 4] == b"7777":
            return out
        ln = _u(msg[pos:pos + 4])
        if ln < 5:
            # a zero/short length would stall the scan forever
            raise ValueError(f"grib2: bad section length {ln} at {pos}")
        num = msg[pos + 4]
        if num in out:
            raise NotImplementedError(
                "grib2: multi-field messages (repeated sections) unsupported")
        out[num] = msg[pos:pos + ln]
        pos += ln
    raise ValueError("grib2: missing 7777 end section")


def _decode_message(msg: bytes) -> dict:
    s = _sections(msg)

    # section 1: reference time (octets 13-19, 1-indexed)
    s1 = s[1]
    ref_ns = calendar.timegm(
        (_u(s1[12:14]), s1[14], s1[15], s1[16], s1[17], s1[18])) * 10**9

    # section 3: grid — template 3.0 regular lat/lon only
    s3 = s[3]
    tmpl3 = _u(s3[12:14])
    if tmpl3 != 0:
        raise NotImplementedError(
            f"grib2: grid template 3.{tmpl3} unsupported (3.0 only)")
    ni, nj = _u(s3[30:34]), _u(s3[34:38])
    la1, lo1 = _sm(s3[46:50]) / 1e6, _sm(s3[50:54]) / 1e6
    di, dj = _u(s3[63:67]) / 1e6, _u(s3[67:71]) / 1e6
    scan = s3[71]
    if scan & 0x20:
        raise NotImplementedError(
            "grib2: j-consecutive scanning unsupported")
    # bit 1 (0x80): -i direction; bit 2 (0x40): +j (south->north)
    lons = lo1 + np.arange(ni) * (-di if scan & 0x80 else di)
    lats = la1 + np.arange(nj) * (dj if scan & 0x40 else -dj)

    # section 4: product — forecast step + ensemble member
    s4 = s[4]
    tmpl4 = _u(s4[7:9])
    if tmpl4 not in (0, 1):
        raise NotImplementedError(
            f"grib2: product template 4.{tmpl4} unsupported (4.0/4.1 only)")
    unit = s4[17]
    if unit not in _NS_PER_UNIT:
        raise NotImplementedError(f"grib2: time unit {unit} unsupported")
    step_ns = _u(s4[18:22]) * _NS_PER_UNIT[unit]
    number = s4[35] if tmpl4 == 1 else 0

    # section 5: data representation — template 5.0 simple packing
    s5 = s[5]
    tmpl5 = _u(s5[9:11])
    if tmpl5 != 0:
        raise NotImplementedError(
            f"grib2: data template 5.{tmpl5} unsupported (5.0 simple "
            "packing only; complex/JPEG2000 need cfgrib)")
    n_vals = _u(s5[5:9])
    ref_val = struct.unpack(">f", s5[11:15])[0]
    e_scale = _sm(s5[15:17])
    d_scale = _sm(s5[17:19])
    nbits = s5[19]

    # section 6: bitmap
    s6 = s[6]
    bmp_flag = s6[5]
    if bmp_flag == 255:
        bitmap = None
    elif bmp_flag == 0:
        bitmap = np.unpackbits(np.frombuffer(s6[6:], dtype=np.uint8),
                               count=ni * nj).astype(bool)
    else:
        raise NotImplementedError(
            f"grib2: predefined bitmap {bmp_flag} unsupported")

    # section 7: packed data
    x = _unpack_bits(s[7][5:], nbits, n_vals)
    vals = (ref_val + x.astype(np.float64) * 2.0 ** e_scale) / 10.0 ** d_scale
    if nbits == 0:
        vals = np.full(n_vals, ref_val / 10.0 ** d_scale)
    if bitmap is not None:
        full = np.full(ni * nj, np.nan)
        full[bitmap] = vals
        vals = full
    elif n_vals != ni * nj:
        raise ValueError("grib2: value count != grid size without bitmap")

    return {"number": int(number), "lats": lats, "lons": lons,
            "time": ref_ns, "step": step_ns, "values": vals}


def grib2_to_dataframe(content: bytes, *,
                       member_filter: str | None = None) -> pd.DataFrame:
    """GRIB2 bytes (1+ messages) → long-form rows in the raster decode
    contract: (number, latitude, longitude, time, step, valid_time, dis24).
    Row order per message is the grid scan order (i fastest), members in
    message order — the cfgrib flattening."""
    frames = []
    for msg in _iter_messages(content):
        m = _decode_message(msg)
        if member_filter == "cf" and m["number"] != 0:
            continue
        if member_filter == "pf" and m["number"] == 0:
            continue
        nj, ni = len(m["lats"]), len(m["lons"])
        frames.append(pd.DataFrame({
            "number": np.full(ni * nj, m["number"], dtype=np.int64),
            "latitude": np.repeat(m["lats"], ni),
            "longitude": np.tile(m["lons"], nj),
            "time": np.full(ni * nj, m["time"], dtype=np.int64),
            "step": np.full(ni * nj, m["step"], dtype=np.int64),
            "valid_time": np.full(ni * nj, m["time"] + m["step"],
                                  dtype=np.int64),
            "dis24": m["values"].astype(np.float32),
        }))
    if not frames:
        return pd.DataFrame({c: [] for c in ["number", "latitude",
                                             "longitude", "time", "step",
                                             "valid_time", "dis24"]})
    return pd.concat(frames, ignore_index=True)


def build_simple_message(xs, *, nj: int, ni: int, la1: float, lo1: float,
                         d: float, ref: float = 0.0, e_scale: int = 0,
                         d_scale: int = 0, nbits: int = 16,
                         member: int | None = None,
                         year: int = 2024, month: int = 1, day: int = 1,
                         ftime_hours: int = 24) -> bytes:
    """Encode one GRIB2 message (grid template 3.0, product 4.0/4.1, data
    template 5.0 simple packing) — the synthetic-data/test counterpart of
    the reader above.  `xs` are the packed integers, row-major (i fastest);
    decoded value = (ref + X * 2**e_scale) / 10**d_scale."""
    def sec(num, body):
        return struct.pack(">IB", len(body) + 5, num) + body

    def sm32(v):
        raw = abs(int(round(v)))
        return struct.pack(">I", raw | (0x80000000 if v < 0 else 0))

    for x in xs:
        if not 0 <= int(x) < (1 << nbits):
            # an oversized value would widen its bit field and silently
            # shift every subsequent packed value
            raise ValueError(
                f"grib2: packed value {x} does not fit in {nbits} bits")
    bits = "".join(format(int(x), f"0{nbits}b") for x in xs)
    bits += "0" * ((8 - len(bits) % 8) % 8)
    packed = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))

    s1 = sec(1, struct.pack(">HHBBB", 0, 0, 2, 0, 1)
             + struct.pack(">HBBBBB", year, month, day, 0, 0, 0)
             + bytes([0, 1]))
    grid = (bytes([6, 0]) + b"\x00" * 4 + bytes([0]) + b"\x00" * 4
            + bytes([0]) + b"\x00" * 4
            + struct.pack(">II", ni, nj) + b"\x00" * 8
            + sm32(la1 * 1e6) + sm32(lo1 * 1e6) + bytes([0x30])
            + sm32((la1 - (nj - 1) * d) * 1e6)
            + sm32((lo1 + (ni - 1) * d) * 1e6)
            # round, don't truncate: int(0.3 * 1e6) would encode 299999
            + struct.pack(">II", int(round(d * 1e6)), int(round(d * 1e6)))
            + bytes([0]))
    s3 = sec(3, bytes([0]) + struct.pack(">I", ni * nj) + bytes([0, 0])
             + struct.pack(">H", 0) + grid)
    prod = (bytes([0, 4, 2, 0, 0]) + struct.pack(">HB", 0, 0) + bytes([1])
            + struct.pack(">I", ftime_hours)
            + bytes([1, 0]) + b"\x00" * 4 + bytes([255, 0]) + b"\x00" * 4)
    if member is None:
        s4 = sec(4, struct.pack(">HH", 0, 0) + prod)
    else:
        s4 = sec(4, struct.pack(">HH", 0, 1) + prod + bytes([3, member, 51]))
    e_raw = abs(e_scale) | (0x8000 if e_scale < 0 else 0)
    d_raw = abs(d_scale) | (0x8000 if d_scale < 0 else 0)
    s5 = sec(5, struct.pack(">I", len(xs)) + struct.pack(">H", 0)
             + struct.pack(">f", ref) + struct.pack(">HH", e_raw, d_raw)
             + bytes([nbits, 0]))
    s6 = sec(6, bytes([255]))
    s7 = sec(7, packed)
    body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    return (b"GRIB" + b"\x00\x00" + bytes([1, 2])
            + struct.pack(">Q", 16 + len(body)) + body)

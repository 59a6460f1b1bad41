"""Pure-Python GRIB2 reader for regular lat/lon grids.

GRIB edition 2 (WMO FM 92) is a public, section-structured binary format.
The subset an ensemble river-discharge forecast actually uses — grid
definition template 3.0 (regular latitude/longitude), product definition
templates 4.0/4.1 (deterministic / ensemble member), data representation
templates 5.0 (simple packing), 5.2 (grid-point complex packing), 5.3
(complex + first/second-order spatial differencing), 5.40 (lossless
JPEG 2000 — decoded by the from-spec pure-Python codec in
``sources/jpeg2000.py``) and 5.42 (CCSDS 121.0-B Rice/AEC lossless —
``sources/ccsds121.py``), optional bitmap — is small enough to decode
with stdlib ``struct`` + numpy, no ecCodes/cfgrib stack.  This module is
the dependency-free fallback branch of ``raster.grib_decoder``.  Round
11 added lossy (9/7) JPEG 2000 and CCSDS 5.42; round 12 adds the
spectral templates 5.50/5.51 on grid template 3.50 (decoded to
coefficient rows via ``spectral_to_dataframe``); round 16 closed the
residual list further — signed and RSI-padded CCSDS profiles decode
from spec, the 3-byte flag is accepted as the no-op it is for 17-24-bit
samples, and general pentagonal truncations (rhomboidal, trapezoidal)
ride the mode-1 region enumeration n = m..min(K, J+m).  What still
requires cfgrib and raises NotImplementedError: restricted CCSDS
coding (flag 64 — a different option-ID table for nbits<=4),
non-Legendre representations, non-mode-1 ordering, and bitmaps on
spectral data.

REJECTION CONTRACT (round 13, VERDICT r12 #4; narrowed round 16): the
remaining residuals above are deliberately OUT OF SCOPE for this
reader.  Each named profile is pinned by a loud-failure test
(tests/test_grib2.py::test_spectral_guards /
test_spectral_rejection_contract_is_total,
tests/test_ccsds121.py::test_profile_guards / the options-mask pins in
test_grib2_template_542_*): they do not occur in GloFAS-class
operational data (regular lat/lon ensemble discharge), implementing
them would duplicate ecCodes for inputs the engine never sees, and any
such file dispatches loudly BY NAME to the cfgrib escape hatch rather
than decoding approximately.  A future round should extend this reader
only if real operational bytes hit one of these rejections.

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


class _BitReader:
    """Sequential bit-cursor over a byte string — the group stages of
    complex packing read three octet-aligned fixed-width arrays and then
    one continuous variable-width value stream."""

    def __init__(self, data: bytes):
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, nbits: int, n: int) -> np.ndarray:
        """n consecutive nbits-wide big-endian unsigned ints."""
        if nbits == 0:
            return np.zeros(n, dtype=np.int64)
        end = self.pos + n * nbits
        if end > len(self._bits):
            raise ValueError("grib2: bit stream overrun in complex packing")
        w = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)
        out = self._bits[self.pos:end].reshape(n, nbits).astype(np.int64) @ w
        self.pos = end
        return out

    def align(self):
        self.pos = (self.pos + 7) // 8 * 8


def _unpack_complex(s5: bytes, s7: bytes, n_vals: int) -> np.ndarray:
    """Data representation templates 5.2 (grid-point complex packing) and
    5.3 (complex + spatial differencing), missing-value management 0:
    group reference/width/length arrays (each octet-aligned), one
    continuous packed-difference stream, then the optional first/second
    -order spatial-differencing reconstruction (template 7.3: the extra
    descriptors ival1[, ival2] and gmin lead the data section,
    sign-magnitude, `extra_octets` wide).  Returns the X integer field of
    the (R + X*2^E)/10^D formula — same contract as simple packing's
    bit unpack."""
    tmpl5 = _u(s5[9:11])
    nbits = s5[19]
    missing_mgmt = s5[22]
    if missing_mgmt != 0:
        raise NotImplementedError(
            f"grib2: missing-value management {missing_mgmt} unsupported "
            "(0 only)")
    ng = _u(s5[31:35])
    width_ref, width_bits = s5[35], s5[36]
    len_ref = _u(s5[37:41])
    len_inc = s5[41]
    last_len = _u(s5[42:46])
    len_bits = s5[46]
    order = extra_octets = 0
    if tmpl5 == 3:
        order = s5[47]
        extra_octets = s5[48]
        if order not in (1, 2):
            raise NotImplementedError(
                f"grib2: spatial differencing order {order} unsupported")

    r = _BitReader(s7)
    ival = []
    gmin = 0
    if tmpl5 == 3 and extra_octets:
        sbit = 1 << (8 * extra_octets - 1)

        def _signed(v: int) -> int:
            return -(v & ~sbit) if v & sbit else v
        head = r.read(8 * extra_octets, order + 1)
        ival = [_signed(int(v)) for v in head[:order]]
        gmin = _signed(int(head[order]))

    refs = r.read(nbits, ng)
    r.align()
    widths = width_ref + r.read(width_bits, ng)
    r.align()
    lengths = len_ref + len_inc * r.read(len_bits, ng)
    r.align()
    if ng:
        lengths[-1] = last_len
    if int(lengths.sum()) != n_vals:
        raise ValueError(
            f"grib2: group lengths sum {int(lengths.sum())} != value "
            f"count {n_vals}")
    x = np.empty(n_vals, dtype=np.int64)
    pos = 0
    for g in range(ng):
        ln = int(lengths[g])
        x[pos:pos + ln] = refs[g] + r.read(int(widths[g]), ln)
        pos += ln

    if tmpl5 == 3:
        x += gmin
        for i, v in enumerate(ival):
            x[i] = v
        # undo the differencing: first order d[i] = x[i] - x[i-1];
        # second order d[i] = x[i] - 2x[i-1] + x[i-2].  Both are prefix
        # sums (order 2 = cumsum of the first-difference cumsum), so a
        # 6.5M-point grid reconstructs in numpy, not a Python loop
        if order == 1:
            x = np.cumsum(x, dtype=np.int64)
        elif n_vals > 2:
            first_diffs = np.cumsum(
                np.concatenate(([x[1] - x[0]], x[2:])), dtype=np.int64)
            x = np.cumsum(np.concatenate(([x[0]], first_diffs)),
                          dtype=np.int64)
    return x


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


def _product_info(s4: bytes, ref_ns: int = 0) -> tuple[int, int]:
    """Section 4 -> (step_ns, ensemble member number).

    Templates 4.0 (deterministic) / 4.1 (ensemble): step = forecast
    time in its unit.  Templates 4.8 (statistically processed — the
    accumulation GloFAS dis24 actually ships as) / 4.11 (ensemble +
    statistical): octets 35-41 (4.8) / 38-44 (4.11) carry the END of
    the overall time interval, and the cfgrib convention this reader
    matches is step = interval end − reference time, so a 24 h
    accumulation issued at 00Z with forecast time 0 reads step = 24 h
    and valid_time = the accumulation end — identical rows to the
    4.0/4.1 path for the same physical product."""
    tmpl4 = _u(s4[7:9])
    if tmpl4 not in (0, 1, 8, 11):
        raise NotImplementedError(
            f"grib2: product template 4.{tmpl4} unsupported "
            "(4.0/4.1/4.8/4.11 only)")
    unit = s4[17]
    if unit not in _NS_PER_UNIT:
        raise NotImplementedError(f"grib2: time unit {unit} unsupported")
    step_ns = _u(s4[18:22]) * _NS_PER_UNIT[unit]
    number = s4[35] if tmpl4 in (1, 11) else 0
    if tmpl4 in (8, 11):
        p = 34 if tmpl4 == 8 else 37     # end-of-interval octets
        end_ns = calendar.timegm(
            (_u(s4[p:p + 2]), s4[p + 2], s4[p + 3], s4[p + 4],
             s4[p + 5], s4[p + 6])) * 10**9
        if end_ns < ref_ns:
            raise ValueError(
                "grib2: statistical interval ends before the reference "
                "time")
        step_ns = end_ns - ref_ns
    return step_ns, int(number)


def _spectral_order(j: int, k: int | None = None,
                    m: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """(m, n) per complex coefficient in representation mode 1 (code
    table 3.7): zonal wavenumber m = 0..M outer, degree n = m..min(K,
    J+m) inner — the pentagonal truncation region of FM 92 (grid
    template 3.50 note 1), of which triangular (J=K=M), rhomboidal
    (K=J+M) and trapezoidal (J=K>M) are the special cases; each pair
    carries (real, imaginary) adjacently in the value stream."""
    k = j if k is None else k
    m = j if m is None else m
    if k < m:
        raise ValueError(
            f"grib2: degenerate pentagonal truncation J={j} K={k} "
            f"M={m} (K < M leaves empty wavenumber rows)")
    ms = np.concatenate([np.full(min(k, j + mm) + 1 - mm, mm,
                                 dtype=np.int64)
                         for mm in range(m + 1)])
    ns = np.concatenate([np.arange(mm, min(k, j + mm) + 1,
                                   dtype=np.int64)
                         for mm in range(m + 1)])
    return ms, ns


def _decode_spectral(s: dict, ref_ns: int) -> dict:
    """Grid template 3.50 (spherical harmonic coefficients) + data
    representation templates 5.50 (spectral simple packing: the real
    part of the (0,0) coefficient rides UNPACKED in DRS octets 21-24,
    everything else simple-packed — WMO note: removing the mean
    improves packing accuracy) and 5.51 (spectral complex packing: the
    low-wavenumber sub-spectrum (Js,Ks,Ms) stored as raw IEEE values
    first in section 7, the remainder simple-packed after
    multiplication by the Laplacian operator p(n) = (n(n+1))^P, P in
    10^-6 units signed).  Profile: representation type 1 (associated
    Legendre), mode 1 ordering, any pentagonal truncation (J, K, M) —
    triangular J=K=M is the ECMWF operational case, rhomboidal
    K=J+M and trapezoidal J=K>M decode through the same general
    region enumeration (round 16); anything else raises loudly.
    Returns the spectral coefficients themselves (the codec contract);
    spherical-harmonic synthesis to a grid is a numerical transform
    outside decode scope — exactly how ecCodes surfaces these fields."""
    s3 = s[3]
    j, k, m_tr = _u(s3[14:18]), _u(s3[18:22]), _u(s3[22:26])
    rep_type, rep_mode = s3[26], s3[27]
    if rep_type != 1:
        raise NotImplementedError(
            f"grib2: spectral representation type {rep_type} unsupported "
            "(1 = associated Legendre only)")
    if rep_mode != 1:
        raise NotImplementedError(
            f"grib2: spectral representation mode {rep_mode} unsupported "
            "(mode 1 ordering only)")
    step_ns, number = _product_info(s[4], ref_ns)
    s5 = s[5]
    tmpl5 = _u(s5[9:11])
    if tmpl5 not in (50, 51):
        raise NotImplementedError(
            f"grib2: data template 5.{tmpl5} on a spectral grid "
            "unsupported (5.50/5.51 only)")
    if s[6][5] != 255:
        raise NotImplementedError("grib2: bitmap on spectral data "
                                  "unsupported")
    n_vals = _u(s5[5:9])
    ref_val = struct.unpack(">f", s5[11:15])[0]
    e_scale = _sm(s5[15:17])
    d_scale = _sm(s5[17:19])
    nbits = s5[19]
    ms, ns = _spectral_order(j, k, m_tr)
    total = 2 * len(ms)           # re+im per (m, n) pair
    s7 = s[7][5:]
    if tmpl5 == 50:
        # octets 21-24: real part of (0,0), IEEE 32-bit — NOT in the
        # packed stream, so section 5's data count excludes it
        real00 = struct.unpack(">f", s5[20:24])[0]
        if n_vals != total - 1:
            raise ValueError(
                f"grib2: spectral data count {n_vals} != "
                f"{total - 1} for truncation ({j},{k},{m_tr})")
        x = _unpack_bits(s7, nbits, n_vals)
        y = (ref_val + x.astype(np.float64) * 2.0 ** e_scale) \
            / 10.0 ** d_scale
        vals = np.concatenate(([np.float64(real00)], y))
    else:
        # template 5.51 octets: 21-24 Laplacian scaling factor P
        # (signed, 10^-6 units), 25-26/27-28/29-30 Js/Ks/Ms, 31-34 Ts,
        # 35 precision of the unpacked sub-spectrum (code table 5.7)
        p_scl = _sm(s5[20:24]) / 1e6
        js, ks, msub = _u(s5[24:26]), _u(s5[26:28]), _u(s5[28:30])
        ts = _u(s5[30:34])
        prec = s5[34]
        if js > j or ks > k or msub > m_tr:
            raise ValueError(
                f"grib2: sub-spectrum ({js},{ks},{msub}) exceeds the "
                f"field truncation ({j},{k},{m_tr})")
        sub_ms, sub_ns = _spectral_order(js, ks, msub)
        n_sub = 2 * len(sub_ms)
        if prec == 1:
            fmt, width = "f", 4
        elif prec == 2:
            fmt, width = "d", 8
        else:
            raise NotImplementedError(
                f"grib2: unpacked sub-spectrum precision {prec} "
                "unsupported (1 = IEEE32 / 2 = IEEE64 only)")
        if ts != n_sub:
            raise ValueError(
                f"grib2: unpacked sub-spectrum count {ts} != "
                f"{n_sub} for truncation ({js},{ks},{msub})")
        if n_vals != total:
            raise ValueError(
                f"grib2: spectral data count {n_vals} != {total} "
                f"for truncation ({j},{k},{m_tr})")
        unpacked = np.array(
            struct.unpack(f">{ts}{fmt}", s7[:ts * width]),
            dtype=np.float64)
        x = _unpack_bits(s7[ts * width:], nbits, n_vals - ts)
        y = (ref_val + x.astype(np.float64) * 2.0 ** e_scale) \
            / 10.0 ** d_scale
        # sub-spectrum slots take the raw IEEE values; the rest undo
        # the Laplacian flattening: stored = coeff * (n(n+1))^P.
        # Membership is the sub-spectrum's own pentagonal region:
        # m <= Ms and n <= min(Ks, Js + m)
        in_sub = np.repeat((ms <= msub)
                           & (ns <= np.minimum(ks, js + ms)), 2)
        nn = np.repeat(ns, 2).astype(np.float64)[~in_sub]
        vals = np.empty(total, dtype=np.float64)
        vals[in_sub] = unpacked
        vals[~in_sub] = y * (nn * (nn + 1.0)) ** (-p_scl)
    return {"spectral": True, "number": number, "time": ref_ns,
            "step": step_ns, "trunc": int(j), "m": ms, "n": ns,
            "values": vals}


def _decode_message(msg: bytes) -> dict:
    s = _sections(msg)

    # section 1: reference time (octets 13-19, 1-indexed)
    s1 = s[1]
    ref_ns = calendar.timegm(
        (_u(s1[12:14]), s1[14], s1[15], s1[16], s1[17], s1[18])) * 10**9

    # section 3: grid — template 3.0 regular lat/lon, or 3.50 spherical
    # harmonics (spectral branch)
    s3 = s[3]
    tmpl3 = _u(s3[12:14])
    if tmpl3 == 50:
        return _decode_spectral(s, ref_ns)
    if tmpl3 != 0:
        raise NotImplementedError(
            f"grib2: grid template 3.{tmpl3} unsupported (3.0/3.50 only)")
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
    step_ns, number = _product_info(s[4], ref_ns)

    # section 5: data representation — template 5.0 simple packing,
    # 5.2 complex packing, 5.3 complex + spatial differencing
    s5 = s[5]
    tmpl5 = _u(s5[9:11])
    if tmpl5 not in (0, 2, 3, 40, 42):
        raise NotImplementedError(
            f"grib2: data template 5.{tmpl5} unsupported on a lat/lon "
            "grid (5.0/5.2/5.3/5.40/5.42 only; 5.50/5.51 ride grid "
            "template 3.50)")
    if tmpl5 == 40 and len(s5) > 21 and s5[21] not in (0, 1, 255):
        raise NotImplementedError(
            f"grib2: JPEG2000 compression type {s5[21]} unsupported "
            "(0 lossless / 1 lossy only)")
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

    # section 7: packed data (5.40 rides the from-spec JPEG 2000 codec
    # for BOTH compression types: lossless 5/3 and, since round 11,
    # lossy 9/7 with scalar-expounded quantization — the codestream's
    # own COD/QCD markers select the path)
    if tmpl5 == 42:
        # template 5.42: X rides a CCSDS 121.0-B (Rice/AEC) bitstream —
        # the dependency-free from-spec codec (sources/ccsds121.py).
        # Octet 22 = compression options mask, 23 = block size,
        # 24-25 = reference sample interval (in blocks).
        from flood_data_spark.sources.ccsds121 import (
            FLAG_3BYTE, FLAG_MSB, FLAG_PAD_RSI, FLAG_PREPROCESS,
            FLAG_RESTRICTED, FLAG_SIGNED, decode)
        flags, block = s5[21], s5[22]
        rsi = _u(s5[23:25])
        need = FLAG_MSB | FLAG_PREPROCESS
        if (flags & need) != need or (flags & FLAG_RESTRICTED):
            # restricted coding (flag 64) swaps in the reduced option
            # set for nbits<=4 — a different ID table, not a parameter
            # tweak — so it stays a loud dispatch-out
            raise NotImplementedError(
                f"grib2: CCSDS options mask 0x{flags:02x} unsupported "
                "(need MSB+preprocess, unrestricted — install "
                "cfgrib/ecCodes+libaec)")
        if (flags & FLAG_3BYTE) and not 17 <= nbits <= 24:
            # the 3-byte flag only describes the unpacked AEC buffer
            # layout of 17-24-bit samples; on any other width it marks
            # a stream this profile does not understand
            raise NotImplementedError(
                f"grib2: CCSDS 3-byte flag with {nbits}-bit samples "
                "unsupported (17-24 only)")
        x = decode(bytes(s[7][5:]), n_vals, nbits, block, rsi,
                   signed=bool(flags & FLAG_SIGNED),
                   pad_rsi=bool(flags & FLAG_PAD_RSI))
    elif tmpl5 == 40:
        # template 5.40: X rides a lossless JPEG2000 codestream — the
        # dependency-free from-spec decoder (sources/jpeg2000.py); the
        # codestream's own SIZ fixes the image shape (with a bitmap only
        # the present points are coded), so flatten and count-check
        from flood_data_spark.sources.jpeg2000 import decode_codestream
        img = decode_codestream(bytes(s[7][5:]))
        if img.size != n_vals:
            raise ValueError(
                f"grib2: jpeg2000 sample count {img.size} != declared "
                f"data count {n_vals}")
        x = img.reshape(-1)
    elif tmpl5 in (2, 3):
        x = _unpack_complex(s5, s[7][5:], n_vals)
    else:
        x = _unpack_bits(s[7][5:], nbits, n_vals)
    vals = (ref_val + x.astype(np.float64) * 2.0 ** e_scale) / 10.0 ** d_scale
    if nbits == 0 and tmpl5 == 0:
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
        if m.get("spectral"):
            raise ValueError(
                "grib2: spectral (grid template 3.50) message has no "
                "lat/lon raster form — use spectral_to_dataframe")
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


def spectral_to_dataframe(content: bytes, *,
                          member_filter: str | None = None
                          ) -> pd.DataFrame:
    """GRIB2 bytes carrying spectral messages (grid template 3.50, data
    templates 5.50/5.51) → long-form coefficient rows (number, m, n,
    time, step, valid_time, c_real, c_imag), one row per (m, n)
    spherical-harmonic pair in the mode-1 ordering.  The spectral twin
    of `grib2_to_dataframe`'s raster contract."""
    frames = []
    for msg in _iter_messages(content):
        d = _decode_message(msg)
        if not d.get("spectral"):
            raise ValueError(
                "grib2: lat/lon raster message in spectral_to_dataframe "
                "— use grib2_to_dataframe")
        if member_filter == "cf" and d["number"] != 0:
            continue
        if member_filter == "pf" and d["number"] == 0:
            continue
        pairs = d["values"].reshape(-1, 2)
        npair = len(d["m"])
        frames.append(pd.DataFrame({
            "number": np.full(npair, d["number"], dtype=np.int64),
            "m": d["m"],
            "n": d["n"],
            "time": np.full(npair, d["time"], dtype=np.int64),
            "step": np.full(npair, d["step"], dtype=np.int64),
            "valid_time": np.full(npair, d["time"] + d["step"],
                                  dtype=np.int64),
            "c_real": pairs[:, 0],
            "c_imag": pairs[:, 1],
        }))
    if not frames:
        return pd.DataFrame({c: [] for c in
                             ["number", "m", "n", "time", "step",
                              "valid_time", "c_real", "c_imag"]})
    return pd.concat(frames, ignore_index=True)


def _spectral_s3(j: int, k: int | None = None,
                 m: int | None = None) -> bytes:
    """Section 3, grid template 3.50: pentagonal J/K/M (triangular
    when K and M are omitted), representation type 1 (associated
    Legendre), mode 1."""
    k = j if k is None else k
    m = j if m is None else m
    grid = struct.pack(">III", j, k, m) + bytes([1, 1])
    n_pairs = len(_spectral_order(j, k, m)[0])
    return _sec(3, bytes([0]) + struct.pack(">I", 2 * n_pairs)
                + bytes([0, 0]) + struct.pack(">H", 50) + grid)


def build_spectral_message(coeffs, *, j: int, k: int | None = None,
                           m: int | None = None, d_scale: int = 0,
                           e_scale: int = 0, nbits: int = 16,
                           member: int | None = None,
                           year: int = 2024, month: int = 1, day: int = 1,
                           ftime_hours: int = 24,
                           accum_hours: int | None = None) -> bytes:
    """Encode one GRIB2 spectral message (grid template 3.50, data
    template 5.50: spectral simple packing).  `coeffs` are the
    coefficient values of the (J, K, M) pentagonal region (re/im
    interleaved, mode-1 ordering; triangular when k/m omitted);
    coeffs[0] — the real part of (0,0) — rides unpacked in
    DRS octets 21-24, the rest pack as
    X = round(v·10^D − R) / 2^E with R = min(v·10^D).  With integer
    coefficient values and D = E = 0 the round trip is exact (the
    q_grib_spectral gate profile); R is float32-coerced first so the
    decoder subtracts the identical reference."""
    v = np.asarray(list(coeffs), dtype=np.float64)
    n_pairs = len(_spectral_order(j, k, m)[0])
    if v.size != 2 * n_pairs:
        raise ValueError(
            f"grib2: need {2 * n_pairs} coefficient values for "
            f"({j},{k},{m}), got {v.size}")
    scaled = v[1:] * 10.0 ** d_scale
    ref = float(np.float32(scaled.min() if scaled.size else 0.0))
    xs = np.round((scaled - ref) / 2.0 ** e_scale).astype(np.int64)
    if xs.size and (xs.min() < 0 or xs.max() >= (1 << nbits)):
        raise ValueError(
            f"grib2: packed spectral values do not fit in {nbits} bits")
    packed = _pack_fields([(xs.tolist(), nbits)])
    e_raw = abs(e_scale) | (0x8000 if e_scale < 0 else 0)
    d_raw = abs(d_scale) | (0x8000 if d_scale < 0 else 0)
    s5 = _sec(5, struct.pack(">I", xs.size) + struct.pack(">H", 50)
              + struct.pack(">f", ref) + struct.pack(">HH", e_raw, d_raw)
              + bytes([nbits]) + struct.pack(">f", float(v[0])))
    return _assemble_with_s3(
        _spectral_s3(j, k, m), s5, packed, member=member, year=year,
        month=month, day=day, ftime_hours=ftime_hours,
        accum_hours=accum_hours)


def build_spectral_complex_message(coeffs, *, j: int, js: int,
                                   k: int | None = None,
                                   m: int | None = None,
                                   ks: int | None = None,
                                   msub: int | None = None,
                                   p: float = 1.0, d_scale: int = 0,
                                   e_scale: int = 0, nbits: int = 16,
                                   member: int | None = None,
                                   year: int = 2024, month: int = 1,
                                   day: int = 1,
                                   ftime_hours: int = 24,
                                   accum_hours: int | None = None) -> bytes:
    """Encode one GRIB2 spectral message (grid template 3.50, data
    template 5.51: spectral complex packing).  The (Js, Ks, Ms)
    sub-spectrum (triangular Js when ks/msub omitted) stores raw
    IEEE-32 values first in section 7; the remainder is
    multiplied by the Laplacian operator (n(n+1))^p (flattening the
    spectral decay — the packing-accuracy trick the template exists
    for) and simple-packed.  `p` is stored sign-magnitude in 10^-6
    units (octets 21-24).  With p = 1, integer products v·n(n+1), and
    D = E = 0 the round trip is exact up to one IEEE division per
    value — the q_grib_spectral gate profile."""
    k = j if k is None else k
    m = j if m is None else m
    ks = js if ks is None else ks
    msub = js if msub is None else msub
    v = np.asarray(list(coeffs), dtype=np.float64)
    n_pairs = len(_spectral_order(j, k, m)[0])
    if v.size != 2 * n_pairs:
        raise ValueError(
            f"grib2: need {2 * n_pairs} coefficient values for "
            f"({j},{k},{m}), got {v.size}")
    if js > j or ks > k or msub > m:
        raise ValueError(
            f"grib2: sub-spectrum ({js},{ks},{msub}) exceeds field "
            f"({j},{k},{m})")
    ms, ns = _spectral_order(j, k, m)
    in_sub = np.repeat((ms <= msub) & (ns <= np.minimum(ks, js + ms)), 2)
    sub = v[in_sub].astype(np.float32)
    nn = np.repeat(ns, 2).astype(np.float64)[~in_sub]
    flat = v[~in_sub] * (nn * (nn + 1.0)) ** p
    scaled = flat * 10.0 ** d_scale
    ref = float(np.float32(scaled.min() if scaled.size else 0.0))
    xs = np.round((scaled - ref) / 2.0 ** e_scale).astype(np.int64)
    if xs.size and (xs.min() < 0 or xs.max() >= (1 << nbits)):
        raise ValueError(
            f"grib2: packed spectral values do not fit in {nbits} bits")
    ts = int(sub.size)
    body = struct.pack(f">{ts}f", *sub.tolist()) \
        + _pack_fields([(xs.tolist(), nbits)])
    p_micro = int(round(abs(p) * 1e6))
    p_raw = p_micro | (0x80000000 if p < 0 else 0)
    e_raw = abs(e_scale) | (0x8000 if e_scale < 0 else 0)
    d_raw = abs(d_scale) | (0x8000 if d_scale < 0 else 0)
    s5 = _sec(5, struct.pack(">I", v.size) + struct.pack(">H", 51)
              + struct.pack(">f", ref) + struct.pack(">HH", e_raw, d_raw)
              + bytes([nbits]) + struct.pack(">I", p_raw)
              + struct.pack(">HHH", js, ks, msub)
              + struct.pack(">I", ts) + bytes([1]))
    return _assemble_with_s3(
        _spectral_s3(j, k, m), s5, body, member=member, year=year,
        month=month, day=day, ftime_hours=ftime_hours,
        accum_hours=accum_hours)


def build_simple_message(xs, *, nj: int, ni: int, la1: float, lo1: float,
                         d: float, ref: float = 0.0, e_scale: int = 0,
                         d_scale: int = 0, nbits: int = 16,
                         member: int | None = None,
                         year: int = 2024, month: int = 1, day: int = 1,
                         ftime_hours: int = 24,
                         accum_hours: int | None = None) -> bytes:
    """Encode one GRIB2 message (grid template 3.0, product 4.0/4.1, data
    template 5.0 simple packing) — the synthetic-data/test counterpart of
    the reader above.  `xs` are the packed integers, row-major (i fastest);
    decoded value = (ref + X * 2**e_scale) / 10**d_scale."""
    for x in xs:
        if not 0 <= int(x) < (1 << nbits):
            # an oversized value would widen its bit field and silently
            # shift every subsequent packed value
            raise ValueError(
                f"grib2: packed value {x} does not fit in {nbits} bits")
    packed = _pack_fields([(list(xs), nbits)])

    e_raw = abs(e_scale) | (0x8000 if e_scale < 0 else 0)
    d_raw = abs(d_scale) | (0x8000 if d_scale < 0 else 0)
    s5 = _sec(5, struct.pack(">I", len(xs)) + struct.pack(">H", 0)
              + struct.pack(">f", ref) + struct.pack(">HH", e_raw, d_raw)
              + bytes([nbits, 0]))
    return _assemble_message(
        s5, packed, nj=nj, ni=ni, la1=la1, lo1=lo1, d=d, member=member,
        year=year, month=month, day=day, ftime_hours=ftime_hours,
        accum_hours=accum_hours)


def build_jpeg2000_message(xs, *, nj: int, ni: int, la1: float,
                           lo1: float, d: float, ref: float = 0.0,
                           e_scale: int = 0, d_scale: int = 0,
                           nbits: int = 16, levels: int = 3,
                           member: int | None = None,
                           year: int = 2024, month: int = 1, day: int = 1,
                           ftime_hours: int = 24,
                           accum_hours: int | None = None) -> bytes:
    """Encode one GRIB2 message with data representation template 5.40
    (lossless JPEG 2000) — the test counterpart of the 5.40 branch, with
    the codestream produced by the from-spec encoder
    (`jpeg2000.encode_codestream`).  `xs` are the packed integers,
    row-major; decoded value = (ref + X * 2**e_scale) / 10**d_scale."""
    from flood_data_spark.sources.jpeg2000 import encode_codestream

    if nbits < 1:
        raise ValueError("grib2: jpeg2000 packing needs nbits >= 1")
    arr = np.asarray(list(xs), dtype=np.int64).reshape(nj, ni)
    if arr.min(initial=0) < 0 or arr.max(initial=0) >= (1 << nbits):
        raise ValueError(
            f"grib2: packed values do not fit in {nbits} bits")
    codestream = encode_codestream(arr, nbits, levels=levels)
    e_raw = abs(e_scale) | (0x8000 if e_scale < 0 else 0)
    d_raw = abs(d_scale) | (0x8000 if d_scale < 0 else 0)
    s5 = _sec(5, struct.pack(">I", arr.size) + struct.pack(">H", 40)
              + struct.pack(">f", ref) + struct.pack(">HH", e_raw, d_raw)
              + bytes([nbits, 0, 0, 255]))   # lossless, ratio undefined
    return _assemble_message(
        s5, codestream, nj=nj, ni=ni, la1=la1, lo1=lo1, d=d,
        member=member, year=year, month=month, day=day,
        ftime_hours=ftime_hours, accum_hours=accum_hours)


def build_jpeg2000_lossy_message(xs, *, nj: int, ni: int, la1: float,
                                 lo1: float, d: float, ref: float = 0.0,
                                 e_scale: int = 0, d_scale: int = 0,
                                 nbits: int = 16, levels: int = 3,
                                 step: float = 1.0,
                                 member: int | None = None,
                                 year: int = 2024, month: int = 1,
                                 day: int = 1,
                                 ftime_hours: int = 24,
                                 accum_hours: int | None = None) -> bytes:
    """Encode one GRIB2 message with data representation template 5.40,
    compression type 1 (LOSSY irreversible 9/7 JPEG 2000) — the test
    counterpart of the lossy decode branch.  Decoded integers
    approximate `xs` within ~`step` x the synthesis gain; the GRIB
    value formula then applies as usual."""
    from flood_data_spark.sources.jpeg2000 import encode_codestream_lossy

    if nbits < 1:
        raise ValueError("grib2: jpeg2000 packing needs nbits >= 1")
    arr = np.asarray(list(xs), dtype=np.int64).reshape(nj, ni)
    if arr.min(initial=0) < 0 or arr.max(initial=0) >= (1 << nbits):
        raise ValueError(
            f"grib2: packed values do not fit in {nbits} bits")
    codestream = encode_codestream_lossy(arr, nbits, levels=levels,
                                         step=step)
    e_raw = abs(e_scale) | (0x8000 if e_scale < 0 else 0)
    d_raw = abs(d_scale) | (0x8000 if d_scale < 0 else 0)
    s5 = _sec(5, struct.pack(">I", arr.size) + struct.pack(">H", 40)
              + struct.pack(">f", ref) + struct.pack(">HH", e_raw, d_raw)
              + bytes([nbits, 0, 1, 255]))   # lossy, ratio unspecified
    return _assemble_message(
        s5, codestream, nj=nj, ni=ni, la1=la1, lo1=lo1, d=d,
        member=member, year=year, month=month, day=day,
        ftime_hours=ftime_hours, accum_hours=accum_hours)


def build_ccsds_message(xs, *, nj: int, ni: int, la1: float,
                        lo1: float, d: float, ref: float = 0.0,
                        e_scale: int = 0, d_scale: int = 0,
                        nbits: int = 16, block_size: int = 16,
                        rsi: int = 64, member: int | None = None,
                        year: int = 2024, month: int = 1, day: int = 1,
                        ftime_hours: int = 24,
                        accum_hours: int | None = None,
                        signed: bool = False,
                        pad_rsi: bool = False) -> bytes:
    """Encode one GRIB2 message with data representation template 5.42
    (CCSDS 121.0-B lossless compression) — the test counterpart of the
    5.42 branch, with the bitstream produced by the from-spec encoder
    (`ccsds121.encode`).  `xs` are the packed integers, row-major;
    decoded value = (ref + X * 2**e_scale) / 10**d_scale.  Octet 22
    carries the options mask (MSB + preprocess), 23 the block size,
    24-25 the reference sample interval in blocks."""
    from flood_data_spark.sources.ccsds121 import (
        FLAG_MSB, FLAG_PAD_RSI, FLAG_PREPROCESS, FLAG_SIGNED, encode)

    vals = [int(x) for x in xs]
    lo = -(1 << (nbits - 1)) if signed else 0
    hi = (1 << (nbits - 1)) if signed else (1 << nbits)
    if any(not lo <= v < hi for v in vals):
        raise ValueError(
            f"grib2: packed values do not fit in {nbits} "
            f"{'signed ' if signed else ''}bits")
    stream = encode(vals, nbits, block_size, rsi,
                    signed=signed, pad_rsi=pad_rsi)
    flags = FLAG_MSB | FLAG_PREPROCESS
    if signed:
        flags |= FLAG_SIGNED
    if pad_rsi:
        flags |= FLAG_PAD_RSI
    e_raw = abs(e_scale) | (0x8000 if e_scale < 0 else 0)
    d_raw = abs(d_scale) | (0x8000 if d_scale < 0 else 0)
    s5 = _sec(5, struct.pack(">I", len(vals)) + struct.pack(">H", 42)
              + struct.pack(">f", ref) + struct.pack(">HH", e_raw, d_raw)
              + bytes([nbits, 0, flags, block_size])
              + struct.pack(">H", rsi))
    return _assemble_message(
        s5, stream, nj=nj, ni=ni, la1=la1, lo1=lo1, d=d,
        member=member, year=year, month=month, day=day,
        ftime_hours=ftime_hours, accum_hours=accum_hours)


def _sec(num, body):
    return struct.pack(">IB", len(body) + 5, num) + body


def _pack_fields(fields) -> bytes:
    """Concatenated bit fields, each (values, nbits) OCTET-ALIGNED at its
    start (regulation 92.9.4 padding) — pass one tuple for a single
    continuous stream."""
    out = []
    for vals, nbits in fields:
        bits = "".join(format(int(x), f"0{nbits}b") for x in vals) \
            if nbits else ""
        bits += "0" * ((8 - len(bits) % 8) % 8)
        out.append(bytes(int(bits[i:i + 8], 2)
                         for i in range(0, len(bits), 8)))
    return b"".join(out)


def _assemble_message(s5: bytes, packed: bytes, *, nj: int, ni: int,
                      la1: float, lo1: float, d: float,
                      member: int | None, year: int, month: int, day: int,
                      ftime_hours: int,
                      accum_hours: int | None = None) -> bytes:
    """Sections 1/3/4/6 scaffold shared by the simple and complex test
    encoders — grid template 3.0, product 4.0/4.1, no bitmap."""
    def sm32(v):
        raw = abs(int(round(v)))
        return struct.pack(">I", raw | (0x80000000 if v < 0 else 0))

    s1 = _sec(1, struct.pack(">HHBBB", 0, 0, 2, 0, 1)
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
    s3 = _sec(3, bytes([0]) + struct.pack(">I", ni * nj) + bytes([0, 0])
              + struct.pack(">H", 0) + grid)
    return _assemble_with_s3(s3, s5, packed, member=member, year=year,
                             month=month, day=day,
                             ftime_hours=ftime_hours, s1=s1,
                             accum_hours=accum_hours)


def _assemble_with_s3(s3: bytes, s5: bytes, packed: bytes, *,
                      member: int | None, year: int, month: int,
                      day: int, ftime_hours: int,
                      s1: bytes | None = None,
                      accum_hours: int | None = None) -> bytes:
    """Sections 1/4/6/7 scaffold around a caller-built grid section —
    shared by the lat/lon (_assemble_message) and spectral encoders.
    `accum_hours` switches the product section to the statistical
    templates (4.8 deterministic / 4.11 ensemble): one accumulation
    time range of that many hours, end-of-interval = reference +
    forecast time + accumulation — the layout operational dis24
    accumulations actually ship."""
    if s1 is None:
        s1 = _sec(1, struct.pack(">HHBBB", 0, 0, 2, 0, 1)
                  + struct.pack(">HBBBBB", year, month, day, 0, 0, 0)
                  + bytes([0, 1]))
    prod = (bytes([0, 4, 2, 0, 0]) + struct.pack(">HB", 0, 0) + bytes([1])
            + struct.pack(">I", ftime_hours)
            + bytes([1, 0]) + b"\x00" * 4 + bytes([255, 0]) + b"\x00" * 4)
    stat = b""
    if accum_hours is not None:
        import datetime as _dt
        end = (_dt.datetime(year, month, day)
               + _dt.timedelta(hours=ftime_hours + accum_hours))
        # octets (4.8: 35-58): end of overall interval, 1 time range,
        # 0 missing, stat process 1 (accumulation), increment type 2,
        # range unit hour + length, increment unit hour + 0
        stat = (struct.pack(">HBBBBB", end.year, end.month, end.day,
                            end.hour, end.minute, end.second)
                + bytes([1]) + b"\x00" * 4
                + bytes([1, 2, 1]) + struct.pack(">I", accum_hours)
                + bytes([1]) + struct.pack(">I", 0))
    if member is None:
        tmpl = 8 if accum_hours is not None else 0
        s4 = _sec(4, struct.pack(">HH", 0, tmpl) + prod + stat)
    else:
        tmpl = 11 if accum_hours is not None else 1
        s4 = _sec(4, struct.pack(">HH", 0, tmpl) + prod
                  + bytes([3, member, 51]) + stat)
    s6 = _sec(6, bytes([255]))
    s7 = _sec(7, packed)
    body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    return (b"GRIB" + b"\x00\x00" + bytes([1, 2])
            + struct.pack(">Q", 16 + len(body)) + body)


def _nbits_for(vmax: int) -> int:
    return int(vmax).bit_length() if vmax > 0 else 0


def build_complex_message(xs, *, nj: int, ni: int, la1: float, lo1: float,
                          d: float, ref: float = 0.0, e_scale: int = 0,
                          d_scale: int = 0, group_len: int = 10,
                          order: int = 0, member: int | None = None,
                          year: int = 2024, month: int = 1, day: int = 1,
                          ftime_hours: int = 24,
                          accum_hours: int | None = None) -> bytes:
    """Encode one GRIB2 message with data representation template 5.2
    (order=0: grid-point complex packing) or 5.3 (order=1/2: complex +
    spatial differencing) — the test counterpart of `_unpack_complex`.

    `xs` are the TARGET integers X of (R + X*2^E)/10^D — the encoder
    differences them (5.3), min-shifts by gmin, splits into fixed-length
    groups, and writes min-referenced variable-width groups, exactly the
    structures the decoder walks.  Group refs/widths/lengths are each
    octet-aligned; the value stream is continuous (regulation 92.9.4).
    """
    if order not in (0, 1, 2):
        raise ValueError(f"grib2: differencing order {order} not in 0..2")
    if group_len < 1:
        raise ValueError("grib2: group_len must be >= 1")
    x = [int(v) for v in xs]
    n = len(x)
    if n <= order:
        raise ValueError("grib2: need more values than the differencing "
                         "order")
    ival: list = []
    gmin = 0
    if order:
        diffs = list(x)
        if order == 1:
            diffs = [x[0]] + [x[i] - x[i - 1] for i in range(1, n)]
        else:
            diffs = [x[0], x[1]] + [x[i] - 2 * x[i - 1] + x[i - 2]
                                    for i in range(2, n)]
        ival = x[:order]
        gmin = min(diffs[order:])
        field = [0] * order + [v - gmin for v in diffs[order:]]
    else:
        if min(x) < 0:
            raise ValueError("grib2: template 5.2 packs unsigned X — "
                             "negative targets need order>=1 or a ref "
                             "value shift")
        field = x

    groups = [field[i:i + group_len] for i in range(0, n, group_len)]
    refs = [min(g) for g in groups]
    widths = [_nbits_for(max(g) - min(g)) for g in groups]
    lengths = [len(g) for g in groups]
    ng = len(groups)
    nbits = _nbits_for(max(refs)) if refs else 0
    width_bits = _nbits_for(max(widths)) if widths else 0
    len_bits = _nbits_for(max(lengths)) if lengths else 0

    fields = []
    if order:
        mags = [abs(v) for v in ival + [gmin]]
        extra_octets = max(1, (_nbits_for(max(mags)) + 1 + 7) // 8)
        sbit = 1 << (8 * extra_octets - 1)
        head = [(abs(v) | sbit) if v < 0 else v for v in ival + [gmin]]
        fields.append((head, 8 * extra_octets))
    else:
        extra_octets = 0
    fields += [(refs, nbits), (widths, width_bits), (lengths, len_bits)]
    # group values form ONE continuous stream (no per-group padding):
    # build the bit string directly
    vbits = "".join(
        format(v - rf, f"0{w}b") if w else ""
        for g, rf, w in zip(groups, refs, widths) for v in g)
    vbits += "0" * ((8 - len(vbits) % 8) % 8)
    vstream = bytes(int(vbits[i:i + 8], 2) for i in range(0, len(vbits), 8))
    packed = _pack_fields(fields) + vstream

    e_raw = abs(e_scale) | (0x8000 if e_scale < 0 else 0)
    d_raw = abs(d_scale) | (0x8000 if d_scale < 0 else 0)
    tmpl = 3 if order else 2
    body5 = (struct.pack(">I", n) + struct.pack(">H", tmpl)
             + struct.pack(">f", ref) + struct.pack(">HH", e_raw, d_raw)
             + bytes([nbits, 0])          # bits per ref, original type
             + bytes([1, 0])              # general splitting, no missing
             + b"\x00" * 8                # missing substitutes
             + struct.pack(">I", ng)
             + bytes([0, width_bits])     # width reference + bits
             + struct.pack(">I", 0) + bytes([1])   # len ref 0, inc 1
             + struct.pack(">I", lengths[-1] if lengths else 0)
             + bytes([len_bits]))
    if order:
        body5 += bytes([order, extra_octets])
    s5 = _sec(5, body5)
    return _assemble_message(
        s5, packed, nj=nj, ni=ni, la1=la1, lo1=lo1, d=d, member=member,
        year=year, month=month, day=day, ftime_hours=ftime_hours,
        accum_hours=accum_hours)

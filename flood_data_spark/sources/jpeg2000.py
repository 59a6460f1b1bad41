"""Minimal pure-Python JPEG 2000 Part-1 codec for the GRIB2 case.

GRIB2 data representation template 5.40 stores the packed integer field X
as a JPEG 2000 codestream (ISO/IEC 15444-1): one tile, one unsigned
component — reversible 5/3 with no quantization for compression type 0
(the lossless profile ecCodes emits) and, since round 11, irreversible
9/7 with scalar-expounded quantization for compression type 1 (the
reference decodes both through cfgrib/ecCodes,
/root/reference/flood/etl/utils.py:3-14).  This module is the
dependency-free branch: a from-spec implementation of the subset those
profiles need —

- codestream markers: SOC / SIZ / COD / QCD / COM / SOT / SOD / EOC
  (single tile, single tile-part; COC/QCC overrides are out of scope and
  raise NotImplementedError);
- packet headers: tag-tree coded inclusion + zero-bit-planes, the
  comma-coded pass count, Lblock length coding, FF-stuffed bit reader,
  LRCP/RLCP/RPCL/PCRL/CPRL progressions (one precinct per resolution —
  the no-precinct default);
- Tier-1: the MQ arithmetic coder (Annex C state machine, all 47
  states) and the three-pass EBCOT bit-plane coder (significance
  propagation / magnitude refinement / cleanup with run-length mode,
  the full Annex D context tables);
- the reversible 5/3 lifting DWT (Annex F) with symmetric extension,
  and the irreversible 9/7 lifting (Annex F float coefficients) with
  Annex-E scalar-expounded dequantization (midpoint reconstruction,
  delta = 2^(R_b - eps)(1 + mu/2^11) parsed per band from the QCD).

The encoders exist for round-trip testing (single layer, all passes,
LRCP) — the same role `grib2.build_simple_message` plays for template
5.0.  Determinism: the lossless path is pure integer arithmetic and
decode is a pure function of the bytes; the lossy path is fixed-order
float64 (deterministic on IEEE hardware), with reconstruction error
bounded by the quantization step x synthesis gain (tests measure it).

Scale posture: Tier-1 is a sequential bit-plane automaton (inherently
per-code-block serial; ~1e5 samples/s in pure Python), so a large grid
decodes in minutes — but the ingest seam parallelizes PER FILE
(`binaryFile` scan → `mapInPandas`, one task per raster), exactly like
the cfgrib path, so a 30-lead-time day fans across 30 cores and a
backfill across the cluster.  Code-blocks within a file are also
independent (each has its own MQ state) — a per-block process pool is
the next lever if single-file latency ever matters.

No code from any JPEG 2000 implementation is used — tables and
procedures follow the published standard's annexes.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ MQ coder
# Annex C probability state machine: (Qe, NMPS, NLPS, SWITCH).
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

#: Tier-1 context count and initial states (Annex D: UNIFORM starts at
#: state 46, run-length at 3, zero-coding context 0 at 4, rest at 0).
N_CTX = 19
_CTX_UNI = 18
_CTX_RL = 17


def _initial_states():
    idx = [0] * N_CTX
    idx[0] = 4
    idx[_CTX_RL] = 3
    idx[_CTX_UNI] = 46
    return idx, [0] * N_CTX


class MQDecoder:
    """Annex C.3 decoder (software conventions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b = data[0] if data else 0xFF
        self.c = b << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000
        self.I, self.mps = _initial_states()

    def _bytein(self):
        d = self.data
        b = d[self.bp] if self.bp < len(d) else 0xFF
        if b == 0xFF:
            b1 = d[self.bp + 1] if self.bp + 1 < len(d) else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp += 1
            b1 = d[self.bp] if self.bp < len(d) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, switch = _QE[self.I[cx]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange (Annex C: A set to Qe on both branches)
            if self.a < qe:
                d = self.mps[cx]
                self.I[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.I[cx] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - self.mps[cx]
                    if switch:
                        self.mps[cx] = 1 - self.mps[cx]
                    self.I[cx] = nlps
                else:
                    d = self.mps[cx]
                    self.I[cx] = nmps
                self._renorm()
            else:
                d = self.mps[cx]
        return d

    def _renorm(self):
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break


class MQEncoder:
    """Annex C.2 encoder (software conventions)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.b = None            # pending byte (pre-BP convention)
        self.I, self.mps = _initial_states()

    def encode(self, cx: int, d: int):
        qe, nmps, nlps, switch = _QE[self.I[cx]]
        if d == self.mps[cx]:
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.I[cx] = nmps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] = 1 - self.mps[cx]
            self.I[cx] = nlps
            self._renorm()

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self):
        # every emitted byte is masked to 8 bits: in the carry path the
        # consumed carry bit (bit 27 of C) is dropped by the byte cast,
        # exactly as in the spec's register semantics
        if self.b == 0xFF:
            self._emit((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self._emit((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            # carry into the pending byte (first byteout cannot carry:
            # C stays below 2^27 until a byte has been emitted)
            if self.b is None:
                raise AssertionError("mq: carry before first byte")
            self.b += 1
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self._emit((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self._emit((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _emit(self, nb: int):
        if self.b is not None:
            self.out.append(self.b)
        self.b = nb

    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        # a trailing 0xFF is dropped (the decoder synthesizes 1-bits
        # past the end of data — Annex C flush convention)
        if self.b is not None and self.b != 0xFF:
            self.out.append(self.b)
        self.b = None
        return bytes(self.out)


# ----------------------------------------------------------- tag trees

class TagTree:
    """Annex B.10 tag tree over a w x h leaf grid.

    Protocol per node (root -> leaf), shared by encoder and decoder:
    `state` is the proven lower bound on the node's value; a 0 bit
    raises it by one, a 1 bit pins the value exactly (`known`).  A
    child's walk starts from the parent's bound (child value >= parent
    value, parents hold subtree minima)."""

    def __init__(self, w: int, h: int):
        self.dims = []                       # fine -> coarse (w, h)
        lw, lh = max(w, 1), max(h, 1)
        while True:
            self.dims.append((lw, lh))
            if lw == 1 and lh == 1:
                break
            lw, lh = (lw + 1) // 2, (lh + 1) // 2
        self.value = [np.zeros((dh, dw), dtype=np.int64)
                      for dw, dh in self.dims]
        self.state = [np.zeros((dh, dw), dtype=np.int64)
                      for dw, dh in self.dims]
        self.known = [np.zeros((dh, dw), dtype=bool)
                      for dw, dh in self.dims]

    def _path(self, x: int, y: int):
        out = []
        for li in range(len(self.dims)):
            out.append((li, x, y))
            x //= 2
            y //= 2
        return list(reversed(out))           # root first

    def set_values(self, vals: np.ndarray):
        """Encoder side: leaf values -> min-reduced internal nodes."""
        cur = vals.astype(np.int64)
        for li, (dw, dh) in enumerate(self.dims):
            self.value[li][:] = 0
            self.value[li][:cur.shape[0], :cur.shape[1]] = cur
            if dw == 1 and dh == 1:
                break
            nh, nw = (dh + 1) // 2, (dw + 1) // 2
            nxt = np.full((nh, nw), np.iinfo(np.int64).max,
                          dtype=np.int64)
            for yy in range(cur.shape[0]):
                for xx in range(cur.shape[1]):
                    nxt[yy // 2, xx // 2] = min(nxt[yy // 2, xx // 2],
                                                cur[yy, xx])
            cur = np.where(nxt == np.iinfo(np.int64).max, 0, nxt)

    def encode(self, bits: "_BitWriter", x: int, y: int, threshold: int):
        low = 0
        for li, cx, cy in self._path(x, y):
            st = self.state[li]
            if st[cy, cx] < low:
                st[cy, cx] = low
            val = int(self.value[li][cy, cx])
            while st[cy, cx] < threshold:
                if st[cy, cx] < val:
                    bits.write(0)
                    st[cy, cx] += 1
                elif not self.known[li][cy, cx]:
                    bits.write(1)
                    self.known[li][cy, cx] = True
                    break
                else:
                    break
            low = val if self.known[li][cy, cx] else int(st[cy, cx])

    def decode(self, bits: "_BitReader", x: int, y: int,
               threshold: int) -> bool:
        """True iff leaf value < threshold (consuming bits as needed)."""
        low = 0
        for li, cx, cy in self._path(x, y):
            st, kn = self.state[li], self.known[li]
            if st[cy, cx] < low:
                st[cy, cx] = low
            while st[cy, cx] < threshold and not kn[cy, cx]:
                if bits.read():
                    kn[cy, cx] = True
                else:
                    st[cy, cx] += 1
            low = int(st[cy, cx])
        li, cx, cy = self._path(x, y)[-1]
        return bool(self.known[li][cy, cx]) \
            and int(self.state[li][cy, cx]) < threshold

    def decode_value(self, bits: "_BitReader", x: int, y: int) -> int:
        """Fully resolve a leaf value (the zero-bit-planes use)."""
        t = 1
        while not self.decode(bits, x, y, t):
            t += 1
        li, cx, cy = self._path(x, y)[-1]
        return int(self.state[li][cy, cx])

    def leaf(self, x: int, y: int) -> int:
        return int(self.value[0][y, x])


class _BitWriter:
    """Packet-header bit writer with FF stuffing (a byte after 0xFF
    carries only 7 bits)."""

    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.n = 0

    def _cap(self):
        return 7 if self.bytes and self.bytes[-1] == 0xFF else 8

    def write(self, bit: int):
        self.cur = (self.cur << 1) | (bit & 1)
        self.n += 1
        if self.n == self._cap():
            self.bytes.append(self.cur)
            self.cur = 0
            self.n = 0

    def write_bits(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.write((value >> i) & 1)

    def flush(self) -> bytes:
        if self.n:
            self.cur <<= self._cap() - self.n
            self.bytes.append(self.cur)
            self.cur = 0
            self.n = 0
        if self.bytes and self.bytes[-1] == 0xFF:
            self.bytes.append(0)       # cannot end a header on 0xFF
        return bytes(self.bytes)


class _BitReader:
    """Packet-header bit reader with FF unstuffing."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.n = 0
        self.prev_ff = False

    def read(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            self.n = 7 if self.prev_ff else 8
            self.prev_ff = (b == 0xFF)
            self.cur = b
        self.n -= 1
        return (self.cur >> self.n) & 1

    def read_bits(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read()
        return v

    def align(self):
        """Byte-align at end of header (consuming the post-FF stuffed
        byte if the header ended on 0xFF)."""
        self.n = 0
        if self.prev_ff:
            self.pos += 1
            self.prev_ff = False


# ------------------------------------------------- EBCOT Tier-1 tables

def _zc_context(h: int, v: int, d: int, band: str) -> int:
    """Annex D.1 zero-coding context (band in {'LL','LH','HL','HH'})."""
    if band == "HL":                 # high horizontal: swap h/v roles
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d    # d in {0,1} -> ctx 0/1
    if d >= 3:
        return 8
    hv = h + v
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else hv


_SC_TABLE = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _T1:
    """Shared Tier-1 state for one code-block: significance map, sign
    map, became-significant-this-plane map, visited-in-SPP map."""

    def __init__(self, h: int, w: int, band: str):
        self.h, self.w, self.band = h, w, band
        self.sig = np.zeros((h + 2, w + 2), dtype=np.int8)     # 1-padded
        self.sgn = np.zeros((h + 2, w + 2), dtype=np.int8)     # -1/+1
        self.fresh = np.zeros((h, w), dtype=bool)
        self.visited = np.zeros((h, w), dtype=bool)
        self.refined = np.zeros((h, w), dtype=bool)
        self.mag = np.zeros((h, w), dtype=np.int64)

    def neighbors(self, y: int, x: int):
        s = self.sig
        h = int(s[y + 1, x]) + int(s[y + 1, x + 2])
        v = int(s[y, x + 1]) + int(s[y + 2, x + 1])
        d = (int(s[y, x]) + int(s[y, x + 2])
             + int(s[y + 2, x]) + int(s[y + 2, x + 2]))
        return h, v, d

    def zc_ctx(self, y: int, x: int) -> int:
        return _zc_context(*self.neighbors(y, x), self.band)

    def sc_ctx(self, y: int, x: int):
        s, g = self.sig, self.sgn
        hc = max(-1, min(1, int(s[y + 1, x]) * int(g[y + 1, x])
                         + int(s[y + 1, x + 2]) * int(g[y + 1, x + 2])))
        vc = max(-1, min(1, int(s[y, x + 1]) * int(g[y, x + 1])
                         + int(s[y + 2, x + 1]) * int(g[y + 2, x + 1])))
        return _SC_TABLE[(hc, vc)]

    def mr_ctx(self, y: int, x: int) -> int:
        if self.refined[y, x]:
            return 16
        h, v, d = self.neighbors(y, x)
        return 15 if h + v + d > 0 else 14

    def set_sig(self, y: int, x: int, sign: int):
        self.sig[y + 1, x + 1] = 1
        self.sgn[y + 1, x + 1] = 1 if sign == 0 else -1
        self.fresh[y, x] = True


def _stripes(h: int):
    for y0 in range(0, h, 4):
        yield y0, min(4, h - y0)


def t1_decode(data: bytes, h: int, w: int, band: str, n_passes: int,
              max_plane: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one code-block: returns (magnitude int64, sign int8 with
    +1/-1).  `max_plane` is the bit position of the FIRST coded plane
    (Mb - 1 - zero_bitplanes)."""
    st = _T1(h, w, band)
    mq = MQDecoder(data)
    plane = max_plane
    passno = 0
    while passno < n_passes and plane >= 0:
        first = passno == 0
        if not first:
            _spp_dec(mq, st, plane)
            passno += 1
            if passno >= n_passes:
                break
            _mrp_dec(mq, st, plane)
            passno += 1
            if passno >= n_passes:
                break
        _cup_dec(mq, st, plane)
        passno += 1
        st.fresh[:] = False
        st.visited[:] = False
        plane -= 1
    sign = np.where(st.sgn[1:-1, 1:-1] == 0, 1,
                    st.sgn[1:-1, 1:-1]).astype(np.int8)
    return st.mag, sign


def _spp_dec(mq, st, plane):
    for y0, sh in _stripes(st.h):
        for x in range(st.w):
            for yy in range(sh):
                y = y0 + yy
                if st.sig[y + 1, x + 1]:
                    continue
                ctx = st.zc_ctx(y, x)
                if ctx == 0:
                    continue
                st.visited[y, x] = True
                if mq.decode(ctx):
                    sc, xor = st.sc_ctx(y, x)
                    s = mq.decode(sc) ^ xor
                    st.set_sig(y, x, s)
                    st.mag[y, x] |= 1 << plane


def _mrp_dec(mq, st, plane):
    for y0, sh in _stripes(st.h):
        for x in range(st.w):
            for yy in range(sh):
                y = y0 + yy
                if not st.sig[y + 1, x + 1] or st.fresh[y, x]:
                    continue
                bit = mq.decode(st.mr_ctx(y, x))
                st.refined[y, x] = True
                if bit:
                    st.mag[y, x] |= 1 << plane


def _cup_dec(mq, st, plane):
    for y0, sh in _stripes(st.h):
        for x in range(st.w):
            yy = 0
            # run-length mode: full 4-high column, all insignificant,
            # unvisited, every context zero
            if sh == 4 and not st.visited[y0:y0 + 4, x].any() \
                    and all(st.sig[y0 + 1 + k, x + 1] == 0
                            and st.zc_ctx(y0 + k, x) == 0
                            for k in range(4)):
                if mq.decode(_CTX_RL) == 0:
                    continue
                r = (mq.decode(_CTX_UNI) << 1) | mq.decode(_CTX_UNI)
                y = y0 + r
                sc, xor = st.sc_ctx(y, x)
                s = mq.decode(sc) ^ xor
                st.set_sig(y, x, s)
                st.mag[y, x] |= 1 << plane
                yy = r + 1
            for k in range(yy, sh):
                y = y0 + k
                if st.sig[y + 1, x + 1] or st.visited[y, x]:
                    continue
                if mq.decode(st.zc_ctx(y, x)):
                    sc, xor = st.sc_ctx(y, x)
                    s = mq.decode(sc) ^ xor
                    st.set_sig(y, x, s)
                    st.mag[y, x] |= 1 << plane


def t1_encode(vals: np.ndarray, band: str, max_plane: int
              ) -> tuple[bytes, int]:
    """Encode one code-block (signed integers).  Returns (codeword,
    n_passes): the cleanup pass of `max_plane`, then (SPP, MRP, CP)
    triplets down to plane 0."""
    h, w = vals.shape
    st = _T1(h, w, band)
    mag = np.abs(vals).astype(np.int64)
    neg = vals < 0
    mq = MQEncoder()
    n_passes = 0
    for plane in range(max_plane, -1, -1):
        first = plane == max_plane
        if not first:
            _spp_enc(mq, st, mag, neg, plane)
            n_passes += 1
            _mrp_enc(mq, st, mag, plane)
            n_passes += 1
        _cup_enc(mq, st, mag, neg, plane)
        n_passes += 1
        st.fresh[:] = False
        st.visited[:] = False
    return mq.flush(), n_passes


def _enc_sig(mq, st, mag, neg, y, x, plane):
    bit = (mag[y, x] >> plane) & 1
    mq.encode(st.zc_ctx(y, x), int(bit))
    if bit:
        sc, xor = st.sc_ctx(y, x)
        s = 1 if neg[y, x] else 0
        mq.encode(sc, s ^ xor)
        st.set_sig(y, x, s)


def _spp_enc(mq, st, mag, neg, plane):
    for y0, sh in _stripes(st.h):
        for x in range(st.w):
            for yy in range(sh):
                y = y0 + yy
                if st.sig[y + 1, x + 1]:
                    continue
                if st.zc_ctx(y, x) == 0:
                    continue
                st.visited[y, x] = True
                _enc_sig(mq, st, mag, neg, y, x, plane)


def _mrp_enc(mq, st, mag, plane):
    for y0, sh in _stripes(st.h):
        for x in range(st.w):
            for yy in range(sh):
                y = y0 + yy
                if not st.sig[y + 1, x + 1] or st.fresh[y, x]:
                    continue
                mq.encode(st.mr_ctx(y, x), int((mag[y, x] >> plane) & 1))
                st.refined[y, x] = True


def _cup_enc(mq, st, mag, neg, plane):
    for y0, sh in _stripes(st.h):
        for x in range(st.w):
            yy = 0
            if sh == 4 and not st.visited[y0:y0 + 4, x].any() \
                    and all(st.sig[y0 + 1 + k, x + 1] == 0
                            and st.zc_ctx(y0 + k, x) == 0
                            for k in range(4)):
                col = [(mag[y0 + k, x] >> plane) & 1 for k in range(4)]
                if not any(col):
                    mq.encode(_CTX_RL, 0)
                    continue
                mq.encode(_CTX_RL, 1)
                r = col.index(1)
                mq.encode(_CTX_UNI, (r >> 1) & 1)
                mq.encode(_CTX_UNI, r & 1)
                y = y0 + r
                sc, xor = st.sc_ctx(y, x)
                s = 1 if neg[y, x] else 0
                mq.encode(sc, s ^ xor)
                st.set_sig(y, x, s)
                yy = r + 1
            for k in range(yy, sh):
                y = y0 + k
                if st.sig[y + 1, x + 1] or st.visited[y, x]:
                    continue
                _enc_sig(mq, st, mag, neg, y, x, plane)


# ------------------------------------------------------ 5/3 lifting DWT

def _ext_idx(n: int, i: np.ndarray) -> np.ndarray:
    """Whole-sample symmetric extension indices for a length-n signal
    (mirror without repeating the boundary sample: x[-1]=x[1],
    x[n]=x[n-2])."""
    if n == 1:
        return np.zeros_like(i)
    period = 2 * (n - 1)
    j = np.abs(i) % period
    return np.where(j >= n, period - j, j)


def _fwd53_1d(a: np.ndarray) -> np.ndarray:
    """Forward reversible 5/3 lifting along the last axis (Annex F):
    odd samples become H (predict), even samples become L (update);
    interleaved layout.  ``>> 1`` / ``>> 2`` are the spec's floor
    divisions, exact on negative ints."""
    n = a.shape[-1]
    y = a.astype(np.int64).copy()
    if n == 1:
        return y
    odd = np.arange(1, n, 2)
    y[..., odd] = y[..., odd] - (
        (y[..., _ext_idx(n, odd - 1)] + y[..., _ext_idx(n, odd + 1)]) >> 1)
    even = np.arange(0, n, 2)
    y[..., even] = y[..., even] + (
        (y[..., _ext_idx(n, even - 1)] + y[..., _ext_idx(n, even + 1)] + 2)
        >> 2)
    return y


def _inv53_1d(y: np.ndarray) -> np.ndarray:
    """Inverse 5/3 lifting along the last axis (interleaved layout):
    exact mirror of `_fwd53_1d` in reverse step order."""
    n = y.shape[-1]
    x = y.astype(np.int64).copy()
    if n == 1:
        return x
    even = np.arange(0, n, 2)
    x[..., even] = x[..., even] - (
        (x[..., _ext_idx(n, even - 1)] + x[..., _ext_idx(n, even + 1)] + 2)
        >> 2)
    odd = np.arange(1, n, 2)
    x[..., odd] = x[..., odd] + (
        (x[..., _ext_idx(n, odd - 1)] + x[..., _ext_idx(n, odd + 1)]) >> 1)
    return x


#: 9/7 irreversible lifting coefficients (Annex F, Daubechies-Sweldens
#: factorization — public constants)
_ALPHA97 = -1.586134342059924
_BETA97 = -0.052980118572961
_GAMMA97 = 0.882911075530934
_DELTA97 = 0.443506852043971
_K97 = 1.230174104914001


def _fwd97_1d(a: np.ndarray) -> np.ndarray:
    """Forward irreversible 9/7 lifting along the last axis (Annex F):
    four lifting steps then the K scaling (odd/H × K, even/L ÷ K) —
    interleaved layout, whole-sample symmetric extension, float64.
    Single-sample signals pass through unchanged (self-consistent with
    the inverse; real streams never hit that degenerate band here
    because the GRIB grids are > 1 wide)."""
    n = a.shape[-1]
    y = a.astype(np.float64).copy()
    if n == 1:
        return y
    odd = np.arange(1, n, 2)
    even = np.arange(0, n, 2)
    y[..., odd] += _ALPHA97 * (y[..., _ext_idx(n, odd - 1)]
                               + y[..., _ext_idx(n, odd + 1)])
    y[..., even] += _BETA97 * (y[..., _ext_idx(n, even - 1)]
                               + y[..., _ext_idx(n, even + 1)])
    y[..., odd] += _GAMMA97 * (y[..., _ext_idx(n, odd - 1)]
                               + y[..., _ext_idx(n, odd + 1)])
    y[..., even] += _DELTA97 * (y[..., _ext_idx(n, even - 1)]
                                + y[..., _ext_idx(n, even + 1)])
    y[..., odd] *= _K97
    y[..., even] /= _K97
    return y


def _inv97_1d(y: np.ndarray) -> np.ndarray:
    """Inverse 9/7 lifting along the last axis — exact mirror of
    `_fwd97_1d` in reverse step order (float, so 'exact' means to
    rounding; the reconstruction tests bound it at ~1e-9)."""
    n = y.shape[-1]
    x = y.astype(np.float64).copy()
    if n == 1:
        return x
    odd = np.arange(1, n, 2)
    even = np.arange(0, n, 2)
    x[..., odd] /= _K97
    x[..., even] *= _K97
    x[..., even] -= _DELTA97 * (x[..., _ext_idx(n, even - 1)]
                                + x[..., _ext_idx(n, even + 1)])
    x[..., odd] -= _GAMMA97 * (x[..., _ext_idx(n, odd - 1)]
                               + x[..., _ext_idx(n, odd + 1)])
    x[..., even] -= _BETA97 * (x[..., _ext_idx(n, even - 1)]
                               + x[..., _ext_idx(n, even + 1)])
    x[..., odd] -= _ALPHA97 * (x[..., _ext_idx(n, odd - 1)]
                               + x[..., _ext_idx(n, odd + 1)])
    return x


def _fwd97_2d(a: np.ndarray) -> dict:
    """One irreversible decomposition, same convention as `_fwd53_2d`
    (vertical then horizontal, deinterleave)."""
    t = _fwd97_1d(a.T).T
    t = _fwd97_1d(t)
    return {"LL": t[0::2, 0::2], "HL": t[0::2, 1::2],
            "LH": t[1::2, 0::2], "HH": t[1::2, 1::2]}


def _inv97_2d(bands: dict, h: int, w: int) -> np.ndarray:
    t = np.zeros((h, w), dtype=np.float64)
    t[0::2, 0::2] = bands["LL"]
    t[0::2, 1::2] = bands["HL"]
    t[1::2, 0::2] = bands["LH"]
    t[1::2, 1::2] = bands["HH"]
    t = _inv97_1d(t)
    return _inv97_1d(t.T).T


def _fwd53_2d(a: np.ndarray) -> dict:
    """One decomposition: returns {'LL','HL','LH','HH'} (deinterleaved).
    Order: vertical then horizontal (a fixed convention shared by the
    inverse; both directions use the same 1-D kernel)."""
    t = _fwd53_1d(a.T).T          # vertical (columns)
    t = _fwd53_1d(t)              # horizontal (rows)
    return {"LL": t[0::2, 0::2], "HL": t[0::2, 1::2],
            "LH": t[1::2, 0::2], "HH": t[1::2, 1::2]}


def _inv53_2d(bands: dict, h: int, w: int) -> np.ndarray:
    t = np.zeros((h, w), dtype=np.int64)
    t[0::2, 0::2] = bands["LL"]
    t[0::2, 1::2] = bands["HL"]
    t[1::2, 0::2] = bands["LH"]
    t[1::2, 1::2] = bands["HH"]
    t = _inv53_1d(t)              # horizontal first (inverse order)
    return _inv53_1d(t.T).T       # then vertical


# --------------------------------------------------- codestream layout

def _band_dims(h: int, w: int, levels: int) -> list:
    """[(level, band, bh, bw)] for every coded subband, plus the final
    LL dims; origin 0 so L gets ceil, H gets floor."""
    dims = []
    ch, cw = h, w
    for lev in range(1, levels + 1):
        lh, hh = (ch + 1) // 2, ch // 2
        lw, hw = (cw + 1) // 2, cw // 2
        dims.append((lev, {"HL": (lh, hw), "LH": (hh, lw),
                           "HH": (hh, hw)}))
        ch, cw = lh, lw
    return dims, (ch, cw)


def _cb_grid(bh: int, bw: int, cb: int) -> list:
    """Code-block rectangles [(y0,x0,h,w)] in raster order."""
    out = []
    for y0 in range(0, bh, cb):
        for x0 in range(0, bw, cb):
            out.append((y0, x0, min(cb, bh - y0), min(cb, bw - x0)))
    return out


def _mb(depth: int, band: str, guard: int = 2) -> int:
    """Bit-plane count for a reversible subband: component depth + the
    5/3 filter gain (LL 0, HL/LH 1, HH 2) + guard bits - 1."""
    gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[band]
    return depth + gain + guard - 1


def _pass_count_bits(w: "_BitWriter", n: int):
    if n == 1:
        w.write(0)
    elif n == 2:
        w.write(1)
        w.write(0)
    elif n <= 5:
        w.write_bits(0b11, 2)
        w.write_bits(n - 3, 2)
    elif n <= 36:
        w.write_bits(0b1111, 4)
        w.write_bits(n - 6, 5)
    else:
        w.write_bits(0b111111111, 9)
        w.write_bits(n - 37, 7)


def _pass_count_read(r: "_BitReader") -> int:
    if r.read() == 0:
        return 1
    if r.read() == 0:
        return 2
    v = r.read_bits(2)
    if v < 3:
        return 3 + v
    v = r.read_bits(5)
    if v < 31:
        return 6 + v
    return 37 + r.read_bits(7)


def encode_codestream(arr: np.ndarray, depth: int, levels: int = 5,
                      cb_exp: int = 6, guard: int = 2) -> bytes:
    """Encode an unsigned integer field as a lossless single-tile,
    single-component, single-layer LRCP codestream (the GRIB profile).
    `depth` = bits per sample; `cb_exp` = log2 code-block side."""
    h, w = arr.shape
    if not (0 <= int(arr.min(initial=0)) and
            int(arr.max(initial=0)) < (1 << depth)):
        raise ValueError("jpeg2000: values exceed declared depth")
    levels = max(0, min(levels, 32))
    cb = 1 << cb_exp

    # DC level shift then wavelet
    a = arr.astype(np.int64) - (1 << (depth - 1))
    bands_per_level = []
    ll = a
    dims, _ = _band_dims(h, w, levels)
    for lev in range(1, levels + 1):
        b = _fwd53_2d(ll)
        bands_per_level.append({k: b[k] for k in ("HL", "LH", "HH")})
        ll = b["LL"]

    # resolution r=0 holds the final LL; r=1..levels hold level
    # (levels-r+1)'s HL/LH/HH
    packets = _build_packets(ll, bands_per_level, levels, cb,
                             lambda band, lev: _mb(depth, band, guard))
    sqcd = bytes([guard << 5]) + bytes(
        [((depth + {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[b]) << 3)
         for b in (["LL"] + ["HL", "LH", "HH"] * levels)])
    return _emit_markers(packets, h, w, depth, levels, cb_exp,
                         transform=1, sqcd=sqcd)


def _build_packets(ll: np.ndarray, bands_per_level: list, levels: int,
                   cb: int, mb_for) -> list:
    """Layer-0 LRCP packets from integer coefficient/index bands —
    shared by the lossless (5/3 coefficients) and lossy (9/7 quantizer
    indices) encoders.  `mb_for(band, lev)` supplies the bit-plane
    budget; indices that do not fit raise loudly (a silent zbp
    underflow would corrupt every later block)."""
    packets = []
    for r in range(levels + 1):
        if r == 0:
            res_bands = [("LL", levels, ll)]
        else:
            lev = levels - r + 1
            bl = bands_per_level[lev - 1]
            res_bands = [("HL", lev, bl["HL"]), ("LH", lev, bl["LH"]),
                         ("HH", lev, bl["HH"])]
        hdr = _BitWriter()
        body = bytearray()
        hdr.write(1)                       # packet non-empty
        for band, lev, coeff in res_bands:
            bh, bw = coeff.shape
            if bh == 0 or bw == 0:
                continue
            blocks = _cb_grid(bh, bw, cb)
            ny = (bh + cb - 1) // cb
            nx = (bw + cb - 1) // cb
            incl = TagTree(nx, ny)
            incl.set_values(np.zeros((ny, nx), dtype=np.int64))
            zbp_tree = TagTree(nx, ny)
            mb = mb_for(band, lev)
            zbps, codes, npss = [], [], []
            for (y0, x0, ch, cw_) in blocks:
                vals = coeff[y0:y0 + ch, x0:x0 + cw_]
                amax = int(np.abs(vals).max(initial=0))
                used = amax.bit_length()
                if used > mb:
                    raise ValueError(
                        f"jpeg2000: {band}{lev} magnitude needs {used} "
                        f"bit planes but M_b = {mb} — raise the guard "
                        "bits or the quantization step")
                zbp = mb - used if amax else mb - 1
                zbp = min(zbp, mb - 1)
                max_plane = mb - 1 - zbp
                data, nps = t1_encode(vals, band, max_plane)
                if amax == 0:
                    # fully zero block: one cleanup pass of an all-zero
                    # plane still codes (cheap) — keeps the header simple
                    pass
                zbps.append(zbp)
                codes.append(data)
                npss.append(nps)
            zbp_tree.set_values(np.array(zbps, dtype=np.int64)
                                .reshape(ny, nx))
            for bi, (y0, x0, ch, cw_) in enumerate(blocks):
                bx, by = (x0 // cb), (y0 // cb)
                incl.encode(hdr, bx, by, 1)        # included in layer 0
                zbp_tree.encode(hdr, bx, by, zbps[bi] + 1)
                _pass_count_bits(hdr, npss[bi])
                lblock = 3
                nbits = len(codes[bi]).bit_length()
                need = nbits - (npss[bi].bit_length() - 1)
                while lblock < need:
                    hdr.write(1)
                    lblock += 1
                hdr.write(0)
                hdr.write_bits(len(codes[bi]),
                               lblock + (npss[bi].bit_length() - 1))
                body.extend(codes[bi])
        packets.append(hdr.flush() + bytes(body))
    return packets


def _emit_markers(packets: list, h: int, w: int, depth: int, levels: int,
                  cb_exp: int, transform: int, sqcd: bytes) -> bytes:
    """SOC/SIZ/COD/QCD/SOT/SOD/EOC scaffold shared by both encoders;
    `transform` is the COD transform byte (1 = 5/3, 0 = 9/7) and `sqcd`
    the full QCD segment body (style byte + SPqcd array)."""
    out = bytearray()
    out += b"\xff\x4f"                                   # SOC
    siz = struct.pack(">HHIIIIIIIIH", 38 + 3, 0, w, h, 0, 0, w, h,
                      0, 0, 1) + bytes([depth - 1, 1, 1])
    out += b"\xff\x51" + siz
    cod = bytes([0,                  # Scod: no precincts/SOP/EPH
                 0, 0, 1, 0,        # SGcod: LRCP, 1 layer (u16), no MCT
                 levels, cb_exp - 2, cb_exp - 2, 0, transform])
    out += b"\xff\x52" + struct.pack(">H", 2 + len(cod)) + cod
    out += b"\xff\x5c" + struct.pack(">H", 2 + len(sqcd)) + sqcd
    tile = b"".join(packets)
    psot = 12 + 2 + len(tile)
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93" + tile
    out += b"\xff\xd9"                                   # EOC
    return bytes(out)


def _lossy_qparams(rb: int, target_step: float) -> tuple:
    """(eps, mu, delta) for template E.3: delta = 2^(rb - eps) *
    (1 + mu/2^11), the closest representable step <= ~target, with the
    ACTUAL delta returned so encoder and decoder quantize identically."""
    import math
    if target_step <= 0:
        raise ValueError("jpeg2000: quantization step must be > 0")
    e2 = math.floor(math.log2(target_step))
    mu = round((target_step / 2.0 ** e2 - 1.0) * 2048)
    if mu == 2048:
        e2 += 1
        mu = 0
    eps = rb - e2
    if not 0 <= eps <= 31:
        raise ValueError(
            f"jpeg2000: step {target_step} not representable for "
            f"R_b={rb} (eps={eps} outside 0..31)")
    delta = 2.0 ** (rb - eps) * (1.0 + mu / 2048.0)
    return eps, mu, delta


def encode_codestream_lossy(arr: np.ndarray, depth: int, levels: int = 5,
                            cb_exp: int = 6, guard: int = 2,
                            step: float = 1.0) -> bytes:
    """Encode an unsigned integer field as a LOSSY (irreversible 9/7,
    scalar-expounded quantization) single-tile LRCP codestream — the
    test counterpart of the 9/7 decode branch.  `step` is the target
    quantization step in sample units applied to every band (snapped to
    the nearest representable delta = 2^(R_b - eps)(1 + mu/2048));
    reconstruction error per sample is bounded by ~step x the synthesis
    filter gain (the round-trip tests measure it).
    """
    h, w = arr.shape
    if not (0 <= int(arr.min(initial=0)) and
            int(arr.max(initial=0)) < (1 << depth)):
        raise ValueError("jpeg2000: values exceed declared depth")
    levels = max(0, min(levels, 32))
    cb = 1 << cb_exp

    a = arr.astype(np.float64) - float(1 << (depth - 1))
    bands_per_level = []
    ll = a
    for _lev in range(1, levels + 1):
        b = _fwd97_2d(ll)
        bands_per_level.append({k: b[k] for k in ("HL", "LH", "HH")})
        ll = b["LL"]

    gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}
    qp = {}
    band_order = [("LL", levels)] + [
        (bn, lev) for lev in range(levels, 0, -1)
        for bn in ("HL", "LH", "HH")]
    for bn, lev in band_order:
        qp[(bn, lev)] = _lossy_qparams(depth + gain[bn], step)

    def _q_band(vals, key):
        d = qp[key][2]
        return (np.sign(vals)
                * np.floor(np.abs(vals) / d)).astype(np.int64)

    ll_q = _q_band(ll, ("LL", levels))
    idx_per_level = [
        {bn: _q_band(bands_per_level[lev - 1][bn], (bn, lev))
         for bn in ("HL", "LH", "HH")}
        for lev in range(1, levels + 1)]
    packets = _build_packets(
        ll_q, idx_per_level, levels, cb,
        lambda band, lev: guard + qp[(band, lev)][0] - 1)
    sqcd = bytes([(guard << 5) | 2]) + b"".join(
        struct.pack(">H", (qp[k][0] << 11) | qp[k][1])
        for k in band_order)
    return _emit_markers(packets, h, w, depth, levels, cb_exp,
                         transform=0, sqcd=sqcd)


def decode_codestream(data: bytes) -> np.ndarray:
    """Decode a GRIB-profile codestream to the unsigned integer field.

    Supported: single tile/tile-part, one unsigned component, reversible
    5/3 (no quantization) OR irreversible 9/7 (scalar-expounded
    quantization, midpoint dequantization), no precinct subdivision, any
    of the five progression orders (trivially identical with one
    precinct + one layer + one component: packets always arrive
    resolution-major), COM skipped.  Anything outside raises
    NotImplementedError naming the cfgrib escape hatch.
    """
    def _need(cond, what):
        if not cond:
            raise NotImplementedError(
                f"jpeg2000: {what} not supported by the minimal GRIB "
                "profile decoder (install cfgrib/ecCodes for full "
                "coverage)")

    if data[:2] != b"\xff\x4f":
        raise ValueError("jpeg2000: missing SOC")
    pos = 2
    siz = cod = qcd = None
    tile = None
    while pos < len(data):
        marker = data[pos:pos + 2]
        pos += 2
        if marker == b"\xff\xd9":
            break
        if marker == b"\xff\x93":          # SOD: rest of tile-part
            _need(tile is not None, "SOD before SOT")
            body_end = tile["end"]
            tile["data"] = data[pos:body_end]
            pos = body_end
            continue
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + ln]
        if marker == b"\xff\x51":
            siz = seg
        elif marker == b"\xff\x52":
            cod = seg
        elif marker == b"\xff\x5c":
            qcd = seg
        elif marker == b"\xff\x90":        # SOT
            isot, psot, tpsot, tnsot = struct.unpack(">HIBB", seg[:8])
            _need(isot == 0 and tpsot == 0, "multiple tiles/tile-parts")
            end = pos - 2 + (psot if psot else len(data) - (pos - 2))
            tile = {"end": end}
        elif marker in (b"\xff\x53", b"\xff\x5d"):
            _need(False, "per-component COC/QCC overrides")
        # COM/other informational segments: skipped
        pos += ln

    _need(siz is not None and cod is not None and qcd is not None
          and tile is not None and "data" in tile,
          "incomplete codestream")
    rsiz, xs, ys, xo, yo, xt, yt, xto, yto, ncomp = struct.unpack(
        ">HIIIIIIIIH", siz[:36])
    _need(ncomp == 1, f"{ncomp} components")
    _need(xo == 0 and yo == 0 and xt >= xs and yt >= ys
          and xto == 0 and yto == 0, "tiled / offset grids")
    ssiz = siz[36]
    _need(ssiz < 0x80, "signed components")
    depth = (ssiz & 0x7F) + 1
    _need(siz[37] == 1 and siz[38] == 1, "subsampled components")
    h, w = ys, xs

    scod = cod[0]
    _need(scod & 0x01 == 0, "user-defined precincts")
    _need(scod & 0x06 == 0, "SOP/EPH markers")
    # With 1 layer, 1 component and 1 precinct per resolution (all
    # enforced below/above), every one of the five progression orders
    # (LRCP/RLCP/RPCL/PCRL/CPRL) degenerates to the same
    # resolution-major packet sequence — the loops over layer,
    # component and position each have exactly one iteration — so any
    # declared order decodes identically.
    _need(cod[1] in (0, 1, 2, 3, 4),
          f"unknown progression order {cod[1]}")
    layers = struct.unpack(">H", cod[2:4])[0]
    _need(layers == 1, f"{layers} quality layers")
    levels = cod[5]
    cbx, cby = cod[6] + 2, cod[7] + 2
    _need(cbx == cby, "non-square code-blocks")
    cb = 1 << cbx
    cbstyle = cod[8]
    _need(cbstyle == 0, f"code-block style 0x{cbstyle:02x} "
          "(bypass/termall/segmentation)")
    _need(cod[9] in (0, 1), f"transform byte {cod[9]}")
    wav97 = cod[9] == 0
    guard = qcd[0] >> 5
    qstyle = qcd[0] & 0x1F
    # Per-band quantization from the QCD segment (spec A.6.4), bands
    # ordered LL then (HL, LH, HH) per resolution coarse->fine.
    # M_b = guard + eps_b - 1 (spec E.1.1) — the PARSED exponent, not
    # an assumed depth+gain: a conformant encoder may choose other
    # exponents (e.g. rate-control headroom), and ignoring them would
    # silently decode wrong magnitudes instead of failing or adapting.
    spqcd = qcd[1:]
    band_order = [("LL", levels)] + [
        (bn, levels - i) for i in range(levels)
        for bn in ("HL", "LH", "HH")]
    eps = {}
    mu = {}
    if wav97:
        # irreversible 9/7: style 2 (scalar expounded) — 16-bit SPqcd
        # per band: eps in the top 5 bits, the 11-bit mantissa below
        _need(qstyle == 2,
              f"9/7 transform with quantization style {qstyle} "
              "(scalar-expounded only)")
        _need(len(spqcd) == 2 * len(band_order),
              f"{len(spqcd)} QCD bytes for {levels} levels "
              f"(expected {2 * len(band_order)})")
        for i, key in enumerate(band_order):
            v = struct.unpack(">H", spqcd[2 * i:2 * i + 2])[0]
            eps[key] = v >> 11
            mu[key] = v & 0x7FF
    else:
        _need(qstyle == 0,
              f"5/3 transform with quantization style {qstyle}")
        _need(len(spqcd) == len(band_order),
              f"{len(spqcd)} QCD exponents for {levels} decomposition "
              f"levels (expected {len(band_order)})")
        for i, key in enumerate(band_order):
            eps[key] = spqcd[i] >> 3

    dims, (llh, llw) = _band_dims(h, w, levels)
    body = tile["data"]
    br = _BitReader(body)
    decoded = {}
    for r in range(levels + 1):
        if r == 0:
            res_bands = [("LL", levels, llh, llw)]
        else:
            lev = levels - r + 1
            d = dims[lev - 1][1]
            res_bands = [("HL", lev, *d["HL"]), ("LH", lev, *d["LH"]),
                         ("HH", lev, *d["HH"])]
        _need(br.read() == 1, "empty packets")
        blocks_meta = []
        for band, lev, bh, bw in res_bands:
            if bh == 0 or bw == 0:
                continue
            blocks = _cb_grid(bh, bw, cb)
            ny = (bh + cb - 1) // cb
            nx = (bw + cb - 1) // cb
            incl = TagTree(nx, ny)
            zbp = TagTree(nx, ny)
            for (y0, x0, chh, cww) in blocks:
                bx, by = x0 // cb, y0 // cb
                inc = incl.decode(br, bx, by, 1)
                _need(inc, "blocks deferred past layer 0")
                t = 1
                while not zbp.decode(br, bx, by, t):
                    t += 1
                zb = t - 1
                nps = _pass_count_read(br)
                lblock = 3
                while br.read():
                    lblock += 1
                ln = br.read_bits(lblock + (nps.bit_length() - 1))
                blocks_meta.append((band, lev, bh, bw, y0, x0,
                                    chh, cww, zb, nps, ln))
        br.align()
        for (band, lev, bh, bw, y0, x0, chh, cww, zb, nps, ln) \
                in blocks_meta:
            cw_data = body[br.pos:br.pos + ln]
            br.pos += ln
            mb = guard + eps[(band, lev)] - 1
            mag, sgn = t1_decode(cw_data, chh, cww, band, nps,
                                 mb - 1 - zb)
            key = (band, lev)
            if key not in decoded:
                decoded[key] = np.zeros((bh, bw), dtype=np.int64)
            decoded[key][y0:y0 + chh, x0:x0 + cww] = mag * sgn
        br = _BitReader(body, br.pos)

    gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}

    def _deq(key, shape):
        """Quantizer indices -> reconstructed coefficients (E.1.1.2,
        midpoint r=0.5): sign(q) * (|q| + 0.5) * delta_b with
        delta_b = 2^(R_b - eps)(1 + mu/2^11), R_b = depth + gain."""
        q = decoded.get(key)
        if q is None:
            return np.zeros(shape, dtype=np.float64)
        delta = (2.0 ** (depth + gain[key[0]] - eps[key])
                 * (1.0 + mu[key] / 2048.0))
        return np.where(q != 0,
                        (np.abs(q) + 0.5) * delta * np.sign(q), 0.0)

    # inverse wavelet, coarse -> fine
    sizes = [(h, w)]
    for lev in range(1, levels + 1):
        sizes.append(((sizes[-1][0] + 1) // 2, (sizes[-1][1] + 1) // 2))
    if wav97:
        ll = _deq(("LL", levels), (llh, llw))
        for lev in range(levels, 0, -1):
            th, tw = sizes[lev - 1]
            d = dims[lev - 1][1]
            bands = {"LL": ll,
                     "HL": _deq(("HL", lev), d["HL"]),
                     "LH": _deq(("LH", lev), d["LH"]),
                     "HH": _deq(("HH", lev), d["HH"])}
            ll = _inv97_2d(bands, th, tw)
        out = np.floor(ll + float(1 << (depth - 1)) + 0.5)
        return np.clip(out, 0, (1 << depth) - 1).astype(np.int64)
    ll = decoded.get(("LL", levels),
                     np.zeros((llh, llw), dtype=np.int64))
    for lev in range(levels, 0, -1):
        th, tw = sizes[lev - 1]
        d = dims[lev - 1][1]
        bands = {"LL": ll,
                 "HL": decoded.get(("HL", lev),
                                   np.zeros(d["HL"], dtype=np.int64)),
                 "LH": decoded.get(("LH", lev),
                                   np.zeros(d["LH"], dtype=np.int64)),
                 "HH": decoded.get(("HH", lev),
                                   np.zeros(d["HH"], dtype=np.int64))}
        ll = _inv53_2d(bands, th, tw)
    return ll + (1 << (depth - 1))

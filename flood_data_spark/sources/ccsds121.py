"""CCSDS 121.0-B lossless adaptive-entropy (Rice) codec — the payload
format of GRIB2 data-representation template 5.42 ("CCSDS recommended
lossless compression").

From-spec implementation of the public CCSDS 121.0-B Blue Book: the
unit-delay predictor + standard mapper preprocessor, block-adaptive
option coding (fundamental sequence, sample splitting, second
extension, zero-block runs with ROS, no-compression), MSB-first bit
packing.  A matching encoder is included so the layered tests and the
GRIB builders can produce real codestreams; no code from libaec or any
other implementation is used.

Profile (each violation rejected loudly, naming the cfgrib/libaec
escape hatch — the same discipline as sources/jpeg2000.py):

- unsigned OR two's-complement signed samples (GRIB flag 1),
  3 <= nbits <= 32 (the option-ID width table below is for this
  range; 1-2-bit samples use a different ID layout),
- block size J in {8, 16, 32, 64}; segments of 64 blocks,
- preprocessing enabled (GRIB flag 32) with MSB bit order (flag 16);
  restricted-option streams (flag 64, the nbits<=4 reduced code set)
  are rejected,
- RSI byte-padding (GRIB flag 128): the codestream is zero-padded to
  a byte boundary at the start of every reference sample interval;
  both coder directions honor it when `pad_rsi` is set,
- the 3-byte flag (GRIB flag 2) describes only the UNPACKED sample
  buffer layout of the AEC streaming API (17-24-bit samples carried
  in 3 bytes instead of 4); the codestream itself is unchanged, so a
  decoder that emits arrays accepts it as a no-op for 17-24-bit
  samples and rejects the (meaningless) flag outside that range,
- reference blocks (every `rsi`-th block starts with a raw n-bit
  reference sample) are coded with sample-splitting or no-compression
  only; zero-run and second-extension codes never start at a reference
  block, and zero runs never cross a segment or reference boundary.

Bit-level layout per block (option IDs of width idlen = 3 for
nbits <= 8, 4 for <= 16, 5 for <= 32):

    id = 0, next bit 0   zero-block run; FS count f: f<4 -> run f+1,
                         f=4 -> ROS (zeros to segment/reference/data
                         end), f>=5 -> run f
    id = 0, next bit 1   second extension: J/2 FS codewords of
                         gamma = (a+b)(a+b+1)/2 + b
    id = k+1             sample splitting by k (k=0 is the fundamental
                         sequence): [raw n-bit reference if the block
                         starts one], FS of v>>k for each sample, then
                         the k split LSBs of each sample
    id = all ones        no compression: J samples at n bits each (the
                         MAPPED values; the reference sample raw)

FS codeword of v = v zeros then a one.  The mapper sends prediction
residual delta to a non-negative code with theta = min(prev - xmin,
xmax - prev): 2*delta for 0<=delta<=theta, -2*delta-1 for
-theta<=delta<0, theta+|delta| beyond (a bijection of [xmin, xmax];
unsigned samples use xmin=0, signed xmin=-2^(n-1) with reference
samples carried as raw n-bit two's complement).

Validation (the jpeg2000 lesson from ADVICE r10): layered round-trips
and per-layer spec restatements, PLUS hand-assembled bit-level
fixtures (tests/test_codec_fixtures.py, round 12) — frozen hex streams
built clause-by-clause from the Blue Book with hand-computed expected
samples, two of which deliberately use option codes this encoder would
not pick, so decoder bugs mirrored into the encoder cannot hide.  No
libaec binary exists in this environment; a real libaec-produced
stream remains the one still-open piece of evidence, and the GRIB
dispatch therefore stays strict about flags it does not understand.

Reference behavior target: /root/reference/flood/etl/utils.py:3-14
decodes any GRIB via cfgrib/ecCodes, which hands CCSDS payloads to
libaec.
"""

from __future__ import annotations

import math

import numpy as np

#: GRIB2 template 5.42 octet-22 "CCSDS compression options mask" bits
#: (the public AEC flag values the WMO template inherits)
FLAG_SIGNED = 1
FLAG_3BYTE = 2
FLAG_MSB = 16
FLAG_PREPROCESS = 32
FLAG_RESTRICTED = 64
FLAG_PAD_RSI = 128

SEGMENT_BLOCKS = 64
_BLOCK_SIZES = (8, 16, 32, 64)


def _fail(what: str):
    raise NotImplementedError(
        f"ccsds121: {what} not supported by the minimal GRIB profile "
        "codec (install cfgrib/ecCodes+libaec for full coverage)")


def _id_len(nbits: int) -> int:
    if nbits <= 8:
        return 3
    if nbits <= 16:
        return 4
    return 5


def _check_params(nbits: int, block_size: int, rsi: int):
    if not 3 <= nbits <= 32:
        _fail(f"{nbits}-bit samples (3..32 only)")
    if block_size not in _BLOCK_SIZES:
        _fail(f"block size {block_size} (8/16/32/64 only)")
    if rsi < 1:
        raise ValueError("ccsds121: rsi must be >= 1")


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write_bits(self, value: int, n: int):
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write(self, bit: int):
        self.write_bits(bit, 1)

    def fs(self, v: int):
        # v zeros then a one == the (v+1)-bit MSB-first integer 1
        self.write_bits(1, v + 1)

    def align(self):
        """Zero-pad to the next byte boundary (RSI padding, flag 128)."""
        if self.nacc:
            self.write_bits(0, 8 - self.nacc)

    def flush(self) -> bytes:
        if self.nacc:
            self.buf.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = 0
            self.nacc = 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self) -> int:
        i, o = divmod(self.bitpos, 8)
        if i >= len(self.data):
            raise ValueError("ccsds121: bitstream exhausted")
        self.bitpos += 1
        return (self.data[i] >> (7 - o)) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read()
        return v

    def read_fs(self) -> int:
        v = 0
        while self.read() == 0:
            v += 1
        return v

    def align(self):
        """Skip to the next byte boundary (RSI padding, flag 128)."""
        self.bitpos = (self.bitpos + 7) // 8 * 8


def _map_delta(x: int, prev: int, xmin: int, xmax: int) -> int:
    delta = x - prev
    theta = min(prev - xmin, xmax - prev)
    if 0 <= delta <= theta:
        return 2 * delta
    if -theta <= delta < 0:
        return -2 * delta - 1
    return theta + abs(delta)


def _unmap(d: int, prev: int, xmin: int, xmax: int) -> int:
    theta = min(prev - xmin, xmax - prev)
    if d <= 2 * theta:
        delta = d // 2 if d % 2 == 0 else -((d + 1) // 2)
    elif prev - xmin <= xmax - prev:
        delta = d - theta           # negative side was the short one
    else:
        delta = theta - d
    return prev + delta


def _sample_range(nbits: int, signed: bool) -> tuple[int, int]:
    if signed:
        return -(1 << (nbits - 1)), (1 << (nbits - 1)) - 1
    return 0, (1 << nbits) - 1


def _blocks(xs, nbits: int, block_size: int, rsi: int,
            signed: bool = False):
    """Preprocess the sample sequence into per-block coded values:
    (values, is_ref) per block — values[0] of a reference block is the
    RAW sample (two's-complement-masked at write time when signed),
    everything else the mapped prediction residual.  The tail block
    pads by repeating the final sample (mapped 0s)."""
    xmin, xmax = _sample_range(nbits, signed)
    n = len(xs)
    nblocks = (n + block_size - 1) // block_size
    out = []
    prev = 0
    for b in range(nblocks):
        is_ref = b % rsi == 0
        vals = []
        for j in range(block_size):
            i = b * block_size + j
            x = int(xs[i if i < n else n - 1])
            if not xmin <= x <= xmax:
                raise ValueError(
                    f"ccsds121: sample {x} outside [{xmin}, {xmax}]")
            if is_ref and j == 0:
                vals.append(x)
            else:
                vals.append(_map_delta(x, prev, xmin, xmax))
            prev = x
        out.append((vals, is_ref))
    return out


def encode(xs, nbits: int, block_size: int = 16, rsi: int = 64,
           force_option: str | None = None, signed: bool = False,
           pad_rsi: bool = False) -> bytes:
    """Integers -> CCSDS 121.0-B bitstream (MSB, preprocessed).

    `signed` selects the two's-complement sample range (GRIB flag 1):
    the mapper pivots on xmin = -2^(n-1) and reference samples ride
    as raw n-bit two's complement.  `pad_rsi` (GRIB flag 128)
    zero-pads the stream to a byte boundary at the start of every
    reference sample interval after the first.

    `force_option` pins every non-reference block's coding for test
    coverage: 'split:K', 'se', 'unc', or 'zero' (zero-runs allowed;
    otherwise runs are still detected unless a different option is
    forced).  Reference blocks always use their best split/unc option.
    """
    _check_params(nbits, block_size, rsi)
    blocks = _blocks(xs, nbits, block_size, rsi, signed)
    idlen = _id_len(nbits)
    kmax = (1 << idlen) - 3
    unc_id = (1 << idlen) - 1
    w = _BitWriter()
    nblocks = len(blocks)
    b = 0
    while b < nblocks:
        seg_end = (b // SEGMENT_BLOCKS + 1) * SEGMENT_BLOCKS
        vals, is_ref = blocks[b]
        if pad_rsi and is_ref and b > 0:
            w.align()
        # zero-run detection (never starts at / crosses a reference
        # block, never crosses a segment boundary)
        if not is_ref and force_option in (None, "zero") \
                and all(v == 0 for v in vals):
            q = 0
            while (b + q < nblocks and b + q < seg_end
                   and not blocks[b + q][1]
                   and all(v == 0 for v in blocks[b + q][0])):
                q += 1
            w.write_bits(0, idlen)
            w.write(0)
            end = b + q
            ros = (end == seg_end or end == nblocks
                   or blocks[end][1])
            if ros:
                w.fs(4)
            elif q < 5:
                w.fs(q - 1)
            else:
                w.fs(q)
            b += q
            continue

        data = vals[1:] if is_ref else vals
        ref_bits = nbits if is_ref else 0
        best = None
        for k in range(kmax + 1):
            cost = (idlen + ref_bits
                    + sum(v >> k for v in data) + len(data) * (k + 1))
            if best is None or cost < best[0]:
                best = (cost, ("split", k))
        if not is_ref:
            se_cost = idlen + 1
            for i in range(0, len(data), 2):
                a, c = data[i], data[i + 1]
                se_cost += (a + c) * (a + c + 1) // 2 + c + 1
            if se_cost < best[0]:
                best = (se_cost, ("se",))
        unc_cost = idlen + block_size * nbits
        if unc_cost < best[0]:
            best = (unc_cost, ("unc",))
        opt = best[1]
        if force_option and not is_ref:
            if force_option.startswith("split:"):
                opt = ("split", int(force_option.split(":")[1]))
            elif force_option in ("se", "unc"):
                opt = (force_option,)
        if opt == ("unc",):
            w.write_bits(unc_id, idlen)
            for v in vals:
                w.write_bits(v, nbits)
        elif opt == ("se",):
            w.write_bits(0, idlen)
            w.write(1)
            for i in range(0, len(data), 2):
                a, c = data[i], data[i + 1]
                w.fs((a + c) * (a + c + 1) // 2 + c)
        else:
            k = opt[1]
            if k > kmax:
                raise ValueError(f"ccsds121: split k={k} > {kmax}")
            w.write_bits(k + 1, idlen)
            if is_ref:
                w.write_bits(vals[0], nbits)
            for v in data:
                w.fs(v >> k)
            if k:
                for v in data:
                    w.write_bits(v & ((1 << k) - 1), k)
        b += 1
    return w.flush()


def decode(data: bytes, n: int, nbits: int, block_size: int = 16,
           rsi: int = 64, signed: bool = False,
           pad_rsi: bool = False) -> np.ndarray:
    """CCSDS 121.0-B bitstream -> the n samples (int64; two's-complement
    range when `signed`).  `pad_rsi` skips to a byte boundary at the
    start of every reference sample interval after the first."""
    _check_params(nbits, block_size, rsi)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    xmin, xmax = _sample_range(nbits, signed)
    sign_bit = 1 << (nbits - 1)
    idlen = _id_len(nbits)
    unc_id = (1 << idlen) - 1
    r = _BitReader(data)
    nblocks = (n + block_size - 1) // block_size
    out: list[int] = []
    prev = 0
    b = 0
    while b < nblocks:
        is_ref = b % rsi == 0
        if pad_rsi and is_ref and b > 0:
            r.align()
        seg_end = (b // SEGMENT_BLOCKS + 1) * SEGMENT_BLOCKS
        idv = r.read_bits(idlen)
        if idv == 0 and r.read() == 0:
            if is_ref:
                _fail("a zero-block run starting at a reference block")
            f = r.read_fs()
            next_ref = (b // rsi + 1) * rsi
            allowed = min(seg_end, next_ref, nblocks) - b
            if f < 4:
                q = f + 1
            elif f == 4:
                q = allowed
            else:
                q = f
            if q > allowed:
                # a conformant stream never runs zeros across a segment
                # or reference boundary (the encoder emits ROS there) —
                # clamping would silently skip a required raw reference
                # sample, so fail loudly instead (r11 self-review)
                _fail(f"a zero-block run of {q} crossing a segment/"
                      f"reference boundary ({allowed} blocks remain)")
            out.extend([prev] * (q * block_size))
            b += q
            continue
        if idv == 0:                      # extension bit was 1: SE
            if is_ref:
                _fail("a second-extension code at a reference block")
            vals = []
            for _ in range(block_size // 2):
                g = r.read_fs()
                m = (math.isqrt(8 * g + 1) - 1) // 2
                d2 = g - m * (m + 1) // 2
                vals += [m - d2, d2]
        elif idv == unc_id:
            vals = [r.read_bits(nbits) for _ in range(block_size)]
        else:
            k = idv - 1
            ref_raw = r.read_bits(nbits) if is_ref else None
            cnt = block_size - 1 if is_ref else block_size
            fsv = [r.read_fs() for _ in range(cnt)]
            if k:
                vals = [(f << k) | r.read_bits(k) for f in fsv]
            else:
                vals = fsv
            if is_ref:
                vals = [ref_raw] + vals
        for j, v in enumerate(vals):
            if is_ref and j == 0:
                # raw reference sample: sign-extend under the signed
                # profile (two's complement in n bits)
                x = v - (1 << nbits) if signed and v & sign_bit else v
            else:
                x = _unmap(v, prev, xmin, xmax)
            if not xmin <= x <= xmax:
                raise ValueError(
                    f"ccsds121: decoded sample {x} outside "
                    f"[{xmin}, {xmax}] — corrupt stream or unsupported "
                    "profile")
            out.append(x)
            prev = x
        b += 1
    return np.array(out[:n], dtype=np.int64)

"""Real, dependency-free media codecs for the multimodal operators.

PNG (RFC 2083 / W3C PNG spec) and WAV (RIFF/WAVE PCM) are public formats
simple enough to decode with stdlib ``zlib``/``struct`` + numpy — so the
`extract_image_features` / `resize_images` / `extract_audio_features`
mapInPandas paths can run on REAL bytes in this container, not only on the
deterministic fakes (PIL/ffmpeg/torchaudio remain the production choice;
these codecs are the no-dependency fallback and the test-bed).

Supported:
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/
  Average/Paeth); non-interlaced only (Adam7 raises).
- WAV: integer PCM (8/16/32-bit) and IEEE float32, any channel count.
- AVI: RIFF container walk — raw video-frame payload extraction and
  every-Nth sampling (frame pixels stay opaque; decoding them is the
  separate injectable step, per the multimodal contract).

Everything here executes executor-side inside a mapInPandas batch — pure
per-row CPU, no Spark state, so it scales exactly like the fake-decoder
path the plumbing tests already pin.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (palette expands to 3 after lookup)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _iter_chunks(content: bytes):
    pos = len(_PNG_SIG)
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("PNG: truncated chunk " + ctype.decode("latin1"))
        yield ctype, data
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            return
    raise ValueError("PNG: missing IEND")


def _paeth(a, b, c):
    """Paeth predictor, vectorized over int16 arrays (spec §6.6)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Palette images are expanded through PLTE to RGB.  Raises ValueError on
    malformed input, NotImplementedError on interlace/16-bit (out of scope
    for the fallback codec; PIL handles them in production).
    """
    if content[:8] != _PNG_SIG:
        raise ValueError("PNG: bad signature")
    width = height = None
    bit_depth = color_type = None
    palette = None
    idat = bytearray()
    for ctype, data in _iter_chunks(content):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if interlace:
                raise NotImplementedError("PNG: Adam7 interlace unsupported")
            if bit_depth != 8:
                raise NotImplementedError(
                    f"PNG: bit depth {bit_depth} unsupported (8 only)")
            if color_type not in _CHANNELS:
                raise ValueError(f"PNG: unknown color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG: missing IHDR")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: decompressed size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]

    out = np.empty((height, stride), dtype=np.uint8)
    zero_prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f, line = int(filters[y]), lines[y]
        prev = out[y - 1] if y else zero_prev
        if f == 0:                          # None
            out[y] = line
        elif f == 2:                        # Up
            out[y] = line + prev            # uint8 wraps = mod 256 per spec
        elif f in (1, 3, 4):                # Sub / Average / Paeth need the
            row = out[y]                    # in-progress row: per-pixel scan
            for x in range(stride):
                left = row[x - nch] if x >= nch else np.uint8(0)
                up = prev[x]
                ul = prev[x - nch] if x >= nch else np.uint8(0)
                if f == 1:
                    pred = int(left)
                elif f == 3:
                    pred = (int(left) + int(up)) // 2
                else:
                    pred = int(_paeth(np.uint8(left), np.uint8(up),
                                      np.uint8(ul)))
                row[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter {f}")
    img = out.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, C) with C in {1, 2, 3, 4} → PNG bytes
    (filter 0 on every scanline, one zlib stream — the simplest conformant
    encoding; byte-exact decodable by any PNG reader)."""
    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        img = img[:, :, None]
    height, width, nch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((height, 1), dtype=np.uint8),          # filter byte 0
         img.reshape(height, width * nch)], axis=1)
    idat = zlib.compress(rows.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data \
            + struct.pack(">I", crc)

    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def png_image_decoder(content: bytes) -> dict:
    """Drop-in real decoder for `extract_image_features(decoder=...)`:
    width/height/channels from IHDR, embedding = 8 deterministic pixel
    statistics (per-channel means padded to 4, overall std/min/max/
    luma-mean, all scaled to [0, 1])."""
    img = decode_png(content)
    h, w, c = img.shape
    px = img.astype(np.float32) / 255.0
    ch_means = [float(px[:, :, i].mean()) for i in range(min(c, 4))]
    ch_means += [0.0] * (4 - len(ch_means))
    emb = ch_means + [float(px.std()), float(px.min()), float(px.max()),
                      float(px.mean())]
    return {"width": int(w), "height": int(h), "channels": int(c),
            "embedding": [float(v) for v in emb]}


def png_image_resizer(content: bytes, width: int, height: int) -> bytes:
    """Drop-in real resizer for `resize_images(resizer=...)`:
    nearest-neighbor resample (pure index arithmetic, deterministic) and
    re-encode; output is a valid PNG at the target dimensions."""
    img = decode_png(content)
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(height) * h) // max(height, 1), h - 1)
    xi = np.minimum((np.arange(width) * w) // max(width, 1), w - 1)
    return encode_png(img[yi][:, xi])


def image_ahash(content: bytes, hash_size: int = 8) -> tuple[int, int]:
    """Perceptual average-hash of a PNG: decode → channel-mean
    grayscale → nearest-neighbor downsample to hash_size² (the
    png_image_resizer index arithmetic) → one bit per cell, set iff the
    cell STRICTLY exceeds the grid mean.  Returns the bit matrix packed
    row-major MSB-first as two non-negative 32-bit halves (hi, lo) —
    two ints instead of one 64-bit word so no engine ever sees a
    sign-wrapped hash (the oracle mirrors hi/lo as plain integer sums).

    Determinism note: the grid mean is sum/hash_size² — exact in IEEE
    when hash_size is a power of two — and single-channel images skip
    the (inexact for c=3) channel average entirely, so the threshold
    compare on the gate fixtures is bit-reproducible by any engine
    restating the closed form."""
    if hash_size * hash_size > 64:
        raise ValueError("image_ahash: hash_size² must fit 64 bits")
    img = decode_png(content)
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    yi = np.minimum((np.arange(hash_size) * h) // hash_size, h - 1)
    xi = np.minimum((np.arange(hash_size) * w) // hash_size, w - 1)
    grid = gray[yi][:, xi]
    bits = (grid > grid.mean()).reshape(-1)
    packed = 0
    for b in bits:
        packed = (packed << 1) | int(b)
    packed <<= 64 - bits.size
    return packed >> 32, packed & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE PCM)

# explicit little-endian dtypes: WAV is little-endian regardless of host
_WAV_INT_DTYPES = {8: np.dtype("u1"), 16: np.dtype("<i2"),
                   32: np.dtype("<i4")}


def decode_wav(content: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float32 samples in [-1, 1], shape
    (n_frames, n_channels)).  Integer PCM (8/16/32-bit) and IEEE float32.
    """
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF/WAVE header")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4:pos + 8])
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError(f"WAV: bad fmt chunk (channels={n_ch}, rate={rate})")
    if audio_fmt == 3 and bits == 32:          # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif audio_fmt == 1 and bits in _WAV_INT_DTYPES:
        raw = np.frombuffer(data, dtype=_WAV_INT_DTYPES[bits])
        if bits == 8:                          # unsigned, midpoint 128
            x = (raw.astype(np.float32) - 128.0) / 128.0
        else:
            x = raw.astype(np.float32) / float(2 ** (bits - 1))
    else:
        raise NotImplementedError(
            f"WAV: format {audio_fmt}/{bits}-bit unsupported")
    n_frames = len(x) // n_ch
    return rate, x[:n_frames * n_ch].reshape(n_frames, n_ch)


def wav_audio_decoder(content: bytes) -> dict:
    """Drop-in real decoder for `extract_audio_features(decoder=...)`:
    header-true sample_rate/n_samples/duration, spectral = 8 log-magnitude
    bands of the mono-mixed FFT (deterministic: rfft of the first 65536
    samples, bands averaged in equal slices)."""
    rate, samples = decode_wav(content)
    n_frames = samples.shape[0]
    if n_frames == 0:
        # header-only file (recorder opened + closed): structurally valid
        spectral = [0.0] * 8
    else:
        mono = samples.mean(axis=1)
        spec = np.abs(np.fft.rfft(mono[:65536]))
        bands = np.array_split(spec, 8)
        spectral = [float(np.log1p(b.mean())) if len(b) else 0.0
                    for b in bands]
    return {"sample_rate": int(rate), "n_samples": int(n_frames),
            "duration_s": float(n_frames) / float(rate),
            "spectral": spectral}


# ---------------------------------------------------------------------------
# AVI (RIFF) frame extraction

def avi_frames(content: bytes) -> list:
    """AVI bytes → list of raw video-frame payloads, in stream order.

    The AVI container is plain RIFF (public spec): a 'LIST'/'movi' chunk
    holds the frames as '##dc'/'##db' sub-chunks (compressed / uncompressed
    video of stream ##).  The payloads stay opaque bytes — exactly the
    multimodal FRAME_SCHEMA contract — so sampling frames from a real AVI
    needs no video codec at all; decoding a frame's pixels is a separate
    (injectable) step."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("AVI: bad RIFF/AVI header")
    frames = []

    def scan(buf: bytes, pos: int, end: int):
        end = min(end, len(buf))
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body_start = pos + 8
            if body_start + size > len(buf):
                # consistent malformed-input contract with the other
                # codecs: ValueError, never a silent short frame
                raise ValueError(
                    f"AVI: chunk {cid!r} overruns the buffer")
            if cid == b"LIST":
                subtype = buf[body_start:body_start + 4]
                if subtype in (b"movi", b"rec "):
                    scan(buf, body_start + 4, body_start + size)
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(buf[body_start:body_start + size])
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    scan(content, 12, len(content))
    return frames


def avi_frame_sampler(content: bytes, every_n: int = 30) -> list:
    """Drop-in real sampler for `extract_frames(sampler=...)`: every Nth
    video frame from a genuine AVI container."""
    frames = avi_frames(content)
    return frames[::max(every_n, 1)]

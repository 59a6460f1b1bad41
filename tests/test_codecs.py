"""Real-codec tests: the pure-Python PNG/WAV codecs decode genuine bytes
(not the deterministic fakes), end-to-end through the mapInPandas
multimodal operators.

Independence of the checks:
- the filtered-PNG test constructs its file byte-by-byte with struct/zlib
  and asserts hand-computed pixel values (decoder correctness does not
  lean on encode_png);
- the WAV test writes its file with the stdlib `wave` module — an
  independent, real encoder.
"""

import math
import struct
import wave
import zlib

import numpy as np
import pytest

from flood_data_spark.datapipe.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    png_image_decoder,
    png_image_resizer,
    wav_audio_decoder,
)
from flood_data_spark.datapipe.multimodal import (
    extract_audio_features,
    extract_image_features,
    read_media,
    resize_images,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _manual_png(width, height, color_type, scanlines, plte=None):
    """Build a PNG from (filter_byte, line_bytes) pairs without encode_png."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(line) for f, line in scanlines)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(plte))
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_png_all_filters_hand_computed():
    # 3x4 grayscale, one scanline per filter type; expected reconstructions
    # computed by hand from the PNG spec's filter definitions (§6.5-6.6)
    png = _manual_png(3, 4, 0, [
        (1, [5, 3, 2]),    # Sub:     [5, 5+3=8, 8+2=10]
        (2, [1, 2, 3]),    # Up:      [5+1=6, 8+2=10, 10+3=13]
        (3, [4, 1, 7]),    # Average: [4+6//2=7, 1+(7+10)//2=9, 7+(9+13)//2=18]
        (4, [2, 2, 2]),    # Paeth:   [2+7=9, 2+9=11, 2+18=20]
    ])
    img = decode_png(png)
    assert img.shape == (4, 3, 1)
    expected = [[5, 8, 10], [6, 10, 13], [7, 9, 18], [9, 11, 20]]
    assert img[:, :, 0].tolist() == expected


def test_png_palette_expansion():
    plte = [255, 0, 0, 0, 255, 0, 0, 0, 255]  # red, green, blue
    png = _manual_png(3, 1, 3, [(0, [0, 2, 1])], plte=plte)
    img = decode_png(png)
    assert img.shape == (1, 3, 3)
    assert img[0].tolist() == [[255, 0, 0], [0, 0, 255], [0, 255, 0]]


def test_png_roundtrip_rgb_and_rgba():
    rng = np.random.default_rng(7)
    for nch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, nch), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)


def test_png_malformed_inputs_raise():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated chunk stream


def _write_wav(path, rate=8000, n=4000, freq=440.0, channels=1):
    t = np.arange(n) / rate
    x = (np.sin(2 * math.pi * freq * t) * 0.5 * 32767).astype(np.int16)
    frames = np.repeat(x[:, None], channels, axis=1).reshape(-1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(frames.tobytes())


def test_wav_decode_stdlib_encoded(tmp_path):
    p = tmp_path / "tone.wav"
    _write_wav(p, rate=8000, n=4000, freq=1600.0, channels=2)
    rate, samples = decode_wav(p.read_bytes())
    assert rate == 8000
    assert samples.shape == (4000, 2)
    # 0.5-amplitude sine sampled at 5 samples/period: the grid never hits
    # the crest, so the observed peak is 0.5*sin(2pi/5) ~ 0.4755
    assert samples.max() == pytest.approx(0.5 * math.sin(2 * math.pi / 5),
                                          abs=0.01)
    assert abs(samples.mean()) < 0.01
    feats = wav_audio_decoder(p.read_bytes())
    assert feats["sample_rate"] == 8000
    assert feats["n_samples"] == 4000
    assert feats["duration_s"] == pytest.approx(0.5)
    assert len(feats["spectral"]) == 8
    # 1600 Hz at 8 kHz over a 4000-sample rfft = bin 800 of 2001, which
    # falls in band 3 of the 8 equal slices — the dominant band
    assert np.argmax(feats["spectral"]) == 3


def test_image_features_real_png_through_spark(spark, tmp_path):
    rng = np.random.default_rng(3)
    dims = [(6, 4, 3), (10, 8, 4), (5, 5, 1)]
    for i, (w, h, c) in enumerate(dims):
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        (tmp_path / f"img_{i}.png").write_bytes(encode_png(img))
    media = read_media(spark, str(tmp_path) + "/*.png", mime="image/png")
    feats = extract_image_features(media, decoder=png_image_decoder)
    rows = {(r.width, r.height, r.channels) for r in feats.collect()}
    assert rows == set(dims)
    emb = feats.collect()[0].embedding
    assert len(emb) == 8 and all(0.0 <= v <= 1.0 for v in emb)


def test_resize_real_png_through_spark(spark, tmp_path):
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4, :, 0] = 200  # top half red-ish: survives nearest-neighbor
    (tmp_path / "a.png").write_bytes(encode_png(img))
    media = read_media(spark, str(tmp_path) + "/*.png")
    resized = resize_images(media, width=4, height=4,
                            resizer=png_image_resizer)
    row = resized.collect()[0]
    out = decode_png(bytes(row.content))
    assert out.shape == (4, 4, 3)
    assert (out[:2, :, 0] == 200).all() and (out[2:, :, 0] == 0).all()


def test_audio_features_real_wav_through_spark(spark, tmp_path):
    _write_wav(tmp_path / "t1.wav", rate=16000, n=16000)
    _write_wav(tmp_path / "t2.wav", rate=8000, n=2000)
    media = read_media(spark, str(tmp_path) + "/*.wav", mime="audio/wav")
    feats = extract_audio_features(media, decoder=wav_audio_decoder)
    rows = {r.sample_rate: r for r in feats.collect()}
    assert set(rows) == {16000, 8000}
    assert rows[16000].n_samples == 16000
    assert rows[16000].duration_s == pytest.approx(1.0)
    assert rows[8000].duration_s == pytest.approx(0.25)


def test_wav_header_only_file_is_valid(tmp_path):
    """A recorder that opens and immediately closes a file produces a
    structurally valid zero-sample WAV — features must not crash."""
    p = tmp_path / "empty.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
    feats = wav_audio_decoder(p.read_bytes())
    assert feats["n_samples"] == 0
    assert feats["duration_s"] == 0.0
    assert feats["spectral"] == [0.0] * 8


def test_grib2_zero_length_section_raises(tmp_path):
    """A corrupt zero section length must raise, never spin forever."""
    import struct as _struct
    from flood_data_spark.sources.grib2 import grib2_to_dataframe
    from tests.test_grib2 import build_message

    msg = bytearray(build_message([0] * 6))
    msg[16:20] = _struct.pack(">I", 0)  # first section's length -> 0
    with pytest.raises(ValueError, match="section length"):
        grib2_to_dataframe(bytes(msg))


def _build_avi(frames, junk_chunk=True):
    """Minimal valid RIFF/AVI built by hand: optional non-movi chunk, then
    LIST/movi holding 00dc frame chunks (word-aligned)."""
    import struct as _s

    def chunk(cid, body):
        return cid + _s.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b"")

    movi_body = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    body = b"AVI "
    if junk_chunk:
        body += chunk(b"JUNK", b"\x00" * 12)
    body += chunk(b"LIST", movi_body)
    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_avi_frame_extraction_and_sampling():
    from flood_data_spark.datapipe.codecs import avi_frame_sampler, avi_frames

    frames = [bytes([i]) * (10 + i) for i in range(7)]
    avi = _build_avi(frames)
    assert avi_frames(avi) == frames
    assert avi_frame_sampler(avi, every_n=3) == frames[::3]
    with pytest.raises(ValueError, match="RIFF"):
        avi_frames(b"not an avi")


def test_real_avi_through_extract_frames(spark, tmp_path):
    from flood_data_spark.datapipe.codecs import avi_frame_sampler
    from flood_data_spark.datapipe.multimodal import extract_frames

    frames = [bytes([i]) * 20 for i in range(6)]
    (tmp_path / "clip.avi").write_bytes(_build_avi(frames))
    media = read_media(spark, str(tmp_path) + "/*.avi", mime="video/avi")
    out = extract_frames(media, sampler=avi_frame_sampler, every_n=2)
    rows = sorted(out.collect(), key=lambda r: r.frame_idx)
    assert [bytes(r.frame) for r in rows] == frames[::2]
    assert [r.frame_idx for r in rows] == [0, 1, 2]

"""Multimodal column plumbing tests: binaryFile ingestion, metadata-only
filters, and the mapInPandas decode boundary with the deterministic fake."""

import os

import pytest

from flood_data_spark.datapipe.multimodal import (
    decode_image_stub,
    extract_image_features,
    fake_image_decoder,
    filter_by_size,
    read_media,
)


def _write_blobs(tmpdir, n=5):
    paths = []
    for i in range(n):
        p = os.path.join(tmpdir, f"img_{i}.bin")
        with open(p, "wb") as f:
            f.write(bytes([i + 1, (i + 1) * 2]) + b"\x07" * (10 + i * 100))
        paths.append(p)
    return paths


def test_read_media_schema_and_ids(spark, tmp_path):
    _write_blobs(str(tmp_path))
    media = read_media(spark, str(tmp_path) + "/*.bin", mime="image/test")
    assert media.columns == ["media_id", "path", "mime", "n_bytes", "content"]
    rows = media.collect()
    assert len(rows) == 5
    assert len({r.media_id for r in rows}) == 5  # stable distinct ids
    assert all(r.mime == "image/test" for r in rows)


def test_metadata_filter_never_touches_payload(spark, tmp_path):
    _write_blobs(str(tmp_path))
    media = read_media(spark, str(tmp_path) + "/*.bin")
    small = filter_by_size(media, min_bytes=1, max_bytes=120)
    # blobs are 12, 112, 212, 312, 412 bytes
    assert small.count() == 2


def test_extract_features_with_fake_decoder(spark, tmp_path):
    _write_blobs(str(tmp_path), n=3)
    media = read_media(spark, str(tmp_path) + "/*.bin")
    feats = extract_image_features(media, decoder=fake_image_decoder)
    rows = {r.width: r for r in feats.collect()}
    assert len(rows) == 3
    # width = first byte + 1; blob i starts with byte i+1
    assert set(rows) == {2, 3, 4}
    r = rows[2]
    assert r.channels == 3
    assert len(r.embedding) == 8
    assert r.embedding[0] == pytest.approx(1 / 255.0)


def test_stub_decoder_raises(spark, tmp_path):
    _write_blobs(str(tmp_path), n=1)
    media = read_media(spark, str(tmp_path) + "/*.bin")
    feats = extract_image_features(media, decoder=decode_image_stub)
    with pytest.raises(Exception, match="no general image codec"):
        feats.collect()


def test_extract_frames_explodes_one_row_per_frame(spark, tmp_path):
    from flood_data_spark.datapipe.multimodal import (
        extract_frames,
        fake_frame_sampler,
        sample_frames_stub,
    )

    _write_blobs(str(tmp_path), n=3)
    media = read_media(spark, str(tmp_path) + "/*.bin", mime="video/test")
    frames = extract_frames(media, sampler=fake_frame_sampler, every_n=16)
    rows = frames.collect()
    assert frames.columns == ["media_id", "frame_idx", "frame"]
    # blob i has 12 + i*100 bytes → (12+i*100)//16 frames, min 1
    sizes = {r.n_bytes for r in media.select("n_bytes").collect()}
    expected = sum(max(1, s // 16) for s in sizes)
    assert len(rows) == expected
    # per-video frame indices are dense from 0
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_vid.values():
        assert sorted(idxs) == list(range(len(idxs)))
    # real codec path stays explicitly unimplemented
    with pytest.raises(NotImplementedError):
        sample_frames_stub(b"RIFF")


def test_audio_features_and_resize(spark, tmp_path):
    from flood_data_spark.datapipe.multimodal import (
        decode_audio_stub,
        extract_audio_features,
        fake_audio_decoder,
        fake_image_resizer,
        resize_image_stub,
        resize_images,
    )

    _write_blobs(str(tmp_path), n=4)
    media = read_media(spark, str(tmp_path) + "/*.bin", mime="audio/test")

    audio = extract_audio_features(media, decoder=fake_audio_decoder)
    rows = {r.media_id: r for r in audio.collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r.sample_rate == 16000
        assert abs(r.duration_s - r.n_samples / 16000.0) < 1e-6
        assert len(r.spectral) == 8

    resized = resize_images(media, 8, 4, resizer=fake_image_resizer)
    got = resized.collect()
    assert all(len(bytes(r.content)) == 8 * 4 for r in got)
    assert all((r.width, r.height) == (8, 4) for r in got)

    with pytest.raises(NotImplementedError):
        decode_audio_stub(b"RIFF")
    with pytest.raises(NotImplementedError):
        resize_image_stub(b"PNG", 2, 2)


def test_embed_text_deterministic_and_partition_independent(spark):
    from flood_data_spark.datapipe.multimodal import (
        embed_text, fake_text_encoder)

    docs = spark.createDataFrame(
        [(i, f"document number {i % 7}") for i in range(100)],
        "doc_id long, text string")
    enc = fake_text_encoder(dim=8)
    a = {r.doc_id: r.embedding for r in embed_text(docs, enc).collect()}
    b = {r.doc_id: r.embedding
         for r in embed_text(docs.repartition(7), enc, batch_rows=3).collect()}
    assert a == b                       # layout/batching never changes values
    assert len(a) == 100 and all(len(v) == 8 for v in a.values())
    # same text -> same embedding (encoder is content-addressed)
    assert a[0] == a[7] and a[1] != a[2]


def test_embed_text_composes_with_quantize_and_topk(spark):
    from flood_data_spark.datapipe.multimodal import (
        embed_text, fake_text_encoder)
    from flood_data_spark.datapipe.quantize import quantize_embeddings
    from flood_data_spark.datapipe.similarity import cosine_topk_bruteforce

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(30)], "doc_id long, text string")
    emb = embed_text(docs, fake_text_encoder(dim=8)) \
        .withColumnRenamed("doc_id", "vec_id")
    q = quantize_embeddings(emb)
    assert q.filter("size(qvec) != 8").count() == 0
    top = cosine_topk_bruteforce(emb, emb.filter("vec_id < 3"), k=2)
    assert top.count() == 6


def test_read_media_default_mime_is_parquet_writable(spark, tmp_path):
    """mime=None must yield a StringType column (F.lit(None) alone is a
    void type that parquet sinks reject — review finding)."""
    import os

    from flood_data_spark.datapipe.multimodal import read_media

    src = tmp_path / "media"
    os.makedirs(src)
    (src / "a.bin").write_bytes(b"\x00\x01")
    df = read_media(spark, str(src / "*.bin"))
    assert dict(df.dtypes)["mime"] == "string"
    out = str(tmp_path / "out")
    df.write.parquet(out)
    back = spark.read.parquet(out).collect()
    assert len(back) == 1 and back[0].mime is None


# --- perceptual-hash dedup ---------------------------------------------


def test_image_ahash_goldens():
    import numpy as np

    from flood_data_spark.datapipe.codecs import encode_png, image_ahash

    # constant image: no pixel STRICTLY exceeds the mean -> all zeros
    flat = encode_png(np.full((8, 8, 1), 77, dtype=np.uint8))
    assert image_ahash(flat) == (0, 0)
    # left-half dark, right-half bright: bits set exactly on the
    # bright columns, every row -> hi == lo, 4 bits per 8-bit row
    img = np.zeros((8, 8, 1), dtype=np.uint8)
    img[:, 4:] = 200
    hi, lo = image_ahash(encode_png(img))
    assert hi == lo == 0x0F0F0F0F
    # a 16x16 image downsamples through the same nearest-neighbor
    # index math -> identical hash to its 8x8 source
    big = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert image_ahash(encode_png(big)) == (hi, lo)
    with pytest.raises(ValueError, match="64 bits"):
        image_ahash(flat, hash_size=9)


def test_ahash_banding_is_lossless_for_small_hamming(spark):
    """4x16-bit band pigeonhole: every pair within Hamming <= 3 is
    found (compare against brute force over all pairs)."""
    import numpy as np

    from flood_data_spark.datapipe.multimodal import ahash_dup_pairs

    rng = np.random.default_rng(6)
    base = int(rng.integers(0, 2 ** 32)), int(rng.integers(0, 2 ** 32))
    rows = [(0, base[0], base[1])]
    # neighbors at controlled Hamming distances 1..6
    for d in range(1, 7):
        hi, lo = base
        for bit in range(d):
            if bit % 2 == 0:
                hi ^= 1 << (bit * 5 % 32)
            else:
                lo ^= 1 << (bit * 7 % 32)
        rows.append((d, hi, lo))
    df = spark.createDataFrame(rows, "media_id long, ahash_hi long,"
                                     " ahash_lo long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in ahash_dup_pairs(df, max_hamming=3).collect()}
    # brute force
    import itertools
    expect = {}
    for (i1, h1, l1), (i2, h2, l2) in itertools.combinations(rows, 2):
        hd = bin(h1 ^ h2).count("1") + bin(l1 ^ l2).count("1")
        if hd <= 3:
            expect[(min(i1, i2), max(i1, i2))] = hd
    assert got == expect and len(expect) >= 3
    with pytest.raises(ValueError, match="pigeonhole"):
        ahash_dup_pairs(df, max_hamming=4)


def test_ahash_media_runs_the_real_codec(spark):
    import numpy as np

    from flood_data_spark.datapipe.codecs import encode_png, image_ahash
    from flood_data_spark.datapipe.multimodal import ahash_media

    imgs = []
    for k in range(4):
        arr = ((np.arange(64).reshape(8, 8) * (k + 3)) % 251) \
            .astype(np.uint8)[:, :, None]
        imgs.append((k, bytearray(encode_png(arr))))
    df = spark.createDataFrame(imgs, "media_id long, content binary")
    got = {r.media_id: (r.ahash_hi, r.ahash_lo)
           for r in ahash_media(df).collect()}
    for k, png in imgs:
        assert got[k] == image_ahash(bytes(png))

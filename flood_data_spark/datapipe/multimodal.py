"""Multimodal column plumbing for training-data pipelines.

Images/audio/video ride as opaque `binary` columns with typed metadata
structs.  The Spark-side machinery — schemas, binaryFile ingestion, Arrow
batch shapes, partition sizing — is real and tested.  The codec step is an
injected callable: `datapipe.codecs` ships REAL dependency-free PNG and
WAV codecs (`png_image_decoder`, `png_image_resizer`, `wav_audio_decoder`)
that decode genuine bytes in this container; the production choice
(PIL/ffmpeg/torchaudio, not installed here) slots into the same seam, and
deterministic fakes remain for plumbing tests on arbitrary blobs.

Scale notes:
- decode runs inside mapInPandas: one Arrow batch of (id, bytes) in, one
  batch of features out; `spark.sql.files.maxPartitionBytes` and
  maxRecordsPerBatch bound executor memory against large blobs;
- metadata-only transformations (filter by size/mime, bucketing by
  resolution) stay native-DataFrame and never touch the payload;
- feature outputs are fixed-width arrays → columnar parquet, prunable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("path", StringType(), True),
    StructField("mime", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("content", BinaryType(), True),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("embedding", ArrayType(FloatType()), True),
])


def read_media(spark: SparkSession, path_glob: str,
               mime: str | None = None) -> DataFrame:
    """binaryFile ingestion → MEDIA_SCHEMA rows; media_id is a stable hash
    of the path (deterministic across runs, no driver-side enumeration).

    `path` is carried alongside precisely because a 64-bit hash key has
    material birthday-collision odds past ~10⁹ files — at that scale join
    on (media_id, path) or switch the key to the path itself."""
    df = (spark.read.format("binaryFile").load(path_glob)
          # cast: F.lit(None) alone is a NullType (void) column, which
          # parquet sinks reject — the default mime=None must still yield
          # the StringType MEDIA_SCHEMA promises
          .select(F.xxhash64("path").alias("media_id"),
                  F.col("path"),
                  F.lit(mime).cast("string").alias("mime"),
                  F.col("length").alias("n_bytes"),
                  F.col("content")))
    return df


def decode_image_stub(content: bytes) -> dict:
    """Production implementation would be PIL/libvips; for PNG bytes use
    the real dependency-free `codecs.png_image_decoder`."""
    raise NotImplementedError(
        "no general image codec in this environment — inject a decoder "
        "into extract_image_features(decoder=...); for PNG, "
        "flood_data_spark.datapipe.codecs.png_image_decoder works here")


def fake_image_decoder(content: bytes) -> dict:
    """Deterministic stand-in: 'decodes' dimensions and an 8-dim embedding
    from the byte content so tests can assert end-to-end plumbing."""
    h = np.frombuffer(content[:64].ljust(64, b"\0"), dtype=np.uint8)
    return {
        "width": int(h[0]) + 1,
        "height": int(h[1]) + 1,
        "channels": 3,
        "embedding": (h[:8].astype(np.float32) / 255.0).tolist(),
    }


def extract_image_features(media_df: DataFrame,
                           decoder: Callable[[bytes], dict] = decode_image_stub
                           ) -> DataFrame:
    """mapInPandas decode: (media_id, content) batches → feature rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                feats = decoder(bytes(content))
                out.append({"media_id": int(mid), **feats})
            if out:
                yield pd.DataFrame(out)

    return (media_df
            .select("media_id", "content")
            .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA))


def sample_frames_stub(content: bytes, every_n: int = 30) -> list:
    """General video frame sampling needs ffmpeg; for AVI containers the
    real dependency-free `codecs.avi_frame_sampler` works here."""
    raise NotImplementedError(
        "no general video codec in this environment — inject a sampler "
        "into extract_frames(sampler=...); for AVI, "
        "flood_data_spark.datapipe.codecs.avi_frame_sampler works here")


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def fake_frame_sampler(content: bytes, every_n: int = 30) -> list:
    """Deterministic stand-in for ffmpeg frame extraction: 'frames' are
    fixed-size byte slices so tests can assert the one-row-per-frame
    explode shape and per-frame payload plumbing."""
    n_frames = max(1, len(content) // max(every_n, 1))
    return [content[i * every_n:(i + 1) * every_n] for i in range(n_frames)]


def extract_frames(media_df: DataFrame,
                   sampler: Callable[[bytes], list] = sample_frames_stub,
                   every_n: int = 30) -> DataFrame:
    """Video → one row per sampled frame via mapInPandas (a flatMap: each
    input row yields `n_frames` output rows, so downstream per-frame ops —
    dedup, feature extraction, filtering — parallelize past the video
    boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for idx, frame in enumerate(sampler(bytes(content), every_n)):
                    out.append({"media_id": int(mid), "frame_idx": idx,
                                "frame": frame})
            if out:
                yield pd.DataFrame(out)

    return (media_df
            .select("media_id", "content")
            .mapInPandas(run, schema=FRAME_SCHEMA))


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_samples", LongType(), True),
    StructField("duration_s", FloatType(), True),
    StructField("spectral", ArrayType(FloatType()), True),
])


def decode_audio_stub(content: bytes) -> dict:
    """Production implementation would be torchaudio/librosa; for WAV bytes
    use the real dependency-free `codecs.wav_audio_decoder`."""
    raise NotImplementedError(
        "no general audio codec in this environment — inject a decoder "
        "into extract_audio_features(decoder=...); for WAV, "
        "flood_data_spark.datapipe.codecs.wav_audio_decoder works here")


def fake_audio_decoder(content: bytes) -> dict:
    """Deterministic stand-in: sample-rate/duration/spectral vector derived
    from the byte content."""
    h = np.frombuffer(content[:32].ljust(32, b"\0"), dtype=np.uint8)
    n_samples = int(len(content)) * 4
    return {
        "sample_rate": 16000,
        "n_samples": n_samples,
        "duration_s": float(n_samples) / 16000.0,
        "spectral": (h[:8].astype(np.float32) / 255.0).tolist(),
    }


def extract_audio_features(media_df: DataFrame,
                           decoder: Callable[[bytes], dict] = decode_audio_stub
                           ) -> DataFrame:
    """mapInPandas decode: (media_id, content) batches → audio feature rows
    (same Arrow-batch shape as the image path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                feats = decoder(bytes(content))
                out.append({"media_id": int(mid), **feats})
            if out:
                yield pd.DataFrame(out)

    return (media_df
            .select("media_id", "content")
            .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA))


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("content", BinaryType(), True),
])


def resize_image_stub(content: bytes, width: int, height: int) -> bytes:
    """Production implementation would be PIL/libvips; for PNG bytes use
    the real dependency-free `codecs.png_image_resizer`."""
    raise NotImplementedError(
        "no general image codec in this environment — inject a resizer "
        "into resize_images(resizer=...); for PNG, "
        "flood_data_spark.datapipe.codecs.png_image_resizer works here")


def fake_image_resizer(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: payload truncated/padded to width*height
    bytes, so output size tracks the target dimensions."""
    return content[:width * height].ljust(width * height, b"\0")


def resize_images(media_df: DataFrame, width: int, height: int,
                  resizer: Callable[[bytes, int, int], bytes] = resize_image_stub
                  ) -> DataFrame:
    """Batch image resize behind the same mapInPandas boundary; output rows
    carry the new payload + target dims (re-ingestable as MEDIA rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                out.append({"media_id": int(mid), "width": width,
                            "height": height,
                            "content": resizer(bytes(content), width, height)})
            if out:
                yield pd.DataFrame(out)

    return (media_df
            .select("media_id", "content")
            .mapInPandas(run, schema=RESIZED_SCHEMA))


def filter_by_size(media_df: DataFrame, min_bytes: int = 1,
                   max_bytes: int = 50 * 1024 * 1024) -> DataFrame:
    """Metadata-only gate: runs native (pushdown-friendly), payload untouched."""
    return media_df.filter(F.col("n_bytes").between(min_bytes, max_bytes))


# ---------------------------------------------------------------------------
# Text-encoder plumbing (documents -> embeddings bridge)

TEXT_EMBEDDING_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("embedding", ArrayType(FloatType()), True),
])


def encode_text_stub(texts: "pd.Series") -> np.ndarray:
    """Real-model seam: swap in a sentence-transformer / API call here.
    Not available in this container."""
    raise NotImplementedError("no text encoder in this environment")


def fake_text_encoder(dim: int = 16) -> Callable:
    """Deterministic fake encoder: per-document hash seeds a per-row RNG, so
    the 'embedding' depends only on the text — stable across runs,
    partitionings, and batch boundaries (the property the tests pin)."""
    import hashlib
    import struct

    def encode(texts: "pd.Series") -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            # md5, NOT hash(): the builtin is salted per interpreter
            # (PYTHONHASHSEED), which would make embeddings differ across
            # executors — exactly the nondeterminism the tests pin against
            (seed,) = struct.unpack(
                "<Q", hashlib.md5(str(t).encode()).digest()[:8])
            out[i] = np.random.default_rng(seed).normal(0, 1, dim)
        return out
    return encode


def embed_text(docs_df: DataFrame, encoder: Callable,
               text_col: str = "text", id_col: str = "doc_id",
               batch_rows: int = 256) -> DataFrame:
    """documents → (doc_id, embedding) through ONE mapInPandas boundary.

    The encoder sees pandas Series batches of at most `batch_rows` texts
    (re-chunked inside the Arrow batch: encoder peak memory is bounded by
    batch_rows × dim regardless of maxRecordsPerBatch), and only (id, text)
    cross to Python — project other columns away before the boundary, join
    features back on doc_id after.  Compose downstream with
    datapipe.quantize / similarity exactly like the stored embeddings
    table.
    """
    narrow = docs_df.select(F.col(id_col).alias("doc_id"),
                            F.col(text_col).alias("_text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                vecs = encoder(chunk["_text"])
                yield pd.DataFrame({
                    "doc_id": chunk["doc_id"].to_numpy(),
                    "embedding": [np.asarray(v, dtype=np.float32)
                                  for v in vecs],
                })

    return narrow.mapInPandas(run, TEXT_EMBEDDING_SCHEMA)


def ahash_media(media_df: DataFrame,
                hasher: Callable[[bytes], tuple] | None = None
                ) -> DataFrame:
    """Perceptual-hash pass over (media_id, content) image rows: one
    mapInPandas boundary (the codec seam — same shape as
    extract_image_features) computing `codecs.image_ahash` per image.
    Returns (media_id, ahash_hi, ahash_lo) with the 64-bit average-hash
    split into two non-negative 32-bit longs — band-extractable and
    XOR-able in any engine with zero sign hazards."""
    if hasher is None:
        from flood_data_spark.datapipe.codecs import image_ahash
        hasher = image_ahash

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                hi, lo = hasher(bytes(content))
                out.append({"media_id": int(mid),
                            "ahash_hi": int(hi), "ahash_lo": int(lo)})
            if out:
                yield pd.DataFrame(out)

    return (media_df.select("media_id", "content")
            .mapInPandas(run, schema="media_id long, ahash_hi long,"
                                     " ahash_lo long"))


def ahash_dup_pairs(hashes: DataFrame, max_hamming: int = 3,
                    id_col: str = "media_id") -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance —
    the SimHash pigeonhole played on the aHash: the 64-bit hash splits
    into FOUR 16-bit bands, and any pair within Hamming distance
    max_hamming <= 3 must agree on at least one whole band (3 flipped
    bits cannot touch 4 bands), so a per-band equality self-join
    generates a LOSSLESS candidate set — Σ|bucket|² work, never
    corpus² — and one exact bit_count(XOR) verify keeps true pairs.
    Returns (id_a, id_b, hamming), id_a < id_b, deduplicated across
    bands, sorted."""
    if not 0 <= max_hamming <= 3:
        raise ValueError("ahash_dup_pairs: max_hamming must be in "
                         "[0, 3] (4-band pigeonhole bound)")
    from pyspark.sql import functions as F
    h = hashes.select(F.col(id_col).alias("id"),
                      F.col("ahash_hi").alias("hi"),
                      F.col("ahash_lo").alias("lo"))
    # band identity includes WHICH slot matched (posexplode index) —
    # two hashes sharing a value across different band slots are not
    # pigeonhole candidates
    bands = h.select(
        "id", "hi", "lo",
        F.posexplode(F.array(
            F.shiftright("hi", 16),
            F.col("hi").bitwiseAND(F.lit(0xFFFF)),
            F.shiftright("lo", 16),
            F.col("lo").bitwiseAND(F.lit(0xFFFF))))
        .alias("band_idx", "band_val"))
    a = bands.select(F.col("id").alias("id_a"), F.col("hi").alias("hi_a"),
                     F.col("lo").alias("lo_a"), "band_idx", "band_val")
    b = bands.select(F.col("id").alias("id_b"), F.col("hi").alias("hi_b"),
                     F.col("lo").alias("lo_b"), "band_idx", "band_val")
    cand = (a.join(b, ["band_idx", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
            .distinct())
    hamming = (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
               + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    return (cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", F.col("hamming").cast("int")
                    .alias("hamming"))
            .orderBy("id_a", "id_b"))

"""Corpus curation operators: deterministic sampling, chunking, sequence
packing, per-source caps.

These are the dataset-assembly steps of a training-data pipeline (the
reference engine has no analog — this is the beyond-reference datapipe
layer): after cleaning/dedup (text.py, dedup.py) the corpus is sampled to a
target size, long documents are split into training-window chunks, chunks
are packed into token-budget sequences, and over-represented sources are
capped.

Scale posture:
- sampling is a pure per-row predicate on an md5 prefix — no shuffle, no
  state, reproducible across engines and runs (the classic hash-mod split);
- chunking is explode over an integer sequence — row-local, codegen;
- packing and capping are single ordered-window passes WITHIN a partition
  key (pack/cap globally and you've serialized the corpus through one
  task — always partition by shard/source at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_cut(rate: float, bits: int = 16) -> str:
    """Hex cutoff c such that md5-prefix < c keeps ~rate of keys.

    Lowercase-hex string comparison == numeric comparison, so the predicate
    is portable to any engine with md5 (DuckDB, Trino, ...) verbatim."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate == 1.0:
        # int(1.0 * 2^bits) formats to one hex digit too many, and a 5-char
        # "10000" sorts BEFORE most 4-char prefixes ('1' < 'a'), silently
        # keeping ~1/16 of rows; 'g' sorts after every hex digit → keep all
        return "g"
    return format(int(rate * (1 << bits)), f"0{bits // 4}x")


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Deterministic ~rate sample: keep rows whose md5(key || salt) 4-hex
    prefix falls under the rate cutoff.

    Unlike DataFrame.sample this is a function of the KEY, not of partition
    layout or RNG state: re-runs, different engines, and different partition
    counts all select the same rows (reproducible train/eval splits), and
    disjoint salts give independent samples.  Granularity is 1/65536.
    """
    cut = hash_cut(rate)
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 4)
    return df.filter(prefix < F.lit(cut))


def chunk_documents(df: DataFrame, chunk_size: int = 2048,
                    overlap: int = 256, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into overlapping character windows
    (training-context chunks): chunk k covers [k*stride, k*stride +
    chunk_size) with stride = chunk_size - overlap.

    Adds (chunk_id, chunk_text, chunk_chars) with one output row per chunk;
    a document not longer than chunk_size yields exactly one chunk (its full
    text — empty documents included, so no rows are silently dropped).
    Row-local explode over an integer sequence: no shuffle, whole-stage
    codegen, chunk count = max(1, ceil((len - overlap) / stride)).
    """
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_size ({chunk_size}), "
            "else the chunk sequence never advances")
    stride = chunk_size - overlap
    # integer ceil((len - overlap) / stride), floored at 1
    n_chunks = F.greatest(
        F.lit(1),
        F.expr(f"CAST((length({text_col}) - {overlap} + {stride} - 1) "
               f"DIV {stride} AS INT)"))
    return (df
            .withColumn("chunk_id",
                        F.explode(F.sequence(F.lit(0), n_chunks - 1)))
            .withColumn("chunk_text",
                        F.expr(f"substring({text_col}, "
                               f"chunk_id * {stride} + 1, {chunk_size})"))
            .withColumn("chunk_chars", F.length("chunk_text")))


def pack_sequences(df: DataFrame, token_budget: int,
                   token_col: str = "n_tokens",
                   partition_cols=("source",),
                   order_col: str = "doc_id") -> DataFrame:
    """Assign documents to token-budget packs (sequence packing for
    training batches): within each partition, documents are laid out in
    `order_col` order and pack_id = floor(tokens-before-this-doc / budget)
    — the streaming first-fit-in-order approximation: a document joins the
    pack its first token lands in (packs can overflow by up to one document
    rather than splitting documents across packs).

    One ordered-window pass per partition.  `partition_cols` is mandatory
    at scale: an empty tuple packs globally through a SINGLE task — fine
    for tests, corpus-serializing at 100 TB (pack per shard/source and
    renumber downstream if global ids are needed).
    """
    parts = list(partition_cols or ())
    w = (Window.partitionBy(*parts).orderBy(order_col)
         if parts else Window.orderBy(order_col))
    cum_before = (F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
    return df.withColumn(
        "pack_id",
        (F.coalesce(cum_before, F.lit(0)) / token_budget)
        .cast("long"))


# ASCII-class patterns so the Java-regex (Spark) and RE2 (SQL oracles)
# interpretations coincide exactly — same discipline as text.BPE_ISH_PATTERN
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9\-\s()]{6,}[0-9]"
DEFAULT_PII_PATTERNS = (EMAIL_PATTERN, PHONE_PATTERN)


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text",
               patterns=DEFAULT_PII_PATTERNS,
               token: str = "[REDACTED]") -> DataFrame:
    """Scrub PII-shaped spans (emails, phone-number-like digit runs by
    default) before text ships to training: adds `out_col` with every match
    replaced by `token` and `n_redactions` counting the replacements.

    Patterns apply in order, each counted against the text as the previous
    ones left it (a span can't be double-counted).  Pure regexp_count /
    regexp_replace columns — codegen, streams at scan speed, and the
    heuristic's limits are the usual ones (it flags lookalikes, it is not a
    PII guarantee).
    """
    cur = F.col(text_col)
    total = F.lit(0)
    for pat in patterns:
        total = total + F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, token)
    return (df.withColumn(out_col, cur)
            .withColumn("n_redactions", total.cast("long")))


def cap_per_key(df: DataFrame, cap: int, partition_cols=("source",),
                order_col: str = "doc_id") -> DataFrame:
    """Keep at most `cap` rows per key (anti-over-representation: cap
    documents per domain/source/site), deterministically — the first `cap`
    in `order_col` order survive.  One window pass; the helper column is
    dropped so the schema is unchanged."""
    parts = list(partition_cols or ())
    w = (Window.partitionBy(*parts).orderBy(order_col)
         if parts else Window.orderBy(order_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn"))

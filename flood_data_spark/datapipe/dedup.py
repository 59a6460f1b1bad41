"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale posture (the whole point at 100 TB):
- exact dedup is a hash-groupBy on a digest — one shuffle of (digest, id),
  never of the payload;
- n-gram Jaccard is a similarity *join*: explode shingles → per-shingle
  equi-join → per-pair overlap count — not an O(n²) cross product, and the
  shingle is hashed to a long so shuffle rows stay narrow;
- MinHash = one groupBy over (id, shingle-hash) rows with K min-aggregates
  (single shuffle, whole-stage codegen — deliberately NOT nested
  higher-order-function transforms, which Spark evaluates interpreted);
  LSH banding turns near-dup search into an equi-join on band keys;
- SimHash packs a 64-bit signature per doc; near-dup = small Hamming
  distance, candidates via pigeonhole equi-join on signature chunks.

All signature relations are cached before self-joins: they are tiny
(ids + longs) relative to the corpus, and without the cache Spark would
re-derive the whole shingle pipeline for each join side.  The caches are
session-scoped (LRU-evicted under memory pressure, cleared on session
stop); a long-lived driver looping these operators over many batches
should call `spark.catalog.clearCache()` between batches or wrap each
batch in its own session.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                normalize: bool = True) -> DataFrame:
    """One representative row (minimum id) per distinct text.

    Returns (dup_key, rep_id, n_copies).  groupBy on the md5 digest keeps the
    shuffle narrow: the text payload never moves.
    """
    key = F.col(text_col)
    if normalize:
        key = F.lower(F.regexp_replace(F.trim(key), r"\s+", " "))
    return (df
            .select(F.md5(key).alias("dup_key"), F.col(id_col))
            .groupBy("dup_key")
            .agg(F.min(id_col).alias("rep_id"),
                 F.count("*").alias("n_copies")))


def dedup_against(batch: DataFrame, reference: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  normalize: bool = True) -> DataFrame:
    """Incremental exact dedup — the daily-ingest shape: drop batch
    documents whose normalized text already exists in the `reference`
    corpus (yesterday's published data), then keep one representative
    (min id) per remaining duplicate group WITHIN the batch.

    Returns the surviving batch rows unchanged (schema preserved).
    Scale: only digests of the reference ever move — at 100 TB keep a
    digest-only table alongside the corpus and pass it here; the
    anti-join shuffles (digest, id) pairs, never text payloads.
    """
    keyed = batch.withColumn("_dk", _digest(F.col(text_col), normalize))
    ref_keys = (reference
                .select(_digest(F.col(text_col), normalize).alias("_dk"))
                .distinct())
    fresh = keyed.join(ref_keys, "_dk", "left_anti")
    w = Window.partitionBy("_dk").orderBy(id_col)
    return (fresh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_dk", "_rn"))


def _bloom_positions(digest_col, n_bits: int, n_hashes: int) -> list:
    """The k bit positions of a digest: md5(digest || i) 8-hex prefix mod
    n_bits — engine-portable (any SQL engine with md5 computes the same
    positions, so the whole filter decision value-oracles exactly)."""
    return [
        (F.conv(F.substring(F.md5(F.concat(digest_col, F.lit(str(i)))),
                            1, 8), 16, 10)
         .cast("long") % n_bits).cast("int")
        for i in range(n_hashes)
    ]


def bloom_bits(reference: DataFrame, text_col: str = "text",
               n_bits: int = 1 << 20, n_hashes: int = 4,
               normalize: bool = True) -> DataFrame:
    """The reference corpus's Bloom filter as a RELATION: the distinct set
    bit positions (single `pos` int column, ≤ n_bits rows).  Spark has no
    public bloom_filter_agg SQL function, and a bit-blob would be opaque
    to the oracle anyway — a distinct-positions relation IS a Bloom
    filter (membership = all k positions present), it broadcasts (≤ a few
    MB at n_bits = 2^20-2^27), persists as plain parquet alongside the
    corpus, and unions incrementally as new reference batches arrive
    (bits only ever turn on).

    Size the filter like any Bloom: k = n_hashes, m = n_bits, n =
    reference keys → fp ≈ (1 - e^(-kn/m))^k; m/n = 10 bits/key with k = 4
    gives ~1.2%.
    """
    if n_bits < 2 or n_hashes < 1:
        raise ValueError(f"need n_bits >= 2 and n_hashes >= 1, got "
                         f"{n_bits}/{n_hashes}")
    digest = _digest(F.col(text_col), normalize)
    pos = _bloom_positions(digest, n_bits, n_hashes)
    # localCheckpoint: the probe consumes this relation k times (one join
    # per hash) — without materialization Catalyst re-runs the REFERENCE
    # SCAN + distinct once per join (observed: 4 corpus scans in the x10
    # bench plan).  The relation is ≤ n_bits rows — the bounded
    # multiply-consumed-aggregate class docs/PLANS.md documents.
    return (reference
            .select(F.explode(F.array(*pos)).alias("pos"))
            .distinct()
            .localCheckpoint(eager=False))


def with_bloom_seen(batch: DataFrame, bits: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    n_bits: int = 1 << 20, n_hashes: int = 4,
                    normalize: bool = True,
                    out_col: str = "bloom_maybe_seen") -> DataFrame:
    """Probe a `bloom_bits` relation: adds `out_col` — true iff ALL k of
    the document's bit positions are set (Bloom semantics: no false
    negatives, bounded false positives).  The 100 TB crawl-filter shape:
    the batch scan broadcast-joins the bits relation and NEVER shuffles;
    per document the probe is k integer lookups.

    `n_bits`/`n_hashes`/`normalize` must match the build call — they are
    part of the filter's identity.

    Plan: k stateless broadcast joins of the SAME bits relation (one per
    hash), AND-ed — the batch side never shuffles and no aggregation
    state exists, so the identical code runs on a STREAMING batch
    (stream-static joins are stateless; the explode+groupBy formulation
    would have required a streaming aggregation).  `id_col` is unused in
    this formulation but kept for signature stability.
    """
    del id_col  # row-local probe: no key needed
    digest = _digest(F.col(text_col), normalize)
    pos = _bloom_positions(digest, n_bits, n_hashes)
    # distinct: an incrementally-unioned bits relation (the documented
    # maintenance path) may repeat a position — a duplicate would fan the
    # left joins out 2x per repeat, duplicating batch rows
    bits = bits.select("pos").distinct()
    out = batch
    cond = F.lit(True)
    for i, p in enumerate(pos):
        side = F.broadcast(
            bits.select(F.col("pos").alias(f"_p{i}"))
            .withColumn(f"_h{i}", F.lit(1)))
        out = (out.withColumn(f"_p{i}", p)
               .join(side, f"_p{i}", "left")
               .drop(f"_p{i}"))
        cond = cond & F.col(f"_h{i}").isNotNull()
    return out.withColumn(out_col, cond) \
        .drop(*[f"_h{i}" for i in range(n_hashes)])


def bloom_dedup_against(batch: DataFrame, reference: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_bits: int = 1 << 20, n_hashes: int = 4,
                        normalize: bool = True) -> DataFrame:
    """Incremental dedup through the Bloom filter: keep batch documents
    DEFINITELY not in the reference (no false negatives — every true
    duplicate is dropped; a ~fp fraction of genuinely-new documents is
    over-dropped, the standard crawl-filtering trade: at 100 TB a
    digest anti-join shuffles the full digest space every ingest, while
    the bits relation broadcasts once and the batch never shuffles)."""
    seen = with_bloom_seen(
        batch, bloom_bits(reference, text_col, n_bits, n_hashes,
                          normalize),
        id_col, text_col, n_bits, n_hashes, normalize)
    return seen.filter(~F.col("bloom_maybe_seen")) \
        .drop("bloom_maybe_seen")


def _digest(col, normalize: bool):
    """Normalized-text md5 digest — the dedup_against key, shared."""
    if normalize:
        col = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.md5(col)


# ---------------------------------------------------------------- shingles

def _shingle_rows(df: DataFrame, id_col: str, text_col: str,
                  n: int) -> DataFrame:
    """(id, gh) — one row per DISTINCT char n-gram of the normalized text,
    shingle hashed to long.  explode + substring + distinct: every step is
    codegen-friendly (no higher-order functions, no per-row array ops)."""
    return (df
            .select(F.col(id_col).alias("id"),
                    F.lower(F.regexp_replace(F.trim(F.col(text_col)),
                                             r"\s+", " ")).alias("t"))
            .filter(F.length("t") >= n)
            .select("id",
                    F.expr(f"explode(sequence(1, length(t) - {n - 1}))")
                    .alias("pos"), "t")
            .select("id", F.xxhash64(F.expr(f"substring(t, pos, {n})"))
                    .alias("gh"))
            .distinct())


def _cap_doc_freq(shingles: DataFrame, max_doc_freq: int | None) -> DataFrame:
    """Drop shingles appearing in more than `max_doc_freq` documents.

    The 100 TB skew guard: the per-shingle self-join downstream emits one
    row per doc-pair sharing the shingle, so a stopword-like shingle present
    in k documents produces O(k²) candidate rows — at corpus scale a single
    hot shingle (" th", "ing") is a shuffle-partition bomb.  Hot shingles
    carry ~no Jaccard signal (they discriminate nothing), so dropping them
    bounds per-key join fan-out at max_doc_freq² while barely moving the
    similarity estimate — the standard document-frequency filter from the
    MinHash/shingling literature.

    `shingles` rows are distinct per (id, gh), so count(*) per gh IS the
    document frequency.  The hot-shingle relation is tiny (only the offenders)
    → AQE turns the anti-join into a broadcast at runtime.

    A document whose shingles are ALL hot drops out of the relation entirely
    (no candidate pairs, no signature) — it is indistinguishable from pure
    boilerplate at the chosen cap; exact_dedup still covers byte-identical
    copies of it.
    """
    if max_doc_freq is None:
        return shingles
    if max_doc_freq < 1:
        raise ValueError(f"max_doc_freq must be >= 1, got {max_doc_freq}")
    hot = (shingles.groupBy("gh").agg(F.count("*").alias("doc_freq"))
           .filter(F.col("doc_freq") > max_doc_freq)
           .select("gh"))
    return shingles.join(hot, "gh", "left_anti")


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gh) — one row per DISTINCT lowercase whitespace token,
    hashed to long.  The word-granularity twin of `_shingle_rows`: word
    tokens draw from an unbounded space with Zipfian document
    frequency, which is what prefix filtering needs (char 3-grams top
    out at 46k possible values, so at corpus scale EVERY char gram is
    hot and no frequency-ordered scheme can discriminate).
    Tokenization is text._words — THE single canonical definition every
    operator and value oracle mirrors (local import to keep the module
    graph acyclic)."""
    from flood_data_spark.datapipe.text import _words

    return (df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(
            _words(F.col(text_col)))).alias("tok"))
        .select("id", F.xxhash64("tok").alias("gh")))


def _jaccard_pairs_from(shingles: DataFrame,
                        threshold: float) -> DataFrame:
    """All (id_a < id_b, jaccard >= threshold) pairs from a DISTINCT
    (id, gh) shingle relation via the direct per-shingle self-join —
    the shared verify-everything core of `ngram_jaccard_pairs` and
    `token_jaccard_pairs`.  Caller caches `shingles` (three consumers)."""
    counts = shingles.groupBy("id").agg(F.count("*").alias("n_grams"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    pair_common = (
        a.join(b, (F.col("a.gh") == F.col("b.gh"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    ca = counts.select(F.col("id").alias("id_a"),
                       F.col("n_grams").alias("na"))
    cb = counts.select(F.col("id").alias("id_b"),
                       F.col("n_grams").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    # plain equi-joins: `counts` is one row per corpus document, so a
    # broadcast would collect the whole corpus's ids to the driver
    return (pair_common
            .join(ca, "id_a").join(cb, "id_b")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def token_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.8,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Word-token Jaccard pairs via the direct all-shingle self-join —
    the brute baseline `jaccard_prefix_pairs(shingle='word')` must
    equal; per-key fan-out is doc-frequency² (a stopword touches every
    document), so at scale run it capped or switch to the prefix
    form."""
    shingles = _cap_doc_freq(
        _token_rows(df, id_col, text_col), max_doc_freq).cache()
    return _jaccard_pairs_from(shingles, threshold)


def char_shingles(text_col, n: int = 3) -> Column:
    """Distinct character n-grams of the normalized text (array<string>).
    Column-level variant for small inputs / tests; the distributed operators
    use _shingle_rows (row form) instead."""
    normalized = F.lower(F.regexp_replace(F.trim(text_col), r"\s+", " "))
    idx = F.sequence(F.lit(0), F.greatest(F.length(normalized) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: normalized.substr(i + 1, F.lit(n)))
    return F.array_distinct(F.filter(grams, lambda g: F.length(g) == n))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        max_doc_freq: int | None = None) -> DataFrame:
    """All (id_a < id_b) pairs with char-n-gram Jaccard >= threshold.

    Jaccard = |∩| / (|A| + |B| - |∩|); only pairs sharing >= 1 shingle are
    ever materialized.

    max_doc_freq (None = off): drop shingles present in more than that many
    documents before the self-join — see `_cap_doc_freq`.  With the cap on,
    both the intersection AND the per-doc gram counts are over the capped
    shingle sets, i.e. the score is the Jaccard of the *discriminative*
    shingles.  At 100 TB run with a cap always; the uncapped mode exists as
    the exact oracle baseline.
    """
    shingles = _cap_doc_freq(
        _shingle_rows(df, id_col, text_col, n), max_doc_freq).cache()
    return _jaccard_pairs_from(shingles, threshold)


def jaccard_prefix_pairs(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 3,
                         threshold: float = 0.8,
                         max_doc_freq: int | None = None,
                         shingle: str = "word") -> DataFrame:
    """All (id_a < id_b) pairs with shingle-set Jaccard >= threshold —
    IDENTICAL output to `token_jaccard_pairs` (shingle='word', the
    default) or `ngram_jaccard_pairs` (shingle='char', char n-grams),
    via prefix-filtered candidate generation (the PPJoin/AllPairs
    family, Bayardo et al. WWW'07; Xiao et al. ICDE'08).

    Order every document's shingles by ascending global document
    frequency (rarest first, hash tie-break) and self-join ONLY each
    document's first |s| - floor(t*|s|) + 1 shingles: two sets with
    Jaccard >= t must overlap within these prefixes (pigeonhole over
    any consistent global order), so the filter is LOSSLESS — the gate
    oracle for this operator is the brute-force Jaccard SQL itself.
    The floor form over-lengthens the theoretical |s| - ceil(t*|s|) + 1
    prefix by at most one, keeping the bound safe under float rounding.

    Why this beats the doc-freq cap as the 100 TB candidate path: the
    cap DROPS hot shingles (changing the score to capped-set Jaccard);
    the prefix filter instead makes hot shingles structurally IRRELEVANT
    — a stopword ranks last in every document's frequency order and
    never enters a prefix, so the join key distribution is
    rare-shingle-shaped with per-key fan-out bounded by the shingles'
    prefix document frequency, while the final scores remain the exact
    full-set Jaccard.  Measured on a 3,000-doc Zipf corpus (stopword
    head in every doc, rare tails) at t=0.8: 600 candidate pairs vs
    4,498,500 for the all-shingle join — and the 600 ARE the output.
    Candidates are verified exactly against the full shingle relation
    before thresholding.  The two compose: pass max_doc_freq to also
    cap (then scores are capped-set Jaccard, as in the brute twins).

    shingle='word' is the default and the scale mode: word tokens draw
    from an unbounded Zipfian space.  shingle='char' (n-grams, matching
    `ngram_jaccard_pairs`) exists for parity but saturates — there are
    only 46k possible 3-grams, so beyond a few hundred documents every
    gram is frequent, prefixes stop discriminating, and the verification
    fan-out approaches all-pairs; prefer 'word' or a doc-freq cap there.

    Plan: shingle doc-freq groupBy (key-space-bounded, map-side
    partials), one per-document rank window (partitioned by id — never
    global), the prefix self-join (shingle-keyed), then a
    candidate-bounded verification join back to the shingle relation.
    No all-pairs relation ever materializes.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(
            f"threshold must be in (0, 1], got {threshold}")
    if shingle not in ("word", "char"):
        raise ValueError(
            f"shingle must be 'word' or 'char', got {shingle!r}")
    rows = (_token_rows(df, id_col, text_col) if shingle == "word"
            else _shingle_rows(df, id_col, text_col, n))
    shingles = _cap_doc_freq(rows, max_doc_freq).cache()
    freq = shingles.groupBy("gh").agg(F.count(F.lit(1)).alias("gdf"))
    by_id = Window.partitionBy("id")
    ranked = (shingles.join(freq, "gh")
              .select("id", "gh",
                      F.row_number().over(
                          by_id.orderBy(F.col("gdf").asc(),
                                        F.col("gh").asc())).alias("rn"),
                      F.count(F.lit(1)).over(by_id).alias("sz")))
    prefix = (ranked.filter(
        F.col("rn") <= F.col("sz")
        - F.floor(F.col("sz") * F.lit(threshold)) + 1)
        .select("id", "gh"))
    cand = (prefix.alias("pa")
            .join(prefix.alias("pb"),
                  (F.col("pa.gh") == F.col("pb.gh"))
                  & (F.col("pa.id") < F.col("pb.id")))
            .select(F.col("pa.id").alias("id_a"),
                    F.col("pb.id").alias("id_b"))
            .distinct())
    counts = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    sa = shingles.select(F.col("id").alias("id_a"), "gh")
    sb = shingles.select(F.col("id").alias("_idb"),
                         F.col("gh").alias("ghb"))
    common = (cand.join(sa, "id_a")
              .join(sb, (F.col("id_b") == F.col("_idb"))
                    & (F.col("gh") == F.col("ghb")))
              .groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).alias("common")))
    ca = counts.select(F.col("id").alias("id_a"),
                       F.col("n_grams").alias("na"))
    cb = counts.select(F.col("id").alias("id_b"),
                       F.col("n_grams").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (common.join(ca, "id_a").join(cb, "id_b")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def ngram_jaccard_join(left: DataFrame, right: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 3, threshold: float = 0.8,
                       max_doc_freq: int | None = None) -> DataFrame:
    """Cross-relation n-gram Jaccard similarity join: all (id_l, id_r)
    pairs with char-n-gram Jaccard >= threshold, one doc from each side —
    batch-vs-corpus near-dedup and fuzzy decontamination (where
    `ngram_containment` flags gram overlap, this scores whole-document
    similarity).

    Same candidate-generation shape as the self-join variant
    (`ngram_jaccard_pairs`): per-shingle equi-join on the hashed gram —
    never a cross product — with the shared document-frequency cap
    (`_cap_doc_freq`) applied to EACH side's shingle relation (a hot
    shingle in k_l x k_r documents emits k_l*k_r candidate rows on one
    key; the cap bounds both factors).
    """
    ls = _cap_doc_freq(_shingle_rows(left, id_col, text_col, n),
                       max_doc_freq).cache()
    rs = _cap_doc_freq(_shingle_rows(right, id_col, text_col, n),
                       max_doc_freq).cache()
    lc = ls.groupBy("id").agg(F.count("*").alias("nl"))
    rc = rs.groupBy("id").agg(F.count("*").alias("nr"))

    common = (ls.alias("l")
              .join(rs.alias("r"), F.col("l.gh") == F.col("r.gh"))
              .groupBy(F.col("l.id").alias("id_l"),
                       F.col("r.id").alias("id_r"))
              .agg(F.count("*").alias("common")))
    jac = F.col("common") / (F.col("nl") + F.col("nr") - F.col("common"))
    return (common
            .join(lc.select(F.col("id").alias("id_l"), "nl"), "id_l")
            .join(rc.select(F.col("id").alias("id_r"), "nr"), "id_r")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_l", "id_r", "jaccard"))


# ---------------------------------------------------------------- minhash

def _minhash_cols(df: DataFrame, id_col: str, text_col: str, n: int,
                  num_hashes: int,
                  max_doc_freq: int | None = None) -> DataFrame:
    """(id, m0..m{K-1}): MinHash values as K min-aggregates over the
    (id, shingle-hash) rows — one shuffle, fully codegen.  max_doc_freq
    drops hot shingles first (`_cap_doc_freq`)."""
    shingles = _cap_doc_freq(
        _shingle_rows(df, id_col, text_col, n), max_doc_freq)
    aggs = [F.min(F.xxhash64("gh", F.lit(s))).alias(f"m{s}")
            for s in range(num_hashes)]
    return shingles.groupBy("id").agg(*aggs)


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 64,
                       max_doc_freq: int | None = None) -> DataFrame:
    """(id, signature: array<long>) MinHash signature per document."""
    wide = _minhash_cols(df, id_col, text_col, n, num_hashes, max_doc_freq)
    return wide.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)])
        .alias("signature"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 64, bands: int = 16,
                      min_band_matches: int = 1,
                      max_doc_freq: int | None = None) -> DataFrame:
    """LSH banding over MinHash signatures → candidate near-dup pairs.

    Docs agreeing on all rows of >= min_band_matches bands become candidates;
    the search is an equi-join on (band_idx, band_hash) — scales with true
    collisions, not n².  max_doc_freq caps hot shingles before signature
    computation (`_cap_doc_freq`): boilerplate-only band collisions (every
    doc sharing a site header hashing into the same bucket → O(k²) pairs)
    disappear at the source.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}); trailing hashes would be silently unused")
    rows_per_band = num_hashes // bands
    wide = _minhash_cols(df, id_col, text_col, n, num_hashes, max_doc_freq)

    band_hashes = [
        F.xxhash64(*[F.col(f"m{b * rows_per_band + r}")
                     for r in range(rows_per_band)])
        for b in range(bands)]
    banded = (wide
              .select("id", F.posexplode(F.array(*band_hashes))
                      .alias("band_idx", "band_hash"))
              .cache())

    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("band_matches"))
            .filter(F.col("band_matches") >= min_band_matches))


# ---------------------------------------------------------------- simhash

def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Per token, xxhash64 gives 64 bits; each bit votes +1/-1; signature bit b
    is 1 iff the vote sum > 0.  Expressed as explode over bit positions +
    groupBy-sum (narrow rows), then bit reassembly — no UDF.
    """
    toks = (df
            .select(F.col(id_col).alias("id"),
                    F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
                    .alias("tok"))
            .filter(F.col("tok") != "")
            .select("id", F.xxhash64("tok").alias("h")))

    # one row per (id, bit) with summed votes; shift amounts must be Python
    # ints (the shiftleft/shiftright column API takes literal counts)
    bit_votes = (toks
                 .select("id",
                         F.posexplode(F.array(*[
                             F.when(F.shiftright(F.col("h"), b)
                                    .bitwiseAND(F.lit(1)) == 1,
                                    F.lit(1)).otherwise(F.lit(-1))
                             for b in range(bits)]))
                         .alias("bit", "vote"))
                 .groupBy("id", "bit")
                 .agg(F.sum("vote").alias("votes")))

    weight = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
    sigs = (bit_votes
            .groupBy("id")
            .agg(F.sum(F.when(F.col("votes") > 0, weight)
                       .otherwise(F.lit(0).cast("long"))).alias("simhash")))
    # token-free documents (empty/blank text) produce no vote rows; keep
    # them with the all-zero signature so dedup coverage matches
    # exact_dedup.  `has_tokens` records blankness EXPLICITLY — a
    # signature of 0 does not imply blank (a real document's bit votes can
    # all land <= 0), so downstream filters must use the flag, never the
    # signature value.
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return (all_ids.join(sigs, "id", "left")
            .withColumn("has_tokens", F.col("simhash").isNotNull())
            .na.fill({"simhash": 0}))


def simhash_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_hamming: int = 3,
                      chunks: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole: with `chunks` signature chunks and max_hamming < chunks, any
    qualifying pair agrees exactly on >= 1 chunk → candidates via equi-join
    on (chunk_idx, chunk_value), then exact popcount verify.
    """
    if max_hamming >= chunks:
        raise ValueError(
            f"pigeonhole requires max_hamming ({max_hamming}) < chunks "
            f"({chunks}): a pair can differ in every chunk and still "
            "qualify, so candidates would be silently missed")
    # exclude token-free/blank docs from the pairwise path: b blank docs
    # all collide on every chunk → O(b²) pair explosion, and they are
    # byte-identical anyway — exact_dedup's job.  Filter on the explicit
    # blankness flag, NOT on simhash == 0: a real document's votes can
    # legitimately produce the zero signature, and its near-duplicates
    # must still be found.
    sigs = (simhash(df, id_col, text_col)
            .filter(F.col("has_tokens"))
            .drop("has_tokens")
            .cache())
    bits_per_chunk = 64 // chunks
    mask = (1 << bits_per_chunk) - 1

    chunked = (sigs
               .select("id", "simhash",
                       F.posexplode(F.array(*[
                           F.shiftright(F.col("simhash"), c * bits_per_chunk)
                           .bitwiseAND(F.lit(mask))
                           for c in range(chunks)]))
                       .alias("chunk_idx", "chunk_val")))
    a = chunked.alias("a")
    b = chunked.alias("b")
    cand = (a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
                   & (F.col("a.chunk_val") == F.col("b.chunk_val"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("a.simhash").alias("sig_a"),
                    F.col("b.simhash").alias("sig_b"))
            .distinct())
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (cand
            .withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Snapshot diff between two corpus versions: per id, `added` /
    `removed` / `changed` / `unchanged` by content digest — the audit step
    before shipping a refreshed training corpus (how much churned, what to
    re-embed / re-dedup incrementally).

    Digest-only full outer join: text never shuffles, one md5 per side —
    the same at-scale discipline as `dedup_against`.  Output: (id, status,
    old_digest, new_digest).

    Presence is tracked by explicit per-side flags, NOT digest nullness:
    a row present with NULL text has a NULL digest but is still present —
    two NULL-text versions of a doc are `unchanged`, a NULL-text -> real
    text transition is `changed`.
    """
    o = old.select(F.col(id_col).alias("_id"),
                   F.md5(F.col(text_col)).alias("old_digest"),
                   F.lit(True).alias("_in_old"))
    n = new.select(F.col(id_col).alias("_id"),
                   F.md5(F.col(text_col)).alias("new_digest"),
                   F.lit(True).alias("_in_new"))
    status = (F.when(F.col("_in_old").isNull(), "added")
              .when(F.col("_in_new").isNull(), "removed")
              .when(F.col("old_digest").eqNullSafe(F.col("new_digest")),
                    "unchanged")
              .otherwise("changed"))
    return (o.join(n, "_id", "full_outer")
            .select(F.col("_id").alias(id_col), status.alias("status"),
                    "old_digest", "new_digest"))


# ---------------------------------------------------- contamination

def ngram_containment(candidates: DataFrame, reference: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 8) -> DataFrame:
    """Per candidate document: the fraction of its distinct char n-grams
    that appear ANYWHERE in the reference corpus — the decontamination
    check (flag/drop training documents that contain evaluation data).

    containment(c) = |grams(c) ∩ grams(ref)| / |grams(c)|; returns
    (doc_id, n_grams, n_matched, containment) for every candidate with at
    least one n-gram (documents shorter than n characters have no grams and
    no row — nothing to leak).

    Plan: reference grams collapse to a DISTINCT hashed set once (narrow —
    one long per gram, not the text), candidates left-semi join against it
    per gram, then two counts per doc.  No pairwise doc×doc work at all:
    cost is linear in total gram volume, which is what lets the check run
    train-corpus-wide instead of per (train, eval) document pair.
    """
    cand = _shingle_rows(candidates, id_col, text_col, n).cache()
    ref = _shingle_rows(reference, id_col, text_col, n).select("gh").distinct()
    total = cand.groupBy("id").agg(F.count("*").alias("n_grams"))
    matched = (cand.join(ref, "gh", "left_semi")
               .groupBy("id").agg(F.count("*").alias("n_matched")))
    return (total.join(matched, "id", "left")
            .na.fill({"n_matched": 0})
            .select(F.col("id").alias(id_col), "n_grams", "n_matched",
                    F.round(F.col("n_matched") / F.col("n_grams"), 6)
                    .alias("containment")))


# ------------------------------------------------ repeated substrings

def _span_relation(df: DataFrame, window: int, id_col: str,
                   text_col: str, min_distinct_docs: int):
    """Shared FIND core of the exact-substring pair: (toks, spans, dup) —
    NULL-safe tokenization (NULL text = zero tokens, not size(NULL) = -1),
    one md5 per start position, and the duplicated-span hash set.
    `repeated_span_stats` and `remove_repeated_spans` MUST tokenize and
    hash bit-identically (the stats/removal parity invariant
    n_tokens - n_tokens_kept == n_dup_tokens depends on it), so both
    consume this single definition."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = df.select(
        F.col(id_col).alias("id"),
        F.when(F.trim(txt) == "",
               F.expr("array()").cast("array<string>"))
        .otherwise(F.split(F.trim(txt), r"\s+")).alias("ts"))
    n_spans = F.greatest(F.size("ts") - window + 1, F.lit(0))
    spans = (toks
             .withColumn("_n", n_spans)
             .filter(F.col("_n") >= 1)
             .select("id", "ts",
                     F.explode(F.sequence(F.lit(1), F.col("_n")))
                     .alias("pos"))
             .select("id", "pos",
                     F.md5(F.array_join(
                         F.expr(f"slice(ts, pos, {window})"), " "))
                     .alias("h")))
    dup = (spans.groupBy("h")
           .agg(F.count_distinct("id").alias("_nd"))
           .filter(F.col("_nd") >= min_distinct_docs)
           .select("h"))
    return toks, spans, dup


def repeated_span_stats(df: DataFrame, window: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        min_distinct_docs: int = 2) -> DataFrame:
    """Exact substring-duplication signal (the token-window form of Lee et
    al. 2022's exact substring dedup): for each document, how much of it is
    covered by `window`-token spans that ALSO occur in at least
    `min_distinct_docs` distinct documents — the boilerplate/mirror signal
    MinHash-style whole-document similarity cannot see (two long documents
    sharing one paragraph have tiny Jaccard but that paragraph still
    memorizes).

    Output, one row per input document: (id, n_tokens, n_dup_spans — span
    START positions whose window is cross-document duplicated, n_dup_tokens
    — distinct token positions covered by such spans, dup_fraction).

    Plan (linear, never pairwise): explode each document into its rolling
    token windows (one md5 per start position), one groupBy over span
    hashes keeps those meeting the distinct-doc floor (hot boilerplate
    spans are a COUNT per hash here, never a pair join — the fan-out bomb
    the jaccard cap guards against cannot exist in this operator), join the
    hits back, and cover-count distinct positions per document.  Cost is
    O(total tokens) rows through two hash shuffles; suffix-array maximal
    matches are the single-node refinement, this is the distributable form.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks, spans, dup = _span_relation(df, window, id_col, text_col,
                                      min_distinct_docs)
    hits = spans.join(dup, "h", "left_semi")
    # both stats from ONE consumption of hits (no cache to pin, nothing
    # recomputed): explode each hit span into its covered positions —
    # distinct `pos` values among the exploded rows are exactly the span
    # starts, distinct `p` values the covered tokens
    stats = (hits
             .select("id", "pos", F.explode(
                 F.sequence(F.col("pos"),
                            F.col("pos") + F.lit(window - 1))).alias("p"))
             .groupBy("id")
             .agg(F.count_distinct("pos").alias("n_dup_spans"),
                  F.count_distinct("p").alias("n_dup_tokens")))
    return (toks.select("id", F.size("ts").cast("long").alias("n_tokens"))
            .join(stats, "id", "left")
            .na.fill({"n_dup_spans": 0, "n_dup_tokens": 0})
            .select(F.col("id").alias(id_col),
                    "n_tokens",
                    F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
                    F.col("n_dup_tokens").cast("long").alias("n_dup_tokens"),
                    F.round(F.col("n_dup_tokens")
                            / F.greatest(F.col("n_tokens"), F.lit(1)), 6)
                    .alias("dup_fraction")))


# ---------------------------------------------------- dedup clusters

def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                   max_iterations: int = 20) -> DataFrame:
    """Connected components over a near-dup pair relation → one cluster id
    per document: the step that turns pairwise similarity (from
    `ngram_jaccard_pairs` / `minhash_lsh_pairs` / `simhash_dup_pairs` /
    `embedding_near_dup_pairs`) into an actual keep/drop decision
    (keep = the min-id representative of each cluster).

    Iterative min-label propagation with pointer jumping: each round every
    node adopts the smallest label among itself and its neighbors, then
    jumps to its label's label (doubling) — O(log component-diameter)
    rounds, each a narrow (id, label) shuffle.  `localCheckpoint` truncates
    the lineage every round (without it the iterated plan grows
    exponentially and the driver stack-overflows before round 20).

    Returns (doc_id, cluster_id) for every node appearing in `pairs`,
    cluster_id = min doc_id of the component.
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .unionByName(pairs.select(F.col(id_b).alias("src"),
                                       F.col(id_a).alias("dst")))
             .distinct()
             .localCheckpoint(eager=True))
    # size the iteration's shuffles to the GRAPH, not the session default:
    # a near-dup pair graph is orders of magnitude smaller than the corpus
    # (that is the point of dedup), and each of the O(log d) rounds runs
    # ~4 shuffles — at the session's corpus-sized partition count a small
    # graph pays hundreds of empty-task launches per call (measured: 42 s
    # -> ~15 s at sf0.01 for the leakage-safe-split composition).  The
    # eager checkpoint above already computed edges, so the count is a
    # cached-metadata action, not an extra scan.
    n_edges = edges.count()
    parallelism = edges.sparkSession.sparkContext.defaultParallelism
    n_parts = max(1, min(parallelism, n_edges // 10_000 + 1))
    edges = edges.repartition(n_parts, "dst").localCheckpoint(eager=True)
    labels = (edges.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("label", F.col("node")))

    for _ in range(max_iterations):
        neighbor_min = (edges
                        .join(labels, edges.dst == labels.node)
                        .groupBy("src").agg(F.min("label").alias("nmin")))
        updated = (labels
                   .join(neighbor_min, labels.node == neighbor_min.src, "left")
                   .select("node",
                           F.least("label", F.coalesce("nmin", "label"))
                           .alias("label")))
        # pointer jumping: adopt the current label of your label
        jump = updated.select(F.col("node").alias("pnode"),
                              F.col("label").alias("plabel"))
        updated = (updated
                   .join(jump, updated.label == jump.pnode, "left")
                   .select("node",
                           F.least("label", F.coalesce("plabel", "label"))
                           .alias("label"))
                   .localCheckpoint(eager=True))
        changed = (updated.alias("u")
                   .join(labels.alias("l"), "node")
                   .filter(F.col("u.label") != F.col("l.label"))
                   .limit(1).count())
        labels = updated
        if changed == 0:
            break
    else:
        # with pointer jumping 20 rounds cover component diameters beyond
        # 2^20 — exhausting them means something is wrong; returning the
        # unconverged labels would silently keep several "representatives"
        # per cluster
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iterations} "
            "iterations; raise max_iterations or inspect the pair graph")
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def remove_repeated_spans(df: DataFrame, window: int = 8,
                          id_col: str = "doc_id", text_col: str = "text",
                          min_distinct_docs: int = 2,
                          out_col: str = "clean_text",
                          keep: str = "none") -> DataFrame:
    """Exact substring dedup, REMOVAL step — completes Lee et al. 2022's
    pipeline: `repeated_span_stats` finds cross-document duplicated
    `window`-token spans, this rewrites each document with every token
    covered by one removed.

    Policy (`keep`): "none" drops ALL occurrences of a duplicated span
    (the conservative memorization cut — duplicated boilerplate
    contributes nothing wherever it stands); "first" is the paper's
    keep-one-occurrence form — a position is removed only when covered by
    an occurrence that is NOT its span's first (by (id, pos) order)
    corpus-wide.  The "first" window partitions by span hash, so a
    boilerplate span in k documents puts k narrow rows in one partition —
    the same bounded skew class as dedup_lines' first-occurrence window
    (cap hot spans upstream if k explodes).

    Returns (id_col, n_tokens, n_tokens_kept, out_col), one row per input
    document (empty clean_text when everything was removed).

    Plan: the SAME linear span relation as repeated_span_stats (one md5
    per start position, a count per span hash — hot boilerplate is a
    count here, never a pair join), semi-joined back, exploded to
    covered (id, position) pairs, anti-joined against the posexploded
    token relation, and reassembled with one groupBy(id) + array_sort on
    (pos, term) — deterministic regardless of collect_list order (the
    dedup_lines rebuild shape).  Cost is O(total tokens) through three
    hash shuffles; the id-keyed reassembly is the unavoidable price of
    distributed text surgery.  Fully ANSI (md5 is engine-portable), so
    q_remove_spans value-hashes the rewritten text itself.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    toks, spans, dup = _span_relation(df, window, id_col, text_col,
                                      min_distinct_docs)
    dup_occ = spans.join(dup, "h", "left_semi")
    if keep == "first":
        w = Window.partitionBy("h").orderBy("id", "pos")
        dup_occ = (dup_occ.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") > 1)
                   .drop("_rn"))
    covered = (dup_occ
               .select("id", F.explode(
                   F.sequence(F.col("pos"),
                              F.col("pos") + F.lit(window - 1)))
                   .alias("p"))
               .distinct())
    tokens = (toks
              .select("id", F.posexplode("ts").alias("p0", "term"))
              .select("id", (F.col("p0") + 1).alias("p"), "term"))
    kept = tokens.join(covered, ["id", "p"], "left_anti")
    rebuilt = (kept.groupBy("id")
               .agg(F.count("*").alias("n_tokens_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("p", "term"))),
                            lambda x: x["term"]),
                        " ").alias(out_col)))
    return (toks.select("id", F.size("ts").cast("long").alias("n_tokens"))
            .join(rebuilt, "id", "left")
            .na.fill({"n_tokens_kept": 0})
            .na.fill({out_col: ""})
            .select(F.col("id").alias(id_col), "n_tokens",
                    F.col("n_tokens_kept").cast("long")
                    .alias("n_tokens_kept"),
                    out_col))


def soft_dedup_weights(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       normalize: bool = True) -> DataFrame:
    """Soft deduplication — downweight, don't drop (the SoftDeDup /
    duplication-aware-sampling convention: each DISTINCT text should
    contribute unit mass to the training mixture regardless of how
    many times the crawl caught it, so a document in a duplicate
    group of n samples at weight 1/n instead of being deleted —
    preserving the signal that duplicated text is often higher
    quality, without the n× gradient overcount).

    weight = the exact integer ratio round(1e6/n_copies)/1e6 — the
    `_idiv_half_up` convention, engine-portable.  Returns every input
    id: (id, n_copies, weight), one row per document.

    Scale posture: the [exact_dedup] digest groupBy (text never
    shuffles — only (digest, id) pairs move) + ONE digest-keyed
    equi-join of the counts back onto the id relation, both sides
    co-partitioned on the digest.  At 100 TB this is two narrow
    shuffles of 16-byte keys."""
    from flood_data_spark.datapipe.linalg import _idiv_half_up

    dec = "decimal(38,0)"
    keyed = df.select(F.col(id_col).alias("id"),
                      _digest(F.col(text_col), normalize).alias("_dk"))
    counts = (keyed.groupBy("_dk")
              .agg(F.count(F.lit(1)).cast("long").alias("n_copies")))
    return (keyed.join(counts, "_dk")
            .select("id", "n_copies",
                    (_idiv_half_up(
                        F.lit(1_000_000).cast(dec),
                        F.col("n_copies").cast(dec)).cast("double")
                     / F.lit(1e6)).alias("weight"))
            .orderBy("id"))


def dedup_keep_best(df: DataFrame, quality_col: str,
                    id_col: str = "doc_id", text_col: str = "text",
                    normalize: bool = True) -> DataFrame:
    """Quality-aware exact dedup — keep the BEST copy, not the first:
    production pipelines keep the highest-quality duplicate (longest
    extraction, cleanest markup, best source) rather than the lowest
    id, because crawl copies of one text differ in surrounding
    boilerplate quality.  Representative = max (quality, then min id
    on ties — deterministic) per exact-duplicate group.

    Exactness: the pick is ONE struct-min aggregate over
    (−quality_micro, id, quality_micro) — no window, no second pass;
    quality compares in quantized micro space so ties are
    engine-portable, and the id is carried verbatim (never negated),
    so ANY orderable id type works — string ids included (negating a
    string id fails under ANSI; numeric-string ids would silently
    come back DOUBLE).  NULL quality is coalesced to a losing
    sentinel in the sort key: a NULL-quality copy is picked only
    when the whole group is NULL-quality (then min id wins and
    rep_quality is NULL).
    Returns (dup_key, rep_id, rep_quality, n_copies), the
    [exact_dedup] shape plus the winning quality.

    Scale posture: identical to [exact_dedup] — the digest groupBy
    moves (digest, id, quality_micro) triples, never text."""
    qc = F.col(quality_col).cast("double")
    qq = (F.signum(qc) * F.floor(F.abs(qc) * F.lit(1_000_000)
                                 + F.lit(0.5))).cast("long")
    keyed = df.select(_digest(F.col(text_col), normalize)
                      .alias("dup_key"),
                      F.col(id_col).alias("_id"), qq.alias("_qq"))
    best = F.min(F.struct(
        F.coalesce(-F.col("_qq"),
                   F.lit(9223372036854775807).cast("long")).alias("nq"),
        F.col("_id").alias("id"),
        F.col("_qq").alias("q")))
    return (keyed.groupBy("dup_key")
            .agg(best.alias("_b"),
                 F.count(F.lit(1)).cast("long").alias("n_copies"))
            .select("dup_key", F.col("_b.id").alias("rep_id"),
                    (F.col("_b.q").cast("double") / F.lit(1e6))
                    .alias("rep_quality"),
                    "n_copies"))

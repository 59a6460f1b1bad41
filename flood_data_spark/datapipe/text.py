"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage-codegen friendly) — no
Python UDFs, so they stream through a 100 TB `documents` scan at parquet
speed and every one is DuckDB-oracle comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic.  Word-boundary regexes keep the count semantics identical in
# Spark and ANSI-SQL oracles.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def _nn(text_col) -> Column:
    """NULL-safe text: coalesce to ''.  Every raw-text entry point routes
    through this so a NULL document behaves as an empty one (0 tokens,
    empty word array) instead of poisoning counts with NULL/-1 semantics
    (`size(split(NULL))`).  Mirrors the explicit guard in
    dedup._span_relation."""
    return F.coalesce(text_col, F.lit(""))


def _words(text_col) -> Column:
    """Filtered lowercase word array — trim, lowercase, whitespace split,
    empty tokens dropped, NULL-safe via _nn.  THE tokenization every
    operator and every value oracle mirrors; keep the three consumers
    (Gopher rules, bigram LM, n-gram diversity) on this single
    definition."""
    return F.filter(F.split(F.lower(F.trim(_nn(text_col))), r"\s+"),
                    lambda w: w != "")


def token_count(text_col) -> Column:
    """Whitespace token count; empty/blank/NULL strings count 0 tokens."""
    t = F.trim(_nn(text_col))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")


def with_token_count(df: DataFrame, text_col: str = "text",
                     out_col: str = "n_tokens") -> DataFrame:
    return df.withColumn(out_col, token_count(F.col(text_col)))


# BPE-ish pre-tokenizer: runs of letters, runs of digits, runs of other
# non-space symbols — each optionally glued to one leading space (the GPT-2
# pre-tokenization shape).  Kept to ASCII classes so the Java-regex (Spark)
# and RE2 (oracle) interpretations coincide exactly.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text_col) -> Column:
    """Subword-proxy token count via the BPE-ish pre-tokenizer regex — the
    cheap estimator of LLM token cost a training pipeline budgets with
    (true BPE needs a merges table; the pre-tokenizer count is its upper
    bound and is fully vectorizable JVM-side)."""
    return F.regexp_count(_nn(text_col), F.lit(BPE_ISH_PATTERN)).cast("long")


def with_bpe_token_count(df: DataFrame, text_col: str = "text",
                         out_col: str = "n_bpe_tokens") -> DataFrame:
    return df.withColumn(out_col, bpe_token_count(F.col(text_col)))


def _marker_hits(text_col, words) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.regexp_count(_nn(text_col), F.lit(pat))


def with_lang_id(df: DataFrame, text_col: str = "text",
                 out_col: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID: count marker-word hits per language,
    argmax with deterministic tie-break (markers order), 'und' (undetermined)
    when nothing matches."""
    hits = {lang: _marker_hits(F.col(text_col), words)
            for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = deterministic priority
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return df.withColumn(out_col, expr)


def with_quality_signals(df: DataFrame, text_col: str = "text",
                         prefix: str = "q_") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals + a composite
    score in [0, 1].  Heuristics in the spirit of C4/Gopher text filters."""
    t = _nn(F.col(text_col))
    n_chars = F.length(t).cast("double")
    n_tokens = token_count(t).cast("double")
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]")).cast("double")
    n_alpha = F.regexp_count(t, F.lit(r"[A-Za-z]")).cast("double")
    n_stop = _marker_hits(t, LANG_MARKERS["en"]).cast("double")

    safe_chars = F.greatest(n_chars, F.lit(1.0))
    safe_tokens = F.greatest(n_tokens, F.lit(1.0))
    alpha_ratio = n_alpha / safe_chars
    punct_ratio = n_punct / safe_chars
    stop_ratio = n_stop / safe_tokens
    mean_token_len = n_chars / safe_tokens

    score = F.round(
        F.least(F.lit(1.0),
                F.lit(0.4) * alpha_ratio
                + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * 5)
                + F.lit(0.2) * F.when((mean_token_len >= 3) & (mean_token_len <= 12),
                                      F.lit(1.0)).otherwise(F.lit(0.0))
                + F.lit(0.1) * F.least(F.lit(1.0), punct_ratio * 20)),
        6)

    return (df
            .withColumn(prefix + "n_chars", n_chars.cast("long"))
            .withColumn(prefix + "n_tokens", n_tokens.cast("long"))
            .withColumn(prefix + "alpha_ratio", F.round(alpha_ratio, 6))
            .withColumn(prefix + "punct_ratio", F.round(punct_ratio, 6))
            .withColumn(prefix + "stop_ratio", F.round(stop_ratio, 6))
            .withColumn(prefix + "score", score))


def term_rows(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, term) — one row per occurrence of each lowercase whitespace
    token.  The long-form relation every corpus-statistics operator
    (vocabulary, doc frequency, TF-IDF) aggregates over; explode is
    row-local, all downstream shuffles move (hashable term, id) only."""
    return (df
            .select(F.col(id_col).alias("id"),
                    F.explode(F.split(F.lower(F.trim(_nn(F.col(text_col)))),
                                      r"\s+")).alias("term"))
            .filter(F.col("term") != ""))


def _doc_frequencies(df: DataFrame, id_col: str, text_col: str):
    """(docfreq, n_docs) for the smoothed-idf family: per-term distinct-
    document counts and the scalar document count — ONE definition shared
    by tfidf_topk and the PRF expansion scorer (same discipline as the
    SQL oracles' shared chains)."""
    docfreq = (term_rows(df, id_col, text_col)
               .select("id", "term").distinct()
               .groupBy("term").agg(F.count("*").alias("df")))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    return docfreq, n_docs


def _smooth_idf(df_col, n_col) -> Column:
    """sklearn's smooth idf: ln((N + 1) / (df + 1)) + 1 — never zero."""
    return F.log((n_col + 1) / (df_col + 1)) + 1


def tfidf_topk(df: DataFrame, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    tf = in-document occurrence count; idf = ln((N + 1) / (df + 1)) + 1
    (sklearn's smooth idf — never zero, no division hazards); returns
    (id, term, tf, tfidf, rank) with rank by tfidf desc, term asc (a full
    deterministic tiebreak so top-k is reproducible).

    Plan: one narrow (id, term) explode feeds BOTH aggregations; doc
    frequency is a per-term count over distinct (id, term); N is a scalar
    broadcast.  Two hash-agg shuffles + one window — no UDF, no collect of
    term space (the vocabulary never concentrates on the driver).
    """
    terms = term_rows(df, id_col, text_col)
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    docfreq, n_docs = _doc_frequencies(df, id_col, text_col)
    scored = (tf.join(docfreq, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn(
                  "tfidf",
                  F.round(F.col("tf")
                          * _smooth_idf(F.col("df"), F.col("n")), 6)))
    w = (Window.partitionBy("id")
         .orderBy(F.desc("tfidf"), F.asc("term")))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "term", "tf", "tfidf", "rank"))


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token ratio
    and most-common-token share — the cheap detector for degenerate /
    keyword-stuffed / looping text that slips past length and language
    filters.

    Returns (id_col, n_tokens, n_distinct, dup_ratio, top_tf, top_ratio);
    token-free documents keep a row with zeros (a blank doc is maximally
    suspicious to a later gate, not invisible).  One explode + two hash
    aggregations — the same narrow (id, term) relation as `tfidf_topk`.
    """
    terms = term_rows(df, id_col, text_col)
    per_term = terms.groupBy("id", "term").agg(F.count("*").alias("c"))
    agg = per_term.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_tf"))
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    out = (all_ids.join(agg, "id", "left")
           .na.fill({"n_tokens": 0, "n_distinct": 0, "top_tf": 0}))
    safe = F.greatest(F.col("n_tokens"), F.lit(1))
    return out.select(
        F.col("id").alias(id_col), "n_tokens", "n_distinct",
        F.round(1 - F.col("n_distinct") / safe, 6).alias("dup_ratio"),
        "top_tf",
        F.round(F.col("top_tf") / safe, 6).alias("top_ratio"))


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized, lower-cased text.
    Whitespace-insensitive exact-dup key (cheap first pass before fuzzy
    dedup)."""
    normalized = F.lower(F.regexp_replace(F.trim(_nn(F.col(text_col))), r"\s+", " "))
    return df.withColumn(out_col, F.md5(normalized))


def winnow_fingerprints(df: DataFrame, k: int = 5, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    the MOSS scheme): (id, pos, fp) with one row per SELECTED k-gram.
    Text is normalized to lowercase alphanumerics (whitespace/punctuation
    insensitive), hashed per character k-gram (52-bit md5 prefix, the
    `sketches._cms_col` portability trick), and each window of `w`
    consecutive gram hashes contributes its minimum — rightmost on ties
    (the paper's basic scheme).  The guarantee that `with_fingerprint`'s
    whole-document hash can't give: any substring match of length
    >= w + k - 1 between two documents shares at least one fingerprint,
    yet expected density is only 2/(w+1) of the grams.

    Plan shape (the 100 TB posture): positions explode one row per
    character — the unavoidable cost of the algorithm, linear and
    shuffle-free — then selection is decided per position from its
    nearest in-range blockers: L = max q < p with h[q] < h[p],
    R = min q > p with h[q] <= h[p] (both within w'-1,
    w' = min(w, n_grams)); p is selected iff SOME window picks it as
    rightmost minimum, i.e. iff a legal window start exists in
    [max(p-w'+1, L+1, 1), min(p, R-w', n-w'+1)].  Because the blocker
    horizon is the CONSTANT w-1, L and R are w-1 lag/lead columns over
    ONE (id, pos) window — a single hash-partition-by-document
    exchange, no self-join, no row blowup.  (The relational
    alternative — explode 2(w-1) offset rows and equi-join back — is
    what the value oracle runs; as a Spark plan it let Catalyst
    broadcast the exploded side, whose size it misestimates by the
    fan-out factor: measured 25 s vs 2 s on a 1.2M-gram corpus.)
    lag/lead return NULL past the document edge, which the coalesce
    defaults absorb, so short documents (w' = n_grams < w, one
    whole-doc window) need no special casing; documents shorter than
    k characters yield no rows.  Keep w modest (<= ~64): the blocker
    scan is w-1 projection columns per direction, linear in w.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")
    base = (df.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(F.lower(_nn(F.col(text_col))),
                         "[^a-z0-9]", "").alias("txt"))
        .select("id", "txt",
                F.greatest(F.length("txt") - k + 1, F.lit(0)).alias("n"))
        .filter(F.col("n") >= 1))
    # r17 (guide §2.3 "shuffle fewer bytes" / §2.5 input skew): the
    # blocker window below must exchange by id ANYWAY, so move that
    # exchange BEFORE the per-character explode — the shuffle then
    # carries the raw normalized text (~1 byte/char) instead of the
    # exploded (id, n, wp, pos, h) gram rows (~40 bytes/char, measured
    # 16 MB -> 1.5 MB at sf0.1), and the per-char md5 ladder runs AFTER
    # the exchange with full reduce-side parallelism instead of
    # serializing in however few scan tasks the input's file layout
    # allows (a one-file corpus ran the whole explode+md5 in ONE task).
    # Window.partitionBy("id") reuses this hash partitioning, adding
    # only the local (id, pos) sort.  The partition count is pinned
    # (defaultParallelism — cluster-derived, not a local constant):
    # AQE sizes post-shuffle partitions by the SHUFFLED bytes, and the
    # raw text is ~40x smaller than the gram rows the next stage
    # explodes it into, so byte-based coalescing re-serializes the
    # fan-out stage (measured: AQE coalesced the 1.5 MB text exchange
    # to ONE task that then ran the whole 40x explode+md5).
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "id")
    grams = base.select(
        "id", "n", F.least(F.lit(w), F.col("n")).alias("wp"),
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("pos"),
        F.col("txt")).select(
        "id", "n", "wp", "pos",
        F.conv(F.substring(F.md5(F.expr(f"substring(txt, pos, {k})")),
                           1, 13), 16, 10).cast("long").alias("h"))
    win = Window.partitionBy("id").orderBy("pos")
    lefts = [F.when(F.lag("h", d).over(win) < F.col("h"),
                    F.col("pos") - d) for d in range(1, w)]
    rights = [F.when(F.lead("h", d).over(win) <= F.col("h"),
                     F.col("pos") + d) for d in range(1, w)]
    lr = grams.select(
        "id", "pos", "h", "wp", "n",
        (lefts[0] if len(lefts) == 1 else F.greatest(*lefts)).alias("L"),
        (rights[0] if len(rights) == 1 else F.least(*rights)).alias("R"))
    selected = lr.filter(
        F.greatest(F.col("pos") - F.col("wp") + 1,
                   F.coalesce(F.col("L") + 1, F.lit(1)), F.lit(1))
        <= F.least(F.col("pos"),
                   F.coalesce(F.col("R") - F.col("wp"), F.col("pos")),
                   F.col("n") - F.col("wp") + 1))
    return selected.select(F.col("id").alias(id_col),
                           F.col("pos").cast("long").alias("pos"),
                           F.col("h").alias("fp"))


def winnow_matches(df: DataFrame, k: int = 5, w: int = 4,
                   min_shared: int = 2, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_doc_freq: int | None = None) -> DataFrame:
    """Document pairs sharing >= min_shared distinct winnowing
    fingerprints: (id_a, id_b, n_shared), id_a < id_b — the MOSS match
    step.  The pair join runs on the SELECTED fingerprints only (expected
    2/(w+1) of the grams), distinct per (id, fp) so within-document
    repeats count once; `max_doc_freq` drops boilerplate fingerprints
    before the self-join (the `dedup._cap_doc_freq` O(k²) fan-out guard
    — same rationale, same relation shape)."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    # cache: fps feeds the hot-fp aggregate, the anti-join probe, and
    # BOTH sides of the pair self-join — uncached, the char explode +
    # lag/lead window re-executes per branch (the dedup.py signature-
    # relation discipline)
    fps = (winnow_fingerprints(df, k=k, w=w, id_col=id_col,
                               text_col=text_col)
           .select(F.col(id_col).alias("id"), "fp").distinct().cache())
    if max_doc_freq is not None:
        if max_doc_freq < 1:
            raise ValueError(
                f"max_doc_freq must be >= 1, got {max_doc_freq}")
        hot = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
               .filter(F.col("df") > max_doc_freq).select("fp"))
        fps = fps.join(hot, "fp", "left_anti")
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (a.join(b, "fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def build_vocab(df: DataFrame, text_col: str = "text",
                max_vocab: int | None = None,
                min_count: int = 1) -> DataFrame:
    """Frequency-ranked vocabulary with deterministic contiguous ids:
    (token, token_id, count), token_id 0-based by (count desc, token asc).

    The explode→groupBy stage partial-aggregates map-side (shuffle carries
    one row per distinct token per partition — vocabulary-bounded).  The
    global ranking window necessarily runs on a single partition, but its
    input is the post-`min_count` VOCABULARY (≤ ~1M narrow rows even at
    100 TB corpora), not the corpus; this is the standard id-assignment
    shape and the only total order in the plan.
    """
    from pyspark.sql import Window

    toks = (df.select(F.explode(
        F.split(F.trim(_nn(F.col(text_col))), r"\s+")).alias("token"))
        .filter(F.col("token") != ""))
    counts = (toks.groupBy("token")
              .agg(F.count(F.lit(1)).alias("count"))
              .filter(F.col("count") >= min_count))
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    vocab = counts.select(
        "token", (F.row_number().over(w) - 1).alias("token_id"), "count")
    if max_vocab is not None:
        vocab = vocab.filter(F.col("token_id") < max_vocab)
    return vocab


def unigram_lm_scores(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      lm_corpus: DataFrame | None = None,
                      alpha: float = 0.5) -> DataFrame:
    """CCNet-style unigram language-model quality score: per-document
    cross-entropy (mean -ln p(token)) and perplexity under a unigram LM
    fit on `lm_corpus` (default: the input corpus itself — the in-domain
    self-scoring mode; pass a clean reference corpus for the filtering
    mode, where high perplexity flags out-of-domain/garbled text).

    Lidstone smoothing: p(t) = (count(t) + alpha) / (total + alpha * (V + 1))
    with one extra vocabulary slot for unseen tokens, so OOV terms score
    finitely and the distribution still sums to <= 1.

    Plan: the LM is a (term, count) aggregate — vocabulary-bounded
    whatever the corpus size — joined back to the (id, term) explode on
    the term key; totals enter as a broadcast scalar.  Two hash-agg
    shuffles + one vocabulary-keyed join, no UDF, no driver materialization
    of the vocabulary.  Every arithmetic step is ANSI-expressible, so the
    driver gate value-hashes it (q_unigram_ppl).

    Zero-token documents stay VISIBLE: (n_tokens=0, null cross_entropy,
    null perplexity) — same discipline as repetition_signals; a blank doc
    must reach the downstream quality gate, not vanish from it.
    """
    lm_terms = term_rows(lm_corpus if lm_corpus is not None else df,
                         id_col, text_col)
    lm = lm_terms.groupBy("term").agg(F.count("*").alias("lm_count"))
    totals = F.broadcast(lm.agg(
        F.sum("lm_count").alias("lm_total"),
        F.count("*").alias("lm_vocab")))
    doc_terms = term_rows(df, id_col, text_col)
    scored = (doc_terms
              .join(lm, "term", "left")
              .crossJoin(totals)
              .withColumn(
                  "_logp",
                  F.log((F.coalesce(F.col("lm_count"), F.lit(0))
                         + F.lit(alpha))
                        / (F.col("lm_total")
                           + F.lit(alpha) * (F.col("lm_vocab") + 1)))))
    agg = (scored.groupBy(F.col("id").alias(id_col))
           .agg(F.count("*").alias("n_tokens"),
                F.round(-F.avg("_logp"), 6).alias("cross_entropy"),
                F.round(F.exp(-F.avg("_logp")), 4).alias("perplexity")))
    ids = df.select(F.col(id_col)).distinct()
    return (ids.join(agg, id_col, "left")
            .withColumn("n_tokens",
                        F.coalesce(F.col("n_tokens"), F.lit(0))))


def _with_bm25_contrib(scored, k1: float, b: float):
    """THE BM25 scoring expression — idf and per-(doc, term) contribution
    over columns (tf, dl, df_t, n_docs, avgdl).  One definition for all
    three retrieval paths (bm25_topk, bm25_from_index, bm25_batch); the
    DuckDB _bm25_chain oracle is the independent pin on the formula."""
    return (scored
            .withColumn(
                "idf",
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df_t") + 0.5)
                      / (F.col("df_t") + 0.5)))
            .withColumn(
                "contrib",
                F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
                / (F.col("tf") + F.lit(k1)
                   * (F.lit(1.0 - b)
                      + F.lit(b) * F.col("dl") / F.col("avgdl")))))


def bm25_topk(df: DataFrame, query_terms, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a bag of query terms
    (Robertson/Spärck Jones probabilistic ranking — the lexical-retrieval
    baseline every hybrid RAG / training-data-selection stack keeps next
    to its ANN index).

    score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with the Lucene non-negative idf: ln(1 + (N - df + 0.5) / (df + 0.5)).

    Plan: the expensive relation is the (id, term) explode, immediately
    filtered to the query's term set — a literal IN list, so the filter is
    row-local inside the same stage as the scan and the surviving relation
    is query-sized, not corpus-sized.  Document length rides ALONG that
    explode as a scalar `token_count` column and is re-collapsed with
    first() in the same tf aggregation — no corpus-sized doclen join back
    on id (on a 100 TB corpus a common query term matches most documents,
    so that join would shuffle the whole id space twice).  N and avgdl
    enter as one broadcast scalar row from a separate scalar-only scan
    (column-pruned to the text column, no shuffle); per-term doc frequency
    over the filtered relation is |q|-bounded and broadcast.  One
    query-sized hash-agg shuffle + one |q|-sized one, one TakeOrdered —
    no global sort, no UDF.

    Ties break (bm25 desc, id asc) so top-k is reproducible; returns
    (id_col, n_hit_terms, bm25).
    """
    qterms = sorted({t.lower() for t in query_terms})
    if not qterms:
        raise ValueError("bm25_topk: query_terms must be non-empty")

    stats = F.broadcast(df.agg(
        F.count("*").alias("n_docs"),
        F.avg(token_count(F.col(text_col))).alias("avgdl")))

    tf = (df
          .select(F.col(id_col).alias("id"),
                  token_count(F.col(text_col)).alias("dl"),
                  F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                    r"\s+")).alias("term"))
          .filter(F.col("term").isin(qterms))
          .groupBy("id", "term")
          .agg(F.count("*").alias("tf"), F.first("dl").alias("dl")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))

    scored = _with_bm25_contrib(
        tf.join(F.broadcast(dfreq), "term").crossJoin(stats), k1, b)
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_hit_terms"),
                 F.round(F.sum("contrib"), 6).alias("bm25"))
            .orderBy(F.desc("bm25"), F.asc("id"))
            .limit(k)
            .select(F.col("id").alias(id_col), "n_hit_terms", "bm25"))


# Gopher (Rae et al. 2021, Table A1) document-quality rule thresholds.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def with_gopher_rules(df: DataFrame, text_col: str = "text",
                      min_words: int = 50, max_words: int = 100_000,
                      min_mean_word_len: float = 3.0,
                      max_mean_word_len: float = 10.0,
                      max_symbol_ratio: float = 0.1,
                      max_bullet_ratio: float = 0.9,
                      max_ellipsis_ratio: float = 0.3,
                      min_alpha_word_ratio: float = 0.8,
                      min_stop_hits: int = 2) -> DataFrame:
    """Gopher-style explicit quality rules, one boolean column per rule
    plus the conjunction (`gopher_pass`) — the published filter battery
    (Rae et al. 2021 §A.1.1) that with_quality_signals' soft score
    approximates.  Emitting each rule as its own column is deliberate:
    at curation time you audit WHICH rule killed a document, not just
    that one did.

    Every signal is a scalar Column expression over the text value —
    regexp counts, higher-order array functions on the line/word splits —
    so the whole battery runs inside one whole-stage-codegen projection
    on the corpus scan: zero shuffles, zero UDFs, ANSI-expressible for
    the value oracle (q_gopher_rules).

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; '#'-or-'…' symbol-to-word
    ratio <= max_symbol_ratio; <= max_bullet_ratio of lines starting with
    a bullet; <= max_ellipsis_ratio of lines ending with '...'; >=
    min_alpha_word_ratio of words containing a letter; >= min_stop_hits
    distinct common-English stopwords present.
    """
    t = _nn(F.col(text_col))
    words = _words(t)
    n_words = F.size(words).cast("long")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    # total word characters / word count (whitespace chars excluded)
    mean_word_len = (F.length(F.regexp_replace(t, r"\s", ""))
                     / safe_words)
    n_symbols = (F.regexp_count(t, F.lit("#"))
                 + F.regexp_count(t, F.lit(r"\.\.\.")))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    n_bullet = F.size(F.filter(
        lines, lambda l: l.rlike(r"^\s*[-*•]")))
    n_ellipsis = F.size(F.filter(
        lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stop_hits = None
    low = F.lower(t)
    for sw in GOPHER_STOPWORDS:
        hit = F.when(low.rlike(r"\b" + sw + r"\b"), 1).otherwise(0)
        stop_hits = hit if stop_hits is None else stop_hits + hit

    out = (df
           .withColumn("g_n_words", n_words)
           .withColumn("g_mean_word_len", F.round(mean_word_len, 6))
           .withColumn("g_symbol_ratio",
                       F.round(n_symbols / safe_words, 6))
           .withColumn("g_bullet_ratio",
                       F.round(n_bullet / safe_lines, 6))
           .withColumn("g_ellipsis_ratio",
                       F.round(n_ellipsis / safe_lines, 6))
           .withColumn("g_alpha_word_ratio",
                       F.round(n_alpha_words / safe_words, 6))
           .withColumn("g_stop_hits", stop_hits.cast("int")))
    rules = {
        "r_word_count": F.col("g_n_words").between(min_words, max_words),
        "r_mean_word_len": F.col("g_mean_word_len").between(
            min_mean_word_len, max_mean_word_len),
        "r_symbol_ratio": F.col("g_symbol_ratio") <= max_symbol_ratio,
        "r_bullet_ratio": F.col("g_bullet_ratio") <= max_bullet_ratio,
        "r_ellipsis_ratio": F.col("g_ellipsis_ratio") <= max_ellipsis_ratio,
        "r_alpha_words": F.col("g_alpha_word_ratio")
        >= min_alpha_word_ratio,
        "r_stopwords": F.col("g_stop_hits") >= min_stop_hits,
    }
    gate = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        gate = gate & cond
    return out.withColumn("gopher_pass", gate)


def _bigram_rows(src: DataFrame, id_col: str,
                 text_col: str) -> DataFrame:
    """(id, w1, w2) bigram events from a row-local slice-zip of the
    token split — shared by both bigram LM scorers (JM and KN) so the
    tokenization / pairing / <2-token contract cannot diverge."""
    toks = _words(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.arrays_zip(F.slice(toks, 1, n - 1).alias("w1"),
                     F.slice(toks, 2, n - 1).alias("w2"))
    ).otherwise(F.array())
    return (src
            .select(F.col(id_col).alias("id"),
                    F.explode(pairs).alias("bg"))
            .select("id", F.col("bg.w1").alias("w1"),
                    F.col("bg.w2").alias("w2")))


def _lm_finish(scored: DataFrame, df: DataFrame,
               id_col: str) -> DataFrame:
    """Per-document (n_bigrams, cross_entropy, perplexity) from a
    scored event relation carrying `_logp` — shared by both bigram LM
    scorers.  Each event's log-probability quantizes ONCE to integer
    micro-nats (the WoE/PSI transcendental convention), so the
    per-document reduction is an order-free BIGINT sum and the final
    cross-entropy rounds in integer space (`_idiv_half_up`) — a raw
    double avg would be partition-order-dependent (the r11 self-review
    finding; the q_covariance hazard class applied to avg).  Perplexity
    exponentiates the same deterministic integer ratio, round-4."""
    from flood_data_spark.datapipe.linalg import _idiv_half_up

    lp = F.round(F.col("_logp") * F.lit(1_000_000.0)).cast("long")
    agg0 = (scored.withColumn("_lp", lp)
            .groupBy(F.col("id").alias(id_col))
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum("_lp").alias("_s")))
    n_dec = F.col("n_bigrams").cast("decimal(38,0)")
    s_dec = F.col("_s").cast("decimal(38,0)")
    ce = (_idiv_half_up(-s_dec, n_dec).cast("double")
          / F.lit(1_000_000.0))
    ppl = F.round(
        F.exp((-F.col("_s")).cast("double") / F.col("n_bigrams")
              / F.lit(1_000_000.0)), 4)
    agg = agg0.select(id_col, "n_bigrams",
                      ce.alias("cross_entropy"),
                      ppl.alias("perplexity"))
    ids = df.select(F.col(id_col)).distinct()
    return (ids.join(agg, id_col, "left")
            .withColumn("n_bigrams",
                        F.coalesce(F.col("n_bigrams"), F.lit(0))))


def bigram_lm_scores(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     lm_corpus: DataFrame | None = None,
                     lam: float = 0.7, alpha: float = 0.5) -> DataFrame:
    """Interpolated bigram language-model scoring: per-document
    cross-entropy and perplexity over bigram events under
    p(w2|w1) = lam * c(w1 w2)/c(w1·) + (1-lam) * p_lidstone(w2),
    the Jelinek-Mercer-smoothed 2-gram LM (the next rung above
    `unigram_lm_scores` on the KenLM-style data-quality ladder —
    a sharper garbled-text detector because it scores word ORDER).

    Bigram extraction is a zip of two array slices of the token split
    (`arrays_zip(slice(toks,1,n-1), slice(toks,2,n-1))`) — row-local,
    no window over the corpus, no positional self-join.  The bigram LM
    is a (w1, w2, count) aggregate — bounded by the corpus's DISTINCT
    bigram set, the same shape KenLM's trainer materializes — joined
    back on the bigram key; the unigram backoff joins on w2; totals
    broadcast as one scalar row.  Three hash-agg shuffles + two
    vocabulary-keyed joins, no UDF; ANSI-expressible end-to-end
    (q_bigram_ppl value-hashes it).

    Documents with < 2 tokens stay visible with n_bigrams = 0 and null
    metrics (same discipline as unigram_lm_scores).  Per-event log
    probabilities quantize once to integer micro-nats and the document
    reduction is an order-free BIGINT sum (`_lm_finish`).
    """
    lm_src = lm_corpus if lm_corpus is not None else df
    # localCheckpoint both LM tables: lm_bg feeds the scoring join AND
    # lm_ctx; lm_uni feeds the scoring join AND the totals scalar —
    # without it each derived consumer recomputes its corpus-sized
    # explode+aggregate from scratch (the corpus would be exploded five
    # times instead of twice).  Both relations are distinct-bigram- /
    # vocabulary-bounded, so the persisted blocks are small.  Lazy
    # (eager=False): no extra action, blocks persist at first use.
    lm_bg = (_bigram_rows(lm_src, id_col, text_col)
             .groupBy("w1", "w2").agg(F.count("*").alias("bg_count"))
             .localCheckpoint(eager=False))
    lm_ctx = (lm_bg.groupBy("w1")
              .agg(F.sum("bg_count").alias("ctx_count")))
    lm_uni = (term_rows(lm_src, id_col, text_col)
              .groupBy("term").agg(F.count("*").alias("uni_count"))
              .localCheckpoint(eager=False))
    totals = F.broadcast(lm_uni.agg(
        F.sum("uni_count").alias("uni_total"),
        F.count("*").alias("uni_vocab")))

    doc_bg = _bigram_rows(df, id_col, text_col)
    scored = (doc_bg
              .join(lm_bg, ["w1", "w2"], "left")
              .join(lm_ctx, "w1", "left")
              .join(lm_uni.withColumnRenamed("term", "w2"), "w2", "left")
              .crossJoin(totals)
              .withColumn(
                  "_p_uni",
                  (F.coalesce(F.col("uni_count"), F.lit(0)) + F.lit(alpha))
                  / (F.col("uni_total")
                     + F.lit(alpha) * (F.col("uni_vocab") + 1)))
              .withColumn(
                  "_p_ml",
                  F.when(F.coalesce(F.col("ctx_count"), F.lit(0)) > 0,
                         F.coalesce(F.col("bg_count"), F.lit(0))
                         / F.col("ctx_count").cast("double"))
                  .otherwise(F.lit(0.0)))
              .withColumn(
                  "_logp",
                  F.log(F.lit(lam) * F.col("_p_ml")
                        + F.lit(1.0 - lam) * F.col("_p_uni"))))
    return _lm_finish(scored, df, id_col)


def kneser_ney_scores(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      lm_corpus: DataFrame | None = None,
                      discount: float = 0.75,
                      alpha: float = 0.5) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the smoothing that wins
    on real text (Chen & Goodman 1999): absolute discounting with a
    CONTINUATION-count backoff,

        p_kn(w2|w1) = (max(c(w1 w2) - D, 0) + D * N1+(w1 ·) * p_cont(w2))
                      / c(w1 ·)
        p_cont(w2)  = (N1+(· w2) + alpha) / (N_pairs + alpha * (V + 1))

    where N1+(w1 ·) / N1+(· w2) are distinct continuation counts and
    N_pairs the distinct-bigram total.  The Lidstone floor on p_cont
    (a documented deviation from the textbook form) keeps OOV events
    finite; an unseen CONTEXT (c(w1 ·) = 0) backs off fully to p_cont.
    Per-document cross-entropy and perplexity, same output shape and
    <2-token visibility contract as `bigram_lm_scores` (this is the
    next rung of that data-quality ladder: "san francisco" stops
    inflating p(francisco | anything) because francisco follows almost
    nothing else — the classic continuation-count win).

    Plan (identical skeleton to `bigram_lm_scores`): the LM tables are
    distinct-bigram-/vocabulary-bounded aggregates localCheckpoint-ed
    once; scoring is three vocabulary-keyed left joins + one broadcast
    totals row; no UDF, ANSI-expressible end-to-end (q_kneser_ney
    value-hashes it).  All continuation counts are EXACT integers; the
    only doubles are the final fixed expression tree (log — lattice-
    free, the round-11 audit class that needs no integer rounding).
    """
    lm_src = lm_corpus if lm_corpus is not None else df
    lm_bg = (_bigram_rows(lm_src, id_col, text_col)
             .groupBy("w1", "w2").agg(F.count("*").alias("bg_count"))
             .localCheckpoint(eager=False))
    ctx = (lm_bg.groupBy("w1")
           .agg(F.sum("bg_count").alias("ctx_count"),
                F.count("*").alias("n1_fw")))
    cont = (lm_bg.groupBy("w2")
            .agg(F.count("*").alias("n1_bw"))
            .localCheckpoint(eager=False))
    totals = F.broadcast(cont.agg(
        F.sum("n1_bw").alias("n_pairs"),
        F.count("*").alias("vocab")))

    d = F.lit(discount)
    doc_bg = _bigram_rows(df, id_col, text_col)
    p_cont = ((F.coalesce(F.col("n1_bw"), F.lit(0)) + F.lit(alpha))
              / (F.col("n_pairs")
                 + F.lit(alpha) * (F.col("vocab") + 1)))
    p_kn = F.when(
        F.coalesce(F.col("ctx_count"), F.lit(0)) > 0,
        (F.greatest(F.coalesce(F.col("bg_count"), F.lit(0)) - d,
                    F.lit(0.0))
         + d * F.col("n1_fw") * F.col("_p_cont"))
        / F.col("ctx_count").cast("double")
    ).otherwise(F.col("_p_cont"))
    scored = (doc_bg
              .join(lm_bg, ["w1", "w2"], "left")
              .join(ctx, "w1", "left")
              .join(cont, "w2", "left")
              .crossJoin(totals)
              .withColumn("_p_cont", p_cont)
              .withColumn("_logp", F.log(p_kn)))
    return _lm_finish(scored, df, id_col)


def with_ngram_diversity(df: DataFrame, n: int = 3,
                         text_col: str = "text",
                         prefix: str = "nd_") -> DataFrame:
    """Distinct-n-gram ratio per document — the cheap compressibility
    proxy for templated/looping text (Gopher's repetition family at
    n-gram granularity; low diversity = the doc repeats itself).

    Adds (prefix)n_ngrams, (prefix)n_distinct, (prefix)diversity
    (distinct/total, null when the doc has < n tokens — too short to
    judge, same visibility discipline as the LM scorers).

    Entirely scalar: the n-gram list is built row-locally
    (transform over an index sequence + array slices) and de-duplicated
    with array_distinct — no explode, no shuffle, ANSI-expressible
    (q_ngram_diversity value-hashes it).  Honest cost note: higher-order
    array functions evaluate INTERPRETED (Spark exempts them from
    whole-stage codegen), ~1 µs/gram measured — still scan-dominated on
    real corpora, and trivially parallel (measured 14 s -> 1.15 s going
    from a 1-row-group file to 32 scan tasks; the file-layout lesson in
    SCALE_NOTES applies, not an operator limit).
    """
    if n < 1:
        raise ValueError("with_ngram_diversity: n must be >= 1")
    toks = _words(F.col(text_col))
    cnt = F.size(toks)
    grams = F.when(
        cnt >= n,
        F.transform(F.sequence(F.lit(1), cnt - n + 1),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    return (df
            .withColumn(prefix + "n_ngrams", n_grams.cast("long"))
            .withColumn(prefix + "n_distinct",
                        F.size(F.array_distinct(grams)).cast("long"))
            .withColumn(
                prefix + "diversity",
                F.when(n_grams > 0,
                       F.round(F.col(prefix + "n_distinct")
                               / n_grams.cast("double"), 6))))


def cooccurrence_pmi(df: DataFrame, window: int = 2,
                     min_count: int = 2,
                     text_col: str = "text") -> DataFrame:
    """Windowed co-occurrence statistics + PMI — the word2vec/GloVe
    preprocessing step: directed token pairs (w1 precedes w2 within
    `window` positions), corpus-wide counts, and pointwise mutual
    information ln(p(w1,w2) / (p(w1) p(w2))) under the pair/unigram
    distributions.  p(w1,w2) is normalized by the FULL pair mass
    (computed before any pruning): `min_count` is an OUTPUT filter on
    which pairs are reported, never part of the distribution — otherwise
    every PMI would carry a +ln(full_total/filtered_total) offset that
    shifts with min_count and breaks the "PMI > 0 means associated"
    convention.

    Pair extraction is row-local: for each offset d in 1..window, a
    slice-zip of the token array (the bigram construction generalized) —
    no positional self-join, no explode-then-join.  The pair relation is
    observed-pair-bounded (never vocab²); unigram marginals join on the
    term key; totals broadcast as one scalar row; the pruned tail never
    reaches the marginal joins.

    Returns (w1, w2, pair_count, pmi) for pairs with pair_count >=
    min_count, pmi rounded to 6.  Fully ANSI (q_cooccurrence value-hashes
    it).
    """
    if window < 1:
        raise ValueError("cooccurrence_pmi: window must be >= 1")
    toks = _words(F.col(text_col))
    n = F.size(toks)
    pair_arrays = [
        F.when(n >= d + 1,
               F.arrays_zip(F.slice(toks, 1, n - d).alias("w1"),
                            F.slice(toks, 1 + d, n - d).alias("w2")))
        .otherwise(F.array())
        for d in range(1, window + 1)
    ]
    pairs = (df
             .select(F.explode(F.concat(*pair_arrays)).alias("pr"))
             .select(F.col("pr.w1").alias("w1"),
                     F.col("pr.w2").alias("w2")))
    # checkpoint: all_pairs feeds the FULL pair total AND the reported
    # subset; uni feeds its own total and two join sides — the round-7
    # multiply-consumed-aggregate rule (recompute + real-statistics)
    all_pairs = (pairs.groupBy("w1", "w2")
                 .agg(F.count("*").alias("pair_count"))
                 .localCheckpoint(eager=False))
    pair_counts = all_pairs.filter(F.col("pair_count") >= min_count)
    uni = (df.select(F.explode(toks).alias("term"))
           .groupBy("term").agg(F.count("*").alias("uni_count"))
           .localCheckpoint(eager=False))
    totals = F.broadcast(
        all_pairs.agg(F.sum("pair_count").alias("pair_total"))
        .crossJoin(uni.agg(F.sum("uni_count").alias("uni_total"))))
    return (pair_counts
            .join(uni.select(F.col("term").alias("w1"),
                             F.col("uni_count").alias("c1")), "w1")
            .join(uni.select(F.col("term").alias("w2"),
                             F.col("uni_count").alias("c2")), "w2")
            .crossJoin(totals)
            .select("w1", "w2", "pair_count",
                    F.round(
                        F.log((F.col("pair_count")
                               / F.col("pair_total").cast("double"))
                              / ((F.col("c1")
                                  / F.col("uni_total").cast("double"))
                                 * (F.col("c2")
                                    / F.col("uni_total").cast("double")))),
                        6).alias("pmi")))


def build_text_index(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Inverted-index build for BM25 serving — the text-side analog of
    `ivf_build`: pay the corpus scan ONCE, then answer keyword queries
    from index relations sized by the query, not the corpus.

    Returns (postings, term_stats, stats):

    - postings: (term, id, tf, dl) — one row per distinct (term, doc),
      DENORMALIZED with the document length (the Lucene move: the length
      norm lives in the posting, so scoring never joins back to a
      corpus-sized doclen relation);
    - term_stats: (term, df_t) — vocabulary-bounded document frequencies,
      DERIVED FROM the postings plan, so once the caller persists/writes
      postings it re-aggregates from the persisted relation, not the
      corpus;
    - stats: one row (n_docs, avgdl), COLLECTED at build time into a
      literal-backed frame (one bounded 1-row action — the ivf_build
      fit-at-build precedent) so no later probe ever re-scans the corpus
      for the scalar.

    At 100 TB persist postings bucketed/partitioned by a term hash::

        postings.withColumn("bucket", F.crc32("term") % 1024)
            .write.partitionBy("bucket").parquet(path)

    and `bm25_from_index` touches only the buckets holding query terms
    (partition pruning on the equi-filter).  The build is the SAME
    explode+aggregate q_bm25_topk pays per query — amortized to once.
    """
    # r17 (guide §2.3, the winnow_fingerprints precedent): exchange the
    # RAW text by id BEFORE the token explode — hash(id) partitioning
    # satisfies the (term, id) clustering of the postings groupBy (a
    # subset of its keys), so the former token-row exchange (~30 B per
    # term-doc pair after partial aggregation) is replaced by a raw-text
    # exchange (~1 B/char) and the tokenize+explode runs with full
    # reduce-side parallelism instead of serializing in the scan's task
    # count (a one-file corpus built the whole index in ONE task —
    # measured 2.9 s of a 2.65 s entry).  Pinned partition count: AQE
    # sizes partitions by the small SHUFFLED text and would re-coalesce
    # the fan-out stage to one task.
    src = (df.select(F.col(id_col).alias("id"),
                     token_count(F.col(text_col)).alias("dl"),
                     F.lower(F.trim(F.col(text_col))).alias("_t"))
           .repartition(df.sparkSession.sparkContext.defaultParallelism,
                        "id"))
    terms = (src.select("id", "dl",
                        F.explode(F.split(F.col("_t"), r"\s+"))
                        .alias("term"))
             .filter(F.col("term") != ""))
    postings = (terms.groupBy("term", "id")
                .agg(F.count("*").alias("tf"), F.first("dl").alias("dl")))
    term_stats = (postings.groupBy("term")
                  .agg(F.count("*").alias("df_t")))
    row = df.agg(F.count("*").alias("n_docs"),
                 F.avg(token_count(F.col(text_col)))
                 .alias("avgdl")).collect()[0]
    stats = df.sparkSession.createDataFrame(
        [(row["n_docs"], row["avgdl"])], "n_docs long, avgdl double")
    return postings, term_stats, stats


def bm25_from_index(postings: DataFrame, term_stats: DataFrame,
                    stats: DataFrame, query_terms, k: int = 10,
                    k1: float = 1.2, b: float = 0.75,
                    id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k against a prebuilt inverted index: filter postings to
    the query's term set (partition-pruned when the index is written
    bucketed by term), broadcast the |q|-row term stats and the scalar
    (N, avgdl), aggregate per doc, TakeOrdered.  Query cost is
    proportional to the matched POSTINGS — no corpus scan, no explode,
    no corpus-sized shuffle.  Produces bit-identical scores to the
    on-the-fly `bm25_topk` (q_bm25_indexed shares q_bm25_topk's oracle).
    """
    qterms = sorted({t.lower() for t in query_terms})
    if not qterms:
        raise ValueError("bm25_from_index: query_terms must be non-empty")
    scored = _with_bm25_contrib(
        postings
        .filter(F.col("term").isin(qterms))
        .join(F.broadcast(
            term_stats.filter(F.col("term").isin(qterms))), "term")
        .crossJoin(F.broadcast(stats)), k1, b)
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_hit_terms"),
                 F.round(F.sum("contrib"), 6).alias("bm25"))
            .orderBy(F.desc("bm25"), F.asc("id"))
            .limit(k)
            .select(F.col("id").alias(id_col), "n_hit_terms", "bm25"))


def bm25_batch(postings: DataFrame, term_stats: DataFrame,
               stats: DataFrame, queries: DataFrame, k: int = 10,
               k1: float = 1.2, b: float = 0.75,
               query_col: str = "query_id", terms_col: str = "terms",
               id_col: str = "doc_id") -> DataFrame:
    """Batch retrieval: score EVERY query in `queries` (query_col,
    terms_col array<string>) against the prebuilt inverted index in ONE
    job — the shape of eval-set retrieval and training-pair mining,
    where running bm25_from_index per query would pay per-query job
    overhead thousands of times.

    Returns (query_col, id_col, n_hit_terms, bm25, rank) for each
    query's top k (rank 1-based on (bm25 desc, id asc) — computed on the
    ROUNDED score, so ranks are engine-reproducible).

    Plan: the exploded (query, term) relation is query-batch-sized and
    BROADCASTS against the postings scan (the corpus-sized side never
    shuffles for the join); the (query, doc) aggregate and the per-query
    rank window shuffle matched-postings-sized rows only.  Scores are
    formula-identical to bm25_from_index (one definition of idf/contrib
    would be circular to share as Columns — the oracle pins both).
    Duplicate terms within one query are de-duplicated (a repeated term
    must not double its contribution — set-of-terms semantics, matching
    bm25_topk).  Empty/NULL term arrays raise (the per-query paths'
    contract); a query whose terms match NO document legitimately
    returns zero rows (zero recall, not an error) — feed the output to
    `similarity.ir_metrics`, which keeps hitless queries visible via
    the relevant table.
    """
    n_empty = queries.filter(
        F.coalesce(F.size(F.col(terms_col)), F.lit(0)) == 0).count()
    if n_empty:
        raise ValueError(
            f"bm25_batch: {n_empty} queries have empty/NULL {terms_col!r} "
            "(the per-query paths raise on empty queries too)")
    qt = (queries
          .select(query_col, F.explode(F.col(terms_col)).alias("term"))
          .withColumn("term", F.lower(F.col("term")))
          .distinct())
    # semi-join bounds the term_stats broadcast to the QUERY vocabulary —
    # term_stats is corpus-vocabulary-sized, and broadcasting it
    # unfiltered would collect millions of rows to the driver at scale
    qstats = term_stats.join(F.broadcast(qt.select("term").distinct()),
                             "term", "left_semi")
    scored = _with_bm25_contrib(
        postings
        .join(F.broadcast(qt), "term")
        .join(F.broadcast(qstats), "term")
        .crossJoin(F.broadcast(stats)), k1, b)
    per = (scored.groupBy(query_col, "id")
           .agg(F.count("*").alias("n_hit_terms"),
                F.round(F.sum("contrib"), 6).alias("bm25")))
    w = Window.partitionBy(query_col).orderBy(F.desc("bm25"), F.asc("id"))
    return (per.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_col, F.col("id").alias(id_col),
                    "n_hit_terms", "bm25", "rank"))


def mine_hard_negatives(postings: DataFrame, term_stats: DataFrame,
                        stats: DataFrame, queries: DataFrame,
                        k_pos: int = 2, k_neg: int = 8,
                        k1: float = 1.2, b: float = 0.75,
                        query_col: str = "query_id",
                        terms_col: str = "terms",
                        id_col: str = "doc_id") -> DataFrame:
    """BM25 hard-negative mining — the standard contrastive-training
    recipe (DPR/Karpukhin et al. 2020 use exactly this): per query, the
    top `k_pos` retrieved documents become positives and the NEXT
    `k_neg` become hard negatives (lexically close enough to rank, not
    close enough to be the answer — far more informative than random
    negatives).  One bm25_batch job + a label projection; emits
    (query, doc, bm25, rank, label)."""
    if k_pos < 1 or k_neg < 1:
        raise ValueError(f"need k_pos/k_neg >= 1, got {k_pos}/{k_neg}")
    ranked = bm25_batch(postings, term_stats, stats, queries,
                        k=k_pos + k_neg, k1=k1, b=b,
                        query_col=query_col, terms_col=terms_col,
                        id_col=id_col)
    return ranked.withColumn(
        "label",
        F.when(F.col("rank") <= k_pos, F.lit("pos")).otherwise(F.lit("neg")))


def bm25_prf_expand(df: DataFrame, query_terms, n_feedback: int = 10,
                    n_expansion: int = 5, k: int = 10,
                    k1: float = 1.2, b: float = 0.75,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM3-lite): run BM25,
    take the top `n_feedback` documents as assumed-relevant, pick the
    `n_expansion` non-query terms with the highest feedback-set
    tf × smoothed-idf (the tfidf_topk scoring, aggregated over the
    feedback set), add them to the query, and return the re-run BM25
    top-k — the classic recall booster when the literal query
    under-specifies the topic.

    Two-pass by construction (the second query depends on data from the
    first); both passes are the `bm25_topk` plan, and the expansion
    scoring runs on the FEEDBACK SET (n_feedback documents), never the
    corpus.  The expansion term selection collects `n_expansion` strings
    to the driver — bounded by the parameter, the same driver-scalar
    contract as dedup's argmax collects.

    Ties in expansion scoring break (score desc, term asc); returns the
    final top-k with the same schema as `bm25_topk` plus the expansion
    evidence is available via `expansion_terms(df, ...)` below for
    callers that need to log it.
    """
    qlist = list(query_terms)          # materialize once: a one-shot
    exp = expansion_terms(df, qlist, n_feedback, n_expansion,
                          k1, b, id_col, text_col)
    return bm25_topk(df, qlist + exp, k=k, k1=k1, b=b,
                     id_col=id_col, text_col=text_col)


def expansion_terms(df: DataFrame, query_terms, n_feedback: int = 10,
                    n_expansion: int = 5, k1: float = 1.2, b: float = 0.75,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> list:
    """The PRF expansion-term selection of `bm25_prf_expand`, exposed so
    the chosen terms can be logged/audited: feedback set = BM25 top
    `n_feedback`; candidate score = feedback-set term frequency ×
    corpus smoothed idf (ln((N+1)/(df+1))+1), query terms excluded.
    Returns the top `n_expansion` terms as a Python list (bounded driver
    collect — n_expansion strings)."""
    qterms = sorted({t.lower() for t in query_terms})
    feedback = (bm25_topk(df, qterms, k=n_feedback, k1=k1, b=b,
                          id_col=id_col, text_col=text_col)
                .select(id_col))
    fb_docs = df.join(F.broadcast(feedback), id_col, "left_semi")
    fb_tf = (term_rows(fb_docs, id_col, text_col)
             .filter(~F.col("term").isin(qterms))
             .groupBy("term").agg(F.count("*").alias("fb_tf"))
             .localCheckpoint(eager=False))
    # restrict the corpus (id, term) relation to the FEEDBACK vocabulary
    # before the distinct/groupBy: the df values per term are unchanged,
    # but both shuffles become feedback-vocabulary-bounded instead of
    # full-vocabulary (the query-sized-shuffle discipline)
    fb_vocab = F.broadcast(fb_tf.select("term"))
    docfreq = (term_rows(df, id_col, text_col)
               .join(fb_vocab, "term", "left_semi")
               .select("id", "term").distinct()
               .groupBy("term").agg(F.count("*").alias("df")))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    scored = (fb_tf.join(docfreq, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("score",
                          F.round(F.col("fb_tf")
                                  * _smooth_idf(F.col("df"), F.col("n")),
                                  6)))
    # round-6 before ordering: the cut at n_expansion must be the same
    # cut in any engine computing the same doubles (oracle parity)
    rows = (scored.orderBy(F.desc("score"), F.asc("term"))
            .limit(n_expansion).collect())
    return [r["term"] for r in rows]


def textrank_keywords(df: DataFrame, window: int = 2, n_iter: int = 3,
                      k: int = 5, damping: float = 0.85,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): per-document
    PageRank over the word co-occurrence graph, top-k words per document
    — the unsupervised keyword/keyphrase baseline of every document-
    understanding pipeline.

    Construction (all row-local until the counts): canonical undirected
    word pairs within `window` positions via the `cooccurrence_pmi`
    slice-zip (no positional self-join), per-DOCUMENT edge weights,
    symmetric adjacency, weighted degrees.  Then `n_iter` damped
    power-iteration rounds, each ONE edge-sized join + ONE (doc, word)
    groupBy — the `graph.pagerank` plan economics with (doc, word)
    composite keys, adjacency/nodes checkpointed once and ranks
    checkpointed per round.

    Bit-exact iteration (stronger than the q_pagerank final-round trick):
    ranks live in integer micro-units; every edge contribution rounds
    ONCE (round(r_mu·w / wdeg) — a division of exact integers), so the
    per-node sum is an exact BIGINT and the damping update rounds one
    fixed double expression back to BIGINT.  Every iteration is
    engine-replayable, which is what lets the gate unroll all rounds in
    ANSI SQL and hash the VALUES of an iterative algorithm.

    Returns (id_col, keyword, rank_mu, pos) — pos 1..k by
    (rank_mu DESC, keyword ASC).  Documents with < 2 distinct
    co-occurring words yield no rows (no graph, no keywords).
    """
    if window < 1 or n_iter < 1 or k < 1:
        raise ValueError("textrank_keywords: window, n_iter, k must all "
                         f"be >= 1 (got {window}, {n_iter}, {k})")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    toks = _words(F.col(text_col))
    n = F.size(toks)
    pair_arrays = [
        F.when(n >= d + 1,
               F.arrays_zip(F.slice(toks, 1, n - d).alias("w1"),
                            F.slice(toks, 1 + d, n - d).alias("w2")))
        .otherwise(F.array())
        for d in range(1, window + 1)
    ]
    pairs = (df.select(F.col(id_col), F.explode(F.concat(*pair_arrays))
                       .alias("pr"))
             .filter(F.col("pr.w1") != F.col("pr.w2"))
             .select(id_col,
                     F.least("pr.w1", "pr.w2").alias("a"),
                     F.greatest("pr.w1", "pr.w2").alias("b")))
    edges = (pairs.groupBy(id_col, "a", "b")
             .agg(F.count(F.lit(1)).alias("weight")))
    # r16 (guide §2.4): the union destroys any useful partitioning, so
    # every power-iteration round used to re-shuffle AND re-sort the
    # edge-sized adj into its (doc, u) join.  Repartition + sort by the
    # JOIN key ONCE and cache: unlike localCheckpoint (whose LogicalRDD
    # reports UnknownPartitioning), InMemoryRelation PRESERVES the
    # child's outputPartitioning/ordering, so every power-iteration
    # round's sort-merge join reads adj with ZERO exchange and ZERO
    # sort — one shuffle+sort total instead of one per round.  The
    # cache is query-internal scratch (the LSH-bucket precedent), not
    # cross-run result caching.
    nparts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    adj = (edges.select(id_col, F.col("a").alias("u"),
                        F.col("b").alias("v"), "weight")
           .unionByName(edges.select(id_col, F.col("b").alias("u"),
                                     F.col("a").alias("v"), "weight"))
           .repartition(int(nparts), id_col, "u")
           .sortWithinPartitions(id_col, "u")
           .cache())
    nodes = (adj.groupBy(id_col, "u")
             .agg(F.sum("weight").alias("wdeg"))
             .cache())

    ranks = nodes.withColumn("r_mu", F.lit(1_000_000).cast("long"))
    for it in range(n_iter):
        contrib = (ranks.join(adj, on=[id_col, "u"])
                   .select(id_col, F.col("v").alias("u"),
                           F.round(F.col("r_mu") * F.col("weight")
                                   / F.col("wdeg")).cast("long")
                           .alias("_c"))
                   .groupBy(id_col, "u").agg(F.sum("_c").alias("_s")))
        r_mu = F.round((F.lit(1.0) - F.lit(damping))
                       * F.lit(1_000_000.0)
                       + F.lit(damping) * F.coalesce(F.col("_s"),
                                                     F.lit(0))
                       ).cast("long")
        ranks = (nodes.join(contrib, on=[id_col, "u"], how="left")
                 .select(id_col, "u", "wdeg", r_mu.alias("r_mu")))
        if it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)

    w = (Window.partitionBy(id_col)
         .orderBy(F.col("r_mu").desc(), F.col("u").asc()))
    return (ranks.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= k)
            .select(id_col, F.col("u").alias("keyword"),
                    F.col("r_mu").alias("rank_mu"),
                    F.col("pos").cast("int").alias("pos")))


def rouge_n(cand: DataFrame, ref: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", n: int = 2) -> DataFrame:
    """ROUGE-N between aligned candidate/reference document pairs (the
    summarization/eval overlap metric, Lin 2004): per shared id,

        recall    = clip / ref_grams
        precision = clip / cand_grams
        f1        = 2·clip / (cand_grams + ref_grams)

    where clip = Σ_gram min(count_cand, count_ref) — the CLIPPED
    multiset n-gram overlap (repeating a reference gram in the
    candidate scores it at most count_ref times, the anti-gaming rule
    ROUGE exists for).  Tokenization is the corpus-normalization used
    across the dedup family (lower, trim, collapse whitespace, split on
    single spaces); word n-grams explode per position — linear in token
    volume, grouped per (id, gram), then ONE inner join of the two
    count relations per gram (id-and-gram keyed, so fan-out is 1: the
    gram multiplicity lives in the counts, never in join rows).  All
    three ratios are exact integer ratios (`linalg._idiv_half_up`).
    Pairs where either side has fewer than n tokens carry zero grams on
    that side and report NULL for the ratios with a 0 denominator; the
    output is driven from the UNION of input ids, so an id whose both
    sides are too short still emits its zero-gram all-NULL row rather
    than vanishing.  Returns (id, cand_grams, ref_grams, clip,
    precision, recall, f1) sorted by id; f1 is computed from its own
    integer ratio (2c/(a+b)), which equals the harmonic mean of the
    rounded p/r up to round-6."""
    if n < 1:
        raise ValueError("rouge_n: n must be >= 1")
    from flood_data_spark.datapipe.linalg import _idiv_half_up
    MICRO = 1_000_000
    dec = "decimal(38,0)"

    def grams(df):
        toks = F.split(F.lower(F.regexp_replace(
            F.trim(F.col(text_col)), r"\s+", " ")), " ")
        return (df.select(F.col(id_col).alias("id"), toks.alias("w"))
                .filter(F.size("w") >= n)
                .select("id",
                        F.expr(f"explode(sequence(1, size(w) - {n - 1}))")
                        .alias("pos"), "w")
                .select("id", F.concat_ws(
                    " ", F.slice(F.col("w"), F.col("pos"), n))
                    .alias("g"))
                .groupBy("id", "g")
                .agg(F.count(F.lit(1)).alias("c")))

    cg = grams(cand)
    rg = grams(ref)
    # totals and clip in ONE pass off single cg/rg instantiations
    # (r16, guide §2.4; the bleu_corpus/chrf merge): both gram tables
    # are unique per (id, g), so the full-outer join cannot fan either
    # side out — the coalesced sums are the old totals and
    # least(coalesce(c,0), coalesce(cr,0)) contributes 0 exactly where
    # the old inner-join clip was absent; the na.fill(0) below maps
    # the old NULL-when-absent rows to the same 0s either way.
    merged = (cg.join(rg.select(F.col("id"), F.col("g"),
                                F.col("c").alias("cr")),
                      ["id", "g"], "full")
              .groupBy("id")
              .agg(F.sum(F.coalesce(F.col("c"), F.lit(0)))
                   .alias("cand_grams"),
                   F.sum(F.coalesce(F.col("cr"), F.lit(0)))
                   .alias("ref_grams"),
                   F.sum(F.least(F.coalesce(F.col("c"), F.lit(0)),
                                 F.coalesce(F.col("cr"), F.lit(0))))
                   .alias("clip")))
    all_ids = (cand.select(F.col(id_col).alias("id"))
               .union(ref.select(F.col(id_col).alias("id")))
               .distinct())
    out = (all_ids.join(merged, "id", "left")
           .na.fill({"cand_grams": 0, "ref_grams": 0, "clip": 0}))
    mega_f = F.lit(float(MICRO))
    a = F.col("cand_grams").cast(dec)
    b = F.col("ref_grams").cast(dec)
    c = F.col("clip").cast(dec)
    mega = F.lit(MICRO).cast(dec)

    def ratio(num, den):
        return F.when(den > 0, _idiv_half_up(num * mega, den)
                      .cast("double") / mega_f) \
            .otherwise(F.lit(None).cast("double"))

    return (out.select(F.col("id").alias(id_col),
                       "cand_grams", "ref_grams", "clip",
                       ratio(c, a).alias("precision"),
                       ratio(c, b).alias("recall"),
                       ratio(F.lit(2).cast(dec) * c, a + b).alias("f1"))
            .orderBy(id_col))


def html_to_text(col) -> "Column":
    """HTML → plain text as a pure Column expression chain (zero
    shuffle, whole-stage codegen) — the extraction step between a WARC
    crawl ingest (`sources/warc.py`) and the documents-table families
    (quality, dedup, LM scoring):

    1. script/style/comment blocks removed outright (content AND tags),
    2. block-level closers (</p>, </div>, </li>, </h1-6>, </tr>, <br>)
       become newlines so line-based cleaners keep their structure,
    3. every remaining tag becomes a space,
    4. the five core entities decode (&lt; &gt; &quot; &#39; &nbsp;
       first, &amp; LAST so '&amp;lt;' correctly yields '&lt;' — the
       double-decode ordering rule),
    5. intra-line whitespace collapses, line edges trim, blank-line
       runs collapse, outer edges trim.

    Every pattern is RE2-safe (no backreferences/lookarounds), so the
    oracle restates the chain verbatim in DuckDB regexp_replace(...,
    'g') — q_html_text value-hashes the whole ladder."""
    x = col.cast("string")
    steps = [
        (r"(?is)<script[^>]*>.*?</script>", " "),
        (r"(?is)<style[^>]*>.*?</style>", " "),
        (r"(?s)<!--.*?-->", " "),
        (r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr)[^>]*>", "\n"),
        (r"<[^>]+>", " "),
        (r"&lt;", "<"), (r"&gt;", ">"), (r"&quot;", "\""),
        (r"&#39;", "'"), (r"&nbsp;", " "), (r"&amp;", "&"),
        (r"[ \t]+", " "),
        (r" ?\n ?", "\n"),
        (r"\n{2,}", "\n"),
        # trim() strips SPACES only on both engines — drop edge
        # newlines explicitly (RE2-safe anchors)
        (r"^\n+", ""), (r"\n+$", ""),
    ]
    for pat, rep in steps:
        x = F.regexp_replace(x, pat, rep)
    return F.trim(x)


def with_html_text(df: DataFrame, html_col: str = "payload",
                   out_col: str = "text") -> DataFrame:
    """`html_to_text` applied as a column — the WARC→documents bridge."""
    return df.withColumn(out_col, html_to_text(F.col(html_col)))


def with_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch readability signals (Flesch 1948 / Kincaid 1975) — the
    classic curation-time audience-level filter next to the Gopher
    battery: adds (n_words, n_sentences, n_syllables, flesch_ease,
    fk_grade).

        ease  = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
        grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59

    Counts are whole-text regexp aggregates (zero shuffle, one codegen
    projection over the scan): W = the shared `_words` tokenization,
    S = '[.!?]+' runs (min 1 — headless fragments count as one
    sentence), Y = '[aeiouy]+' vowel groups on the lowercased text
    clamped to >= W (each word carries at least one syllable — the
    standard heuristic's floor; vowel-less tokens would otherwise
    deflate Y).  Both scores assemble as EXACT integer arithmetic:
    each ratio term is one `_idiv_half_up` micro ratio, the constants
    are exact micro literals, so the final values are engine-exact
    (no double rounds anywhere)."""
    from flood_data_spark.datapipe.linalg import _idiv_half_up

    dec = "decimal(38,0)"
    t = _nn(F.col(text_col))
    w = F.greatest(F.size(_words(F.col(text_col))), F.lit(1)) \
        .cast("long")
    s = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)) \
        .cast("long")
    vg = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("long")
    out = (df.withColumn("n_words", w)
           .withColumn("n_sentences", s)
           .withColumn("n_syllables", F.greatest(vg, w)))
    wd = F.col("n_words").cast(dec)
    sd = F.col("n_sentences").cast(dec)
    yd = F.col("n_syllables").cast(dec)
    ws = _idiv_half_up(F.lit(1015000).cast(dec) * wd, sd)
    yw = _idiv_half_up(F.lit(84600000).cast(dec) * yd, wd)
    gws = _idiv_half_up(F.lit(390000).cast(dec) * wd, sd)
    gyw = _idiv_half_up(F.lit(11800000).cast(dec) * yd, wd)
    mega_f = F.lit(1e6)
    return (out.withColumn(
        "flesch_ease",
        (F.lit(206835000).cast(dec) - ws - yw).cast("double") / mega_f)
        .withColumn(
        "fk_grade",
        (gws + gyw - F.lit(15590000).cast(dec)).cast("double") / mega_f))


def zipf_fit(df: DataFrame, text_col: str = "text",
             top_ranks: int = 1000) -> DataFrame:
    """Zipf rank-frequency fit — the corpus-level QA tripwire next to
    Benford (operators/stats): natural language follows
    freq(rank) ∝ rank^(-s) with s ≈ 1; template-generated, spammy, or
    deduplication-damaged corpora bend the log-log line.  Fits OLS on
    (ln rank, ln freq) over the top `top_ranks` terms of the shared
    `_words` tokenization:

        slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²),   x=ln r, y=ln f

    Both logs quantize ONCE to integer micro-nats (nonnegative —
    floor(+0.5)); slope and intercept are then EXACT integer ratios
    over BIGINT sums (`_idiv_half_up`), so the fit is engine-exact.
    Rank ties break by term text (deterministic).  Shape: one
    token-volume explode + hash agg, then a vocabulary-bounded sort
    for the rank window and a scalar moments row — the corpus moves
    once, the fit is vocab-sized.  Returns one row
    (n_ranks, slope, intercept); n_ranks < 2 → NULL fit."""
    from pyspark.sql import Window

    from flood_data_spark.datapipe.linalg import _idiv_half_up

    if top_ranks < 1:
        raise ValueError(f"zipf_fit: top_ranks must be >= 1, got "
                         f"{top_ranks}")
    dec = "decimal(38,0)"
    MICRO = 1_000_000
    counts = (df.select(F.explode(_words(F.col(text_col)))
                        .alias("term"))
              .groupBy("term").agg(F.count(F.lit(1)).alias("f")))
    w = Window.partitionBy(F.lit(1)).orderBy(F.col("f").desc(),
                                             F.col("term").asc())
    ranked = (counts.withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= top_ranks))
    qx = F.floor(F.log(F.col("r").cast("double")) * MICRO
                 + F.lit(0.5)).cast(dec)
    qy = F.floor(F.log(F.col("f").cast("double")) * MICRO
                 + F.lit(0.5)).cast(dec)
    m = (ranked.select(qx.alias("_x"), qy.alias("_y"))
         .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
              F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy"),
              F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
              F.sum(F.col("_x") * F.col("_y")).alias("_sxy")))
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    den = n * F.col("_sxx") - sx * sx
    mega = F.lit(MICRO).cast(dec)
    mega_f = F.lit(float(MICRO))
    slope_q = F.when(den != 0,
                     _idiv_half_up((n * F.col("_sxy") - sx * sy)
                                   * mega, den))
    ic_q = F.when(den != 0,
                  _idiv_half_up(sy * mega - slope_q * sx, n * mega))
    return m.select(n.cast("long").alias("n_ranks"),
                    (slope_q.cast("double") / mega_f).alias("slope"),
                    (ic_q.cast("double") / mega_f).alias("intercept"))


def bleu_corpus(cand: DataFrame, ref: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", group_keys=("lang",),
                max_n: int = 4) -> DataFrame:
    """Corpus-level BLEU (Papineni et al. 2002) between aligned
    candidate/reference pairs, per group — the complement of [rouge_n]
    (per-document recall family) with BLEU's corpus-pooled clipped
    precisions and brevity penalty:

        p_n  = Σ_pairs clip_n / Σ_pairs cand_grams_n      (n = 1..max_n)
        BP   = min(1, e^(1 − r/c)),  c/r = total cand/ref tokens
        BLEU = BP · exp( (1/N) Σ_n ln p_n )

    Group keys ride the CANDIDATE side; references join by id.  The
    gram machinery is the [rouge_n] chain generalized: ONE tokenize per
    side, the order dimension exploded from a literal 1..N array, ONE
    (id, n, gram)-keyed inner join for the clipped overlap (gram
    multiplicity lives in counts, never join fan-out).  Determinism:
    p_n closes to integer micros (`_idiv_half_up`); each ln p_n
    quantizes ONCE to signed micro-nats, their mean is an exact integer
    halving, and exp/BP take one quantized seam each — five bounded
    seams total, every one on a value derived from exact integers, so
    both engines walk identical IEEE trees.  Degenerate groups (no
    candidate grams at some order n — all texts shorter than n) report
    NULL bleu; a zero clip at any order reports bleu = 0 (the standard
    unsmoothed convention).  Returns (keys…, c_len, r_len, p1..pN, bp,
    bleu), sorted."""
    if max_n < 1:
        raise ValueError("bleu_corpus: max_n must be >= 1")
    from flood_data_spark.datapipe.linalg import _idiv_half_up
    MICRO = 1_000_000
    dec = "decimal(38,0)"
    keys = list(group_keys)
    if not keys:
        raise ValueError("bleu_corpus: need at least one group key")

    def toks(df, with_keys):
        # array_remove drops the '' token that split() yields for an
        # empty/whitespace-only text — such rows must contribute ZERO
        # tokens to c_len/r_len and no grams (the standard zero-token
        # treatment), not one spuriously-matchable empty unigram
        w = F.array_remove(F.split(F.lower(F.regexp_replace(
            F.trim(F.col(text_col)), r"\s+", " ")), " "), "")
        cols = keys if with_keys else []
        return df.select(*cols, F.col(id_col).alias("id"),
                         w.alias("w"), F.size(w).alias("_len"))

    ct = toks(cand, True)
    rt = toks(ref, False)

    def grams(t, cols):
        # ONE transform() per order builds the whole row's gram list
        # with `w` evaluated per ROW — Catalyst would otherwise inline
        # the (possibly derived) tokenization into the per-position
        # projection and retokenize per GRAM, turning the explode
        # quadratic (measured 34 s -> ~4 s at sf0.1 on q_bleu)
        per_n = F.array(*[
            F.struct(
                F.lit(n).alias("n"),
                F.expr(
                    f"CASE WHEN size(w) >= {n} THEN "
                    f"transform(sequence(1, size(w) - {n - 1}), "
                    f"p -> concat_ws(' ', slice(w, p, {n}))) "
                    f"ELSE array() END").alias("gs"))
            for n in range(1, max_n + 1)])
        return (t.select(*cols, "id", F.explode(per_n).alias("_o"))
                .select(*cols, "id", F.col("_o.n").alias("n"),
                        F.explode("_o.gs").alias("g"))
                .groupBy(*cols, "id", "n", "g")
                .agg(F.count(F.lit(1)).alias("c")))

    cg = grams(ct, keys)
    rg = grams(rt, []).withColumnRenamed("c", "cr")
    # clip and tot in ONE pass off a single cg instantiation (r16,
    # guide §2.4): rg is unique per (id, n, g) by construction, so the
    # left join cannot fan cg out — Σc over it is the old tot, and an
    # unmatched gram contributes least(c, 0) = 0 exactly like the old
    # inner-join + na.fill(0).  The previous tot ⟕ clip shape
    # instantiated the gram-explode subtree twice and paid an extra
    # join exchange pair.
    pern = (cg.join(rg, ["id", "n", "g"], "left")
            .groupBy(*keys, "n")
            .agg(F.sum("c").alias("_tot"),
                 F.sum(F.least(F.col("c"),
                               F.coalesce(F.col("cr"), F.lit(0))))
                 .alias("_clip")))
    lens_c = ct.groupBy(*keys).agg(F.sum("_len").alias("c_len"))
    lens_r = (rt.join(ct.select(*keys, "id").distinct(), "id")
              .groupBy(*keys).agg(F.sum("_len").alias("r_len")))
    mega = F.lit(MICRO).cast(dec)
    mega_f = F.lit(float(MICRO))

    def seam(col):
        return (F.signum(col) * F.floor(F.abs(col) + F.lit(0.5))) \
            .cast("long")

    # Per-order seams happen in the LONG relation (one idiv + one ln
    # per row), and everything downstream references AGGREGATE OUTPUT
    # ATTRIBUTES — without this boundary Catalyst's projection
    # collapse re-inlines each p_n tree into every lq/suml/geo/bleu
    # reference and the codegen blows up to a 12 MiB task binary
    # (measured: 40 s of janino for a 5-row finish; 4 s after).
    cl = F.col("_clip").cast(dec)
    t = F.col("_tot").cast(dec)
    pq = F.when((F.col("_tot").isNotNull()) & (t > 0) & (cl > 0),
                _idiv_half_up(cl * mega,
                              F.greatest(t, F.lit(1).cast(dec))))
    scored = pern.select(*keys, "n", "_tot", "_clip",
                         pq.alias("_pq"))
    lq = F.when(F.col("_pq").isNotNull(),
                seam(F.log(F.col("_pq").cast("double") / mega_f)
                     * mega_f))
    scored = scored.withColumn("_lq", lq)
    has_t = F.col("_tot").isNotNull() & (F.col("_tot") > 0)
    wide = (scored.groupBy(*keys)
            .agg(*[F.max(F.when(F.col("n") == i, F.col("_pq")))
                   .alias(f"_p{i}") for i in range(1, max_n + 1)],
                 F.sum(F.when(has_t, 1).otherwise(0))
                 .alias("_kdef"),
                 F.max(F.when(has_t & (F.col("_clip") == 0), 1)
                       .otherwise(0)).alias("_zc"),
                 F.sum(F.col("_lq").cast(dec)).alias("_suml")))
    # lens_c drives: a group whose candidates have zero grams at
    # EVERY order (all texts empty) still surfaces, with c_len = 0
    # and NULL precisions/bp/bleu, instead of vanishing
    out = lens_c.join(wide, keys, "left").join(lens_r, keys, "left")
    defined = F.col("_kdef") == max_n
    zero_clip = F.col("_zc") == 1
    mean_l = _idiv_half_up(
        F.col("_suml") * F.lit(2).cast(dec),
        F.lit(2 * max_n).cast(dec))
    geo = seam(F.exp(mean_l.cast("double") / mega_f) * mega_f)
    c_dec = F.col("c_len").cast("double")
    r_dec = F.col("r_len").cast("double")
    bp = F.when(F.col("c_len") >= F.col("r_len"),
                F.lit(MICRO).cast("long")) \
        .otherwise(seam(F.exp((c_dec - r_dec) / c_dec) * mega_f))
    bleu = F.when(defined & zero_clip, F.lit(0.0)) \
        .when(defined,
              _idiv_half_up(bp.cast(dec) * geo.cast(dec), mega)
              .cast("double") / mega_f)
    sel = [*keys, "c_len", "r_len"]
    for i in range(1, max_n + 1):
        sel.append((F.col(f"_p{i}").cast("double") / mega_f)
                   .alias(f"p{i}"))
    sel.append(F.when(defined, bp.cast("double") / mega_f)
               .alias("bp"))
    sel.append(bleu.alias("bleu"))
    return out.select(*sel).orderBy(*keys)


def chrf(cand: DataFrame, ref: DataFrame, id_col: str = "doc_id",
         text_col: str = "text", orders=(2, 3, 4),
         beta: int = 2) -> DataFrame:
    """chrF between aligned candidate/reference pairs (Popović 2015) —
    the character-level third of the MT-metric trio ([bleu_corpus],
    [rouge_n]): tokenization-free, so it survives morphology and
    segmentation differences word metrics trip on.  Per pair:

        chrF_β = (1/N) Σ_n F_β(P_n, R_n),
        P_n = clip_n / cand_n,  R_n = clip_n / ref_n

    over character n-grams of the whitespace-stripped lowercased text.
    ENTIRELY integer: with clip c, cand total a, ref total b the
    per-order F_β collapses algebraically to the single exact ratio

        F_β = (1+β²)·c / (β²·b + a)

    so the whole score is a sum of `_idiv_half_up` integer ratios over
    N — ZERO IEEE seams, the strongest determinism class (vs BLEU's
    five).  Gram relations collapse per (id, n, gram) before ONE inner
    join (the [rouge_n] fan-out rule).  Orders where a pair has no
    grams on either side contribute F = 0 with the pair still emitted
    (chrF's convention: short texts score what they earn).  Returns
    (id, chrf) plus per-order f<n> columns, sorted by id."""
    if not orders or any(n < 1 for n in orders):
        raise ValueError("chrf: orders must be non-empty, each >= 1")
    if beta < 1:
        raise ValueError("chrf: beta must be >= 1")
    from flood_data_spark.datapipe.linalg import _idiv_half_up
    MICRO = 1_000_000
    dec = "decimal(38,0)"
    orders = [int(n) for n in orders]
    b2 = int(beta) * int(beta)

    def grams(df):
        s = F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                             r"\s+", "")
        base = df.select(F.col(id_col).alias("id"), s.alias("_s"),
                         F.length(s).alias("_len"))
        out = None
        for n in orders:
            g = (base.filter(F.col("_len") >= n)
                 .select("id", F.lit(n).alias("n"),
                         F.explode(F.sequence(
                             F.lit(1), F.col("_len") - F.lit(n - 1)))
                         .alias("pos"), "_s")
                 .select("id", "n",
                         F.substring(F.col("_s"), F.col("pos")
                                     .cast("int"), n).alias("g")))
            # substring with a column start needs expr form
            out = g if out is None else out.unionByName(g)
        return out.groupBy("id", "n", "g") \
            .agg(F.count(F.lit(1)).alias("c"))

    cg = grams(cand)
    rg = grams(ref).withColumnRenamed("c", "cr")
    ids = (cand.select(F.col(id_col).alias("id"))
           .union(ref.select(F.col(id_col).alias("id"))).distinct())
    # _a/_b/_clip in ONE pass off single cg/rg instantiations (r16,
    # guide §2.4): both gram tables are unique per (id, n, g) by
    # construction, so the full-outer join cannot fan either side out —
    # Σ coalesce(c, 0) / Σ coalesce(cr, 0) are the old tot_c/tot_r, and
    # least(coalesce(c,0), coalesce(cr,0)) is 0 exactly where the old
    # inner-join clip + na.fill(0) produced 0.  The previous shape
    # instantiated each gram-explode subtree twice and paid a
    # two-join chain.
    pern = (cg.join(rg, ["id", "n", "g"], "full")
            .groupBy("id", "n")
            .agg(F.sum(F.coalesce(F.col("c"), F.lit(0))).alias("_a"),
                 F.sum(F.coalesce(F.col("cr"), F.lit(0))).alias("_b"),
                 F.sum(F.least(F.coalesce(F.col("c"), F.lit(0)),
                               F.coalesce(F.col("cr"), F.lit(0))))
                 .alias("_clip")))
    mega = F.lit(MICRO).cast(dec)
    den = (F.lit(b2).cast(dec) * F.col("_b").cast(dec)
           + F.col("_a").cast(dec))
    fq = F.when(den > 0, _idiv_half_up(
        F.lit(1 + b2).cast(dec) * F.col("_clip").cast(dec) * mega,
        F.greatest(den, F.lit(1).cast(dec)))) \
        .otherwise(F.lit(0).cast(dec))
    scored = pern.select("id", "n", fq.alias("_f"))
    wide = (ids.join(scored, ["id"], "left")
            .groupBy("id")
            .agg(*[F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("_f"))),
                F.lit(0).cast(dec)).alias(f"_f{n}")
                for n in orders]))
    mega_f = F.lit(float(MICRO))
    total = None
    for n in orders:
        col = F.col(f"_f{n}")
        total = col if total is None else total + col
    chrf_q = _idiv_half_up(total, F.lit(len(orders)).cast(dec))
    sel = [F.col("id").alias(id_col),
           (chrf_q.cast("double") / mega_f).alias("chrf")]
    for n in orders:
        sel.append((F.col(f"_f{n}").cast("double") / mega_f)
                   .alias(f"f{n}"))
    return wide.select(*sel).orderBy(id_col)

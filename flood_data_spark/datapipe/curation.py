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

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _warn_global_window(op: str) -> None:
    """Loud guard on the empty-partition_cols fallbacks: a global ordered
    window serializes the relation through ONE task.  Fine for tests and
    bounded relations; a silent foot-gun at corpus scale — so it is no
    longer silent."""
    warnings.warn(
        f"{op}: empty partition_cols -> GLOBAL ordered window (all rows "
        "through a single task). Test-only; partition by source/shard at "
        "scale.", RuntimeWarning, stacklevel=3)


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
    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    parts = list(partition_cols or ())
    if not parts:
        _warn_global_window("pack_sequences")
    w = (Window.partitionBy(*parts).orderBy(order_col)
         if parts else Window.orderBy(order_col))
    cum_before = (F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
    # integer `div`, not `/`+cast: double division of a long cumulative sum
    # loses bits past 2^53 — reachable for corpus-scale token counts
    return (df
            .withColumn("_cum_before",
                        F.coalesce(cum_before, F.lit(0)).cast("long"))
            .withColumn("pack_id",
                        F.expr(f"_cum_before div {int(token_budget)}"))
            .drop("_cum_before"))


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


def assign_split(df: DataFrame, weights: dict[str, float],
                 key_col: str = "doc_id", salt: str = "",
                 out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: md5(key || salt)'s 4-hex
    prefix lands in one of the cumulative weight ranges, and the row gets
    that range's label.  A function of the KEY alone — stable across
    re-runs, engines, partition layouts, and incremental corpus growth (a
    document never migrates between splits when other documents arrive),
    which is exactly what DataFrame.randomSplit does not guarantee.

    Weights must sum to ~1; label order follows dict insertion order, so
    {'train': .9, 'val': .05, 'test': .05} puts train on [0, .9), etc.
    Pure per-row expression: no shuffle, no state.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 4)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        acc += w
        cond = prefix < F.lit(hash_cut(acc))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def leakage_safe_split(df: DataFrame, pairs: DataFrame,
                       weights: dict[str, float], id_col: str = "doc_id",
                       id_a: str = "id_a", id_b: str = "id_b",
                       salt: str = "", out_col: str = "split") -> DataFrame:
    """Cluster-aware split assignment: documents connected by a near-dup
    pair relation ALWAYS land in the same split — the guard against the
    classic leakage failure where `assign_split` puts one copy of a
    near-duplicate in train and its twin in test, silently inflating eval.

    `pairs` is any (id_a, id_b) near-dup relation (`ngram_jaccard_pairs`,
    `minhash_lsh_pairs`, `embedding_near_dup_pairs`, ...).  Connected
    components collapse it to one group id per document
    (`dedup_clusters`); the md5 split ladder then hashes the GROUP id, so
    every member of a component shares the group's fate, and documents
    with no near-dup keep their own id as the group key (identical to
    plain `assign_split` for them — adding pairs never reshuffles
    untouched documents).

    Adds `group_id` (the split key used) and `out_col`.  Cost on top of
    assign_split: the O(log diameter) label-propagation rounds over the
    PAIR relation only — corpus-size work stays one narrow left join.
    """
    from flood_data_spark.datapipe.dedup import dedup_clusters

    clusters = (dedup_clusters(pairs, id_a=id_a, id_b=id_b)
                .select(F.col("doc_id").alias(id_col), "cluster_id"))
    keyed = (df.join(clusters, id_col, "left")
             .withColumn("group_id",
                         F.coalesce(F.col("cluster_id"), F.col(id_col)))
             .drop("cluster_id"))
    return assign_split(keyed, weights, key_col="group_id", salt=salt,
                        out_col=out_col)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "source",
                      key_col: str = "doc_id", salt: str = "",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~rates[s] of
    its rows (default_rate for strata not listed), selected by the same
    md5-prefix cut as `hash_sample` — the up/down-weighting step of corpus
    mixing (e.g. books at 2x web rate).

    The rate table becomes a CASE ladder over the stratum column —
    per-row predicate, no shuffle, no join, reproducible everywhere.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    cut = None
    for s, r in rates.items():
        cond = F.col(stratum_col) == s
        cut = (F.when(cond, F.lit(hash_cut(r))) if cut is None
               else cut.when(cond, F.lit(hash_cut(r))))
    cut = (F.lit(hash_cut(default_rate)) if cut is None
           else cut.otherwise(F.lit(hash_cut(default_rate))))
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 4)
    return df.filter(prefix < cut)


def length_buckets(df: DataFrame, batch_size: int,
                   token_col: str = "n_tokens",
                   partition_cols=("source",),
                   order_col: str = "doc_id") -> DataFrame:
    """Length-bucketed batch assembly: documents go into power-of-two
    length buckets (bucket = bit_length(tokens) = floor(log2(tokens)) + 1,
    so sequences in a batch are within 2× of each other — bounded padding
    waste), then each bucket's documents are numbered into fixed-size
    batches in `order_col` order.

    Adds `bucket` (bit-length tier: 0 for empty docs, 1 for 1 token,
    2 for 2-3, 3 for 4-7, …) and `batch_id` (0-based within
    (partition_cols…, bucket)).  The tier is computed as the bit length
    of the token count (`length(bin(n))`) — pure integer arithmetic,
    portable to any engine with a binary formatter, no float log edge
    cases at exact powers of two.

    One ordered-window pass per (partition_cols…, bucket).  As with
    `pack_sequences`, `partition_cols` is mandatory at scale: an empty
    tuple numbers each bucket through a single task (fine for tests,
    corpus-serializing at 100 TB — number per shard/source and renumber
    downstream if global batch ids are needed).
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    parts = list(partition_cols or ())
    bucket = (F.when(F.col(token_col) <= 0, F.lit(0))
              .otherwise(F.length(F.bin(F.col(token_col))))).cast("long")
    out = df.withColumn("bucket", bucket)
    w = (Window.partitionBy(*parts, "bucket").orderBy(order_col))
    # integer div (same discipline as pack_sequences): no float division
    # on the counting path
    return (out
            .withColumn("_rn0", F.row_number().over(w).cast("long") - 1)
            .withColumn("batch_id", F.expr(f"_rn0 div {int(batch_size)}"))
            .drop("_rn0"))


def with_shuffle_key(df: DataFrame, seed: str = "0",
                     key_col: str = "doc_id",
                     out_col: str = "shuffle_key") -> DataFrame:
    """Deterministic corpus shuffle: adds a pseudo-random md5 sort key
    derived from (key, seed).  Writing ordered by it::

        with_shuffle_key(df, seed).repartitionByRange(N, "shuffle_key")
          .sortWithinPartitions("shuffle_key").write...

    gives a globally shuffled, reproducible training order WITHOUT a
    single-task global sort: repartitionByRange samples range bounds and
    each partition sorts locally.  Different seeds give independent
    orders (per-epoch reshuffle); ties are impossible for distinct keys
    (the key is part of the digest input).
    """
    return df.withColumn(
        out_col,
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":"),
                       F.lit(seed))))


def clean_lines(df: DataFrame, text_col: str = "text",
                out_col: str = "clean_text", min_words: int = 3,
                require_terminal: bool = True,
                terminal_pattern: str = r'[.!?"]$') -> DataFrame:
    """C4-style line-level filter: keep only lines with >= min_words
    whitespace tokens and (optionally) a terminal-punctuation ending;
    adds (n_lines, n_lines_kept, out_col).

    Entirely a per-row array expression — split / filter / array_join on
    the line array, ZERO shuffle; the filter streams at scan speed inside
    whole-stage codegen.  This is the cheap first cleaning pass that runs
    before any corpus-wide (shuffling) operator like `dedup_lines`.
    """
    lines = F.split(F.col(text_col), "\n")

    def _keep(l):
        t = F.trim(l)
        ok = F.size(F.split(t, r"\s+")) >= F.lit(min_words)
        if require_terminal:
            ok = ok & t.rlike(terminal_pattern)
        return ok

    kept = F.filter(lines, _keep)
    return (df.withColumn("n_lines", F.size(lines))
            .withColumn("n_lines_kept", F.size(kept))
            .withColumn(out_col, F.array_join(kept, "\n")))


def dedup_lines(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", out_col: str = "clean_text",
                max_doc_freq: int | None = None) -> DataFrame:
    """Cross-document line deduplication (the C4 move): each distinct
    normalized line survives only at its FIRST occurrence corpus-wide
    (min (doc, position) order); every later occurrence is removed.
    max_doc_freq additionally drops lines present in more than that many
    documents EVERYWHERE — boilerplate (headers, footers, cookie banners)
    removal and, at 100 TB, the skew guard: a line shared by k documents
    puts k rows into one window partition, and the boilerplate cap bounds
    k for exactly the lines where it explodes.

    Returns (id_col, n_lines, n_lines_kept, out_col) — one row per input
    document (empty clean_text when everything was removed); join back on
    id for the remaining columns.  Blank lines are structural, not
    content: always kept, never deduplicated.

    Plan shape: posexplode -> narrow (id, pos, line-hash) rows; one
    groupBy for the doc-freq cap, one window over the line hash for
    first-occurrence, one groupBy(id) to reassemble with an array_sort on
    (pos, line) — deterministic regardless of collect_list order.  The
    dedup key is xxhash64(normalized line): a 64-bit collision merges two
    unrelated lines (vanishingly rare, and only ever removes a line, never
    corrupts one).
    """
    rows = (df.select(F.col(id_col).alias("id"),
                      F.posexplode(F.split(F.col(text_col), "\n"))
                      .alias("pos", "line"))
            .withColumn("nrm", F.lower(F.trim(F.col("line")))))
    content = rows.filter(F.col("nrm") != "").withColumn(
        "lh", F.xxhash64("nrm"))
    if max_doc_freq is not None:
        if max_doc_freq < 1:
            raise ValueError(
                f"max_doc_freq must be >= 1, got {max_doc_freq}")
        hot = (content.groupBy("lh")
               .agg(F.countDistinct("id").alias("line_df"))
               .filter(F.col("line_df") > max_doc_freq)
               .select("lh"))
        content = content.join(hot, "lh", "left_anti")
    w = Window.partitionBy("lh").orderBy("id", "pos")
    first = (content.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .select("id", "pos", "line"))
    blanks = rows.filter(F.col("nrm") == "").select("id", "pos", "line")
    kept = first.unionByName(blanks)
    totals = rows.groupBy("id").agg(F.count("*").alias("n_lines"))
    rebuilt = (kept.groupBy("id")
               .agg(F.count("*").alias("n_lines_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("pos", "line"))),
                            lambda x: x["line"]),
                        "\n").alias(out_col)))
    return (totals.join(rebuilt, "id", "left")
            .na.fill({"n_lines_kept": 0})
            .na.fill({out_col: ""})
            .select(F.col("id").alias(id_col),
                    "n_lines", "n_lines_kept", out_col))


def cap_per_key(df: DataFrame, cap: int, partition_cols=("source",),
                order_col: str = "doc_id") -> DataFrame:
    """Keep at most `cap` rows per key (anti-over-representation: cap
    documents per domain/source/site), deterministically — the first `cap`
    in `order_col` order survive.  One window pass; the helper column is
    dropped so the schema is unchanged."""
    parts = list(partition_cols or ())
    if not parts:
        _warn_global_window("cap_per_key")
    w = (Window.partitionBy(*parts).orderBy(order_col)
         if parts else Window.orderBy(order_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn"))


def suppress_rare_combinations(df: DataFrame, quasi_cols,
                               k: int = 5) -> DataFrame:
    """k-anonymity-style suppression: drop every row whose combination of
    quasi-identifier columns occurs fewer than `k` times in the corpus —
    the coarse re-identification guard a privacy pass applies before text
    ships (a (lang, source, ...) combo seen once pins a document to an
    individual contributor; a combo seen k times hides in a crowd of k).

    Plan: one combo-keyed count aggregate (map-side combining; the
    shuffle carries distinct combos, not rows) + one left-semi join back
    on the same keys — co-partitioned, no second exchange of the fact
    side beyond the join's own.  Heuristic, not a privacy proof (the
    usual k-anonymity caveats: it composes with redact_pii, it does not
    bound linkage across releases).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    quasi = list(quasi_cols)
    if not quasi:
        raise ValueError("quasi_cols must be non-empty")
    frequent = (df.groupBy(*quasi)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") >= k)
                .drop("_n"))
    return df.join(frequent, quasi, "left_semi")


def dsir_weights(df: DataFrame, target: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 alpha: float = 0.5) -> DataFrame:
    """DSIR (Data Selection with Importance Resampling, Xie et al. 2023)
    importance weights over a unigram feature space: for each raw-corpus
    document, log w(d) = sum_t c(t, d) * [ln p_target(t) - ln p_raw(t)]
    — how much more likely the document is under the target domain's
    token distribution than under the raw corpus's.  Selecting the
    highest-weight documents tilts a 100 TB crawl toward a (small, clean)
    target domain without training a classifier.

    Both unigram LMs use the same Lidstone smoothing as
    `unigram_lm_scores` (alpha, one spare slot), with V = the UNION
    vocabulary so the two distributions share a support and the
    log-ratio is finite everywhere.

    Plan shape: two vocabulary-bounded (term, count) aggregates (target
    side is tiny by construction), a full-outer vocabulary join to build
    the shared log-ratio table, then one join of the corpus's (id, term)
    explode against that table on the term key — the same
    vocabulary-keyed shape as unigram_lm_scores, no UDF, no driver
    vocabulary.  Totals broadcast as one scalar row.  Everything is ANSI
    arithmetic (q_dsir_weights value-hashes it).

    Returns (id_col, n_tokens, log_weight, avg_log_weight) with
    zero-token documents visible (n_tokens=0, null weights); rank by
    log_weight (length-biased, the paper's form) or avg_log_weight
    (length-normalized) downstream.
    """
    agg = _dsir_agg(df, target, id_col, text_col, alpha)
    ids = df.select(F.col(id_col)).distinct()
    return (ids.join(agg, id_col, "left")
            .withColumn("n_tokens",
                        F.coalesce(F.col("n_tokens"), F.lit(0))))


def _dsir_agg(df: DataFrame, target: DataFrame, id_col: str,
              text_col: str, alpha: float) -> DataFrame:
    """Shared DSIR core: (id_col, n_tokens, log_weight, avg_log_weight)
    for every document with >= 1 token.  `dsir_weights` adds the
    zero-token visibility join on top; `dsir_select` consumes this
    directly — its n_tokens > 0 cut would otherwise pay a full corpus
    scan + id-space distinct shuffle just to discard the added rows."""
    from flood_data_spark.datapipe.text import term_rows

    raw_lm = (term_rows(df, id_col, text_col)
              .groupBy("term").agg(F.count("*").alias("raw_count")))
    tgt_lm = (term_rows(target, id_col, text_col)
              .groupBy("term").agg(F.count("*").alias("tgt_count")))
    # localCheckpoint: `vocab` feeds BOTH the totals aggregate and the
    # scoring join — without it Spark recomputes the whole subtree
    # (including the corpus-sized raw_lm aggregation) once per consumer;
    # the checkpointed relation is vocabulary-bounded, so materializing
    # it costs megabytes while saving a second pass over the corpus.
    # Lazy (eager=False): blocks persist at first use, no extra action.
    vocab = (raw_lm.join(tgt_lm, "term", "full_outer")
             .na.fill({"raw_count": 0, "tgt_count": 0})
             .localCheckpoint(eager=False))
    totals = F.broadcast(vocab.agg(
        F.sum("raw_count").alias("raw_total"),
        F.sum("tgt_count").alias("tgt_total"),
        F.count("*").alias("vocab_size")))
    ratio = (vocab.crossJoin(totals)
             .select(
                 "term",
                 (F.log((F.col("tgt_count") + F.lit(alpha))
                        / (F.col("tgt_total")
                           + F.lit(alpha) * (F.col("vocab_size") + 1)))
                  - F.log((F.col("raw_count") + F.lit(alpha))
                          / (F.col("raw_total")
                             + F.lit(alpha) * (F.col("vocab_size") + 1)))
                  ).alias("log_ratio")))
    doc_terms = term_rows(df, id_col, text_col)
    return (doc_terms.join(ratio, "term")
            .groupBy(F.col("id").alias(id_col))
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.sum("log_ratio"), 6).alias("log_weight"),
                 F.round(F.avg("log_ratio"), 6).alias("avg_log_weight")))


def dsir_select(df: DataFrame, target: DataFrame, n: int,
                id_col: str = "doc_id", text_col: str = "text",
                alpha: float = 0.5, temperature: float = 1.0) -> DataFrame:
    """DSIR selection step: Gumbel-top-n resampling WITHOUT replacement
    from softmax(log_weight / temperature) — the paper's sampler, made
    deterministic by deriving each document's uniform from md5(id) (the
    same engine-portable hash trick as `hash_sample`), so the selected
    set is reproducible across runs, partitionings, and engines.

    key(d) = log_weight(d) / temperature - ln(-ln(u(d))),
    u(d) = (md5(id) first 13 hex digits) / 16^13  in (0, 1).

    13 hex digits = 52 bits: the numerator is exactly representable in an
    IEEE double and the divisor is a power of two, so u — and therefore
    the Gumbel key — is bit-identical in any engine computing the same
    expression (the value oracle depends on this).

    One TakeOrdered over the weights relation — no global sort.
    """
    if temperature <= 0:
        raise ValueError(
            f"dsir_select: temperature must be > 0, got {temperature} "
            "(0 divides by zero; negative silently inverts the ranking)")
    # _dsir_agg only emits documents with >= 1 token, so the zero-token
    # visibility join (and the n_tokens > 0 cut it would force) is skipped
    w = _dsir_agg(df, target, id_col, text_col, alpha)
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13),
                16, 10).cast("double")
         / F.lit(float(16 ** 13)))
    # clamp away exact 0 (ln(0) = -inf) — md5 prefix 000..0
    u = F.greatest(u, F.lit(1e-18))
    return (w.withColumn("gumbel_key",
                        F.round(F.col("log_weight") / F.lit(temperature)
                                - F.log(-F.log(u)), 6))
            .orderBy(F.desc("gumbel_key"), F.asc(id_col))
            .limit(n))


def source_mixture_weights(df: DataFrame, alpha: float = 0.3,
                           group_col: str = "source",
                           text_col: str = "text") -> DataFrame:
    """Temperature-scaled corpus mixture weights: per source (or language,
    or any grouping), sampling weight proportional to (token share)^alpha —
    the standard multinomial-temperature rebalancing (alpha=0.3 is the
    XLM-R/mBERT choice) that up-samples small sources and flattens
    over-represented ones when assembling a multi-source training mix.

    Returns (group_col, n_docs, n_tokens, token_share, weight) with
    weights summing to 1 over the groups present.

    Plan: ONE corpus scan into a per-group aggregate (token counts ride as
    a scalar `token_count` expression — no explode), then the
    normalization joins the group-sized relation against its own one-row
    total as a broadcast cross — group-bounded work end-to-end after the
    scan, no window, no UDF; fully ANSI (q_mixture_weights value-hashes
    it).  At 100 TB the scan is the cost; everything after is |groups|
    rows.
    """
    from flood_data_spark.datapipe.text import token_count

    if alpha <= 0:
        raise ValueError("source_mixture_weights: alpha must be > 0")
    # localCheckpoint: per_group feeds BOTH the totals scalar and the
    # weight projection — without it each consumer recomputes the
    # corpus-sized scan+aggregate (the same recompute class the DSIR/
    # bigram LM tables fixed); the persisted relation is |groups| rows.
    per_group = (df.groupBy(group_col)
                 .agg(F.count("*").alias("n_docs"),
                      F.sum(token_count(F.col(text_col)))
                      .alias("n_tokens"))
                 .localCheckpoint(eager=False))
    totals = F.broadcast(per_group.agg(
        F.sum("n_tokens").alias("total_tokens")))
    shared = (per_group.crossJoin(totals)
              .withColumn("token_share",
                          F.col("n_tokens")
                          / F.col("total_tokens").cast("double"))
              .withColumn("_scaled", F.pow(F.col("token_share"),
                                           F.lit(alpha))))
    norm = F.broadcast(shared.agg(F.sum("_scaled").alias("_z")))
    return (shared.crossJoin(norm)
            .select(group_col, "n_docs", "n_tokens",
                    F.round("token_share", 6).alias("token_share"),
                    F.round(F.col("_scaled") / F.col("_z"), 6)
                    .alias("weight")))


def plan_mixture(df: DataFrame, token_budget: int, alpha: float = 0.3,
                 group_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Turn temperature mixture WEIGHTS into an executable sampling PLAN:
    per group, the token target (weight × budget) and the deterministic
    sampling rate min(1, target/actual) that `stratified_sample` then
    applies — the step that actually BUILDS the training mix a
    source_mixture_weights policy describes::

        plan  = plan_mixture(docs, token_budget=10**12)
        rates = {r[0]: r.rate for r in plan.select(group_col, "rate").collect()}
        mix   = stratified_sample(docs, rates)          # group-bounded collect

    Rates cap at 1.0 — a group whose target exceeds its actual tokens
    contributes everything it has (log the shortfall downstream if
    up-sampling-with-replacement is wanted; deterministic hash sampling
    can't replicate rows).  Empty groups rate 0.  Same plan shape as
    source_mixture_weights: one corpus scan, then group-bounded
    arithmetic.
    """
    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    w = source_mixture_weights(df, alpha, group_col, text_col)
    target = F.round(F.col("weight") * F.lit(float(token_budget))) \
        .cast("long")
    out = w.withColumn("target_tokens", target)
    rate = F.when(
        F.col("n_tokens") > 0,
        F.least(F.lit(1.0),
                F.round(F.col("target_tokens")
                        / F.col("n_tokens").cast("double"), 6))) \
        .otherwise(F.lit(0.0))
    return out.select(group_col, "n_docs", "n_tokens", "weight",
                      "target_tokens", rate.alias("rate"))


def rank_normalize(df: DataFrame, value_col: str,
                   partition_cols=("source",),
                   out_col: str = "pct_rank") -> DataFrame:
    """Per-group rank normalization: percent_rank of `value_col` within
    each partition group, in [0, 1] (ties share a rank; a single-row
    group scores 0) — the per-domain quality-threshold primitive.  A
    fixed GLOBAL score cutoff over-prunes weak domains and under-prunes
    strong ones; cutting at the same PERCENTILE within each source
    removes the same fraction everywhere (the CCNet per-language-bucket
    discipline).

    One window pass per group.  Same scale caveat as pack_sequences:
    partitions are group-sized, so partition by source/shard — an empty
    `partition_cols` ranks globally through a single task (test-only).
    """
    parts = list(partition_cols or ())
    if not parts:
        _warn_global_window("rank_normalize")
    w = (Window.partitionBy(*parts).orderBy(F.col(value_col).asc())
         if parts else Window.orderBy(F.col(value_col).asc()))
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 6))


def quality_tiers(df: DataFrame, value_col: str,
                  partition_cols=("source",),
                  cuts=(1.0 / 3, 2.0 / 3),
                  labels=("head", "middle", "tail"),
                  higher_is_better: bool = False,
                  out_col: str = "tier",
                  rank_col: str = "pct_rank") -> DataFrame:
    """CCNet-style quality tiers: within each group, label each row
    head/middle/tail by the percent-rank of `value_col` — the published
    CCNet partitioning (Wenzek et al. 2020 §4.3: per-language perplexity
    terciles; 'head' trains the model, 'tail' gets dropped or
    down-weighted).  Composes `rank_normalize`, so the same per-group
    discipline applies: a global cutoff over-prunes weak groups; tiering
    WITHIN each group removes the same fraction everywhere.

    `higher_is_better=False` (default) fits perplexity-like scores (low =
    good → head); True fits quality scores (high = good).  `cuts` are
    percent-rank boundaries (rank < cuts[0] → labels[0], < cuts[1] →
    labels[1], else labels[2]); ties share a rank, hence a tier.  Pure
    window + CASE ladder — ANSI-expressible for the value oracle.
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(cuts)+1 labels, got {len(cuts)} cuts / "
            f"{len(labels)} labels")
    if list(cuts) != sorted(cuts):
        raise ValueError(f"cuts must be ascending, got {cuts}")
    ranked = rank_normalize(df, value_col, partition_cols,
                            out_col=rank_col)
    eff = (F.lit(1.0) - F.col(rank_col)) if higher_is_better \
        else F.col(rank_col)
    expr = None
    for cut, label in zip(cuts, labels[:-1]):
        branch = (eff < F.lit(cut), F.lit(label))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    # cuts=() is a legal degenerate form (one label for every row) —
    # same guard as assign_split's ladder
    tier = (F.lit(labels[-1]) if expr is None
            else expr.otherwise(F.lit(labels[-1])))
    return ranked.withColumn(out_col, tier)


def impute_missing(df: DataFrame, value_col: str, group_cols=(),
                   strategy: str = "median",
                   out_col: str | None = None) -> DataFrame:
    """Fill NULLs in `value_col` with a per-group statistic — the
    tabular-cleaning step between "drop the row" and "train a model to
    fill it":

    - ``median``: exact percentile(0.5) per group (one percentile buffer
      — the q_threshold_summary trick, linear-interpolated, matches
      DuckDB quantile_cont bit-for-bit);
    - ``mean``: integer micro-unit sums / count (a division of exact
      integers — the features.py discipline), so the fill is
      engine-portable;
    - ``mode``: most frequent non-null value, ties broken by LOWEST
      value (deterministic): one (group, value) count + one min_by over
      a (count DESC → via negation, value ASC) struct ordering.

    Plan: a group-cardinality aggregate + a broadcast join back; NULL
    rows never shuffle.  Empty `group_cols` computes one global fill
    value (a 1-row broadcast — fine at any scale, unlike the global
    windows `pack_sequences` warns about).  A group whose values are ALL
    NULL keeps its NULLs (no statistic exists) — count them with
    `plans.checks` if that's a contract violation.

    Adds `out_col` (default: overwrite `value_col`); the original NULL
    mask is recoverable via `was_imputed`.
    """
    if strategy not in ("median", "mean", "mode"):
        raise ValueError(f"impute_missing: unknown strategy {strategy!r}")
    keys = list(group_cols)
    out = out_col or value_col
    v = F.col(value_col)
    nn = df.filter(v.isNotNull())
    if strategy == "median":
        fill = F.percentile(v, F.lit(0.5)).alias("_fill")
    elif strategy == "mean":
        fill = ((F.sum(F.round(v * 1_000_000).cast("long")).cast("double")
                 / F.count(F.lit(1)) / 1_000_000).alias("_fill"))
    else:   # mode
        fill = F.min_by(
            "_v", F.struct((-F.col("_n")).alias("neg"),
                           F.col("_v").alias("v"))).alias("_fill")
    if strategy == "mode":
        counts = (nn.groupBy(*keys, v.alias("_v"))
                  .agg(F.count(F.lit(1)).alias("_n")))
        stats = counts.groupBy(*keys).agg(fill)
    else:
        stats = nn.groupBy(*keys).agg(fill)
    if keys:
        joined = df.join(F.broadcast(stats), on=keys, how="left")
    else:
        joined = df.crossJoin(F.broadcast(stats))
    return (joined
            .withColumn("was_imputed", v.isNull()
                        & F.col("_fill").isNotNull())
            .withColumn(out, F.coalesce(v, F.col("_fill")))
            .drop("_fill"))


def url_host(col) -> "Column":
    """Lower-cased host (authority minus port/userinfo) of a URL — the
    per-domain key for crawl caps (`cap_per_key`) and domain mixtures."""
    auth = F.regexp_extract(col.cast("string"),
                            r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":\d+$", ""))


def normalize_url(col) -> "Column":
    """Canonical URL for crawl-level dedup — the normalization every
    web pipeline runs BEFORE content dedup (two fetches of one page
    must collide on the key, not survive as near-dups):

    - scheme and host lower-case; userinfo dropped,
    - default ports stripped (:80 for http, :443 for https),
    - fragment dropped,
    - tracking parameters dropped (utm_*, fbclid, gclid),
    - remaining query parameters SORTED (order-insensitive equality),
    - empty path becomes '/', a now-empty query drops its '?'.

    Deliberately conservative: no path case-folding (paths are
    case-sensitive), no trailing-slash merge (different resources).
    The parameter sort/filter rides array lambdas — interpreted, not
    codegen (the SCALE_NOTES round-12 lesson), which is fine here: URL
    volume is rows, not corpus tokens, and the oracle mirrors the
    identical list operations."""
    u = col.cast("string")
    scheme = F.lower(F.regexp_extract(
        u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = url_host(col)
    port = F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*?(:\d+)?(?:[/?#]|$)", 1)
    keep_port = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443")), F.lit("")) \
        .otherwise(port)
    path = F.regexp_extract(u, r"^[^:]+://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # anchor before any '#': a '?' INSIDE the fragment (hash-bang SPA
    # URLs) must not be mistaken for a query start — the fragment is
    # dropped wholesale, never leaked into the dedup key
    query = F.regexp_extract(u, r"^[^#?]*\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike("^(utm_[^=]*|fbclid|gclid)=")))
    qnorm = F.array_join(params, "&")
    return F.concat(
        scheme, F.lit("://"), host, keep_port, path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                          qnorm)))


def with_url_keys(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds (url_host, url_norm) — the crawl dedup/cap keys."""
    return (df.withColumn("url_host", url_host(F.col(url_col)))
            .withColumn("url_norm", normalize_url(F.col(url_col))))


def neyman_allocation(df: DataFrame, value_col: str, stratum_cols,
                      total_n: int) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934) — the
    eval-set construction step next to `stratified_split`: given a
    target budget of `total_n` samples, allocate to stratum h in
    proportion to N_h·S_h (population size × within-stratum std), the
    allocation that minimizes the variance of the stratified mean:

        n_h = total_n · N_h·S_h / Σ_k N_k·S_k,   capped at N_h.

    Value chain: one exact-integer moments exchange per stratum (the
    linalg discipline), S_h via ONE IEEE sqrt of the exact centered
    quadratic quantized to integer micro (floor(sqrt(A)/n + 0.5) —
    per-factor, the ACC rule), weights N_h·S_h_micro exact BIGINTs, the
    grand total broadcast back as a 1-row relation (scalar-rejoin), and
    each n_h one exact integer ratio (`_idiv_half_up`) capped at N_h.
    Half-up rounding leaves a ±(#strata/2) residual vs total_n by
    design (largest-remainder correction is a policy layer, not this
    operator).  Zero-variance strata get S=0 and draw nothing —
    standard Neyman behavior (their mean is known exactly from any one
    element); all-zero total weight → NULL allocations.  Returns
    (stratum_cols..., n_pop, sd, alloc) sorted by strata."""
    from flood_data_spark.datapipe.linalg import _idiv_half_up

    keys = list(stratum_cols)
    if not keys:
        raise ValueError("neyman_allocation: need stratum columns")
    if total_n < 0:
        raise ValueError(
            f"neyman_allocation: total_n must be >= 0, got {total_n}")
    MICRO = 1_000_000
    dec = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    qv = (F.signum(v) * F.floor(F.abs(v) * MICRO + F.lit(0.5))) \
        .cast(dec)
    m = (df.select(*keys, qv.alias("_q"))
         .groupBy(*keys)
         .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
              F.sum("_q").alias("_s"),
              F.sum(F.col("_q") * F.col("_q")).alias("_s2")))
    a = m.withColumn("_a", F.col("_n") * F.col("_s2")
                     - F.col("_s") * F.col("_s"))
    # S_h micro = floor(sqrt(A)/n + 0.5): one sqrt seam per stratum
    s_q = F.floor(F.sqrt(F.col("_a").cast("double"))
                  / F.col("_n").cast("double") + F.lit(0.5)).cast(dec)
    w = a.withColumn("_w", F.col("_n") * s_q)
    tot = w.agg(F.sum("_w").alias("_tw"))
    j = w.crossJoin(F.broadcast(tot))
    alloc_q = F.when(
        F.col("_tw") > 0,
        F.least(_idiv_half_up(F.lit(int(total_n)).cast(dec)
                              * F.col("_w"), F.col("_tw")),
                F.col("_n")).cast("long"))
    mega_f = F.lit(float(MICRO))
    return (j.select(*keys, F.col("_n").cast("long").alias("n_pop"),
                     (s_q.cast("double") / mega_f).alias("sd"),
                     alloc_q.alias("alloc"))
            .orderBy(*keys))


def fim_transform(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", rate: float = 0.5,
                  min_len: int = 16, salt: str = "fim",
                  pre_tok: str = "<|fim_pre|>",
                  suf_tok: str = "<|fim_suf|>",
                  mid_tok: str = "<|fim_mid|>") -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022 — the
    document-level permutation that teaches a causal LM to infill):
    for ~`rate` of documents (the [hash_cut] md5-prefix predicate —
    a function of the KEY, so re-runs/engines/partitionings pick the
    SAME docs) of at least `min_len` characters, split the text at two
    deterministic pseudo-random character offsets and emit PSM order:

        fim_text = PRE + prefix + SUF + suffix + MID + middle

    Cut points are pure arithmetic on the md5 of the id STRING (two
    60-bit hex windows of md5(id||salt||'/cuts') mod (len−1), min/max
    ordered — engine-portable, no RNG state, and valid for ANY id
    type: a non-numeric or negative id hashes exactly like an
    integral one, unlike the previous LCG-on-cast(long) scheme that
    emitted NULL cuts for ids that don't cast), so the whole operator
    is a zero-shuffle projection:
    substring/length/concat on the scan, exactly what a 100-TB corpus
    pass wants.  Untransformed rows (rate miss or too short) pass
    through with fim_applied = false and fim_text = text.  Returns
    (id, fim_applied, prefix, middle, suffix, fim_text)."""
    if min_len < 3:
        raise ValueError(f"fim_transform: min_len must be >= 3, "
                         f"got {min_len}")
    cut = hash_cut(rate)
    idc = F.col(id_col)
    txt = F.col(text_col)
    ln = F.length(txt)
    chosen = (F.substring(
        F.md5(F.concat(idc.cast("string"), F.lit(salt))), 1, 4)
        < F.lit(cut)) & (ln >= F.lit(min_len))
    span = (ln - F.lit(1)).cast("long")
    # Seeds from the md5 of the id STRING (15 hex chars = 60 bits,
    # always non-negative) — a distinct '/cuts' salt so the cut
    # positions are independent of the rate-selection prefix above.
    hx = F.md5(F.concat(idc.cast("string"), F.lit(salt + "/cuts")))
    s1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    s2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")
    c1 = F.lit(1) + s1 % span
    c2 = F.lit(1) + s2 % span
    p1 = F.least(c1, c2)
    p2 = F.greatest(c1, c2)
    prefix = F.substring(txt, F.lit(1), p1.cast("int"))
    middle = F.substring(txt, (p1 + 1).cast("int"),
                         (p2 - p1).cast("int"))
    suffix = F.substring(txt, (p2 + 1).cast("int"),
                         (ln - p2).cast("int"))
    fim_text = F.concat(F.lit(pre_tok), prefix, F.lit(suf_tok),
                        suffix, F.lit(mid_tok), middle)
    return df.select(
        idc.alias("id"),
        chosen.alias("fim_applied"),
        F.when(chosen, prefix).alias("prefix"),
        F.when(chosen, middle).alias("middle"),
        F.when(chosen, suffix).alias("suffix"),
        F.when(chosen, fim_text).otherwise(txt).alias("fim_text"))

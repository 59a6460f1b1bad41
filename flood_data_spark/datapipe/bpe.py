"""Byte-pair-encoding tokenizer training over the documents table.

100 TB rationale: the pair-counting step — the whole cost of BPE training —
runs over the WORD-FREQUENCY table, not the corpus.  The one corpus-sized
job is the initial word count (a single groupBy whose partial aggregation
combines map-side); every merge round after that touches only the
vocabulary (typically 10^5-10^6 rows whatever the corpus size), so 30k
merge rounds cost 30k vocabulary-sized jobs, never 30k corpus scans.
This is exactly how production BPE trainers (SentencePiece, HF tokenizers)
structure the work; the Spark translation keeps each round as one
groupBy(pair) + one expression-only merge map.

Merge application is a pure Column `aggregate` fold (greedy left-to-right,
non-overlapping — Sennrich 2016 semantics: "aaaa" under rule (a,a) becomes
"aa","aa"), so no UDF enters the loop.  Lineage is truncated with
localCheckpoint every few rounds: the fold nests one CASE per round and
unbounded growth would stall the analyzer long before the data hurts.

No reference analog (the reference has no text operators); part of the
beyond-reference datapipe inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rounds between localCheckpoint lineage truncations of the (vocab-sized)
# symbols table; each round adds one aggregate-fold CASE to every row
_CHECKPOINT_EVERY = 4


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased alphabetic words — the one corpus-sized
    job in BPE training.  Output is vocabulary-bounded."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word"))
    return (words.filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def _char_symbols(word_col) -> "F.Column":
    """array<string> of single characters (split('') emits boundary empties
    on some engines; filter is belt-and-braces)."""
    return F.filter(F.split(word_col, ""), lambda s: s != F.lit(""))


def _word_array(text_col) -> "F.Column":
    """array<string> of lowercased alphabetic words — the ONE tokenization
    both encoders and the trainer's word count share (a drift between them
    would silently break the encoder-equivalence the tests pin)."""
    return F.filter(F.split(F.lower(text_col), "[^a-z]+"),
                    lambda w: w != F.lit(""))


def pair_counts(word_freqs: DataFrame,
                symbols_col: str = "symbols") -> DataFrame:
    """(left, right, pair_count) for every adjacent symbol pair, weighted
    by word frequency — the argmax of this table is the next merge rule.
    Input rows carry `symbols array<string>` + `freq`; the explode is
    per-position over the vocabulary only."""
    n = F.size(F.col(symbols_col))
    return (word_freqs
            .filter(n >= 2)
            .select("freq",
                    F.explode(F.sequence(F.lit(1), n - 1)).alias("i"),
                    F.col(symbols_col))
            .select(F.element_at(F.col(symbols_col), F.col("i"))
                    .alias("left"),
                    F.element_at(F.col(symbols_col), F.col("i") + 1)
                    .alias("right"),
                    "freq")
            .groupBy("left", "right")
            .agg(F.sum("freq").alias("pair_count")))


def _merge_expr(symbols_col, left: str, right: str) -> "F.Column":
    """Apply one merge rule as a greedy left-to-right fold: append each
    symbol, except when the running tail == left and the incoming symbol ==
    right — then replace the tail with the concatenation.  The merged token
    immediately becomes the tail, so it is eligible as the LEFT side of the
    next position but never re-consumed as a RIGHT side (non-overlapping)."""
    merged = left + right
    return F.aggregate(
        symbols_col,
        F.expr("array()").cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(s))))


def bpe_train(docs: DataFrame, n_merges: int,
              text_col: str = "text") -> tuple:
    """Train `n_merges` BPE merge rules; returns (merges, vocab_df) where
    merges is [(left, right, pair_count), ...] in application order and
    vocab_df is the final (symbol, freq) table (base characters + merged
    tokens, weighted by word frequency).

    Each round: one vocabulary-sized pair count (argmax collected — ONE
    row), one expression-only merge map.  Ties in the argmax break on
    (pair_count desc, left asc, right asc) so training is deterministic.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    wf = (word_frequencies(docs, text_col)
          .select(_char_symbols(F.col("word")).alias("symbols"), "freq"))
    wf = wf.localCheckpoint()
    merges = []
    for r in range(n_merges):
        top = (pair_counts(wf)
               .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
               .limit(1)
               .collect())
        if not top:
            break
        left, right, cnt = top[0].left, top[0].right, top[0].pair_count
        merges.append((left, right, int(cnt)))
        wf = wf.select(_merge_expr(F.col("symbols"), left, right)
                       .alias("symbols"), "freq")
        if (r + 1) % _CHECKPOINT_EVERY == 0:
            wf = wf.localCheckpoint()
    vocab = (wf.select(F.explode("symbols").alias("symbol"), "freq")
             .groupBy("symbol").agg(F.sum("freq").alias("freq")))
    return merges, vocab


def bpe_encode(docs: DataFrame, merges: list, text_col: str = "text",
               tokens_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize with a trained merge list: per-word character split, then
    the merge rules replayed in training order (the standard BPE encoder).
    Expression-only — the fold nests one CASE per rule, so for rule lists
    beyond a few dozen, pre-tokenized words should be joined against a
    materialized (word → tokens) table instead; this form is the
    building block for that dictionary too."""
    out = docs.withColumn("_words", _word_array(F.col(text_col)))
    sym = F.transform(F.col("_words"), lambda w: _char_symbols(w))

    def _apply_rule(prev, left, right):
        # closure helper: PySpark lambdas may not carry default-arg params
        return F.transform(prev, lambda s: _merge_expr(s, left, right))

    for left, right, _ in merges:
        sym = _apply_rule(sym, left, right)
    return (out.withColumn(tokens_col, F.flatten(sym))
            .drop("_words"))


def bpe_encode_with_dict(docs: DataFrame, merges: list,
                         text_col: str = "text",
                         tokens_col: str = "bpe_tokens",
                         id_col: str | None = None) -> DataFrame:
    """Scale-path encoder: tokenize the DISTINCT-WORD dictionary once
    (vocabulary-bounded — the n_rules-deep fold runs on 10^5-10^6 rows,
    not the corpus), then broadcast-join it back to the per-position word
    explode and reassemble each document's token stream in order.

    At 100 TB this is the only sane shape: the per-row fold in
    `bpe_encode` nests one CASE per merge rule into every corpus row's
    expression tree, while here the corpus-sized work is one explode + one
    broadcast hash join + one groupBy(doc) — all whole-stage-codegen
    friendly, rule count amortized over the dictionary.  Output is
    row-identical to `bpe_encode` (tests pin the equivalence, duplicate
    input rows included — each physical row keeps its own token stream).

    `id_col`: a caller-guaranteed UNIQUE row key — at scale always pass
    one.  Only (key, _pos, _word) ride the explode and the reassembly
    groupBy; the document text never enters a shuffle key (hashing full
    docs on every word row would make per-doc work O(words x doc_bytes)).
    With id_col=None an internal Spark-assigned id is used instead; the
    keyed frame is then localCheckpoint-ed, because
    monotonically_increasing_id is re-evaluated per plan branch and the
    two consumers (explode, final join) must see the SAME ids — correct
    for duplicate rows too, but it materializes the input, so it is the
    convenience mode, not the 100 TB mode."""
    if id_col is not None:
        keyed = docs.withColumn("_rid", F.col(id_col))
    else:
        keyed = docs.withColumn(
            "_rid", F.monotonically_increasing_id()).localCheckpoint()
    # posexplode_outer via select (withColumn can't bind two output cols);
    # _outer keeps zero-word docs alive so they come back with [] tokens
    exploded = keyed.select(
        "_rid", F.posexplode_outer(_word_array(F.col(text_col)))
        .alias("_pos", "_word"))
    dictionary = (exploded.select(F.col("_word").alias("word"))
                  .filter(F.col("word").isNotNull())
                  .distinct())
    dict_tokens = bpe_encode(dictionary.withColumnRenamed("word", "text"),
                             merges, text_col="text",
                             tokens_col="_toks") \
        .select(F.col("text").alias("_word"), "_toks")
    joined = exploded.join(F.broadcast(dict_tokens), "_word", "left")
    reassembled = (joined
                   .groupBy("_rid")
                   .agg(F.flatten(F.array_sort(F.collect_list(
                       F.struct(F.col("_pos"), F.col("_toks"))))
                       ["_toks"]).alias(tokens_col)))
    return (keyed.join(reassembled, "_rid", "left")
            .withColumn(tokens_col,
                        F.coalesce(F.col(tokens_col),
                                   F.expr("array()").cast("array<string>")))
            .drop("_rid"))

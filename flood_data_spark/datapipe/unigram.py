"""Unigram-LM subword segmentation (the SentencePiece/Kudo-2018 model
family) — Viterbi-optimal segmentation of words under a piece-cost
table, plus the seed-vocabulary builder and one EM re-estimation step.

Where this sits: `bpe.py` trains the MERGE-based tokenizer; the unigram
model is the other production tokenizer family — a piece vocabulary
with costs (negative log-probs), where encoding a word means finding
its MINIMUM-COST segmentation.  This module expresses that Viterbi
search relationally:

- The DP runs over the DISTINCT-WORD relation (the `bpe.py` argument:
  one corpus-sized word count, then everything is vocabulary-bounded —
  a 100 TB corpus and a 100 GB corpus have similar word tables).
- Each DP layer is ONE small join: suffix_best[i] = min over pieces
  starting at i of (piece cost + suffix_best[i + len(piece)]), iterated
  max_word_len times from the right (the `graph.bfs_distances` layered
  frontier pattern with costs).  Reconstruction greedily re-walks from
  the left, choosing at each position the LONGEST piece that attains
  the optimal total — a deterministic tiebreak the value oracle mirrors
  exactly (it equals the lexicographically-least boundary mask under
  earliest-bit = earliest-boundary encoding).
- Costs are integer micro-units (round(-ln p · 1e6) once), so DP totals
  are exact integer sums: min() needs no tolerance and the whole search
  value-oracles bit-for-bit.

Scale contract: words longer than `max_word_len` pass through
UNSEGMENTED (NULL pieces) — segment-or-flag, never silently truncate;
real corpora route such tails to byte fallback.  The piece table must
contain every single character of the words it is asked to segment
(the coverage guarantee `seed_vocabulary` provides by construction).

No reference analog; beyond-reference datapipe inventory (SURVEY.md
§2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct words + frequency — the one corpus-sized job (shared
    tokenization with every text operator via `text._words`)."""
    from flood_data_spark.datapipe.text import _words

    return (df.select(F.explode(_words(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def seed_vocabulary(words: DataFrame, max_piece_len: int = 4,
                    top_multichar: int = 64) -> DataFrame:
    """Seed piece table: ALL single characters (the coverage floor) +
    the `top_multichar` most frequent multi-character substrings up to
    `max_piece_len`, each with cost = round(-ln(freq / total) · 1e6)
    where freq counts weighted substring occurrences and total is the
    single-character mass (the Kudo seed heuristic, simplified to a
    deterministic closed form).

    Plan: substrings explode off the WORD relation (word-bounded ×
    len × L positions, never corpus rows); the top-K cut carries the
    (freq DESC, piece ASC) deterministic tiebreak.  Returns (piece,
    freq BIGINT, cost_micro BIGINT).
    """
    if max_piece_len < 2:
        raise ValueError("seed_vocabulary: max_piece_len must be >= 2")
    n = F.length("word")
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_piece_len),
                                         n - i + 1)),
            lambda L: F.substring(F.col("word"), i, L))))
    # weighted substring counts (freq rides the explode); checkpointed —
    # three consumers (chars, the top-K cut, the char-mass total) would
    # otherwise re-run the explode+aggregate (the multiply-consumed-
    # aggregate rule)
    counts = (words.select("freq", F.explode(subs).alias("piece"))
              .groupBy("piece").agg(F.sum("freq").alias("freq"))
              .localCheckpoint(eager=False))
    chars = counts.filter(F.length("piece") == 1)
    multi = (counts.filter(F.length("piece") >= 2)
             .orderBy(F.col("freq").desc(), F.col("piece").asc())
             .limit(top_multichar))
    vocab = chars.unionByName(multi)
    total = chars.agg(F.sum("freq").alias("t"))
    return (vocab.crossJoin(F.broadcast(total))
            .select("piece", "freq",
                    F.round(-F.log(F.col("freq")
                                   / F.col("t").cast("double"))
                            * MICRO).cast("long").alias("cost_micro")))


def viterbi_segment(words: DataFrame, pieces: DataFrame,
                    max_word_len: int = 12,
                    max_piece_len: int = 4) -> DataFrame:
    """Minimum-cost segmentation of each word under the piece table:
    returns (word, pieces array<string>, total_cost_micro BIGINT)
    — NULL pieces for words longer than `max_word_len` (the
    segment-or-flag contract).

    Suffix DP, run ROW-LOCALLY per word (r16 optimization — guide §2.4):
    candidate edges (position, length, cost) come from one explode +
    broadcast piece lookup, collect to ONE edge array per word, and the
    whole right-to-left DP plus the greedy reconstruction run inside
    `aggregate` expressions over that array.  The previous formulation
    was one join + groupBy PER LAYER plus a join per reconstruction hop
    (~30 word-relation-sized shuffles and as many scheduler rounds for a
    ≤12-char word); a word's DP is a pure function of its own ≤
    max_word_len·max_piece_len edges, so nothing about it is
    distributed.  Since `words` normally arrives word-partitioned from
    `word_table`'s groupBy, the per-word edge collect and the final
    left join reuse that partitioning — the segmentation adds ZERO
    exchanges.  Ties on total cost ALWAYS resolve to the longer piece
    (the (t, -L) struct-min tiebreak, bit-identical to the layered
    formulation, pinned by tests/test_unigram.py).
    """
    if max_word_len < 1 or max_piece_len < 1:
        raise ValueError("viterbi_segment: lengths must be >= 1")
    base = words.withColumn("_n", F.length("word"))
    inscope = base.filter(F.col("_n") <= max_word_len)
    outscope = base.filter(F.col("_n") > max_word_len)
    nulls = (F.lit(None).cast("array<string>").alias("pieces"),
             F.lit(None).cast("long").alias("total_cost_micro"))

    p = F.broadcast(pieces.select(F.col("piece").alias("_pc"),
                                  F.col("cost_micro").alias("_c")))
    # candidate edges: (word, i 0-based start, L, cost) for every vocab
    # piece occurrence — word-bounded × positions × L, all narrow ops
    idx = F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("_i")
    lens = F.explode(F.sequence(
        F.lit(1), F.least(F.lit(max_piece_len),
                          F.col("_n") - F.col("_i")))).alias("_L")
    edges = (inscope.select("word", "_n", idx)
             .select("word", "_n", "_i", lens)
             .withColumn("_piece", F.expr(
                 "substring(word, _i + 1, _L)"))
             .join(p, F.col("_piece") == F.col("_pc"))
             .select("word", "_n", "_i", "_L", "_c"))
    ed = (edges.groupBy("word")
          .agg(F.max("_n").alias("_n"),
               F.collect_list(F.struct("_i", "_L", "_c")).alias("_es")))

    n = F.col("_n")
    es = F.col("_es")
    # best[pos] as a 1-indexed array of struct(t BIGINT, bl INT) over
    # positions 0.._n (index pos+1): t = min suffix cost from pos, bl =
    # the length of the longest piece attaining it (the backpointer).
    # Built right to left: k-th step solves pos = _n - k.  A position
    # with no usable edge stays NULL (unreachable), exactly like the
    # layered groupBy that emitted no row.
    cell = "struct<t:bigint,bl:int>"
    init = F.concat(
        F.transform(F.sequence(F.lit(1), n),
                    lambda j: F.lit(None).cast(cell)),
        F.array(F.named_struct(F.lit("t"), F.lit(0).cast("long"),
                               F.lit("bl"), F.lit(None).cast("int"))))

    def _dp_step(acc, k):
        pos = n - k
        # candidates at pos whose landing position pos+L is reachable;
        # min over struct(t, nl) — smallest total, tie -> longest piece
        cands = F.transform(
            F.filter(es, lambda e: (e["_i"] == pos)
                     & F.element_at(acc, pos + e["_L"] + 1)["t"]
                     .isNotNull()),
            lambda e: F.struct(
                (e["_c"] + F.element_at(acc, pos + e["_L"] + 1)["t"])
                .alias("t"),
                (-e["_L"]).alias("nl")))
        m = F.array_min(cands)
        new_cell = F.when(
            m.isNotNull(),
            F.named_struct(F.lit("t"), m["t"],
                           F.lit("bl"), (-m["nl"]).cast("int"))
        ).cast(cell)
        return F.transform(
            F.sequence(F.lit(1), n + 1),
            lambda j: F.when(j == pos + 1, new_cell)
            .otherwise(F.element_at(acc, j)))

    solved = ed.withColumn(
        "_best", F.aggregate(F.sequence(F.lit(1), n), init, _dp_step))

    total = F.element_at(F.col("_best"), 1)["t"]
    # greedy reconstruction: walk the backpointers from pos 0 — at most
    # _n hops; each hop consumes bl[pos] characters.  Only meaningful
    # when pos 0 is reachable (total non-NULL); the walk is guarded so
    # NULL cells never propagate NULL positions.
    wcell = "struct<pos:int,arr:array<string>>"
    winit = F.named_struct(
        F.lit("pos"), F.lit(0).cast("int"),
        F.lit("arr"), F.array().cast("array<string>"))

    def _walk_step(acc, _):
        bl = F.element_at(F.col("_best"), acc["pos"] + 1)["bl"]
        step = F.named_struct(
            F.lit("pos"), (acc["pos"] + bl).cast("int"),
            F.lit("arr"), F.concat(
                acc["arr"],
                F.array(F.substring(
                    F.col("word"), acc["pos"] + 1, bl))))
        return F.when((acc["pos"] < n) & bl.isNotNull(), step) \
            .otherwise(acc).cast(wcell)

    solved = solved.withColumn(
        "pieces",
        F.when(total.isNotNull(),
               F.aggregate(F.sequence(F.lit(1), n), winit,
                           _walk_step)["arr"])) \
        .withColumn("total_cost_micro", total)

    segmented = (inscope.select("word")
                 .join(solved.select("word", "pieces",
                                     "total_cost_micro"),
                       "word", "left"))
    unseg = outscope.select("word", *nulls)
    return segmented.unionByName(unseg)


def em_reestimate(words: DataFrame, pieces: DataFrame,
                  max_word_len: int = 12,
                  max_piece_len: int = 4) -> DataFrame:
    """One EM re-estimation round of the unigram model (the Kudo
    training loop, hard-EM form): E-step = Viterbi segmentation of the
    word table under current costs; M-step = piece-usage recount
    weighted by word frequency, new cost = round(-ln(count/total)·1e6).

    Pruning/coverage: multi-character pieces that no optimal
    segmentation uses DROP (the vocabulary shrinks toward pieces that
    earn their keep — Kudo's prune step in its simplest form);
    single-character pieces always survive with a +1 Laplace floor
    (the coverage guarantee: any future word stays segmentable).

    Plan economics: the E-step is the `viterbi_segment` layered DP
    (word-relation-bounded), the M-step is one explode + piece-keyed
    groupBy, the total a broadcast scalar row — so a full training
    round costs ZERO corpus passes beyond the original word count.
    Deterministic end to end: q_unigram_em value-hashes the retrained
    piece table against a brute-force-segmentation oracle.
    """
    seg = viterbi_segment(words, pieces, max_word_len, max_piece_len)
    usage = (seg.filter(F.col("pieces").isNotNull())
             .join(words.select("word", "freq"), "word")
             .select("freq", F.explode("pieces").alias("piece"))
             .groupBy("piece").agg(F.sum("freq").alias("_used")))
    base = pieces.select("piece").join(usage, "piece", "left")
    cnt = F.when(F.length("piece") == 1,
                 F.coalesce(F.col("_used"), F.lit(0)) + 1) \
        .otherwise(F.col("_used"))
    kept = (base.withColumn("count", cnt.cast("long"))
            .filter(F.col("count").isNotNull())
            .select("piece", "count"))
    total = kept.agg(F.sum("count").alias("_t"))
    return (kept.crossJoin(F.broadcast(total))
            .select("piece", "count",
                    F.round(-F.log(F.col("count")
                                   / F.col("_t").cast("double"))
                            * MICRO).cast("long").alias("cost_micro")))

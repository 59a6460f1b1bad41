"""BM25 retrieval, Gopher rule battery, bigram LM, and DSIR weighting."""

import math

import pytest

from flood_data_spark.datapipe.curation import dsir_select, dsir_weights
from flood_data_spark.datapipe.text import (
    bigram_lm_scores, bm25_topk, with_gopher_rules)


# ---------------------------------------------------------------- BM25

def test_bm25_hand_computed(spark):
    df = spark.createDataFrame(
        [(0, "flood flood river"),
         (1, "river bank walk"),
         (2, "dry desert sand dune heat")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           bm25_topk(df, ["flood", "river"], k=10).collect()}
    # doc 2 matches no query term — absent
    assert set(out) == {0, 1}
    # hand BM25: N=3, avgdl = (3+3+5)/3
    avgdl = 11 / 3
    k1, b = 1.2, 0.75

    def score(tf, df_t, dl):
        idf = math.log(1.0 + (3 - df_t + 0.5) / (df_t + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp0 = score(2, 1, 3) + score(1, 2, 3)   # flood tf=2 df=1; river tf=1 df=2
    exp1 = score(1, 2, 3)
    assert out[0].bm25 == pytest.approx(exp0, abs=1e-5)
    assert out[1].bm25 == pytest.approx(exp1, abs=1e-5)
    assert out[0].n_hit_terms == 2 and out[1].n_hit_terms == 1
    # the doc with both terms (one rare) ranks first
    assert out[0].bm25 > out[1].bm25


def test_bm25_case_insensitive_and_k_bound(spark):
    df = spark.createDataFrame(
        [(i, "Flood warning issued") for i in range(5)],
        "doc_id long, text string")
    rows = bm25_topk(df, ["FLOOD"], k=3).collect()
    assert len(rows) == 3
    # equal scores → id tiebreak ascending
    assert [r.doc_id for r in rows] == [0, 1, 2]


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


# --------------------------------------------------------- Gopher rules

def test_gopher_rules_pass_and_rule_attribution(spark):
    good = ("the river data " * 20).strip()          # 60 words, stopword 'the'
    good = good + " have more"                        # adds 'have' → 2 stopwords
    bullets = "\n".join(f"- item {i}" for i in range(10))
    short = "too short"
    symbols = "the have " + "# " * 30 + "word " * 50
    df = spark.createDataFrame(
        [(0, good), (1, bullets), (2, short), (3, symbols)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in with_gopher_rules(df).collect()}
    assert out[0].gopher_pass
    # bullets doc: every line is a bullet → r_bullet_ratio false
    assert not out[1].r_bullet_ratio and not out[1].gopher_pass
    # short doc fails word count
    assert not out[2].r_word_count and not out[2].gopher_pass
    # symbol-stuffed doc fails symbol ratio specifically
    assert not out[3].r_symbol_ratio
    assert out[3].g_symbol_ratio == pytest.approx(30 / 82, abs=1e-5)


def test_gopher_mean_word_len_and_alpha(spark):
    df = spark.createDataFrame(
        [(0, "aa bbbb cc"),                  # mean len 8/3
         (1, "123 456 789")],                # zero alpha words
        "doc_id long, text string")
    out = {r.doc_id: r for r in with_gopher_rules(df).collect()}
    assert out[0].g_mean_word_len == pytest.approx(round(8 / 3, 6))
    assert out[1].g_alpha_word_ratio == 0.0 and not out[1].r_alpha_words


def test_gopher_blank_doc_safe(spark):
    df = spark.createDataFrame([(0, ""), (1, "   ")],
                               "doc_id long, text string")
    out = with_gopher_rules(df).collect()
    assert all(r.g_n_words == 0 and not r.gopher_pass for r in out)


# ------------------------------------------------------------ bigram LM

def test_bigram_lm_hand_computed(spark):
    # corpus: "a b a b" and "a c"; bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    df = spark.createDataFrame([(0, "a b a b"), (1, "a c")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_scores(df, lam=0.7).collect()}
    assert out[0].n_bigrams == 3 and out[1].n_bigrams == 1
    # unigram LM: a:3 b:2 c:1, total 6, V=3, alpha=.5 → denom 6+0.5*4=8
    p_uni = {"a": 3.5 / 8, "b": 2.5 / 8, "c": 1.5 / 8}
    # contexts: a→3 (ab,ab,ac), b→1 (ba)
    def p(w1, w2, c_bg, c_ctx):
        return 0.7 * (c_bg / c_ctx) + (1.0 - 0.7) * p_uni[w2]
    lp = [math.log(p("a", "c", 1, 3))]
    assert out[1].cross_entropy == pytest.approx(round(-sum(lp) / 1, 6))
    lp0 = [math.log(p("a", "b", 2, 3)), math.log(p("b", "a", 1, 1)),
           math.log(p("a", "b", 2, 3))]
    assert out[0].cross_entropy == pytest.approx(-sum(lp0) / 3, abs=1e-5)
    assert out[0].perplexity == pytest.approx(
        math.exp(-sum(lp0) / 3), abs=1e-3)


def test_bigram_lm_short_docs_visible(spark):
    df = spark.createDataFrame([(0, "single"), (1, ""), (2, "a b")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].n_bigrams == 0 and out[0].cross_entropy is None
    assert out[1].n_bigrams == 0
    assert out[2].n_bigrams == 1 and out[2].cross_entropy is not None


def test_bigram_lm_separate_corpus_oov(spark):
    docs = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    lm = spark.createDataFrame([(9, "a b a")], "doc_id long, text string")
    out = bigram_lm_scores(docs, lm_corpus=lm).collect()[0]
    # fully OOV bigram: p_ml = 0 (unseen context), backoff to smoothed
    # unigram floor — finite, positive cross-entropy
    assert out.n_bigrams == 1 and out.cross_entropy > 0


# ----------------------------------------------------------------- DSIR

def test_dsir_weights_tilt_toward_target(spark):
    raw = spark.createDataFrame(
        [(0, "der fluss steigt schnell"),       # German-ish
         (1, "the river rises fast"),           # English-ish
         (2, "der fluss the river")],           # mixed
        "doc_id long, text string")
    target = raw.filter("doc_id = 0")            # target = German doc
    out = {r.doc_id: r for r in dsir_weights(raw, target).collect()}
    # the doc identical to the target has the highest weight;
    # the disjoint English doc the lowest
    assert out[0].log_weight > out[2].log_weight > out[1].log_weight
    assert out[0].n_tokens == 4


def test_dsir_weights_blank_doc_visible(spark):
    raw = spark.createDataFrame([(0, "a b"), (1, "")],
                                "doc_id long, text string")
    out = {r.doc_id: r for r in
           dsir_weights(raw, raw.filter("doc_id = 0")).collect()}
    assert out[1].n_tokens == 0 and out[1].log_weight is None


def test_dsir_select_deterministic_and_bounded(spark):
    raw = spark.createDataFrame(
        [(i, f"tok{i % 7} common word filler") for i in range(40)],
        "doc_id long, text string")
    target = raw.filter("doc_id % 7 = 0")
    a = [r.doc_id for r in dsir_select(raw, target, n=10).collect()]
    b = [r.doc_id for r in dsir_select(raw, target, n=10).collect()]
    assert a == b and len(a) == 10                # reproducible, exact n
    cols = dsir_select(raw, target, n=10).columns
    assert cols == ["doc_id", "n_tokens", "log_weight",
                    "avg_log_weight", "gumbel_key"]


# ------------------------------------------------- n-gram diversity

def test_ngram_diversity_hand_computed(spark):
    from flood_data_spark.datapipe.text import with_ngram_diversity

    df = spark.createDataFrame(
        [(0, "a b a b a b"),       # trigrams: aba, bab, aba, bab → 4/2
         (1, "w x y z"),           # wxy, xyz → 2 distinct
         (2, "a b"),               # too short for n=3
         (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in with_ngram_diversity(df, n=3).collect()}
    assert out[0].nd_n_ngrams == 4 and out[0].nd_n_distinct == 2
    assert out[0].nd_diversity == pytest.approx(0.5)
    assert out[1].nd_n_ngrams == 2 and out[1].nd_diversity == 1.0
    assert out[2].nd_n_ngrams == 0 and out[2].nd_diversity is None
    assert out[3].nd_n_ngrams == 0 and out[3].nd_diversity is None


def test_ngram_diversity_rejects_bad_n(spark):
    from flood_data_spark.datapipe.text import with_ngram_diversity
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        with_ngram_diversity(df, n=0)


# ------------------------------------------------ inverted-index BM25

def test_indexed_bm25_equals_on_the_fly(spark):
    from flood_data_spark.datapipe.text import (
        bm25_from_index, bm25_topk, build_text_index)

    df = spark.createDataFrame(
        [(i, f"flood river data tok{i % 5} extra words here")
         for i in range(30)],
        "doc_id long, text string")
    direct = {(r.doc_id, r.n_hit_terms, r.bm25)
              for r in bm25_topk(df, ["flood", "data"], k=10).collect()}
    p, ts, st = build_text_index(df)
    indexed = {(r.doc_id, r.n_hit_terms, r.bm25)
               for r in bm25_from_index(p, ts, st,
                                        ["flood", "data"], k=10).collect()}
    assert direct == indexed and len(indexed) == 10


def test_indexed_bm25_from_persisted_postings(spark, tmp_path):
    """The serving shape: postings written bucketed by a term hash, the
    query answered from the parquet without re-scanning the corpus."""
    import pyspark.sql.functions as F

    from flood_data_spark.datapipe.text import (
        bm25_from_index, build_text_index)

    df = spark.createDataFrame(
        [(i, f"alpha beta flood gamma tok{i % 3}") for i in range(20)],
        "doc_id long, text string")
    p, ts, st = build_text_index(df)
    path = str(tmp_path / "postings")
    (p.withColumn("bucket", F.crc32("term") % 8)
     .write.partitionBy("bucket").parquet(path))
    back = spark.read.parquet(path).drop("bucket")
    out = bm25_from_index(back, ts, st, ["flood"], k=5).collect()
    assert len(out) == 5 and all(r.bm25 > 0 for r in out)


def test_indexed_bm25_rejects_empty_query(spark):
    from flood_data_spark.datapipe.text import (
        bm25_from_index, build_text_index)

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    p, ts, st = build_text_index(df)
    with pytest.raises(ValueError):
        bm25_from_index(p, ts, st, [])


# ------------------------------------------------------------- RRF fusion

def test_rrf_fuse_hand_computed(spark):
    from flood_data_spark.datapipe.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse(a, b, k=10).collect()}
    # doc 3 appears in both lists -> highest fused score
    assert out[3].rrf_score == pytest.approx(
        round(1 / 63 + 1 / 61, 6), abs=1e-6)
    assert out[3].rank_a == 3 and out[3].rank_b == 1
    # single-list docs carry only their own term
    assert out[1].rrf_score == pytest.approx(round(1 / 61, 6), abs=1e-6)
    assert out[4].rank_a is None and out[4].rrf_score == pytest.approx(
        round(1 / 62, 6), abs=1e-6)
    # fused ordering: doc3 first (two contributions beat any single)
    ordered = sorted(out.values(), key=lambda r: -r.rrf_score)
    assert ordered[0].doc_id == 3


def test_rrf_fuse_k_bound_and_tiebreak(spark):
    from flood_data_spark.datapipe.similarity import rrf_fuse

    a = spark.createDataFrame([(i, 1) for i in range(5)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([], "doc_id long, rank int")
    rows = rrf_fuse(a, b, k=3).collect()
    # equal scores -> id tiebreak, k bound respected
    assert [r.doc_id for r in rows] == [0, 1, 2]


# --------------------------------------------------------- IR metrics

def test_ir_metrics_hand_computed(spark):
    from flood_data_spark.datapipe.similarity import ir_metrics

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, neighbor_id long, rank int")
    relevant = spark.createDataFrame(
        [(1, 11), (1, 12), (1, 13),     # q1: hits at ranks 2,3; 13 missed
         (2, 99),                       # q2: nothing retrieved is relevant
         (3, 30)],                      # q3: retriever returned nothing
        "query_id long, neighbor_id long")
    out = {r.query_id: r for r in ir_metrics(ranked, relevant, k=3).collect()}
    assert out[1].n_relevant == 3 and out[1].n_retrieved_at_k == 2
    assert out[1].first_hit_rank == 2 and out[1].rr == 0.5
    assert out[1].recall_at_k == pytest.approx(round(2 / 3, 6))
    assert out[2].n_retrieved_at_k == 0 and out[2].rr == 0.0
    assert out[3].n_retrieved_at_k == 0 and out[3].recall_at_k == 0.0
    # MRR composes as a plain mean on top
    mrr = ir_metrics(ranked, relevant, k=3).agg(
        {"rr": "avg"}).collect()[0][0]
    assert mrr == pytest.approx(0.5 / 3, abs=1e-6)


def test_ir_metrics_k_cutoff(spark):
    from flood_data_spark.datapipe.similarity import ir_metrics

    ranked = spark.createDataFrame([(1, 10, 5)],
                                   "query_id long, neighbor_id long, rank int")
    relevant = spark.createDataFrame([(1, 10)],
                                     "query_id long, neighbor_id long")
    out = ir_metrics(ranked, relevant, k=3).collect()[0]
    # the only hit sits past the cutoff
    assert out.n_retrieved_at_k == 0 and out.rr == 0.0


# ---------------------------------------------------- PRF expansion

def test_prf_expansion_terms_from_feedback_set(spark):
    from flood_data_spark.datapipe.text import (
        bm25_prf_expand, expansion_terms)

    from flood_data_spark.datapipe.text import bm25_topk

    # docs about 'flood' consistently mention 'levee'; noise docs don't;
    # doc 200 mentions ONLY the would-be expansion vocabulary
    rows = [(i, f"flood river levee warning tok{i}") for i in range(8)]
    rows += [(100 + i, f"weather sunshine picnic tok{i}") for i in range(8)]
    rows += [(200, "levee river maintenance report")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exp = expansion_terms(df, ["flood"], n_feedback=5, n_expansion=2)
    assert len(exp) == 2
    # expansion comes from the feedback docs' vocabulary, excludes the query
    assert "flood" not in exp
    assert set(exp) <= {"river", "levee", "warning"} | {
        f"tok{i}" for i in range(8)}
    # the recall payoff, falsifiably: doc 200 matches no query term, so
    # plain BM25 cannot return it; the expanded run surfaces it
    plain = {r.doc_id for r in bm25_topk(df, ["flood"], k=17).collect()}
    assert 200 not in plain
    expanded = {r.doc_id for r in
                bm25_prf_expand(df, ["flood"], n_feedback=5,
                                n_expansion=2, k=17).collect()}
    assert 200 in expanded


def test_prf_deterministic(spark):
    from flood_data_spark.datapipe.text import expansion_terms

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i % 4}") for i in range(20)],
        "doc_id long, text string")
    a = expansion_terms(df, ["alpha"], n_feedback=5, n_expansion=3)
    b = expansion_terms(df, ["alpha"], n_feedback=5, n_expansion=3)
    assert a == b and len(a) == 3


# ------------------------------------------------- r8 hardening (ADVICE)

def test_null_text_rows_behave_as_empty(spark):
    """NULL text must act like an empty document everywhere, not poison
    counts with NULL/-1 size(split(NULL)) semantics (same guard
    _span_relation carries; see datapipe.text._nn)."""
    from flood_data_spark.datapipe.text import (
        token_count, with_lang_id, with_ngram_diversity,
        with_quality_signals)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, None), (1, "the quick brown fox and the lazy dog")],
        "doc_id long, text string")

    tok = {r.doc_id: r.n for r in
           df.select("doc_id", token_count(F.col("text")).alias("n"))
           .collect()}
    assert tok[0] == 0 and tok[1] == 8

    g = {r.doc_id: r for r in
         with_gopher_rules(df, min_words=1, min_stop_hits=1).collect()}
    assert g[0].gopher_pass is False          # not NULL
    assert g[1].gopher_pass is True

    q = {r.doc_id: r for r in with_quality_signals(df).collect()}
    assert q[0].q_n_tokens == 0 and q[0].q_score is not None

    nd = {r.doc_id: r for r in with_ngram_diversity(df, n=2).collect()}
    assert nd[0].nd_n_ngrams == 0 and nd[0].nd_diversity is None

    lid = {r.doc_id: r.lang_pred for r in with_lang_id(df).collect()}
    assert lid[0] == "und"


def test_bm25_null_text_does_not_skew_avgdl(spark):
    """A NULL doc counts dl=0 toward avgdl (as an empty doc would), and
    never appears in results."""
    df = spark.createDataFrame(
        [(0, None), (1, "flood flood river"), (2, "flood")],
        "doc_id long, text string")
    rows = bm25_topk(df, ["flood"], k=10).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    # avgdl = (0 + 3 + 1) / 3; if NULL made avgdl NULL every score is NULL
    assert all(r.bm25 is not None for r in rows)


def test_dsir_select_rejects_bad_temperature(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "b c")],
                               "doc_id long, text string")
    tgt = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    for bad in (0.0, -1.0):
        with pytest.raises(ValueError, match="temperature"):
            dsir_select(df, tgt, n=1, temperature=bad)


def test_ir_metrics_duplicate_relevant_pairs_deduped(spark):
    """A doubly-listed positive must not deflate recall (the relevant
    table is distinct-ed internally)."""
    from flood_data_spark.datapipe.similarity import ir_metrics

    ranked = spark.createDataFrame([(1, 10, 1)],
                                   "query_id long, neighbor_id long, rank int")
    relevant = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 10)],
        "query_id long, neighbor_id long")
    out = ir_metrics(ranked, relevant, k=3).collect()[0]
    assert out.n_relevant == 1
    assert out.recall_at_k == pytest.approx(1.0)


# ------------------------------------------ batch retrieval + mining (r8)

def _index(spark, rows):
    from flood_data_spark.datapipe.text import build_text_index
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, build_text_index(df)


def test_bm25_batch_matches_per_query_index_search(spark):
    from flood_data_spark.datapipe.text import bm25_batch, bm25_from_index

    rows = [(i, f"flood river data tok{i % 7} tok{i % 3}") for i in range(30)]
    df, (postings, term_stats, stats) = _index(spark, rows)
    queries = spark.createDataFrame(
        [("a", ["flood", "tok1"]), ("b", ["tok2", "data"])],
        "query_id string, terms array<string>")
    batch = bm25_batch(postings, term_stats, stats, queries, k=5)
    got = {(r.query_id, r.doc_id): (r.bm25, r.rank)
           for r in batch.collect()}
    for qid, terms in [("a", ["flood", "tok1"]), ("b", ["tok2", "data"])]:
        single = bm25_from_index(postings, term_stats, stats, terms, k=5)
        for rank, r in enumerate(single.collect(), start=1):
            assert got[(qid, r.doc_id)] == (r.bm25, rank), (qid, r.doc_id)


def test_bm25_batch_dedupes_repeated_query_terms(spark):
    from flood_data_spark.datapipe.text import bm25_batch

    rows = [(0, "flood levee"), (1, "flood flood"), (2, "dry land")]
    df, (postings, term_stats, stats) = _index(spark, rows)
    q1 = spark.createDataFrame([("q", ["flood"])],
                               "query_id string, terms array<string>")
    q2 = spark.createDataFrame([("q", ["flood", "FLOOD", "flood"])],
                               "query_id string, terms array<string>")
    a = {r.doc_id: r.bm25 for r in
         bm25_batch(postings, term_stats, stats, q1, k=5).collect()}
    b = {r.doc_id: r.bm25 for r in
         bm25_batch(postings, term_stats, stats, q2, k=5).collect()}
    assert a == b                       # set-of-terms semantics


def test_mine_hard_negatives_labels_and_bounds(spark):
    from flood_data_spark.datapipe.text import mine_hard_negatives

    rows = [(i, "flood " * (20 - i) + f"pad{i} " * i) for i in range(12)]
    df, (postings, term_stats, stats) = _index(spark, rows)
    queries = spark.createDataFrame([("q", ["flood"])],
                                    "query_id string, terms array<string>")
    out = mine_hard_negatives(postings, term_stats, stats, queries,
                              k_pos=2, k_neg=3).collect()
    assert len(out) == 5
    labels = {r.rank: r.label for r in out}
    assert labels == {1: "pos", 2: "pos", 3: "neg", 4: "neg", 5: "neg"}
    with pytest.raises(ValueError, match="k_pos"):
        mine_hard_negatives(postings, term_stats, stats, queries,
                            k_pos=0, k_neg=1)


def test_bm25_batch_rejects_empty_query_rows(spark):
    from flood_data_spark.datapipe.text import bm25_batch

    df, (postings, term_stats, stats) = _index(spark, [(0, "flood")])
    bad = spark.createDataFrame([("a", ["flood"]), ("b", [])],
                                "query_id string, terms array<string>")
    with pytest.raises(ValueError, match="empty/NULL"):
        bm25_batch(postings, term_stats, stats, bad)
    # OOV query: legitimately zero rows for that query, no error
    oov = spark.createDataFrame([("a", ["flood"]), ("b", ["zzz"])],
                                "query_id string, terms array<string>")
    got = bm25_batch(postings, term_stats, stats, oov).collect()
    assert {r.query_id for r in got} == {"a"}


# ------------------------------------------------------ Kneser-Ney LM

def test_kneser_ney_hand_computed(spark):
    from flood_data_spark.datapipe.text import kneser_ney_scores

    # corpus "a b a b" + "a c": distinct bigrams ab(2), ba(1), ac(1)
    # ctx: a -> (count 3, n1_fw 2), b -> (count 1, n1_fw 1)
    # cont: b <- 1, a <- 1, c <- 1; n_pairs 3, vocab 3
    df = spark.createDataFrame([(0, "a b a b"), (1, "a c")],
                               "doc_id long, text string")
    out = {r.doc_id: r
           for r in kneser_ney_scores(df, discount=0.75).collect()}
    assert out[0].n_bigrams == 3 and out[1].n_bigrams == 1

    def p_cont(n1_bw):
        return (n1_bw + 0.5) / (3 + 0.5 * (3 + 1))

    def p_kn(c_bg, c_ctx, n1_fw, n1_bw):
        return (max(c_bg - 0.75, 0.0)
                + 0.75 * n1_fw * p_cont(n1_bw)) / c_ctx

    lp1 = math.log(p_kn(1, 3, 2, 1))            # "a c"
    assert out[1].cross_entropy == pytest.approx(-lp1, abs=1e-5)
    lp0 = (2 * math.log(p_kn(2, 3, 2, 1))       # "a b" twice
           + math.log(p_kn(1, 1, 1, 1)))        # "b a"
    assert out[0].cross_entropy == pytest.approx(-lp0 / 3, abs=1e-5)
    assert out[0].perplexity == pytest.approx(
        math.exp(-lp0 / 3), abs=1e-3)


def test_kneser_ney_continuation_beats_frequency(spark):
    from flood_data_spark.datapipe.text import kneser_ney_scores

    # "zzz" is frequent but follows ONLY "the" (1 continuation);
    # "cat" is rarer but follows many contexts.  Under KN backoff the
    # unseen-context event "oov cat" must outscore "oov zzz" — the
    # signature continuation-count behavior a unigram backoff gets
    # backwards.
    corpus = [(i, "the zzz") for i in range(10)] + \
             [(100 + i, f"w{i} cat") for i in range(4)]
    lm = spark.createDataFrame(corpus, "doc_id long, text string")
    probe = spark.createDataFrame([(0, "oov cat"), (1, "oov zzz")],
                                  "doc_id long, text string")
    out = {r.doc_id: r.cross_entropy
           for r in kneser_ney_scores(probe, lm_corpus=lm).collect()}
    assert out[0] < out[1]


def test_kneser_ney_short_docs_visible(spark):
    from flood_data_spark.datapipe.text import kneser_ney_scores

    df = spark.createDataFrame([(0, "single"), (1, ""), (2, "a b")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in kneser_ney_scores(df).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].n_bigrams == 0 and out[0].cross_entropy is None
    assert out[2].n_bigrams == 1 and out[2].cross_entropy is not None

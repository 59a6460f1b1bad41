"""TF-IDF top-k and n-gram containment (decontamination) operators."""

import math

import pytest

from flood_data_spark.datapipe.dedup import ngram_containment
from flood_data_spark.datapipe.text import tfidf_topk


def test_tfidf_topk_hand_computed(spark):
    df = spark.createDataFrame(
        [(0, "apple apple banana"),
         (1, "banana cherry"),
         (2, "cherry cherry cherry date")],
        "doc_id long, text string")
    out = {(r.id, r.term): r for r in tfidf_topk(df, k=2).collect()}
    # doc 0: apple tf=2 df=1, banana tf=1 df=2; N=3
    idf = lambda df_: math.log((3 + 1) / (df_ + 1)) + 1
    assert out[(0, "apple")].tfidf == pytest.approx(round(2 * idf(1), 6))
    assert out[(0, "banana")].tfidf == pytest.approx(round(1 * idf(2), 6))
    assert out[(0, "apple")].rank == 1            # rarer + more frequent
    # doc 2: cherry tf=3 beats date tf=1 despite date's higher idf here?
    assert out[(2, "cherry")].tfidf == pytest.approx(round(3 * idf(2), 6))
    assert out[(2, "date")].tfidf == pytest.approx(round(1 * idf(1), 6))
    assert out[(2, "cherry")].rank == 1
    # k=2 bound respected
    assert all(r.rank <= 2 for r in out.values())


def test_tfidf_case_and_whitespace_normalized(spark):
    df = spark.createDataFrame([(0, "  Apple APPLE  aPPle ")],
                               "doc_id long, text string")
    rows = tfidf_topk(df, k=5).collect()
    assert len(rows) == 1 and rows[0].term == "apple" and rows[0].tf == 3


def test_containment_planted_leak(spark):
    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [(0, f"intro words then {eval_text} and some trailer"),  # contains eval
         (1, "zzzz completely unrelated content xxxx qqqq yyyy")],
        "doc_id long, text string")
    evalset = spark.createDataFrame([(100, eval_text)],
                                    "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_containment(train, evalset, n=8).collect()}
    # doc 0 embeds the eval sentence verbatim → high containment
    assert out[0].containment > 0.4
    # doc 1 shares no 8-gram with the eval text
    assert out[1].containment == 0.0
    assert out[1].n_matched == 0
    # counts are consistent
    assert 0 < out[0].n_matched <= out[0].n_grams


def test_repetition_signals(spark):
    from flood_data_spark.datapipe.text import repetition_signals
    df = spark.createDataFrame(
        [(0, "spam spam spam spam eggs"),   # 5 tokens, 2 distinct, top=4
         (1, "all tokens here differ"),     # fully distinct
         (2, "   ")],                       # token-free
        "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[0].n_tokens == 5 and out[0].n_distinct == 2
    assert out[0].dup_ratio == pytest.approx(0.6)
    assert out[0].top_tf == 4 and out[0].top_ratio == pytest.approx(0.8)
    assert out[1].dup_ratio == 0.0
    assert out[2].n_tokens == 0 and out[2].dup_ratio == 1.0  # blank = flagged


def test_redact_pii(spark):
    from flood_data_spark.datapipe.curation import redact_pii
    df = spark.createDataFrame(
        [(0, "mail a.b@c.org and x_y%z@d.co.uk now"),
         (1, "call +44 20 7946-0958 or (555) 123 4567"),
         (2, "nothing sensitive 42 here")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[0].n_redactions == 2
    assert "@" not in out[0].clean_text
    assert out[0].clean_text.count("[REDACTED]") == 2
    assert out[1].n_redactions >= 1
    assert "7946" not in out[1].clean_text
    assert out[2].n_redactions == 0
    assert out[2].clean_text == "nothing sensitive 42 here"  # untouched


def test_containment_short_docs_have_no_row(spark):
    train = spark.createDataFrame([(0, "tiny"), (1, "long enough text here")],
                                  "doc_id long, text string")
    evalset = spark.createDataFrame([(9, "whatever reference text")],
                                    "doc_id long, text string")
    out = ngram_containment(train, evalset, n=8)
    assert [r.doc_id for r in out.collect()] == [1]  # len("tiny") < 8


def test_build_vocab_ids_deterministic_and_truncated(spark):
    from flood_data_spark.datapipe.text import build_vocab

    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a d  d"), (2, " ")],
        "doc_id long, text string")
    rows = {r.token: r for r in build_vocab(df).collect()}
    # counts: a=3 b=3 d=2 c=1 -> ties broken by token asc: a(0) b(1) d(2) c(3)
    assert (rows["a"].token_id, rows["b"].token_id,
            rows["d"].token_id, rows["c"].token_id) == (0, 1, 2, 3)
    # r["count"]: attribute access collides with Row.count() the method
    assert rows["a"]["count"] == 3 and rows["d"]["count"] == 2
    top2 = build_vocab(df, max_vocab=2).collect()
    assert sorted(r.token for r in top2) == ["a", "b"]
    assert build_vocab(df, min_count=3).count() == 2


def test_unigram_lm_scores_hand_computed(spark):
    import math
    from flood_data_spark.datapipe.text import unigram_lm_scores
    docs = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    out = unigram_lm_scores(docs).collect()
    assert len(out) == 1
    r = out[0]
    # lm: a=2, b=1, total=3, vocab=2; p = (c + .5) / (3 + .5 * 3)
    ce = -(2 * math.log(2.5 / 4.5) + math.log(1.5 / 4.5)) / 3
    assert r.n_tokens == 3
    assert abs(r.cross_entropy - round(ce, 6)) < 1e-9
    assert abs(r.perplexity - round(math.exp(ce), 4)) < 1e-9


def test_unigram_lm_reference_corpus_flags_oov(spark):
    from flood_data_spark.datapipe.text import unigram_lm_scores
    ref = spark.createDataFrame(
        [(i, "the quick brown fox") for i in range(5)],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "zxq vvk qqj wmz")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           unigram_lm_scores(docs, lm_corpus=ref).collect()}
    # out-of-domain doc scores strictly higher perplexity than in-domain
    assert out[1].perplexity > out[0].perplexity * 2


def test_unigram_lm_keeps_zero_token_docs_visible(spark):
    from flood_data_spark.datapipe.text import unigram_lm_scores
    docs = spark.createDataFrame([(0, "a a b"), (1, ""), (2, "   ")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_lm_scores(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1].n_tokens == 0 and out[1].perplexity is None
    assert out[2].n_tokens == 0 and out[2].cross_entropy is None


def test_cooccurrence_pmi_hand_computed(spark):
    from flood_data_spark.datapipe.text import cooccurrence_pmi

    df = spark.createDataFrame(
        [(0, "new york city has new york style pizza"),
         (1, "new york is a city and new york is big")],
        "doc_id long, text string")
    out = {(r.w1, r.w2): r for r in
           cooccurrence_pmi(df, window=2, min_count=2).collect()}
    # 'new york' dominates: 4 adjacent occurrences survive the floor
    assert out[("new", "york")].pair_count == 4
    # hand PMI: pair_total = 30 (ALL window-2 pairs, 7+9 adjacent +
    # 6+8 offset-2 — min_count only filters the OUTPUT), uni_total = 18,
    # c(new)=4, c(york)=4
    exp = math.log((4 / 30) / ((4 / 18) * (4 / 18)))
    assert out[("new", "york")].pmi == pytest.approx(exp, abs=1e-5)
    # below-floor pairs pruned
    assert ("style", "pizza") not in out


def test_cooccurrence_window_reaches_offset_two(spark):
    from flood_data_spark.datapipe.text import cooccurrence_pmi
    df = spark.createDataFrame([(0, "a x b a y b a z b")],
                               "doc_id long, text string")
    out = {(r.w1, r.w2): r.pair_count for r in
           cooccurrence_pmi(df, window=2, min_count=3).collect()}
    # (a, b) never adjacent but always at offset 2
    assert out[("a", "b")] == 3
    with pytest.raises(ValueError):
        cooccurrence_pmi(df, window=0)


def test_rouge_n_clipped_goldens(spark):
    """ROUGE-2 hand goldens: shared bigrams, the multiset CLIP (a
    candidate repeating a reference gram scores it at most its
    reference count), and the too-short NULL contract."""
    from flood_data_spark.datapipe.text import rouge_n

    cand = spark.createDataFrame([
        (0, "the cat sat on the mat"),
        (1, "a b a b a b"),
        (2, "x"),
    ], "doc_id long, text string")
    ref = spark.createDataFrame([
        (0, "the cat lay on the mat"),
        (1, "a b c"),
        (2, "x y z"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in rouge_n(cand, ref, n=2).collect()}
    r0 = out[0]
    assert (r0.cand_grams, r0.ref_grams, r0.clip) == (5, 5, 3)
    assert r0.f1 == pytest.approx(0.6, abs=1e-6)
    r1 = out[1]   # cand 'a b'x3 'b a'x2; ref 'a b','b c' -> clip 1
    assert (r1.cand_grams, r1.ref_grams, r1.clip) == (5, 2, 1)
    assert r1.precision == pytest.approx(0.2, abs=1e-6)
    assert r1.recall == pytest.approx(0.5, abs=1e-6)
    r2 = out[2]   # candidate too short for bigrams
    assert r2.cand_grams == 0 and r2.precision is None
    assert r2.recall == 0.0
    with pytest.raises(ValueError, match="n must be"):
        rouge_n(cand, ref, n=0)


def test_rouge_both_short_pair_still_emits_row(spark):
    """An id where BOTH sides have fewer than n tokens must still
    appear (zero grams, all-NULL ratios) — the output is driven from
    the union of input ids, not from the gram relations."""
    from flood_data_spark.datapipe.text import rouge_n

    cand = spark.createDataFrame(
        [(0, "a b c"), (1, "x")], "doc_id long, text string")
    ref = spark.createDataFrame(
        [(0, "a b d"), (1, "y")], "doc_id long, text string")
    out = {r.doc_id: r for r in rouge_n(cand, ref, n=2).collect()}
    assert set(out) == {0, 1}
    r1 = out[1]
    assert (r1.cand_grams, r1.ref_grams, r1.clip) == (0, 0, 0)
    assert r1.precision is None and r1.recall is None and r1.f1 is None


def test_rouge_identical_docs_score_one(spark):
    from flood_data_spark.datapipe.text import rouge_n

    d = spark.createDataFrame(
        [(0, "alpha beta gamma delta eps")], "doc_id long, text string")
    r = rouge_n(d, d, n=2).collect()[0]
    assert r.precision == r.recall == r.f1 == 1.0


def test_rouge_precision_recall_duality(spark):
    """Swapping candidate and reference swaps precision and recall
    (clip is symmetric); F1 is invariant."""
    from flood_data_spark.datapipe.text import rouge_n

    a = spark.createDataFrame(
        [(0, "w x y z w x"), (1, "p q r")], "doc_id long, text string")
    b = spark.createDataFrame(
        [(0, "w x q w"), (1, "r p q p")], "doc_id long, text string")
    fwd = {r.doc_id: r for r in rouge_n(a, b, n=2).collect()}
    rev = {r.doc_id: r for r in rouge_n(b, a, n=2).collect()}
    for k in fwd:
        assert fwd[k].clip == rev[k].clip
        assert fwd[k].precision == rev[k].recall
        assert fwd[k].recall == rev[k].precision
        assert fwd[k].f1 == rev[k].f1


def test_readability_hand_golden(spark):
    """'The cat. It sat!' -> W=4, S=2, Y=4: ease = 206.835 - 1.015*2
    - 84.6*1 = 120.205; grade = 0.39*2 + 11.8*1 - 15.59 = -3.01."""
    from flood_data_spark.datapipe.text import with_readability

    df = spark.createDataFrame([(0, "The cat. It sat!"),
                                (1, None),
                                (2, "xyz pfft")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in with_readability(df).collect()}
    r = out[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (4, 2, 4)
    assert r.flesch_ease == pytest.approx(120.205, abs=1e-6)
    assert r.fk_grade == pytest.approx(-3.01, abs=1e-6)
    # NULL text behaves as empty: clamped floors, never NULL/negative
    assert out[1].n_words == 1 and out[1].n_sentences == 1
    # vowel-less words: syllable clamp Y >= W
    assert out[2].n_syllables == out[2].n_words == 2


def test_zipf_fit_exact_line_and_guards(spark):
    """A perfectly Zipfian corpus (f = 12/r) fits slope -1,
    intercept ln 12, exactly up to micro-nat quantization."""
    import math

    from flood_data_spark.datapipe.text import zipf_fit

    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = zipf_fit(df, "text", top_ranks=10).collect()[0]
    assert r.n_ranks == 4
    assert r.slope == pytest.approx(-1.0, abs=1e-5)
    assert r.intercept == pytest.approx(math.log(12), abs=1e-5)
    # top_ranks truncation changes the fit input deterministically
    r2 = zipf_fit(df, "text", top_ranks=2).collect()[0]
    assert r2.n_ranks == 2
    assert r2.slope == pytest.approx(-1.0, abs=1e-5)
    with pytest.raises(ValueError, match="top_ranks"):
        zipf_fit(df, "text", top_ranks=0)
    # single-rank corpus: OLS undefined -> NULL
    one = spark.createDataFrame([(0, "x x x")], "doc_id long, text string")
    r3 = zipf_fit(one, "text").collect()[0]
    assert r3.n_ranks == 1 and r3.slope is None and r3.intercept is None


# --- corpus BLEU ------------------------------------------------------------


def _py_bleu(pairs, max_n=4):
    """Reference corpus BLEU (Papineni 2002, unsmoothed) over
    (cand, ref) text pairs, one reference each."""
    import math
    from collections import Counter

    def norm(t):
        return " ".join(t.strip().lower().split()).split(" ")

    clip = [0] * (max_n + 1)
    tot = [0] * (max_n + 1)
    c_len = r_len = 0
    for c, r in pairs:
        cw, rw = norm(c), norm(r)
        c_len += len(cw)
        r_len += len(rw)
        for n in range(1, max_n + 1):
            cg = Counter(tuple(cw[i:i + n])
                         for i in range(len(cw) - n + 1))
            rg = Counter(tuple(rw[i:i + n])
                         for i in range(len(rw) - n + 1))
            tot[n] += sum(cg.values())
            clip[n] += sum(min(v, rg[g]) for g, v in cg.items())
    if any(t == 0 for t in tot[1:]):
        return None
    if any(c == 0 for c in clip[1:]):
        return 0.0
    logs = sum(math.log(clip[n] / tot[n]) for n in range(1, max_n + 1))
    bp = 1.0 if c_len >= r_len else math.exp(1 - r_len / c_len)
    return bp * math.exp(logs / max_n)


def test_bleu_matches_reference_impl(spark):
    from flood_data_spark.datapipe.text import bleu_corpus

    pairs = [
        ("the cat sat on the mat", "the cat sat on a mat today"),
        ("it is a truth universally acknowledged that",
         "it is a truth universally acknowledged indeed that"),
        ("quick brown fox jumps", "the quick brown fox jumps over"),
    ]
    cand = spark.createDataFrame(
        [(i, "en", c) for i, (c, _) in enumerate(pairs)],
        "doc_id long, lang string, text string")
    ref = spark.createDataFrame(
        [(i, r) for i, (_, r) in enumerate(pairs)],
        "doc_id long, text string")
    got = bleu_corpus(cand, ref, group_keys=["lang"]).collect()[0]
    want = _py_bleu(pairs)
    assert got.c_len == sum(len(c.split()) for c, _ in pairs)
    assert got.r_len == sum(len(r.split()) for _, r in pairs)
    assert got.bleu == pytest.approx(want, abs=5e-6)
    assert got.bp < 1.0  # candidates shorter than references here


def test_bleu_perfect_zero_and_degenerate(spark):
    from flood_data_spark.datapipe.text import bleu_corpus

    rows_c = [(0, "perfect", "alpha beta gamma delta epsilon"),
              (1, "zero", "one two three four five"),
              (2, "short", "tiny pair")]  # < 4 tokens: no 4-grams
    rows_r = [(0, "alpha beta gamma delta epsilon"),
              (1, "six seven eight nine ten"),
              (2, "tiny pair")]
    cand = spark.createDataFrame(rows_c,
                                 "doc_id long, lang string, text string")
    ref = spark.createDataFrame(rows_r, "doc_id long, text string")
    out = {r.lang: r for r in
           bleu_corpus(cand, ref, group_keys=["lang"]).collect()}
    assert out["perfect"].bleu == pytest.approx(1.0, abs=2e-6)
    assert out["perfect"].bp == 1.0
    assert out["zero"].bleu == 0.0        # disjoint: clipped overlap 0
    assert out["short"].bleu is None      # no 4-grams exist: undefined
    with pytest.raises(ValueError, match="group key"):
        bleu_corpus(cand, ref, group_keys=[])


# --- chrF -------------------------------------------------------------------


def _py_chrf(c_text, r_text, orders=(2, 3, 4), beta=2):
    from collections import Counter

    def idiv(num, den):
        q = (2 * abs(num) + den) // (2 * den)
        return -q if num < 0 else q

    def gr(t, n):
        s = "".join(t.strip().lower().split())
        return Counter(s[i:i + n] for i in range(len(s) - n + 1))

    b2 = beta * beta
    fs = []
    for n in orders:
        cg, rg = gr(c_text, n), gr(r_text, n)
        a, b = sum(cg.values()), sum(rg.values())
        c = sum(min(v, rg[g]) for g, v in cg.items())
        den = b2 * b + a
        fs.append(idiv((1 + b2) * c * 10 ** 6, den) if den > 0 else 0)
    return idiv(sum(fs), len(orders)) / 1e6


def test_chrf_matches_reference_impl(spark):
    from flood_data_spark.datapipe.text import chrf

    pairs = [
        (0, "the cat sat on the mat", "the cat sat on a mat"),
        (1, "kitten", "sitting"),
        (2, "abc", "abc"),
        (3, "xy", "completely different words here"),
    ]
    cand = spark.createDataFrame([(i, c) for i, c, _ in pairs],
                                 "doc_id long, text string")
    ref = spark.createDataFrame([(i, r) for i, _, r in pairs],
                                "doc_id long, text string")
    out = {r.doc_id: r for r in chrf(cand, ref).collect()}
    for i, c, rtext in pairs:
        assert out[i].chrf == pytest.approx(_py_chrf(c, rtext),
                                            abs=1e-9), i
    # identical strings: f2 = f3 = 1, but 'abc' has no 4-grams -> 2/3
    assert out[2].f2 == 1.0 and out[2].f3 == 1.0
    assert out[2].chrf == pytest.approx(2 / 3, abs=2e-6)
    assert out[0].chrf > out[1].chrf > 0.0
    # 'xy' has zero 3/4-grams -> those orders contribute 0, row kept
    assert out[3].f4 == 0.0
    with pytest.raises(ValueError, match="beta"):
        chrf(cand, ref, beta=0)


def test_bleu_empty_texts_contribute_zero_tokens(spark):
    """An empty/whitespace-only text must contribute ZERO tokens —
    not one empty-string token that inflates c_len/r_len and can
    spuriously match (standard zero-token treatment)."""
    from flood_data_spark.datapipe.text import bleu_corpus

    rows_c = [(0, "mix", "alpha beta gamma delta epsilon"),
              (1, "mix", "   "),
              (2, "void", "")]
    rows_r = [(0, "alpha beta gamma delta epsilon"),
              (1, ""), (2, "")]
    cand = spark.createDataFrame(rows_c,
                                 "doc_id long, lang string, text string")
    ref = spark.createDataFrame(rows_r, "doc_id long, text string")
    out = {r.lang: r for r in
           bleu_corpus(cand, ref, group_keys=["lang"]).collect()}
    # the empty pair adds nothing: lengths are the real pair's alone
    assert (out["mix"].c_len, out["mix"].r_len) == (5, 5)
    assert out["mix"].bleu == pytest.approx(1.0, abs=2e-6)
    # an all-empty group has no grams at any order: undefined, not 1.0
    assert (out["void"].c_len, out["void"].r_len) == (0, 0)
    assert out["void"].bleu is None

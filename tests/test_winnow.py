"""Winnowing fingerprints (text.winnow_fingerprints / winnow_matches)
against a direct implementation of the SIGMOD'03 basic scheme."""

import hashlib
import re

import pytest

from flood_data_spark.datapipe.text import (winnow_fingerprints,
                                            winnow_matches)


def _brute_winnow(text, k, w):
    """Literal basic winnowing: every window of w gram hashes selects its
    minimum, rightmost on ties; short docs use one whole-doc window."""
    txt = re.sub(r"[^a-z0-9]", "", (text or "").lower())
    n = len(txt) - k + 1
    if n < 1:
        return set()
    h = [int(hashlib.md5(txt[p:p + k].encode()).hexdigest()[:13], 16)
         for p in range(n)]
    wp = min(w, n)
    sel = set()
    for i in range(n - wp + 1):
        m = min(h[i:i + wp])
        j = max(idx for idx in range(i, i + wp) if h[idx] == m)
        sel.add((j + 1, h[j]))          # 1-based positions
    return sel


def _spark_winnow(spark, texts, k, w):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = winnow_fingerprints(df, k=k, w=w).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    return got


def test_winnow_matches_brute_force_small_alphabet(spark):
    """Tiny alphabet forces heavy hash ties — the rightmost-tie rule and
    the short-doc single-window path both get exercised."""
    texts = []
    for i in range(40):
        seed = int(hashlib.md5(f"wn:{i}".encode()).hexdigest()[:8], 16)
        length = seed % 41                     # 0..40, includes < k docs
        texts.append("".join("ab"[(seed >> (j % 24)) & 1]
                             for j in range(length)))
    texts += [None, "", "   ", "a b!", "aaaaaaaaaaaa"]
    got = _spark_winnow(spark, texts, k=3, w=4)
    for doc_id, text in enumerate(texts):
        expected = _brute_winnow(text, 3, 4)
        assert got.get(doc_id, set()) == expected, (doc_id, text)


def test_winnow_matches_brute_force_wordlike(spark):
    """Word-like text (the documents-table shape), larger k/w."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for i in range(25):
        seed = int(hashlib.md5(f"wd:{i}".encode()).hexdigest(), 16)
        texts.append(" ".join(words[(seed >> (4 * j)) % 6]
                              for j in range(3 + seed % 12)))
    got = _spark_winnow(spark, texts, k=8, w=5)
    for doc_id, text in enumerate(texts):
        assert got.get(doc_id, set()) == _brute_winnow(text, 8, 5)


def test_winnow_density(spark):
    """Expected selected density on tie-free random text is 2/(w+1);
    allow a generous band."""
    seed = hashlib.md5(b"density").hexdigest()
    txt = "".join("abcdefghijklmnopqrstuvwxyz"[int(c, 16) % 26]
                  for c in seed * 200)          # 6400 chars
    k, w = 5, 8
    got = _spark_winnow(spark, [txt], k=k, w=w)[0]
    n = len(txt) - k + 1
    density = len(got) / n
    assert 1.2 / (w + 1) < density < 3.2 / (w + 1), density


def test_winnow_guarantee_and_matches(spark):
    """Any shared substring of length >= w + k - 1 must yield a shared
    fingerprint; winnow_matches surfaces the pair and only the pair."""
    k, w = 5, 4
    shared = "thequickbrownfoxjumps"          # len 21 >= w + k - 1 = 8
    texts = ["xxxyyyzzz" + shared + "111222",
             "0000" + shared + "99999888",
             "totally unrelated content here"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.n_shared
             for r in winnow_matches(df, k=k, w=w, min_shared=1).collect()}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_winnow_doc_freq_cap(spark):
    """A fingerprint present in every document is boilerplate: capping
    doc-freq removes the all-pairs clique it would create."""
    boiler = "communityguidelinesapply"
    texts = [f"unique{i}content{i}" + boiler for i in range(6)]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    uncapped = winnow_matches(df, k=5, w=4, min_shared=1).count()
    capped = winnow_matches(df, k=5, w=4, min_shared=1,
                            max_doc_freq=3).count()
    assert uncapped >= 15                      # the 6-doc clique
    assert capped < uncapped


def test_winnow_validation(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must"):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError, match="w must"):
        winnow_fingerprints(df, w=1)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_matches(df, min_shared=0)
    with pytest.raises(ValueError, match="max_doc_freq"):
        winnow_matches(df, max_doc_freq=0)

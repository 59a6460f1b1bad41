"""Golden tests for exact substring-duplication stats
(datapipe/dedup.repeated_span_stats — Lee et al. 2022 token-window form)."""

import pytest

from flood_data_spark.datapipe.dedup import repeated_span_stats


def test_repeated_spans_golden(spark):
    docs = spark.createDataFrame([
        (1, "a b c d e f g h i j"),    # spans a-h, b-i shared with doc 2
        (2, "x a b c d e f g h i y"),
        (3, "completely different words here no overlap at all ok"),
        (4, ""),                        # empty doc: all-zero row, not dropped
    ], "doc_id long, text string")
    rows = {r.doc_id: r for r in
            repeated_span_stats(docs, window=8).collect()}
    assert len(rows) == 4
    # doc 1: 3 spans total, 2 duplicated (a-h @1, b-i @2), covering pos 1-9
    assert (rows[1].n_tokens, rows[1].n_dup_spans,
            rows[1].n_dup_tokens) == (10, 2, 9)
    assert rows[1].dup_fraction == 0.9
    # doc 2: same two spans at pos 2-3, covering pos 2-10 of 11 tokens
    assert (rows[2].n_tokens, rows[2].n_dup_spans,
            rows[2].n_dup_tokens) == (11, 2, 9)
    # unique and empty docs report zeros
    assert rows[3].n_dup_spans == 0 and rows[3].dup_fraction == 0.0
    assert (rows[4].n_tokens, rows[4].n_dup_tokens) == (0, 0)


def test_repeated_spans_within_doc_repeat_not_flagged(spark):
    """min_distinct_docs=2 (default): a doc repeating its OWN boilerplate
    is not cross-document duplication."""
    docs = spark.createDataFrame([
        (1, "p q r s t u v w p q r s t u v w"),
        (2, "nothing in common with anything else at all here"),
    ], "doc_id long, text string")
    rows = {r.doc_id: r for r in
            repeated_span_stats(docs, window=8).collect()}
    assert rows[1].n_dup_spans == 0
    # min_distinct_docs=1 flags the self-repeat
    rows1 = {r.doc_id: r for r in
             repeated_span_stats(docs, window=8,
                                 min_distinct_docs=1).collect()}
    assert rows1[1].n_dup_spans > 0


def test_repeated_spans_rejects_bad_window(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        repeated_span_stats(docs, window=0)


def test_repeated_spans_plan_no_pair_join(spark):
    """The scale claim: no doc-pair join exists — the only joins are the
    span-hash semi-join and the final stat left joins."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (repeated_span_stats(docs, window=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_remove_repeated_spans_surgery(spark):
    from flood_data_spark.datapipe.dedup import remove_repeated_spans

    shared = "the same boiler plate line here again and unique"
    df = spark.createDataFrame(
        [(0, shared + " tail zero"),
         (1, shared + " tail one"),
         (2, "completely different content with no duplication at all")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           remove_repeated_spans(df, window=4).collect()}
    # docs 0/1: every 4-window inside the 10-token shared prefix
    # ("the..tail") is cross-doc duplicated -> only the unique last token
    # survives
    assert out[0].clean_text == "zero" and out[1].clean_text == "one"
    assert out[0].n_tokens == 11 and out[0].n_tokens_kept == 1
    # untouched doc comes back verbatim
    assert out[2].clean_text == df.collect()[2].text
    assert out[2].n_tokens_kept == out[2].n_tokens


def test_remove_matches_stats_coverage(spark):
    """Invariant: removal drops EXACTLY the positions repeated_span_stats
    counts as duplicated (n_tokens - n_tokens_kept == n_dup_tokens)."""
    from flood_data_spark.datapipe.dedup import (
        remove_repeated_spans, repeated_span_stats)

    rows = [(i, f"alpha beta gamma delta shared shared shared epsilon{i} "
                f"zeta{i % 2} eta theta iota kappa") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r.doc_id: r for r in repeated_span_stats(df, window=3).collect()}
    removed = {r.doc_id: r for r in
               remove_repeated_spans(df, window=3).collect()}
    for i in range(6):
        assert (removed[i].n_tokens - removed[i].n_tokens_kept
                == stats[i].n_dup_tokens), i


def test_remove_repeated_spans_empty_and_blank(spark):
    from flood_data_spark.datapipe.dedup import remove_repeated_spans

    df = spark.createDataFrame([(0, ""), (1, "   ")],
                               "doc_id long, text string")
    out = remove_repeated_spans(df, window=4).collect()
    assert all(r.n_tokens == 0 and r.clean_text == "" for r in out)


def test_remove_keep_first_preserves_first_occurrence(spark):
    from flood_data_spark.datapipe.dedup import remove_repeated_spans
    import pytest as _pytest

    shared = "the same boiler plate line here again and unique"
    df = spark.createDataFrame(
        [(0, shared + " tail zero"), (1, shared + " tail one")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           remove_repeated_spans(df, window=4, keep="first").collect()}
    # doc 0 holds the first occurrence of every duplicated span: intact
    assert out[0].n_tokens_kept == out[0].n_tokens
    # doc 1 keeps only its unique token
    assert out[1].clean_text == "one"
    with _pytest.raises(ValueError):
        remove_repeated_spans(df, keep="bogus")


def test_span_operators_null_text_safe(spark):
    """NULL text = zero tokens (never size(NULL) = -1) in both halves."""
    from flood_data_spark.datapipe.dedup import (
        remove_repeated_spans, repeated_span_stats)

    df = spark.createDataFrame([(0, None), (1, "a b c d e")],
                               "doc_id long, text string")
    s = {r.doc_id: r for r in repeated_span_stats(df, window=4).collect()}
    assert s[0].n_tokens == 0 and s[0].dup_fraction == 0.0
    r = {x.doc_id: x for x in remove_repeated_spans(df, window=4).collect()}
    assert r[0].n_tokens == 0 and r[0].clean_text == ""
    assert r[1].n_tokens_kept == 5

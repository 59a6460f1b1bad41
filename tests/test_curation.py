"""Curation operators: deterministic hash sampling, chunking, sequence
packing, per-key caps (datapipe/curation.py)."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.curation import (
    cap_per_key,
    chunk_documents,
    hash_cut,
    hash_sample,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}", "tok " * (10 + (i % 7) * 30)) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_hash_sample_deterministic_and_partition_independent(spark, docs):
    a = sorted(r.doc_id for r in hash_sample(docs, 0.3).collect())
    b = sorted(r.doc_id for r in
               hash_sample(docs.repartition(7), 0.3).collect())
    assert a == b          # same keys regardless of layout / rerun
    assert 0.15 * 200 < len(a) < 0.45 * 200   # rate honored (±noise)


def test_hash_sample_salts_give_different_samples(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, 0.3, salt="s1").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.3, salt="s2").collect()}
    assert a != b


def test_hash_sample_rate_edges(spark, docs):
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == 200
    with pytest.raises(ValueError, match="rate"):
        hash_cut(1.5)


def test_chunk_documents_covers_text_with_overlap(spark):
    text = "abcdefghijklmnopqrstuvwxyz" * 10   # 260 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = (chunk_documents(df, chunk_size=100, overlap=20)
           .orderBy("chunk_id").collect())
    # stride 80: ceil((260-20)/80) = 3 chunks
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert out[0].chunk_text == text[0:100]
    assert out[1].chunk_text == text[80:180]
    assert out[2].chunk_text == text[160:260]
    # consecutive chunks agree on the overlap region
    assert out[0].chunk_text[-20:] == out[1].chunk_text[:20]
    # stitching chunk strides reconstructs the document exactly
    assert "".join(r.chunk_text[:80] for r in out[:-1]) + out[-1].chunk_text \
        == text


def test_chunk_documents_short_and_empty_docs(spark):
    df = spark.createDataFrame([(1, "short"), (2, "")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_documents(df, 100, 20).collect()}
    assert out[1].chunk_text == "short" and out[1].chunk_id == 0
    assert out[2].chunk_text == "" and out[2].chunk_chars == 0
    assert len(out) == 2   # no rows silently dropped


def test_chunk_documents_validates_overlap(spark, docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_size=50, overlap=50)


def test_pack_sequences_first_fit_by_order(spark):
    rows = [(i, "s", 100) for i in range(10)]   # 100 tokens each
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {r.doc_id: r.pack_id for r in
           pack_sequences(df, token_budget=250).collect()}
    # cumulative-before: 0,100,200,300,... → packs 0,0,0,1,1,2,2,2,3,3
    assert [out[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_pack_sequences_partitioned_per_source(spark):
    rows = [(i, f"s{i % 2}", 100) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = pack_sequences(df, token_budget=250)
    # each source packs independently from zero
    firsts = (out.groupBy("source").agg(F.min("pack_id").alias("m"))
              .collect())
    assert all(r.m == 0 for r in firsts)


def test_pack_sequences_oversized_doc_gets_own_room(spark):
    df = spark.createDataFrame([(0, "s", 1000), (1, "s", 10)],
                               "doc_id long, source string, n_tokens long")
    out = {r.doc_id: r.pack_id for r in
           pack_sequences(df, token_budget=100).collect()}
    assert out[0] == 0 and out[1] == 10   # next doc lands past the big one


def test_cap_per_key_keeps_first_n(spark, docs):
    out = cap_per_key(docs, cap=5)
    assert out.columns == docs.columns     # helper column dropped
    per = out.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in per)
    kept = sorted(r.doc_id for r in out.filter("source = 'src0'").collect())
    assert kept == [0, 4, 8, 12, 16]       # first 5 in doc_id order


# ---------------------------------------------------------------- lines

from flood_data_spark.datapipe.curation import clean_lines, dedup_lines


@pytest.fixture(scope="module")
def line_docs(spark):
    rows = [
        (0, "the quick brown fox jumps.\nshort one\n\nanother good long line here.\nno punct but five words"),
        (1, "the quick brown fox jumps.\nunique to doc one here.\n\nBOILER PLATE FOOTER LINE."),
        (2, "BOILER PLATE FOOTER LINE.\nthe quick brown fox jumps.\nfresh content in document two."),
        (3, "BOILER PLATE FOOTER LINE.\nonly boiler here."),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_lines_drops_short_and_unterminated(spark, line_docs):
    out = {r.doc_id: r for r in clean_lines(line_docs, min_words=4).collect()}
    assert out[0].n_lines == 5
    # kept: 'the quick brown fox jumps.' and 'another good long line here.'
    assert out[0].n_lines_kept == 2
    assert out[0].clean_text == (
        "the quick brown fox jumps.\nanother good long line here.")
    assert out[4].n_lines == 1 and out[4].n_lines_kept == 0
    assert out[4].clean_text == ""


def test_clean_lines_no_terminal_requirement(spark, line_docs):
    out = {r.doc_id: r for r in
           clean_lines(line_docs, min_words=4,
                       require_terminal=False).collect()}
    assert out[0].n_lines_kept == 3   # 'short one' and the blank drop


def test_clean_lines_is_shuffle_free(spark, line_docs):
    plan = clean_lines(line_docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_lines_keeps_first_occurrence(spark, line_docs):
    out = {r.doc_id: r for r in dedup_lines(line_docs).collect()}
    # 'the quick brown fox jumps.' first occurs at (doc 0, pos 0)
    assert out[0].clean_text.startswith("the quick brown fox jumps.")
    assert "the quick brown fox" not in out[1].clean_text
    assert "the quick brown fox" not in out[2].clean_text
    # doc 1 keeps its unique line and the first BOILER occurrence
    assert "unique to doc one here." in out[1].clean_text
    assert "BOILER PLATE FOOTER LINE." in out[1].clean_text
    assert "BOILER" not in out[2].clean_text
    # blank lines are preserved, not deduplicated
    assert out[0].n_lines == 5 and "\n\n" in out[0].clean_text
    assert out[1].clean_text.count("\n") == out[1].n_lines_kept - 1
    # every input doc is present, even fully-emptied ones
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[4].clean_text == "" and out[4].n_lines_kept >= 0


def test_dedup_lines_doc_freq_cap_removes_boilerplate(spark, line_docs):
    out = {r.doc_id: r for r in
           dedup_lines(line_docs, max_doc_freq=2).collect()}
    # both 3-doc lines exceed cap=2: removed EVERYWHERE, incl. first
    for i in (1, 2, 3):
        assert "BOILER" not in out[i].clean_text
    assert "the quick brown fox" not in out[0].clean_text
    # unique (under-cap) lines are untouched
    assert "another good long line here." in out[0].clean_text
    assert "unique to doc one here." in out[1].clean_text


def test_dedup_lines_order_is_positional(spark, line_docs):
    out = {r.doc_id: r for r in dedup_lines(line_docs).collect()}
    lines = out[0].clean_text.split("\n")
    orig = line_docs.filter(F.col("doc_id") == 0).first().text.split("\n")
    assert lines == [l for l in orig]   # doc 0 is fully first-occurrence


# ------------------------------------------------- splits / strata / shuffle

from flood_data_spark.datapipe.curation import (
    assign_split, stratified_sample, with_shuffle_key)


def test_assign_split_partitions_every_row_once(spark, docs):
    out = assign_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.c for r in
              out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == 200
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)
    assert 0.6 * 200 < counts["train"] < 0.95 * 200


def test_assign_split_stable_under_corpus_growth(spark, docs):
    full = {r.doc_id: r.split for r in
            assign_split(docs, {"train": 0.9, "val": 0.1}).collect()}
    half = {r.doc_id: r.split for r in
            assign_split(docs.filter(F.col("doc_id") < 100),
                         {"train": 0.9, "val": 0.1}).collect()}
    assert all(full[k] == v for k, v in half.items())


def test_assign_split_rejects_bad_weights(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(docs, {"train": 0.5, "val": 0.1})


def test_stratified_sample_honors_per_stratum_rates(spark, docs):
    out = stratified_sample(docs, {"src0": 1.0, "src1": 0.0},
                            default_rate=0.4)
    counts = {r.source: r.c for r in
              out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts["src0"] == 50          # rate 1.0 keeps all
    assert "src1" not in counts          # rate 0.0 drops all
    for s in ("src2", "src3"):           # default applies to the rest
        assert 0.15 * 50 < counts[s] < 0.7 * 50


def test_stratified_sample_consistent_with_hash_sample(spark, docs):
    strat = {r.doc_id for r in
             stratified_sample(docs, {}, default_rate=0.3).collect()}
    plain = {r.doc_id for r in hash_sample(docs, 0.3).collect()}
    assert strat == plain                # same cut, same keys


def test_with_shuffle_key_deterministic_and_seed_sensitive(spark, docs):
    a = [r.doc_id for r in with_shuffle_key(docs, "1")
         .orderBy("shuffle_key").collect()]
    b = [r.doc_id for r in with_shuffle_key(docs.repartition(5), "1")
         .orderBy("shuffle_key").collect()]
    c = [r.doc_id for r in with_shuffle_key(docs, "2")
         .orderBy("shuffle_key").collect()]
    assert a == b                        # layout-independent
    assert a != c                        # seed changes the order
    assert sorted(a) == list(range(200)) # a permutation, nothing lost


def test_length_buckets_tiers_and_batches(spark):
    from flood_data_spark.datapipe.curation import length_buckets

    df = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate([0, 1, 2, 3, 4, 7, 8, 100])],
        "doc_id long, source string, n_tokens long")
    rows = {r.doc_id: r for r in
            length_buckets(df, batch_size=2).collect()}
    # bit-length tiers: 0->0, 1->1, 2..3->2, 4..7->3, 8->4, 100->7
    assert [rows[i].bucket for i in range(8)] == [0, 1, 2, 2, 3, 3, 4, 7]
    # bucket 2 holds doc 2,3 -> one batch; bucket 3 holds 4,5 -> one batch
    assert rows[2].batch_id == 0 and rows[3].batch_id == 0
    # batch splits at batch_size within a bucket
    df2 = spark.createDataFrame(
        [(i, "s", 5) for i in range(5)],
        "doc_id long, source string, n_tokens long")
    r2 = {r.doc_id: r.batch_id for r in
          length_buckets(df2, batch_size=2).collect()}
    assert [r2[i] for i in range(5)] == [0, 0, 1, 1, 2]


def test_length_buckets_rejects_bad_batch_size(spark):
    import pytest
    from flood_data_spark.datapipe.curation import length_buckets

    df = spark.createDataFrame([(1, "s", 5)],
                               "doc_id long, source string, n_tokens long")
    with pytest.raises(ValueError, match="batch_size"):
        length_buckets(df, batch_size=0)


def test_leakage_safe_split_keeps_components_together(spark):
    from flood_data_spark.datapipe.curation import (
        assign_split, leakage_safe_split)

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string")
    # components: {0,7,15} and {20,21}; everything else is a singleton
    pairs = spark.createDataFrame(
        [(0, 7), (7, 15), (20, 21)], "id_a long, id_b long")
    out = leakage_safe_split(docs, pairs,
                             {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 40
    # every member of a component shares group id AND split
    assert {rows[i].group_id for i in (0, 7, 15)} == {0}
    assert len({rows[i].split for i in (0, 7, 15)}) == 1
    assert {rows[i].group_id for i in (20, 21)} == {20}
    assert rows[20].split == rows[21].split
    # untouched documents: same assignment plain assign_split would give
    plain = {r.doc_id: r.split
             for r in assign_split(docs, {"train": 0.8, "val": 0.1,
                                          "test": 0.1}).collect()}
    for i in rows:
        if i not in (0, 7, 15, 20, 21):
            assert rows[i].group_id == i and rows[i].split == plain[i]


def test_pack_sequences_rejects_bad_token_budget(spark):
    import pytest
    from flood_data_spark.datapipe.curation import pack_sequences

    df = spark.createDataFrame([(1, "s", 5)],
                               "doc_id long, source string, n_tokens long")
    with pytest.raises(ValueError, match="token_budget"):
        pack_sequences(df, token_budget=0)


def test_source_mixture_weights_flattens_distribution(spark):
    from flood_data_spark.datapipe.curation import source_mixture_weights
    import pytest as _pytest

    # source A: 8 docs x 4 tokens = 32; source B: 2 docs x 4 tokens = 8
    rows = [(i, "a b c d", "A" if i < 8 else "B") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in
           source_mixture_weights(df, alpha=0.3).collect()}
    assert out["A"].n_docs == 8 and out["A"].n_tokens == 32
    assert out["B"].n_tokens == 8
    assert out["A"].token_share == _pytest.approx(0.8)
    # temperature flattening: B's weight exceeds its raw share,
    # A's falls below its raw share, both still ordered A > B, sum = 1
    assert out["B"].weight > 0.2 and out["A"].weight < 0.8
    assert out["A"].weight > out["B"].weight
    assert out["A"].weight + out["B"].weight == _pytest.approx(1.0, abs=2e-6)
    # hand value: w_A = .8^.3 / (.8^.3 + .2^.3)
    exp_a = 0.8 ** 0.3 / (0.8 ** 0.3 + 0.2 ** 0.3)
    assert out["A"].weight == _pytest.approx(exp_a, abs=1e-5)
    with _pytest.raises(ValueError):
        source_mixture_weights(df, alpha=0.0)


def test_rank_normalize_per_group_percentiles(spark):
    from flood_data_spark.datapipe.curation import rank_normalize

    rows = [(0, 0.1, "A"), (1, 0.5, "A"), (2, 0.9, "A"),
            (3, 0.2, "B"), (4, 0.2, "B"),          # tie in B
            (5, 0.7, "C")]                          # singleton group
    df = spark.createDataFrame(rows, "doc_id long, score double, source string")
    out = {r.doc_id: r.pct_rank for r in
           rank_normalize(df, "score").collect()}
    assert out[0] == 0.0 and out[1] == 0.5 and out[2] == 1.0
    assert out[3] == 0.0 and out[4] == 0.0          # ties share rank
    assert out[5] == 0.0                            # single row → 0


def test_global_window_fallbacks_warn(spark):
    """Empty partition_cols serializes through one window task — allowed
    (test-only contract) but must be LOUD."""
    import warnings as _warnings

    from flood_data_spark.datapipe.curation import rank_normalize

    df = spark.createDataFrame([(0, "s", 10, 0.5), (1, "s", 20, 0.7)],
                               "doc_id long, source string, n_tokens long,"
                               " score double")
    for call in (lambda: pack_sequences(df, token_budget=100,
                                        partition_cols=()),
                 lambda: cap_per_key(df, cap=1, partition_cols=()),
                 lambda: rank_normalize(df, "score", partition_cols=())):
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            call()
        assert any("GLOBAL ordered window" in str(w.message)
                   for w in caught), call

    # the partitioned (scale) path stays silent
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        pack_sequences(df, token_budget=100)
    assert not any("GLOBAL" in str(w.message) for w in caught)


def test_quality_tiers_per_group_terciles(spark):
    from flood_data_spark.datapipe.curation import quality_tiers

    # 9 rows per source, scores 1..9 — exact terciles
    rows = [(s * 100 + i, f"s{s}", float(i)) for s in range(2)
            for i in range(1, 10)]
    df = spark.createDataFrame(rows, "doc_id long, source string,"
                               " score double")
    out = {r.doc_id: r.tier for r in
           quality_tiers(df, "score", partition_cols=("source",)).collect()}
    for s in range(2):
        # lower score = head (perplexity orientation)
        assert [out[s * 100 + i] for i in (1, 2, 3)] == ["head"] * 3
        assert [out[s * 100 + i] for i in (4, 5, 6)] == ["middle"] * 3
        assert [out[s * 100 + i] for i in (7, 8, 9)] == ["tail"] * 3


def test_quality_tiers_higher_is_better_flips(spark):
    from flood_data_spark.datapipe.curation import quality_tiers

    df = spark.createDataFrame([(i, "s", float(i)) for i in range(1, 10)],
                               "doc_id long, source string, score double")
    out = {r.doc_id: r.tier for r in
           quality_tiers(df, "score", partition_cols=("source",),
                         higher_is_better=True).collect()}
    assert out[9] == "head" and out[1] == "tail"


def test_quality_tiers_validates_cuts_and_labels(spark):
    from flood_data_spark.datapipe.curation import quality_tiers

    df = spark.createDataFrame([(0, "s", 1.0)],
                               "doc_id long, source string, score double")
    with pytest.raises(ValueError, match="labels"):
        quality_tiers(df, "score", labels=("a", "b"))
    with pytest.raises(ValueError, match="ascending"):
        quality_tiers(df, "score", cuts=(0.9, 0.1), labels=("a", "b", "c"))


def test_suppress_rare_combinations(spark):
    from flood_data_spark.datapipe.curation import (
        suppress_rare_combinations)

    rows = ([(i, "en", "web") for i in range(5)]          # combo of 5
            + [(10, "de", "web"), (11, "de", "books")])   # singletons
    df = spark.createDataFrame(rows, "doc_id long, lang string,"
                               " source string")
    kept = {r.doc_id for r in
            suppress_rare_combinations(df, ("lang", "source"), k=5)
            .collect()}
    assert kept == set(range(5))
    # k=1 keeps everything; bad params raise
    assert suppress_rare_combinations(df, ("lang",), k=1).count() == 7
    with pytest.raises(ValueError, match="k must"):
        suppress_rare_combinations(df, ("lang",), k=0)
    with pytest.raises(ValueError, match="quasi_cols"):
        suppress_rare_combinations(df, (), k=2)


def test_plan_mixture_targets_and_capped_rates(spark):
    from flood_data_spark.datapipe.curation import (
        plan_mixture, stratified_sample)

    # big: 80 docs x 10 tokens; small: 4 docs x 5 tokens
    rows = [(i, "big", "t " * 10) for i in range(80)]
    rows += [(100 + i, "small", "t " * 5) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string,"
                               " text string")
    plan = {r.source: r for r in plan_mixture(df, token_budget=400,
                                              alpha=0.3).collect()}
    assert plan["big"].n_tokens == 800 and plan["small"].n_tokens == 20
    # weights sum to 1; targets sum to ~budget
    assert abs(plan["big"].weight + plan["small"].weight - 1.0) < 1e-5
    assert abs(plan["big"].target_tokens + plan["small"].target_tokens
               - 400) <= 1
    # alpha-flattening drives the small source's target past its size →
    # rate caps at 1.0; the big source downsamples
    assert plan["small"].rate == 1.0
    assert 0.0 < plan["big"].rate < 1.0
    # the plan executes through stratified_sample
    rates = {s: p.rate for s, p in plan.items()}
    mix = stratified_sample(df, rates)
    assert mix.filter("source = 'small'").count() == 4
    big_kept = mix.filter("source = 'big'").count()
    assert 0 < big_kept < 80
    with pytest.raises(ValueError, match="token_budget"):
        plan_mixture(df, token_budget=0)


def test_url_normalization_rules(spark):
    """normalize_url/url_host: case folding, userinfo, default vs
    explicit ports, tracking-param removal, param sorting, fragment
    removal, empty-path and empty-query edges."""
    from pyspark.sql import functions as F

    from flood_data_spark.datapipe.curation import normalize_url, url_host

    cases = [
        ("HTTPS://User:p@WWW.Example.COM:443/Path/X"
         "?utm_source=a&b=2&a=1#frag",
         "https://www.example.com/Path/X?a=1&b=2", "www.example.com"),
        ("http://HOST.net:80", "http://host.net/", "host.net"),
        ("http://host.net:8080/x?fbclid=1",
         "http://host.net:8080/x", "host.net"),
        ("https://a.b/?utm_campaign=z", "https://a.b/", "a.b"),
        ("ftp://Files.example.org:21/pub",
         "ftp://files.example.org:21/pub", "files.example.org"),
        ("https://x.y/p?z=1&z=1", "https://x.y/p?z=1&z=1", "x.y"),
        # a '?' INSIDE the fragment is NOT a query start (hash-bang
        # SPA URLs): the whole fragment drops, nothing leaks
        ("http://h.i/p#a?b=1", "http://h.i/p", "h.i"),
        ("https://h.i/p?b=1&a=2#f?c=3&utm_x=9",
         "https://h.i/p?a=2&b=1", "h.i"),
        ("http://h.i#only?frag=1", "http://h.i/", "h.i"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _, _) in
                                enumerate(cases)], "i int, u string")
    got = {r.i: (r.n, r.h) for r in
           df.select("i", normalize_url(F.col("u")).alias("n"),
                     url_host(F.col("u")).alias("h")).collect()}
    for i, (_, en, eh) in enumerate(cases):
        assert got[i] == (en, eh), (i, got[i])


def test_url_normalization_collides_equivalent_fetches(spark):
    """The dedup motivation: two syntactically different fetches of the
    same resource must share url_norm."""
    from pyspark.sql import functions as F

    from flood_data_spark.datapipe.curation import normalize_url

    pair = [("https://Site.org:443/a?b=1&a=2&utm_source=tw#x",),
            ("HTTPS://site.ORG/a?a=2&b=1",)]
    df = spark.createDataFrame(pair, "u string")
    vals = [r.n for r in
            df.select(normalize_url(F.col("u")).alias("n")).collect()]
    assert vals[0] == vals[1] == "https://site.org/a?a=2&b=1"


def test_url_normalization_is_idempotent(spark):
    """normalize_url is a canonicalization: applying it twice equals
    applying it once (already-canonical URLs pass through), across a
    grid of messy inputs."""
    from pyspark.sql import functions as F

    from flood_data_spark.datapipe.curation import normalize_url

    urls = [
        "HTTPS://A.B:443/x?b=2&a=1#f",
        "http://u:p@H.i:80/?utm_source=t",
        "https://h.j:8443/p/q?z=9&y=8&utm_term=k",
        "ftp://X.y/z",
        "http://plain.example/path",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(normalize_url(F.col("u")).alias("n"))
    twice = once.select(F.col("n").alias("u")) \
        .select(normalize_url(F.col("u")).alias("n"))
    assert [r.n for r in once.collect()] == \
        [r.n for r in twice.collect()]

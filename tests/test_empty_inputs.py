"""Empty-input hardening: every main operator degrades to an empty result
with the right schema — no crashes, no null-pointer plans.  At 100 TB an
empty day partition, an all-filtered region, or a dup-free corpus are
routine, not edge cases."""

import pytest
from pyspark.sql import functions as F

from flood_data_spark.datapipe.dedup import (
    dedup_clusters,
    exact_dedup,
    ngram_jaccard_pairs,
)
from flood_data_spark.datapipe.similarity import cosine_topk_bruteforce
from flood_data_spark.operators.intensity import flood_intensity
from flood_data_spark.operators.serving import point_lookup
from flood_data_spark.operators.tendency import flood_tendency
from flood_data_spark.operators.threshold import ensemble_threshold_summary
from flood_data_spark.operators.timeseries import asof_join, sessionize
from flood_data_spark.plans.daily_pipeline import DailyForecastPipeline


@pytest.fixture()
def empty_forecast(spark):
    return spark.createDataFrame(
        [], "latitude double, longitude double, issued_on date,"
            " valid_for date, step int, dis24 float")


@pytest.fixture()
def thresholds(spark):
    return spark.createDataFrame(
        [(0.025, 0.025, 10.0, 20.0, 30.0)],
        "latitude double, longitude double, threshold_2y double,"
        " threshold_5y double, threshold_20y double")


def test_empty_daily_pipeline(spark, empty_forecast, thresholds):
    products = DailyForecastPipeline(accuracy_mode="exact").run(
        empty_forecast, thresholds)
    assert products.detailed.count() == 0
    assert products.summary.count() == 0
    assert "wkt" in products.summary.columns


def test_empty_threshold_summary_schema(spark, empty_forecast, thresholds):
    out = ensemble_threshold_summary(empty_forecast, thresholds,
                                     accuracy_mode="exact")
    assert out.count() == 0
    for c in ("p_above_2y", "median_dis", "max_dis"):
        assert c in out.columns


def test_empty_classifications(spark):
    t = spark.createDataFrame(
        [], "k long, median_dis double, control_dis double,"
            " max_dis double, min_dis double")
    assert flood_tendency(t, key_cols=("k",)).count() == 0
    i = spark.createDataFrame(
        [], "k long, p_above_20y double, p_above_5y double, p_above_2y double")
    assert flood_intensity(i, key_cols=("k",)).count() == 0


def test_empty_dedup_and_similarity(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_clusters(pairs).count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert cosine_topk_bruteforce(emb, emb, k=3).count() == 0


def test_empty_timeseries(spark):
    left = spark.createDataFrame([], "k long, ts timestamp, v double")
    right = spark.createDataFrame([], "k long, ts timestamp, q double")
    out = asof_join(left, right, on="k")
    assert out.count() == 0
    assert "q_right" in out.columns
    ev = spark.createDataFrame([], "user_id long, ts timestamp")
    assert sessionize(ev).count() == 0


def test_lookup_miss_is_empty_not_error(spark):
    cells = spark.createDataFrame(
        [(0.025, 0.025, 1.0)], "latitude double, longitude double, v double")
    assert point_lookup(cells, 50.0, 50.0).count() == 0


def test_empty_curation_lines_and_splits(spark):
    from flood_data_spark.datapipe.curation import (
        assign_split, clean_lines, dedup_lines, stratified_sample,
        with_shuffle_key)
    docs = spark.createDataFrame([], "doc_id long, source string, text string")
    out = clean_lines(docs)
    assert out.count() == 0
    assert {"n_lines", "n_lines_kept", "clean_text"} <= set(out.columns)
    dd = dedup_lines(docs)
    assert dd.count() == 0
    assert dd.columns == ["doc_id", "n_lines", "n_lines_kept", "clean_text"]
    assert assign_split(docs, {"train": 1.0}).count() == 0
    assert stratified_sample(docs, {"src0": 0.5}).count() == 0
    assert with_shuffle_key(docs).count() == 0


def test_round4_operators_on_empty_inputs(spark):
    """Empty frames flow through the round-4 operators without error and
    produce empty (or degenerate-but-typed) results."""
    from flood_data_spark.datapipe.quantize import quantize_embeddings
    from flood_data_spark.datapipe.sketches import (
        corpus_distinct_stats, token_heavy_hitters)
    from flood_data_spark.functions.keys import with_morton_key
    from flood_data_spark.operators.timeseries import resample_ffill
    from flood_data_spark.datapipe.text import build_vocab

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert quantize_embeddings(empty_emb).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert token_heavy_hitters(empty_docs).count() == 0
    assert build_vocab(empty_docs).count() == 0
    stats = corpus_distinct_stats(empty_docs, ["doc_id"]).collect()[0]
    assert stats.n_rows == 0 and stats.doc_id_approx_distinct == 0

    empty_grid = spark.createDataFrame(
        [], "latitude double, longitude double")
    assert with_morton_key(empty_grid).count() == 0

    empty_ts = spark.createDataFrame([], "k string, step int, v double")
    assert resample_ffill(empty_ts, "k", "step", "v").count() == 0


def test_round6_operators_degrade_gracefully(spark):
    """Round-6 operators on empty/degenerate inputs: empty results with
    the right schema or left-outer nulls — never a crash."""
    from flood_data_spark.datapipe.curation import (
        leakage_safe_split, length_buckets)
    from flood_data_spark.datapipe.dedup import repeated_span_stats
    from flood_data_spark.datapipe.similarity import semantic_dedup
    from flood_data_spark.operators.grid import nearest_reindex
    from flood_data_spark.operators.timeseries import pattern_topk

    # empty target -> empty result; empty source -> left-outer null row
    src = spark.createDataFrame([(0.025, 0.025, 1.0)],
                                "latitude double, longitude double, v double")
    assert nearest_reindex(
        spark.createDataFrame([], "latitude double, longitude double"),
        src, resolution=0.05).count() == 0
    row = nearest_reindex(
        spark.createDataFrame([(0.03, 0.03)],
                              "latitude double, longitude double"),
        spark.createDataFrame([],
                              "latitude double, longitude double, v double"),
        resolution=0.05).collect()[0]
    assert row.v_src is None and row.distance_src is None

    # every series shorter than the pattern -> zero windows, zero rows
    short = spark.createDataFrame([(1, 1, 1.0), (1, 2, 2.0)],
                                  "user_id long, seq long, value double")
    assert pattern_topk(short, [1.0, 2.0, 3.0], key_col="user_id",
                        order_cols=("seq",), value_col="value").count() == 0

    # empty corpus -> empty stats
    assert repeated_span_stats(
        spark.createDataFrame([], "doc_id long, text string")).count() == 0

    # fewer vectors than nlist: k-means degenerates but dedup still runs
    few = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])],
                                "vec_id long, embedding array<double>")
    assert sorted(r.vec_id for r in
                  semantic_dedup(few, nlist=16,
                                 train_fraction=1.0).collect()) == [1, 2]

    # empty frames through batching / empty pair relation through splits
    assert length_buckets(
        spark.createDataFrame([], "doc_id long, source string, n_tokens long"),
        batch_size=4).count() == 0
    out = leakage_safe_split(
        spark.createDataFrame([(1, "t")], "doc_id long, text string"),
        spark.createDataFrame([], "id_a long, id_b long"),
        {"train": 1.0}).collect()
    assert out[0].group_id == 1 and out[0].split == "train"


def test_round7_operators_on_empty_inputs(spark):
    from flood_data_spark.datapipe.bpe import (
        bpe_encode, bpe_encode_with_dict, bpe_train, pair_counts,
        word_frequencies)
    from flood_data_spark.datapipe.text import unigram_lm_scores

    empty_docs = spark.createDataFrame([], "doc_id long, text string")

    # BPE: trainer returns no merges and an empty vocab; both encoders
    # return empty frames with the tokens column present
    merges, vocab = bpe_train(empty_docs, n_merges=3)
    assert merges == [] and vocab.count() == 0
    assert word_frequencies(empty_docs).count() == 0
    enc = bpe_encode(empty_docs, [("a", "b", 1)])
    assert enc.count() == 0 and "bpe_tokens" in enc.columns
    encd = bpe_encode_with_dict(empty_docs, [("a", "b", 1)],
                                id_col="doc_id")
    assert encd.count() == 0 and "bpe_tokens" in encd.columns

    # unigram LM on an empty corpus: no rows, schema intact
    out = unigram_lm_scores(empty_docs)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "n_tokens", "cross_entropy",
                                "perplexity"}

    # pair_counts on a vocabulary of 1-char words: zero pairs, not a crash
    from flood_data_spark.datapipe.bpe import _char_symbols
    one_char = spark.createDataFrame([(0, "a b c")],
                                     "doc_id long, text string")
    wf = (word_frequencies(one_char)
          .select(_char_symbols(F.col("word")).alias("symbols"), "freq"))
    assert pair_counts(wf).count() == 0


def test_round7_third_batch_on_empty_inputs(spark):
    from flood_data_spark.datapipe.clustering import cluster_balanced_sample
    from flood_data_spark.datapipe.curation import (
        dsir_weights, rank_normalize, source_mixture_weights)
    from flood_data_spark.datapipe.text import (
        bigram_lm_scores, bm25_topk, with_gopher_rules,
        with_ngram_diversity)

    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string")

    assert bm25_topk(empty, ["x"], k=5).count() == 0
    assert with_gopher_rules(empty).count() == 0
    assert with_ngram_diversity(empty).count() == 0
    assert source_mixture_weights(empty).count() == 0
    assert rank_normalize(empty, "doc_id").count() == 0
    assert bigram_lm_scores(empty).count() == 0

    # scoring docs against an EMPTY LM corpus: rows stay visible with
    # null metrics (nothing to score against), never a crash
    docs = spark.createDataFrame([(0, "a b", "s")],
                                 "doc_id long, text string, source string")
    out = bigram_lm_scores(docs, lm_corpus=empty).collect()
    assert len(out) == 1 and out[0].n_bigrams == 1

    # DSIR with an empty target: weights are pure raw-side penalties,
    # defined (finite) for every document
    w = dsir_weights(docs, empty).collect()
    assert len(w) == 1 and w[0].log_weight is not None

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert cluster_balanced_sample(
        empty_emb, [[1.0, 0.0], [0.0, 1.0]], per_cluster=3).count() == 0


def test_empty_round14_operators(spark):
    """The round-14 families degrade to empty results with the right
    schemas on empty frames (an all-filtered region or a dry season
    is routine at 100 TB, not an edge case)."""
    from flood_data_spark.datapipe.curation import fim_transform
    from flood_data_spark.operators.extremes import (
        idf_curves, low_flow_frequency, regional_growth_curve,
        spi_empirical)
    from flood_data_spark.operators.grid import conservative_regrid
    from flood_data_spark.operators.postprocess import quantile_map
    from flood_data_spark.operators.routing import (
        rating_curve, snow_degree_day, uh_convolve)
    from flood_data_spark.operators.stats import (
        pettitt_test, seasonal_mann_kendall)
    from flood_data_spark.operators.verification import fss, rps_score

    e_hydro = spark.createDataFrame(
        [], "cell string, day int, blk int, v double")
    e_grid = spark.createDataFrame(
        [], "grp string, i int, j int, fc int, ob int")
    e_mem = spark.createDataFrame(
        [], "cell string, t int, member double, obs double")
    e_site = spark.createDataFrame(
        [], "region string, site string, am double")
    e_season = spark.createDataFrame(
        [], "cell string, season int, t int, x double")
    e_snow = spark.createDataFrame(
        [], "basin string, t int, p double, temp double")
    e_docs = spark.createDataFrame([], "doc_id long, text string")
    e_geo = spark.createDataFrame(
        [], "lat double, lon double, v double")
    cases = [
        spi_empirical(e_hydro, "v", ["cell"], "day"),
        idf_curves(e_hydro, "v", "day", "blk", ["cell"],
                   durations=(1, 2), periods=(10,)),
        low_flow_frequency(e_hydro, "v", "day", "blk", ["cell"]),
        regional_growth_curve(e_site, "am", ["region"], "site"),
        fss(e_grid, "i", "j", "fc", "ob", ["grp"]),
        rps_score(e_mem, "member", "obs", ["cell"], ["t"],
                  thresholds=(1.0, 2.0)),
        quantile_map(e_hydro.select("cell", "v"),
                     e_hydro.select("cell", "v"), "v", ["cell"]),
        uh_convolve(e_hydro, "v", "day", ["cell"], [0.5, 0.5]),
        rating_curve(e_hydro, "v", "v", ["cell"]),
        snow_degree_day(e_snow, "p", "temp", "t", ["basin"]),
        pettitt_test(e_hydro, "v", "day", ["cell"]),
        seasonal_mann_kendall(e_season, "x", "t", "season", ["cell"]),
        fim_transform(e_docs),
        conservative_regrid(e_geo, "lat", "lon", "v", 0.05, 0.1),
    ]
    for df in cases:
        assert df.count() == 0


def test_empty_round15_operators(spark):
    """Round-15 additions degrade to empty results on empty frames."""
    from flood_data_spark.datapipe.dedup import (dedup_keep_best,
                                                 soft_dedup_weights)
    from flood_data_spark.datapipe.similarity import (ivf_append,
                                                      ivf_drift_report)
    from flood_data_spark.operators.extremes import (
        drought_classes, flow_duration_curve,
        flow_percentile_class)
    from flood_data_spark.operators.threshold import alert_triggers

    e_hydro = spark.createDataFrame([], "cell string, day int, v double")
    e_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "list_id int, cvec array<double>")
    e_lists = spark.createDataFrame(
        [], "neighbor_id long, neighbor_id_vec array<double>, "
            "list_id int")
    cases = [
        flow_duration_curve(e_hydro, "v", ["cell"]),
        flow_percentile_class(e_hydro.select("cell", "v"),
                              e_hydro.select("cell", "v"),
                              "v", ["cell"]),
        ivf_append(centroids, e_emb),
        ivf_drift_report(centroids, e_lists),
        alert_triggers(spark.createDataFrame(
            [], "cell string, lead int, p double"),
            "p", "lead", ["cell"]),
        soft_dedup_weights(spark.createDataFrame(
            [], "doc_id long, text string")),
        drought_classes(spark.createDataFrame(
            [], "cell string, spi double"), "spi"),
        dedup_keep_best(spark.createDataFrame(
            [], "doc_id long, text string, q double"), "q"),
    ]
    for df in cases:
        assert df.count() == 0

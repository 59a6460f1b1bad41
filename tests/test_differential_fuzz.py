"""Differential fuzzing: run an operator on Spark AND its registered
DuckDB oracle SQL on the SAME randomly generated corpus, and require
cell-level agreement.  The driver's gate proves parity on the fixed
testdata; this proves it on corpora the oracles were never tuned to —
random lengths, blank docs, repeated tokens, skewed sources.
"""

import math
import random

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

VOCAB = (["the", "of", "and", "data", "flood", "model", "river"]
         + [f"tok{i}" for i in range(25)])


def _random_corpus(seed, n_docs=60):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(0, 40)
        text = " ".join(rng.choice(VOCAB) for _ in range(n))
        if rng.random() < 0.1:
            text = ""                          # blank docs in every draw
        rows.append((i, text, rng.choice(["s0", "s1", "s2"]),
                     rng.choice(["en", "de"]), len(text)))
    return pd.DataFrame(rows, columns=["doc_id", "text", "source",
                                       "lang", "n_chars"])


def _rows_close(a, b, tol=1e-6):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                if va is None or vb is None:
                    if va is not vb:
                        return False
                elif not math.isclose(va, vb, rel_tol=tol, abs_tol=tol):
                    return False
            elif va != vb:
                return False
    return True


def _sort_key(row):
    return tuple((v is None, "" if v is None else str(type(v)), v)
                 for v in row)


def _compare(pdf, spark_df, oracle_key, table="documents",
             require_rows=False):
    con = duckdb.connect()
    con.register(table, pdf)
    duck_df = con.execute(entry_mod.oracle_sql()[oracle_key]).fetchdf()
    duck_df.columns = [c.lower() for c in duck_df.columns]
    cols = sorted(duck_df.columns)
    duck_rows = sorted(
        (tuple(None if pd.isna(v) else v for v in r)
         for r in duck_df[cols].itertuples(index=False, name=None)),
        key=_sort_key)
    sdf = spark_df.select(*sorted(spark_df.columns, key=str.lower))
    assert [c.lower() for c in sdf.columns] == cols
    spark_rows = sorted((tuple(r) for r in sdf.collect()), key=_sort_key)
    assert _rows_close(spark_rows, duck_rows), \
        f"{oracle_key} diverged: {spark_rows[:3]} vs {duck_rows[:3]}"
    if require_rows:
        assert duck_rows, f"{oracle_key}: vacuous draw"


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_ngram_diversity(spark, seed):
    from flood_data_spark.datapipe.text import with_ngram_diversity

    pdf = _random_corpus(seed)
    docs = spark.createDataFrame(pdf)
    out = (with_ngram_diversity(docs, n=3)
           .select("doc_id", "nd_n_ngrams", "nd_n_distinct",
                   "nd_diversity"))
    _compare(pdf, out, "q_ngram_diversity")


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_mixture_weights(spark, seed):
    from flood_data_spark.datapipe.curation import source_mixture_weights

    pdf = _random_corpus(seed)
    docs = spark.createDataFrame(pdf)
    _compare(pdf, source_mixture_weights(docs, alpha=0.3),
             "q_mixture_weights")


@pytest.mark.parametrize("seed", [11, 23])
def test_fuzz_bm25(spark, seed):
    from flood_data_spark.datapipe.text import bm25_topk

    pdf = _random_corpus(seed)
    docs = spark.createDataFrame(pdf)
    out = bm25_topk(docs, ["the", "flood", "data", "model", "river"], k=20)
    _compare(pdf, out, "q_bm25_topk")


@pytest.mark.parametrize("seed", [11, 23])
def test_fuzz_remove_spans(spark, seed):
    """Plant real cross-doc boilerplate so the removal path has work."""
    from flood_data_spark.datapipe.dedup import remove_repeated_spans

    pdf = _random_corpus(seed)
    boiler = "copyright footer all rights reserved contact us today now"
    pdf.loc[pdf.index % 3 == 0, "text"] = (
        pdf.loc[pdf.index % 3 == 0, "text"] + " " + boiler).str.strip()
    docs = spark.createDataFrame(pdf)
    out = remove_repeated_spans(docs, window=8)
    _compare(pdf, out, "q_remove_spans")


@pytest.mark.parametrize("seed", [11, 23])
def test_fuzz_cooccurrence(spark, seed):
    """Random corpora exercise the n < d+1 empty-array branch (blank and
    single-token docs) and repeated-token mass."""
    from flood_data_spark.datapipe.text import cooccurrence_pmi

    pdf = _random_corpus(seed)
    docs = spark.createDataFrame(pdf)
    out = cooccurrence_pmi(docs, window=2, min_count=5)
    _compare(pdf, out, "q_cooccurrence")


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_cms_cells(spark, seed):
    """Random corpora fuzz the CMS cell arithmetic (salted-md5 positions,
    integer sums) — exact cell-level agreement, collisions included."""
    from pyspark.sql import functions as F
    from flood_data_spark.datapipe.sketches import cms_build

    pdf = _random_corpus(seed)
    docs = spark.createDataFrame(pdf)
    toks = (docs.select(F.explode(
        F.split(F.trim(F.lower("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != ""))
    out = cms_build(toks, key_col="token", width=512, depth=3)
    _compare(pdf, out, "q_cms_stream")


def _random_parts(seed, n=300):
    rng = random.Random(seed)
    adjs = ["red", "blue", "green", "smal", "small", "large", "old",
            "cold", "hot", "tiny"]
    nouns = ["bolt", "gear", "ring", "rod", "anvil", "plate"]
    rows = []
    for i in range(n):
        name = f"{rng.choice(adjs)} {rng.choice(nouns)}"
        if rng.random() < 0.15:      # random whitespace/case noise the
            name = "  " + name.upper() + " "  # normalization must absorb
        rows.append((i, name))
    return pd.DataFrame(rows, columns=["p_partkey", "p_name"])


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_blocked_fuzzy_pairs(spark, seed):
    """Random near-name corpora (typo'd adjectives, case/whitespace
    noise) fuzz the shrink → block → band → bounded-DP chain."""
    from flood_data_spark.datapipe.fuzzy import blocked_fuzzy_pairs

    pdf = _random_parts(seed)
    parts = spark.createDataFrame(pdf)
    out = (blocked_fuzzy_pairs(parts, id_col="p_partkey",
                               text_col="p_name", max_dist=3)
           .select("name_a", "name_b", "id_a", "id_b", "n_a", "n_b",
                   "dist"))
    con = duckdb.connect()
    con.register("part", pdf)
    duck_df = con.execute(entry_mod.oracle_sql()["q_fuzzy_pairs"]).fetchdf()
    duck_df.columns = [c.lower() for c in duck_df.columns]
    cols = sorted(duck_df.columns)
    duck_rows = sorted(
        (tuple(None if pd.isna(v) else v for v in r)
         for r in duck_df[cols].itertuples(index=False, name=None)),
        key=_sort_key)
    sdf = out.select(*sorted(out.columns, key=str.lower))
    spark_rows = sorted((tuple(r) for r in sdf.collect()), key=_sort_key)
    assert _rows_close(spark_rows, duck_rows), \
        f"fuzzy diverged: {spark_rows[:3]} vs {duck_rows[:3]}"
    assert duck_rows, "vacuous draw: no near-name pairs generated"


def _random_events(seed, n=400, n_users=12):
    """Random event log with deliberate timestamp COLLISIONS (the ohlc
    open/close tiebreak case) and bursty gaps (the twap weighting case)."""
    rng = random.Random(seed)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(n):
        ts = base + pd.Timedelta(seconds=rng.randint(0, 3 * 86400))
        if rng.random() < 0.1 and rows:
            ts = rows[-1][2]          # planted tie
        rows.append((i, rng.randrange(n_users), ts,
                     round(rng.uniform(0, 300), 2),
                     rng.choice(["view", "click", "purchase", "error"])))
    return pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                       "value", "event_type"])


def _compare_events(pdf, spark_df, oracle_key):
    # one comparison implementation for every fuzz family — only the
    # registered view name differs (finding: keep sort/NaN handling in
    # ONE place)
    _compare(pdf, spark_df, oracle_key, table="events",
             require_rows=True)


@pytest.mark.parametrize("seed", [7, 31])
def test_fuzz_ohlc(spark, seed):
    from flood_data_spark.operators.timeseries import ohlc_bars

    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf).filter("user_id < 50")
    out = (ohlc_bars(ev, bar="hour", tiebreak_col="event_id")
           .select("user_id", "bar", "open", "high", "low", "close",
                   "n_obs"))
    _compare_events(pdf, out, "q_ohlc")


@pytest.mark.parametrize("seed", [7, 31])
def test_fuzz_twap(spark, seed):
    from flood_data_spark.operators.timeseries import time_weighted_avg

    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf).filter("user_id < 50")
    out = (time_weighted_avg(ev, tiebreak_col="event_id")
           .select("user_id", "twap", "span_us", "n_obs"))
    _compare_events(pdf, out, "q_twap")


@pytest.mark.parametrize("seed", [7, 31])
def test_fuzz_transitions(spark, seed):
    from flood_data_spark.operators.behavior import transition_matrix

    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf)
    out = (transition_matrix(ev, gap_seconds=3600,
                             order_tiebreak="event_id")
           .select("event_type", "next_event_type", "n", "p"))
    _compare_events(pdf, out, "q_transitions")


@pytest.mark.parametrize("seed", [7, 31])
def test_fuzz_funnel(spark, seed):
    from flood_data_spark.operators.behavior import funnel

    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf)
    out = (funnel(ev, ["view", "click", "purchase"])
           .select("user_id", "step_1_ts", "step_2_ts", "step_3_ts",
                   "depth"))
    _compare_events(pdf, out, "q_funnel")


@pytest.mark.parametrize("seed", [7, 31])
def test_fuzz_retention(spark, seed):
    from pyspark.sql import functions as F
    from flood_data_spark.operators.behavior import cohort_retention

    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf)
    # fetchdf surfaces DuckDB's DATE cohort as a pandas Timestamp —
    # compare at timestamp precision (midnight-equal); the gate's own
    # comparison runs on stringified DATE and needs the to_date cast
    out = (cohort_retention(ev, period="week")
           .select(F.col("cohort").cast("timestamp").alias("cohort"),
                   "offset", "n_active", "retention"))
    _compare_events(pdf, out, "q_retention")


@pytest.mark.parametrize("seed", [11, 23])
def test_fuzz_unigram_encode_long_words(spark, seed):
    """Regression for the r9 ADVICE finding: the oracle's 2048-mask
    enumeration only covers words <= 12 chars — a 13+-char word used to
    get a silently-incomplete optimum while viterbi_segment returned
    NULL pieces.  Plant long words and require full parity."""
    from pyspark.sql import functions as F

    from flood_data_spark.datapipe.unigram import (
        seed_vocabulary, viterbi_segment, word_table)

    pdf = _random_corpus(seed)
    longs = ("hydrometeorology supercalifragil thirteencharsx "
             "precipitation overtwelvechars")
    pdf.loc[pdf.index % 4 == 0, "text"] = (
        pdf.loc[pdf.index % 4 == 0, "text"] + " " + longs).str.strip()
    docs = spark.createDataFrame(pdf)
    words = word_table(docs)
    vocab = seed_vocabulary(words, max_piece_len=4, top_multichar=64)
    seg = viterbi_segment(words, vocab, max_word_len=12, max_piece_len=4)
    out = seg.select("word",
                     F.size("pieces").alias("n_pieces"),
                     "total_cost_micro",
                     F.concat_ws(" ", "pieces").alias("pieces_str"))
    _compare(pdf, out, "q_unigram_encode", require_rows=True)


@pytest.mark.parametrize("seed", [7, 31, 59])
def test_fuzz_soft_dedup(spark, seed):
    from flood_data_spark.datapipe.dedup import soft_dedup_weights

    pdf = _random_corpus(seed)
    out = soft_dedup_weights(spark.createDataFrame(pdf))
    _compare(pdf, out, "q_soft_dedup", require_rows=True)


@pytest.mark.parametrize("seed", [7, 31, 59])
def test_fuzz_dedup_keep_best(spark, seed):
    from pyspark.sql import functions as F

    from flood_data_spark.datapipe.dedup import dedup_keep_best

    pdf = _random_corpus(seed)              # dup texts share n_chars:
    docs = spark.createDataFrame(pdf)       # the min-id tiebreak fires
    out = dedup_keep_best(docs.withColumn(
        "qual", F.col("n_chars").cast("double")), "qual")
    _compare(pdf, out, "q_dedup_keep_best", require_rows=True)


@pytest.mark.parametrize("seed", [7, 31, 59])
def test_fuzz_fdc(spark, seed):
    from flood_data_spark.operators.extremes import flow_duration_curve
    from pyspark.sql import functions as F

    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf)
    daily = (ev.groupBy((F.col("user_id") % 5).alias("cell"),
                        F.datediff(F.to_date("ts"),
                                   F.lit("2024-01-01").cast("date"))
                        .alias("day"))
             .agg(F.max("value").alias("inflow")))
    out = flow_duration_curve(daily, "inflow", ["cell"])
    _compare_events(pdf, out, "q_fdc")


@pytest.mark.parametrize("seed", [7, 31, 59])
def test_fuzz_alert_triggers(spark, seed):
    from flood_data_spark.operators.threshold import alert_triggers
    from pyspark.sql import functions as F

    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf)
    probs = (ev.groupBy((F.col("user_id") % 6).alias("cell"),
                        F.dayofmonth("ts").alias("lead"))
             .agg(F.avg(F.when(F.col("value") > 80, 1)
                        .otherwise(0)).alias("p")))
    out = alert_triggers(probs, "p", "lead", ["cell"],
                         threshold=0.2, min_consecutive=3)
    # alert runs may legitimately be empty on some draws — no
    # require_rows; the three seeds were checked to produce runs on
    # at least one draw
    _compare(pdf, out, "q_alert_triggers", table="events")


@pytest.mark.parametrize("seed", [7, 31])
def test_fuzz_drought_classes(spark, seed):
    from flood_data_spark.operators.extremes import (drought_classes,
                                                     spi_empirical)
    from pyspark.sql import functions as F

    pdf = _random_events(seed)
    ev = spark.createDataFrame(pdf)
    daily = (ev.groupBy((F.col("user_id") % 6).alias("cell"),
                        F.dayofmonth("ts").alias("day"))
             .agg(F.max("value").alias("precip")))
    spi = spi_empirical(daily, "precip", ["cell"], "day")
    out = (drought_classes(spi, "spi")
           .select("cell", "day", "spi", "d_class", "in_drought"))
    _compare_events(pdf, out, "q_drought_classes")

"""Property-based tests (hypothesis) for the load-bearing invariants:
float-key discipline, grid snapping, serving bounds, and ladder totality.

Pure-Python properties run at full example counts; Spark-backed properties
batch all generated rows into ONE DataFrame per test so the property holds
over many examples at single-job cost.
"""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from flood_data_spark.config import DEFAULT_CONFIG
from flood_data_spark.operators.serving import grid_cell_bounds

coords = st.floats(min_value=-179.9, max_value=179.9,
                   allow_nan=False, allow_infinity=False)


@given(lat=coords, lon=coords)
@settings(max_examples=300, deadline=None)
def test_grid_cell_bounds_contains_point(lat, lon):
    lat_lo, lat_hi, lon_lo, lon_hi = grid_cell_bounds(lat, lon)
    g = DEFAULT_CONFIG.resolution
    # bounds are one grid step wide and contain the point (edges snap
    # east/north so the lower bound may equal the point)
    assert math.isclose(lat_hi - lat_lo, g, abs_tol=1e-9)
    assert math.isclose(lon_hi - lon_lo, g, abs_tol=1e-9)
    assert lat_lo <= lat + 1e-9 and lat <= lat_hi + 1e-9
    assert lon_lo <= lon + 1e-9 and lon <= lon_hi + 1e-9


@given(lat=coords, lon=coords)
@settings(max_examples=300, deadline=None)
def test_grid_cell_bounds_idempotent_on_cell_center(lat, lon):
    # the center of any cell maps back to the same cell
    lat_lo, lat_hi, lon_lo, lon_hi = grid_cell_bounds(lat, lon)
    c_lat, c_lon = (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2
    assert grid_cell_bounds(c_lat, c_lon) == (lat_lo, lat_hi, lon_lo, lon_hi)


def test_round_keys_recovers_jittered_joins(spark):
    """For any grid center and |noise| < 0.5e-3 (half an ulp at precision
    3), round_keys maps the jittered value back to the exact key — the
    §1.4 join-repair property, en masse."""
    from flood_data_spark.functions.keys import round_keys

    import numpy as np
    rng = np.random.default_rng(3)
    centers = np.round(0.025 + np.arange(500) * 0.05, 3)
    noise = rng.uniform(-4.9e-4, 4.9e-4, 500)
    df = spark.createDataFrame(
        [(float(c + e), float(c)) for c, e in zip(centers, noise)],
        "latitude double, expected double")
    df = df.withColumn("longitude", F.lit(0.025))
    bad = round_keys(df).filter(F.col("latitude") != F.col("expected"))
    assert bad.count() == 0


def test_snap_to_grid_is_idempotent_and_center_valued(spark):
    from flood_data_spark.functions.keys import snap_to_grid

    import numpy as np
    rng = np.random.default_rng(5)
    pts = rng.uniform(-80, 80, 400)
    df = spark.createDataFrame(
        [(float(p), float(p)) for p in pts], "latitude double, longitude double")
    once = snap_to_grid(df)
    twice = snap_to_grid(once)
    assert once.subtract(twice).count() == 0 and twice.subtract(once).count() == 0
    # every snapped coordinate is a cell center: (coord - res/2) / res ≈ int
    res = DEFAULT_CONFIG.resolution
    off = once.select(
        ((F.col("latitude") - res / 2) / res).alias("q")).collect()
    assert all(abs(r.q - round(r.q)) < 1e-6 for r in off)


def test_classification_ladders_are_total(spark):
    """Every (p_above_20y, p_above_5y, p_above_2y) triple gets exactly one
    intensity label; every (max_median, min_median, control) triple gets
    exactly one tendency label — including exact-threshold boundaries."""
    from flood_data_spark.operators.intensity import flood_intensity
    from flood_data_spark.operators.tendency import flood_tendency

    import itertools
    probs = [0.0, 0.29999, 0.3, 0.30001, 1.0]
    rows = [(i, a, b, c) for i, (a, b, c) in
            enumerate(itertools.product(probs, probs, probs))]
    df = spark.createDataFrame(
        rows, "k long, p_above_20y double, p_above_5y double, p_above_2y double")
    out = flood_intensity(df, key_cols=("k",))
    got = out.select("intensity").distinct().collect()
    assert {r.intensity for r in got} <= {"P", "R", "Y", "G"}
    assert out.filter(F.col("intensity").isNull()).count() == 0
    assert out.count() == len(rows)

    vals = [1.0, 99.0, 100.0, 101.0, 110.0, 111.0]
    trows = [(i, m, m, 100.0, m * 1.05, m * 0.95)
             for i, m in enumerate(vals)]
    tdf = spark.createDataFrame(
        trows, "k long, median_dis double, control_dis double, c double,"
               " max_dis double, min_dis double") \
        .withColumn("control_dis", F.col("c")).drop("c")
    tout = flood_tendency(tdf, key_cols=("k",))
    assert tout.filter(F.col("tendency").isNull()).count() == 0
    labels = {r.k: r.tendency for r in tout.collect()}
    assert labels[0] == "D"      # 1.0 << control*0.9
    assert labels[5] == "U"      # 111 > 110 = control*1.1
    assert labels[3] == "C"      # 101 in (90, 110]


def test_dedup_lines_invariants_on_generated_corpus(spark):
    """Batched invariants of cross-document line dedup over a generated
    corpus with heavy cross-doc repetition:
    (1) every surviving content line is globally unique (normalized);
    (2) output lines of a doc are a subsequence of its input lines;
    (3) the operator is idempotent: dedup(dedup(x)) == dedup(x)."""
    import random
    rng = random.Random(7)
    shared = [f"shared sentence number {k} repeated." for k in range(12)]
    rows = []
    for i in range(60):
        lines = [rng.choice(shared) for _ in range(rng.randrange(0, 4))]
        lines += [f"own line {i}-{j} text." for j in range(rng.randrange(0, 3))]
        if rng.random() < 0.3:
            lines.insert(min(1, len(lines)), "")
        rng.shuffle(lines)
        rows.append((i, "\n".join(lines)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    from flood_data_spark.datapipe.curation import dedup_lines
    once = dedup_lines(docs).cache()

    out = {r.doc_id: r.clean_text for r in once.collect()}
    orig = dict(rows)
    seen = {}
    for i in sorted(out):
        if out[i] == "":
            continue   # everything removed (or empty input) — nothing to check
        out_lines = out[i].split("\n")
        in_lines = orig[i].split("\n")
        # (2) subsequence: consume input lines in order
        it = iter(in_lines)
        assert all(any(l == x for x in it) for l in out_lines), \
            f"doc {i} output is not a subsequence of its input"
        for l in out_lines:
            n = l.strip().lower()
            if n == "":
                continue
            # (1) each normalized content line appears exactly once globally
            assert n not in seen, f"line {n!r} survived twice ({seen[n]}, {i})"
            seen[n] = i

    twice = {r.doc_id: r.clean_text for r in
             dedup_lines(once.select("doc_id",
                                     F.col("clean_text").alias("text")))
             .collect()}
    assert twice == out   # (3) idempotent


@given(st.lists(st.tuples(
    st.integers(min_value=-(2 ** 20) + 1, max_value=2 ** 20 - 1),
    st.integers(min_value=-(2 ** 20) + 1, max_value=2 ** 20 - 1)),
    min_size=1, max_size=200, unique=True))
@settings(max_examples=200, deadline=None)
def test_morton_key_python_properties(pairs):
    """Pure-Python mirror of the Column implementation: injective over the
    biased domain, and monotone along each axis within a fixed other-axis
    value (the property that makes range-partitioned z-keys tile 2-D
    space)."""
    from tests.test_zorder import _py_morton

    keys = [_py_morton(a, b) for a, b in pairs]
    assert len(set(keys)) == len(pairs)              # injective
    for (a, b) in pairs[:20]:
        assert _py_morton(a + 1, b) > _py_morton(a, b)   # lat-monotone
        assert _py_morton(a, b + 1) > _py_morton(a, b)   # lon-monotone


def test_quantize_roundtrip_bound_property(spark):
    """∀ vectors (mixed magnitudes across 12 decades, zero vectors
    included): |dequantize(quantize(v)) − v|∞ ≤ scale/2, codes ∈ [−127,
    127].  All examples batched into ONE DataFrame."""
    import numpy as np
    from flood_data_spark.datapipe.quantize import (
        dequantize_col, quantize_embeddings)

    rng = np.random.default_rng(17)
    examples = [list(rng.normal(0, 10.0 ** rng.integers(-6, 7), 4))
                for _ in range(150)]
    examples.append([0.0, 0.0, 0.0, 0.0])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(examples)],
        "vec_id long, embedding array<double>")
    q = quantize_embeddings(df)
    rows = q.select(
        F.aggregate(F.zip_with(dequantize_col(F.col("qvec"), F.col("qscale")),
                               F.col("embedding"),
                               lambda d, o: F.abs(d - o)),
                    F.lit(0.0), lambda a, e: F.greatest(a, e)).alias("err"),
        F.array_max("qvec").alias("hi"), F.array_min("qvec").alias("lo"),
        "qscale").collect()
    for r in rows:
        assert r.err <= r.qscale / 2 * (1 + 1e-12)
        assert -127 <= r.lo <= r.hi <= 127


def test_nearest_reindex_matches_bruteforce_on_random_grids(spark):
    """For random offset grids and random in-range targets, the bucketed
    3×3-candidate formulation equals the brute-force argmin (ties broken
    by (dist, slat, slon)) — the operator's core claim, en masse."""
    import numpy as np
    from flood_data_spark.operators.grid import nearest_reindex

    rng = np.random.default_rng(29)
    res = 0.05
    for trial in range(3):
        dlat, dlon = (float(x) for x in rng.uniform(0, res, 2))
        src = [(round(dlat + i * res, 9), round(dlon + j * res, 9),
                float(i * 100 + j))
               for i in range(8) for j in range(8)]
        lo_lat, hi_lat = src[0][0], src[-1][0]
        lo_lon, hi_lon = src[0][1], src[-1][1]
        tgt = [(float(rng.uniform(lo_lat, hi_lat)),
                float(rng.uniform(lo_lon, hi_lon))) for _ in range(25)]
        sdf = spark.createDataFrame(
            src, "latitude double, longitude double, v double")
        tdf = spark.createDataFrame(tgt, "latitude double, longitude double")
        got = {(r.latitude, r.longitude): (r.latitude_src, r.longitude_src)
               for r in nearest_reindex(tdf, sdf, resolution=res).collect()}
        assert len(got) == len(tgt)
        for tla, tlo in tgt:
            want = min(src, key=lambda s: ((tla - s[0]) ** 2
                                           + (tlo - s[1]) ** 2, s[0], s[1]))
            assert got[(tla, tlo)] == (want[0], want[1]), (trial, tla, tlo)


def test_pack_and_batch_ids_are_dense_and_monotone(spark):
    """pack_sequences / length_buckets invariants on random token counts:
    ids start at 0, never decrease along doc order, and step by at most 1
    (pack) / are exactly-batch_size-dense except the last (batch)."""
    import numpy as np
    from flood_data_spark.datapipe.curation import (
        length_buckets, pack_sequences)

    rng = np.random.default_rng(31)
    rows = [(i, "s", int(t)) for i, t in
            enumerate(rng.integers(0, 300, 200))]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    packed = sorted(pack_sequences(df, token_budget=256).collect(),
                    key=lambda r: r.doc_id)
    assert packed[0].pack_id == 0
    for a, b in zip(packed, packed[1:]):
        jump = b.pack_id - a.pack_id
        # monotone, and a jump is bounded by the tokens the PREVIOUS doc
        # contributed (an over-budget doc may skip pack ids, never invent
        # them backwards)
        assert 0 <= jump <= a.n_tokens // 256 + 1

    bucketed = length_buckets(df, batch_size=4).collect()
    from collections import Counter
    per_batch = Counter((r.bucket, r.batch_id) for r in bucketed)
    for (bucket, batch_id), n in per_batch.items():
        max_batch = max(b for (bk, b) in per_batch if bk == bucket)
        assert n == 4 or batch_id == max_batch


def test_repeated_spans_bounds(spark):
    """Structural bounds on random corpora: 0 <= n_dup_spans <= spans(doc),
    n_dup_tokens <= n_tokens, dup_fraction in [0, 1]."""
    import numpy as np
    from flood_data_spark.datapipe.dedup import repeated_span_stats

    rng = np.random.default_rng(37)
    vocab = ["w%d" % k for k in range(30)]
    docs = [(i, " ".join(rng.choice(vocab, rng.integers(0, 40))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for r in repeated_span_stats(df, window=5).collect():
        n_spans = max(r.n_tokens - 5 + 1, 0)
        assert 0 <= r.n_dup_spans <= n_spans
        assert 0 <= r.n_dup_tokens <= r.n_tokens
        assert 0.0 <= r.dup_fraction <= 1.0


def test_round7_third_batch_invariants_on_generated_corpus(spark):
    """One generated corpus, one Spark job per operator, all invariants:
    BM25 scores positive and k-bounded; Gopher ratios in [0,1]; n-gram
    diversity in (0,1]; DSIR weights finite with tokens conserved;
    mixture weights a probability vector; span removal never grows a
    document and its coverage equals the stats operator's count."""
    import random

    from flood_data_spark.datapipe.curation import (
        dsir_weights, source_mixture_weights)
    from flood_data_spark.datapipe.dedup import (
        remove_repeated_spans, repeated_span_stats)
    from flood_data_spark.datapipe.text import (
        bm25_topk, with_gopher_rules, with_ngram_diversity)

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)] + ["the", "of", "and"]
    boiler = "shared boiler plate sentence repeated verbatim everywhere"
    rows = []
    for i in range(80):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
        if i % 4 == 0:
            words += boiler.split()
        rows.append((i, " ".join(words), f"s{i % 3}"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    top = bm25_topk(df, ["the", "w1", "w2"], k=15).collect()
    assert len(top) <= 15
    assert all(r.bm25 > 0 and r.n_hit_terms >= 1 for r in top)

    for r in with_gopher_rules(df).collect():
        for c in ("g_bullet_ratio", "g_ellipsis_ratio",
                  "g_alpha_word_ratio"):
            assert 0.0 <= r[c] <= 1.0, (r.doc_id, c)

    for r in with_ngram_diversity(df, n=3).collect():
        assert r.nd_n_distinct <= r.nd_n_ngrams
        if r.nd_diversity is not None:
            assert 0.0 < r.nd_diversity <= 1.0

    w = dsir_weights(df, df.filter("source = 's0'")).collect()
    assert {r.doc_id for r in w} == set(range(80))        # all visible
    for r in w:
        if r.n_tokens > 0:
            assert r.log_weight is not None

    mix = source_mixture_weights(df).collect()
    assert abs(sum(r.weight for r in mix) - 1.0) < 1e-5
    assert all(r.weight > 0 for r in mix)

    stats = {r.doc_id: r for r in repeated_span_stats(df, window=4).collect()}
    rem = {r.doc_id: r for r in
           remove_repeated_spans(df, window=4).collect()}
    for i in range(80):
        assert rem[i].n_tokens_kept <= rem[i].n_tokens
        assert (rem[i].n_tokens - rem[i].n_tokens_kept
                == stats[i].n_dup_tokens), i
    # keep='first' removes a subset of what keep='none' removes
    rem_f = {r.doc_id: r for r in
             remove_repeated_spans(df, window=4, keep="first").collect()}
    assert all(rem_f[i].n_tokens_kept >= rem[i].n_tokens_kept
               for i in range(80))

"""Hashed-feature logistic-regression trainer (datapipe/classifier.py)."""

import pytest
from pyspark.sql import functions as F

from flood_data_spark.datapipe.classifier import (
    classifier_score, feature_bucket, hashed_features,
    train_quality_classifier, with_classifier_score)


def _separable_corpus(spark, n=200):
    pos = ["science", "history", "article", "reference", "citation"]
    neg = ["buy", "click", "free", "winner", "casino"]
    rows = []
    for i in range(n):
        vocab = pos if i % 2 == 0 else neg
        # deterministic pseudo-random word choice (index arithmetic, no RNG)
        text = " ".join(vocab[(i * 7 + j * 3) % 5] for j in range(20))
        rows.append((i, text, 1 if i % 2 == 0 else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_recovers_separable_labels(spark):
    """Blob recovery: on a linearly separable corpus the trained scorer
    must rank every positive above every negative."""
    df = _separable_corpus(spark)
    w, b = train_quality_classifier(df, n_features=32, n_iters=30, lr=2.0)
    scored = with_classifier_score(df, w, b)
    agg = {r.label: (r.lo, r.hi) for r in
           scored.groupBy("label").agg(F.min("clf_score").alias("lo"),
                                       F.max("clf_score").alias("hi"))
           .collect()}
    assert agg[1][0] > agg[0][1]          # min(pos) > max(neg)


def test_training_deterministic(spark):
    df = _separable_corpus(spark, n=60)
    a = train_quality_classifier(df, n_features=16, n_iters=3)
    b = train_quality_classifier(df, n_features=16, n_iters=3)
    assert a == b


def test_zero_token_docs_excluded_from_training_but_scorable(spark):
    df = spark.createDataFrame(
        [(0, "good text here", 1), (1, "   ", 0), (2, None, 0),
         (3, "bad stuff", 0)],
        "doc_id long, text string, label int")
    w, b = train_quality_classifier(df, n_features=8, n_iters=2)
    out = {r.doc_id: r.clf_score for r in
           with_classifier_score(df, w, b).collect()}
    assert len(out) == 4                  # blank/NULL docs still score
    # zero-token docs score exactly sigmoid(bias)
    import math
    sig_b = round(1.0 / (1.0 + math.exp(-b)), 6)
    assert out[1] == pytest.approx(sig_b) and out[2] == pytest.approx(sig_b)


def test_feature_values_length_normalized(spark):
    df = spark.createDataFrame([(0, "a a b b", 1)],
                               "doc_id long, text string, label int")
    rows = hashed_features(df, n_features=64, label_col="label").collect()
    assert sum(r.x for r in rows) == pytest.approx(1.0)
    assert all(r.cnt == 2 for r in rows)


def test_bucket_range_and_portability(spark):
    df = spark.createDataFrame([(w,) for w in ["alpha", "beta", "gamma"]],
                               "term string")
    got = {r.term: r.b for r in
           df.select("term", feature_bucket(F.col("term"), 32).alias("b"))
           .collect()}
    import hashlib
    for t, bkt in got.items():
        exp = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 32
        assert bkt == exp and 0 <= bkt < 32


def test_param_guards(spark):
    df = _separable_corpus(spark, n=4)
    with pytest.raises(ValueError, match="n_iters"):
        train_quality_classifier(df, n_iters=0)
    with pytest.raises(ValueError, match="lr"):
        train_quality_classifier(df, lr=0.0)
    empty = spark.createDataFrame([(0, "  ", 1)],
                                  "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="no trainable"):
        train_quality_classifier(empty)


def test_scoring_plan_is_shuffle_free(spark):
    """The serving path must stream: literal-array lookup per token, no
    Exchange in the plan (the 100 TB scoring contract)."""
    df = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    out = df.withColumn("s", classifier_score(F.col("text"),
                                              [0.1] * 16, 0.0))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_platt_calibration_shifts_toward_base_rate(spark):
    """On an uninformative score, calibration must move the intercept
    toward the base rate (here 25% positives → b goes negative)."""
    from flood_data_spark.datapipe.classifier import (
        calibrated_probability, platt_calibrate)

    rows = [(i, 0.5, 1 if i % 4 == 0 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score double, label int")
    a, b = platt_calibrate(df, "score", "label", n_iters=10, lr=2.0)
    assert b < 0.0
    p = df.select(calibrated_probability(F.col("score"), a, b)
                  .alias("p")).first().p
    assert p < 0.5                      # pulled toward the 25% base rate


def test_platt_calibration_deterministic_and_guarded(spark):
    from flood_data_spark.datapipe.classifier import platt_calibrate

    df = spark.createDataFrame([(i, float(i), i % 2) for i in range(20)],
                               "doc_id long, score double, label int")
    assert platt_calibrate(df, "score", "label") == \
        platt_calibrate(df, "score", "label")
    with pytest.raises(ValueError, match="n_iters"):
        platt_calibrate(df, "score", "label", n_iters=0)
    with pytest.raises(ValueError, match="empty"):
        platt_calibrate(df.filter("doc_id < 0"), "score", "label")


def test_null_labels_rejected_not_diluted(spark):
    """NULL labels would count in n but vanish from gradient sums —
    the trainer must refuse instead of silently mistraining."""
    df = spark.createDataFrame(
        [(0, "good text", 1), (1, "other text", None)],
        "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="NULL 'label'"):
        train_quality_classifier(df, n_features=8, n_iters=1)
    from flood_data_spark.datapipe.classifier import platt_calibrate
    df2 = spark.createDataFrame([(0, 0.5, 1), (1, None, 0)],
                                "doc_id long, score double, label int")
    with pytest.raises(ValueError, match="NULL"):
        platt_calibrate(df2, "score", "label")


# ------------------------------------------------------------ evaluation

def _eval_row(spark, rows, **kw):
    from flood_data_spark.datapipe.classifier import evaluate_binary
    df = spark.createDataFrame(rows, "score double, label int")
    return evaluate_binary(df, "score", "label", **kw).first()


def test_evaluate_binary_hand_computed(spark):
    """Six untied rows, every metric checked against hand arithmetic."""
    rows = [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.4, 0), (0.2, 0)]
    r = _eval_row(spark, rows)
    assert (r.n, r.n_null, r.n_pos, r.n_neg) == (6, 0, 3, 3)
    assert r.auc == round(8 / 9, 6)          # 8 of 9 pos>neg pairs
    assert r.brier == 0.15                   # 0.9/6
    assert r.ece == round(2.0 / 6, 6)        # one row per bin
    assert r.accuracy == round(5 / 6, 6)     # tp=3 tn=2 at 0.5
    assert r.precision == 0.75
    assert r.recall == 1.0
    assert r.f1 == round(2 * 0.75 / 1.75, 6)


def test_evaluate_binary_tie_averaged_auc(spark):
    """Tied scores take average-rank credit: 0.5 per tied (pos, neg)
    pair — the Mann-Whitney convention."""
    rows = [(0.5, 1), (0.5, 0), (0.3, 1), (0.3, 0), (0.3, 0), (0.8, 1)]
    r = _eval_row(spark, rows)
    assert r.auc == round(6.5 / 9, 6)


def test_evaluate_binary_nulls_and_degenerate(spark):
    rows = [(0.9, 1), (None, 1), (0.4, None), (0.6, 1)]
    r = _eval_row(spark, rows)
    assert (r.n, r.n_null) == (2, 2)
    assert r.auc is None                     # no negatives
    assert r.recall == 1.0
    with pytest.raises(ValueError, match="bins"):
        _eval_row(spark, rows, bins=0)
    with pytest.raises(ValueError, match="score_decimals"):
        _eval_row(spark, rows, score_decimals=0)


def test_evaluate_binary_nan_counts_as_invalid(spark):
    """NaN is not NULL in Spark — it must land in n_null, not poison
    brier/ece with NaN sums."""
    rows = [(0.9, 1), (float("nan"), 1), (0.2, 0)]
    r = _eval_row(spark, rows)
    assert (r.n, r.n_null) == (2, 1)
    assert r.auc == 1.0
    assert r.brier is not None and r.brier == r.brier   # not NaN
    assert r.ece is not None and r.ece == r.ece


def test_evaluate_binary_empty_input_zero_counts(spark):
    from flood_data_spark.datapipe.classifier import evaluate_binary

    df = spark.createDataFrame([], "clf_score double, label int")
    r = evaluate_binary(df).first()
    assert (r.n, r.n_null, r.n_pos, r.n_neg) == (0, 0, 0, 0)
    assert r.auc is None and r.brier is None and r.accuracy is None


def test_evaluate_binary_out_of_range_scores_clamp(spark):
    """Uncalibrated margins: rank/threshold metrics stay exact, ECE
    bins clamp at the edges instead of fabricating negative bins."""
    rows = [(2.5, 1), (1.2, 1), (-0.4, 0), (-3.0, 0), (0.6, 1), (0.3, 0)]
    r = _eval_row(spark, rows)
    assert r.auc == 1.0
    assert r.accuracy == 1.0                 # threshold 0.5 separates
    assert r.ece is not None and r.ece == r.ece


def test_evaluate_binary_auc_matches_brute_force(spark):
    """Differential check: rank-sum AUC == brute-force pair counting on
    a deterministic pseudo-random score/label set with planted ties."""
    import hashlib

    rows = []
    for i in range(300):
        h = int(hashlib.md5(f"auc:{i}".encode()).hexdigest()[:8], 16)
        s = round((h % 50) / 50.0, 6)        # heavy ties: 50 levels
        y = 1 if (h >> 8) % 3 == 0 else 0
        rows.append((s, y))
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    u = sum(1.0 if p > q else 0.5 if p == q else 0.0
            for p in pos for q in neg)
    expected = round(u / (len(pos) * len(neg)), 6)
    r = _eval_row(spark, rows)
    assert r.auc == expected


def test_evaluate_binary_by_matches_per_group_global(spark):
    """Differential: each group's row equals evaluate_binary run on that
    group's slice alone."""
    import hashlib

    from flood_data_spark.datapipe.classifier import (evaluate_binary,
                                                      evaluate_binary_by)

    rows = []
    for i in range(240):
        h = int(hashlib.md5(f"g:{i}".encode()).hexdigest()[:8], 16)
        rows.append(("src" + str(h % 3),
                     round((h % 40) / 40.0, 6),
                     1 if (h >> 8) % 3 == 0 else 0))
    rows.append(("src_bad", None, 1))       # all-invalid group
    df = spark.createDataFrame(rows, "src string, score double, label int")
    grouped = {r.src: r for r in evaluate_binary_by(
        df, "src", score_col="score").collect()}
    assert set(grouped) == {"src0", "src1", "src2", "src_bad"}
    for src in ("src0", "src1", "src2"):
        solo = evaluate_binary(df.filter(F.col("src") == src),
                               score_col="score").first()
        got = grouped[src]
        assert tuple(got)[1:] == tuple(solo), src
    bad = grouped["src_bad"]
    assert (bad.n, bad.n_null, bad.n_pos) == (0, 1, 0)
    assert bad.auc is None and bad.brier is None
    with pytest.raises(ValueError, match="non-empty"):
        evaluate_binary_by(df, [], score_col="score")


def test_evaluate_binary_by_null_group_key(spark):
    """A NULL group-key value is a real group: its metrics must come
    from its valid rows, not be stranded by non-null-safe joins."""
    from flood_data_spark.datapipe.classifier import evaluate_binary_by

    df = spark.createDataFrame(
        [(None, 0.8, 1), (None, 0.3, 0), (None, None, 1),
         ("a", 0.9, 1), ("a", 0.1, 0)],
        "src string, score double, label int")
    rows = {r.src: r for r in evaluate_binary_by(
        df, "src", score_col="score").collect()}
    nul = rows[None]
    assert (nul.n, nul.n_null, nul.n_pos, nul.n_neg) == (2, 1, 1, 1)
    assert nul.auc == 1.0 and nul.brier is not None


def test_roc_points_hand_computed(spark):
    from flood_data_spark.datapipe.classifier import roc_points

    rows = [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.4, 0), (0.2, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    pts = {r.score: (r.tpr, r.fpr)
           for r in roc_points(df, "score", "label").collect()}
    third = round(1 / 3, 6)
    assert pts[0.9] == (third, 0.0)
    assert pts[0.6] == (1.0, third)
    assert pts[0.2] == (1.0, 1.0)
    # degenerate: single-class input yields an empty curve
    one_class = df.filter("label = 1")
    assert roc_points(one_class, "score", "label").count() == 0

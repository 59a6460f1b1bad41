"""Distributed quality-classifier training (fastText/CCNet-style).

The standard LLM-curation component this implements: a "looks like
Wikipedia" (here: "looks like the target class") scorer — logistic
regression over HASHED bag-of-words features, trained by batch gradient
descent where every step is a pure Spark aggregate.  The CCNet pipeline
trains exactly this shape (a linear fastText model) to rank Common Crawl
against a trusted corpus; DSIR (`curation.dsir_weights`) is the
importance-sampling alternative — together they are the two standard
data-selection methods.

Scale posture (the clustering.py contract, applied to GD):
- The feature relation is (id, feat, x) — one row per (document, hashed
  bucket); text itself never shuffles.  Feature ids are md5-bucketed into
  `n_features` slots, so the gradient aggregate is VOCABULARY-BOUNDED:
  the per-iteration shuffle carries `n_features`+1 keys, never the corpus.
- Weights ride into each iteration as a broadcast array LITERAL
  (n_features doubles) — no join against a weights table, the update is
  whole-stage-codegen arithmetic.
- The driver sees exactly n_features+1 gradient cells per iteration
  (bounded collect, the k-means k*d contract) — the corpus never does.
- SCORING is a single row-local Column expression (`classifier_score`):
  sigmoid(b + mean_t w[bucket(t)]) — zero shuffles, streams through a
  100 TB scan at parquet speed once the trained weights are literals.

Engine-portable determinism (the value-oracle contract):
- bucket(token) = int(md5(token)[:4 hex]) % n_features — the same
  md5-prefix trick as curation.hash_sample, bit-identical in any engine.
- Weights are rounded to 6 decimals after EVERY update, which
  re-synchronizes Spark and the SQL oracle each iteration: float noise
  from engine-specific summation order (~1e-13) cannot accumulate across
  the unrolled-GD oracle (same discipline as q_pagerank's 5 unrolled
  iterations).

No reference analog (the reference has no text/ML operators); part of the
beyond-reference datapipe inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flood_data_spark.datapipe.text import _words


def feature_bucket(term_col, n_features: int) -> Column:
    """md5-prefix hash bucket in [0, n_features): engine-portable (any
    SQL engine with md5 computes the identical bucket), uniform enough
    for feature hashing (16 bits of md5 >> n_features)."""
    return (F.conv(F.substring(F.md5(term_col), 1, 4), 16, 10)
            .cast("long") % n_features).cast("int")


def hashed_features(df: DataFrame, n_features: int = 32,
                    id_col: str = "doc_id", text_col: str = "text",
                    label_col: str | None = None) -> DataFrame:
    """(id[, y], feat, cnt, x): hashed bag-of-words with length-normalized
    values x = count(bucket)/len(doc).  Zero-token documents contribute no
    rows (nothing to featurize — they are excluded from training).

    One explode + one (id, feat)-keyed aggregate; the window computing the
    document length runs inside the same id partitioning the groupBy
    already established (no extra exchange)."""
    cols = [F.col(id_col).alias("id"),
            F.explode(_words(F.col(text_col))).alias("term")]
    keys = ["id"]
    if label_col is not None:
        cols.insert(1, F.col(label_col).cast("double").alias("y"))
        keys.append("y")
    toks = df.select(*cols)
    tf = (toks.withColumn("feat", feature_bucket(F.col("term"), n_features))
          .drop("term")
          .groupBy(*keys, "feat")
          .agg(F.count("*").alias("cnt")))
    dl = F.sum("cnt").over(Window.partitionBy("id"))
    return tf.withColumn("x", F.col("cnt") / dl)


def train_quality_classifier(df: DataFrame, label_col: str = "label",
                             n_features: int = 32, n_iters: int = 3,
                             lr: float = 0.5,
                             id_col: str = "doc_id",
                             text_col: str = "text"
                             ) -> tuple[list[float], float]:
    """Batch-GD logistic regression over hashed features; returns
    (weights — n_features floats, bias).

    Per iteration, ONE distributed job over the cached feature relation:
      z_i  = b + Σ_j w[feat]·x          (window sum per document)
      p_i  = σ(z_i),  err_i = p_i - y_i (row-local)
      g_j  = Σ_i err_i·x_ij             (groupBy(feat): n_features keys)
      g_b  = Σ_i err_i                  (as Σ_rows err/rows-per-doc —
                                         rides the same aggregate)
      w_j ← round(w_j - lr·g_j/n, 6)    (driver, n_features+1 cells)

    The per-update rounding is the oracle-resync contract (module
    docstring).  `lr` is applied to the MEAN gradient, so it is batch-size
    invariant.
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    feats = hashed_features(df, n_features, id_col, text_col,
                            label_col=label_col).persist()
    try:
        counts = feats.agg(
            F.countDistinct("id").alias("n"),
            F.countDistinct(F.when(F.col("y").isNull(), F.col("id")))
            .alias("n_null")).collect()[0]
        n, n_null = counts.n, counts.n_null
        if n == 0:
            raise ValueError("train_quality_classifier: no trainable "
                             "documents (all empty?)")
        if n_null:
            # NULL labels would count in n but vanish from every gradient
            # sum — silently diluting the learning rate (e.g. a label
            # built as (col('lang') == 'en').cast('int') is NULL, not 0,
            # for NULL lang).  Refuse instead of mistraining.
            raise ValueError(
                f"train_quality_classifier: {n_null} documents have NULL "
                f"{label_col!r}; coalesce labels to 0/1 before training")
        w = [0.0] * n_features
        b = 0.0
        id_win = Window.partitionBy("id")
        for _ in range(n_iters):
            warr = F.array(*[F.lit(x) for x in w])
            z = (F.lit(b)
                 + F.sum(warr[F.col("feat")] * F.col("x")).over(id_win))
            err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
            rows_per_doc = F.count("*").over(id_win)
            cells = (feats
                     .withColumn("_err", err)
                     .withColumn("_nb", F.col("_err") / rows_per_doc)
                     .groupBy("feat")
                     .agg(F.sum(F.col("_err") * F.col("x")).alias("g"),
                          F.sum("_nb").alias("gb"))
                     .collect())
            gb = sum(r.gb for r in cells)
            for r in cells:
                w[r.feat] = round(w[r.feat] - lr * r.g / n, 6)
            b = round(b - lr * gb / n, 6)
        return w, b
    finally:
        feats.unpersist()


def platt_calibrate(df: DataFrame, score_col: str, label_col: str,
                    n_iters: int = 3, lr: float = 1.0,
                    init: tuple[float, float] = (1.0, 0.0)
                    ) -> tuple[float, float]:
    """Platt scaling (Platt 1999): fit p = σ(a·score + b) by batch GD so a
    raw ranking score becomes a calibrated probability — the standard
    post-hoc calibration for the quality classifier (its hashed-feature
    scores rank well but aren't probabilities a mixture policy can
    threshold on).

    Each iteration is ONE two-cell aggregate over the (score, label)
    projection — the train_quality_classifier contract shrunk to a single
    feature: gradient_a = Σ err·s / n, gradient_b = Σ err / n, params
    rounded to 6 decimals per update (the oracle-resync discipline).
    Returns (a, b).
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0, got {lr}")
    cal = df.select(F.col(score_col).cast("double").alias("s"),
                    F.col(label_col).cast("double").alias("y")).persist()
    try:
        counts = cal.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("y").isNull() | F.col("s").isNull(),
                           1)).alias("n_null")).collect()[0]
        n, n_null = counts.n, counts.n_null
        if n == 0:
            raise ValueError("platt_calibrate: empty calibration set")
        if n_null:
            # same dilution hazard as train_quality_classifier: NULL
            # score/label rows count in n but drop from the gradients
            raise ValueError(
                f"platt_calibrate: {n_null} rows have NULL "
                f"{score_col!r}/{label_col!r}; coalesce before calibrating")
        a, b = float(init[0]), float(init[1])
        for _ in range(n_iters):
            err = (F.lit(1.0)
                   / (F.lit(1.0) + F.exp(-(F.lit(a) * F.col("s")
                                           + F.lit(b))))) - F.col("y")
            row = cal.agg(F.sum(err * F.col("s")).alias("ga"),
                          F.sum(err).alias("gb")).collect()[0]
            a = round(a - lr * row.ga / n, 6)
            b = round(b - lr * row.gb / n, 6)
        return a, b
    finally:
        cal.unpersist()


def calibrated_probability(score_col, a: float, b: float) -> Column:
    """σ(a·score + b) — the calibrated probability as a row-local
    expression (no shuffle; composes with `classifier_score`)."""
    return F.lit(1.0) / (F.lit(1.0)
                         + F.exp(-(F.lit(a) * score_col + F.lit(b))))


def classifier_score(text_col, weights: list[float], bias: float,
                     ) -> Column:
    """σ(bias + mean over tokens of w[bucket(token)]) — the trained
    scorer as ONE row-local expression: no shuffle, no join, no UDF.
    Zero-token documents score σ(bias).

    Σ_j w_j·(cnt_j/dl) == Σ_tokens w[bucket(token)]/dl, so this is
    exactly the training-time z, computed without the feature relation.
    """
    n_features = len(weights)
    warr = F.array(*[F.lit(x) for x in weights])
    words = _words(text_col)
    dl = F.size(words)
    tot = F.aggregate(
        F.transform(words, lambda t: warr[feature_bucket(t, n_features)]),
        F.lit(0.0), lambda acc, x: acc + x)
    z = (F.lit(bias)
         + F.when(dl > 0, tot / dl).otherwise(F.lit(0.0)))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def with_classifier_score(df: DataFrame, weights: list[float], bias: float,
                          text_col: str = "text",
                          out_col: str = "clf_score",
                          round_digits: int = 6) -> DataFrame:
    """Attach the (rounded) classifier probability to each row."""
    return df.withColumn(
        out_col,
        F.round(classifier_score(F.col(text_col), weights, bias),
                round_digits))


# ------------------------------------------------------------ evaluation

def _score_groups(df: DataFrame, score_col: str, label_col: str,
                  score_decimals: int,
                  group_cols: tuple = ()) -> DataFrame:
    """(s, n_g, pos_g): the corpus collapsed to one row per DISTINCT
    quantized score — the single corpus-sized pass every metric below
    derives from.  Scores are rounded to `score_decimals`, so the group
    relation is CARDINALITY-BOUNDED (<= 10^d + 1 rows for probabilities
    in [0, 1]) no matter the corpus size.  Rows with a NULL or NaN
    score, or a NULL label, collapse into ONE sentinel group (s = NULL,
    pos_g = 0) so the invalid count rides the same single pass;
    consumers filter `s IS NOT NULL` before computing metrics.  (NaN is
    NOT null in Spark — without the explicit isnan guard a single 0/0
    score upstream would form a real NaN group and poison every
    downstream sum.)

    The result is localCheckpoint-ed: every metric family consumes it
    at least twice, and without the checkpoint Catalyst re-plans (and
    re-executes) the corpus-sized aggregate per consumer — the LM-table
    lesson from docs/PLANS.md."""
    score = F.col(score_col).cast("double")
    valid = (score.isNotNull() & ~F.isnan(score)
             & F.col(label_col).isNotNull())
    return (df.select(
        *group_cols,
        F.when(valid, F.round(score, score_decimals)).alias("s"),
        F.when(valid, F.col(label_col).cast("int"))
        .otherwise(F.lit(0)).alias("y"))
        .groupBy(*group_cols, "s")
        .agg(F.count(F.lit(1)).alias("n_g"),
             F.sum("y").alias("pos_g"))
        .localCheckpoint(eager=False))


def evaluate_binary(df: DataFrame, score_col: str = "clf_score",
                    label_col: str = "label", threshold: float = 0.5,
                    bins: int = 10,
                    score_decimals: int = 6) -> DataFrame:
    """One-row evaluation suite for a binary scorer: n / n_null / n_pos /
    n_neg counts, tie-averaged rank-sum AUC (Mann-Whitney), Brier score,
    expected calibration error over `bins` equal-width bins, and
    accuracy / precision / recall / F1 at `threshold`.  The natural
    companion to `train_quality_classifier` + `platt_calibrate`: train,
    calibrate, then gate the mixture policy on these numbers.

    Scale posture: ONE corpus-sized aggregate (groupBy the quantized
    score — <= 10^score_decimals + 1 keys, map-side partials do the
    heavy lifting) and everything downstream runs on that bounded
    relation.  The rank window is a global `Window.orderBy`, but its
    input is the score-group relation, never the corpus — same
    boundedness argument as `stats.equidepth_bounds` (and unlike the
    curation global-window fallbacks, the bound is structural, not
    caller-supplied).

    Engine-portable exactness — EVERY metric is a ratio of exact
    integers: ranks are INTEGER doubled rank-sums (2*avg_rank of a tied
    group = 2*cum_before + n_g + 1) so AUC = (ranksum2 -
    n_pos*(n_pos+1)) / (2*n_pos*n_neg); Brier expands (s-y)^2 over y in
    {0,1} as n_g*si^2 - 2*si*pos_g*scale + pos_g*scale^2 in integer
    micro²-units (decimal(38,0) — exact in any summation order, where
    the decimal-valued sum drifted one ulp between engines and flipped
    a round-6 half-point); ECE bin masses are micro-unit integers with
    a pure-integer bin index.  AUC is NULL when either
    class is absent; precision/recall/F1 are NULL on empty denominators;
    an empty (or all-invalid) input yields zero counts and NULL metrics.
    Domain: AUC/accuracy/precision/recall/F1 accept any real-valued
    score; Brier and ECE are PROBABILITY metrics — on scores outside
    [0, 1] they remain defined (bins clamp at the edges) but should be
    read only after calibration (`platt_calibrate`).  NULL and NaN
    scores and NULL labels are excluded and counted in n_null.
    """
    return _evaluate(df, score_col, label_col, threshold, bins,
                     score_decimals, ())


def evaluate_binary_by(df: DataFrame, group_cols,
                       score_col: str = "clf_score",
                       label_col: str = "label", threshold: float = 0.5,
                       bins: int = 10,
                       score_decimals: int = 6) -> DataFrame:
    """`evaluate_binary` stratified by `group_cols` — one metric row per
    group (per source, per language, per split): the slice-level QA
    that catches a scorer which aggregates well but fails one domain.
    Same machinery, same exactness contract; the rank window partitions
    by the group columns (so unlike the ungrouped form there is no
    single-partition window at all), every aggregate carries the group
    key, and the output includes groups whose rows are ALL invalid
    (zero counts, NULL metrics) — they surface data problems, the
    point of the stratification."""
    group_cols = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty; "
                         "use evaluate_binary for the global form")
    return _evaluate(df, score_col, label_col, threshold, bins,
                     score_decimals, tuple(group_cols))


def _evaluate(df: DataFrame, score_col: str, label_col: str,
              threshold: float, bins: int, score_decimals: int,
              group_cols: tuple) -> DataFrame:
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if score_decimals < 1 or score_decimals > 9:
        raise ValueError(
            f"score_decimals must be in [1, 9], got {score_decimals}")
    G = list(group_cols)
    scale = 10 ** score_decimals
    groups = _score_groups(df, score_col, label_col, score_decimals,
                           tuple(G))
    nulls = groups.groupBy(*G).agg(
        F.coalesce(F.sum(F.when(F.col("s").isNull(), F.col("n_g"))),
                   F.lit(0)).alias("n_null"))
    # si: the decimal-scaled score recovered as an exact integer — every
    # summed metric below is integer arithmetic on it, so no metric
    # depends on float summation order
    g = (groups.filter(F.col("s").isNotNull())
         .withColumn("si", F.round(F.col("s") * scale).cast("long")))
    # doubled tie-averaged rank-sum of the positives, as exact integers
    w = (Window.partitionBy(*G).orderBy("s")
         .rowsBetween(Window.unboundedPreceding, -1))
    ranked = g.withColumn(
        "cum_before", F.coalesce(F.sum("n_g").over(w), F.lit(0)))
    # integer bin index: si = s * 10^d recovered exactly, then
    # (si * bins) div 10^d clamped into [0, bins-1] BOTH ways — scores
    # are expected in [0, 1] (Brier/ECE read as probability metrics;
    # rank/threshold metrics are domain-free), but an uncalibrated
    # margin must not fabricate phantom negative bins.  The lower clamp
    # also absorbs the one engine divergence on negatives (Spark `div`
    # truncates toward zero, ANSI `//` floors — both land <= 0)
    per_bin = (g.withColumn(
            "bin", F.greatest(
                F.least(F.expr(f"si * {bins} div {scale}"),
                        F.lit(bins - 1)), F.lit(0)))
        .groupBy(*G, "bin")
        .agg(F.sum("n_g").alias("n_b"),
             # bin score mass in integer MICRO-UNITS: si is the exact
             # decimal-scaled score, so this sum is an exact integer in
             # any summation order — the decimal form (sum of n_g * s)
             # drifted one ulp between engines and flipped a round-6
             # half-point (measured: ece 0.033428 vs 0.033429, sf0.1
             # per-source gate)
             F.sum(F.col("n_g") * F.col("si")).alias("ssi"),
             F.sum("pos_g").alias("pos_b")))
    ece = per_bin.groupBy(*G).agg(
        (F.sum(F.abs(F.col("ssi") - F.col("pos_b") * scale))
         / (F.sum("n_b") * F.lit(float(scale)))).alias("_ece_raw"))
    # count coalesces: on an empty/all-invalid input the sums are NULL —
    # return 0 counts (with metrics NULL), not a row of NULL counts
    core = ranked.groupBy(*G).agg(
        F.coalesce(F.sum("n_g"), F.lit(0)).alias("n"),
        F.coalesce(F.sum("pos_g"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum(F.col("n_g") - F.col("pos_g")),
                   F.lit(0)).alias("n_neg"),
        # double-cast: the per-group product reaches ~2*n_pos*n per tied
        # group, past long range at trillion-row scale — doubles stay
        # EXACT below 2^53 (every gate-scale value) and degrade
        # gracefully, not wrap, beyond
        F.sum(F.col("pos_g").cast("double")
              * (2 * F.col("cum_before") + F.col("n_g") + 1))
        .alias("ranksum2"),
        # brier numerator in integer MICRO²-units (decimal(38,0): the
        # per-term n_g*si² reaches 10^12 * n_g, past long range at
        # ~9e6 rows per group, and a long sum would WRAP silently) —
        # exact in any summation order, like ssi below
        F.sum(F.col("n_g").cast("decimal(38,0)")
              * F.col("si") * F.col("si")
              - 2 * F.col("si").cast("decimal(38,0)")
              * F.col("pos_g") * scale
              + F.col("pos_g").cast("decimal(38,0)")
              * (scale * scale))
        .alias("brier_u2"),
        F.sum(F.when(F.col("s") >= threshold, F.col("pos_g"))
              .otherwise(F.lit(0))).alias("tp"),
        F.sum(F.when(F.col("s") >= threshold,
                     F.col("n_g") - F.col("pos_g"))
              .otherwise(F.lit(0))).alias("fp"))
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(F.col("n_pos") > 0, F.col("tp") / F.col("n_pos"))
    if G:
        # nulls is the universe (the sentinel row carries the group key
        # even when every row of a group is invalid): left-join metrics
        # onto it so all-invalid groups surface with zero counts.
        # NULL-SAFE keys: a NULL group-key value is a legitimate group
        # (and often the interesting one) — plain equality would strand
        # its core/ece rows and misreport it as all-invalid
        from functools import reduce

        nu, co, ec = nulls.alias("_nu"), core.alias("_co"), ece.alias("_ec")

        def _keys(a, b):
            return reduce(lambda x, y: x & y,
                          [F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}"))
                           for c in G])

        combined = (nu.join(co, _keys("_nu", "_co"), "left")
                    .join(ec, _keys("_nu", "_ec"), "left"))
        gout = [F.col(f"_nu.{c}").alias(c) for c in G]
    else:
        combined = (core.crossJoin(F.broadcast(ece))
                    .crossJoin(F.broadcast(nulls)))
        gout = []
    return combined.select(
        *gout,
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("long")
        .alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).cast("long")
        .alias("n_neg"),
        F.round(F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                       (F.col("ranksum2")
                        - F.col("n_pos").cast("double")
                        * (F.col("n_pos") + 1))
                       / (2.0 * F.col("n_pos") * F.col("n_neg"))),
                6).alias("auc"),
        F.round(F.col("brier_u2").cast("double")
                / (F.col("n") * F.lit(float(scale) * scale)), 6)
        .alias("brier"),
        F.round(F.col("_ece_raw"), 6).alias("ece"),
        F.round((F.col("tp") + (F.col("n_neg") - F.col("fp")))
                / F.col("n"), 6).alias("accuracy"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(F.when(prec.isNotNull() & rec.isNotNull()
                       & (prec + rec > 0),
                       2 * prec * rec / (prec + rec)), 6).alias("f1"))


def roc_points(df: DataFrame, score_col: str = "clf_score",
               label_col: str = "label",
               score_decimals: int = 6) -> DataFrame:
    """(score, tpr, fpr) per distinct quantized score — the ROC curve,
    one point per threshold "predict positive when score >= this value",
    descending-score cumulative over the same bounded score-group
    relation `evaluate_binary` uses (<= 10^d + 1 rows; the global window
    is bounded by construction).  TPR/FPR are exact-integer ratios,
    rounded to 6 decimals; returns no rows when a class is absent
    (the curve is undefined)."""
    g = (_score_groups(df, score_col, label_col, score_decimals)
         .filter(F.col("s").isNotNull()))
    w = (Window.orderBy(F.col("s").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    totals = g.agg(F.sum("pos_g").alias("np"),
                   F.sum(F.col("n_g") - F.col("pos_g")).alias("nn"))
    return (g.withColumn("cum_tp", F.sum("pos_g").over(w))
            .withColumn("cum_fp",
                        F.sum(F.col("n_g") - F.col("pos_g")).over(w))
            .crossJoin(F.broadcast(totals))
            .filter((F.col("np") > 0) & (F.col("nn") > 0))
            .select(F.col("s").alias("score"),
                    F.round(F.col("cum_tp") / F.col("np"), 6).alias("tpr"),
                    F.round(F.col("cum_fp") / F.col("nn"), 6).alias("fpr")))


def split_candidates(df: DataFrame, feature_cols, label_col: str,
                     n_buckets: int = 16,
                     accuracy_mode: str = "exact") -> DataFrame:
    """Candidate decision-stump splits for a binary label: for every
    feature and every equi-depth boundary threshold, the weighted Gini
    impurity of the (x <= t) / (x > t) partition — the inner loop of
    CART/GBDT tree induction, run as pure aggregates (the histogram-based
    split finding of LightGBM/XGBoost-hist).

    Plan (two corpus scans, then candidate-sized everything):
    1. ONE aggregate computes every feature's B-1 exact quantile
       boundaries from one percentile buffer each (`stats.equidepth_bounds`
       one-pass form, all features together) — driver-bounded at
       F×(B-1) doubles by contract.
    2. ONE scan explodes each row to its F (feature, bucket) pairs via a
       literal comparison ladder (codegen, no join) and counts
       (n, n_pos) per (feature, bucket) cell — shuffle carries at most
       F×B cells per partition.
    3. Split statistics are prefix sums OVER THE CELL RELATION (F×B rows
       — the window is tiny by construction, documented exception to the
       no-unpartitioned-window rule it doesn't even need: partitioned by
       feature).

    Exactness: all counts are exact integers; the Gini expression is a
    fixed DOUBLE tree over them, rounded ONCE to micro-units
    (split_gini_micro).  Degenerate splits (empty side) are dropped;
    features with no spread produce no candidates.

    Returns (feature, bucket, threshold, n_left, n_right, pos_left,
    pos_right, split_gini_micro).
    """
    from flood_data_spark.operators.stats import bucket_expr

    feats = list(feature_cols)
    if n_buckets < 2:
        raise ValueError(f"split_candidates: n_buckets must be >= 2, "
                         f"got {n_buckets}")
    # NULL labels can't be counted on either side of a split — gate them
    # before BOTH passes so boundaries and cells see one relation.
    # NULL FEATURE values get NULL buckets from bucket_expr's explicit
    # guard and are filtered below BEFORE the cell groupBy: a NULL
    # feature row must not move any candidate split's n/pos counts for
    # that feature (it still counts for its other, non-NULL features —
    # the per-feature available-case contract of CART surrogate-free
    # induction).
    df = df.filter(F.col(label_col).isNotNull())
    if accuracy_mode not in ("exact", "approx"):
        raise ValueError("split_candidates: accuracy_mode must be "
                         f"'exact' or 'approx', got {accuracy_mode!r}")
    ps = [i / n_buckets for i in range(1, n_buckets)]
    # boundary pass, dual accuracy (the ensemble_threshold_summary
    # switch): 'exact' sorts every value into one percentile buffer per
    # feature — the oracle-parity mode, and the dominant cost (measured
    # 2-3 s of the ~4 s total at sf0.1); 'approx' uses the mergeable
    # percentile_approx sketch — 3x cheaper, and for split FINDING the
    # boundary precision is immaterial (any consistent quantile sketch
    # yields equally informative candidate thresholds).  The 100-TB
    # default is approx; the gate keeps exact for bit-stable thresholds.
    pctl = F.percentile if accuracy_mode == "exact" else (
        lambda c, arr: F.percentile_approx(c, arr, 10_000))
    row = df.agg(*[pctl(
        F.col(f), F.array(*[F.lit(p) for p in ps])).alias(f)
        for f in feats]).collect()[0]
    bounds = {f: [float(b) for b in (row[f] or [])] for f in feats}

    lab = F.col(label_col).cast("int")
    pairs = F.array(*[
        F.struct(F.lit(f).alias("feature"),
                 bucket_expr(f, bounds[f]).alias("bucket"))
        for f in feats])
    cells = (df.select(F.explode(pairs).alias("fb"), lab.alias("_y"))
             .filter(F.col("fb.bucket").isNotNull())
             .groupBy(F.col("fb.feature").alias("feature"),
                      F.col("fb.bucket").alias("bucket"))
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum("_y").alias("_np")))

    w = Window.partitionBy("feature").orderBy("bucket")
    wt = Window.partitionBy("feature")
    cum = (cells
           .withColumn("n_left", F.sum("_n").over(w))
           .withColumn("pos_left", F.sum("_np").over(w))
           .withColumn("_nt", F.sum("_n").over(wt))
           .withColumn("_pt", F.sum("_np").over(wt))
           .withColumn("n_right", F.col("_nt") - F.col("n_left"))
           .withColumn("pos_right", F.col("_pt") - F.col("pos_left")))

    # threshold lookup: bucket b's upper boundary is bounds[f][b-1]
    spark = df.sparkSession
    thr_rows = [(f, i + 1, b) for f in feats
                for i, b in enumerate(bounds[f])]
    if not thr_rows:
        return spark.createDataFrame(
            [], "feature string, bucket int, threshold double, "
                "n_left long, n_right long, pos_left long, "
                "pos_right long, split_gini_micro long")
    thr = spark.createDataFrame(
        thr_rows, "feature string, bucket int, threshold double")

    nl = F.col("n_left").cast("double")
    nr = F.col("n_right").cast("double")
    pl = F.col("pos_left").cast("double") / nl
    pr = F.col("pos_right").cast("double") / nr
    gini_l = 1.0 - (pl * pl + (1.0 - pl) * (1.0 - pl))
    gini_r = 1.0 - (pr * pr + (1.0 - pr) * (1.0 - pr))
    weighted = (nl * gini_l + nr * gini_r) / (nl + nr)
    return (cum.join(F.broadcast(thr), on=["feature", "bucket"],
                     how="inner")
            .filter((F.col("n_left") > 0) & (F.col("n_right") > 0))
            .withColumn("split_gini_micro",
                        F.round(weighted * 1_000_000).cast("long"))
            .select("feature", "bucket", "threshold", "n_left", "n_right",
                    "pos_left", "pos_right", "split_gini_micro"))


def best_split(df: DataFrame, feature_cols, label_col: str,
               n_buckets: int = 16, per_feature: bool = False,
               accuracy_mode: str = "exact") -> DataFrame:
    """The stump: lowest weighted-Gini candidate, deterministic tiebreak
    (gini, then feature name, then bucket).  `per_feature=True` returns
    each feature's own best (the boosting-round inner table); default is
    the single global winner."""
    cand = split_candidates(df, feature_cols, label_col, n_buckets,
                            accuracy_mode)
    part = ["feature"] if per_feature else []
    w = (Window.partitionBy(*part) if part else Window.partitionBy()) \
        .orderBy(F.col("split_gini_micro").asc(), F.col("feature").asc(),
                 F.col("bucket").asc())
    # candidate relation is F×B rows by construction — the global window
    # ranks dozens of rows, never the corpus
    return (cand.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1).drop("_rk"))

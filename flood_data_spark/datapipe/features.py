"""Supervised categorical feature encoders — target (mean) encoding with
Bayesian smoothing, leave-one-out encoding, and weight-of-evidence — the
standard tabular-ML preprocessing trio, expressed as pure Spark aggregates.

Where this sits in the curation toolbox: `classifier.py` hashes raw text
features; these encoders are the structured-column counterpart — they turn
a high-cardinality categorical column into a single dense signal a linear
model or stump (`classifier.best_split`) can consume.  Target encoding is
the CatBoost/Kaggle workhorse; leave-one-out is its leakage-hardened
per-row variant; WOE is the credit-scoring / information-value classic for
binary labels.

Scale posture:
- Every encoder is ONE corpus scan aggregated to a CATEGORY-CARDINALITY
  relation (map-side partial sums on the category key) — the shuffle
  carries one (sum, count) pair per category per partition, never rows.
- Applying an encoding is a broadcast hash join of that small table back
  onto the corpus: zero extra shuffles at any scale (`F.broadcast`
  explicit).  Leave-one-out applies the SAME broadcast join and then
  subtracts the row's own contribution arithmetically — the naive
  formulation (a per-category window over the corpus) would shuffle every
  row on a potentially-skewed key; this one never does.
- The only driver-side values are scalar global aggregates (global target
  mean / class totals), bounded by contract.

Engine-portable determinism (the value-oracle contract): target sums are
accumulated in integer micro-units (round(y * 1e6) ONCE per row, then
exact BIGINT sums — order-free), so every encoded value is a division of
two exact integers: bit-identical on any engine.  WOE's single
transcendental step rounds ln() once to integer micro-nats (the bayes.py
precedent).

No reference analog (the reference has no ML operators); part of the
beyond-reference datapipe inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MICRO = 1_000_000


def _micro(col) -> F.Column:
    """Round a numeric column ONCE to integer micro-units (BIGINT)."""
    return F.round(F.col(col) * MICRO).cast("long")


def target_encoding(df: DataFrame, cat_cols, target_col: str,
                    smoothing: float = 20.0) -> DataFrame:
    """Smoothed mean-target encoding table, one row per category tuple:

        enc = (sum_c + m * global_mean) / (n_c + m)

    (the empirical-Bayes shrinkage toward the global mean; m = `smoothing`
    is the pseudo-count weight of the prior).  Returns the encoding
    RELATION (category cols, n BIGINT, target_sum_micro BIGINT, enc
    DOUBLE) — category-cardinality-sized, intended for a broadcast join
    (`apply_target_encoding`).

    enc is a double computed from exact integers (micro-unit target sums),
    so it is bit-identical across engines; n_c + m and the prior product
    are formed in DOUBLE the same way on both sides.
    """
    if smoothing < 0:
        raise ValueError(f"target_encoding: smoothing must be >= 0, "
                         f"got {smoothing}")
    cat_cols = list(cat_cols)
    # count NON-NULL targets: sum() skips NULLs, so counting rows would
    # silently bias the mean of any category with missing labels
    per_cat = (df.select(*cat_cols, _micro(target_col).alias("_y"))
               .groupBy(*cat_cols)
               .agg(F.count(F.col("_y")).alias("n"),
                    F.sum("_y").alias("target_sum_micro")))
    # Global mean from the SAME exact integer sums (scalar, bounded).
    tot = per_cat.agg(F.sum("target_sum_micro").alias("s"),
                      F.sum("n").alias("n")).collect()[0]
    # float() BEFORE dividing: Python int/int is the correctly-rounded
    # exact quotient, which diverges from the oracle's DOUBLE/DOUBLE once
    # the corpus sum passes 2^53; double-then-divide matches any engine.
    global_mean = ((float(tot["s"]) / float(tot["n"]) / MICRO)
                   if tot["n"] else 0.0)
    enc = ((F.col("target_sum_micro") / MICRO
            + F.lit(float(smoothing)) * F.lit(global_mean))
           / (F.col("n") + F.lit(float(smoothing))))
    return per_cat.withColumn("enc", enc)


def apply_target_encoding(df: DataFrame, encoding: DataFrame,
                          cat_cols, out_col: str = "enc",
                          default: float | None = None) -> DataFrame:
    """Broadcast-join the (small) encoding table onto `df`; unseen
    categories get `default` (NULL when None).  Zero extra shuffles."""
    cat_cols = list(cat_cols)
    small = encoding.select(*cat_cols, F.col("enc").alias(out_col))
    out = df.join(F.broadcast(small), on=cat_cols, how="left")
    if default is not None:
        out = out.withColumn(out_col, F.coalesce(F.col(out_col),
                                                 F.lit(float(default))))
    return out


def loo_encoding(df: DataFrame, cat_cols, target_col: str,
                 out_col: str = "loo") -> DataFrame:
    """Leave-one-out target encoding, per ROW:

        loo_i = (sum_c - y_i) / (n_c - 1)        (NULL when n_c == 1)

    The leakage-hardened variant: a row never sees its own label.  Plan is
    the scale-safe one — ONE category-keyed aggregate (tiny), broadcast
    back, and the row's own contribution removed arithmetically.  The
    naive per-category window would shuffle the whole corpus on the
    category key (skew trap); this never shuffles the corpus at all.

    Exactness: sum_c and y_i are both integer micro-units, so the
    numerator is an exact BIGINT and loo is a deterministic division.
    """
    cat_cols = list(cat_cols)
    rows = df.withColumn("_y_micro", _micro(target_col))
    # non-null target count (NULL-target rows get a NULL loo and must
    # not deflate their peers' denominators)
    per_cat = (rows.groupBy(*cat_cols)
               .agg(F.count(F.col("_y_micro")).alias("_n"),
                    F.sum("_y_micro").alias("_s")))
    out = rows.join(F.broadcast(per_cat), on=cat_cols, how="left")
    loo = F.when(F.col("_y_micro").isNotNull() & (F.col("_n") > 1),
                 (F.col("_s") - F.col("_y_micro"))
                 / (F.col("_n") - 1) / MICRO)
    return out.withColumn(out_col, loo).drop("_y_micro", "_n", "_s")


def woe_encoding(df: DataFrame, cat_cols, label_col: str,
                 laplace: float = 0.5) -> DataFrame:
    """Weight-of-evidence table for a binary (0/1 or boolean) label:

        woe_c = ln( (pos_c + a) / (pos_tot + a*K) )
              - ln( (neg_c + a) / (neg_tot + a*K) )

    with Laplace pseudo-count a and K categories — the credit-scoring
    encoder, plus each category's information-value term
    iv_c = (pos_share - neg_share) * woe_c.  Returns (category cols,
    n_pos BIGINT, n_neg BIGINT, woe_micro BIGINT, iv_micro BIGINT):
    both transcendentals rounded ONCE to integer micro-units (bayes.py
    micro-nat discipline), so the relation is engine-exact.
    """
    if laplace <= 0:
        raise ValueError(f"woe_encoding: laplace must be > 0, "
                         f"got {laplace}")
    cat_cols = list(cat_cols)
    lab = F.col(label_col).cast("int")
    per_cat = (df.groupBy(*cat_cols)
               .agg(F.sum(lab).alias("n_pos"),
                    F.sum(1 - lab).alias("n_neg")))
    tot = per_cat.agg(F.sum("n_pos").alias("p"), F.sum("n_neg").alias("n"),
                      F.count(F.lit(1)).alias("k")).collect()[0]
    a = float(laplace)
    pos_den = float(tot["p"]) + a * float(tot["k"])
    neg_den = float(tot["n"]) + a * float(tot["k"])
    pos_share = (F.col("n_pos") + F.lit(a)) / F.lit(pos_den)
    neg_share = (F.col("n_neg") + F.lit(a)) / F.lit(neg_den)
    woe = F.log(pos_share) - F.log(neg_share)
    return (per_cat
            .withColumn("woe_micro",
                        F.round(woe * MICRO).cast("long"))
            .withColumn("iv_micro",
                        F.round((pos_share - neg_share) * woe * MICRO)
                        .cast("long")))


def oof_target_encoding(df: DataFrame, cat_cols, target_col: str,
                        id_col: str, n_folds: int = 5,
                        salt: str = "") -> DataFrame:
    """Out-of-fold target encoding — the leakage-free form actually used
    in production feature pipelines (the CatBoost/Kaggle recipe
    `loo_encoding` generalizes to folds): each row's encoding is the
    target mean computed WITHOUT its own fold,

        oof(c, f) = (S_c - s_{c,f}) / (N_c - n_{c,f})

    so a k-fold model never sees statistics derived from its own
    training rows.  Folds are md5-assigned from `id_col` (the
    assign_split discipline — deterministic, engine-replayable).

    Plan: ONE (category, fold) aggregate (k× the category cardinality —
    still tiny), category totals derived FROM it (no second corpus
    pass), the leave-one-fold-out value computed arithmetically, and a
    broadcast join back.  The corpus never shuffles on the category key
    (the loo_encoding window-dodge, fold-shaped).

    Returns df + (fold INT, oof_enc DOUBLE — NULL when the category has
    no rows outside the row's fold).  Target sums ride integer
    micro-units: every encoding is a division of exact integers.
    """
    if n_folds < 2:
        raise ValueError(f"oof_target_encoding: n_folds must be >= 2, "
                         f"got {n_folds}")
    cat_cols = list(cat_cols)
    fold = (F.conv(F.substring(F.md5(
        F.concat(F.lit(f"fold{salt}:"),
                 F.col(id_col).cast("string"))), 1, 13), 16, 10)
        .cast("long") % n_folds).cast("int")
    rows = (df.withColumn("fold", fold)
            .withColumn("_y", _micro(target_col)))
    per_cf = (rows.groupBy(*cat_cols, "fold")
              .agg(F.count(F.col("_y")).alias("_n_cf"),
                   F.sum("_y").alias("_s_cf")))
    w_tot = Window.partitionBy(*cat_cols)
    # category totals as a window over the (cat, fold) relation — k×|C|
    # rows, never the corpus
    cf = (per_cf
          .withColumn("_n_c", F.sum("_n_cf").over(w_tot))
          .withColumn("_s_c", F.sum("_s_cf").over(w_tot)))
    oof = F.when(
        F.col("_n_c") - F.col("_n_cf") > 0,
        (F.col("_s_c") - F.col("_s_cf"))
        / (F.col("_n_c") - F.col("_n_cf")) / MICRO)
    enc = cf.select(*cat_cols, "fold", oof.alias("oof_enc"))
    return (rows.join(F.broadcast(enc), on=cat_cols + ["fold"],
                      how="left")
            .drop("_y"))

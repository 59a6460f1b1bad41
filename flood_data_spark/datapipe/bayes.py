"""Multinomial Naive Bayes + chi-squared feature selection — the two
counting-based classics of text classification, expressed as pure Spark
aggregates.

Where this sits in the curation toolbox: `classifier.py` trains the
CCNet-style logistic scorer by gradient descent; Naive Bayes is the
zero-iteration alternative — the model IS two vocabulary-bounded count
aggregates, so training a 100 TB corpus costs exactly one shuffle on the
(term, class) key and one on the class key, no driver round-trips, no
convergence question.  It is also the textbook language-ID model (a
trained-per-language twin of the stopword heuristic in
`sketches.with_lang_id`).  `chi2_terms` is the matching feature-selection
step: rank vocabulary terms by dependence on the label before training
anything.

Scale posture:
- Training shuffles are (term, class)-keyed — vocabulary-bounded, never
  corpus-bounded; document text never shuffles (the tokens explode feeds
  map-side partial counts).
- The model relation is vocab × classes rows.  Scoring joins it to the
  document-term explode on the term key; for real vocabularies this is a
  broadcast join (tens of MB), so the scoring pass adds ZERO extra
  shuffles beyond the per-document re-aggregation.
- Priors / class totals are a classes-sized relation crossed in as a
  broadcast literal row set.

Engine-portable determinism (the value-oracle contract): every count is
an exact integer; the only transcendental step — ln of the smoothed
likelihood ratio — is rounded ONCE to integer micro-log-units
(round(ln(x) * 1e6) as BIGINT), after which document scores are exact
INTEGER sums: order-free, bit-identical on any engine (the
adamic_adar/radius-haversine precedent: a 1-ulp ln() divergence cannot
move a round-to-integer off an irrational value).  Prediction is an
integer argmax with a lexicographic class tie-break.

No reference analog (the reference has no ML operators); part of the
beyond-reference datapipe inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flood_data_spark.datapipe.text import _words

MU = 1_000_000  # micro-log-units per natural-log unit


def naive_bayes_train(docs: DataFrame, label_col: str = "label",
                      text_col: str = "text",
                      alpha: float = 0.5) -> tuple[DataFrame, DataFrame]:
    """Fit a multinomial NB model over whitespace tokens (`text._words`
    — THE shared tokenization).  Returns (terms, classes):

    - terms: (term, label, w_mu) — ln((n_tc + α) / (N_c + α(V+1))) in
      integer micro-log-units, one row per class-conditional term count
      (vocab × classes at most);
    - classes: (label, prior_mu, w0_mu, n_docs) — ln class prior and the
      UNSEEN-term weight ln(α / (N_c + α(V+1))), same units.

    Smoothing reserves one extra vocabulary slot for unseen terms (the
    `unigram_lm_scores` convention).  NULL labels are refused up front —
    they would silently vanish from the priors (the classifier.py
    NULL-label lesson).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if docs.filter(F.col(label_col).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"naive_bayes_train: NULL values in label column "
            f"'{label_col}' — drop or impute them first")
    terms = (docs
             .select(F.col(label_col).alias("label"),
                     F.explode(_words(F.col(text_col))).alias("term")))
    # class-conditional counts: (term, class)-keyed shuffle, map-side
    # partial aggregation — the vocabulary bound
    n_tc = (terms.groupBy("term", "label")
            .agg(F.count(F.lit(1)).alias("n")))
    # vocabulary size: one distinct over the term key
    vocab = terms.select("term").distinct().count()
    # per-class token totals + document priors: classes-sized
    class_tokens = (terms.groupBy("label")
                    .agg(F.count(F.lit(1)).alias("n_tokens")))
    n_total = docs.count()
    classes = (docs.groupBy(F.col(label_col).alias("label"))
               .agg(F.count(F.lit(1)).alias("n_docs"))
               .join(class_tokens, "label", "left")
               .select(
                   "label", "n_docs",
                   F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"))
               .select(
                   "label", "n_docs",
                   F.round(F.log(F.col("n_docs")
                                 / F.lit(float(n_total))) * MU)
                   .cast("long").alias("prior_mu"),
                   F.round(F.log(F.lit(alpha)
                                 / (F.col("n_tokens")
                                    + F.lit(alpha * (vocab + 1)))) * MU)
                   .cast("long").alias("w0_mu")))
    term_w = (n_tc.join(classes.select("label", "n_docs"), "label")
              .join(class_tokens, "label")
              .select("term", "label",
                      F.round(F.log((F.col("n") + F.lit(alpha))
                                    / (F.col("n_tokens")
                                       + F.lit(alpha * (vocab + 1))))
                              * MU)
                      .cast("long").alias("w_mu")))
    return term_w, classes.select("label", "n_docs", "prior_mu", "w0_mu")


def naive_bayes_score(docs: DataFrame, terms: DataFrame,
                      classes: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Score every document against every class and predict the argmax:
    (id, label, score_mu, predicted).

    score(d, c) = prior_mu(c) + Σ_t cnt(t,d) · w_mu(t,c), with unseen
    terms contributing w0_mu(c) — computed as the standard decomposition
    prior + total_tokens·w0 + Σ_{t seen in c} cnt·(w_mu − w0_mu), so the
    only join is doc-terms ⋈ model on the term key (broadcast for real
    vocabularies) and a (doc × classes) re-aggregation.  Scores are exact
    integer micro-log-units; `predicted` marks the (score DESC, label
    ASC) argmax — a deterministic total order.
    """
    toks = (docs
            .select(F.col(id_col).alias("id"),
                    F.explode(_words(F.col(text_col))).alias("term"))
            .groupBy("id", "term")
            .agg(F.count(F.lit(1)).alias("cnt")))
    totals = toks.groupBy("id").agg(F.sum("cnt").alias("n_tokens"))
    cls = F.broadcast(classes.select("label", "prior_mu", "w0_mu"))
    base = (totals.crossJoin(cls)
            .select("id", "label",
                    (F.col("prior_mu")
                     + F.col("n_tokens") * F.col("w0_mu"))
                    .alias("base_mu")))
    # ONE model join: Σ cnt·w_mu and Σ cnt over the class-seen terms in
    # the same aggregation; the Σ cnt·w0 share of those terms is already
    # inside base_mu, so it is subtracted back out below
    seen = (toks.join(F.broadcast(terms), "term")
            .groupBy("id", "label")
            .agg(F.sum(F.col("cnt") * F.col("w_mu")).alias("raw_mu"),
                 F.sum("cnt").alias("seen_cnt")))
    scored = (base
              .join(seen, ["id", "label"], "left")
              .join(cls.select("label", F.col("w0_mu").alias("_w0")),
                    "label")
              .select("id", "label",
                      (F.col("base_mu")
                       + F.coalesce(F.col("raw_mu"), F.lit(0))
                       - F.coalesce(F.col("seen_cnt"), F.lit(0))
                       * F.col("_w0")).alias("score_mu")))
    w = Window.partitionBy("id").orderBy(F.col("score_mu").desc(),
                                         F.col("label").asc())
    return (scored
            .withColumn("predicted", F.row_number().over(w) == 1)
            .select(F.col("id").alias(id_col), "label", "score_mu",
                    "predicted"))


def mutual_information(df: DataFrame, col_a: str,
                       col_b: str) -> DataFrame:
    """Mutual information and marginal entropies between two categorical
    columns, in integer micro-nats: one row (n, n_cells, mi_mu, h_a_mu,
    h_b_mu).

    MI = Σ_xy p(x,y) ln(p(x,y) / (p(x)p(y))), H = −Σ p ln p.  Each
    CELL's term is rounded once to an integer micro-nat contribution —
    round((n_xy / N) · ln((n_xy · N) / (n_x · n_y)) · 1e6) — and the
    totals are exact integer sums: order-free across engines (the
    adamic_adar discipline), so the gate value-hashes despite the
    transcendental per-cell terms.  NULLs are their own category
    (groupBy semantics).  Plans: one (a, b) aggregate, two marginal
    aggregates over it, one broadcast-join back — contingency-table
    sized throughout; the input relation is scanned once.
    """
    cells = (df.groupBy(F.col(col_a).alias("a"),
                        F.col(col_b).alias("b"))
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .localCheckpoint(eager=False))  # consumed by 3 aggregates
    ma = cells.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    n = cells.agg(F.sum("n_ab").alias("n"))
    # eqNullSafe, not "a"/"b" equi-joins: NULL is a legitimate category
    # here, and a plain join key would silently strand its cells (the
    # NULL-group-key-stranding lesson from the SCD/grouped-join reviews)
    ma_j = ma.withColumnRenamed("a", "_a")
    mb_j = mb.withColumnRenamed("b", "_b")
    joined = (cells
              .join(F.broadcast(ma_j),
                    F.col("a").eqNullSafe(F.col("_a")))
              .join(F.broadcast(mb_j),
                    F.col("b").eqNullSafe(F.col("_b")))
              .crossJoin(F.broadcast(n)))
    term = F.round((F.col("n_ab") / F.col("n").cast("double"))
                   * F.log((F.col("n_ab") * F.col("n").cast("double"))
                           / (F.col("n_a")
                              * F.col("n_b").cast("double")))
                   * MU).cast("long")
    ha_term = F.round(-(F.col("n_a") / F.col("n").cast("double"))
                      * F.log(F.col("n_a") / F.col("n").cast("double"))
                      * MU).cast("long")
    hb_term = F.round(-(F.col("n_b") / F.col("n").cast("double"))
                      * F.log(F.col("n_b") / F.col("n").cast("double"))
                      * MU).cast("long")
    mi = joined.agg(F.sum(term).alias("mi_mu"),
                    F.count(F.lit(1)).alias("n_cells"))
    ha = (ma.crossJoin(F.broadcast(n))
          .agg(F.sum(ha_term).alias("h_a_mu")))
    hb = (mb.crossJoin(F.broadcast(n))
          .agg(F.sum(hb_term).alias("h_b_mu")))
    return (n.crossJoin(mi).crossJoin(ha).crossJoin(hb)
            .select("n", "n_cells", "mi_mu", "h_a_mu", "h_b_mu"))


def chi2_terms(docs: DataFrame, label_col: str = "label",
               text_col: str = "text", top_k: int = 50,
               min_df: int = 2) -> DataFrame:
    """Chi-squared feature selection against a BINARY 0/1 label: rank
    vocabulary terms by dependence between document-level term presence
    and the label.  Returns the top_k (term, df_pos, df_neg, chi2) by
    (chi2 DESC, term ASC).

    The 2×2 table per term is built from document frequencies (presence,
    not counts — the standard feature-selection convention): a = docs
    with term & label 1, b = with term & label 0, c/d the complements.
    chi2 = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).  All table cells are
    exact integers; the statistic is evaluated in ONE fixed operand-order
    double expression and rounded to 6 decimals — the ORDER BY uses the
    rounded value, so the output order is engine-portable too.  Terms
    present in every document (degenerate denominator) and terms below
    min_df are dropped.  One (term, presence) shuffle — vocabulary-
    bounded; text never shuffles.
    """
    lab = docs.filter(F.col(label_col).isNotNull())
    n_pos_n_neg = lab.agg(
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        F.sum(F.lit(1) - F.col(label_col).cast("long")).alias("n_neg"))
    presence = (lab
                .select(F.col(label_col).cast("long").alias("y"),
                        F.explode(F.array_distinct(
                            _words(F.col(text_col)))).alias("term")))
    df_counts = (presence.groupBy("term")
                 .agg(F.sum("y").alias("a"),
                      F.sum(F.lit(1) - F.col("y")).alias("b")))
    scored = (df_counts.crossJoin(F.broadcast(n_pos_n_neg))
              .filter((F.col("a") + F.col("b")) >= min_df)
              .filter((F.col("a") + F.col("b"))
                      < (F.col("n_pos") + F.col("n_neg")))
              .select(
                  "term",
                  F.col("a").alias("df_pos"),
                  F.col("b").alias("df_neg"),
                  F.round(
                      ((F.col("n_pos") + F.col("n_neg")).cast("double")
                       * (F.col("a").cast("double")
                          * (F.col("n_neg") - F.col("b")).cast("double")
                          - F.col("b").cast("double")
                          * (F.col("n_pos") - F.col("a")).cast("double"))
                       * (F.col("a").cast("double")
                          * (F.col("n_neg") - F.col("b")).cast("double")
                          - F.col("b").cast("double")
                          * (F.col("n_pos") - F.col("a")).cast("double")))
                      / ((F.col("a") + F.col("b")).cast("double")
                         * ((F.col("n_pos") + F.col("n_neg"))
                            - (F.col("a") + F.col("b"))).cast("double")
                         * F.col("n_pos").cast("double")
                         * F.col("n_neg").cast("double")), 6)
                  .alias("chi2")))
    return (scored.orderBy(F.col("chi2").desc(), F.col("term").asc())
            .limit(top_k))

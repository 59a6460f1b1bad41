"""Ensemble forecast verification — the scores a GloFAS-style user runs
AFTER the flood pipeline: CRPS, Talagrand rank histogram, Brier/Murphy
decomposition, spread-skill.  The reference computes ensemble exceedance
probabilities (flood/spark/transforms.py threshold summaries); verifying
those forecasts against observations is the immediate downstream need,
and every score here reduces to the same shapes the engine already
optimizes — per-cell windows over bounded ensembles and one group-keyed
exchange of exact integer partial sums.

Determinism discipline (datapipe/linalg.py module docstring): every
corpus-sized accumulation rides integer micro-units (values quantized
ONCE via round(x·1e6) → BIGINT; sums are order-free), the final score is
one fixed double expression over exact integers, rounded once — so the
scores are pure functions of the data, partition- and engine-invariant,
and the oracles restate them literally.

Scale posture: ensembles are small (m ~ 11..51 members) and cells are
many — the per-cell rank window partitions by cell (never global), the
score aggregations are one exchange of d-bounded cells, and the
histogram/decomposition relations are bin-bounded.  Nothing here holds
more than one ensemble in a task's window buffer at a time.

No reference analog; beyond-reference inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _micro(col) -> "F.Column":
    """Quantize once to integer micro-units via sign(x)·floor(|x|·1e6
    + 0.5) — the engine-identical pure-IEEE formulation of
    datapipe/linalg._q (Spark round() and DuckDB round() can disagree
    within 1 ulp of a half boundary; floor cannot)."""
    c = col.cast("double")
    return (F.signum(c) * F.floor(F.abs(c) * MICRO + F.lit(0.5))) \
        .cast("long")


def crps_ensemble(df: DataFrame, value_col: str, obs_col: str,
                  group_keys) -> DataFrame:
    """Exact Continuous Ranked Probability Score per group from an
    m-member ensemble (one row per member; `obs_col` constant within the
    group):

        CRPS = (1/m) Σ|x_i − y|  −  (1/m²) Σ_{i<j} |x_i − x_j|

    The pairwise term never materializes pairs: with members sorted
    ascending, Σ_{i<j}|x_i − x_j| = Σ_i (2i − 1 − m)·x_(i) (each value
    counted +1 against everything below it, −1 against everything
    above) — ONE rank window partitioned by the group (m-bounded
    buffer), then a single group-keyed aggregate of integer micro
    sums.  Returns (group_keys…, m, crps) with crps rounded to 6.

    CRPS is proper and collapses to MAE for m = 1 — the
    tests/test_verification.py goldens check both identities against a
    brute-force pairwise computation.
    """
    keys = list(group_keys)
    if not keys:
        raise ValueError("crps_ensemble: need at least one group key")
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    qx = _micro(F.col(value_col))
    qy = _micro(F.col(obs_col))
    ranked = df.withColumn("_rk", F.row_number().over(w))
    agg = (ranked.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("m"),
                F.sum(F.abs(qx - qy)).alias("_sae"),
                F.sum(qx * (2 * F.col("_rk") - 1)).alias("_srk"),
                F.sum(qx).alias("_sx")))
    # Σ (2i-1-m)·x_i  =  Σ (2i-1)·x_i − m·Σ x_i   (exact integers)
    pair = F.col("_srk") - F.col("m") * F.col("_sx")
    m_d = F.col("m").cast("double")
    crps = (F.col("_sae").cast("double") / m_d
            - pair.cast("double") / (m_d * m_d)) / F.lit(float(MICRO))
    return agg.select(*keys, "m", F.round(crps, 6).alias("crps"))


def rank_histogram(df: DataFrame, value_col: str, obs_col: str,
                   group_keys) -> DataFrame:
    """Talagrand rank histogram: for each group, the observation's rank
    among the m members (1 + count of members strictly below; ties go
    below the observation — deterministic), then the count of groups per
    rank.  A calibrated ensemble is flat; ∪-shaped = under-dispersed,
    ∩-shaped = over-dispersed.  Two exchanges, both key-bounded: the
    per-group rank aggregate, then the (m+1)-row histogram.  Returns
    (rank, n_cells) sorted by rank."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("rank_histogram: need at least one group key")
    below = F.when(F.col(value_col) < F.col(obs_col), 1).otherwise(0)
    ranks = (df.groupBy(*keys)
             .agg((F.sum(below) + 1).cast("int").alias("rank")))
    return (ranks.groupBy("rank")
            .agg(F.count(F.lit(1)).alias("n_cells"))
            .orderBy("rank"))


def brier_decomposition(df: DataFrame, prob_col: str, outcome_col: str,
                        n_bins: int = 10) -> DataFrame:
    """Murphy decomposition of the Brier score for a probability
    forecast of a binary outcome, binned to `n_bins` equal-width
    probability bins:

        BS = REL − RES + UNC
        REL = (1/N) Σ_k n_k (p̄_k − ō_k)²     (reliability: calibration)
        RES = (1/N) Σ_k n_k (ō_k − ō)²       (resolution: discrimination)
        UNC = ō (1 − ō)                       (climatological entropy)

    ONE scan → bin-keyed cells (n, Σp_micro, Σo), then bin-bounded
    arithmetic; totals ride a second pass over the CELL relation, never
    the corpus.  Returns one row: (brier, reliability, resolution,
    uncertainty), each rounded to 6 — BS itself is computed directly
    (Σ(p−o)² in micro² units) so the identity BS = REL − RES + UNC is a
    test assertion, not an assumption."""
    if n_bins < 1:
        raise ValueError(f"brier_decomposition: n_bins must be >= 1, "
                         f"got {n_bins}")
    p = F.col(prob_col).cast("double")
    o = F.col(outcome_col).cast("int")
    qp = _micro(p)
    # bin k covers [k/n, (k+1)/n); p = 1.0 folds into the last bin
    b = F.least(F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1))
    cells = (df.select(b.alias("_b"), qp.alias("_qp"), o.alias("_o"))
             .groupBy("_b")
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum("_qp").alias("_sp"),
                  F.sum("_o").alias("_so"),
                  F.sum(F.col("_qp").cast("decimal(38,0)")
                        * F.col("_qp").cast("decimal(38,0)"))
                  .alias("_spp"),
                  F.sum(F.col("_qp") * F.col("_o")).alias("_spo")))
    tot = cells.agg(
        F.sum("_n").alias("n"), F.sum("_so").alias("so"),
        F.sum("_spp").alias("spp"), F.sum("_spo").alias("spo"),
        F.sum((F.col("_sp").cast("double") / F.col("_n")
               - F.col("_so").cast("double") / F.col("_n")
               * F.lit(float(MICRO))) ** 2 * F.col("_n")).alias("rel_u"),
        F.sum((F.col("_so").cast("double") / F.col("_n")) ** 2
              * F.col("_n")).alias("res_u"))
    n = F.col("n").cast("double")
    obar = F.col("so").cast("double") / n
    # BS = (1/N) Σ (p−o)² — expanded over exact integer sums:
    # Σp² − 2Σpo + Σo  (o² = o for 0/1), all in micro² / micro units
    bs = (F.col("spp").cast("double") / (float(MICRO) * MICRO)
          - 2.0 * F.col("spo").cast("double") / MICRO
          + F.col("so").cast("double")) / n
    rel = F.col("rel_u") / n / (float(MICRO) * MICRO)
    res = (F.col("res_u") / n
           - obar * obar)
    unc = obar * (1.0 - obar)
    return tot.select(F.round(bs, 6).alias("brier"),
                      F.round(rel, 6).alias("reliability"),
                      F.round(res, 6).alias("resolution"),
                      F.round(unc, 6).alias("uncertainty"))


def spread_skill(df: DataFrame, value_col: str, obs_col: str,
                 group_keys, lead_col: str) -> DataFrame:
    """Spread-skill relation per lead time: ensemble spread (mean
    per-cell population variance of the members) vs squared error of
    the ensemble mean — the first diagnostic of a dispersion problem
    (spread << skill: under-dispersed; the flat-ratio ideal is
    spread/skill ≈ 1 for a reliable ensemble, Leutbecher & Palmer
    2008).

    Per-cell moments come from ONE pass of exact integer micro sums
    (the linalg dim_stats discipline: sum q, sum q², divide once), the
    per-lead reduction is a second exchange over the CELL relation.
    Returns (lead, n_cells, spread, skill, ratio), doubles rounded 6.
    """
    keys = list(group_keys)
    if not keys:
        raise ValueError("spread_skill: need at least one group key")
    qx = _micro(F.col(value_col))
    qy = _micro(F.col(obs_col))
    cells = (df.groupBy(F.col(lead_col).alias("lead"), *keys)
             .agg(F.count(F.lit(1)).alias("_m"),
                  F.sum(qx).alias("_s1"),
                  F.sum(qx.cast("decimal(38,0)")
                        * qx.cast("decimal(38,0)")).alias("_s2"),
                  F.min(qy).alias("_qy")))
    m = F.col("_m").cast("double")
    mean = F.col("_s1").cast("double") / m
    ex2 = F.col("_s2").cast("double") / m
    var = (ex2 - mean * mean) / (float(MICRO) * MICRO)
    err = (mean - F.col("_qy").cast("double")) / F.lit(float(MICRO))
    # second reduction: the cell relation is corpus-sized (one row per
    # forecast cell), so a raw double avg would be partition-order-
    # dependent — quantize each cell's var / squared error ONCE to
    # micro-units (pure function of the cell's exact integer sums) and
    # sum the integers; divide/round at the end (|err| <= 5e-7 / cell)
    var_q = (F.signum(var)
             * F.floor(F.abs(var) * MICRO + F.lit(0.5))).cast("long")
    err2 = err * err
    err2_q = F.floor(err2 * MICRO + F.lit(0.5)).cast("long")
    per_lead = (cells
                .withColumn("_vq", var_q).withColumn("_eq", err2_q)
                .groupBy("lead")
                .agg(F.count(F.lit(1)).alias("n_cells"),
                     F.sum("_vq").alias("_sv"),
                     F.sum("_eq").alias("_se")))
    n = F.col("n_cells").cast("double")
    spread = F.col("_sv").cast("double") / n / F.lit(float(MICRO))
    skill = F.col("_se").cast("double") / n / F.lit(float(MICRO))
    return per_lead.select(
        "lead", "n_cells",
        F.round(spread, 6).alias("spread"),
        F.round(skill, 6).alias("skill"),
        F.round(F.col("_sv").cast("double")
                / F.col("_se").cast("double"), 6).alias("ratio")) \
        .orderBy("lead")

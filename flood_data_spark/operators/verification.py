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
ONCE via sign(x)·floor(|x|·1e6+0.5) → BIGINT; sums are order-free), and
every final score is an EXACT integer ratio rounded to 6 decimals in
integer space (`linalg._idiv_half_up` — half away from zero via decimal
mod/division; the oracles mirror it with HUGEINT `//`).  No
`round(double)` ever runs on a derived value, so even
cancellation-amplified quantities (variances, Brier terms) round
identically in every engine — the r8-r10 q_covariance lesson applied
from birth.

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

from flood_data_spark.datapipe.linalg import _idiv_half_up

MICRO = 1_000_000


def _mega() -> "F.Column":
    """Exact decimal 1e6 — the display/quantization scale every final
    integer ratio is expressed over.  Built lazily: F.lit at module
    import would require an active SparkContext."""
    return F.lit(MICRO).cast("decimal(38,0)")


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
    sums.  Returns (group_keys…, m, crps) with crps rounded to 6 IN
    INTEGER SPACE: the whole score is the exact ratio

        crps · 1e6 = (sae·m − pair) / m²

    over integer micro sums, so `_idiv_half_up` rounds it with no
    double ever rounding (the linalg discipline).

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
    m_dec = F.col("m").cast("decimal(38,0)")
    pair = (F.col("_srk").cast("decimal(38,0)")
            - m_dec * F.col("_sx").cast("decimal(38,0)"))
    num = F.col("_sae").cast("decimal(38,0)") * m_dec - pair
    crps = (_idiv_half_up(num, m_dec * m_dec).cast("double")
            / F.lit(float(MICRO)))
    return agg.select(*keys, "m", crps.alias("crps"))


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

    ONE scan → bin-keyed cells (n_k, Σp_micro, Σo, Σp², Σpo), then
    bin-bounded arithmetic; the 1-row totals relation broadcasts back
    onto the ≤ n_bins cell rows, never the corpus.  Returns one row:
    (brier, reliability, resolution, uncertainty), each rounded to 6 IN
    INTEGER SPACE over exact micro sums (n_k = bin count, sp = Σqp,
    so_k = Σo, N/so = totals):

        BS  · 1e6 = (Σqp² − 2e6·Σqpo + 1e12·so) / (N·1e6)
        REL · 1e6 = Σ_k half_up((sp_k − 1e6·so_k)² / n_k) / (N·1e6)
        RES · 1e6 = Σ_k half_up((so_k·N − n_k·so)² / n_k) · 1e6 / N³
        UNC · 1e6 = so·(N−so)·1e6 / N²

    (the per-bin half_up quantizes each bin's exact rational to an
    integer — ≤ 0.5 micro²·count error per bin, ≤ n_bins/2 / (N·1e12)
    on the final score, far below round-6 resolution — so every sum is
    order-free and every engine rounds identically).  BS itself is
    computed directly (Σ(p−o)² expanded over o² = o), so the identity
    BS = REL − RES + UNC is a test assertion, not an assumption.
    Overflow envelope: (so_k·N)² stays inside DECIMAL(38,0) while
    N <= ~3e9 rows; ANSI decimal raises loudly past it."""
    return brier_from_cells(brier_cells(df, prob_col, outcome_col,
                                        n_bins))


def brier_cells(df: DataFrame, prob_col: str, outcome_col: str,
                n_bins: int = 10) -> DataFrame:
    """The ONE corpus-sized pass of `brier_decomposition`: bin-keyed
    exact integer cells (_b, _n, _sp, _so, _spp, _spo).  Split out so
    the streaming twin can run this aggregation as complete-mode state
    (<= n_bins cells however long the stream runs — the
    bucket_count_stream bounded-state argument) and hand the
    materialized cells to the SAME `brier_from_cells` finisher as the
    batch path."""
    if n_bins < 1:
        raise ValueError(f"brier_decomposition: n_bins must be >= 1, "
                         f"got {n_bins}")
    p = F.col(prob_col).cast("double")
    o = F.col(outcome_col).cast("int")
    qp = _micro(p)
    # bin k covers [k/n, (k+1)/n); p = 1.0 folds into the last bin
    b = F.least(F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1))
    dec = "decimal(38,0)"
    return (df.select(b.alias("_b"), qp.alias("_qp"), o.alias("_o"))
            .groupBy("_b")
            .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
                 F.sum(F.col("_qp").cast(dec)).alias("_sp"),
                 F.sum(F.col("_o").cast(dec)).alias("_so"),
                 F.sum(F.col("_qp").cast(dec)
                       * F.col("_qp").cast(dec)).alias("_spp"),
                 F.sum(F.col("_qp").cast(dec)
                       * F.col("_o").cast(dec)).alias("_spo")))


def brier_from_cells(cells: DataFrame) -> DataFrame:
    """Finish the Murphy decomposition from materialized bin cells —
    shared verbatim by the batch and streamed paths, so the streaming
    gate checks parity of the WHOLE score, not just the counts."""
    dec = "decimal(38,0)"
    tot = cells.agg(F.sum("_n").alias("n"), F.sum("_so").alias("so"),
                    F.sum("_spp").alias("spp"), F.sum("_spo").alias("spo"))
    # per-bin exact integer contributions (n_bins-bounded relation);
    # the REL/RES sums run as a second GLOBAL aggregate and rejoin the
    # 1-row totals via crossJoin, so empty input yields ONE all-null
    # row (the global-agg contract) rather than zero rows (r11
    # self-review: a grouped finisher dropped the row, breaking
    # .first()['brier'] callers and the empty-stream twin)
    per = cells.crossJoin(F.broadcast(tot))
    rd = F.col("_sp") - _mega() * F.col("_so")
    ed = F.col("_so") * F.col("n") - F.col("_n") * F.col("so")
    sums = per.agg(
        F.sum(_idiv_half_up(rd * rd, F.col("_n")).cast(dec))
        .alias("relu"),
        F.sum(_idiv_half_up(ed * ed, F.col("_n")).cast(dec))
        .alias("resu"))
    agg2 = tot.crossJoin(F.broadcast(sums))
    n, so = F.col("n"), F.col("so")
    two = F.lit(2).cast(dec)
    bs_num = F.col("spp") - two * _mega() * F.col("spo") + _mega() * _mega() * so
    mega_f = F.lit(float(MICRO))
    bs = _idiv_half_up(bs_num, n * _mega()).cast("double") / mega_f
    rel = _idiv_half_up(F.col("relu"), n * _mega()).cast("double") / mega_f
    res = _idiv_half_up(F.col("resu") * _mega(), n * n * n) \
        .cast("double") / mega_f
    unc = _idiv_half_up(so * (n - so) * _mega(), n * n) \
        .cast("double") / mega_f
    return agg2.select(bs.alias("brier"),
                       rel.alias("reliability"),
                       res.alias("resolution"),
                       unc.alias("uncertainty"))


def reliability_diagram(df: DataFrame, prob_col: str, outcome_col: str,
                        n_bins: int = 10) -> DataFrame:
    """Calibration-curve points from the SAME bin cells as
    `brier_decomposition`: per occupied bin (bin, n, p_mean, o_rate,
    gap) where p_mean is the mean forecast probability, o_rate the
    observed frequency and gap = p_mean − o_rate (the per-bin
    reliability residual a calibration plot draws).  One corpus pass
    (`brier_cells`), then bin-bounded arithmetic; both ratios round in
    integer space over the exact micro sums:

        p_mean · 1e6 = half_up(sp_k / n_k)
        o_rate · 1e6 = half_up(so_k · 1e6 / n_k)
        gap    · 1e6 = half_up((sp_k − 1e6·so_k) / n_k)

    (gap is computed from its OWN integer ratio, not as a difference of
    the two rounded ratios — the covariance lesson).  Sorted by bin.
    """
    cells = brier_cells(df, prob_col, outcome_col, n_bins)
    mega_f = F.lit(float(MICRO))
    n_k = F.col("_n")
    p_mean = _idiv_half_up(F.col("_sp"), n_k).cast("double") / mega_f
    o_rate = (_idiv_half_up(F.col("_so") * _mega(), n_k).cast("double")
              / mega_f)
    gap = (_idiv_half_up(F.col("_sp") - _mega() * F.col("_so"), n_k)
           .cast("double") / mega_f)
    return (cells.select(F.col("_b").alias("bin"),
                         F.col("_n").cast("long").alias("n"),
                         p_mean.alias("p_mean"),
                         o_rate.alias("o_rate"),
                         gap.alias("gap"))
            .orderBy("bin"))


def spread_skill(df: DataFrame, value_col: str, obs_col: str,
                 group_keys, lead_col: str) -> DataFrame:
    """Spread-skill relation per lead time: ensemble spread (mean
    per-cell population variance of the members) vs squared error of
    the ensemble mean — the first diagnostic of a dispersion problem
    (spread << skill: under-dispersed; the flat-ratio ideal is
    spread/skill ≈ 1 for a reliable ensemble, Leutbecher & Palmer
    2008).

    Per-cell moments come from ONE pass of exact integer micro sums
    (the linalg dim_stats discipline: sum q, sum q²), and each cell's
    variance / squared error quantizes to micro-units as an EXACT
    integer ratio —

        var  · 1e6 = (s2·m − s1²)   / (m² · 1e6)
        err² · 1e6 = (s1 − m·q_obs)² / (m² · 1e6)

    — via `_idiv_half_up`, so the cell integers are order-free and the
    per-lead reduction (a second exchange over the CELL relation) sums
    exactly.  Returns (lead, n_cells, spread, skill, ratio); spread and
    skill round in integer space (half_up(Σ/n)/1e6), ratio = sv/se as
    half_up(sv·1e6/se)/1e6, NULL when se = 0 (a perfect forecast has no
    defined spread/skill ratio — never Infinity/NaN).
    """
    keys = list(group_keys)
    if not keys:
        raise ValueError("spread_skill: need at least one group key")
    dec = "decimal(38,0)"
    qx = _micro(F.col(value_col))
    qy = _micro(F.col(obs_col))
    cells = (df.groupBy(F.col(lead_col).alias("lead"), *keys)
             .agg(F.count(F.lit(1)).cast(dec).alias("_m"),
                  F.sum(qx.cast(dec)).alias("_s1"),
                  F.sum(qx.cast(dec) * qx.cast(dec)).alias("_s2"),
                  F.min(qy).alias("_qy")))
    m = F.col("_m")
    var_num = F.col("_s2") * m - F.col("_s1") * F.col("_s1")
    ed = F.col("_s1") - m * F.col("_qy").cast(dec)
    var_q = _idiv_half_up(var_num, m * m * _mega()).cast(dec)
    err2_q = _idiv_half_up(ed * ed, m * m * _mega()).cast(dec)
    per_lead = (cells
                .withColumn("_vq", var_q).withColumn("_eq", err2_q)
                .groupBy("lead")
                .agg(F.count(F.lit(1)).alias("n_cells"),
                     F.sum("_vq").alias("_sv"),
                     F.sum("_eq").alias("_se")))
    n_dec = F.col("n_cells").cast(dec)
    mega_f = F.lit(float(MICRO))
    spread = _idiv_half_up(F.col("_sv"), n_dec).cast("double") / mega_f
    skill = _idiv_half_up(F.col("_se"), n_dec).cast("double") / mega_f
    ratio = F.when(
        F.col("_se") > 0,
        _idiv_half_up(F.col("_sv") * _mega(), F.col("_se"))
        .cast("double") / mega_f).otherwise(F.lit(None).cast("double"))
    return per_lead.select(
        "lead", "n_cells",
        spread.alias("spread"),
        skill.alias("skill"),
        ratio.alias("ratio")) \
        .orderBy("lead")

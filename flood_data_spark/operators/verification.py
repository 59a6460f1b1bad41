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
    return _crps_finish(agg, keys)


def _crps_finish(agg: DataFrame, keys) -> DataFrame:
    """Shared CRPS finisher over materialized per-cell integer partials
    (m, _sae, _srk, _sx) — used verbatim by the batch window path
    (`crps_ensemble`) and the streamed member-list path
    (`crps_from_member_lists`), so the streaming gate checks parity of
    the WHOLE score."""
    # Σ (2i-1-m)·x_i  =  Σ (2i-1)·x_i − m·Σ x_i   (exact integers)
    m_dec = F.col("m").cast("decimal(38,0)")
    pair = (F.col("_srk").cast("decimal(38,0)")
            - m_dec * F.col("_sx").cast("decimal(38,0)"))
    num = F.col("_sae").cast("decimal(38,0)") * m_dec - pair
    crps = (_idiv_half_up(num, m_dec * m_dec).cast("double")
            / F.lit(float(MICRO)))
    return agg.select(*keys, "m", crps.alias("crps"))


def crps_member_cells(df: DataFrame, value_col: str, obs_col: str,
                      group_keys) -> DataFrame:
    """The streaming-safe per-cell state of `crps_ensemble`: quantize
    once, then collect each cell's members into an array plus the
    constant observation — an aggregation Structured Streaming can run
    in complete mode (state per cell is m longs; m ~ 11..51 members,
    never corpus-sized).  The rank identity needs the COMPLETE ensemble
    sorted, so the cell state must hold the members themselves; at
    cluster scale the same relation runs as a watermarked
    per-(cell, issued_on) session window — the shape is identical, only
    the eviction policy differs (docs/PLANS.md)."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("crps_member_cells: need at least one group key")
    qx = _micro(F.col(value_col))
    qy = _micro(F.col(obs_col))
    return (df.select(*keys, qx.alias("_qx"), qy.alias("_qy"))
            .groupBy(*keys)
            .agg(F.collect_list("_qx").alias("_qxs"),
                 F.min("_qy").alias("_qyv")))


def crps_from_member_cells(cells: DataFrame, keys) -> DataFrame:
    """Finish CRPS from materialized member-list cells: sort each
    cell's array (m log m per cell, no shuffle — the array is already
    co-located), posexplode to ranked rows, rebuild the SAME integer
    partials as the batch window path, and run the shared
    `_crps_finish`.  Output is identical to `crps_ensemble` row for
    row."""
    keys = list(keys)
    ranked = cells.select(
        *keys, F.col("_qyv"),
        F.posexplode(F.sort_array("_qxs")).alias("_pos", "_qx"))
    agg = (ranked.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("m"),
                F.sum(F.abs(F.col("_qx") - F.col("_qyv"))).alias("_sae"),
                F.sum(F.col("_qx") * (2 * (F.col("_pos") + 1) - 1))
                .alias("_srk"),
                F.sum("_qx").alias("_sx")))
    return _crps_finish(agg, keys)


def crps_hersbach(df: DataFrame, value_col: str, obs_col: str,
                  group_keys) -> DataFrame:
    """Hersbach (2000) decomposition of the ensemble CRPS into
    reliability and potential CRPS, per ensemble-size class:

        CRPS = Σ_{i=0..m} [ ᾱ_i p_i² + β̄_i (1−p_i)² ],   p_i = i/m
        RELI = Σ_i ḡ_i (o_i − p_i)²          ḡ_i = ᾱ_i + β̄_i
        POT  = Σ_i ḡ_i o_i (1 − o_i)         o_i = β̄_i / ḡ_i
        CRPS = RELI + POT                     (exact rational identity)

    where, per cell with members sorted ascending, interval i spans
    [x_(i), x_(i+1)) (x_(0) = −inf, x_(m+1) = +inf) and

        obs above interval:  α_i = x_(i+1) − x_(i),  β_i = 0
        obs inside:          α_i = obs − x_(i),      β_i = x_(i+1) − obs
        obs below interval:  α_i = 0,                β_i = x_(i+1) − x_(i)

    with the outlier intervals i = 0 (β_0 = max(x_(1) − obs, 0)) and
    i = m (α_m = max(obs − x_(m), 0)).  ᾱ/β̄ average over cells.

    Because p_i = i/m only makes sense for a fixed member count, the
    relation groups by m: one output row per ensemble-size class,
    (m, n_cells, crps, reliability, crps_pot).  Mixed-m inputs are
    therefore decomposed per class, never silently blended.

    Execution: ONE cell-partitioned rank window (the crps_ensemble
    window — m-bounded buffer), each ranked row emits its interval
    contribution (rank-1 rows also emit the i = 0 outlier) in exact
    integer micro-units, then a (m, i)-keyed exchange of BIGINT sums —
    the contribution relation is rank-bounded (Σ_m (m+1) rows), never
    corpus-sized.  All three scores round IN INTEGER SPACE:

        crps · 1e6 = Σ_i (A_i·i² + B_i·(m−i)²) / (n·m²)    (exact)
        reli · 1e6 = half_up(Σ_i half_up((B_i·m − i·(A_i+B_i))²·1e6
                                          / (n·m²·(A_i+B_i))) / 1e6)
        pot  · 1e6 = half_up(Σ_i half_up(A_i·B_i·1e6
                                          / (n·(A_i+B_i))) / 1e6)

    over A_i = Σ_cells α_i, B_i = Σ_cells β_i in micro-units (per-rank
    quantization at 1e-12 absolute — ≤ (m+1)/2 · 1e-12 total, five
    orders below round-6 resolution — so sums stay order-free and both
    engines round identically).  Ranks with ḡ_i = 0 contribute zero to
    RELI and POT by convention (o_i undefined), matching Hersbach's
    treatment.  CRPS here equals the mean of `crps_ensemble` over the
    class's cells and RELI + POT reconstructs it — both identities are
    test assertions (tests/test_verification.py), not assumptions.
    """
    keys = list(group_keys)
    if not keys:
        raise ValueError("crps_hersbach: need at least one group key")
    dec = "decimal(38,0)"
    qx = _micro(F.col(value_col))
    qy = _micro(F.col(obs_col))
    wo = Window.partitionBy(*keys).orderBy(F.col("_qx").asc())
    # the member count rides the SAME (partition, order) spec with a
    # full frame, so all three window expressions share ONE WindowExec
    # pass (a partition-only count spec planned a second one — measured
    # on the x10 bench tier)
    wf = wo.rowsBetween(Window.unboundedPreceding,
                        Window.unboundedFollowing)
    src = df.select(*keys, qx.alias("_qx"), qy.alias("_qy"))
    ranked = (src
              .withColumn("_rk", F.row_number().over(wo))
              .withColumn("_qn", F.lead("_qx").over(wo))
              .withColumn("_m", F.count(F.lit(1)).over(wf)))
    x, nx, y = F.col("_qx"), F.col("_qn"), F.col("_qy")
    # interior interval from rank r < m (boundary equality is value-
    # identical in all three cases, so non-strict comparisons are safe)
    a_in = F.when(y >= nx, nx - x).when(y <= x, F.lit(0)) \
        .otherwise(y - x)
    b_in = F.when(y >= nx, F.lit(0)).when(y <= x, nx - x) \
        .otherwise(nx - y)
    elem = F.when(
        F.col("_rk") < F.col("_m"),
        F.struct(F.col("_rk").alias("i"), a_in.alias("a"),
                 b_in.alias("b"))
    ).otherwise(
        F.struct(F.col("_rk").alias("i"),
                 F.greatest(y - x, F.lit(0).cast("long")).alias("a"),
                 F.lit(0).cast("long").alias("b")))
    lo = F.when(
        F.col("_rk") == 1,
        F.struct(F.lit(0).cast("int").alias("i"),
                 F.lit(0).cast("long").alias("a"),
                 F.greatest(x - y, F.lit(0).cast("long")).alias("b")))
    # explode the fixed 2-slot array and drop the NULL second slot with
    # a PLAIN filter: the earlier F.filter(lambda) form is a
    # higher-order function that evaluates interpreted per row —
    # measured 26.2 s -> 3.2 s on the 6M-row x10 bench tier (with the
    # shared-WindowExec fix above)
    contrib = (ranked
               .select(F.col("_m").alias("m"),
                       F.explode(
                           F.array(elem.cast("struct<i:int,a:long,b:long>"),
                                   lo)).alias("c"))
               .filter(F.col("c").isNotNull())
               .select("m", F.col("c.i").alias("i"),
                       F.col("c.a").alias("a"), F.col("c.b").alias("b")))
    byrank = (contrib.groupBy("m", "i")
              .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
                   F.sum(F.col("a").cast(dec)).alias("_A"),
                   F.sum(F.col("b").cast(dec)).alias("_B")))
    m_dec = F.col("m").cast(dec)
    i_dec = F.col("i").cast(dec)
    n, A, B = F.col("_n"), F.col("_A"), F.col("_B")
    g = A + B
    zero = F.lit(0).cast(dec)
    crps_num = A * i_dec * i_dec + B * (m_dec - i_dec) * (m_dec - i_dec)
    rd = B * m_dec - i_dec * g
    reli_u = F.when(g > 0, _idiv_half_up(rd * rd * _mega(),
                                         n * m_dec * m_dec * g)) \
        .otherwise(zero)
    pot_u = F.when(g > 0, _idiv_half_up(A * B * _mega(), n * g)) \
        .otherwise(zero)
    per_m = (byrank.groupBy("m")
             .agg(F.max("_n").alias("_nc"),
                  F.sum(crps_num.cast(dec)).alias("_cn"),
                  F.sum(reli_u.cast(dec)).alias("_ru"),
                  F.sum(pot_u.cast(dec)).alias("_pu")))
    mega_f = F.lit(float(MICRO))
    m2 = F.col("m").cast(dec) * F.col("m").cast(dec)
    crps = (_idiv_half_up(F.col("_cn"), F.col("_nc") * m2)
            .cast("double") / mega_f)
    reli = (_idiv_half_up(F.col("_ru"), _mega()).cast("double") / mega_f)
    pot = (_idiv_half_up(F.col("_pu"), _mega()).cast("double") / mega_f)
    return (per_m.select(F.col("m").cast("long").alias("m"),
                         F.col("_nc").cast("long").alias("n_cells"),
                         crps.alias("crps"),
                         reli.alias("reliability"),
                         pot.alias("crps_pot"))
            .orderBy("m"))


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


def ece_from_cells(cells: DataFrame) -> DataFrame:
    """Expected Calibration Error from the `brier_cells` relation:

        ECE = Σ_k n_k |p̄_k − ō_k| / N = Σ_k |sp_k − 1e6·so_k| / (N·1e6)

    — one exact integer ratio over the bin cells, rounded in integer
    space.  This is the SAME quantity `datapipe/classifier
    .evaluate_binary` reports as `ece` (score_decimals=6 makes its
    per-group si the identical micro quantization), computed through
    the verification family's bin ladder instead of the classifier's —
    the cross-gate `q_ece_cells` proves the two ladders agree on shared
    input.  Returns one row (ece); empty input yields one NULL row
    (the global-agg contract)."""
    tot = cells.agg(
        F.sum(F.abs(F.col("_sp") - _mega() * F.col("_so"))).alias("_d"),
        F.sum("_n").alias("_nn"))
    ece = (_idiv_half_up(F.col("_d"), F.col("_nn")).cast("double")
           / F.lit(float(MICRO)))
    return tot.select(ece.alias("ece"))


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


def contingency_scores(df: DataFrame, prob_col: str, outcome_col: str,
                       threshold: float = 0.5) -> DataFrame:
    """Categorical verification of a probability forecast dichotomized
    at `threshold` — the 2x2 contingency table (hits a, false alarms b,
    misses c, correct negatives d) and the standard skill ladder a
    GloFAS-style exceedance product is judged by:

        POD  = a/(a+c)                    (hit rate)
        FAR  = b/(a+b)                    (false-alarm ratio)
        CSI  = a/(a+b+c)                  (threat score)
        BIAS = (a+b)/(a+c)                (frequency bias)
        PSS  = (a·d − b·c)/((a+c)(b+d))   (Peirce / true skill)
        ETS  = (a·n − (a+b)(a+c)) / ((a+b+c)·n − (a+b)(a+c))
        HSS  = 2(a·d − b·c) / ((a+c)(c+d) + (a+b)(b+d))

    ONE scan to four integer counts; every score is an EXACT integer
    ratio rounded once via `_idiv_half_up` (ETS's random-hits term
    (a+b)(a+c)/n clears its denominator into the ratio, so nothing is
    rounded early).  Scores with a zero denominator return NULL, never
    Inf/NaN.  Returns one row; empty input yields one row of zero
    counts with NULL scores (the global-agg contract)."""
    return contingency_from_counts(
        contingency_counts(df, prob_col, outcome_col, threshold))


def contingency_counts(df: DataFrame, prob_col: str, outcome_col: str,
                       threshold: float = 0.5) -> DataFrame:
    """The ONE corpus-sized pass of `contingency_scores`: the 2x2 table
    as four exact integer counts.  Split out so the streaming twin can
    run this as a complete-mode global aggregate (state = 4 DECIMAL
    cells, mergeable because sums are) and hand the materialized counts
    to the SAME `contingency_from_counts` finisher as the batch path."""
    dec = "decimal(38,0)"
    p = F.col(prob_col).cast("double")
    o = F.col(outcome_col).cast("int")
    fy = (p >= F.lit(float(threshold))).cast("int")
    return df.agg(
        F.coalesce(F.sum(fy * o), F.lit(0)).cast(dec).alias("a"),
        F.coalesce(F.sum(fy * (1 - o)), F.lit(0)).cast(dec).alias("b"),
        F.coalesce(F.sum((1 - fy) * o), F.lit(0)).cast(dec).alias("c"),
        F.coalesce(F.sum((1 - fy) * (1 - o)), F.lit(0)).cast(dec)
        .alias("d"))


def contingency_from_counts(cnt: DataFrame) -> DataFrame:
    """Finish the skill ladder from materialized 2x2 counts — shared
    verbatim by the batch and streamed paths."""
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    n = a + b + c + d
    mega_f = F.lit(float(MICRO))

    def ratio(num, den):
        # _idiv_half_up is sign-aware, so negative numerators (PSS,
        # ETS, HSS of a worse-than-random forecast) round half away
        # from zero exactly like the oracle's HUGEINT twin
        return F.when(den > 0, _idiv_half_up(num * _mega(), den)
                      .cast("double") / mega_f) \
            .otherwise(F.lit(None).cast("double"))

    ets_den = (a + b + c) * n - (a + b) * (a + c)
    hss_den = (a + c) * (c + d) + (a + b) * (b + d)
    pss_num = a * d - b * c
    return cnt.select(
        n.cast("long").alias("n"),
        a.cast("long").alias("hits"),
        b.cast("long").alias("false_alarms"),
        c.cast("long").alias("misses"),
        d.cast("long").alias("correct_negatives"),
        ratio(a, a + c).alias("pod"),
        ratio(b, a + b).alias("far"),
        ratio(a, a + b + c).alias("csi"),
        ratio(a + b, a + c).alias("bias"),
        ratio(pss_num, (a + c) * (b + d)).alias("peirce"),
        ratio(a * n - (a + b) * (a + c), ets_den).alias("ets"),
        ratio(2 * pss_num, hss_den).alias("hss"))


def quantile_score(df: DataFrame, value_col: str, obs_col: str,
                   group_keys, taus=(0.1, 0.5, 0.9)) -> DataFrame:
    """Ensemble quantile (pinball) score: per cell, the exact
    tau-quantile of the m members, then the mean pinball loss against
    the observation over all cells, one row per tau:

        QS_tau = (1/n) Σ_cells (y − q_tau) · (tau − 1{y < q_tau})

    Proper for the tau-quantile; QS_0.5 is half the MAE of the median.
    ONE cell-keyed exchange computes every requested quantile from a
    single percentile buffer (the threshold-summary trick), then a
    tau-bounded explode and one (tau)-keyed integer reduction.  Each
    tau must be a multiple of 0.01: with y and q micro-quantized,
    100·loss = (qy − qq)·(100·tau − 100·ind) is an EXACT integer, so
    the cell sums are order-free and the final mean rounds once via
    `_idiv_half_up` (spark `percentile` == DuckDB `quantile_cont`
    bit-for-bit, so the oracle mirrors the whole chain).  Returns
    (tau, n_cells, qscore) sorted by tau."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("quantile_score: need at least one group key")
    taus = [float(t) for t in taus]
    for t in taus:
        ht = round(t * 100)
        if abs(t * 100 - ht) > 1e-9 or not 0 <= ht <= 100:
            raise ValueError(
                f"quantile_score: tau {t} must be a multiple of 0.01 "
                "in [0, 1] (keeps the loss an exact integer)")
    dec = "decimal(38,0)"
    cells = (df.groupBy(*keys)
             .agg(F.percentile(F.col(value_col).cast("double"),
                               F.array(*[F.lit(t) for t in taus]))
                  .alias("_qs"),
                  F.min(_micro(F.col(obs_col))).alias("_qy")))
    per_tau = cells.select(
        F.col("_qy"),
        F.posexplode("_qs").alias("_i", "_q"))
    qq = _micro(F.col("_q"))
    ht = F.element_at(F.array(*[F.lit(int(round(t * 100)))
                                for t in taus]), F.col("_i") + 1)
    ind = (F.col("_qy") < qq).cast("int")
    loss100 = ((F.col("_qy") - qq) * (ht - 100 * ind)).cast(dec)
    agg = (per_tau.groupBy("_i")
           .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
                F.sum(loss100).alias("_s")))
    tau_col = F.element_at(F.array(*[F.lit(t) for t in taus]),
                           F.col("_i") + 1)
    qscore = (_idiv_half_up(F.col("_s"),
                            F.col("_n") * F.lit(100).cast(dec))
              .cast("double") / F.lit(float(MICRO)))
    return (agg.select(tau_col.alias("tau"),
                       F.col("_n").cast("long").alias("n_cells"),
                       qscore.alias("qscore"))
            .orderBy("tau"))


def quantile_score_from_member_cells(cells: DataFrame,
                                     taus=(0.1, 0.5, 0.9)) -> DataFrame:
    """Finish the ensemble quantile score from the SAME materialized
    member-list cells as `crps_from_member_cells` (`crps_member_cells`
    / the streaming `crps_cell_stream` state — one stream, two
    finishers): per cell, linear-interpolation quantiles computed from
    the sorted member array IN INTEGER SPACE, then the identical
    pinball reduction as `quantile_score`.

    Quantile parity: Spark `percentile`/DuckDB `quantile_cont` use the
    (m−1)·tau linear interpolation on the RAW doubles; here members are
    already micro-quantized longs, so q_tau·100 = v_lo·(100 − w) +
    v_hi·w with w = frac((m−1)·tau)·100 an EXACT integer (taus are
    0.01-multiples ⇒ (m−1)·tau·100 is an integer), making the
    centi-micro quantile exact and 100·loss = ((qy·100 − qq100)·(100τ −
    100·ind)) / 100 exact integers end to end — the batch oracle's
    quantile_cont chain reproduces it bit-for-bit BECAUSE the raw
    doubles in the gate fixture are micro-exact.  Returns
    (tau, n_cells, qscore) sorted by tau."""
    taus = [float(t) for t in taus]
    for t in taus:
        ht = round(t * 100)
        if abs(t * 100 - ht) > 1e-9 or not 0 <= ht <= 100:
            raise ValueError(
                f"quantile_score_from_member_cells: tau {t} must be a "
                "multiple of 0.01 in [0, 1]")
    dec = "decimal(38,0)"
    srt = cells.select(F.col("_qyv"),
                       F.sort_array("_qxs").alias("_s"),
                       (F.size("_qxs") - 1).alias("_m1"))
    per = srt.select(
        "_qyv", "_s", "_m1",
        F.posexplode(F.array(*[F.lit(int(round(t * 100)))
                               for t in taus])).alias("_i", "_ht"))
    # index = (m-1)·tau; lo = floor, w100 = the exact centi fraction
    idx100 = F.col("_m1") * F.col("_ht")          # (m−1)·tau·100, int
    lo = F.floor(idx100 / 100).cast("int")
    w100 = (idx100 - lo * 100).cast("long")
    v_lo = F.element_at("_s", lo + 1).cast("long")
    v_hi = F.element_at("_s", F.least(lo + F.lit(2),
                                      F.col("_m1") + 1)).cast("long")
    qq100 = v_lo * (100 - w100) + v_hi * w100     # centi-micro quantile
    qy100 = F.col("_qyv") * 100
    ind = (qy100 < qq100).cast("int")
    loss = ((qy100 - qq100) * (F.col("_ht") - 100 * ind)).cast(dec)
    agg = (per.groupBy("_i")
           .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
                F.sum(loss).alias("_s")))
    tau_col = F.element_at(F.array(*[F.lit(t) for t in taus]),
                           F.col("_i") + 1)
    # loss is in centi-micro · centi-tau units: divide by 100·100
    qscore = (_idiv_half_up(F.col("_s"),
                            F.col("_n") * F.lit(10000).cast(dec))
              .cast("double") / F.lit(float(MICRO)))
    return (agg.select(tau_col.alias("tau"),
                       F.col("_n").cast("long").alias("n_cells"),
                       qscore.alias("qscore"))
            .orderBy("tau"))


def isotonic_calibration(cells: DataFrame) -> DataFrame:
    """Isotonic (PAV) calibration of the per-bin observed rates from
    the `brier_cells` relation, via the minimax closed form of
    pool-adjacent-violators:

        iso_k = max_{i<=k} min_{j>=k} (Σ_{i..j} so) / (Σ_{i..j} n)

    — the weighted isotonic regression of o_rate on bin index, the
    non-parametric recalibration map (the classifier family's Platt
    scaling is its parametric sibling).  PAV's sequential pooling loop
    does not distribute, but the minimax identity is pure relational
    algebra over the ≤ n_bins occupied bins: prefix sums, an i <= k <=
    j triple join of bin-bounded relations (≤ B³ rows, B ≤ ~20 — never
    corpus-sized; the corpus was reduced by `brier_cells`' one scan),
    and two grouped min/max.  Interval rates quantize once at 1e-12
    (half_up(so·1e12/n)) so the min/max comparisons are integer
    comparisons — identical in every engine; monotonicity of iso_rate
    is exact by construction and asserted in pytest.  Returns
    (bin, n, o_rate, iso_rate) sorted by bin."""
    dec = "decimal(38,0)"
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    pre = cells.select("_b", "_n", "_so") \
        .withColumn("_cn", F.sum("_n").over(w)) \
        .withColumn("_cs", F.sum("_so").over(w))
    lo = pre.select(F.col("_b").alias("_i"),
                    (F.col("_cn") - F.col("_n")).alias("_cn0"),
                    (F.col("_cs") - F.col("_so")).alias("_cs0"))
    hi = pre.select(F.col("_b").alias("_j"),
                    F.col("_cn").alias("_cn1"),
                    F.col("_cs").alias("_cs1"))
    tera = F.lit(10 ** 12).cast(dec)
    pairs = (lo.join(hi, F.col("_i") <= F.col("_j"))
             .select("_i", "_j",
                     _idiv_half_up((F.col("_cs1") - F.col("_cs0"))
                                   * tera,
                                   F.col("_cn1") - F.col("_cn0"))
                     .cast(dec).alias("_r")))
    ks = cells.select(F.col("_b").alias("_k"))
    inner = (pairs.join(ks, (F.col("_i") <= F.col("_k"))
                        & (F.col("_k") <= F.col("_j")))
             .groupBy("_k", "_i")
             .agg(F.min("_r").alias("_mn"))
             .groupBy("_k")
             .agg(F.max("_mn").alias("_iso")))
    mega_f = F.lit(float(MICRO))
    o_rate = (_idiv_half_up(F.col("_so") * _mega(), F.col("_n"))
              .cast("double") / mega_f)
    # display rounding of the 1e-12 integer: one more exact half_up
    iso = (_idiv_half_up(F.col("_iso"), F.lit(10 ** 6).cast(dec))
           .cast("double") / mega_f)
    return (cells.join(inner, cells["_b"] == inner["_k"])
            .select(F.col("_b").alias("bin"),
                    F.col("_n").cast("long").alias("n"),
                    o_rate.alias("o_rate"),
                    iso.alias("iso_rate"))
            .orderBy("bin"))


def energy_score(df: DataFrame, id_col: str, vec_col: str,
                 group_keys) -> DataFrame:
    """Multivariate energy score (Gneiting & Raftery 2007) — the
    vector-valued generalization of CRPS — per group, treating the
    group's MINIMUM-id vector as the observation y and the rest as the
    m ensemble members:

        ES = (1/m) Σ_i ||x_i − y|| − (1/(2m²)) Σ_{i,j} ||x_i − x_j||

    Distances are left-fold float sums over the vector dims + one IEEE
    sqrt (both engines evaluate the identical expression tree), each
    norm quantized ONCE to integer micro-units; the pairwise term uses
    the symmetric i<j sum doubled (diagonal is zero), so both sums are
    order-free integers and the final score is one exact integer ratio
    (2·Σ_i·m − Σ_{i<j}·2... assembled in integer space, half_up once).
    The pairwise join is GROUP-bounded (m² per cell, m = ensemble
    size), never corpus²: cells × m² total candidate volume — the
    dedup-family bucket argument.  Returns (group, m, energy) sorted by
    group."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("energy_score: need at least one group key")
    dec = "decimal(38,0)"
    wmin = Window.partitionBy(*keys)
    base = df.select(*keys, F.col(id_col).alias("_id"),
                     F.col(vec_col).cast("array<double>").alias("_v")) \
        .withColumn("_obs_id", F.min("_id").over(wmin))
    # fail-loud unique-id precondition: a duplicated min id makes the
    # obs relation multi-row and silently MULTIPLIES distances in the
    # t1 join; duplicated member ids silently DROP their i<j pair from
    # the pairwise sum.  The check shares wmin's WindowExec (same
    # partitionBy, no extra exchange; collect_set is m-bounded — m is
    # the ensemble size) and raises at execution via assert_true.
    base = base.withColumn(
        "_uniq", F.size(F.collect_set("_id").over(wmin))
        == F.count(F.lit(1)).over(wmin)) \
        .filter(F.assert_true(
            F.col("_uniq"),
            F.lit("energy_score: duplicate id value within a group — "
                  "ids must be unique per group (obs selection and "
                  "the i<j pairwise sum both require it)")).isNull()) \
        .drop("_uniq")
    obs = base.filter(F.col("_id") == F.col("_obs_id")) \
        .select(*keys, F.col("_v").alias("_y"))
    mem = base.filter(F.col("_id") != F.col("_obs_id")) \
        .select(*keys, "_id", "_v")

    def dist(a, b):
        s = F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, v: acc + v)
        return F.sqrt(s)

    qd = (F.floor(dist(F.col("_v"), F.col("_y")) * MICRO + F.lit(0.5))
          .cast("long"))
    t1 = (mem.join(obs, keys)
          .groupBy(*keys)
          .agg(F.count(F.lit(1)).cast(dec).alias("m"),
               F.sum(qd).cast(dec).alias("_s1")))
    m2 = mem.select(*keys, F.col("_id").alias("_id2"),
                    F.col("_v").alias("_v2"))
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
    qp = (F.floor(dist(F.col("a._v"), F.col("b._v2")) * MICRO
                  + F.lit(0.5)).cast("long"))
    t2 = (mem.alias("a").join(m2.alias("b"),
                              cond + [F.col("a._id") < F.col("b._id2")])
          .groupBy(*[F.col(f"a.{k}").alias(k) for k in keys])
          .agg(F.sum(qp).cast(dec).alias("_s2")))
    joined = t1.join(t2, keys, "left") \
        .withColumn("_s2", F.coalesce(F.col("_s2"), F.lit(0).cast(dec)))
    m = F.col("m")
    # ES·1e6 = (s1·m − s2) / m²   (s2 counts i<j once; the symmetric
    # double and the 1/2 cancel)
    es = (_idiv_half_up(F.col("_s1") * m - F.col("_s2"), m * m)
          .cast("double") / F.lit(float(MICRO)))
    return (joined.select(*keys, m.cast("long").alias("m"),
                          es.alias("energy"))
            .orderBy(*keys))


def anomaly_correlation(df: DataFrame, fcst_col: str, obs_col: str,
                        clim_col: str, group_keys) -> DataFrame:
    """Anomaly Correlation Coefficient per group — THE headline
    deterministic-forecast skill score in NWP practice:

        ACC = Σ f'o' / sqrt(Σ f'² · Σ o'²),   f' = f − c, o' = o − c

    with c the climatology column.  Anomalies are DIFFERENCES OF
    QUANTIZED integers (exact), so Σ f'o', Σ f'², Σ o'² are order-free
    BIGINT sums; the denominator takes ONE IEEE sqrt per factor, EACH
    quantized via floor(+0.5) BEFORE multiplying (Spark floor(double)
    returns LONG, and the combined product sqrt(Σf'²)·sqrt(Σo'²)
    overflowed it at gate scale — caught live; per-factor values stay
    inside LONG up to Σ ~ 1e37, i.e. ~1e12 rows of 1e9-micro
    anomalies), the exact decimal product forming

        acc · 1e6 = half_up(Σf'o' · 1e6, qsf · qso)

    sign-aware (anticorrelation is real), NULL when either anomaly
    variance is zero.  One group-keyed exchange.  Returns
    (group_keys…, n, acc) sorted by keys."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("anomaly_correlation: need at least one "
                         "group key")
    dec = "decimal(38,0)"
    qf = _micro(F.col(fcst_col))
    qo = _micro(F.col(obs_col))
    qc = _micro(F.col(clim_col))
    af = (qf - qc).cast(dec)
    ao = (qo - qc).cast(dec)
    agg = (df.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(af * ao).alias("_sfo"),
                F.sum(af * af).alias("_sff"),
                F.sum(ao * ao).alias("_soo")))
    qsf = F.floor(F.sqrt(F.col("_sff").cast("double")) + F.lit(0.5)) \
        .cast(dec)
    qso = F.floor(F.sqrt(F.col("_soo").cast("double")) + F.lit(0.5)) \
        .cast(dec)
    qden = qsf * qso
    acc = F.when(
        qden > 0,
        _idiv_half_up(F.col("_sfo") * _mega(), qden).cast("double")
        / F.lit(float(MICRO))).otherwise(F.lit(None).cast("double"))
    return agg.select(*keys, "n", acc.alias("acc")).orderBy(*keys)


def cost_loss_value(cnt: DataFrame, alphas=(2, 5, 10, 20, 30, 40, 50,
                                            60, 70, 80)) -> DataFrame:
    """Economic value of a dichotomous forecast over a ladder of
    cost-loss ratios alpha = C/L (Richardson 2000), from the SAME 2x2
    counts relation as `contingency_scores` (`contingency_counts`):

        V(α) = (min(α,ō) − F·α(1−ō) + H·ō(1−α) − ō)
               / (min(α,ō) − α·ō)

    with hit rate H = a/(a+c), false-alarm rate F = b/(b+d), base rate
    ō = (a+c)/n.  `alphas` are PERCENT integers, so clearing the common
    denominator 100·n·(b+d)·(a+c) makes V one EXACT integer ratio per
    alpha — assembled term-for-term below, sign-aware (negative value =
    using the forecast loses money at that cost-loss ratio), NULL when
    the denominator is non-positive (ō ∈ {0,1}: no decision problem).
    The alpha ladder explodes the ONE-row counts relation — no second
    corpus pass.  Returns (alpha, value) sorted by alpha."""
    alphas = [int(k) for k in alphas]
    for k in alphas:
        if not 0 < k < 100:
            raise ValueError(f"cost_loss_value: alpha percent {k} must "
                             "be in (0, 100)")
    dec = "decimal(38,0)"
    per = cnt.select("a", "b", "c", "d",
                     F.explode(F.array(*[F.lit(k) for k in alphas]))
                     .alias("_k"))
    a, b, c, d = [F.col(x) for x in "abcd"]
    k = F.col("_k").cast(dec)
    n = a + b + c + d
    bd, ac = b + d, a + c
    # min(α, ō) · 100·n·(b+d)·(a+c): α<ō iff k·n < 100·(a+c)
    min_term = F.when(k * n < F.lit(100).cast(dec) * ac,
                      k * n * bd * ac) \
        .otherwise(F.lit(100).cast(dec) * ac * bd * ac)
    hundred = F.lit(100).cast(dec)
    # the four V-numerator terms over D = 100·n·(b+d)·(a+c)
    num = (min_term
           - k * b * (n - ac) * ac                 # F·α(1−ō)
           + a * (hundred - k) * bd * ac           # H·ō(1−α)
           - hundred * ac * bd * ac)               # ō
    # α·ō·D = (k/100)·((a+c)/n)·100·n·(b+d)·(a+c) = k·(a+c)²·(b+d)
    den = min_term - k * ac * ac * bd
    value = F.when(
        den > 0,
        _idiv_half_up(num * _mega(), den).cast("double")
        / F.lit(float(MICRO))).otherwise(F.lit(None).cast("double"))
    return per.select((F.col("_k").cast("double")
                       / F.lit(100.0)).alias("alpha"),
                      value.alias("value")).orderBy("alpha")


def dm_test(df: DataFrame, loss_a_col: str, loss_b_col: str,
            group_keys=()) -> DataFrame:
    """Diebold-Mariano forecast-comparison test (lag-0 form) per group:
    is forecast A's loss systematically different from B's?

        d_i = loss_a_i − loss_b_i
        DM  = d̄ / sqrt(var_pop(d)/n) = S·sqrt(n) / sqrt(SS·n − S²)

    with S = Σ qd, SS = Σ qd² over micro-quantized loss differences
    (exact integer differences — the CUPED/ACC discipline).  Two sqrt
    seams quantized separately (the ACC per-factor rule): qsn =
    floor(sqrt(n)·1e6 + 0.5), qsa = floor(sqrt(SS·n − S²) + 0.5), then
    DM·1e6 = half_up(S·qsn, qsa) — sign-aware (negative = A better
    under lower-is-better losses), NULL when the differential has zero
    variance.  Lag-0 only: for serially-correlated loss differentials
    (h-step forecasts) use [dm_test_hac], the Newey-West form over an
    ordered series.  |DM| >~ 1.96 rejects equal accuracy at 5%
    under the asymptotic normal.  Returns (keys…, n, mean_diff,
    dm_stat) sorted by keys; ONE group-keyed exchange."""
    keys = list(group_keys)
    dec = "decimal(38,0)"
    qa = _micro(F.col(loss_a_col))
    qb = _micro(F.col(loss_b_col))
    qd = (qa - qb).cast(dec)
    base = df.select(*keys, qd.alias("_qd"))
    agg = (base.groupBy(*keys) if keys else base.groupBy()) \
        .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
             F.sum("_qd").alias("_s"),
             F.sum(F.col("_qd") * F.col("_qd")).alias("_ss"))
    n, s = F.col("_n"), F.col("_s")
    a = F.col("_ss") * n - s * s
    qsn = F.floor(F.sqrt(n.cast("double")) * MICRO + F.lit(0.5)) \
        .cast(dec)
    qsa = F.floor(F.sqrt(a.cast("double")) + F.lit(0.5)).cast(dec)
    mega_f = F.lit(float(MICRO))
    mean_diff = _idiv_half_up(s, n).cast("double") / mega_f
    dm = F.when(qsa > 0, _idiv_half_up(s * qsn, qsa).cast("double")
                / mega_f).otherwise(F.lit(None).cast("double"))
    out = agg.select(*keys, n.cast("long").alias("n"),
                     mean_diff.alias("mean_diff"),
                     dm.alias("dm_stat"))
    return out.orderBy(*keys) if keys else out


def dm_test_hac(df: DataFrame, loss_a_col: str, loss_b_col: str,
                order_col: str, group_keys=(),
                max_lag: int = 4) -> DataFrame:
    """Diebold-Mariano test with the Newey-West (HAC) variance — the
    form a forecaster actually needs for h-step forecasts, whose loss
    differentials are serially correlated (lag-0 [dm_test] understates
    the variance there and over-rejects):

        d_t  = loss_a_t − loss_b_t         (ordered by `order_col`)
        γ_k  = (1/n) Σ_t (d_t − d̄)(d_{t−k} − d̄)
        f̂   = γ_0 + 2 Σ_{k=1..L} (1 − k/(L+1)) γ_k   (Bartlett)
        DM   = d̄ / sqrt(f̂ / n)

    Exact integer autocovariances: with e_t = n·qd_t − S (integer —
    the n-cleared centering, so no rational d̄ ever materializes),
    γ_k·n³ = C_k = Σ e_t·e_{t−k}, and clearing Bartlett's k/(L+1)
    denominator gives the integer V' = (L+1)·C_0 + 2·Σ (L+1−k)·C_k
    (≥ 0 — Bartlett makes the quadratic form PSD, and the sums are
    exact).  Then DM = S·n·(L+1) / sqrt(V'·(L+1)) closes with ONE
    sqrt seam: qv = floor(sqrt(V'·(L+1)) + 0.5), DM·1e6 =
    half_up(S·n·(L+1)·1e6, qv) — sign-aware, NULL when V' = 0.
    max_lag = 0 reduces to the lag-0 statistic (V' = C_0 = n·(n·SS −
    S²), algebraically [dm_test]'s form up to its two-seam rounding).

    Plan: TWO group-keyed exchanges over the differential series —
    the (n, S) pre-aggregate broadcast back, then one window pass
    computing all L lags off the SAME sort (one WindowExec) feeding
    the covariance aggregate.  NULL losses are dropped first (a gap
    both shortens the series and shifts adjacency — the documented
    regular-series contract; callers gap-fill upstream).  Duplicate
    `order_col` values break ties by qd for determinism.  Integer
    range: e_t ~ n·qd, so C_k ~ n³·qd² must fit decimal(38,0) —
    fine through n ~ 1e8 at micro losses ~ 1e6.  Returns (keys…, n,
    mean_diff, dm_hac), sorted."""
    if max_lag < 0:
        raise ValueError(f"dm_test_hac: max_lag must be >= 0, "
                         f"got {max_lag}")
    keys = list(group_keys)
    dec = "decimal(38,0)"
    L = int(max_lag)
    qa = _micro(F.col(loss_a_col))
    qb = _micro(F.col(loss_b_col))
    qd = (qa - qb).cast(dec)
    base = (df.select(*keys, F.col(order_col).cast("long").alias("_o"),
                      qd.alias("_qd"))
            .filter(F.col("_qd").isNotNull()))
    g = (base.groupBy(*keys) if keys else base.groupBy()) \
        .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
             F.sum("_qd").alias("_s"))
    if keys:
        joined = base.join(F.broadcast(g), keys)
        w = Window.partitionBy(*keys).orderBy("_o", "_qd")
    else:
        joined = base.crossJoin(F.broadcast(g))
        w = Window.partitionBy().orderBy("_o", "_qd")
    e = (F.col("_n") * F.col("_qd") - F.col("_s")).alias("_e")
    joined = joined.withColumn("_e", e)
    prods = [(F.col("_e") * F.col("_e")).alias("_c0")]
    for k in range(1, L + 1):
        prods.append((F.col("_e") * F.lag("_e", k).over(w))
                     .alias(f"_c{k}"))
    terms = joined.select(*keys, "_n", "_s", *prods)
    aggs = [F.min("_n").alias("_n"), F.min("_s").alias("_s")] + \
        [F.sum(f"_c{k}").alias(f"_c{k}") for k in range(L + 1)]
    agg = (terms.groupBy(*keys) if keys else terms.groupBy()).agg(*aggs)
    lp1 = F.lit(L + 1).cast(dec)
    vp = lp1 * F.coalesce(F.col("_c0"), F.lit(0).cast(dec))
    for k in range(1, L + 1):
        vp = vp + (F.lit(2 * (L + 1 - k)).cast(dec)
                   * F.coalesce(F.col(f"_c{k}"), F.lit(0).cast(dec)))
    qv = F.floor(F.sqrt((vp * lp1).cast("double")) + F.lit(0.5)) \
        .cast(dec)
    mega_f = F.lit(float(MICRO))
    n, s = F.col("_n"), F.col("_s")
    mean_diff = _idiv_half_up(s, n).cast("double") / mega_f
    dm = F.when(qv > 0, _idiv_half_up(
        s * n * lp1 * F.lit(MICRO).cast(dec), qv).cast("double")
        / mega_f).otherwise(F.lit(None).cast("double"))
    out = agg.select(*keys, n.cast("long").alias("n"),
                     mean_diff.alias("mean_diff"),
                     dm.alias("dm_hac"))
    return out.orderBy(*keys) if keys else out


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


def seeps_score(df: DataFrame, fcst_col: str, obs_col: str,
                group_keys, dry_threshold: float,
                wet_split: float) -> DataFrame:
    """SEEPS — Stable Equitable Error in Probability Space (Rodwell,
    Richardson, Hewson & Haiden 2010, QJRMS 136) — THE headline
    deterministic precipitation score at ECMWF, the natural next rung
    of this module's categorical ladder: three categories (dry, light,
    heavy) split at `dry_threshold` and `wet_split`, error-matrix
    entries rational in the CLIMATOLOGICAL dry probability p1 (here the
    per-group sample climatology of the observation column, the
    standard offline form).  `wet_split` should sit at the two-thirds
    quantile of wet-day climatology — the canonical p2 = 2·p3 choice
    the matrix below assumes (its published closed form):

        S(fc,ob) · 2 = | 0                1/(1-p1)    4/(1-p1) |
                       | 1/p1             0           3/(1-p1) |
                       | 1/p1 + 3/(2+p1)  3/(2+p1)    0        |

    SEEPS = mean matrix entry over samples; skill = 1 - SEEPS.  Shape:
    ONE corpus exchange to (keys, fc_cat, ob_cat) counts — NINE cells
    per group, everything downstream cell-bounded; p1 is an exact
    integer ratio evaluated as the mirrored double division, each
    nonzero entry quantized ONCE to integer micro-units per CELL (not
    per row), the final score one exact integer ratio
    (Σ count·entry_micro / n via `_idiv_half_up`).  Groups with
    degenerate climatology (p1 ∈ {0, 1}) return NULL — the score is
    undefined there (ECMWF caps p1 to [0.1, 0.85] operationally; the
    cap is the caller's climatology policy, not this operator's).
    Returns (keys..., n, seeps, skill) sorted by keys."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("seeps_score: need at least one group key")

    def cat(col):
        v = F.col(col).cast("double")
        return (F.when(v < F.lit(float(dry_threshold)), F.lit(1))
                .when(v < F.lit(float(wet_split)), F.lit(2))
                .otherwise(F.lit(3)))

    cells = (df.select(*keys, cat(fcst_col).alias("_f"),
                       cat(obs_col).alias("_o"))
             .groupBy(*keys, "_f", "_o")
             .agg(F.count(F.lit(1)).alias("_c")))
    tot = (cells.groupBy(*keys)
           .agg(F.sum("_c").alias("_n"),
                F.sum(F.when(F.col("_o") == 1, F.col("_c"))
                      .otherwise(F.lit(0))).alias("_dry")))
    j = cells.join(tot, keys)
    # p1 as the mirrored double division of exact integers; every
    # matrix entry is one double tree in p1, quantized once per cell
    p1 = F.col("_dry") / F.col("_n").cast("double")
    half = F.lit(0.5)
    e = (F.when((F.col("_f") == 1) & (F.col("_o") == 2),
                half * (F.lit(1.0) / (F.lit(1.0) - p1)))
         .when((F.col("_f") == 1) & (F.col("_o") == 3),
               half * (F.lit(4.0) / (F.lit(1.0) - p1)))
         .when((F.col("_f") == 2) & (F.col("_o") == 1),
               half * (F.lit(1.0) / p1))
         .when((F.col("_f") == 2) & (F.col("_o") == 3),
               half * (F.lit(3.0) / (F.lit(1.0) - p1)))
         .when((F.col("_f") == 3) & (F.col("_o") == 1),
               half * (F.lit(1.0) / p1
                       + F.lit(3.0) / (F.lit(2.0) + p1)))
         .when((F.col("_f") == 3) & (F.col("_o") == 2),
               half * (F.lit(3.0) / (F.lit(2.0) + p1)))
         .otherwise(F.lit(0.0)))
    # entries are nonnegative: floor(+0.5) is the engine-identical
    # quantization (module _micro discipline, sign branch unneeded)
    em = F.floor(e * F.lit(MICRO) + F.lit(0.5)).cast("long")
    dec = "decimal(38,0)"
    agg = (j.withColumn("_em", em)
           .groupBy(*keys)
           .agg(F.min("_n").alias("n"),
                F.min("_dry").alias("_dry"),
                F.sum((F.col("_c") * F.col("_em")).cast(dec))
                .alias("_s")))
    n = F.col("n").cast(dec)
    mega_f = F.lit(float(MICRO))
    seeps = _idiv_half_up(F.col("_s"), n).cast("double") / mega_f
    ok = (F.col("_dry") > 0) & (F.col("_dry") < F.col("n"))
    return (agg.select(*keys, F.col("n").cast("long").alias("n"),
                       F.when(ok, seeps).alias("seeps"),
                       F.when(ok, F.lit(1.0) - seeps).alias("skill"))
            .orderBy(*keys))


def spiegelhalter_z(df: DataFrame, prob_col: str, outcome_col: str,
                    group_keys=()) -> DataFrame:
    """Spiegelhalter's calibration Z test (Spiegelhalter 1986) — the
    scalar hypothesis-test companion to the Brier/reliability ladder:
    under perfect calibration the Brier score's excess over its
    expectation is asymptotically normal,

        Z = Σ (o_i − p_i)(1 − 2p_i)
            / sqrt( Σ p_i(1 − p_i)(1 − 2p_i)² )

    Probabilities quantize ONCE to micro; numerator and the squared
    denominator are then EXACT integer sums (units 1e12 / 1e24 — the
    module discipline), the denominator takes ONE IEEE sqrt quantized
    to its integer value (the ACC per-factor rule), and Z·1e6 is one
    exact integer ratio.  One group-keyed exchange.  `well_calibrated`
    is |Z| < 1.959964 evaluated on the quantized Z.  Degenerate groups
    (all p ∈ {0,1} → zero denominator) return NULL.  Returns
    (keys..., n, z, well_calibrated) sorted by keys."""
    keys = list(group_keys)
    dec = "decimal(38,0)"
    qp = _micro(F.col(prob_col)).cast(dec)
    o = F.col(outcome_col).cast("int").cast(dec)
    mega = _mega()
    num_t = (o * mega - qp) * (mega - 2 * qp)
    den_t = qp * (mega - qp) * (mega - 2 * qp) * (mega - 2 * qp)
    g = (df.select(*keys, num_t.alias("_nt"), den_t.alias("_dt"))
         .groupBy(*keys)
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("_nt").alias("_num"),
              F.sum("_dt").alias("_d2")))
    # one sqrt seam, quantized to its integer value (units 1e12)
    qs = F.floor(F.sqrt(F.col("_d2").cast("double")) + F.lit(0.5)) \
        .cast(dec)
    zq = F.when(F.col("_d2") > 0,
                _idiv_half_up(F.col("_num") * mega, qs))
    mega_f = F.lit(float(MICRO))
    zv = zq.cast("double") / mega_f
    return (g.select(*keys, F.col("n").cast("long").alias("n"),
                     zv.alias("z"),
                     F.when(F.col("_d2") > 0,
                            F.abs(zq) < F.lit(1959964).cast(dec))
                     .alias("well_calibrated"))
            .orderBy(*keys))


def nse_score(df: DataFrame, sim_col: str, obs_col: str,
              group_keys) -> DataFrame:
    """Nash–Sutcliffe model efficiency per group — THE headline skill
    score of hydrological simulation (Nash & Sutcliffe 1970), the
    number every discharge-model intercomparison reports first:

        NSE = 1 − Σ(s_i − o_i)² / Σ(o_i − ō)²

    (1 = perfect, 0 = no better than the observed mean, < 0 = worse
    than climatology).  Both columns quantize ONCE to integer micros;
    clearing the mean by n gives the all-integer identity

        NSE = (D − N) / D,   N = n·Σ(qs−qo)²,  D = n·Σqo² − (Σqo)²

    so the whole score is ONE exact integer ratio rounded half-up in
    integer space (`_idiv_half_up`) — no double ever rounds, the
    subtract-then-round cancellation hazard (r8-r10 q_covariance
    lesson) cannot occur.  One group-keyed exchange of four
    map-side-combined integer sums; NULL when the observed variance is
    zero (constant obs — NSE undefined).  Returns (keys…, n, nse)
    sorted by keys.  No reference analog; beyond-reference §2.11
    verification family (the reference's GloFAS discharge summaries in
    flood/spark/transforms.py are exactly what a user would feed
    here)."""
    return nse_from_sums(nse_sums(df, sim_col, obs_col, group_keys))


def nse_sums(df: DataFrame, sim_col: str, obs_col: str,
             group_keys) -> DataFrame:
    """State half of [nse_score]: the four order-free integer sums per
    group (n, Σ(qs−qo)², Σqo, Σqo²) — exactly the mergeable-across-
    micro-batches shape the streaming twin aggregates in complete
    mode (integer sums are associative; state is one cell per group
    however long the stream runs)."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("nse_score: need at least one group key")
    dec = "decimal(38,0)"
    qs = _micro(F.col(sim_col)).cast(dec)
    qo = _micro(F.col(obs_col)).cast(dec)
    d = qs - qo
    return (df.select(*keys, d.alias("_d"), qo.alias("_qo"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("_d") * F.col("_d")).alias("_sse"),
                 F.sum("_qo").alias("_so"),
                 F.sum(F.col("_qo") * F.col("_qo")).alias("_soo")))


def nse_from_sums(cells: DataFrame) -> DataFrame:
    """Finisher half of [nse_score], shared VERBATIM by the batch
    operator and the streaming twin (the brier/contingency/mSPRT
    stream-parity recipe): close the n-cleared identity on the
    materialized integer sums."""
    dec = "decimal(38,0)"
    keys = [c for c in cells.columns
            if c not in ("n", "_sse", "_so", "_soo")]
    n_dec = F.col("n").cast(dec)
    den = n_dec * F.col("_soo") - F.col("_so") * F.col("_so")
    num = den - n_dec * F.col("_sse")
    nse = F.when(den > 0,
                 _idiv_half_up(num * _mega(), den).cast("double")
                 / F.lit(float(MICRO)))
    return (cells.select(*keys, F.col("n").cast("long").alias("n"),
                         nse.alias("nse"))
            .orderBy(*keys))


def kge_score(df: DataFrame, sim_col: str, obs_col: str,
              group_keys) -> DataFrame:
    """Kling–Gupta efficiency per group (Gupta et al. 2009) — the
    decomposition-first alternative to [nse_score] that modern
    hydrology papers report alongside it:

        KGE = 1 − sqrt((r−1)² + (α−1)² + (β−1)²)

    with r the Pearson correlation, α = σ_sim/σ_obs the variability
    ratio, β = μ_sim/μ_obs the bias ratio.  Determinism chain: one
    exchange of six integer-micro sums; r/α/β each become exact
    integer micro values — r via the ACC recipe (two n-cleared
    variance integers, ONE IEEE sqrt per factor quantized floor(+0.5)
    BEFORE multiplying), α the ratio of those same two quantized
    sqrts, β the exact ratio Σqs/Σqo — then the Euclidean distance
    squares EXACT integer micros and takes ONE final sqrt seam,
    quantized once.  Five deterministic quantization seams total, each
    mirrored verbatim in the oracle.  Requires Σqo > 0 and positive
    variances (NULL otherwise — degenerate groups have no defined
    KGE).  Returns (keys…, n, r, alpha, beta, kge) sorted by keys."""
    return kge_from_sums(kge_sums(df, sim_col, obs_col, group_keys))


def kge_sums(df: DataFrame, sim_col: str, obs_col: str,
             group_keys) -> DataFrame:
    """State half of [kge_score]: the six order-free integer sums per
    group — the mergeable complete-mode stream state (one DECIMAL cell
    per group), the [nse_sums] recipe widened."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("kge_score: need at least one group key")
    dec = "decimal(38,0)"
    qs = _micro(F.col(sim_col)).cast(dec)
    qo = _micro(F.col(obs_col)).cast(dec)
    return (df.select(*keys, qs.alias("_qs"), qo.alias("_qo"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("_qs").alias("_ss"),
                 F.sum("_qo").alias("_so"),
                 F.sum(F.col("_qs") * F.col("_qs")).alias("_sss"),
                 F.sum(F.col("_qo") * F.col("_qo")).alias("_soo"),
                 F.sum(F.col("_qs") * F.col("_qo")).alias("_sso")))


def kge_from_sums(agg: DataFrame) -> DataFrame:
    """Finisher half of [kge_score], shared VERBATIM by the batch
    operator and the streaming twin: the five quantization seams over
    the materialized integer sums."""
    dec = "decimal(38,0)"
    keys = [c for c in agg.columns
            if c not in ("n", "_ss", "_so", "_sss", "_soo", "_sso")]
    n_dec = F.col("n").cast(dec)
    cov_n = n_dec * F.col("_sso") - F.col("_ss") * F.col("_so")
    var_s = n_dec * F.col("_sss") - F.col("_ss") * F.col("_ss")
    var_o = n_dec * F.col("_soo") - F.col("_so") * F.col("_so")
    qsd_s = F.floor(F.sqrt(var_s.cast("double")) + F.lit(0.5)).cast(dec)
    qsd_o = F.floor(F.sqrt(var_o.cast("double")) + F.lit(0.5)).cast(dec)
    ok = (var_s > 0) & (var_o > 0) & (F.col("_so") > 0)
    rm = _idiv_half_up(cov_n * _mega(), qsd_s * qsd_o)
    am = _idiv_half_up(qsd_s * _mega(), qsd_o)
    bm = _idiv_half_up(F.col("_ss") * _mega(), F.col("_so"))
    mega_d = _mega()
    ed2 = ((rm - mega_d) * (rm - mega_d)
           + (am - mega_d) * (am - mega_d)
           + (bm - mega_d) * (bm - mega_d))
    kge_q = F.lit(MICRO).cast("long") \
        - F.floor(F.sqrt(ed2.cast("double")) + F.lit(0.5))
    mega_f = F.lit(float(MICRO))
    out = agg.select(
        *keys, F.col("n").cast("long").alias("n"),
        F.when(ok, rm.cast("double") / mega_f).alias("r"),
        F.when(ok, am.cast("double") / mega_f).alias("alpha"),
        F.when(ok, bm.cast("double") / mega_f).alias("beta"),
        F.when(ok, kge_q.cast("double") / mega_f).alias("kge"))
    return out.orderBy(*keys)


def error_summary(df: DataFrame, sim_col: str, obs_col: str,
                  group_keys) -> DataFrame:
    """The bread-and-butter deterministic error battery per group —
    the table every verification report opens with, upstream of the
    skill scores ([nse_score], [anomaly_correlation]):

        ME    = Σ(s−o)/n          (bias)
        MAE   = Σ|s−o|/n
        RMSE  = sqrt(Σ(s−o)²/n)
        PBIAS = 100·Σ(s−o)/Σo     (the hydrology calibration target)

    Both series quantize ONCE to integer micros; ME/MAE/PBIAS are
    exact integer ratios, RMSE's mean-square closes in integer space
    first (units micro²) and takes ONE sqrt seam quantized floor(+0.5)
    to micro.  One group-keyed exchange of four map-side-combined
    sums.  PBIAS NULL when Σo ≤ 0.  Returns (keys…, n, me, mae, rmse,
    pbias), sorted."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("error_summary: need at least one group key")
    dec = "decimal(38,0)"
    qs = _micro(F.col(sim_col)).cast(dec)
    qo = _micro(F.col(obs_col)).cast(dec)
    d = qs - qo
    agg = (df.select(*keys, d.alias("_d"), qo.alias("_qo"))
           .groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("_d").alias("_sd"),
                F.sum(F.abs(F.col("_d"))).alias("_sa"),
                F.sum(F.col("_d") * F.col("_d")).alias("_sq"),
                F.sum("_qo").alias("_so")))
    n_dec = F.col("n").cast(dec)
    mega_f = F.lit(float(MICRO))
    me = _idiv_half_up(F.col("_sd"), n_dec)
    mae = _idiv_half_up(F.col("_sa"), n_dec)
    msq = _idiv_half_up(F.col("_sq"), n_dec)
    rmse = F.floor(F.sqrt(msq.cast("double")) + F.lit(0.5))
    pbias = F.when(
        F.col("_so") > 0,
        _idiv_half_up(F.lit(100).cast(dec) * F.col("_sd") * _mega(),
                      F.greatest(F.col("_so"), F.lit(1).cast(dec)))
        .cast("double") / mega_f)
    return (agg.select(*keys, F.col("n").cast("long").alias("n"),
                       (me.cast("double") / mega_f).alias("me"),
                       (mae.cast("double") / mega_f).alias("mae"),
                       (rmse.cast("double") / mega_f).alias("rmse"),
                       pbias.alias("pbias"))
            .orderBy(*keys))


def persistence_skill(df: DataFrame, sim_col: str, obs_col: str,
                      order_col: str, group_keys) -> DataFrame:
    """Skill against the persistence (no-change) benchmark per group —
    the honesty check every operational flood forecast must pass
    (beating 'tomorrow equals today' is the bar; [nse_score] is the
    same construction with climatology as the reference):

        SS_p = 1 − Σ(s_t − o_t)² / Σ(o_t − o_{t−1})²
        U2   = sqrt(Σ(s_t−o_t)² / Σ(o_t−o_{t−1})²)   (Theil)

    both evaluated over t ≥ 2 (rows with no predecessor drop from
    BOTH sums — the aligned convention).  Quantized micros make the
    two sums exact integers; SS_p closes as ONE integer ratio (zero
    seams) and U2 takes one sqrt seam on the exact micro ratio.  One
    lag window on the group-keyed sort exchange + one aggregate.
    Returns (keys…, n, ss_persist, theils_u2), sorted; NULL when the
    persistence error is zero (constant obs — no benchmark exists).
    Duplicate order values tiebreak on the quantized obs."""
    keys = list(group_keys)
    if not keys:
        raise ValueError("persistence_skill: need at least one "
                         "group key")
    dec = "decimal(38,0)"
    qs = _micro(F.col(sim_col))
    qo = _micro(F.col(obs_col))
    src = df.select(*keys, F.col(order_col).cast("long").alias("_o"),
                    qs.alias("_qs"), qo.alias("_qo"))
    w = Window.partitionBy(*keys).orderBy("_o", "_qo")
    lagged = src.withColumn("_qp", F.lag("_qo", 1).over(w)) \
        .filter(F.col("_qp").isNotNull())
    d = (F.col("_qs") - F.col("_qo")).cast(dec)
    p = (F.col("_qo") - F.col("_qp")).cast(dec)
    agg = (lagged.groupBy(*keys)
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(d * d).alias("_sd"),
                F.sum(p * p).alias("_sp")))
    ok = F.col("_sp") > 0
    ratio_q = _idiv_half_up(F.col("_sd") * _mega(),
                            F.greatest(F.col("_sp"),
                                       F.lit(1).cast(dec)))
    mega_f = F.lit(float(MICRO))
    ss = F.when(ok, (F.lit(MICRO).cast(dec) - ratio_q)
                .cast("double") / mega_f)
    u2 = F.when(ok, F.floor(
        F.sqrt(ratio_q.cast("double") / mega_f) * F.lit(1e6)
        + F.lit(0.5)).cast("double") / mega_f)
    return (agg.select(*keys, "n", ss.alias("ss_persist"),
                       u2.alias("theils_u2"))
            .orderBy(*keys))


def fss(df: DataFrame, i_col: str, j_col: str, fcst_col: str,
        obs_col: str, group_keys=(), radius: int = 1) -> DataFrame:
    """Fractions Skill Score (Roberts & Lean 2008) — THE neighborhood
    spatial-verification score for gridded exceedance fields, built
    for exactly the double-penalty problem flood maps have (a forecast
    flooding the right reach one cell off scores zero pointwise but
    near-perfect at neighborhood scale):

        Pf(c) = mean of the binary forecast over the (2r+1)² box at c
        Po(c) = same for the observed field
        FSS   = 1 − Σ(Pf−Po)² / (ΣPf² + ΣPo²)

    over all grid cells c of each group.  Inputs are one row per grid
    cell with integer coordinates (`i_col`, `j_col`) — UNIQUE per
    group — and 0/1 fields; cells absent from the frame are absent
    from every neighborhood (document-your-grid semantics: pass the
    dense grid).  Neighborhood box sums come from the classic
    separable two-pass: a RANGE window over j within each i-row, then
    a RANGE window over i within each j-column — O(cells) total work
    independent of r, never an r²-way self-join.  Each box divides by
    its ACTUAL member count (edge boxes are smaller — the standard
    zero-padding-free treatment).

    Exactness: counts and sums are integers end-to-end; Pf/Po close
    as exact integer-micro ratios; the three score sums are exact
    integer sums of micro² products (decimal), and FSS is ONE
    `_idiv_half_up`.  ZERO double seams.

    Scale posture: exchange on (keys, i), exchange on (keys, j), then
    one group aggregate — three bounded shuffles of the grid relation,
    no join.  Returns (keys…, n_cells, fss), sorted; a group with
    both fields identically zero has undefined FSS (NULL)."""
    keys = list(group_keys)
    r = int(radius)
    if r < 1:
        raise ValueError(f"fss: radius must be >= 1, got {r}")
    dec = "decimal(38,0)"
    b = df.select(*keys,
                  F.col(i_col).cast("long").alias("_i"),
                  F.col(j_col).cast("long").alias("_j"),
                  F.col(fcst_col).cast("long").alias("_f"),
                  F.col(obs_col).cast("long").alias("_o"))
    w1 = (Window.partitionBy(*keys, "_i").orderBy("_j")
          .rangeBetween(-r, r))
    rowp = b.select(
        *keys, "_i", "_j",
        F.sum("_f").over(w1).alias("_sf1"),
        F.sum("_o").over(w1).alias("_so1"),
        F.count(F.lit(1)).over(w1).alias("_c1"))
    w2 = (Window.partitionBy(*keys, "_j").orderBy("_i")
          .rangeBetween(-r, r))
    boxp = rowp.select(
        *keys, "_i", "_j",
        F.sum("_sf1").over(w2).alias("_sf"),
        F.sum("_so1").over(w2).alias("_so"),
        F.sum("_c1").over(w2).alias("_c"))
    pf = _idiv_half_up(F.col("_sf").cast(dec) * _mega(),
                       F.col("_c").cast(dec))
    po = _idiv_half_up(F.col("_so").cast(dec) * _mega(),
                       F.col("_c").cast(dec))
    frac = boxp.select(*keys, pf.alias("_pf"), po.alias("_po"))
    d = F.col("_pf").cast(dec) - F.col("_po").cast(dec)
    agg = (frac.groupBy(*keys)
           .agg(F.count(F.lit(1)).cast("long").alias("n_cells"),
                F.sum(d * d).alias("_num"),
                F.sum(F.col("_pf").cast(dec) * F.col("_pf").cast(dec)
                      + F.col("_po").cast(dec)
                      * F.col("_po").cast(dec)).alias("_den")))
    mega_f = F.lit(float(MICRO))
    fss_q = F.when(
        F.col("_den") > 0,
        F.lit(MICRO).cast(dec)
        - _idiv_half_up(F.col("_num") * _mega(), F.col("_den")))
    return (agg.select(
        *keys, "n_cells",
        (fss_q.cast("double") / mega_f).alias("fss"))
        .orderBy(*keys))


def rps_score(df: DataFrame, value_col: str, obs_col: str,
              group_keys, instance_keys, thresholds) -> DataFrame:
    """Ranked Probability Score for ensemble forecasts against K+1
    ordered categories defined by K thresholds (Epstein 1969; Murphy
    1971 — the multi-category generalization of the Brier score, and
    the score operational flood centers quote for severity-band
    forecasts):

        RPS = (1/K) Σ_{k=1..K} (CDFf_k − CDFo_k)²
        CDFf_k = (members ≤ t_k)/m,   CDFo_k = 1[obs ≤ t_k]

    per forecast instance (typically cell × valid-time; one row per
    ensemble member, the observation constant within the instance —
    taken as min() for determinism, the A2 convention), then averaged
    over each group's instances:  RPS_group = Σ RPS_inst / n_inst.

    Exactness: the K thresholds fold into K CONDITIONAL-SUM COLUMNS
    of one instance aggregate — no explode, no K× row amplification,
    no per-k shuffle (the column dimension is free; the row dimension
    costs an exchange); CDFf_k closes as an exact integer-micro
    ratio; the per-instance sum of squared micro differences is a
    K-term projection divided by K·1e6 in ONE `_idiv_half_up`, and
    the group mean is one more.  ZERO double seams.

    Scale posture: exchange on (keys, instance) of K-bounded partial
    sums, then a group-keyed aggregate — two bounded shuffles.
    Returns (keys…, n_inst, rps), sorted."""
    cells = rps_cells(df, value_col, obs_col, group_keys,
                      instance_keys, thresholds)
    return rps_from_cells(cells, group_keys)


def rps_cells(df: DataFrame, value_col: str, obs_col: str,
              group_keys, instance_keys, thresholds) -> DataFrame:
    """State half of [rps_score]: the per-instance conditional sums
    (m, le_k, ole_k per threshold) — count/sum/min are all mergeable
    across micro-batches, so this IS the complete-mode streaming
    aggregate (state = one K-bounded cell per forecast instance)."""
    keys = list(group_keys)
    inst = list(instance_keys)
    thr = [float(t) for t in thresholds]
    if not inst:
        raise ValueError("rps_score: need at least one instance key")
    if len(thr) < 1:
        raise ValueError("rps_score: need at least one threshold")
    if sorted(thr) != thr:
        raise ValueError("rps_score: thresholds must be ascending")
    rows = df.select(*keys, *inst,
                     F.col(value_col).cast("double").alias("_v"),
                     F.col(obs_col).cast("double").alias("_obs"))
    aggs = [F.count(F.lit(1)).alias("_m")]
    for i, t in enumerate(thr):
        aggs.append(F.sum(F.when(F.col("_v") <= F.lit(t), 1)
                          .otherwise(0)).alias(f"_le{i}"))
        aggs.append(F.min(F.when(F.col("_obs") <= F.lit(t), 1)
                          .otherwise(0)).alias(f"_ole{i}"))
    return rows.groupBy(*keys, *inst).agg(*aggs)


def rps_from_cells(cells: DataFrame, group_keys) -> DataFrame:
    """Finisher half of [rps_score], shared VERBATIM by the batch
    operator and the streaming twin (the nse/kge stream-parity
    recipe): per-instance CDF differences, the K-term squared fold,
    and the group mean — K inferred from the cells' `_le{i}`
    columns."""
    keys = list(group_keys)
    dec = "decimal(38,0)"
    k_n = sum(1 for c in cells.columns if c.startswith("_le"))
    if k_n < 1:
        raise ValueError("rps_from_cells: no _le threshold columns")
    s2 = None
    for i in range(k_n):
        cf = _idiv_half_up(F.col(f"_le{i}").cast(dec) * _mega(),
                           F.col("_m").cast(dec))
        co = F.col(f"_ole{i}").cast(dec) * _mega()
        d = cf - co
        s2 = d * d if s2 is None else s2 + d * d
    rps_inst = _idiv_half_up(s2, F.lit(k_n).cast(dec) * _mega())
    agg = (cells.select(*keys, rps_inst.alias("_rq"))
           .groupBy(*keys)
           .agg(F.count(F.lit(1)).cast("long").alias("n_inst"),
                F.sum(F.col("_rq").cast(dec)).alias("_sr")))
    mega_f = F.lit(float(MICRO))
    rps_g = _idiv_half_up(F.col("_sr"),
                          F.col("n_inst").cast(dec))
    return (agg.select(*keys, "n_inst",
                       (rps_g.cast("double") / mega_f).alias("rps"))
            .orderBy(*keys))


def brier_skill_from_cells(cells: DataFrame) -> DataFrame:
    """Brier Skill Score against the sample-climatology reference
    (Murphy 1973: BS_clim = ō(1−ō) = the decomposition's UNC term —
    the zero-skill baseline operational centers quote 'skill' against):

        BSS = 1 − BS/UNC     ( = (RES − REL)/UNC up to rounding)

    computed on the QUANTIZED integer-micro BS and UNC of
    [brier_from_cells]'s chain (one more exact `_idiv_half_up` on the
    already-quantized terms — a documented quantized-seam composition,
    so the oracle restates the identical integers).  Returns ONE row
    (brier, uncertainty, bss); UNC = 0 (degenerate all-same-outcome
    sample) reports NULL bss."""
    dec = "decimal(38,0)"
    tot = cells.agg(F.sum("_n").alias("n"), F.sum("_so").alias("so"),
                    F.sum("_spp").alias("spp"),
                    F.sum("_spo").alias("spo"))
    n, so = F.col("n"), F.col("so")
    two = F.lit(2).cast(dec)
    bs_num = F.col("spp") - two * _mega() * F.col("spo") \
        + _mega() * _mega() * so
    bs_q = _idiv_half_up(bs_num, n * _mega())
    unc_q = _idiv_half_up(so * (n - so) * _mega(), n * n)
    bss_q = F.when(unc_q > 0, _idiv_half_up(
        (unc_q - bs_q) * _mega(),
        F.when(unc_q != 0, unc_q).otherwise(F.lit(1).cast(dec))))
    mega_f = F.lit(float(MICRO))
    return tot.select(
        (bs_q.cast("double") / mega_f).alias("brier"),
        (unc_q.cast("double") / mega_f).alias("uncertainty"),
        (bss_q.cast("double") / mega_f).alias("bss"))


# ------------------------------------------------------------------ ROC

def roc_counts(df: DataFrame, prob_col: str, outcome_col: str,
               keys=(), n_bins: int | None = None) -> DataFrame:
    """The ONE corpus-sized pass behind `roc_curve` / `roc_auc`: per
    (keys…, distinct threshold) cumulative hit/false-alarm counts.

    Thresholds are the distinct forecast probabilities (each candidate
    decision rule "warn when p >= t"); `n_bins` snaps probabilities to
    the grid i/n_bins FIRST (floor(p·n_bins + 0.5)/n_bins — the WMO
    binned-ROC convention), bounding the relation to n_bins+1 rows per
    group regardless of corpus size — the 100-TB path for continuous
    scores, where exact mode would make this relation corpus-sized.

    NULL probabilities or outcomes are dropped (they belong to no
    decision rule — the r15 flow_percentile_class lesson; the oracles
    mirror the filter).  One groupBy to (keys, threshold) integer
    cells, then one window per group accumulates:
      tp = positives with p >= t, fp = negatives with p >= t,
      pos/neg = the group totals (same Exchange, no join).
    All counts decimal(38,0) so downstream products (the AUC trapezoid
    cross-terms) never overflow."""
    return roc_counts_from_cells(
        roc_cells(df, prob_col, outcome_col, keys, n_bins), keys)


def roc_cells(df: DataFrame, prob_col: str, outcome_col: str,
              keys=(), n_bins: int | None = None) -> DataFrame:
    """The corpus-sized pass of the ROC chain split out for the
    streaming twin: per (keys…, threshold) positive/negative counts —
    a complete-mode-aggregable state of at most (distinct
    probabilities) cells per group (n_bins+1 when binned), mergeable
    because sums are."""
    dec = "decimal(38,0)"
    keys = list(keys)
    p = F.col(prob_col).cast("double")
    if n_bins is not None:
        if n_bins < 1:
            raise ValueError(f"n_bins must be >= 1, got {n_bins}")
        p = F.floor(p * F.lit(float(n_bins)) + F.lit(0.5)) \
            / F.lit(float(n_bins))
    src = (df.filter(F.col(prob_col).isNotNull()
                     & F.col(outcome_col).isNotNull())
           .select(*keys, p.alias("_p"),
                   F.col(outcome_col).cast("int").alias("_o")))
    return (src.groupBy(*keys, "_p")
            .agg(F.sum("_o").cast(dec).alias("_tpv"),
                 F.sum(1 - F.col("_o")).cast(dec).alias("_fpv")))


def roc_counts_from_cells(cells: DataFrame, keys=()) -> DataFrame:
    """Finish the cumulative (TP, FP) relation from materialized
    threshold cells — shared verbatim by the batch and streamed
    paths."""
    keys = list(keys)
    # keyless mode partitions the window by a constant: the relation is
    # threshold-bounded (distinct probabilities; n_bins+1 when binned),
    # so the single partition holds a bounded curve, never the corpus
    part = keys if keys else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(F.desc("_p")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(*part)
    return cells.select(
        *keys, F.col("_p").alias("threshold"),
        F.sum("_tpv").over(w).alias("_tp"),
        F.sum("_fpv").over(w).alias("_fp"),
        F.sum("_tpv").over(wall).alias("_pos"),
        F.sum("_fpv").over(wall).alias("_neg"))


def roc_curve(df: DataFrame, prob_col: str, outcome_col: str,
              keys=(), n_bins: int | None = None) -> DataFrame:
    """Relative Operating Characteristic curve of a probability
    forecast against a binary outcome (Mason 1982; the WMO-standard
    verification for GloFAS-style exceedance warnings): one point per
    candidate decision threshold t — warn when p >= t — carrying the
    2x2 counts at t and

        POD(t)  = hits / positives          (probability of detection)
        POFD(t) = false_alarms / negatives  (probability of false
                                             detection)

    so the curve runs from strict thresholds (lower-left) to
    warn-always (1,1).  Exactness: integer cumulative counts, POD/POFD
    as exact integer micro-ratios (`_idiv_half_up`), NULL when the
    group has no positives / no negatives.  Scale: one bounded
    exchange to the threshold cells + one group window over the
    threshold-bounded curve relation (`roc_counts`).

    Returns (keys…, threshold, hits, false_alarms, misses,
    correct_negatives, pod, pofd), sorted by keys then threshold
    descending — the natural curve-tracing order."""
    return roc_curve_from_counts(
        roc_counts(df, prob_col, outcome_col, keys, n_bins), keys)


def roc_curve_from_counts(cnt: DataFrame, keys=()) -> DataFrame:
    """Finish the curve points from the materialized cumulative
    relation — shared verbatim by the batch and streamed paths."""
    keys = list(keys)
    tp, fp = F.col("_tp"), F.col("_fp")
    pos, neg = F.col("_pos"), F.col("_neg")
    mega_f = F.lit(float(MICRO))

    def ratio(num, den):
        return F.when(den > 0, _idiv_half_up(num * _mega(), den)
                      .cast("double") / mega_f) \
            .otherwise(F.lit(None).cast("double"))

    return (cnt.select(
        *keys, "threshold",
        tp.cast("long").alias("hits"),
        fp.cast("long").alias("false_alarms"),
        (pos - tp).cast("long").alias("misses"),
        (neg - fp).cast("long").alias("correct_negatives"),
        ratio(tp, pos).alias("pod"),
        ratio(fp, neg).alias("pofd"))
        .orderBy(*keys, F.desc("threshold")))


def roc_auc(df: DataFrame, prob_col: str, outcome_col: str,
            keys=(), n_bins: int | None = None) -> DataFrame:
    """Area under the ROC curve by exact trapezoid integration over
    the threshold points of `roc_curve` (equivalently the
    Mann-Whitney U form AUC = (U + ties/2) / (pos·neg) — the tie-aware
    probability that a random positive outscores a random negative;
    the equivalence is pinned in tests):

        2·pos·neg·AUC = Σ_i (FP_i − FP_{i−1}) · (TP_i + TP_{i−1})

    with (FP_0, TP_0) = (0, 0) and the final cumulative point at
    (neg, pos) — an EXACT integer, closed by one `_idiv_half_up` into
    micro units.  AUC is NULL when a group lacks positives or
    negatives (no ranking is defined).  Same bounded plan as
    `roc_curve` plus one lag over the curve window and one group
    aggregate.

    Returns (keys…, n, positives, negatives, auc), sorted."""
    return roc_auc_from_counts(
        roc_counts(df, prob_col, outcome_col, keys, n_bins), keys)


def roc_auc_from_counts(cnt: DataFrame, keys=()) -> DataFrame:
    """Finish the AUC trapezoid from the materialized cumulative
    relation — shared verbatim by the batch and streamed paths."""
    dec = "decimal(38,0)"
    keys = list(keys)
    part = keys if keys else [F.lit(0)]
    wlag = Window.partitionBy(*part).orderBy(F.desc("threshold"))
    zero = F.lit(0).cast(dec)
    prev_tp = F.coalesce(F.lag("_tp").over(wlag), zero)
    prev_fp = F.coalesce(F.lag("_fp").over(wlag), zero)
    seg = cnt.select(
        *keys, "_pos", "_neg",
        ((F.col("_fp") - prev_fp) * (F.col("_tp") + prev_tp))
        .alias("_seg"))
    agg = seg.groupBy(*keys).agg(
        F.sum("_seg").alias("_num"),
        F.min("_pos").alias("_pos"), F.min("_neg").alias("_neg"))
    pos, neg = F.col("_pos"), F.col("_neg")
    two = F.lit(2).cast(dec)
    auc_q = F.when((pos > 0) & (neg > 0),
                   _idiv_half_up(F.col("_num") * _mega(),
                                 two * pos * neg))
    mega_f = F.lit(float(MICRO))
    out = agg.select(
        *keys, (pos + neg).cast("long").alias("n"),
        pos.cast("long").alias("positives"),
        neg.cast("long").alias("negatives"),
        (auc_q.cast("double") / mega_f).alias("auc"))
    return out.orderBy(*keys) if keys else out

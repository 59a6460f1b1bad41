"""Channel flood routing — the Muskingum method (McCarthy 1938; Chow
§8), the textbook storage-routing recurrence every hydrological model
chain runs between a reach's inflow and outflow hydrographs:

    O_t = C0·I_t + C1·I_{t−1} + C2·O_{t−1}

    C0 = (Δt − 2Kx) / D,  C1 = (Δt + 2Kx) / D,
    C2 = (2K(1−x) − Δt) / D,   D = 2K(1−x) + Δt    (C0+C1+C2 = 1)

This is the package's documented CUSTOM-STATEFUL seam: a first-order
linear recurrence over time is exactly what relational algebra cannot
express without a sequential scan, so the operator runs
`applyInPandas` per reach — series-BOUNDED state (one hydrograph in
memory per task, reaches partition freely across executors), the same
posture as the codec/raster mapInPandas seams.  Determinism: the
coefficients are python doubles computed ONCE driver-side (repr
literals in the oracle), and the recurrence body is the same
left-associated IEEE tree `(C0·I + C1·Ip) + C2·Op` in numpy and in the
DuckDB recursive CTE — bit-identical outputs with NO rounding seam at
all, which is why the gate can hash raw doubles.

No reference analog; beyond-reference inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def muskingum_coefficients(k: float, x: float, dt: float) -> tuple:
    """(C0, C1, C2) for storage constant K, weighting x, step Δt (same
    time units).  Raises unless 2Kx ≤ Δt ≤ 2K(1−x) — the standard
    positivity/stability window (all three coefficients non-negative;
    outside it the recurrence oscillates and loses mass positivity)."""
    k, x, dt = float(k), float(x), float(dt)
    if not (0.0 <= x <= 0.5):
        raise ValueError(f"muskingum: x must be in [0, 0.5], got {x}")
    d = 2.0 * k * (1.0 - x) + dt
    if d <= 0:
        raise ValueError("muskingum: non-positive denominator")
    if not (2.0 * k * x <= dt <= 2.0 * k * (1.0 - x)):
        raise ValueError(
            f"muskingum: stability window violated — need "
            f"2Kx <= dt <= 2K(1-x), got K={k}, x={x}, dt={dt}")
    c0 = (dt - 2.0 * k * x) / d
    c1 = (dt + 2.0 * k * x) / d
    c2 = (2.0 * k * (1.0 - x) - dt) / d
    return c0, c1, c2


def muskingum_route(df: DataFrame, inflow_col: str, order_col: str,
                    group_keys, k: float, x: float,
                    dt: float) -> DataFrame:
    """Route each group's inflow hydrograph through the Muskingum
    recurrence (module docstring).  The first step takes O_1 = I_1
    (steady-state initialization, the common operational convention).
    Rows order by (`order_col`, inflow) within the reach — the
    secondary key makes duplicate timestamps deterministic.  Returns
    (keys…, t, inflow, outflow) with `order_col` surfaced as `t`,
    sorted."""
    import pandas as pd

    keys = list(group_keys)
    if not keys:
        raise ValueError("muskingum_route: need at least one group key")
    c0, c1, c2 = muskingum_coefficients(k, x, dt)
    src = df.select(*keys, F.col(order_col).alias("t"),
                    F.col(inflow_col).cast("double").alias("inflow"))
    fields = ", ".join(
        f"{name} {dtype}" for name, dtype in src.dtypes
        if name not in ("t", "inflow"))
    t_type = dict(src.dtypes)["t"]
    schema = f"{fields}, t {t_type}, inflow double, outflow double"

    def route(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["t", "inflow"], kind="mergesort") \
            .reset_index(drop=True)
        i = pdf["inflow"].to_numpy()
        o = i.copy()
        # the EXACT IEEE tree of the oracle's recursive CTE:
        # (C0*I + C1*Ip) + C2*Op, left-associated
        for j in range(1, len(i)):
            o[j] = (c0 * i[j] + c1 * i[j - 1]) + c2 * o[j - 1]
        pdf["outflow"] = o
        return pdf

    return (src.groupBy(*keys).applyInPandas(route, schema)
            .orderBy(*keys, "t"))


def baseflow_separate(df: DataFrame, flow_col: str, order_col: str,
                      group_keys, alpha: float = 0.925) -> DataFrame:
    """Lyne–Hollick digital baseflow filter (Lyne & Hollick 1979;
    Nathan & McMahon 1990's α = 0.925 default) — the standard
    separation of a discharge series into quickflow and baseflow:

        f_t = α·f_{t−1} + ((1+α)/2)·(q_t − q_{t−1})     (f_1 = 0)
        baseflow_t = max(q_t − max(f_t, 0), 0)

    A second, CLAMPED first-order recurrence through the same
    custom-stateful applyInPandas seam as [muskingum_route] — the
    clamp shows the seam handles non-linear recursions too, and the
    oracle remains a recursive CTE over the identical IEEE tree
    (`α·f + β·(q − q_p)`, clamps as greatest()), so raw doubles
    hash-match.  Single forward pass (the multi-pass
    forward/backward/forward refinement is a documented out-of-scope
    policy layer — it is just this operator applied thrice).  Returns
    (keys…, t, flow, baseflow), sorted."""
    import pandas as pd
    import numpy as np

    keys = list(group_keys)
    if not keys:
        raise ValueError("baseflow_separate: need at least one "
                         "group key")
    a = float(alpha)
    if not (0.0 < a < 1.0):
        raise ValueError(f"baseflow_separate: alpha must be in (0, 1),"
                         f" got {a}")
    b = (1.0 + a) / 2.0
    src = df.select(*keys, F.col(order_col).alias("t"),
                    F.col(flow_col).cast("double").alias("flow"))
    fields = ", ".join(
        f"{name} {dtype}" for name, dtype in src.dtypes
        if name not in ("t", "flow"))
    t_type = dict(src.dtypes)["t"]
    schema = f"{fields}, t {t_type}, flow double, baseflow double"

    def sep(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["t", "flow"], kind="mergesort") \
            .reset_index(drop=True)
        q = pdf["flow"].to_numpy()
        f = np.zeros_like(q)
        # the EXACT IEEE tree of the oracle's recursive CTE:
        # a*f_prev + b*(q - q_prev)
        for j in range(1, len(q)):
            f[j] = a * f[j - 1] + b * (q[j] - q[j - 1])
        pdf["baseflow"] = np.maximum(q - np.maximum(f, 0.0), 0.0)
        return pdf

    return (src.groupBy(*keys).applyInPandas(sep, schema)
            .orderBy(*keys, "t"))


def flashiness_index(df: DataFrame, flow_col: str, order_col: str,
                     group_keys) -> DataFrame:
    """Richards-Baker flashiness index per reach (Baker et al. 2004) —
    the hydrograph-shape scalar that separates flash-prone basins from
    baseflow-dominated ones (0 = perfectly damped, → 2 for day-on/
    day-off oscillation):

        RB = Σ_t |q_t − q_{t−1}|  /  Σ_t q_t      (t ≥ 2 numerator)

    Flows quantize ONCE to integer micros, the path length is one lag
    over the group-keyed sort exchange (the POT/drought window class),
    and the index closes as a single exact integer ratio — zero
    seams.  Duplicate order values tiebreak on the quantized flow (the
    path-length sum is then permutation-invariant within ties only up
    to the tie ordering, so feed a keyed series — one row per
    (reach, step) — as the contract states).  Returns (keys…, n, rb),
    sorted; NULL when Σq ≤ 0."""
    from flood_data_spark.datapipe.linalg import _idiv_half_up
    from pyspark.sql import Window

    keys = list(group_keys)
    if not keys:
        raise ValueError("flashiness_index: need at least one "
                         "group key")
    dec = "decimal(38,0)"
    c = F.col(flow_col).cast("double")
    qx = (F.signum(c) * F.floor(F.abs(c) * F.lit(1_000_000)
                                + F.lit(0.5))).cast("long")
    src = df.select(*keys, F.col(order_col).cast("long").alias("_o"),
                    qx.alias("_qx"))
    w = Window.partitionBy(*keys).orderBy("_o", "_qx")
    stepped = src.withColumn(
        "_d", F.abs(F.col("_qx") - F.lag("_qx", 1).over(w)))
    agg = (stepped.groupBy(*keys)
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("_d").cast(dec)).alias("_path"),
                F.sum(F.col("_qx").cast(dec)).alias("_vol")))
    rb = F.when(
        F.col("_vol") > 0,
        _idiv_half_up(F.coalesce(F.col("_path"), F.lit(0).cast(dec))
                      * F.lit(1_000_000).cast(dec),
                      F.greatest(F.col("_vol"), F.lit(1).cast(dec)))
        .cast("double") / F.lit(1e6))
    return (agg.select(*keys, "n", rb.alias("rb"))
            .orderBy(*keys))


def uh_convolve(df: DataFrame, rain_col: str, order_col: str,
                group_keys, ordinates) -> DataFrame:
    """Unit-hydrograph convolution (Sherman 1932; Chow §7 — the
    rainfall-runoff workhorse: direct runoff is the discrete
    convolution of effective rainfall with the basin's unit
    hydrograph):

        Q_t = Σ_{τ=0..L−1} P_{t−τ} · U_τ

    `ordinates` is the L-ordinate unit hydrograph (a small python
    sequence — basin property, not data).  Unlike [muskingum_route]'s
    recurrence this is a FINITE impulse response, so it needs no
    sequential state: each rainfall pulse P_t scatters onto output
    times t..t+L−1 via a literal (τ, U_τ) array explode, and one
    group-keyed aggregate sums the contributions — pure relational
    algebra, zero applyInPandas.

    Exactness: rainfall quantizes ONCE to integer micros; ordinates
    quantize driver-side (the SAME sign/floor arithmetic); each
    product is integer micro², and Q_t closes as ONE `_idiv_half_up`
    over 1e6.  ZERO double seams.

    Scale posture: explode is L-bounded (L ~ 5..20 ordinates), the
    single exchange keys on (group, t) — at 100 TB the rainfall
    corpus moves once, L× amplified, into year×basin-bounded groups.
    The convolution TAIL (t beyond the last rainfall row) is emitted
    — Q covers min(t)..max(t)+L−1, the full runoff recession.
    Returns (keys…, t, runoff), sorted."""
    from flood_data_spark.datapipe.linalg import _idiv_half_up

    keys = list(group_keys)
    if not keys:
        raise ValueError("uh_convolve: need at least one group key")
    ords = [float(u) for u in ordinates]
    if not ords:
        raise ValueError("uh_convolve: need at least one ordinate")
    dec = "decimal(38,0)"

    def qmicro(u: float) -> int:
        import math as _m
        return int(_m.copysign(
            _m.floor(abs(u) * 1_000_000 + 0.5), u))

    uarr = F.array(*[F.struct(F.lit(tau).alias("tau"),
                              F.lit(qmicro(u)).alias("uq"))
                     for tau, u in enumerate(ords)])
    c = F.col(rain_col).cast("double")
    pq = (F.signum(c) * F.floor(F.abs(c) * F.lit(1_000_000)
                                + F.lit(0.5))).cast("long")
    rows = (df.select(*keys,
                      F.col(order_col).cast("long").alias("_t"),
                      pq.alias("_pq"))
            .select(*keys, "_t", "_pq", F.explode(uarr).alias("_u")))
    agg = (rows.groupBy(*keys,
                        (F.col("_t") + F.col("_u.tau")).alias("t"))
           .agg(F.sum(F.col("_pq").cast(dec)
                      * F.col("_u.uq").cast(dec)).alias("_s")))
    runoff = _idiv_half_up(F.col("_s"), F.lit(1_000_000).cast(dec))
    return (agg.select(*keys, "t",
                       (runoff.cast("double") / F.lit(1e6))
                       .alias("runoff"))
            .orderBy(*keys, "t"))


def rating_curve(df: DataFrame, stage_col: str, discharge_col: str,
                 group_keys) -> DataFrame:
    """Stage-discharge rating curve per station — the power law
    Q = a·h^b (Herschy, *Streamflow Measurement*; the transformation
    every gauging network applies to turn measured stage into the
    discharge series all other operators consume), fit by OLS in
    log-log space:

        b    = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²),   x=ln h, y=ln Q
        ln a = (Σy − b·Σx)/n,   r² = (n·Σxy − ΣxΣy)² / (den_x·den_y)

    Rows with non-positive or NULL stage/discharge are excluded (log
    domain).  Determinism: each log quantizes ONCE to signed integer
    micro-nats; the moments are exact decimal sums, b / ln a / r²
    close as exact integer ratios (`_idiv_half_up`), and `a` takes
    ONE exp seam quantized floor(+0.5) — the [zipf_fit] recipe,
    group-keyed and sign-aware.

    Scale posture: one group-keyed aggregate of map-side-combined
    integer moments — the gauge corpus moves once; the fit relation
    is station-bounded.  Returns (keys…, n, b, ln_a, a, r2), sorted;
    groups with n < 2 or a degenerate x spread report NULL fits."""
    from flood_data_spark.datapipe.linalg import _idiv_half_up

    keys = list(group_keys)
    if not keys:
        raise ValueError("rating_curve: need at least one group key")
    dec = "decimal(38,0)"
    MICRO = 1_000_000

    def qln(col):
        v = F.log(col.cast("double"))
        return (F.signum(v) * F.floor(F.abs(v) * MICRO + F.lit(0.5))) \
            .cast(dec)

    src = (df.filter(F.col(stage_col).isNotNull()
                     & F.col(discharge_col).isNotNull()
                     & (F.col(stage_col) > 0)
                     & (F.col(discharge_col) > 0))
           .select(*keys, qln(F.col(stage_col)).alias("_x"),
                   qln(F.col(discharge_col)).alias("_y")))
    m = (src.groupBy(*keys)
         .agg(F.count(F.lit(1)).cast(dec).alias("_n"),
              F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy"),
              F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
              F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
              F.sum(F.col("_x") * F.col("_y")).alias("_sxy")))
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    cov_n = n * F.col("_sxy") - sx * sy
    den_x = n * F.col("_sxx") - sx * sx
    den_y = n * F.col("_syy") - sy * sy
    mega = F.lit(MICRO).cast(dec)
    mega_f = F.lit(float(MICRO))
    ok = (n >= 2) & (den_x != 0)
    # r² via n²-cleared moments: cov_n² · 1e6 would overflow
    # decimal(38,0) at ~60k-row groups (cov_n ~ n²·1e12), so divide
    # the three quadratics by n² FIRST — three documented integer
    # quantization seams (each mirrored verbatim in the oracle), then
    # one exact ratio.  Relative error ~1e-12, far under the micro
    # display scale.
    #
    # r17 (guide §3.3 plan size; the spi_empirical r16 precedent): the
    # seam chain is built through single-element `transform` lambdas so
    # each _idiv_half_up quotient appears in the plan ONCE as a lambda
    # body over a leaf variable.  Splicing the Column objects directly
    # (b_q into la_q, cqn/dxq/dyq into r2_q, each _idiv expanding its
    # arguments ~3-4x) nested the moment expressions geometrically —
    # the optimized plan carried a 52 KB single-line projection and
    # Catalyst + codegen over it dominated the station-bounded fit.
    # Same ops in the same order: bit-identical values.
    n2 = n * n
    one = F.lit(1).cast(dec)
    lvl1 = F.transform(
        F.array(F.struct(cov_n.alias("cov"), den_x.alias("dx"),
                         den_y.alias("dy"))),
        lambda s: F.struct(
            F.when(ok, _idiv_half_up(
                s["cov"] * mega,
                F.when(s["dx"] != 0, s["dx"]).otherwise(one)))
            .alias("bq"),
            _idiv_half_up(s["cov"], n2).alias("cqn"),
            _idiv_half_up(F.when(s["dx"] != 0, s["dx"]).otherwise(one),
                          n2).alias("dxq"),
            _idiv_half_up(F.when(s["dy"] != 0, s["dy"]).otherwise(one),
                          n2).alias("dyq")))
    fit = F.element_at(F.transform(lvl1, lambda t: F.struct(
        t["bq"].alias("bq"),
        F.when(ok, _idiv_half_up(sy * mega - t["bq"] * sx, n * mega))
        .alias("laq"),
        F.when(ok & (den_y > 0) & (t["dxq"] * t["dyq"] != 0),
               _idiv_half_up(t["cqn"] * t["cqn"] * mega,
                             F.when(t["dxq"] * t["dyq"] != 0,
                                    t["dxq"] * t["dyq"]).otherwise(one)))
        .alias("r2q"))), 1)
    out = (m.select(*keys, n.cast("long").alias("n"), fit.alias("_fit"))
           .select(*keys, "n",
                   F.col("_fit.bq").alias("_bq"),
                   F.col("_fit.laq").alias("_laq"),
                   F.col("_fit.r2q").alias("_r2q")))
    a_seam = F.when(
        F.col("_laq").isNotNull(),
        F.floor(F.exp(F.col("_laq").cast("double") / mega_f)
                * F.lit(float(MICRO)) + F.lit(0.5)).cast("long"))
    return (out.select(
        *keys, "n",
        (F.col("_bq").cast("double") / mega_f).alias("b"),
        (F.col("_laq").cast("double") / mega_f).alias("ln_a"),
        (a_seam.cast("double") / mega_f).alias("a"),
        (F.col("_r2q").cast("double") / mega_f).alias("r2"))
        .orderBy(*keys))


def snow_degree_day(df: DataFrame, precip_col: str, temp_col: str,
                    order_col: str, group_keys, ddf: float = 3.0,
                    t_base: float = 0.0) -> DataFrame:
    """Degree-day snowpack model per basin (the temperature-index
    method of HBV/SRM — Hock 2003 review; the standard operational
    alternative to energy-balance models):

        accumulation:  snow falls when T_t ≤ T_base
        avail_t = SWE_{t−1} + P_t·1[T_t ≤ T_base]
        melt_t  = min(avail_t, DDF·max(0, T_t − T_base))
        SWE_t   = avail_t − melt_t
        rain_t  = P_t·1[T_t > T_base]          (liquid bypass)

    A CLAMPED first-order recurrence — the third resident of the
    custom-stateful applyInPandas seam ([muskingum_route] linear,
    [baseflow_separate] clamped linear, this one clamped with a
    regime switch).  The recurrence body walks the EXACT IEEE tree
    of the oracle's recursive CTE (CASE/least/greatest + one multiply
    per step, DDF and T_base as repr literals), so raw doubles
    hash-match with no rounding seam.  Rows order by
    (`order_col`, precip) within the basin — the secondary key pins
    duplicate timestamps.  Scale: one python stage per basin, state =
    one double; basins partition freely.  Returns (keys…, t, precip,
    temp, swe, melt, rain), sorted."""
    import pandas as pd  # noqa: F401 — applyInPandas batch type

    keys = list(group_keys)
    if not keys:
        raise ValueError("snow_degree_day: need at least one "
                         "group key")
    ddf = float(ddf)
    t0 = float(t_base)
    if ddf <= 0:
        raise ValueError(f"snow_degree_day: ddf must be > 0, "
                         f"got {ddf}")
    src = df.select(*keys, F.col(order_col).alias("t"),
                    F.col(precip_col).cast("double").alias("precip"),
                    F.col(temp_col).cast("double").alias("temp"))
    fields = ", ".join(
        f"{name} {dtype}" for name, dtype in src.dtypes
        if name not in ("t", "precip", "temp"))
    t_type = dict(src.dtypes)["t"]
    schema = (f"{fields}, t {t_type}, precip double, temp double, "
              f"swe double, melt double, rain double")

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["t", "precip"], kind="mergesort") \
            .reset_index(drop=True)
        p = pdf["precip"].to_numpy()
        tt = pdf["temp"].to_numpy()
        n = len(p)
        swe = [0.0] * n
        melt = [0.0] * n
        rain = [0.0] * n
        prev = 0.0
        for j in range(n):
            avail = prev + (p[j] if tt[j] <= t0 else 0.0)
            pot = ddf * (tt[j] - t0) if tt[j] > t0 else 0.0
            m = min(avail, pot)
            prev = avail - m
            swe[j] = prev
            melt[j] = m
            rain[j] = p[j] if tt[j] > t0 else 0.0
        pdf["swe"] = swe
        pdf["melt"] = melt
        pdf["rain"] = rain
        return pdf

    return (src.groupBy(*keys).applyInPandas(run, schema)
            .orderBy(*keys, "t"))

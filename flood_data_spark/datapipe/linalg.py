"""Distributed linear algebra over an embedding column — the PCA/whitening
front-end of the ANN ladder (`datapipe/quantize.py` trains better codebooks
on decorrelated inputs, `matryoshka_truncate` keeps more variance when the
leading dimensions are the principal ones).

100 TB rationale: everything here reduces a (n x d) corpus to d- or
d^2-sized relations in ONE pass, so the corpus never moves and never comes
to the driver:

- per-dimension moments (`dim_stats`) are a posexplode + groupBy(pos) —
  partial aggregation combines map-side, the exchange carries d keys;
- the Gram matrix X'X (`gram_matrix`) is computed per-partition as a d x d
  numpy accumulation inside ONE mapInPandas pass (the embedding seam — the
  same Arrow boundary the ADC probe uses), so the shuffle moves
  d*(d+1)/2 cells PER PARTITION, never a row of X;
- the dominant eigenvector (`power_iteration_top`) runs v <- X'(Xv)/|..|
  as Spark jobs: v rides into the executors as a d-sized literal (the
  k-means centroid-literal pattern, clustering.py), each iteration is one
  scan + one d-keyed shuffle, and the driver collects exactly d cells per
  round.

Determinism discipline (the r8 `q_covariance` lesson): a raw double sum
across partitions is NOT a pure function of the data — float addition is
not associative, so a cell whose value sits within ~1 ulp of a 0.5e-6
rounding boundary flips its 6th decimal between partitionings.  Every
corpus-sized sum in this module (dim_stats moments, gram_matrix cells,
covariance means, the power-iteration y/z reductions) therefore
quantizes each embedding component ONCE to integer micro-units (`_q` /
`_q_arr`: sign(x) * floor(|x| * 1e6 + 0.5) as BIGINT — pure double
IEEE-754 arithmetic, verified bit-identical across Spark, DuckDB and
numpy, with no dependence on any engine's decimal-string rounding),
accumulates sums of those integers EXACTLY (int64 inside
`_GRAM_CHUNK`-bounded numpy chunks guarded by `_Q_ABS_MAX`,
DECIMAL(38,0) across partitions — integer addition is order-free, and
Spark's ANSI decimal raises loudly on the ~1e38 envelope instead of
wrapping), and rounds every FINAL value in integer space
(`_idiv_half_up`: half-up of an exact integer ratio via decimal
mod/division, mirrored by HUGEINT `//` in the oracles) — no
`round(double)` ever runs on a derived value, so even
cancellation-amplified quantities (variance, covariance) round
identically in every engine.  The cost is a bounded
input quantization (|err| <= 5e-7 per component, propagated bounds in
each docstring); the payoff is that every output is a deterministic
function of the data — the same convention as the repo-wide micro-unit
aggregates (plans/scale.py `sum_micro`, datapipe/graph.py PageRank
masses).  Driver-side vectors (power-iteration v, Gram-Schmidt) stay
float: they are d-bounded, computed in ONE fixed order, and re-rounded
to 6 decimals every step, which re-synchronizes the sequence exactly.

No reference analog (the reference has no embedding operators); part of
the beyond-reference datapipe inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flood_data_spark.datapipe.similarity import _as_double, _matrix_lit


def _vector_lit(v: list) -> "F.Column":
    """Constant array<double> via one parsed SQL expression (see
    `similarity._matrix_lit` for why not `F.lit`)."""
    return _matrix_lit([v])[0]


#: micro-unit quantization scale shared by every aggregate in this module
#: (and mirrored literally in the DuckDB oracles).
_MICRO = 1_000_000

#: numpy chunk size for the int64 partial-Gram accumulation.  Exactness
#: envelope: a chunk of B rows sums B products of two micro-quantized
#: components, |q| <= 1e6 * max|x|, so the int64 partial stays exact while
#: B * (1e6 * max|x|)^2 < 2^63 — at B=8192 that is max|x| <= 33.  The
#: Gram seam guards this bound at runtime (clear error, not silent
#: wraparound); cross-chunk sums ride DECIMAL(38,0), exact to ~1e38
#: (1e12 rows at max|x|=33 reaches only ~1e27, and Spark's ANSI decimal
#: raises rather than wraps past the envelope).
_GRAM_CHUNK = 8192
_Q_ABS_MAX = 33 * _MICRO


def _q(col) -> "F.Column":
    """double -> BIGINT integer micro-units: sign(x) * floor(|x| * 1e6
    + 0.5).  Written in pure double IEEE-754 primitives (sign, abs,
    floor, multiply, add) so the SAME bits come out of Spark codegen,
    DuckDB and numpy — no reliance on any engine's round() (Spark rounds
    the shortest decimal representation via BigDecimal HALF_UP, DuckDB
    rounds the binary double; they can disagree within 1 ulp of a half
    boundary).  Verified bit-identical across all three engines on
    random + adversarial half-boundary values (tests/test_linalg.py).
    A pure per-value function: quantizing ONCE here is what makes every
    downstream integer sum order-free and hence partition- and
    engine-invariant."""
    return (F.signum(col)
            * F.floor(F.abs(col) * _MICRO + F.lit(0.5))).cast("long")


def _q_arr(col) -> "F.Column":
    """array<float|double> -> array<bigint> micro-units (`_q` per
    component)."""
    return F.transform(_as_double(col), _q)


def _idiv_half_up(num, den) -> "F.Column":
    """Nearest integer of the EXACT ratio num/den, half away from zero,
    computed entirely in DECIMAL integer arithmetic:

        sign(num) * floor((2*|num| + den) / (2*den))

    with the floor realized as the exactly-divisible quotient
    (a - a % b) / b — decimal remainder is exact, so the division has a
    zero fractional part and Spark's scale-6 decimal division cannot
    round it.  No double participates anywhere, so the result is the
    same integer in any engine; the DuckDB oracles state the identical
    expression with HUGEINT `//` (truncating division — identical to
    floor because the numerator is made non-negative first).

    This is the r10 `q_covariance` lesson finished: `F.round(x, 6)` on a
    double that came out of a SUBTRACTION of derived doubles rounds a
    cancellation-amplified value, and Spark (BigDecimal HALF_UP on the
    shortest decimal string) and DuckDB (scaled-double rounding) can
    disagree within 1 ulp of a 0.5e-6 boundary.  When every input is an
    exact integer — as for every aggregate in this module — rounding the
    RATIO in integer space removes the hazard completely.

    `num` and `den` must be exact decimal columns, `den > 0`.  Returns a
    decimal column holding an integer value.
    """
    two = F.lit(2).cast("decimal(38,0)")
    a = two * F.abs(num) + den
    b = two * den
    q = (a - a % b) / b
    return F.when(num < 0, -q).otherwise(q)


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension moments of an array column: (pos, n, mean, variance,
    vmin, vmax), pos 0-based.  One posexplode + one d-keyed groupBy; the
    population variance comes from the same partial-aggregated pass
    (E[x^2] - E[x]^2), so no second scan.  Means/variances feed centering
    and diagonal whitening; min/max feed scalar-quantizer ranges
    (quantize.sq8 uses exactly these bounds — they stay RAW, min/max are
    order-free already).

    Determinism: mean and variance are computed from exact DECIMAL(38,0)
    sums of micro-quantized components (sum q, sum q^2) and rounded to 6
    decimals IN INTEGER SPACE (`_idiv_half_up` — never `round(double)`):

        mean * 1e6     = half_up(s1 / n)
        variance * 1e6 = half_up((s2*n - s1^2) / (n^2 * 1e6))

    The variance form multiplies E[x^2] - E[x]^2 out to ONE exact
    integer ratio, so the cancellation happens between exact integers
    and the half-up decision is engine-independent — the r10
    q_covariance hazard (`round(double)` after subtracting two derived
    doubles) cannot occur.  Quantization error bounds: |mean err| <=
    5e-7 (+5e-7 final round), |variance err| <= 2 * max|x| * 5e-7 +
    ~1e-6.  Overflow envelope: s2*n in DECIMAL(38,0) (never the silent
    int64 product — a long*long square wraps past |x| ~ 3037) stays
    exact to 1e38: 1e10 rows at max|x| = 500 reach only ~1e37, and ANSI
    decimal raises past the envelope.
    """
    x = df.select(F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"))
    qd = _q(F.col("x")).cast("decimal(38,0)")
    agg = (x.groupBy("pos")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(qd).alias("_s1"),
                F.sum(qd * qd).alias("_s2"),
                F.min("x").alias("vmin"),
                F.max("x").alias("vmax")))
    n_dec = F.col("n").cast("decimal(38,0)")
    mean_u = _idiv_half_up(F.col("_s1"), n_dec)
    var_num = F.col("_s2") * n_dec - F.col("_s1") * F.col("_s1")
    var_den = n_dec * n_dec * F.lit(_MICRO).cast("decimal(38,0)")
    var_u = _idiv_half_up(var_num, var_den)
    return agg.select("pos", "n",
                      (mean_u.cast("double")
                       / F.lit(float(_MICRO))).alias("mean"),
                      (var_u.cast("double")
                       / F.lit(float(_MICRO))).alias("variance"),
                      "vmin", "vmax")


def _gram_micro(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact micro²-unit Gram sums: (i, j, qsum DECIMAL(38,0)) for the
    upper triangle of Q'Q where Q is the micro-quantized corpus
    (q = `_q` per component — mirrored bit-for-bit by numpy inside the
    seam).  ONE mapInPandas pass accumulates a dense d x d partial Gram
    per partition — int64-exact inside `_GRAM_CHUNK`-row chunks (the
    `_Q_ABS_MAX` runtime guard keeps B * q_max^2 < 2^63; violation is a
    clear error, never silent wraparound), Python-int exact across
    chunks — and emits the d*(d+1)/2 upper-triangle cells as
    DECIMAL(38,0); a groupBy(i, j) sums partials across partitions
    (order-free integer addition).  The exchange is d^2-bounded per
    partition regardless of corpus size; the corpus itself never
    shuffles and never reaches the driver."""
    def partial_gram(batches):
        import decimal

        import numpy as np
        import pandas as pd
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            q = (np.sign(x) * np.floor(np.abs(x) * _MICRO + 0.5)) \
                .astype(np.int64)
            if q.size and int(np.abs(q).max()) > _Q_ABS_MAX:
                raise ValueError(
                    f"gram_matrix: |component| exceeds the int64 "
                    f"exactness envelope (max|x| <= {_Q_ABS_MAX // _MICRO} "
                    f"at chunk size {_GRAM_CHUNK}) — rescale the "
                    f"embeddings or shrink _GRAM_CHUNK")
            for s in range(0, q.shape[0], _GRAM_CHUNK):
                g = q[s:s + _GRAM_CHUNK].T @ q[s:s + _GRAM_CHUNK]
                acc = g.astype(object) if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = [], []
        for i in range(d):
            for j in range(i, d):
                iu.append(i)
                ju.append(j)
        yield pd.DataFrame({"i": iu, "j": ju,
                            "qsum": [decimal.Decimal(int(v))
                                     for v in acc[iu, ju]]})

    parts = (df.select(_as_double(F.col(vec_col)).alias("_v"))
             .mapInPandas(partial_gram, "i int, j int, qsum decimal(38,0)"))
    return parts.groupBy("i", "j").agg(F.sum("qsum").alias("qsum"))


def gram_matrix(df: DataFrame, vec_col: str = "embedding",
                round_to: int | None = 6) -> DataFrame:
    """Upper triangle of the Gram matrix X'X as (i, j, val) rows, i <= j,
    0-based: val = qsum / 1e12 from the exact integer Gram
    (`_gram_micro`), rounded ONCE to `round_to` decimals (round_to=None
    keeps the unrounded quotient).  For 0 <= round_to <= 12 the rounding
    happens in integer space — val * 10^r = half_up(qsum / 10^(12-r))
    via `_idiv_half_up`, so no double ever rounds; past 12 decimals the
    quotient is already exact, so the raw division is returned.
    Quantization error bound per cell: n_rows * (|x_i| + |x_j|) * 5e-7
    + 2.5e-13 * n_rows.  This is the covariance/PCA front-end:
    cov = gram/n - mean outer mean.
    """
    if round_to is not None and round_to < 0:
        raise ValueError(f"gram_matrix: round_to must be >= 0 or None, "
                         f"got {round_to}")
    g = _gram_micro(df, vec_col)
    if round_to is not None and 0 <= round_to <= 12:
        den = F.lit(10 ** (12 - round_to)).cast("decimal(38,0)")
        val = (_idiv_half_up(g["qsum"], den).cast("double")
               / F.lit(float(10 ** round_to)))
    else:
        # round_to None or > 12: the quotient of an exact integer by a
        # power of ten already carries <= 12 decimals — one correctly-
        # rounded double division, identical everywhere
        val = g["qsum"].cast("double") / F.lit(float(_MICRO) * _MICRO)
    return g.select("i", "j", val.alias("val"))


def covariance_matrix(df: DataFrame, vec_col: str = "embedding",
                      round_to: int = 6) -> DataFrame:
    """Upper triangle of the population covariance as (i, j, val) rows:
    cov[i,j] = gram[i,j]/n - mean_i * mean_j — the whitening/PCA input
    proper (the Gram alone is only correct for pre-centered data).

    Composes the two d-bounded passes: the exact integer Gram
    (`_gram_micro`, d^2-bounded exchange) joined with the d-keyed
    integer mean-sum relation on each index — both joins broadcast (d
    and d^2 rows).  The count rides the mean relation, so no third scan.

    Determinism: every corpus-sized sum is an exact integer (micro² Gram
    sums, micro component sums), and the whole cell is ONE exact integer
    ratio —

        val = (qsum*n - s1_i*s1_j) / (n^2 * 1e12)

    — so the final round-to-6 is done ENTIRELY in integer space:
    val * 1e6 = half_up((qsum*n - s1_i*s1_j) / (n^2 * 1e6)) via
    `_idiv_half_up`, mirrored term-for-term in the q_covariance oracle's
    HUGEINT `//` expression.  No double is ever rounded, so the
    subtract-then-round cancellation hazard that kept q_covariance red
    for three rounds (Spark BigDecimal HALF_UP vs DuckDB scaled-double
    round disagreeing within 1 ulp of a half boundary) is eliminated,
    not just made unlikely.  Quantization error bound per cell: (|x_i|
    + |x_j| + |mean_i| + |mean_j|) * 5e-7 + ~1e-12.  Overflow envelope:
    qsum*n and s1_i*s1_j stay inside DECIMAL(38,0) while n * q_max^2 *
    n <= 1e38 — at max|x| = 33 that is n <= ~3e11 rows, and ANSI
    decimal raises loudly past it.
    """
    gram = _gram_micro(df, vec_col)
    # localCheckpoint: the d-row stats relation feeds BOTH broadcast
    # sides — without it Catalyst replans the corpus-sized explode+
    # groupBy once per side (the multiply-consumed-bounded-relation rule)
    stats = (df.select(F.posexplode(_as_double(F.col(vec_col)))
                       .alias("pos", "x"))
             .groupBy("pos")
             .agg(F.sum(_q(F.col("x")).cast("decimal(38,0)")).alias("s1"),
                  F.count(F.lit(1)).alias("n"))
             .localCheckpoint(eager=False))
    if not 0 <= round_to <= 12:
        raise ValueError(f"covariance_matrix: round_to must be in "
                         f"[0, 12] (micro^2 resolution), got {round_to}")
    mi = stats.select(F.col("pos").alias("i"), F.col("s1").alias("_si"),
                      F.col("n").alias("_n"))
    mj = stats.select(F.col("pos").alias("j"), F.col("s1").alias("_sj"))
    n_dec = F.col("_n").cast("decimal(38,0)")
    num = F.col("qsum") * n_dec - F.col("_si") * F.col("_sj")
    den = n_dec * n_dec * F.lit(10 ** (12 - round_to)).cast("decimal(38,0)")
    val = (_idiv_half_up(num, den).cast("double")
           / F.lit(float(10 ** round_to)))
    return (gram.join(F.broadcast(mi), "i")
            .join(F.broadcast(mj), "j")
            .select("i", "j", val.alias("val")))


def _dot_lit(vec_col, v: list) -> "F.Column":
    """<x, v> for a broadcast d-sized literal v — zip_with + left fold."""
    return F.aggregate(F.zip_with(vec_col, _vector_lit(v),
                                  lambda a, b: a * b),
                       F.lit(0.0), lambda acc, t: acc + t)


def power_iteration_top(df: DataFrame, vec_col: str = "embedding",
                        iterations: int = 3) -> tuple:
    """Dominant eigenvector of X'X by power iteration; returns
    (components, sigma2) — a d-list (each component rounded to 6 decimals)
    and the Rayleigh quotient v'X'Xv = |Xv|^2 (the top eigenvalue
    estimate, i.e. squared spectral norm of X along v).

    v0 is the deterministic uniform unit vector round(1/sqrt(d), 6).  Each
    iteration is ONE distributed job: y = <q, mv> rides the row as an
    EXACT integer fold (micro-quantized components against the
    micro-integer v literal — no join, no float drift), z = Q'y comes
    from posexplode → groupBy(pos) as exact DECIMAL(38,0) sums (d-keyed
    shuffle, partial-aggregated map-side), and the driver collects
    exactly d integers, descales, normalizes, and rounds to 6 decimals —
    integer sums + per-step rounding make the sequence bit-identical
    across engines AND partitionings, so the whole iteration unrolls in
    ANSI SQL (q_power_iteration's oracle).

    Sign convention: none imposed — the sign is pinned by v0 and the
    iteration count, identically in any compliant engine.
    """
    if iterations < 1:
        raise ValueError("power_iteration_top: iterations must be >= 1")
    base = df.select(_as_double(F.col(vec_col)).alias("_v"))
    first = base.select(F.size("_v").alias("d")).first()
    if first is None:
        raise ValueError("power_iteration_top: empty input")
    d = first.d
    v = [round(1.0 / d ** 0.5, 6)] * d
    sigma2 = 0.0
    for _ in range(iterations):
        z = _xtx_apply(base, v, d)
        # |Xv|^2 = v'X'Xv = <v, z>: the Rayleigh numerator for THIS v
        sigma2 = sum(a * b for a, b in zip(v, z))
        nrm = sum(t * t for t in z) ** 0.5
        if nrm == 0.0:
            raise ValueError("power_iteration_top: X'Xv vanished — rank-0 "
                             "input or v orthogonal to the column space")
        v = [round(t / nrm, 6) for t in z]
    return v, sigma2


def _xtx_apply(base: DataFrame, v: list, d: int) -> list:
    """ONE distributed job computing z = X'(Xv) in exact integer
    arithmetic: the row quantizes once (q = `_q_arr`), y = <q, mv>
    rides the row as an int64 fold against the micro-integer v literal
    (|y| <= d * q_max * 2e6 — int64-safe to d ~ 1e5 under the
    `_Q_ABS_MAX` envelope), then posexplode → groupBy(pos) sums y*q in
    DECIMAL(38,0) (the per-term product is cast to decimal BEFORE
    multiplying — y*q can reach ~1e21, past int64) — the d-keyed
    exchange; the driver collects exactly d integers and descales by
    1e18 (micro^3: q 1e6 × mv 1e6 × q 1e6).  Order-free by
    construction; mirrored term-for-term in the q_power_iteration
    oracle's HUGEINT CTEs.  Shared by the single- and top-k power
    iterations so any kernel change lands in both."""
    from flood_data_spark.datapipe.similarity import _int_array_lit

    mv = [int(round(t * _MICRO)) for t in v]
    qv = _q_arr(F.col("_v"))
    y = F.aggregate(F.zip_with(qv, _int_array_lit(mv), lambda a, b: a * b),
                    F.lit(0).cast("long"), lambda acc, t: acc + t)
    cells = (base.select(y.alias("_y"), qv.alias("_q"))
             .select("_y", F.posexplode("_q").alias("pos", "q"))
             .groupBy("pos")
             .agg(F.sum(F.col("_y").cast("decimal(38,0)")
                        * F.col("q").cast("decimal(38,0)")).alias("z"))
             .collect())
    z = [0.0] * d
    scale = float(_MICRO) ** 3
    for r in cells:
        # float(decimal) then one double division — the same two
        # correctly-rounded steps as the oracle's CAST(z AS DOUBLE)/1e18
        z[r.pos] = float(r.z) / scale
    return z


def power_iteration_topk(df: DataFrame, k: int,
                         vec_col: str = "embedding",
                         iterations: int = 8) -> tuple:
    """Top-k eigenvectors of X'X by deflated power iteration: component
    m is found by the `power_iteration_top` recurrence with a
    Gram-Schmidt re-orthogonalization against components 0..m-1 after
    every update (all driver-side on d-sized vectors).  Returns
    (components, sigma2s) — a k x d nested list (rows rounded to 6
    decimals) and the per-component Rayleigh quotients.

    Distributed cost is exactly k runs of the single-component loop
    (one scan + one d-keyed shuffle per iteration); the deflation math
    touches only k*d driver-side doubles.  This is the whole PCA fit for
    the quantizer front-end: `covariance_matrix` diagnostics,
    `power_iteration_topk` for the axes, `project_components` to apply
    them.  k must stay small (k << d — the FAISS OPQ regime); for full
    spectra use a single-machine eigensolver on the d x d covariance
    (which `gram_matrix` already reduces to driver scale).
    """
    if k < 1:
        raise ValueError("power_iteration_topk: k must be >= 1")
    if iterations < 1:
        raise ValueError("power_iteration_topk: iterations must be >= 1")
    base = df.select(_as_double(F.col(vec_col)).alias("_v"))
    first = base.select(F.size("_v").alias("d")).first()
    if first is None:
        raise ValueError("power_iteration_topk: empty input")
    d = first.d
    if k > d:
        raise ValueError(f"power_iteration_topk: k={k} exceeds dim {d}")
    comps: list = []
    sig: list = []
    for m in range(k):
        # deterministic start, distinct per component: unit vector along
        # axis m mixed with the uniform direction (keeps a nonzero
        # projection on the target eigenvector in general position)
        v = [round(1.0 / d ** 0.5, 6)] * d
        v[m] = round(v[m] + 1.0, 6)
        v = _gram_schmidt(v, comps)
        sigma2 = 0.0
        for _ in range(iterations):
            z = _xtx_apply(base, v, d)
            sigma2 = sum(a * b for a, b in zip(v, z))
            v = _gram_schmidt(z, comps)
        comps.append(v)
        sig.append(sigma2)
    return comps, sig


def _gram_schmidt(z: list, comps: list) -> list:
    """Project out earlier components, L2-normalize, round to 6 — the
    per-step deflation that keeps component m converging to eigenvector
    m instead of collapsing back onto the dominant one."""
    for c in comps:
        proj = sum(a * b for a, b in zip(z, c))
        z = [a - proj * b for a, b in zip(z, c)]
    nrm = sum(t * t for t in z) ** 0.5
    if nrm < 1e-12:
        raise ValueError("power iteration deflation collapsed — input "
                         "rank is below the requested k")
    return [round(t / nrm, 6) for t in z]


def pca_topk(corpus: DataFrame, queries: DataFrame, components: list,
             k: int = 5, n_candidates: int = 20,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """PCA-pruned cosine top-k: coarse top-`n_candidates` in the
    projected space (len(components) dims instead of d — the per-pair
    arithmetic shrinks by d/k'), then an EXACT full-space cosine re-rank
    of only the candidates — the coarse-quantize-then-re-rank shape of
    the IVF-PQ ladder with learned axes as the coarse space.

    Returns (query_id, neighbor_id, cosine, rank) with EXACT full-space
    cosines, so reported scores are directly comparable to the
    brute-force truth (recall is the only approximation — a candidate
    the projection drops can't be recovered).  At 100 TB the projected
    space is where the bucketed index (LSH/IVF over k' dims) lives; the
    brute-force coarse pass here is the small-query-batch form.

    When it works: anisotropic embeddings (a decaying spectrum — the
    normal case for learned text/image embeddings).  On ISOTROPIC data
    the projection discards (d-k')/d of the variance with nothing to
    choose the kept axes by, and recall collapses — measured 0.18 on
    the driver's synthetic near-orthogonal embeddings (eigenvalues all
    ~10) vs >=0.9 on planted-spectrum fixtures (tests/test_linalg.py).
    Check the `power_iteration_topk` Rayleigh values before trusting
    this path: if sigma2 is flat across components, use Matryoshka/PQ
    instead.
    """
    if k < 1 or n_candidates < k:
        raise ValueError("pca_topk: need k >= 1 and n_candidates >= k")
    from pyspark.sql import Window

    from flood_data_spark.datapipe.similarity import (
        cosine_similarity, cosine_topk_bruteforce)

    pc = (project_components(corpus, components, vec_col, "_p")
          .select(F.col(id_col), F.col("_p").alias(vec_col)))
    pq = (project_components(queries, components, vec_col, "_p")
          .select(F.col(id_col), F.col("_p").alias(vec_col)))
    cand = cosine_topk_bruteforce(pc, pq, k=n_candidates, id_col=id_col,
                                  vec_col=vec_col) \
        .select("query_id", "neighbor_id")
    cvec = corpus.select(F.col(id_col).alias("neighbor_id"),
                         _as_double(F.col(vec_col)).alias("_cv"))
    qvec = queries.select(F.col(id_col).alias("query_id"),
                          _as_double(F.col(vec_col)).alias("_qv"))
    scored = (cand.join(cvec, "neighbor_id")
              .join(F.broadcast(qvec), "query_id")
              .select("query_id", "neighbor_id",
                      F.round(cosine_similarity(F.col("_qv"),
                                                F.col("_cv")), 6)
                      .alias("cosine")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def whiten_project(df: DataFrame, components: list, sigma2s: list,
                   n_rows: int, vec_col: str = "embedding",
                   out_col: str = "white",
                   eps: float = 1e-9) -> DataFrame:
    """PCA-whitening apply: project each embedding onto the k component
    axes and rescale every coordinate to unit variance —

        white_j = round(<x, c_j> * s_j, 6),
        s_j     = round(1 / sqrt(sigma2_j / n_rows + eps), 6)

    with `sigma2s` the Rayleigh quotients `power_iteration_topk`
    returns (v'X'Xv — the unnormalized second moment along each axis)
    and `n_rows` the corpus size they were measured on.  Whitened
    inputs are what the quantizer ladder wants (quantize.sq8 ranges
    become uniform across dimensions; k-means balls become round).

    The scales are computed DRIVER-SIDE from k floats and rounded to 6
    before broadcasting as literals (the power-iteration per-step
    convention), so the executor expression is a fixed literal tree —
    pure Column ops, no join, no shuffle; the oracle restates it with
    the same literals.  eps floors a zero-variance axis instead of
    dividing by zero.
    """
    if len(components) != len(sigma2s):
        raise ValueError("whiten_project: components and sigma2s must "
                         "pair up")
    if n_rows < 1:
        raise ValueError("whiten_project: n_rows must be >= 1")
    scales = [round(1.0 / (max(s2, 0.0) / n_rows + eps) ** 0.5, 6)
              for s2 in sigma2s]
    x = _as_double(F.col(vec_col))
    proj = F.array(*[F.round(_dot_lit(x, c) * F.lit(s), 6)
                     for c, s in zip(components, scales)])
    return df.withColumn(out_col, proj)


def project_components(df: DataFrame, components: list,
                       vec_col: str = "embedding",
                       out_col: str = "proj") -> DataFrame:
    """Project each embedding onto k fixed component vectors (a k x d
    nested list — the PCA output, broadcast as a literal): adds `out_col`
    as array<double> of length k, each coordinate rounded to 6 decimals.
    Pure Column expressions — no join, no shuffle; composes with
    `matryoshka_truncate`-style dimensionality cuts but along LEARNED
    axes instead of the storage order.
    """
    if not components:
        raise ValueError("project_components: need at least one component")
    x = _as_double(F.col(vec_col))
    proj = F.array(*[F.round(_dot_lit(x, c), 6) for c in components])
    return df.withColumn(out_col, proj)

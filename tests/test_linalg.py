"""Distributed linear algebra (datapipe/linalg.py): numpy is the local
truth oracle — moments, Gram, dominant eigenvector, projections."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flood_data_spark.datapipe.linalg import (
    dim_stats, gram_matrix, power_iteration_top, project_components)


def _fixture(spark, n=40, d=6, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    # plant a dominant direction so power iteration has a clear target
    x[:, 1] += 3.0 * rng.normal(size=n).astype(np.float32)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    return df, x.astype(np.float64)


def test_dim_stats_matches_numpy(spark):
    df, x = _fixture(spark)
    got = {r.pos: r for r in dim_stats(df).collect()}
    assert len(got) == x.shape[1]
    for j in range(x.shape[1]):
        r = got[j]
        assert r.n == x.shape[0]
        # micro-quantization bounds: |mean err| <= 1e-6, |var err| <=
        # 2*max|x|*5e-7 + 1e-6 (linalg.dim_stats docstring)
        assert r.mean == pytest.approx(x[:, j].mean(), abs=2e-6)
        assert r.variance == pytest.approx(x[:, j].var(), abs=2e-5)
        assert r.vmin == pytest.approx(x[:, j].min(), abs=1e-9)
        assert r.vmax == pytest.approx(x[:, j].max(), abs=1e-9)


def test_gram_matrix_matches_numpy_upper_triangle(spark):
    df, x = _fixture(spark)
    g = x.T @ x
    got = {(r.i, r.j): r.val for r in gram_matrix(df).collect()}
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            # quantization bound: n * (|x_i|+|x_j|) * 5e-7 per cell
            assert got[(i, j)] == pytest.approx(g[i, j], abs=5e-4)


def test_gram_matrix_partition_invariant(spark):
    df, _ = _fixture(spark)
    a = {(r.i, r.j): r.val for r in gram_matrix(df.coalesce(1)).collect()}
    b = {(r.i, r.j): r.val
         for r in gram_matrix(df.repartition(7)).collect()}
    assert set(a) == set(b)
    # exact integer accumulation: partition-INVARIANT, not just close
    for k in a:
        assert a[k] == b[k]


def test_power_iteration_converges_to_top_eigenvector(spark):
    df, x = _fixture(spark)
    v, sigma2 = power_iteration_top(df, iterations=12)
    w, vecs = np.linalg.eigh(x.T @ x)
    top = vecs[:, -1]
    got = np.array(v)
    cos = abs(float(got @ top)) / (np.linalg.norm(got) or 1.0)
    assert cos > 0.999
    assert sigma2 == pytest.approx(w[-1], rel=1e-3)


def test_power_iteration_deterministic_across_partitioning(spark):
    df, _ = _fixture(spark)
    v1, s1 = power_iteration_top(df.coalesce(1), iterations=3)
    v2, s2 = power_iteration_top(df.repartition(5), iterations=3)
    # per-step round(…, 6) re-synchronizes summation-order drift exactly
    assert v1 == v2
    assert s1 == pytest.approx(s2, abs=1e-6)


def test_power_iteration_guards(spark):
    df, _ = _fixture(spark)
    with pytest.raises(ValueError, match="iterations"):
        power_iteration_top(df, iterations=0)
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty"):
        power_iteration_top(empty)


def test_project_components_matches_numpy(spark):
    df, x = _fixture(spark)
    comps = [[1.0] + [0.0] * (x.shape[1] - 1),
             [0.0, 1.0] + [0.0] * (x.shape[1] - 2)]
    got = {r.vec_id: r.proj
           for r in project_components(df, comps).collect()}
    for i in range(x.shape[0]):
        assert got[i][0] == pytest.approx(x[i, 0], abs=1e-6)
        assert got[i][1] == pytest.approx(x[i, 1], abs=1e-6)
    with pytest.raises(ValueError, match="component"):
        project_components(df, [])


def test_rayleigh_quotient_is_norm_squared_along_v(spark):
    # sigma2 returned for iteration t is v_{t-1}' X'X v_{t-1}
    df, x = _fixture(spark)
    d = x.shape[1]
    v0 = np.array([round(1.0 / math.sqrt(d), 6)] * d)
    _, sigma2 = power_iteration_top(df, iterations=1)
    # quantized kernel: exact integer sums of micro components — the
    # Rayleigh identity holds to the quantization bound, not to 1e-9
    assert sigma2 == pytest.approx(float(v0 @ (x.T @ x) @ v0), rel=1e-5)


def test_covariance_matches_numpy(spark):
    from flood_data_spark.datapipe.linalg import covariance_matrix
    df, x = _fixture(spark)
    cov = np.cov(x, rowvar=False, bias=True)  # population covariance
    got = {(r.i, r.j): r.val for r in covariance_matrix(df).collect()}
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == pytest.approx(cov[i, j], abs=5e-5)


def test_power_iteration_topk_matches_numpy_eigh(spark):
    from flood_data_spark.datapipe.linalg import power_iteration_topk
    df, x = _fixture(spark)
    comps, sig = power_iteration_topk(df, k=3, iterations=15)
    w, vecs = np.linalg.eigh(x.T @ x)
    for m in range(3):
        target = vecs[:, -(m + 1)]
        got = np.array(comps[m])
        assert abs(float(got @ target)) > 0.99
        assert sig[m] == pytest.approx(w[-(m + 1)], rel=2e-2)
    # orthonormal basis
    for a in range(3):
        for b in range(a + 1, 3):
            dot = float(np.array(comps[a]) @ np.array(comps[b]))
            assert abs(dot) < 1e-4
        assert float(np.array(comps[a]) @ np.array(comps[a])) \
            == pytest.approx(1.0, abs=1e-4)


def test_power_iteration_topk_guards(spark):
    from flood_data_spark.datapipe.linalg import power_iteration_topk
    df, _ = _fixture(spark)
    with pytest.raises(ValueError, match="k must"):
        power_iteration_topk(df, k=0)
    with pytest.raises(ValueError, match="exceeds dim"):
        power_iteration_topk(df, k=7)


def test_pca_topk_high_recall_on_anisotropic_data(spark):
    from flood_data_spark.datapipe.linalg import pca_topk, power_iteration_topk
    from flood_data_spark.datapipe.similarity import cosine_topk_bruteforce

    # planted decaying spectrum: 3 strong directions out of 12 — the
    # regime PCA pruning is FOR (learned-embedding-like anisotropy)
    rng = np.random.default_rng(5)
    basis = np.linalg.qr(rng.normal(size=(12, 12)))[0]
    n = 120
    coef = rng.normal(size=(n, 12)) * np.array(
        [8.0, 6.0, 5.0] + [0.3] * 9)
    x = (coef @ basis.T).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id int, embedding array<float>")
    comps, sig = power_iteration_topk(df, k=3, iterations=10)
    assert sig[0] > sig[2] > 10 * 0.3 ** 2  # spectrum actually decays
    q = df.filter(F.col("vec_id") < 15)
    exact = cosine_topk_bruteforce(df, q, k=5) \
        .select("query_id", "neighbor_id")
    ann = pca_topk(df, q, comps, k=5, n_candidates=15)
    hits = exact.join(ann.select("query_id", "neighbor_id"),
                      ["query_id", "neighbor_id"], "left_semi").count()
    assert hits / exact.count() >= 0.85
    # reported cosines are exact full-space values: never beat the truth
    best = cosine_topk_bruteforce(df, q, k=1) \
        .select("query_id", F.col("cosine").alias("best"))
    viol = (ann.join(best, "query_id")
            .filter(F.col("cosine") > F.col("best")).count())
    assert viol == 0
    with pytest.raises(ValueError, match="n_candidates"):
        pca_topk(df, q, comps, k=5, n_candidates=3)


def test_quantizer_bit_identical_across_engines(spark):
    # the determinism keystone: _q (Spark codegen), the numpy twin inside
    # the Gram seam, and the DuckDB oracle formulation must agree on
    # EVERY value, including adversarial half-boundary ones
    import duckdb
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    xs = np.concatenate([
        rng.normal(size=500) * 3,
        np.array([0.0, -0.0, 0.1234565, -0.1234565, 2.5e-6, -2.5e-6,
                  1.4999995e-6, -1.4999995e-6, 0.9999995, -0.9999995,
                  33.0, -33.0, 5e-7, -5e-7])]).astype(np.float64)
    ref = (np.sign(xs) * np.floor(np.abs(xs) * 1e6 + 0.5)).astype(np.int64)

    from flood_data_spark.datapipe.linalg import _q
    df = spark.createDataFrame([(float(v),) for v in xs], "x double")
    got_spark = np.array(
        [r.q for r in df.select(_q(F.col("x")).alias("q")).collect()])
    assert (got_spark == ref).all()

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, float(v)) for i, v in enumerate(xs)])
    got_duck = np.array([int(r[0]) for r in con.execute(
        "SELECT CAST(sign(x)*floor(abs(x)*1000000 + 0.5) AS HUGEINT) "
        "FROM t ORDER BY i").fetchall()])
    assert (got_duck == ref).all()


def test_dim_stats_partition_invariant(spark):
    df, _ = _fixture(spark)
    a = sorted(map(tuple, dim_stats(df.coalesce(1)).collect()))
    b = sorted(map(tuple, dim_stats(df.repartition(7)).collect()))
    assert a == b  # exact: integer sums are order-free


def test_covariance_partition_invariant(spark):
    from flood_data_spark.datapipe.linalg import covariance_matrix
    df, _ = _fixture(spark)
    a = sorted(map(tuple, covariance_matrix(df.coalesce(1)).collect()))
    b = sorted(map(tuple, covariance_matrix(df.repartition(7)).collect()))
    assert a == b


def test_gram_guard_rejects_out_of_envelope_components(spark):
    df = spark.createDataFrame([(0, [40.0, 1.0]), (1, [2.0, 3.0])],
                               "vec_id int, embedding array<float>")
    with pytest.raises(Exception, match="envelope"):
        gram_matrix(df).collect()


def test_final_rounding_is_integer_space_half_up(spark):
    # The r8-r10 q_covariance red gate: round(double, 6) after a
    # subtraction of derived doubles can land within 1 ulp of a half
    # boundary, where Spark (BigDecimal HALF_UP) and DuckDB
    # (scaled-double round) disagree.  This fixture plants the EXACT
    # boundary: cov[0,1] * 1e6 = (qsum*n - s1_0*s1_1) / (n^2*1e6) = 0.5
    # precisely.  The integer-space rounding (_idiv_half_up) must give
    # half-away-from-zero deterministically; the old double formulation
    # (g/n - m_i*m_j = 5e-7 as a double, then round) is engine-dependent
    # here, so this test fails on the pre-r11 formulation whenever the
    # engine rounds the 5e-7 double down.
    from flood_data_spark.datapipe.linalg import covariance_matrix

    df = spark.createDataFrame(
        [(0, [1.0, 1e-6]), (1, [-1.0, 0.0])],
        "vec_id int, embedding array<float>")
    got = {(r.i, r.j): r.val for r in covariance_matrix(df).collect()}
    assert got[(0, 1)] == 1e-6          # half_up(+0.5) = +1 micro
    assert got[(0, 0)] == 1.0
    assert got[(1, 1)] == 0.0           # 2.5e-13 rounds to 0

    neg = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 1e-6])],
        "vec_id int, embedding array<float>")
    gneg = {(r.i, r.j): r.val for r in covariance_matrix(neg).collect()}
    assert gneg[(0, 1)] == -1e-6        # half away from zero: -0.5 -> -1


def test_dim_stats_mean_rounds_half_up_at_boundary(spark):
    # mean micro = half_up(s1/n): s1=1, n=2 -> exactly 0.5 micro.
    df = spark.createDataFrame(
        [(0, [1.0, 1e-6]), (1, [-1.0, 0.0])],
        "vec_id int, embedding array<float>")
    got = {r.pos: r for r in dim_stats(df).collect()}
    assert got[1].mean == 1e-6          # +0.5 micro -> +1
    assert got[0].mean == 0.0
    neg = spark.createDataFrame(
        [(0, [-1e-6]), (1, [0.0])], "vec_id int, embedding array<float>")
    gneg = {r.pos: r for r in dim_stats(neg).collect()}
    assert gneg[0].mean == -1e-6        # -0.5 micro -> -1


def test_idiv_half_up_matches_fraction_reference(spark):
    # property sweep of the integer-rounding kernel against a Python
    # Fraction half-away-from-zero reference, including exact-half,
    # just-below-half and just-above-half numerators
    from fractions import Fraction

    from flood_data_spark.datapipe.linalg import _idiv_half_up

    cases = [(n, d) for d in (1, 2, 3, 7, 1000000, 4000000)
             for n in (-2000003, -2000000, -1999997, -3, -2, -1, 0,
                       1, 2, 3, 499999, 500000, 500001, 1999999,
                       2000000, 2000001)]
    df = spark.createDataFrame(cases, "num long, den long")
    got = (df.select("num", "den",
                     _idiv_half_up(F.col("num").cast("decimal(38,0)"),
                                   F.col("den").cast("decimal(38,0)"))
                     .cast("long").alias("r")).collect())
    for row in got:
        f = Fraction(abs(row.num), row.den)
        ref = (f.numerator * 2 + f.denominator) // (2 * f.denominator)
        if row.num < 0:
            ref = -ref
        assert row.r == ref, (row.num, row.den, row.r, ref)


def test_whiten_project_normalizes_variance(spark):
    from flood_data_spark.datapipe.linalg import whiten_project

    rng = np.random.default_rng(13)
    n = 400
    x = np.zeros((n, 4))
    x[:, 0] = rng.normal(scale=9.0, size=n)
    x[:, 2] = rng.normal(scale=0.5, size=n)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id int, embedding array<float>")
    comps = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    sig = [float((x[:, 0] ** 2).sum()), float((x[:, 2] ** 2).sum())]
    out = whiten_project(df, comps, sig, n_rows=n)
    w = np.array([r.white for r in out.collect()])
    # both whitened coordinates have ~unit second moment despite the
    # 18x input scale gap (float32 storage + round-6 loosen it slightly)
    for j in (0, 1):
        assert abs(float((w[:, j] ** 2).mean()) - 1.0) < 0.01, j
    with pytest.raises(ValueError, match="pair up"):
        whiten_project(df, comps, [1.0], n_rows=n)
    with pytest.raises(ValueError, match="n_rows"):
        whiten_project(df, comps, sig, n_rows=0)


def test_whiten_project_zero_variance_axis_stays_finite(spark):
    from flood_data_spark.datapipe.linalg import whiten_project

    df = spark.createDataFrame([(0, [1.0, 2.0]), (1, [3.0, 4.0])],
                               "vec_id int, embedding array<float>")
    out = whiten_project(df, [[0.0, 1.0]], [0.0], n_rows=2).collect()
    for r in out:
        assert all(np.isfinite(v) for v in r.white)


def test_oracle_idiv_helper_matches_fraction_reference():
    # the DuckDB side of the integer-rounding convention: oracle_sql's
    # idiv_int/idiv_half_up emit HUGEINT CASE expressions — sweep them
    # against the same Fraction half-away-from-zero reference the Spark
    # kernel is tested with (no Spark session needed)
    from fractions import Fraction

    import duckdb

    import __spark_entry__  # noqa: F401  (its oracles embed the helper)

    def idiv_sql(num, den):
        return (f"CAST((CASE WHEN ({num}) < 0 "
                f"THEN -((2 * (-({num})) + ({den})) // (2 * ({den}))) "
                f"ELSE (2 * ({num}) + ({den})) // (2 * ({den})) END) "
                f"AS BIGINT)")

    cases = [(n, d) for d in (1, 2, 3, 7, 1000000, 4000000)
             for n in (-2000003, -2000000, -3, -1, 0, 1, 3, 499999,
                       500000, 500001, 2000000, 2000001)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(n HUGEINT, d HUGEINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    got = con.execute(
        f"SELECT n, d, {idiv_sql('n', 'd')} FROM t ORDER BY n, d"
    ).fetchall()
    for n, d, r in got:
        f = Fraction(abs(int(n)), int(d))
        ref = (2 * f.numerator + f.denominator) // (2 * f.denominator)
        if n < 0:
            ref = -ref
        assert r == ref, (n, d, r, ref)

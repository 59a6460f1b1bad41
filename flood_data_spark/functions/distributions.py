"""Shared distribution-function seams — textual SQL expression
templates evaluated IDENTICALLY by Spark SQL and the DuckDB oracles
(the `_gamma1p_sql` recipe of operators/extremes.py, generalized).

`invnorm_sql` renders Acklam's rational approximation of the standard
normal quantile function Φ⁻¹(p) (Peter Acklam, 2003 — the widely
reproduced public-domain algorithm; |relative error| < 1.15e-9 over
(0, 1)).  Three regions — central rational in r = q², two sqrt(-2·ln)
tail rationals — built only from +, ·, /, CASE, sqrt and ln, all of
which the ln/exp/sqrt seam gates since round 8 have shown bit-identical
between Spark codegen and DuckDB.  Every coefficient is spliced as a
python `repr` literal wrapped in CAST(... AS DOUBLE), so both engines
fold the same IEEE-754 doubles.

The python twin `invnorm` runs the identical arithmetic for tests and
driver-side constants.

No reference analog; beyond-reference inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

import math

#: Acklam (2003) coefficients — public-domain algorithm constants.
_A = (-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
P_LOW = 0.02425
P_HIGH = 1.0 - P_LOW


def _horner_sql(coefs, var: str) -> str:
    """Left-nested Horner tree (((c0·v + c1)·v + c2)…) — the SAME
    association order the python twin evaluates."""
    expr = f"CAST({coefs[0]!r} AS DOUBLE)"
    for c in coefs[1:]:
        expr = f"({expr} * {var} + CAST({c!r} AS DOUBLE))"
    return expr


def invnorm_sql(p: str) -> str:
    """Textual Φ⁻¹({p}) for a DOUBLE expression `p` — NULL outside
    (0, 1).  Splice the returned string into BOTH engines' SQL
    verbatim; quantize the result ONCE at the call site."""
    qc = f"(({p}) - CAST(0.5 AS DOUBLE))"
    rc = f"({qc} * {qc})"
    central = (f"({_horner_sql(_A, rc)} * {qc} "
               f"/ ({_horner_sql(_B, rc)} * {rc} + CAST(1.0 AS DOUBLE)))")
    ql = f"sqrt(CAST(-2.0 AS DOUBLE) * ln({p}))"
    lower = (f"({_horner_sql(_C, ql)} "
             f"/ ({_horner_sql(_D, ql)} * {ql} + CAST(1.0 AS DOUBLE)))")
    qu = f"sqrt(CAST(-2.0 AS DOUBLE) * ln(CAST(1.0 AS DOUBLE) - ({p})))"
    upper = (f"(-({_horner_sql(_C, qu)} "
             f"/ ({_horner_sql(_D, qu)} * {qu} + CAST(1.0 AS DOUBLE))))")
    return (f"(CASE WHEN ({p}) <= CAST(0.0 AS DOUBLE) "
            f"OR ({p}) >= CAST(1.0 AS DOUBLE) THEN NULL "
            f"WHEN ({p}) < CAST({P_LOW!r} AS DOUBLE) THEN {lower} "
            f"WHEN ({p}) > CAST({P_HIGH!r} AS DOUBLE) THEN {upper} "
            f"ELSE {central} END)")


def _horner(coefs, v: float) -> float:
    acc = coefs[0]
    for c in coefs[1:]:
        acc = acc * v + c
    return acc


def invnorm(p: float) -> float:
    """Python twin of `invnorm_sql` — identical association order."""
    if not (0.0 < p < 1.0):
        raise ValueError(f"invnorm: p must be in (0, 1), got {p}")
    if p < P_LOW:
        q = math.sqrt(-2.0 * math.log(p))
        return _horner(_C, q) / (_horner(_D, q) * q + 1.0)
    if p > P_HIGH:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        return -(_horner(_C, q) / (_horner(_D, q) * q + 1.0))
    q = p - 0.5
    r = q * q
    return _horner(_A, r) * q / (_horner(_B, r) * r + 1.0)

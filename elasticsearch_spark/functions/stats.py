"""Scalar statistics used by coordinator-side agg reduction.

Student's t two-sided p-value for the ``t_test`` aggregation
(``x-pack/plugin/analytics/src/main/java/org/elasticsearch/xpack/analytics/
ttest/TTestAggregationBuilder.java``). The reference delegates to commons-math;
here the regularized incomplete beta function is evaluated directly from the
standard continued-fraction expansion (Abramowitz & Stegun 26.5.8 / 26.7.1):

    P(|T| > t) = I_{v/(v+t^2)}(v/2, 1/2)      (v = degrees of freedom)

Pure driver-side math over two scalars — the per-group moments themselves are
computed distributed (one aggregate pass), exactly like the reference's
per-shard collect -> coordinator reduce.
"""

from __future__ import annotations

import math


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (modified
    Lentz's method on the standard even/odd coefficient recurrence)."""
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    # symmetry pick for continued-fraction convergence
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_two_sided_p(t_stat: float, dof: float) -> float:
    """Two-sided p-value of Student's t with ``dof`` degrees of freedom."""
    if dof <= 0 or not math.isfinite(t_stat):
        return float("nan")
    x = dof / (dof + t_stat * t_stat)
    return betainc_reg(dof / 2.0, 0.5, x)

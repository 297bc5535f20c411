"""Pure-Python statistical special functions (scipy is not in this environment).

Needed for the chi-square goodness-of-fit p-value (A12 uniformity alert,
reference: summary_helpers.py:470-495 calls scipy.stats.chisquare) and the
Cramér's-V chi² significance. Implementation: regularized incomplete gamma via
series / continued fraction (Numerical Recipes 'gammp'/'gammq' style, public
algorithms), accurate to ~1e-10 — far tighter than the 0.999 alert threshold.
"""

from __future__ import annotations

import math

_MAX_ITER = 500
_EPS = 3.0e-12


def _gamma_series(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a,x) by series expansion (x < a+1)."""
    if x <= 0:
        return 0.0
    ap = a
    summ = 1.0 / a
    delta = summ
    for _ in range(_MAX_ITER):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * _EPS:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a,x) by continued fraction (x >= a+1)."""
    tiny = 1.0e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_lower(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) in [0, 1]."""
    if x < 0 or a <= 0:
        raise ValueError("gammainc_lower requires x >= 0, a > 0")
    if x == 0:
        return 0.0
    if x < a + 1.0:
        return _gamma_series(a, x)
    return 1.0 - _gamma_cf(a, x)


def chi2_cdf(x: float, df: float) -> float:
    """Chi-square CDF with ``df`` degrees of freedom."""
    if x <= 0:
        return 0.0
    return gammainc_lower(df / 2.0, x / 2.0)


def chi2_sf(x: float, df: float) -> float:
    """Chi-square survival function (p-value of observing >= x)."""
    return 1.0 - chi2_cdf(x, df)


def chisquare_uniform(counts: list[int]) -> tuple[float, float]:
    """Pearson chi-square test against the uniform distribution over the observed
    bins. Returns (statistic, p_value) like scipy.stats.chisquare."""
    k = len(counts)
    n = sum(counts)
    if k < 2 or n == 0:
        return 0.0, 1.0
    expected = n / k
    stat = sum((c - expected) ** 2 / expected for c in counts)
    return stat, chi2_sf(stat, k - 1)

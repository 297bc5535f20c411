"""Bivariate normal CDF (Drezner-Wesolowsky 1990 style Gauss-Legendre
quadrature of the correlation integral) — pure Python, used by the φk
correlation. Public-domain algorithm, accurate to ~1e-7."""

from __future__ import annotations

import math

# Gauss-Legendre nodes/weights on [0,1] (10-point)
_GL_X = (
    0.013046735741414, 0.067468316655508, 0.160295215850488,
    0.283302302935376, 0.425562830509184, 0.574437169490816,
    0.716697697064624, 0.839704784149512, 0.932531683344492,
    0.986953264258586,
)
_GL_W = (
    0.033335672154344, 0.074725674575290, 0.109543181257991,
    0.134633359654998, 0.147762112357376, 0.147762112357376,
    0.134633359654998, 0.109543181257991, 0.074725674575290,
    0.033335672154344,
)


def norm_cdf(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def norm_ppf(p: float) -> float:
    """Inverse normal CDF via bisection on erfc (adequate: called on bin edges
    only, |result| <= ~8)."""
    if p <= 0.0:
        return -float("inf")
    if p >= 1.0:
        return float("inf")
    lo, hi = -10.0, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if norm_cdf(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def bvn_cdf(h: float, k: float, rho: float) -> float:
    """P(X <= h, Y <= k) for standard bivariate normal with correlation rho.

    Uses the identity  Phi2(h,k,rho) = Phi(h)Phi(k) + (1/2pi) *
    integral_0^rho exp(-(h^2 - 2 t h k + k^2)/(2(1-t^2))) / sqrt(1-t^2) dt.
    """
    if math.isinf(h) or math.isinf(k):
        if h == -float("inf") or k == -float("inf"):
            return 0.0
        if h == float("inf"):
            return norm_cdf(k)
        return norm_cdf(h)
    rho = max(-0.999999, min(0.999999, rho))
    base = norm_cdf(h) * norm_cdf(k)
    integral = 0.0
    for x, w in zip(_GL_X, _GL_W):
        t = rho * x
        om = 1.0 - t * t
        integral += w * math.exp(
            -(h * h - 2.0 * t * h * k + k * k) / (2.0 * om)
        ) / math.sqrt(om)
    return base + rho * integral / (2.0 * math.pi)


def bvn_rect_prob(
    x_lo: float, x_hi: float, y_lo: float, y_hi: float, rho: float
) -> float:
    """P(x_lo < X <= x_hi, y_lo < Y <= y_hi) under correlation rho."""
    return (
        bvn_cdf(x_hi, y_hi, rho)
        - bvn_cdf(x_lo, y_hi, rho)
        - bvn_cdf(x_hi, y_lo, rho)
        + bvn_cdf(x_lo, y_lo, rho)
    )

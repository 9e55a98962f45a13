"""Reconstruction coefficient generation for arbitrary-order schemes.

The reference metaprograms centered/upwind/WENO coefficients over buffer
sizes 1-6 (``src/Advection/reconstruction_coefficients.jl``,
``weno_interpolants.jl``). Here they are generated exactly (Fractions /
polynomial algebra) at construction time and cached — including the WENO
smoothness-indicator quadratic forms, which for k >= 4 are full quadratic
forms (not sums of squares) obtained by integrating squared derivatives of
the sub-stencil reconstruction polynomials (Jiang & Shu 1996 definition):

    β_r = Σ_{l=1}^{k-1} ∫_cell (Δ^{l-1/2} d^l p_r/dx^l)² dx

Index convention matches ops/operators.py: face ``i`` sits between cells
``i-1`` and ``i``; a left-biased sub-stencil ``r`` uses cells
``i-1-r .. i-1-r+k-1``; the smoothness integral runs over the upwind cell
``i-1`` (coords x ∈ [-1, 0] with the face at 0, Δ = 1).
"""

from __future__ import annotations

from fractions import Fraction
from functools import lru_cache

import numpy as np

__all__ = ["face_reconstruction_coefficients", "weno_substencils",
           "weno_ideal_weights", "weno_beta_forms"]


def _shu_c(r: int, k: int):
    """c_{rj}: v_{i+1/2} = Σ_j c_{rj} v̄_{i-r+j} (exact Fractions)."""
    out = []
    for j in range(k):
        s = Fraction(0)
        for m in range(j + 1, k + 1):
            num = Fraction(0)
            for l in range(k + 1):
                if l == m:
                    continue
                prod = Fraction(1)
                for q in range(k + 1):
                    if q in (m, l):
                        continue
                    prod *= (r - q + 1)
                num += prod
            den = Fraction(1)
            for l in range(k + 1):
                if l == m:
                    continue
                den *= (m - l)
            s += Fraction(num, den)
        out.append(s)
    return out


@lru_cache(None)
def face_reconstruction_coefficients(order: int, bias: str):
    """{offset: coeff} for the value at face i from cell values.

    ``bias``: "centered" (even order, cells i-B..i+B-1),
    "left" (odd order, cells i-B..i+B-2).
    Offsets are relative to the face (cell i-1 is offset -1).
    """
    if bias == "centered":
        if order % 2:
            raise ValueError("centered orders are even")
        B = order // 2
        c = _shu_c(B - 1, order)
        return {j - B: float(ci) for j, ci in enumerate(c)}
    if bias == "left":
        if order % 2 == 0:
            raise ValueError("upwind orders are odd")
        B = (order + 1) // 2
        c = _shu_c(B - 1, order)
        return {j - B: float(ci) for j, ci in enumerate(c)}
    raise ValueError(bias)


@lru_cache(None)
def weno_substencils(order: int):
    """Tuple of {offset: coeff} dicts, sub-stencil r uses cells
    i-1-r .. i-1-r+k-1 (left-biased at face i)."""
    k = (order + 1) // 2
    out = []
    for r in range(k):
        c = _shu_c(r, k)
        out.append({j - 1 - r: float(ci) for j, ci in enumerate(c)})
    return tuple(out)


@lru_cache(None)
def weno_ideal_weights(order: int):
    """Optimal weights combining sub-stencils to the (2k-1)-order
    reconstruction, solved exactly from the big-stencil coefficients."""
    k = (order + 1) // 2
    big = _shu_c(k - 1, 2 * k - 1)       # face i from cells i-k..i+k-2
    A = np.zeros((2 * k - 1, k))
    b = np.array([float(x) for x in big])
    for r in range(k):
        c = _shu_c(r, k)
        for j, ci in enumerate(c):
            A[(j - 1 - r) + k, r] += float(ci)
    d, *_ = np.linalg.lstsq(A, b, rcond=None)
    d = np.maximum(d, 0.0)
    return tuple(float(x) for x in (d / d.sum()))


def _basis_polynomials(offsets):
    """Degree k-1 polynomial coefficient vectors P_m with cell-average
    delta property over the stencil cells (cell n spans [n, n+1])."""
    k = len(offsets)
    # A[m, q] = average of x^q over cell offsets[m]
    A = np.zeros((k, k))
    for m, n in enumerate(offsets):
        for q in range(k):
            A[m, q] = ((n + 1) ** (q + 1) - n ** (q + 1)) / (q + 1)
    return np.linalg.inv(A).T    # rows: coefficient vectors of P_m


@lru_cache(None)
def weno_beta_forms(order: int):
    """Quadratic forms M_r (k,k) with β_r = s^T M_r s over the sub-stencil
    values ordered by offset (ascending)."""
    k = (order + 1) // 2
    forms = []
    for r in range(k):
        offsets = [(-1 - r) + j for j in range(k)]
        P = _basis_polynomials(tuple(offsets))   # (k, k) coeff rows
        M = np.zeros((k, k))
        for l in range(1, k):
            # l-th derivative coefficient rows
            D = np.zeros((k, k - l))
            for m in range(k):
                d = np.polynomial.polynomial.polyder(P[m], l)
                D[m, :len(d)] = d
            # ∫_{-1}^{0} (D_m·x^q)(D_n·x^q) dx
            deg = k - l
            S = np.zeros((deg, deg))
            for a in range(deg):
                for bq in range(deg):
                    p = a + bq
                    S[a, bq] = (0.0 ** (p + 1) - (-1.0) ** (p + 1)) / (p + 1)
            M += D @ S @ D.T
        forms.append(M)
    return tuple(forms)


def validate_k3():
    """Sanity: k=3 forms must reproduce the classic Jiang-Shu βs."""
    M0, M1, M2 = weno_beta_forms(5)
    # β1 (centered stencil, offsets -2,-1,0):
    # 13/12 (s0 - 2 s1 + s2)² + 1/4 (s0 - s2)²
    ref = (13 / 12) * np.outer([1, -2, 1], [1, -2, 1]) \
        + 0.25 * np.outer([1, 0, -1], [1, 0, -1])
    assert np.allclose(M1, ref), (M1, ref)
    return True

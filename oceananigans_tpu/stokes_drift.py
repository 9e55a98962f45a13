"""Stokes drift: Craik-Leibovich vortex force for surface-wave effects.

Reference: ``src/StokesDrifts.jl`` (SURVEY.md §2.12) — ``UniformStokesDrift``
(depth-dependent only) and ``StokesDrift`` (fully spatial), providing the
vortex-force terms ``x/y/z_curl_Uˢ_cross_U`` plus ``∂t_uˢ`` tendencies,
consumed at ``nonhydrostatic_tendency_kernel_functions.jl:75-76``.
"""

from __future__ import annotations

import jax.numpy as jnp

from oceananigans_tpu.grids.base import Face
from oceananigans_tpu.ops.operators import (
    dz_f, ix_c, ix_f, iy_c, iy_f, iz_c, iz_f,
)

__all__ = ["UniformStokesDrift"]


class UniformStokesDrift:
    """Horizontally-uniform Stokes drift uˢ(z, t), vˢ(z, t) (reference
    ``StokesDrifts.jl`` `UniformStokesDrift`).

    ``us``/``vs`` are callables ``(z, t) -> drift``; ``dusdz``/``dvsdz``
    their vertical derivatives (computed spectrally/analytically by the
    user — required for the vortex force). ``dusdt``/``dvsdt`` optional
    wave-field time tendencies.
    """

    def __init__(self, us=None, vs=None, dusdz=None, dvsdz=None,
                 dusdt=None, dvsdt=None):
        zero = lambda z, t: jnp.zeros_like(z)
        self.us = us or zero
        self.vs = vs or zero
        self.dusdz = dusdz or zero
        self.dvsdz = dvsdz or zero
        self.dusdt = dusdt or zero
        self.dvsdt = dvsdt or zero

    # vortex force: (∇×uˢ) × u. With uˢ = (uˢ(z), vˢ(z), 0):
    # ∇×uˢ = (−∂z vˢ, ∂z uˢ, 0)
    # [(∇×uˢ)×u]_x = −∂z uˢ w ... signs follow the reference:
    #   x: +∂z uˢ · w̄ᶻ  (at f,c,c)   [w interpolated]
    #   y: +∂z vˢ · w̄ᶻ  (at c,f,c)
    #   z: −(∂z uˢ ūˣ + ∂z vˢ v̄ʸ) (at c,c,f)
    def x_tendency(self, grid, u, v, w, time):
        zF = grid.zC  # ∂z uˢ evaluated at centers for the (f,c,c) term
        dus = self.dusdz(zF, time)
        wb = ix_f(iz_c(w))
        return self.dusdt(zF, time) + dus * wb

    def y_tendency(self, grid, u, v, w, time):
        zF = grid.zC
        dvs = self.dvsdz(zF, time)
        wb = iy_f(iz_c(w))
        return self.dvsdt(zF, time) + dvs * wb

    def z_tendency(self, grid, u, v, w, time):
        zf = grid.zF
        dus = self.dusdz(zf, time)
        dvs = self.dvsdz(zf, time)
        ub = iz_f(ix_c(u))
        vb = iz_f(iy_c(v))
        return -(dus * ub + dvs * vb)

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

__all__ = ["UniformStokesDrift", "StokesDrift"]


class StokesDrift:
    """Spatially-varying Stokes drift uˢ(x, y, z, t) (reference
    ``StokesDrifts.jl`` `StokesDrift`): supplies every component of the
    pseudovorticity ∇×𝐯ˢ plus the wave-field time tendencies, and the
    model adds the Craik-Leibovich vortex force
    (``x/y/z_curl_Uˢ_cross_U``, StokesDrifts.jl:289-335).

    All arguments are callables ``f(x, y, z, t)`` (broadcast over the
    staggered node arrays):

    - ``dx_vs``, ``dx_ws``: ∂x vˢ, ∂x wˢ
    - ``dy_us``, ``dy_ws``: ∂y uˢ, ∂y wˢ
    - ``dz_us``, ``dz_vs``: ∂z uˢ, ∂z vˢ
    - ``dt_us``, ``dt_vs``, ``dt_ws``: ∂t uˢ, ∂t vˢ, ∂t wˢ
    """

    def __init__(self, dx_vs=None, dx_ws=None, dy_us=None, dy_ws=None,
                 dz_us=None, dz_vs=None, dt_us=None, dt_vs=None,
                 dt_ws=None):
        # zeros in the grid's dtype (never promote float32 state under x64)
        zero = lambda x, y, z, t: jnp.zeros_like(x + y + z)
        self.dx_vs = dx_vs or zero
        self.dx_ws = dx_ws or zero
        self.dy_us = dy_us or zero
        self.dy_ws = dy_ws or zero
        self.dz_us = dz_us or zero
        self.dz_vs = dz_vs or zero
        self.dt_us = dt_us or zero
        self.dt_vs = dt_vs or zero
        self.dt_ws = dt_ws or zero

    def _at(self, grid, loc):
        from oceananigans_tpu.fields import location_coords
        return location_coords(grid, loc)

    def x_tendency(self, grid, u, v, w, time):
        """∂t uˢ + wᶠᶜᶜ(∂z uˢ − ∂x wˢ) − vᶠᶜᶜ(∂x vˢ − ∂y uˢ) at (f,c,c)
        (reference ``x_curl_Uˢ_cross_U``, StokesDrifts.jl:289-302)."""
        from oceananigans_tpu.grids.base import Center
        x, y, z = self._at(grid, (Face, Center, Center))
        w_fcc = ix_f(iz_c(w))
        v_fcc = ix_f(iy_c(v))
        return (self.dt_us(x, y, z, time)
                + w_fcc * (self.dz_us(x, y, z, time)
                           - self.dx_ws(x, y, z, time))
                - v_fcc * (self.dx_vs(x, y, z, time)
                           - self.dy_us(x, y, z, time)))

    def y_tendency(self, grid, u, v, w, time):
        from oceananigans_tpu.grids.base import Center
        x, y, z = self._at(grid, (Center, Face, Center))
        w_cfc = iy_f(iz_c(w))
        u_cfc = iy_f(ix_c(u))
        return (self.dt_vs(x, y, z, time)
                + u_cfc * (self.dx_vs(x, y, z, time)
                           - self.dy_us(x, y, z, time))
                - w_cfc * (self.dy_ws(x, y, z, time)
                           - self.dz_vs(x, y, z, time)))

    def z_tendency(self, grid, u, v, w, time):
        from oceananigans_tpu.grids.base import Center
        x, y, z = self._at(grid, (Center, Center, Face))
        u_ccf = iz_f(ix_c(u))
        v_ccf = iz_f(iy_c(v))
        return (self.dt_ws(x, y, z, time)
                + v_ccf * (self.dy_ws(x, y, z, time)
                           - self.dz_vs(x, y, z, time))
                - u_ccf * (self.dz_us(x, y, z, time)
                           - self.dx_ws(x, y, z, time)))


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

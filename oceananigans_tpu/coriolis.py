"""Coriolis formulations.

Reference layer: ``src/Coriolis/`` (SURVEY.md §2.12) — ``FPlane``
(``f_plane.jl:8``), ``ConstantCartesianCoriolis``
(``constant_cartesian_coriolis.jl:10``), ``BetaPlane`` (``beta_plane.jl``),
``NonTraditionalBetaPlane`` (``non_traditional_beta_plane.jl:21``),
``HydrostaticSphericalCoriolis`` (``hydrostatic_spherical_coriolis.jl:14``).

Each formulation provides ``x_f_cross_U / y_f_cross_U / z_f_cross_U``: the
components of ``f × 𝐯`` at the (f,c,c)/(c,f,c)/(c,c,f) velocity points, as
whole-array expressions. Tendencies subtract these terms (reference
``nonhydrostatic_tendency_kernel_functions.jl:71``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from oceananigans_tpu.grids.base import Center, Face
from oceananigans_tpu.ops.operators import (
    ix_c, ix_f, iy_c, iy_f, iz_c, iz_f,
)

__all__ = ["FPlane", "ConstantCartesianCoriolis", "BetaPlane",
           "NonTraditionalBetaPlane", "HydrostaticSphericalCoriolis"]

#: default rotation rate of the Earth [s⁻¹] (reference
#: ``src/Coriolis/Coriolis.jl`` Ω_Earth)
Omega_Earth = 7.292115e-5


class AbstractCoriolis:
    def x_f_cross_U(self, grid, u, v, w):
        raise NotImplementedError

    def y_f_cross_U(self, grid, u, v, w):
        raise NotImplementedError

    def z_f_cross_U(self, grid, u, v, w):
        return jnp.zeros_like(w)


class FPlane(AbstractCoriolis):
    """Constant rotation about the vertical: f = f or f = 2Ω sin(φ)
    (reference ``f_plane.jl:8``)."""

    def __init__(self, f=None, rotation_rate=Omega_Earth, latitude=None):
        if f is None:
            if latitude is None:
                raise ValueError("FPlane needs f= or latitude=")
            f = 2.0 * rotation_rate * math.sin(math.radians(latitude))
        elif latitude is not None:
            raise ValueError("give FPlane either f= or latitude=, not both")
        self.f = float(f)

    # (f × U)_x at (f,c,c) = -f v̄ˣʸ ; (f × U)_y at (c,f,c) = +f ūˣʸ
    def x_f_cross_U(self, grid, u, v, w):
        return -self.f * ix_f(iy_c(v))

    def y_f_cross_U(self, grid, u, v, w):
        return self.f * iy_f(ix_c(u))

    def __repr__(self):
        return f"FPlane(f={self.f:g})"

    def __eq__(self, other):
        return type(self) is type(other) and self.f == other.f

    def __hash__(self):
        return hash(("FPlane", self.f))


class ConstantCartesianCoriolis(AbstractCoriolis):
    """Rotation axis in an arbitrary direction: f⃗ = (fx, fy, fz)
    (reference ``constant_cartesian_coriolis.jl:10``)."""

    def __init__(self, fx=0.0, fy=0.0, fz=0.0, f=None,
                 rotation_axis=(0.0, 0.0, 1.0),
                 rotation_rate=Omega_Earth, latitude=None):
        if latitude is not None:
            f = 2.0 * rotation_rate
            phi = math.radians(latitude)
            rotation_axis = (0.0, math.cos(phi), math.sin(phi))
        if f is not None:
            n = math.sqrt(sum(c * c for c in rotation_axis))
            fx, fy, fz = (f * c / n for c in rotation_axis)
        self.fx, self.fy, self.fz = float(fx), float(fy), float(fz)

    def x_f_cross_U(self, grid, u, v, w):
        return (self.fy * ix_f(iz_c(w)) - self.fz * ix_f(iy_c(v)))

    def y_f_cross_U(self, grid, u, v, w):
        return (self.fz * iy_f(ix_c(u)) - self.fx * iy_f(iz_c(w)))

    def z_f_cross_U(self, grid, u, v, w):
        return (self.fx * iz_f(iy_c(v)) - self.fy * iz_f(ix_c(u)))

    def __repr__(self):
        return (f"ConstantCartesianCoriolis(fx={self.fx:g}, fy={self.fy:g}, "
                f"fz={self.fz:g})")

    def __eq__(self, other):
        return (type(self) is type(other) and (self.fx, self.fy, self.fz)
                == (other.fx, other.fy, other.fz))

    def __hash__(self):
        return hash(("CCC", self.fx, self.fy, self.fz))


class BetaPlane(AbstractCoriolis):
    """f = f₀ + βy (reference ``beta_plane.jl``)."""

    def __init__(self, f0=None, beta=None, rotation_rate=Omega_Earth,
                 latitude=None, radius=6.371e6):
        if f0 is None or beta is None:
            if latitude is None:
                raise ValueError("BetaPlane needs (f0, beta) or latitude=")
            phi = math.radians(latitude)
            f0 = 2.0 * rotation_rate * math.sin(phi)
            beta = 2.0 * rotation_rate * math.cos(phi) / radius
        self.f0 = float(f0)
        self.beta = float(beta)

    def _f(self, grid, ly):
        y = grid.yF if ly == Face else grid.yC
        return self.f0 + self.beta * y

    # v̄ˣʸ lands at (f,c,c) -> f evaluated at Center in y; ūˣʸ at (c,f,c) ->
    # f at Face in y (reference beta_plane.jl fv/fu placement).
    def x_f_cross_U(self, grid, u, v, w):
        return -self._f(grid, Center) * ix_f(iy_c(v))

    def y_f_cross_U(self, grid, u, v, w):
        return self._f(grid, Face) * iy_f(ix_c(u))

    def __repr__(self):
        return f"BetaPlane(f0={self.f0:g}, beta={self.beta:g})"

    def __eq__(self, other):
        return (type(self) is type(other)
                and (self.f0, self.beta) == (other.f0, other.beta))

    def __hash__(self):
        return hash(("BetaPlane", self.f0, self.beta))


class NonTraditionalBetaPlane(AbstractCoriolis):
    """Non-traditional β-plane (Dellar 2011): horizontal rotation components
    retained, vertical variation of both (reference
    ``non_traditional_beta_plane.jl:21``):

    fz(y) = 2Ω sinφ₀ + βy,  fy(z) = 2Ω cosφ₀ + γz
    with β = 2Ω cosφ₀/R, γ = -4Ω sinφ₀/R.
    """

    def __init__(self, fz=None, fy=None, beta=None, gamma=None,
                 rotation_rate=Omega_Earth, latitude=None, radius=6.371e6):
        if latitude is not None:
            phi = math.radians(latitude)
            fz = 2.0 * rotation_rate * math.sin(phi)
            fy = 2.0 * rotation_rate * math.cos(phi)
            beta = 2.0 * rotation_rate * math.cos(phi) / radius
            gamma = -4.0 * rotation_rate * math.sin(phi) / radius
        self.fz0 = float(fz)
        self.fy0 = float(fy)
        self.beta = float(beta)
        self.gamma = float(gamma)

    def _fz(self, grid, ly):
        y = grid.yF if ly == Face else grid.yC
        return self.fz0 + self.beta * y

    def _fy(self, grid, lz):
        z = grid.zF if lz == Face else grid.zC
        return self.fy0 + self.gamma * z

    def x_f_cross_U(self, grid, u, v, w):
        return (self._fy(grid, Center) * ix_f(iz_c(w))
                - self._fz(grid, Center) * ix_f(iy_c(v)))

    def y_f_cross_U(self, grid, u, v, w):
        return self._fz(grid, Face) * iy_f(ix_c(u))

    def z_f_cross_U(self, grid, u, v, w):
        return -self._fy(grid, Face) * iz_f(ix_c(u))

    def __repr__(self):
        return (f"NonTraditionalBetaPlane(fz={self.fz0:g}, fy={self.fy0:g}, "
                f"beta={self.beta:g}, gamma={self.gamma:g})")

    def __eq__(self, other):
        return (type(self) is type(other)
                and (self.fz0, self.fy0, self.beta, self.gamma)
                == (other.fz0, other.fy0, other.beta, other.gamma))

    def __hash__(self):
        return hash(("NTBP", self.fz0, self.fy0, self.beta, self.gamma))


class HydrostaticSphericalCoriolis(AbstractCoriolis):
    """f = 2Ω sin(φ) on a latitude-longitude (or curvilinear spherical)
    grid, with the energy-conserving vorticity-scheme discretization
    (reference ``hydrostatic_spherical_coriolis.jl:14``).

    The Coriolis acceleration is applied with metric-weighted interpolation:
    (f × U)_x at (f,c,c) = -f · ℑxᶠ(ℑyᶜ(Δx·v·dy-area weights)) — here the
    energy-conserving scheme interpolates mass fluxes (Ay v / Ax u).
    """

    def __init__(self, rotation_rate=Omega_Earth,
                 scheme="enstrophy_conserving"):
        if scheme not in ("enstrophy_conserving", "energy_conserving"):
            raise ValueError(f"unknown Coriolis scheme {scheme!r}")
        self.rotation_rate = float(rotation_rate)
        self.scheme = scheme

    def _f_ff(self, grid):
        # f at (f,f,*) vorticity points
        phi = grid.phiF  # degrees latitude at y-faces
        return 2.0 * self.rotation_rate * jnp.sin(jnp.deg2rad(phi))

    def x_f_cross_U(self, grid, u, v, w):
        f = self._f_ff(grid)
        # length-weighted v average to (f,c,c) (reference
        # `hydrostatic_spherical_coriolis.jl:62-83`: Δx_qᶜᶠᶜ(v)/Δxᶠᶜᶜ)
        dxv = grid.dx(Center, Face) * v
        if self.scheme == "energy_conserving":
            num = iy_c(f * ix_f(dxv))
        else:
            num = iy_c(f) * ix_f(iy_c(dxv))
        return -num / grid.dx(Face, Center)

    def y_f_cross_U(self, grid, u, v, w):
        f = self._f_ff(grid)
        dyu = grid.dy(Center, Face) * u
        if self.scheme == "energy_conserving":
            num = ix_c(f * iy_f(dyu))
        else:
            num = ix_c(f) * iy_f(ix_c(dyu))
        return num / grid.dy(Face, Center)

    def __repr__(self):
        return (f"HydrostaticSphericalCoriolis(Ω={self.rotation_rate:g}, "
                f"{self.scheme})")

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.rotation_rate == other.rotation_rate
                and self.scheme == other.scheme)

    def __hash__(self):
        return hash(("HSC", self.rotation_rate, self.scheme))

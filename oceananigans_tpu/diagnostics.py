"""Runtime diagnostics: CFL numbers and state checking.

Reference: ``src/Diagnostics/`` (SURVEY.md §2.16) — ``CFL``/``AdvectiveCFL``
(``cfl.jl:9-33``), ``DiffusiveCFL``, ``StateChecker``
(``state_checker.jl``).
"""

from __future__ import annotations

import jax.numpy as jnp

from oceananigans_tpu.advection import cell_advection_timescale
from oceananigans_tpu.fields import interior
from oceananigans_tpu.grids.base import Face

__all__ = ["AdvectiveCFL", "DiffusiveCFL", "CFL", "StateChecker",
           "seawater_density", "BoundaryAdjacentMean",
           "boundary_adjacent_mean"]


def seawater_density(model, state, temperature=None, salinity=None,
                     geopotential_height=None):
    """In-situ (or potential) seawater density ρ = ρ₀ (1 − b/g) at
    (c,c,c) from the model's SeawaterBuoyancy equation of state
    (reference ``src/Models/seawater_density.jl``: seawater_density
    KernelFunctionOperation). ``geopotential_height``: defaults to the
    cell-center z (in-situ density); pass a constant (e.g. ``0``) for a
    potential density referenced to that height."""
    from oceananigans_tpu.buoyancy import SeawaterBuoyancy

    buoyancy = model.buoyancy
    if hasattr(buoyancy, "formulation"):   # BuoyancyForce wrapper
        buoyancy = buoyancy.formulation
    if not isinstance(buoyancy, SeawaterBuoyancy):
        raise ValueError("seawater_density requires a model with "
                         f"SeawaterBuoyancy, got {buoyancy!r}")
    T = temperature if temperature is not None else (
        state.tracers["T"] if buoyancy.constant_temperature is None
        else buoyancy.constant_temperature)
    S = salinity if salinity is not None else (
        state.tracers["S"] if buoyancy.constant_salinity is None
        else buoyancy.constant_salinity)
    Z = geopotential_height if geopotential_height is not None \
        else model.grid.zC
    eos = buoyancy.eos
    g = buoyancy.g
    if hasattr(eos, "rho0"):
        rho0 = eos.rho0
        try:
            b = eos.buoyancy(g, T, S, z=Z)
        except TypeError:
            b = eos.buoyancy(g, T, S)
        return rho0 * (1.0 - b / g)
    # linear EOS carries no reference density: return the Boussinesq
    # density anomaly ρ′ = −ρ₀ b / g with ρ₀ = 1 (per unit ρ₀)
    b = eos.buoyancy(g, T, S)
    return -b / g


class AdvectiveCFL:
    """CFL = Δt · max(|u|/Δx + |v|/Δy + |w|/Δz) (reference ``cfl.jl:9``)."""

    def __init__(self, dt):
        self.dt = dt

    def __call__(self, model, state):
        dt = self.dt(state) if callable(self.dt) else self.dt
        tau = cell_advection_timescale(model.grid, state.u, state.v,
                                       state.w)
        return dt / tau


CFL = AdvectiveCFL


class DiffusiveCFL:
    """CFL_κ = Δt · max(ν, κ) / min(Δ)² (reference ``cfl.jl:33``)."""

    def __init__(self, dt):
        self.dt = dt

    def __call__(self, model, state):
        dt = self.dt(state) if callable(self.dt) else self.dt
        closure = model.closure
        nu_max = 0.0
        for c in ([closure] if not isinstance(closure, (tuple, list))
                  else closure):
            if c is None:
                continue
            nu = getattr(c, "nu", 0.0)
            kappa = getattr(c, "kappa", 0.0)
            if isinstance(kappa, dict):
                kappa = max(kappa.values(), default=0.0)
            nu_max = max(nu_max, float(nu), float(kappa))
        dmin = min(float(model.grid.min_spacing(ax)) for ax in range(3)
                   if model.grid.N[ax] > 1)
        return dt * nu_max / dmin ** 2


class StateChecker:
    """Per-field |min|/|max|/mean summary (reference ``state_checker.jl``);
    call from a progress callback."""

    def __call__(self, model, state):
        out = {}
        for name, arr in state.fields().items():
            if getattr(arr, "ndim", 0) != 3:
                continue
            ai = interior(model.grid, arr) if arr.shape[2] > 1 else arr
            out[name] = (float(jnp.min(ai)), float(jnp.max(ai)),
                         float(jnp.mean(ai)))
        return out

    def report(self, model, state):
        rows = self.__call__(model, state)
        lines = [f"{name}: min={mn:+.6e} max={mx:+.6e} mean={me:+.6e}"
                 for name, (mn, mx, me) in rows.items()]
        return "\n".join(lines)


class BoundaryAdjacentMean:
    """Area-weighted mean of a field over the interior plane adjacent to
    one boundary side (reference ``src/Models/boundary_mean.jl``
    ``BoundaryAdjacentMean``: the normal-area-weighted lateral mean used
    to correct open-boundary matching schemes). Functional form: call
    with (grid, field) and read ``.value``, or use the module function
    ``boundary_adjacent_mean`` directly inside jit."""

    def __init__(self, grid, side):
        self.side = side
        self.value = 0.0

    def __call__(self, grid, field, loc=None):
        self.value = boundary_adjacent_mean(grid, field, self.side,
                                            loc=loc)
        return self.value


def boundary_adjacent_mean(grid, field, side, loc=None):
    """Σ(q A_n)/Σ(A_n) over the first interior plane adjacent to
    ``side`` ("west"/"east"/"south"/"north"/"bottom"/"top"), with A_n
    the boundary-normal face area (``boundary_mean.jl``
    ``boundary_normal_area``)."""
    from oceananigans_tpu.grids.base import Center
    axis = {"west": 0, "east": 0, "south": 1, "north": 1,
            "bottom": 2, "top": 2}[side]
    first = side in ("west", "south", "bottom")
    sx, sy, sz = grid.interior_slices
    sl = [sx, sy, sz]
    H, N = grid.H[axis], grid.N[axis]
    sl[axis] = slice(H, H + 1) if first else slice(H + N - 1, H + N)
    if axis == 0:
        A = grid.Ax(Face, Center, Center)
    elif axis == 1:
        A = grid.Ay(Center, Face, Center)
    else:
        A = grid.Az(Center, Center)
    A = jnp.broadcast_to(A, grid.shape)[tuple(sl)]
    q = field[tuple(sl)]
    return jnp.sum(q * A) / jnp.sum(A)

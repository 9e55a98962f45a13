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
           "seawater_density"]


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

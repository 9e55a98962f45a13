"""Biogeochemistry plug-in interface.

Reference: ``src/Biogeochemistry.jl`` (SURVEY.md §2.12) — models call four
hooks: ``required_biogeochemical_tracers``, ``biogeochemical_transition``
(per-tracer reaction term), ``biogeochemical_drift_velocity`` (e.g.
sinking), and ``update_tendencies!`` (post-pass), consumed at
``compute_nonhydrostatic_tendencies.jl:51``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Biogeochemistry", "SimpleBiogeochemistry"]


class Biogeochemistry:
    """Subclass and override; all hooks are pure functions."""

    required_tracers: tuple = ()

    def transition(self, grid, name, time, fields):
        """Reaction source/sink for tracer ``name`` at cell centers."""
        return None

    def drift_velocity(self, name):
        """(wu, wv, ww) additional drift (e.g. sinking speed ww < 0), or
        None."""
        return None

    def update_tendencies(self, grid, tendencies, time, fields):
        """Arbitrary post-pass over the tendency dict; return it."""
        return tendencies


class SimpleBiogeochemistry(Biogeochemistry):
    """A configurable single-equation BGC: growth/decay rate plus sinking
    (the common NP-style building block; full ecosystem models plug in the
    same way the reference's OceanBioME does)."""

    def __init__(self, tracer="P", growth_rate=None, sinking_speed=0.0):
        self.required_tracers = (tracer,)
        self.tracer = tracer
        self.growth_rate = growth_rate
        self.sinking_speed = float(sinking_speed)

    def transition(self, grid, name, time, fields):
        if name != self.tracer or self.growth_rate is None:
            return None
        mu = self.growth_rate
        if callable(mu):
            z = grid.zC
            mu = mu(z, time)
        return mu * fields[name]

    def drift_velocity(self, name):
        if name == self.tracer and self.sinking_speed != 0.0:
            return (0.0, 0.0, -abs(self.sinking_speed))
        return None

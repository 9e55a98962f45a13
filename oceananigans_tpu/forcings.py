"""Forcing terms: continuous/discrete user functions, relaxation.

Reference layer: ``src/Forcings/`` (SURVEY.md §2.12) —
``ContinuousForcing`` (``continuous_forcing.jl:14``), ``DiscreteForcing``
(``discrete_forcing.jl:10``), ``Relaxation`` + masks/targets
(``relaxation.jl:17``), ``AdvectiveForcing`` (``advective_forcing.jl:9``),
``MultipleForcings``.

Functional design: a forcing is reduced at model construction to a callable
``(grid, time, fields) -> tendency contribution`` evaluated inside the
jitted step; ``fields`` is a dict of all prognostic arrays. Continuous
forcings receive broadcast-ready staggered coordinates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu.fields import location_coords

__all__ = ["Forcing", "ContinuousForcing", "DiscreteForcing", "Relaxation",
           "GaussianMask", "LinearTarget", "MultipleForcings",
           "AdvectiveForcing", "split_advective_forcings",
           "materialize_forcing"]


class ContinuousForcing:
    """``func(x, y, z, t, *field_args, *parameters)`` evaluated at the
    forced field's staggered nodes (reference ``continuous_forcing.jl:14``).
    ``field_dependencies`` names prognostic fields passed positionally after
    the coordinates (at their own locations — collocation interpolation is
    the caller's concern for C-grid-critical uses)."""

    def __init__(self, func, parameters=None, field_dependencies=()):
        self.func = func
        self.parameters = parameters
        if isinstance(field_dependencies, str):
            field_dependencies = (field_dependencies,)
        self.field_dependencies = tuple(field_dependencies)

    def __call__(self, grid, loc, time, fields):
        x, y, z = location_coords(grid, loc)
        args = tuple(fields[name] for name in self.field_dependencies)
        if self.parameters is not None:
            return self.func(x, y, z, time, *args, self.parameters)
        return self.func(x, y, z, time, *args)


def Forcing(func, parameters=None, field_dependencies=(), discrete_form=False):
    """User-facing constructor (reference ``forcing.jl``)."""
    if discrete_form:
        return DiscreteForcing(func, parameters)
    return ContinuousForcing(func, parameters, field_dependencies)


class DiscreteForcing:
    """``func(grid, loc, time, fields[, parameters])`` — full access to the
    discrete state (reference ``discrete_forcing.jl:10``)."""

    def __init__(self, func, parameters=None):
        self.func = func
        self.parameters = parameters

    def __call__(self, grid, loc, time, fields):
        if self.parameters is not None:
            return self.func(grid, loc, time, fields, self.parameters)
        return self.func(grid, loc, time, fields)


class GaussianMask:
    """exp(−(r−center)²/(2 width²)) mask in one coordinate (reference
    ``relaxation.jl`` `GaussianMask`)."""

    def __init__(self, center, width, coordinate="z"):
        self.center = float(center)
        self.width = float(width)
        self.coordinate = coordinate

    def __call__(self, x, y, z):
        r = {"x": x, "y": y, "z": z}[self.coordinate]
        return jnp.exp(-((r - self.center) ** 2) / (2.0 * self.width ** 2))


class LinearTarget:
    """target = intercept + gradient · coord (reference ``relaxation.jl``
    `LinearTarget`)."""

    def __init__(self, intercept, gradient, coordinate="z"):
        self.intercept = float(intercept)
        self.gradient = float(gradient)
        self.coordinate = coordinate

    def __call__(self, x, y, z, t):
        r = {"x": x, "y": y, "z": z}[self.coordinate]
        return self.intercept + self.gradient * r


class Relaxation:
    """F = −rate · mask(x,y,z) · (q − target) (reference
    ``relaxation.jl:17``)."""

    def __init__(self, rate, mask=1.0, target=0.0):
        self.rate = float(rate)
        self.mask = mask
        self.target = target

    def __call__(self, grid, loc, time, fields, field_name=None):
        x, y, z = location_coords(grid, loc)
        mask = self.mask(x, y, z) if callable(self.mask) else self.mask
        target = (self.target(x, y, z, time) if callable(self.target)
                  else self.target)
        q = fields[field_name]
        return -self.rate * mask * (q - target)


class MultipleForcings:
    """Sum of forcings (reference ``multiple_forcings.jl``)."""

    def __init__(self, *forcings):
        self.forcings = tuple(forcings)


class AdvectiveForcing:
    """Forcing representing advection by an EXTRA velocity field
    (u, v, w) — e.g. particle sinking (reference
    ``advective_forcing.jl:9``). Following the reference's
    ``with_advective_forcing``/``sum_of_velocities`` treatment, the extra
    velocities are added to the model's advecting velocity inside the
    forced tracer's own advection term, so the flux uses the model's
    advection scheme (no separate lower-order divergence).

    Components may be numbers or callables ``f(x, y, z)`` evaluated at the
    staggered velocity locations. Only tracer fields support advective
    forcing (as in practice in the reference; velocity advective forcing
    raises at model construction).
    """

    def __init__(self, u=0.0, v=0.0, w=0.0):
        self.u = u
        self.v = v
        self.w = w

    def velocities(self, grid):
        """(u', v', w') materialized at (f,c,c)/(c,f,c)/(c,c,f)."""
        from oceananigans_tpu.fields import LOC_U, LOC_V, LOC_W, set_field
        out = []
        for comp, loc in ((self.u, LOC_U), (self.v, LOC_V),
                          (self.w, LOC_W)):
            if callable(comp):
                f3 = lambda x, y, z, _c=comp: _c(x, y, z)
                out.append(set_field(grid, f3, loc))
            else:
                out.append(set_field(grid, float(comp), loc))
        return tuple(out)

    def __repr__(self):
        return f"AdvectiveForcing(u={self.u!r}, v={self.v!r}, w={self.w!r})"


def split_advective_forcings(spec):
    """Split a user forcing spec into (advective forcings tuple, rest):
    AdvectiveForcing entries are pulled out (also from inside
    MultipleForcings) to be summed into the advecting velocity; the rest
    goes through ``materialize_forcing``."""
    if isinstance(spec, AdvectiveForcing):
        return (spec,), None
    if isinstance(spec, MultipleForcings):
        adv = tuple(f for f in spec.forcings
                    if isinstance(f, AdvectiveForcing))
        rest = tuple(f for f in spec.forcings
                     if not isinstance(f, AdvectiveForcing))
        if not adv:
            return (), spec
        return adv, (MultipleForcings(*rest) if rest else None)
    return (), spec


class FieldTimeSeriesForcing:
    """Forcing interpolated in time from a stored time series — the
    reference's FieldTimeSeries-as-forcing path
    (``src/OutputReaders/field_time_series_indexing.jl``; auto-updated in
    the model loop). Interpolation is traced (searchsorted + blend), so it
    lives inside the jitted step with no host round trips.

    ``fts`` is an :class:`~oceananigans_tpu.output.FieldTimeSeries` or any
    object with ``times`` (T,) and ``data`` (T, nx, ny, nz); data must be
    interior-shaped for the forced field's grid.
    """

    def __init__(self, fts):
        self.times = jnp.asarray(np.asarray(fts.times))
        self.data = jnp.asarray(np.asarray(fts.data))

    def __call__(self, grid, loc, time, fields):
        t = jnp.clip(time, self.times[0], self.times[-1])
        i = jnp.clip(jnp.searchsorted(self.times, t, side="right") - 1,
                     0, self.times.shape[0] - 2)
        t0 = self.times[i]
        t1 = self.times[i + 1]
        f = (t - t0) / jnp.maximum(t1 - t0, 1e-30)
        d0 = jax.lax.dynamic_index_in_dim(self.data, i, 0, keepdims=False)
        d1 = jax.lax.dynamic_index_in_dim(self.data, i + 1, 0,
                                          keepdims=False)
        val = (1.0 - f) * d0 + f * d1
        sx, sy, sz = grid.interior_slices
        out = jnp.zeros(grid.shape, val.dtype)
        return out.at[sx, sy, sz].set(val)


def materialize_forcing(forcing, name, loc):
    """Normalize a user forcing spec to ``(grid, time, fields) -> array``.

    Accepts: None, a number, a plain callable ``f(x, y, z, t)``, a
    Continuous/DiscreteForcing, a Relaxation, or MultipleForcings.
    """
    if forcing is None:
        return None
    if isinstance(forcing, MultipleForcings):
        parts = [materialize_forcing(f, name, loc) for f in forcing.forcings]
        def summed(grid, time, fields):
            out = 0.0
            for p in parts:
                out = out + p(grid, time, fields)
            return out
        return summed
    if isinstance(forcing, Relaxation):
        return lambda grid, time, fields: forcing(grid, loc, time, fields,
                                                  field_name=name)
    if isinstance(forcing, (ContinuousForcing, DiscreteForcing,
                            FieldTimeSeriesForcing)):
        return lambda grid, time, fields: forcing(grid, loc, time, fields)
    if hasattr(forcing, "times") and hasattr(forcing, "data"):
        fts = FieldTimeSeriesForcing(forcing)
        return lambda grid, time, fields: fts(grid, loc, time, fields)
    if callable(forcing):
        cf = ContinuousForcing(forcing)
        return lambda grid, time, fields: cf(grid, loc, time, fields)
    # constant
    value = forcing
    return lambda grid, time, fields: value

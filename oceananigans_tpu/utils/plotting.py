"""Matplotlib field-plotting helpers — the Makie-extension analog.

Reference capability: ``ext/OceananigansMakieExt.jl:1-197`` (heatmap /
surface / lines recipes for ``Field``s with automatic dimensionality
deduction and grid-aware axis labels). Here fields are plain arrays on a
grid, so the helpers take ``(grid, field)``; they deduce the varying
dimensions, pick the right coordinate vectors for the field's staggered
location, label axes per grid family (meters for rectilinear, degrees
for lat-lon), and mask immersed regions with NaN so solid cells render
blank — the same conveniences the Makie recipes provide.

Usage::

    from oceananigans_tpu.utils.plotting import fieldplot, heatmap

    heatmap(grid, state.b)          # 2-D pcolormesh with labeled axes
    fieldplot(grid, state.tracers["T"])   # auto: line for 1-D, heatmap 2-D
"""

from __future__ import annotations

import numpy as np

from oceananigans_tpu.fields import LOC_C
from oceananigans_tpu.grids.base import Center

__all__ = ["fieldplot", "heatmap", "lineplot", "deduce_dimensionality"]


def _underlying(grid):
    from oceananigans_tpu.immersed import ImmersedBoundaryGrid
    return grid.underlying_grid if isinstance(grid, ImmersedBoundaryGrid) \
        else grid


def _axis_labels(grid):
    from oceananigans_tpu.grids.latlon import LatitudeLongitudeGrid
    g = _underlying(grid)
    if isinstance(g, LatitudeLongitudeGrid):
        return ("Longitude (deg)", "Latitude (deg)", "z (m)")
    return ("x (m)", "y (m)", "z (m)")


def deduce_dimensionality(grid, a):
    """(d1, d2, D): first/last varying dimension and total dimensionality
    of the field's interior (reference ``deduce_dimensionality``,
    ``OceananigansMakieExt.jl:33-46``)."""
    interior = np.asarray(grid.interior(np.asarray(a)))
    shape = interior.shape[-3:]
    varying = [i for i, n in enumerate(shape) if n > 1]
    d1 = varying[0] if varying else 0
    d2 = varying[-1] if varying else 0
    return d1, d2, len(varying)


def _coords(grid, axis, loc):
    g = _underlying(grid)
    return np.asarray(g.nodes_1d(axis, loc[axis]))


def _masked_interior(grid, a, loc):
    """Interior values with immersed cells as NaN (reference
    ``convert_field_argument`` masking with NaN)."""
    from oceananigans_tpu.immersed import ImmersedBoundaryGrid
    vals = np.array(grid.interior(np.asarray(a)), dtype=float)
    if isinstance(grid, ImmersedBoundaryGrid):
        name = {0: "solid_c", 1: "solid_c", 2: "solid_c"}
        solid = np.asarray(grid.interior(np.asarray(
            getattr(grid, name.get(0)))))
        solid = np.broadcast_to(solid, vals.shape)
        vals = np.where(solid, np.nan, vals)
    return vals


def lineplot(grid, a, loc=LOC_C, ax=None, **kwargs):
    """1-D field -> line plot along its varying dimension."""
    import matplotlib.pyplot as plt
    d1, _, D = deduce_dimensionality(grid, a)
    if D > 1:
        raise ValueError(f"lineplot needs a 1-D field, got D={D}")
    vals = _masked_interior(grid, a, loc).reshape(-1)
    x = _coords(grid, d1, loc)[:vals.size]
    if ax is None:
        _, ax = plt.subplots()
    labels = _axis_labels(grid)
    if d1 == 2:   # vertical profile: value on x, z on y
        line, = ax.plot(vals, x, **kwargs)
        ax.set_ylabel(labels[2])
    else:
        line, = ax.plot(x, vals, **kwargs)
        ax.set_xlabel(labels[d1])
    return line


def heatmap(grid, a, loc=LOC_C, ax=None, colorbar=True, **kwargs):
    """2-D field -> pcolormesh with grid-aware axis labels (reference
    Makie ``heatmap(::Field)`` recipe). Returns the QuadMesh."""
    import matplotlib.pyplot as plt
    d1, d2, D = deduce_dimensionality(grid, a)
    if D != 2:
        raise ValueError(f"heatmap needs a 2-D field, got D={D}")
    vals = np.squeeze(_masked_interior(grid, a, loc))
    x1 = _coords(grid, d1, loc)[:vals.shape[0]]
    x2 = _coords(grid, d2, loc)[:vals.shape[1]]
    if ax is None:
        _, ax = plt.subplots()
    mesh = ax.pcolormesh(x1, x2, vals.T, **kwargs)
    labels = _axis_labels(grid)
    ax.set_xlabel(labels[d1])
    ax.set_ylabel(labels[d2])
    if colorbar:
        ax.figure.colorbar(mesh, ax=ax)
    return mesh


def fieldplot(grid, a, loc=LOC_C, ax=None, **kwargs):
    """Auto-dispatching plot: line for 1-D fields, heatmap for 2-D
    (reference ``_create_plot(::Function, ::Dict, ::Field)``)."""
    _, _, D = deduce_dimensionality(grid, a)
    if D <= 1:
        return lineplot(grid, a, loc=loc, ax=ax, **kwargs)
    if D == 2:
        return heatmap(grid, a, loc=loc, ax=ax, **kwargs)
    raise ValueError(
        "3-D field: slice it first (e.g. a[:, :, k]) or reduce it; "
        "volume rendering has no matplotlib analog")

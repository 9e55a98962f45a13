"""Six-panel conformal cubed-sphere grid with inter-panel halo exchange.

Reference: ``src/MultiRegion/cubed_sphere_grid.jl`` +
``cubed_sphere_connectivity.jl`` + ``cubed_sphere_partitions.jl``
(SURVEY.md §2.17). The reference builds a MultiRegion of 6 panels with
hand-coded rotated connectivity; here the TPU-native layout is a STACKED
panel axis — fields are (6, nx, ny, nz) arrays, panel-local operators
``vmap`` over the leading axis — and the connectivity (which neighbor
panel, which side, index order, velocity-component rotation) is derived
NUMERICALLY by matching edge node coordinates between panels, which
eliminates the orientation-bug class entirely.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu.config import config
from oceananigans_tpu.grids.base import Face
from oceananigans_tpu.grids.cubed_sphere import (
    conformal_cubed_sphere_mapping,
)
from oceananigans_tpu.grids.latlon import R_EARTH
from oceananigans_tpu.grids.orthogonal import OrthogonalSphericalShellGrid

__all__ = ["ConformalCubedSphereGrid", "cubed_sphere_halo_exchange"]

# rotations taking the TOP panel onto the 6 cube faces
_PANEL_ROTATIONS = [
    np.eye(3),                                           # 0: +z (top)
    np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]]).T,      # 1: +x
    np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]]).T,      # 2: +y
    np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]]).T,      # 3: -x
    np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]]).T,      # 4: -y
    np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]]),       # 5: -z (bottom)
]

_SIDES = ("west", "east", "south", "north")


def _panel_xyz(p, x, y):
    """Cartesian points of panel p at panel coordinates (x, y)."""
    X, Y, Z = conformal_cubed_sphere_mapping(x, y)
    P = np.stack([X, Y, Z], axis=-1)
    return P @ np.asarray(_PANEL_ROTATIONS[p]).T


def _edge_nodes(p, side, N, offset):
    """(N,) cartesian nodes along an interior line ``offset`` cells inside
    ``side`` of panel p (offset 0 = on the edge), at cell-center spacing."""
    t = -1.0 + (2.0 / N) * (np.arange(N) + 0.5)
    d = 2.0 / N
    if side == "west":
        x = np.full(N, -1.0 + offset * d)
        y = t
    elif side == "east":
        x = np.full(N, 1.0 - offset * d)
        y = t
    elif side == "south":
        x = t
        y = np.full(N, -1.0 + offset * d)
    else:
        x = t
        y = np.full(N, 1.0 - offset * d)
    return _panel_xyz(p, x, y)


@lru_cache(None)
def _connectivity(N: int):
    """For each (panel, side): (neighbor_panel, neighbor_side, reversed).

    Derived by matching the ON-EDGE node sets numerically."""
    conn = {}
    edges = {(p, s): _edge_nodes(p, s, N, 0.0)
             for p in range(6) for s in _SIDES}
    for (p, s), pts in edges.items():
        for (q, r), qts in edges.items():
            if q == p:
                continue
            if np.allclose(pts, qts, atol=1e-10):
                conn[(p, s)] = (q, r, False)
                break
            if np.allclose(pts, qts[::-1], atol=1e-10):
                conn[(p, s)] = (q, r, True)
                break
        if (p, s) not in conn:
            raise RuntimeError(f"no neighbor found for panel {p} side {s}")
    return conn


class ConformalCubedSphereGrid:
    """Six conformal panels + numeric connectivity. Fields live as
    (6, nx, ny, nz) stacked arrays; ``panel_grid`` is the shared
    per-panel OrthogonalSphericalShellGrid (all panels are congruent)."""

    def __init__(self, panel_size, z, radius=R_EARTH, halo=None,
                 dtype=None):
        from oceananigans_tpu.grids.cubed_sphere import (
            conformal_cubed_sphere_panel,
        )
        if halo is None:
            halo = min(config.halo, 2)
        N, Nz = panel_size
        self.N_panel = N
        self.panel_grid = conformal_cubed_sphere_panel(
            (N, N, Nz), z=z, radius=radius, halo=halo, dtype=dtype)
        self.connectivity = _connectivity(N)
        self.rotations = _PANEL_ROTATIONS

        # per-panel geographic coordinates at centers (for set_field-style
        # initialization)
        g = self.panel_grid
        t = -1.0 + (2.0 / N) * (np.arange(N) + 0.5)
        XX, YY = np.meshgrid(t, t, indexing="ij")
        lams, phis = [], []
        for p in range(6):
            P = _panel_xyz(p, XX.ravel(), YY.ravel()).reshape(N, N, 3)
            phis.append(np.rad2deg(np.arcsin(np.clip(P[..., 2], -1, 1))))
            lams.append(np.rad2deg(np.arctan2(P[..., 1], P[..., 0])))
        self.lam_cc = np.stack(lams)    # (6, N, N)
        self.phi_cc = np.stack(phis)

    def new_field(self, dtype=None):
        g = self.panel_grid
        return jnp.zeros((6, *g.shape),
                         dtype or np.dtype(config.float_dtype))

    def set_tracer(self, fn):
        """Build a (6, nx, ny, nz) tracer from ``fn(lam, phi, z)``
        (degrees; z broadcast)."""
        g = self.panel_grid
        full = np.zeros((6, *g.shape))
        sx, sy, sz = g.interior_slices
        zc = np.asarray(g.zC).reshape(-1)[sz] if g.shape[2] > 1 else \
            np.zeros(g.Nz)
        for p in range(6):
            vals = fn(self.lam_cc[p][:, :, None],
                      self.phi_cc[p][:, :, None],
                      zc[None, None, :])
            full[p][sx, sy, sz] = vals
        return jnp.asarray(full, config.float_dtype)

    def __repr__(self):
        return (f"ConformalCubedSphereGrid(panels=6, "
                f"N={self.N_panel}, Nz={self.panel_grid.Nz})")


def cubed_sphere_halo_exchange(a, grid: ConformalCubedSphereGrid,
                               width=None):
    """Fill the x/y halos of a stacked (6, nx, ny, nz) CENTER-located
    field from the neighboring panels (reference
    ``multi_region_boundary_conditions.jl`` inter-region fill, with the
    cubed-sphere rotated connectivity)."""
    g = grid.panel_grid
    H = g.Hx if width is None else width
    N = g.Nx
    out = a

    def interior_line(ap, side, offset):
        """(N, nz) line of interior cells ``offset`` in from ``side``."""
        sx, sy, _ = g.interior_slices
        if side == "west":
            return ap[g.Hx + offset, sy, :]
        if side == "east":
            return ap[g.Hx + N - 1 - offset, sy, :]
        if side == "south":
            return ap[sx, g.Hy + offset, :]
        return ap[sx, g.Hy + N - 1 - offset, :]

    for p in range(6):
        for side in _SIDES:
            q, r, rev = grid.connectivity[(p, side)]
            for h in range(H):
                line = interior_line(a[q], r, h)
                if rev:
                    line = line[::-1]
                sy = g.interior_slices[1]
                sx = g.interior_slices[0]
                if side == "west":
                    out = out.at[p, g.Hx - 1 - h, sy, :].set(line)
                elif side == "east":
                    out = out.at[p, g.Hx + N + h, sy, :].set(line)
                elif side == "south":
                    out = out.at[p, sx, g.Hy - 1 - h, :].set(line)
                else:
                    out = out.at[p, sx, g.Hy + N + h, :].set(line)
    return out

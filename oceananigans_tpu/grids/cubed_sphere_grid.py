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


def _tangent(p, x, y, axis, h=1e-6):
    """Unit tangent of panel p's grid direction at panel coords (x, y)."""
    if axis == 0:
        d = _panel_xyz(p, np.atleast_1d(x + h), np.atleast_1d(y)) \
            - _panel_xyz(p, np.atleast_1d(x - h), np.atleast_1d(y))
    else:
        d = _panel_xyz(p, np.atleast_1d(x), np.atleast_1d(y + h)) \
            - _panel_xyz(p, np.atleast_1d(x), np.atleast_1d(y - h))
    d = d[0]
    return d / np.linalg.norm(d)


@lru_cache(None)
def _velocity_maps(N: int, H: int):
    """Numerically-derived gather maps for the staggered velocity halo
    exchange: for every halo slot of every panel side, which neighbor
    panel/component/index supplies it and with which sign (the
    velocity-component rotation across rotated panel edges).

    Maps are exact because the conformal panels share their staggered
    point lattices along edges (verified to ~1e-15 in tests)."""
    d = 2.0 / N
    Hx = Hy = H

    def coords(comp, i, j):
        """Panel coords of staggered point (array indices i, j)."""
        if comp == "u":
            return -1.0 + (i - Hx) * d, -1.0 + (j - Hy + 0.5) * d
        return -1.0 + (i - Hx + 0.5) * d, -1.0 + (j - Hy) * d

    # source tables: interior staggered points of every panel
    src_pts = {}
    src_idx = {}
    for comp in ("u", "v"):
        if comp == "u":
            ii = np.arange(Hx, Hx + N + 1)      # x-faces incl shared edge
            jj = np.arange(Hy, Hy + N)
        else:
            ii = np.arange(Hx, Hx + N)
            jj = np.arange(Hy, Hy + N + 1)
        I, J = np.meshgrid(ii, jj, indexing="ij")
        x, y = coords(comp, I.ravel().astype(float),
                      J.ravel().astype(float))
        src_idx[comp] = (I.ravel(), J.ravel())
        src_pts[comp] = {p: _panel_xyz(p, x, y) for p in range(6)}

    conn = _connectivity(N)
    maps = {}
    for p in range(6):
        for side in _SIDES:
            q = conn[(p, side)][0]
            for comp in ("u", "v"):
                # halo slots of this side (transverse range: interior)
                if side in ("west", "east"):
                    if side == "west":
                        ih = np.arange(0, Hx)
                    else:
                        ih = np.arange(Hx + N + (1 if comp == "u" else 0),
                                       2 * Hx + N + (1 if comp == "u"
                                                     else 0))
                        ih = ih[ih < 2 * Hx + N + 1]
                    jh = np.arange(Hy, Hy + N + (1 if comp == "v" else 0))
                else:
                    ih = np.arange(Hx, Hx + N + (1 if comp == "u" else 0))
                    if side == "south":
                        jh = np.arange(0, Hy)
                    else:
                        jh = np.arange(Hy + N + (1 if comp == "v" else 0),
                                       2 * Hy + N + (1 if comp == "v"
                                                     else 0))
                        jh = jh[jh < 2 * Hy + N + 1]
                I, J = np.meshgrid(ih, jh, indexing="ij")
                I = I.ravel()
                J = J.ravel()
                # clip to the actual array extent: u is (N+1+2H, N+2H),
                # v is (N+2H, N+1+2H)
                ni = 2 * Hx + N + (1 if comp == "u" else 0)
                nj = 2 * Hy + N + (1 if comp == "v" else 0)
                keep = (I < ni) & (J < nj)
                I, J = I[keep], J[keep]
                if I.size == 0:
                    continue
                x, y = coords(comp, I.astype(float), J.astype(float))
                P = _panel_xyz(p, x, y)
                # match against neighbor's u and v tables
                out_comp = np.empty(I.size, dtype="U1")
                out_i = np.zeros(I.size, np.int32)
                out_j = np.zeros(I.size, np.int32)
                out_s = np.zeros(I.size)
                for m in range(I.size):
                    best = None
                    for sc in ("u", "v"):
                        dist = np.linalg.norm(src_pts[sc][q] - P[m],
                                              axis=1)
                        k = int(np.argmin(dist))
                        if best is None or dist[k] < best[0]:
                            best = (dist[k], sc, k)
                    dist_k, sc, k = best
                    # tolerance: staggered points from different panels'
                    # corner series agree to the conformal-fit residual
                    # (~1e-7), far below the grid spacing
                    if dist_k > 1e-5:
                        raise RuntimeError(
                            f"no staggered match p{p} {side} {comp} "
                            f"(dist {dist_k:.2e})")
                    iq = int(src_idx[sc][0][k])
                    jq = int(src_idx[sc][1][k])
                    # sign: project the source component's tangent onto the
                    # receiving component's tangent
                    t_dst = _tangent(p, x[m], y[m], 0 if comp == "u" else 1)
                    xs, ys = coords(sc, float(iq), float(jq))
                    t_src = _tangent(q, xs, ys, 0 if sc == "u" else 1)
                    s = float(np.round(t_dst @ t_src))
                    if s == 0.0:
                        raise RuntimeError("non-orthogonal edge rotation")
                    out_comp[m] = sc
                    out_i[m] = iq
                    out_j[m] = jq
                    out_s[m] = s
                maps[(p, side, comp)] = (q, I, J, out_comp, out_i, out_j,
                                         out_s)
    return maps


def cubed_sphere_velocity_exchange(u, v, grid: ConformalCubedSphereGrid):
    """Fill the x/y halos of stacked (6, nx, ny, nz) u (x-face) and v
    (y-face) velocity components, applying the cross-edge component
    rotation (reference: the rotated connectivity of
    ``cubed_sphere_connectivity.jl`` applied to velocity fields)."""
    g = grid.panel_grid
    maps = _velocity_maps(grid.N_panel, g.Hx)
    out_u, out_v = u, v
    for (p, side, comp), (q, I, J, scomp, iq, jq, sgn) in maps.items():
        is_u = scomp == "u"
        src_u = u[q][iq, jq, :]
        src_v = v[q][iq, jq, :]
        vals = jnp.where(jnp.asarray(is_u)[:, None], src_u, src_v)
        vals = vals * jnp.asarray(sgn)[:, None]
        if comp == "u":
            out_u = out_u.at[p, I, J, :].set(vals)
        else:
            out_v = out_v.at[p, I, J, :].set(vals)
    return out_u, out_v


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

"""Six-panel cubed-sphere grid + inter-panel halo exchange tests
(reference MultiRegion/cubed_sphere test group)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu.grids.cubed_sphere_grid import (
    ConformalCubedSphereGrid, cubed_sphere_halo_exchange, _connectivity,
    _panel_xyz,
)


def test_connectivity_complete_and_symmetric():
    conn = _connectivity(16)
    assert len(conn) == 24
    # symmetry: if (p,s) -> (q,r), then (q,r) -> (p,s)
    for (p, s), (q, r, rev) in conn.items():
        q2, r2, rev2 = conn[(q, r)]
        assert (q2, r2) == (p, s)
        assert rev2 == rev


def test_halo_exchange_geographically_exact():
    """Every halo cell of every panel side receives the tracer value of
    its TRUE geographic location (the neighbor's matching interior cell)."""
    grid = ConformalCubedSphereGrid((16, 2), z=(-100.0, 0.0), halo=2)
    g = grid.panel_grid
    N, H, d = 16, g.Hx, 2.0 / 16
    t = -1.0 + d * (np.arange(N) + 0.5)

    def f(lam, phi):
        return (np.sin(np.deg2rad(phi))
                + 0.3 * np.cos(np.deg2rad(lam)) * np.cos(np.deg2rad(phi)))

    a = grid.set_tracer(lambda lam, phi, z: f(lam, phi) + 0 * z)
    af = cubed_sphere_halo_exchange(a, grid)
    kz = g.Hz
    sx, sy, _ = g.interior_slices
    err = 0.0
    for p in range(6):
        for side in ("west", "east", "south", "north"):
            for h in range(H):
                off = (h + 0.5) * d
                if side == "west":
                    x, y = np.full(N, -1.0 - off), t
                    got = np.asarray(af[p, g.Hx - 1 - h, sy, kz])
                elif side == "east":
                    x, y = np.full(N, 1.0 + off), t
                    got = np.asarray(af[p, g.Hx + N + h, sy, kz])
                elif side == "south":
                    x, y = t, np.full(N, -1.0 - off)
                    got = np.asarray(af[p, sx, g.Hy - 1 - h, kz])
                else:
                    x, y = t, np.full(N, 1.0 + off)
                    got = np.asarray(af[p, sx, g.Hy + N + h, kz])
                P = _panel_xyz(p, x, y)
                phi = np.rad2deg(np.arcsin(np.clip(P[..., 2], -1, 1)))
                lam = np.rad2deg(np.arctan2(P[..., 1], P[..., 0]))
                err = max(err, np.abs(got - f(lam, phi)).max())
    assert err < 1e-6


def test_panels_tile_the_sphere():
    """The 6 panels' cell areas sum to the full sphere area."""
    grid = ConformalCubedSphereGrid((16, 2), z=(-100.0, 0.0), halo=2)
    g = grid.panel_grid
    sx, sy, _ = g.interior_slices
    Az = np.asarray(g.Az("c", "c"))[sx, sy, 0]
    np.testing.assert_allclose(6 * Az.sum(), 4 * np.pi * g.radius ** 2,
                               rtol=0.01)

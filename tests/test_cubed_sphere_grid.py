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


def test_velocity_halo_exchange_solid_body_rotation():
    """Staggered velocity exchange with cross-edge component rotation:
    a solid-body-rotation vector field V = ω × P projected onto each
    panel's local (u, v) tangents must be reproduced in the halos
    (reference: rotated velocity connectivity of
    ``cubed_sphere_connectivity.jl``)."""
    from oceananigans_tpu.grids.cubed_sphere_grid import (
        _tangent,
        _velocity_maps,
        cubed_sphere_velocity_exchange,
    )

    N, H = 8, 2
    grid = ConformalCubedSphereGrid((N, 1), z=(-1.0, 0.0), radius=1.0,
                                    halo=H)
    omega = np.array([0.3, -0.5, 0.8])
    d = 2.0 / N

    def field(comp, ni, nj, with_halo):
        off = H if with_halo else 0
        ii = np.arange(ni) - off
        jj = np.arange(nj) - off
        if comp == "u":
            x, y = -1.0 + ii * d, -1.0 + (jj + 0.5) * d
        else:
            x, y = -1.0 + (ii + 0.5) * d, -1.0 + jj * d
        X, Y = np.meshgrid(x, y, indexing="ij")
        ax = 0 if comp == "u" else 1
        arrs = []
        for p in range(6):
            P = _panel_xyz(p, X.ravel(), Y.ravel()).reshape(*X.shape, 3)
            V = np.cross(omega, P)
            T = np.zeros_like(P)
            for k in range(X.shape[0]):
                for l in range(X.shape[1]):
                    T[k, l] = _tangent(p, X[k, l], Y[k, l], ax)
            arrs.append((V * T).sum(-1))
        return np.stack(arrs)

    # co-shaped convention: all fields are (N+2H, N+2H, nz); face
    # fields keep their N+1 meaningful faces at i in [H, H+N]
    ni_u = nj_u = ni_v = nj_v = N + 2 * H
    u = np.zeros((6, ni_u, nj_u, 1))
    v = np.zeros((6, ni_v, nj_v, 1))
    u[:, H:H + N + 1, H:H + N, 0] = field("u", N + 1, N, False)
    v[:, H:H + N, H:H + N + 1, 0] = field("v", N, N + 1, False)

    uf, vf = cubed_sphere_velocity_exchange(jnp.asarray(u),
                                            jnp.asarray(v), grid)
    uf, vf = np.asarray(uf), np.asarray(vf)
    ut = field("u", ni_u, nj_u, True)
    vt = field("v", ni_v, nj_v, True)

    err = 0.0
    nfilled = 0
    for (p, side, comp), (q, I, J, *_rest) in _velocity_maps(N, H).items():
        got = (uf if comp == "u" else vf)[p, I, J, 0]
        want = (ut if comp == "u" else vt)[p, I, J]
        nfilled += I.size
        if I.size:
            err = max(err, np.abs(got - want).max())
    assert nfilled > 0
    assert err < 1e-7

"""Conformal cubed-sphere panel tests (reference
conformal_cubed_sphere_panel.jl / CubedSphere.jl-equivalent map, derived
numerically from scratch — see grids/cubed_sphere.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu.grids.cubed_sphere import (
    conformal_cubed_sphere_mapping, conformal_cubed_sphere_panel,
    rancic_coefficients,
)


def test_map_anchors():
    A, res = rancic_coefficients()
    assert res < 1e-5
    np.testing.assert_allclose(conformal_cubed_sphere_mapping(1.0, 1.0),
                               (1 / np.sqrt(3),) * 3, atol=1e-10)
    np.testing.assert_allclose(conformal_cubed_sphere_mapping(0.0, 1.0),
                               (0.0, 1 / np.sqrt(2), 1 / np.sqrt(2)),
                               atol=1e-5)
    X, Y, Z = conformal_cubed_sphere_mapping(0.0, 0.0)
    np.testing.assert_allclose((X, Y, Z), (0.0, 0.0, 1.0), atol=1e-5)


def test_map_covers_sixth_of_sphere():
    n = 128
    xs = np.linspace(-1, 1, n + 1)
    Xf, Yf, Zf = conformal_cubed_sphere_mapping(
        *np.meshgrid(xs, xs, indexing="ij"))
    P = np.stack([Xf, Yf, Zf], -1)

    def tri(a, b, c):
        num = np.abs(np.einsum('...i,...i->...', a, np.cross(b, c)))
        den = (1 + np.einsum('...i,...i->...', a, b)
               + np.einsum('...i,...i->...', b, c)
               + np.einsum('...i,...i->...', a, c))
        return 2 * np.arctan2(num, den)

    sa = (tri(P[:-1, :-1], P[1:, :-1], P[1:, 1:])
          + tri(P[:-1, :-1], P[1:, 1:], P[:-1, 1:])).sum()
    np.testing.assert_allclose(sa, 4 * np.pi / 6, rtol=1e-10)


def test_map_is_conformal():
    """Orthogonal grid directions with unit aspect ratio everywhere."""
    h = 1e-5
    for (px, py) in ((0.3, 0.7), (0.5, 0.5), (0.9, 0.9), (-0.4, 0.2)):
        P0 = np.array(conformal_cubed_sphere_mapping(px, py))
        Px = (np.array(conformal_cubed_sphere_mapping(px + h, py)) - P0) / h
        Py = (np.array(conformal_cubed_sphere_mapping(px, py + h)) - P0) / h
        cosang = Px @ Py / np.linalg.norm(Px) / np.linalg.norm(Py)
        ratio = np.linalg.norm(Px) / np.linalg.norm(Py)
        assert abs(cosang) < 1e-4
        assert abs(ratio - 1.0) < 1e-4


def test_panel_grid():
    grid = conformal_cubed_sphere_panel((16, 16, 4), z=(-1000.0, 0.0),
                                        halo=2)
    dx = np.asarray(grid.dxCC)
    dy = np.asarray(grid.dyCC)
    assert np.all(np.isfinite(dx)) and np.all(dx > 0)
    # conformal: dx ≈ dy everywhere in the interior
    sx = slice(grid.Hx, grid.Hx + grid.Nx)
    sy = slice(grid.Hy, grid.Hy + grid.Ny)
    ratio = dx[sx, sy, 0] / dy[sx, sy, 0]
    np.testing.assert_allclose(ratio, 1.0, atol=0.05)
    # total panel area = 4πR²/6
    Az = np.asarray(grid.Az("c", "c"))[sx, sy, 0]
    np.testing.assert_allclose(Az.sum(), 4 * np.pi * grid.radius ** 2 / 6,
                               rtol=0.01)


def test_panel_model_runs():
    """Gravity wave on a single cubed-sphere panel (bounded edges)."""
    from oceananigans_tpu.models import (
        HydrostaticFreeSurfaceModel, SplitExplicitFreeSurface,
    )
    from oceananigans_tpu.fields import interior_xy
    grid = conformal_cubed_sphere_panel((16, 16, 3), z=(-1000.0, 0.0),
                                        halo=2)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, momentum_advection=None,
        free_surface=SplitExplicitFreeSurface(substeps=20))
    state = model.initial_state(
        eta=lambda lam, phi, *a: 0.1 * jnp.exp(-((phi - 60.0) / 10) ** 2))
    step = jax.jit(lambda s: model.step(s, 200.0))
    for _ in range(10):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.eta)))
    assert bool(jnp.all(jnp.isfinite(state.u)))

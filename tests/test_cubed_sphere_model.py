"""Cubed-sphere shallow-water model validation (reference:
``validation/multi_region/cubed_sphere_dynamics.jl`` and the Williamson
et al. (1992) shallow-water test suite the reference validates against).
"""

import jax
import numpy as np

from oceananigans_tpu.grids.cubed_sphere_grid import (
    ConformalCubedSphereGrid,
)
from oceananigans_tpu.models.cubed_sphere import (
    CubedSphereShallowWaterModel, panel_vector_components,
)


def test_williamson1_cosine_bell_advection():
    """Williamson test 1: cosine-bell tracer advected by solid-body
    rotation over panel corners (axis tilted 45°). Checks inter-panel
    tracer + velocity exchange and conservation."""
    from oceananigans_tpu.advection import WENO

    a = 1.0
    u0 = 2 * np.pi / 12.0
    alpha = np.deg2rad(45.0)
    axis = np.array([-np.sin(alpha), 0.0, np.cos(alpha)]) * u0

    N, H = 16, 3
    grid = ConformalCubedSphereGrid((N, 1), z=(-1.0, 0.0), radius=a,
                                    halo=H)
    model = CubedSphereShallowWaterModel(
        grid, tracers=("c",), tracer_advection=WENO(5),
        prescribed_velocities=True, rotation_rate=0.0)
    u, v = panel_vector_components(grid, lambda P: np.cross(axis, P))

    lam0 = np.deg2rad(270.0)
    R = a / 3.0

    def bell(lam, phi, z):
        lam = np.deg2rad(lam)
        phi = np.deg2rad(phi)
        r = a * np.arccos(np.clip(np.cos(phi) * np.cos(lam - lam0),
                                  -1, 1))
        return np.where(r < R, 0.5 * (1 + np.cos(np.pi * r / R)),
                        0.0) + 0 * z

    state = model.initial_state(u=u, v=v, h=1.0, c=bell)
    m0 = float(model.total_tracer(state, "c"))
    assert m0 > 0

    dt = 12.0 / 600
    step = jax.jit(lambda s: model.step(s, dt))
    s = state
    for _ in range(150):                       # quarter revolution
        s = step(s)
    s = jax.block_until_ready(s)

    c1 = np.asarray(s.tracers["c"])
    assert np.isfinite(c1).all()
    m1 = float(model.total_tracer(s, "c"))
    assert abs(m1 - m0) / m0 < 1e-9           # advective conservation
    # the bell moved but its amplitude is preserved to ~15% at C16
    g = grid.panel_grid
    sx, sy, _ = g.interior_slices
    assert 0.6 < c1[:, sx, sy, :].max() < 1.05
    assert c1[:, sx, sy, :].min() > -0.05     # WENO: tiny undershoot


def test_williamson2_geostrophic_balance():
    """Williamson test 2: steady geostrophic zonal flow. Exercises the
    full dynamics (PV flux, corner circulation, edge-synced mass flux):
    stable, h stays near the analytic steady state, and mass + tracer
    are conserved to machine precision."""
    a = 6.37122e6
    Omega = 7.292e-5
    gacc = 9.80616
    u0 = 2 * np.pi * a / (12.0 * 86400)
    h0 = 2.94e4 / gacc

    N, H = 16, 3
    grid = ConformalCubedSphereGrid((N, 1), z=(-1.0, 0.0), radius=a,
                                    halo=H)
    model = CubedSphereShallowWaterModel(
        grid, gravitational_acceleration=gacc, rotation_rate=Omega,
        tracers=("c",))
    u, v = panel_vector_components(
        grid, lambda P: np.cross(np.array([0.0, 0.0, u0 / a]), P * a))

    def h_init(lam, phi, z):
        s = np.sin(np.deg2rad(phi))
        return h0 - (a * Omega * u0 + 0.5 * u0 ** 2) * s ** 2 / gacc \
            + 0 * z

    def c_init(lam, phi, z):
        return 1.0 + 0.3 * np.sin(np.deg2rad(phi)) + 0 * lam + 0 * z

    state = model.initial_state(u=u, v=v, h=grid.set_tracer(h_init),
                                c=c_init)
    g = grid.panel_grid
    sx, sy, _ = g.interior_slices
    h_ex = np.asarray(state.h)[:, sx, sy, 0].copy()
    m0 = float(model.total_mass(state))
    Az = np.asarray(g.Az("c", "c"))[sx, sy, :1]
    c0 = float((np.asarray(state.tracers["c"])[:, sx, sy, :] * Az).sum())

    dt = 450.0                                  # CFL ~ 0.33 at C16
    step = jax.jit(lambda s: model.step(s, dt))
    s = state
    for _ in range(192):                        # one day
        s = step(s)
    s = jax.block_until_ready(s)

    h1 = np.asarray(s.h)[:, sx, sy, 0]
    assert np.isfinite(h1).all()
    rel = np.abs(h1 - h_ex).max() / h0
    assert rel < 0.02                           # stays near steady state
    m1 = float(model.total_mass(s))
    assert abs(m1 - m0) / m0 < 1e-12            # edge-synced fluxes
    c1 = float((np.asarray(s.tracers["c"])[:, sx, sy, :] * Az).sum())
    assert abs(c1 - c0) / c0 < 1e-12

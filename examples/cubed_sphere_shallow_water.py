"""Shallow-water solid-body geostrophic flow on the conformal cubed
sphere — Williamson et al. (1992) test 2 (reference:
validation/multi_region/cubed_sphere_dynamics.jl)."""

import jax
import numpy as np

from oceananigans_tpu.grids.cubed_sphere_grid import (
    ConformalCubedSphereGrid,
)
from oceananigans_tpu.models.cubed_sphere import (
    CubedSphereShallowWaterModel, panel_vector_components,
)

a = 6.37122e6
Omega = 7.292e-5
g = 9.80616
u0 = 2 * np.pi * a / (12 * 86400)         # one rotation in 12 days
h0 = 2.94e4 / g

grid = ConformalCubedSphereGrid((32, 1), z=(-1.0, 0.0), radius=a, halo=3)
model = CubedSphereShallowWaterModel(grid, gravitational_acceleration=g,
                                     rotation_rate=Omega, tracers=("c",))

u, v = panel_vector_components(
    grid, lambda P: np.cross(np.array([0.0, 0.0, u0 / a]), P * a))


def h_init(lam, phi, z):
    s = np.sin(np.deg2rad(phi))
    return h0 - (a * Omega * u0 + 0.5 * u0**2) * s**2 / g + 0 * z


state = model.initial_state(u=u, v=v, h=grid.set_tracer(h_init),
                            c=lambda lam, phi, z: np.cos(np.deg2rad(phi))
                            + 0 * lam + 0 * z)

dt = 245.0
step = jax.jit(lambda s: model.step(s, dt))


def validate():
    """CI physics check (Williamson 2): the geostrophically balanced
    solid-body flow is a steady state — velocity drift stays small over
    20 steps and mass is conserved to roundoff."""
    m0 = float(model.total_mass(state))
    u_scale = float(np.abs(np.asarray(state.u)).max())
    s = state
    for _ in range(20):
        s = step(s)
    du = np.asarray(s.u) - np.asarray(state.u)
    u0 = np.asarray(state.u)
    assert np.isfinite(np.asarray(s.h)).all()
    # global l2 drift stays small; the pointwise max is dominated by the
    # corner-band upwinding (the round-5 root-cause fix trades a local
    # O(Δx) corner error for unconditional inviscid stability — the
    # 5-day l2(h) anchor IMPROVED from 6.4e-3 filtered to 3.0e-3
    # unfiltered)
    l2 = np.sqrt((du ** 2).sum() / (u0 ** 2).sum())
    assert l2 < 0.01, l2
    assert np.abs(du).max() < 0.04 * u_scale, (np.abs(du).max(), u_scale)
    m1 = float(model.total_mass(s))
    assert abs(m1 - m0) < 1e-12 * abs(m0)


if __name__ == "__main__":
    m0 = float(model.total_mass(state))
    s = state
    for day in range(5):
        for _ in range(int(86400 / dt)):
            s = step(s)
        m = float(model.total_mass(s))
        print(f"day {day + 1}: mass drift {(m - m0) / m0:+.2e}")
    print("done")

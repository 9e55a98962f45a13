"""Idealized global ocean on the conformal cubed sphere — continents,
zonal wind stress, surface heat flux, seawater T/S buoyancy, CATKE
boundary-layer mixing, and a split-explicit free surface, driven through
``Simulation`` with NetCDF output.

This is the reference's realistic-global-ocean configuration
(``multi_region_models.jl:35-45`` regionalizes GridFittedBottom /
FieldBoundaryConditions / SeawaterBuoyancy across the panels;
``multi_region_boundary_conditions.jl:1-62`` fills the wind-stress and
heat-flux conditions) re-expressed on the stacked-panel TPU design: one
jitted step over (6, nx, ny, nz) arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import IterationInterval, Simulation
from oceananigans_tpu.boundary_conditions import (
    FieldBoundaryConditions, FluxBC,
)
from oceananigans_tpu.buoyancy import SeawaterBuoyancy
from oceananigans_tpu.closures_ocean import CATKEVerticalDiffusivity
from oceananigans_tpu.grids.cubed_sphere_grid import (
    ConformalCubedSphereGrid,
)
from oceananigans_tpu.models.cubed_sphere import (
    CubedSphereHydrostaticModel,
)
from oceananigans_tpu.models.hydrostatic import SplitExplicitFreeSurface
from oceananigans_tpu.output import NetCDFWriter

# --- configuration ----------------------------------------------------
N = 16            # C16 panels (bump to C32-C96 for production)
Nz = 8
depth = 3000.0    # m
tau0 = 8e-5       # peak kinematic wind stress  [m^2 s^-2]
Q0 = 2e-5         # peak surface temperature flux [K m s^-1]


def continents(lam, phi):
    """Two idealized continents (an Americas-like meridional strip and
    an Afro-Eurasian blob) plus polar caps; everything else 3000 m deep
    with a mid-Atlantic-style ridge."""
    americas = (np.abs(lam + 60.0) < 25.0) & (phi > -55.0) & (phi < 70.0)
    eurasia = ((np.abs(lam - 45.0) < 50.0) & (phi > 0.0) & (phi < 70.0))
    caps = np.abs(phi) > 78.0
    ridge = 1200.0 * np.exp(-((lam + 20.0) ** 2) / 80.0)
    bottom = -depth + ridge
    return np.where(americas | eurasia | caps, 50.0, bottom)


def wind_stress(lam, phi, t):
    """Idealized zonal wind stress: easterly trades, westerlies at
    mid-latitudes (the classic double-gyre pattern, here global)."""
    return -tau0 * jnp.sin(jnp.deg2rad(3.0 * phi)) \
        * jnp.cos(jnp.deg2rad(phi))


def surface_heat_flux(lam, phi, t):
    """Heating at the equator, cooling at the poles (flux is positive
    out of the ocean)."""
    return -Q0 * (jnp.cos(jnp.deg2rad(2.0 * phi)) - 0.3)


grid = ConformalCubedSphereGrid((N, Nz), z=(-depth, 0.0),
                                radius=6.37122e6, halo=3)
model = CubedSphereHydrostaticModel(
    grid,
    bathymetry=continents,
    # conservative corner-band smoothing for production-length runs:
    # the inviscid corner discretization is stable (round-5 root-cause
    # fix), but this wind-forced config carries NO horizontal closure,
    # so grid-scale shear noise near the corner latitudes grows over
    # multi-day runs; the filter (composable with every feature here)
    # keeps it physical — measured: 5-day C48 max|u| ~ 1 m/s filtered
    # vs 80 m/s unfiltered. Real cubed-sphere cores (FV3) carry
    # equivalent divergence/corner damping.
    corner_filter=0.005,
    buoyancy=SeawaterBuoyancy(),
    closure=CATKEVerticalDiffusivity(),
    free_surface=SplitExplicitFreeSurface(substeps=20),
    boundary_conditions={
        "u": FieldBoundaryConditions(top=FluxBC(wind_stress)),
        "T": FieldBoundaryConditions(top=FluxBC(surface_heat_flux)),
    },
    tracers=())

state = model.initial_state(
    T=lambda lam, phi, z: 5.0
    + 20.0 * np.cos(np.deg2rad(phi)) ** 2 * np.exp(z / 800.0),
    S=35.0)

dt = 600.0
sim = Simulation(model, state=state, dt=dt, stop_iteration=30)
sim.output_writers["fields"] = NetCDFWriter(
    {"eta": "eta", "u": "u", "T": "T"}, "global_ocean.nc",
    schedule=IterationInterval(10))


def validate():
    """CI physics check: 12 steps of the full configuration stay finite,
    conserve volume and salt to roundoff, and the wind does work on the
    ocean (surface KE grows from rest)."""
    s = state
    step = jax.jit(lambda st: model.step(st, dt))
    vol0 = float(model.total_volume(s))
    S0 = float(model.total_tracer(s, "S"))
    for _ in range(12):
        s = step(s)
    for f in (s.u, s.v, s.eta, s.tracers["T"], s.tracers["S"],
              s.tracers["e"]):
        assert np.isfinite(np.asarray(f)).all()
    assert float(jnp.max(jnp.abs(s.u))) > 1e-6       # wind-driven flow
    scale = float(model.ocean_volume())
    assert abs(float(model.total_volume(s)) - vol0) < 1e-12 * scale
    S1 = float(model.total_tracer(s, "S"))
    assert abs(S1 - S0) < 1e-9 * abs(S0)
    # land columns stay dry (below-bottom cells of OCEAN columns carry
    # the free-slip mirror of the bottom-most wet value by design;
    # halo slots are exchange workspace — check the interiors)
    g = grid.panel_grid
    sx, sy, _ = g.interior_slices
    land = 1.0 - np.asarray(model._wet2_u)[:, sx, sy]   # (6, N, N, 1)
    ui = np.asarray(s.u)[:, sx, sy, :]
    assert np.abs(ui * land).max() < 1e-12


if __name__ == "__main__":
    sim.run()
    print("final |u|max:", float(jnp.max(jnp.abs(sim.state.u))))

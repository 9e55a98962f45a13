"""Tilted bottom boundary layer: flow along a 3°-sloped seafloor
(reference: examples/tilted_bottom_boundary_layer.jl — a domain tilted
against gravity via ``gravity_unit_vector``, rotation about the tilted
axis, a background along-slope current V∞, background stratification
entering through a GradientBC, and quadratic bottom drag through
field-dependent flux BCs)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, BuoyancyForce, BuoyancyTracer, Callback,
    ConstantCartesianCoriolis, FieldBoundaryConditions, Flat, FluxBC,
    GradientBC, HDF5Writer, IterationInterval, Periodic, RectilinearGrid,
    ScalarDiffusivity, Simulation, TimeInterval, TimeStepWizard, WENO,
    meters, minutes, days,
)
from oceananigans_tpu.models import NonhydrostaticModel

Lx = 200 * meters
Lz = 100 * meters
Nx = Nz = 64

# stretched z over (0, Lz): finer near the (sloped) bottom boundary
refinement, stretching = 1.8, 10.0


def z_faces(k):
    h = (Nz - k) / Nz
    zeta = 1 + (h - 1) / refinement
    Sig = (1 - np.exp(-stretching * h)) / (1 - np.exp(-stretching))
    return -Lz * (zeta * Sig - 1)


grid = RectilinearGrid(size=(Nx, Nz), x=(0.0, Lx), z=z_faces,
                       topology=(Periodic, Flat, Bounded))

# gravity tilted by θ: the x axis runs along the slope
theta = 3.0  # degrees
g_hat = (np.sin(np.radians(theta)), 0.0, np.cos(np.radians(theta)))
buoyancy = BuoyancyForce(BuoyancyTracer(),
                         gravity_unit_vector=tuple(-c for c in g_hat))
coriolis = ConstantCartesianCoriolis(f=1e-4, rotation_axis=g_hat)

# background stratification N² along true vertical = x ĝ₁ + z ĝ₃
N2 = 1e-5
background_b = lambda x, y, z: N2 * (x * g_hat[0] + z * g_hat[2])

# bottom BCs: Neumann flux cancelling the background diffusive flux, and
# quadratic drag against (u, v + V∞) via field-dependent flux conditions
V_inf = 0.1
z0, vonk = 0.1, 0.4
# nearest grid-center height above the bottom -> log-layer drag coefficient
z1 = 0.5 * (z_faces(0) + z_faces(1))
cD = (vonk / np.log(z1 / z0)) ** 2

drag_u = lambda x, y, t, u, v: -cD * jnp.sqrt(u ** 2 + (v + V_inf) ** 2) * u
drag_v = lambda x, y, t, u, v: (-cD * jnp.sqrt(u ** 2 + (v + V_inf) ** 2)
                                * (v + V_inf))
u_bcs = FieldBoundaryConditions(
    bottom=FluxBC(drag_u, field_dependencies=("u", "v")))
v_bcs = FieldBoundaryConditions(
    bottom=FluxBC(drag_v, field_dependencies=("u", "v")))
b_bcs = FieldBoundaryConditions(
    bottom=GradientBC(-N2 * np.cos(np.radians(theta))))

model = NonhydrostaticModel(
    grid=grid, advection=WENO(5), buoyancy=buoyancy, coriolis=coriolis,
    tracers=("b",), closure=ScalarDiffusivity(nu=1e-4, kappa=1e-4),
    background_fields={"b": background_b,
                       "v": lambda x, y, z: jnp.full_like(z + 0.0 * x,
                                                          V_inf)},
    boundary_conditions={"u": u_bcs, "v": v_bcs, "b": b_bcs})

state = model.initial_state()
sim = Simulation(model, state=state, dt=30.0, stop_time=1.0 * days)
sim.callbacks["wizard"] = Callback(
    TimeStepWizard(cfl=0.7, max_dt=5 * minutes), IterationInterval(10))
sim.callbacks["progress"] = Callback(
    lambda s: print(f"t={float(s.state.clock.time) / 3600:5.1f} h  "
                    f"max|v| {float(jnp.max(jnp.abs(s.state.v))):.3f}"),
    TimeInterval(3600.0))
sim.output_writers["fields"] = HDF5Writer(
    outputs={"u": "u", "v": "v", "b": "b"},
    filename="tilted_bottom_boundary_layer.h5",
    schedule=TimeInterval(6 * 3600.0))


def validate():
    """CI physics check: quadratic bottom drag + tilted rotation spin up
    cross-slope (Ekman) flow from rest; the solution stays bounded by
    the far-field current."""
    import jax.numpy as jnp
    sim.stop_iteration = 40
    sim.run()
    u = np.asarray(model.grid.interior(sim.state.u))
    v = np.asarray(model.grid.interior(sim.state.v))
    assert np.isfinite(u).all() and np.isfinite(v).all()
    assert np.abs(u).max() > 1e-6          # cross-slope flow developed
    assert np.abs(v + V_inf).max() < 2 * V_inf


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

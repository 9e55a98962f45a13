"""Horizontal convection driven by a surface buoyancy gradient
(reference: examples/horizontal_convection.jl — flow driven by
differential buoyancy b* = -cos(2πx/Lx) imposed along the top at
Rayleigh number 1e8)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, BuoyancyTracer, Callback, FieldBoundaryConditions, Flat,
    HDF5Writer, IterationInterval, RectilinearGrid, ScalarDiffusivity,
    Simulation, TimeInterval, TimeStepWizard, ValueBC, WENO,
)
from oceananigans_tpu.models import NonhydrostaticModel

H = 1.0            # vertical extent
Lx = 2 * H         # horizontal extent
Nx, Nz = 128, 64

grid = RectilinearGrid(size=(Nx, Nz), x=(-Lx / 2, Lx / 2), z=(-H, 0.0),
                       topology=(Bounded, Flat, Bounded))

b_star = 1.0
# surface buoyancy b(x) = -b* cos(2πx/Lx) as a Dirichlet top condition
# (continuous boundary function of the transverse coordinates + time)
b_bcs = FieldBoundaryConditions(
    top=ValueBC(lambda x, y, t: -b_star * jnp.cos(2 * np.pi * x / Lx)))

Pr = 1.0
Ra = 1e8
nu = np.sqrt(Pr * b_star * Lx ** 3 / Ra)   # Laplacian viscosity
kappa = nu / Pr

model = NonhydrostaticModel(
    grid=grid, advection=WENO(5), timestepper="RungeKutta3",
    tracers=("b",), buoyancy=BuoyancyTracer(),
    closure=ScalarDiffusivity(nu=nu, kappa=kappa),
    boundary_conditions={"b": b_bcs})

state = model.initial_state()
sim = Simulation(model, state=state, dt=1e-2, stop_time=40.0)
sim.callbacks["wizard"] = Callback(TimeStepWizard(cfl=0.7, max_dt=1e-1),
                                   IterationInterval(50))
sim.callbacks["progress"] = Callback(
    lambda s: print(f"t={float(s.state.clock.time):6.2f}  dt={s.dt:.4f}  "
                    f"max|w| {float(jnp.max(jnp.abs(s.state.w))):.3e}"),
    TimeInterval(5.0))
sim.output_writers["fields"] = HDF5Writer(
    outputs={"b": "b", "w": "w"}, filename="horizontal_convection.h5",
    schedule=TimeInterval(5.0))


def validate():
    """CI physics check: the surface buoyancy gradient spins up a
    circulation from rest, and |b| stays bounded by the imposed b*."""
    import jax.numpy as jnp
    sim.stop_time = 2.0
    sim.run()
    ke = float(jnp.mean(sim.state.u ** 2 + sim.state.w ** 2))
    b = np.asarray(model.grid.interior(sim.state.tracers["b"]))
    assert np.isfinite(ke) and ke > 1e-8
    assert np.abs(b).max() <= 1.05 * b_star


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

"""Baroclinic adjustment of a buoyancy front on the sphere
(reference: examples/baroclinic_adjustment.jl): hydrostatic model,
lat-lon grid, split-explicit free surface, CATKE boundary layer."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    BuoyancyTracer, Callback, HDF5Writer, HydrostaticSphericalCoriolis,
    IterationInterval, LatitudeLongitudeGrid, Simulation, TimeInterval, WENO,
)
from oceananigans_tpu.closures_ocean import CATKEVerticalDiffusivity
from oceananigans_tpu.models import (
    HydrostaticFreeSurfaceModel, SplitExplicitFreeSurface, VectorInvariant,
)

grid = LatitudeLongitudeGrid(size=(60, 60, 10),
                             longitude=(-10.0, 10.0),
                             latitude=(30.0, 50.0),
                             z=(-1000.0, 0.0))

model = HydrostaticFreeSurfaceModel(
    grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
    coriolis=HydrostaticSphericalCoriolis(),
    momentum_advection=VectorInvariant(),
    tracer_advection=WENO(5),
    closure=CATKEVerticalDiffusivity(),
    free_surface=SplitExplicitFreeSurface(substeps=30))

N2 = 1e-5
M2 = 1e-7    # front strength
dphi = 2.0   # frontal width in degrees

state = model.initial_state(
    b=lambda lam, phi, z: N2 * z
    + 0.01 * jnp.tanh((phi - 40.0) / dphi),
    e=1e-6)

sim = Simulation(model, state=state, dt=600.0, stop_time=10 * 86400.0)
sim.callbacks["progress"] = Callback(
    lambda s: print(f"day {float(s.state.clock.time)/86400:5.1f}  "
                    f"max|u| {float(jnp.max(jnp.abs(s.state.u))):.3f}"),
    TimeInterval(86400.0))
sim.output_writers["fields"] = HDF5Writer(
    outputs={"b": "b", "u": "u", "eta": lambda m, s: np.asarray(
        s.eta[m.grid.Hx:m.grid.Hx + m.grid.Nx,
              m.grid.Hy:m.grid.Hy + m.grid.Ny, 0])},
    filename="baroclinic_adjustment.h5", schedule=TimeInterval(86400.0))


def validate():
    """CI physics check: the buoyancy front slumps and spins up a
    geostrophic jet (max|u| grows from rest)."""
    import jax.numpy as jnp
    sim.stop_time = 2 * 86400.0
    sim.run()
    u = np.asarray(sim.state.u)
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 0.01          # jet developed
    b = np.asarray(sim.state.tracers["b"])
    assert np.isfinite(b).all()


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

"""Stratified flow over an immersed seamount
(reference: immersed-boundary examples / validation studies)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, BuoyancyTracer, Callback, Centered, Flat, GridFittedBottom,
    ImmersedBoundaryGrid, IterationInterval, Periodic, RectilinearGrid,
    Simulation, TimeInterval,
)
from oceananigans_tpu.models import NonhydrostaticModel

underlying = RectilinearGrid(size=(64, 32), x=(-10.0, 10.0), z=(-2.0, 0.0),
                             topology=(Periodic, Flat, Bounded))
seamount = GridFittedBottom(
    lambda x, y: -2.0 + 1.0 * jnp.exp(-(x ** 2) / 2.0))
grid = ImmersedBoundaryGrid(underlying, seamount)

model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                            tracers=("b",), buoyancy=BuoyancyTracer())

N2 = 1.0
state = model.initial_state(u=0.1, b=lambda x, y, z: N2 * z)

sim = Simulation(model, state=state, dt=0.02, stop_time=20.0)
sim.callbacks["progress"] = Callback(
    lambda s: print(f"t={float(s.state.clock.time):5.1f}  "
                    f"max|w| {float(jnp.max(jnp.abs(s.state.w))):.4f}"),
    TimeInterval(2.0))


def validate():
    """CI physics check: stratified flow over the seamount deflects
    vertically (nonzero w) and stays stable."""
    import jax.numpy as jnp
    sim.stop_time = 2.0
    sim.run()
    w = np.asarray(model.grid.interior(sim.state.w))
    assert np.isfinite(w).all()
    assert np.abs(w).max() > 1e-3


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

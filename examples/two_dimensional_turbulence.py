"""2-D decaying turbulence — the canonical first example
(reference: examples/two_dimensional_turbulence.jl, README.md:115-122)."""

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Callback, Flat, HDF5Writer, IterationInterval, Periodic,
    RectilinearGrid, Simulation, TimeInterval, WENO,
)
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.operations import vertical_vorticity

grid = RectilinearGrid(size=(128, 128), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                       topology=(Periodic, Periodic, Flat), halo=4)
model = NonhydrostaticModel(grid=grid, advection=WENO(5))

rng = np.random.default_rng(42)
state = model.initial_state(u=rng.standard_normal((128, 128, 1)),
                            v=rng.standard_normal((128, 128, 1)))

sim = Simulation(model, state=state, dt=0.005, stop_time=10.0)
sim.callbacks["progress"] = Callback(
    lambda s: print(f"t={float(s.state.clock.time):6.2f} "
                    f"iter={int(s.state.clock.iteration):5d}"),
    TimeInterval(1.0))
sim.output_writers["fields"] = HDF5Writer(
    outputs={"zeta": lambda m, s: np.asarray(
        vertical_vorticity(m.grid, s.u, s.v))[3:-3, 3:-3]},
    filename="two_dimensional_turbulence.h5",
    schedule=TimeInterval(0.5))

if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

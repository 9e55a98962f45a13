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


def validate():
    """CI physics check: 2-D selective decay — enstrophy decays much
    faster than energy."""
    ke0 = float(jnp.mean(sim.state.u ** 2 + sim.state.v ** 2))
    z0 = np.asarray(vertical_vorticity(model.grid, sim.state.u,
                                       sim.state.v))[4:-4, 4:-4]
    sim.stop_time = 0.5
    sim.run()
    ke1 = float(jnp.mean(sim.state.u ** 2 + sim.state.v ** 2))
    z1 = np.asarray(vertical_vorticity(model.grid, sim.state.u,
                                       sim.state.v))[4:-4, 4:-4]
    assert np.isfinite(z1).all()
    # WENO rapidly dissipates the grid-scale part of the random seed, but
    # enstrophy must decay much faster than energy (selective decay)
    assert 0.0 < ke1 <= ke0 * 1.0001
    assert np.mean(z1 ** 2) < 0.9 * np.mean(z0 ** 2)
    assert (np.mean(z1 ** 2) / np.mean(z0 ** 2)) < 0.9 * (ke1 / ke0)


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

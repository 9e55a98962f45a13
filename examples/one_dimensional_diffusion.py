"""Diffusion of a one-dimensional Gaussian temperature bump
(reference: examples/one_dimensional_diffusion.jl — the "hello world"
example: a column of fluid with pure vertical tracer diffusion)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, Callback, Flat, HDF5Writer, IterationInterval,
    RectilinearGrid, ScalarDiffusivity, Simulation,
)
from oceananigans_tpu.models import NonhydrostaticModel

grid = RectilinearGrid(size=128, z=(-0.5, 0.5),
                       topology=(Flat, Flat, Bounded))
closure = ScalarDiffusivity(kappa=1.0)
model = NonhydrostaticModel(grid=grid, closure=closure, tracers=("T",))

width = 0.1
state = model.initial_state(
    T=lambda x, y, z: jnp.exp(-z ** 2 / (2 * width ** 2)))

# time step = a tenth of the cell diffusion time scale
min_dz = 1.0 / 128
dt = 0.1 * min_dz ** 2 / 1.0
sim = Simulation(model, state=state, dt=dt, stop_iteration=1000)
sim.callbacks["progress"] = Callback(
    lambda s: print(f"iter={int(s.state.clock.iteration):5d}  "
                    f"max T {float(jnp.max(s.state.tracers['T'])):.4f}"),
    IterationInterval(200))
sim.output_writers["temperature"] = HDF5Writer(
    outputs={"T": "T"}, filename="one_dimensional_diffusion.h5",
    schedule=IterationInterval(100))


def validate():
    """CI physics check: heat conserved exactly; the bump's peak decays
    and its width grows (pure diffusion)."""
    T0 = np.asarray(model.grid.interior(sim.state.tracers["T"]))
    sim.stop_iteration = 300
    sim.run()
    T1 = np.asarray(model.grid.interior(sim.state.tracers["T"]))
    assert np.isfinite(T1).all()
    assert abs(T1.sum() - T0.sum()) <= 1e-10 * abs(T0.sum())
    assert T1.max() < T0.max()
    # analytic spreading: peak ~ width/sqrt(width^2 + 2 kappa t)
    t = float(sim.state.clock.time)
    expected_peak = width / np.sqrt(width ** 2 + 2 * 1.0 * t)
    assert abs(T1.max() - expected_peak) < 0.02 * expected_peak


if __name__ == "__main__":
    sim.run()
    # the bump spreads and its peak decays; total heat is conserved
    T = np.asarray(sim.state.tracers["T"])
    print("done; max T =", T.max())

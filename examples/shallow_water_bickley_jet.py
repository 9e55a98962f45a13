"""Unstable Bickley jet in the shallow water model
(reference: examples/shallow_water_Bickley_jet.jl)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, Callback, FPlane, Flat, HDF5Writer, IterationInterval,
    Periodic, RectilinearGrid, Simulation, TimeInterval, UpwindBiased,
)
from oceananigans_tpu.models import ShallowWaterModel

grid = RectilinearGrid(size=(128, 128), x=(0, 4 * np.pi),
                       y=(-2 * np.pi, 2 * np.pi),
                       topology=(Periodic, Bounded, Flat), halo=3)

model = ShallowWaterModel(grid=grid, gravitational_acceleration=9.81,
                          coriolis=FPlane(f=1.0),
                          momentum_advection=UpwindBiased(3))

H, U0 = 10.0, 1.0


def uh0(x, y, z):
    jet = U0 / jnp.cosh(y) ** 2
    pert = 1e-4 * jnp.exp(-y ** 2) * jnp.cos(x) * U0
    return H * (jet + pert)


state = model.initial_state(
    uh=uh0, h=lambda x, y, z: H - (U0 / 9.81) * jnp.tanh(y))

sim = Simulation(model, state=state, dt=0.005, stop_time=50.0)
sim.callbacks["progress"] = Callback(
    lambda s: print(f"t={float(s.state.clock.time):6.1f}  "
                    f"max|vh| {float(jnp.max(jnp.abs(s.state.vh))):.4f}"),
    TimeInterval(5.0))
sim.output_writers["fields"] = HDF5Writer(
    outputs={"h": "h", "uh": "uh", "vh": "vh"},
    filename="bickley_jet.h5", schedule=TimeInterval(2.0))


def validate():
    """CI physics check: the Bickley jet is barotropically unstable —
    the transverse-transport perturbation grows from its 1e-4 seed."""
    import jax.numpy as jnp
    v0 = float(jnp.max(jnp.abs(sim.state.vh)))
    sim.stop_time = 5.0
    sim.run()
    v1 = float(jnp.max(jnp.abs(sim.state.vh)))
    assert np.isfinite(v1)
    assert v1 > 1.3 * max(v0, 1e-5) and v1 < 10.0, (v0, v1)


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

"""Internal gravity wave propagating in a stratified fluid
(reference: examples/internal_wave.jl — a wave packet launched in a
uniformly stratified 2-D domain disperses along its beam angle)."""

import jax
import numpy as np

from oceananigans_tpu import (
    BuoyancyTracer, Callback, Flat, HDF5Writer, IterationInterval,
    Periodic, RectilinearGrid, Simulation, TimeInterval,
)
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.models import NonhydrostaticModel

N2 = 1.0            # buoyancy frequency squared
f = 0.2             # inertial frequency
grid = RectilinearGrid(size=(128, 128), x=(-np.pi, np.pi),
                       z=(-np.pi, np.pi),
                       topology=(Periodic, Flat, Periodic), halo=2)
model = NonhydrostaticModel(grid=grid, buoyancy=BuoyancyTracer(),
                            coriolis=FPlane(f=f), tracers=("b",))

# a Gaussian wave packet with wavenumber (k, m)
k, m = 8.0, 8.0
omega = np.sqrt((N2 * k**2 + f**2 * m**2) / (k**2 + m**2))
A, delta = 1e-9, 0.2


def packet(part):
    def fn(x, y, z):
        env = A * np.exp(-(x**2 + z**2) / (2 * delta**2))
        phase = k * x + m * z
        return env * (np.cos(phase) if part == "cos" else np.sin(phase))
    return fn


U = A * (k * omega) / (omega**2 - f**2)
state = model.initial_state(
    u=packet("cos"),
    w=lambda x, y, z: -(k / m) * packet("cos")(x, y, z),
    b=lambda x, y, z: (m * N2 / omega) * packet("sin")(x, y, z),
)
sim = Simulation(model, state=state, dt=0.001, stop_time=15.0)
sim.callbacks["progress"] = Callback(
    lambda s: print(f"t={float(s.state.clock.time):5.1f}"),
    TimeInterval(5.0))
sim.output_writers["w"] = HDF5Writer(
    outputs={"w": "w"}, filename="internal_wave.h5",
    schedule=TimeInterval(1.0))

if __name__ == "__main__":
    sim.run()
    print("done; wave frequency omega =", omega)

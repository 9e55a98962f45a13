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


def validate():
    """CI physics check: linear internal-wave energy
    E = (u^2 + w^2 + b^2/N^2)/2 is conserved by the inviscid dynamics."""
    import jax.numpy as jnp

    def energy(s):
        return float(jnp.mean(s.u ** 2 + s.w ** 2
                              + s.tracers["b"] ** 2 / N2))

    e0 = energy(sim.state)
    sim.stop_iteration = 400
    sim.run()
    e1 = energy(sim.state)
    assert np.isfinite(e1)
    # staggered-location sampling makes this functional only approximately
    # the conserved discrete energy; bound the drift loosely
    assert abs(e1 - e0) < 0.1 * e0, (e0, e1)
    # the wave still oscillates in the linear regime (no spurious growth)
    assert float(np.abs(np.asarray(sim.state.w)).max()) < 100 * A


if __name__ == "__main__":
    sim.run()
    print("done; wave frequency omega =", omega)

"""Kelvin-Helmholtz instability of a stratified shear layer
(reference: examples/kelvin_helmholtz_instability.jl — perturbations
grow on a background tanh shear flow with tanh stratification)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, BuoyancyTracer, Callback, Flat, HDF5Writer, Periodic,
    RectilinearGrid, ScalarDiffusivity, Simulation, TimeInterval,
    UpwindBiased,
)
from oceananigans_tpu.models import NonhydrostaticModel

grid = RectilinearGrid(size=(64, 64), x=(-5.0, 5.0), z=(-5.0, 5.0),
                       topology=(Periodic, Flat, Bounded))

# background shear flow U(z) = tanh z and stratification B(z) with
# bulk Richardson number Ri (reference BackgroundField machinery)
Ri, h = 0.1, 1 / 4.0
shear_flow = lambda x, y, z: jnp.tanh(z)
stratification = lambda x, y, z: h * Ri * jnp.tanh(z / h)

model = NonhydrostaticModel(
    grid=grid, advection=UpwindBiased(5),
    background_fields={"u": shear_flow, "b": stratification},
    closure=ScalarDiffusivity(nu=2e-4, kappa=2e-4),
    buoyancy=BuoyancyTracer(), tracers=("b",))

# small random perturbations seed the instability
rng = np.random.default_rng(42)
state = model.initial_state(
    u=1e-2 * rng.standard_normal((64, 1, 64)),
    w=1e-2 * rng.standard_normal((64, 1, 64)))


def mean_ke(s):
    return 0.5 * float(jnp.mean(s.state.u ** 2 + s.state.w ** 2))


sim = Simulation(model, state=state, dt=0.1, stop_time=60.0)
sim.callbacks["progress"] = Callback(
    lambda s: print(f"t={float(s.state.clock.time):5.1f}  "
                    f"KE {mean_ke(s):.3e}"),
    TimeInterval(10.0))
sim.output_writers["fields"] = HDF5Writer(
    outputs={"w": "w", "b": "b"}, filename="kelvin_helmholtz.h5",
    schedule=TimeInterval(5.0))


def validate():
    """CI physics check: at Ri = 0.1 < 1/4 the shear layer is unstable —
    perturbation kinetic energy grows."""
    sim.stop_time = 30.0
    sim.run()
    ke_mid = mean_ke(sim)      # noise transient has decayed by now
    sim.stop_time = 60.0
    sim.running = True
    sim.run()
    ke1 = mean_ke(sim)
    assert np.isfinite(ke1)
    # exponential growth of the organized KH mode after the transient
    assert ke1 > 1.5 * ke_mid, (ke_mid, ke1)


if __name__ == "__main__":
    ke0 = mean_ke(sim)
    sim.run()
    # perturbation kinetic energy grows by instability (Ri < 1/4)
    print(f"done; KE growth factor {mean_ke(sim) / ke0:.2f}")

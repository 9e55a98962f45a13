"""Convecting plankton: phytoplankton growth in convective turbulence
(reference: examples/convecting_plankton.jl — surface cooling that shuts
off after two hours drives convection; a plankton tracer P grows near the
surface (light) and dies at depth, coupled through a field-dependent
forcing)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, BuoyancyTracer, Callback, FieldBoundaryConditions, Flat,
    FluxBC, Forcing, GradientBC, HDF5Writer, IterationInterval, Periodic,
    RectilinearGrid, ScalarDiffusivity, Simulation, TimeInterval,
    TimeStepWizard, UpwindBiased, day, hours, minutes,
)
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.models import NonhydrostaticModel

grid = RectilinearGrid(size=(64, 64), x=(0.0, 64.0), z=(-64.0, 0.0),
                       topology=(Periodic, Flat, Bounded))

# surface buoyancy flux (cooling) that shuts off smoothly after 2 hours
Q0 = 1e-8             # m² s⁻³
shutoff = 2 * hours
buoyancy_flux = lambda x, y, t: Q0 * jnp.exp(-t ** 4 / (24 * shutoff ** 4))

N2 = 1e-4
b_bcs = FieldBoundaryConditions(top=FluxBC(buoyancy_flux),
                                bottom=GradientBC(N2))

# plankton: growth decaying with depth (light attenuation) minus mortality
mu0 = 1.0 / day       # surface growth rate
lam = 5.0             # sunlight attenuation length (m)
mort = 0.1 / day      # mortality rate
plankton_dynamics = Forcing(
    lambda x, y, z, t, P, p: (p["mu0"] * jnp.exp(z / p["lam"])
                              - p["m"]) * P,
    field_dependencies="P",
    parameters={"mu0": mu0, "lam": lam, "m": mort})

model = NonhydrostaticModel(
    grid=grid, advection=UpwindBiased(5),
    closure=ScalarDiffusivity(nu=1e-4, kappa=1e-4),
    coriolis=FPlane(f=1e-4),
    tracers=("b", "P"), buoyancy=BuoyancyTracer(),
    forcing={"P": plankton_dynamics},
    boundary_conditions={"b": b_bcs})

mixed_layer_depth = 32.0
rng = np.random.default_rng(0)
zc = -64.0 + (np.arange(64) + 0.5) * 1.0           # cell-center depths
stratification = np.where(zc < -mixed_layer_depth, N2 * zc,
                          -N2 * mixed_layer_depth)
noise = (1e-4 * N2 * 64.0 * rng.standard_normal((64, 1, 64))
         * np.exp(zc[None, None, :] / 4))
state = model.initial_state(
    b=stratification[None, None, :] + noise, P=1.0)

sim = Simulation(model, state=state, dt=2 * minutes, stop_time=24 * hours)
sim.callbacks["wizard"] = Callback(
    TimeStepWizard(cfl=1.0, max_dt=2 * minutes), IterationInterval(10))
sim.callbacks["progress"] = Callback(
    lambda s: print(f"t={float(s.state.clock.time) / 3600:5.1f} h  "
                    f"mean P {float(jnp.mean(s.state.tracers['P'])):.3f}"),
    TimeInterval(2 * hours))
sim.output_writers["fields"] = HDF5Writer(
    outputs={"w": "w", "P": "P"}, filename="convecting_plankton.h5",
    schedule=TimeInterval(2 * hours))


def validate():
    """CI physics check: plankton grows in the sunlit surface layer
    (growth exceeds mortality where exp(z/lam) mu0 > m)."""
    import jax.numpy as jnp
    g = model.grid
    sx, sy, sz = g.interior_slices
    P0 = np.asarray(sim.state.tracers["P"][sx, sy, sz])
    surf0 = P0[:, :, -8:].mean()
    sim.stop_time = 4 * hours
    sim.run()
    P1 = np.asarray(sim.state.tracers["P"][sx, sy, sz])
    assert np.isfinite(P1).all()
    assert P1[:, :, -8:].mean() > 1.02 * surf0    # surface bloom
    assert P1[:, :, :8].mean() < P0[:, :, :8].mean()  # deep mortality


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

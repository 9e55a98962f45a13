"""Langmuir turbulence via the Craik-Leibovich Stokes-drift vortex force
(reference: examples/langmuir_turbulence.jl, McWilliams et al. 1997)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, BuoyancyTracer, Callback, FieldBoundaryConditions, FluxBC,
    GradientBC, IterationInterval, Periodic, RectilinearGrid, Simulation,
    TimeInterval, TimeStepWizard, WENO, AnisotropicMinimumDissipation,
)
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.stokes_drift import UniformStokesDrift

grid = RectilinearGrid(size=(32, 32, 32), extent=(128.0, 128.0, 64.0),
                       topology=(Periodic, Periodic, Bounded))

# wave parameters (McWilliams et al. 1997)
amplitude = 0.8           # m
wavenumber = 2 * np.pi / 60.0
frequency = np.sqrt(9.81 * wavenumber)
Us0 = amplitude ** 2 * wavenumber * frequency   # surface Stokes drift

stokes = UniformStokesDrift(
    us=lambda z, t: Us0 * jnp.exp(2 * wavenumber * z),
    dusdz=lambda z, t: 2 * wavenumber * Us0 * jnp.exp(2 * wavenumber * z))

Qu = -3.72e-5    # wind stress / ρ₀ aligned with waves
Qb = 2.307e-8    # destabilizing buoyancy flux
N2 = 1.936e-5

model = NonhydrostaticModel(
    grid=grid, advection=WENO(5), tracers=("b",), buoyancy=BuoyancyTracer(),
    stokes_drift=stokes, closure=AnisotropicMinimumDissipation(),
    boundary_conditions={
        "u": FieldBoundaryConditions(top=FluxBC(Qu)),
        "b": FieldBoundaryConditions(top=FluxBC(Qb),
                                     bottom=GradientBC(N2)),
    })

rng = np.random.default_rng(1)
state = model.initial_state(
    b=lambda x, y, z: N2 * z,
    u=1e-4 * rng.standard_normal((32, 32, 32)),
    w=1e-4 * rng.standard_normal((32, 32, 32)))

sim = Simulation(model, state=state, dt=5.0, stop_time=1800.0)
sim.callbacks["wizard"] = Callback(TimeStepWizard(cfl=0.7, max_dt=30.0),
                                   IterationInterval(5))


def validate():
    """CI physics check: the wind stress injects the right momentum
    (d<u>/dt integrates the surface flux)."""
    import jax.numpy as jnp
    u0 = float(jnp.mean(model.grid.interior(sim.state.u)))
    sim.stop_time = 120.0
    sim.run()
    u1 = float(jnp.mean(model.grid.interior(sim.state.u)))
    t = float(sim.state.clock.time)
    expected = -Qu * t / 64.0     # flux/Lz (Qu < 0 -> mean u grows)
    assert np.isfinite(u1)
    assert abs((u1 - u0) - expected) < 0.2 * abs(expected), \
        (u1 - u0, expected)


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

"""Wind-driven mixing and convection in the surface ocean boundary layer
(reference: examples/ocean_wind_mixing_and_convection.jl): LES with
Smagorinsky-Lilly, surface momentum + buoyancy fluxes, stretched z grid."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, Callback, FieldBoundaryConditions, FluxBC, GradientBC,
    IterationInterval, Periodic, RectilinearGrid, SeawaterBuoyancy,
    Simulation, SmagorinskyLilly, TimeInterval, TimeStepWizard, WENO,
    HDF5Writer, LinearEquationOfState,
)
from oceananigans_tpu.models import NonhydrostaticModel

Nx = Ny = 32
Nz = 24
Lx = Ly = 64.0
Lz = 32.0

# stretched z: finer near the surface
def z_faces(k):
    zt = k / Nz
    return -Lz * (1 - zt) ** 1.2

grid = RectilinearGrid(size=(Nx, Ny, Nz), x=(0.0, Lx), y=(0.0, Ly),
                       z=z_faces,
                       topology=(Periodic, Periodic, Bounded))

Qh = 200.0            # W m⁻², surface cooling
rho0, cp = 1026.0, 3991.0
alpha, g = 2e-4, 9.81
QT = Qh / (rho0 * cp)                   # K m s⁻¹ temperature flux
tau_x = 6.2e-5                          # m² s⁻², wind stress / ρ₀
dTdz = 0.01                             # deep stratification

T_bcs = FieldBoundaryConditions(top=FluxBC(QT), bottom=GradientBC(dTdz))
u_bcs = FieldBoundaryConditions(top=FluxBC(tau_x))

model = NonhydrostaticModel(
    grid=grid, advection=WENO(5),
    buoyancy=SeawaterBuoyancy(equation_of_state=LinearEquationOfState(
        thermal_expansion=alpha), constant_salinity=35.0),
    closure=SmagorinskyLilly(),
    boundary_conditions={"T": T_bcs, "u": u_bcs})

rng = np.random.default_rng(0)
state = model.initial_state(
    T=lambda x, y, z: 20.0 + dTdz * z,
    u=1e-4 * rng.standard_normal((Nx, Ny, Nz)))

sim = Simulation(model, state=state, dt=10.0, stop_time=3600.0)
sim.callbacks["wizard"] = Callback(TimeStepWizard(cfl=0.7, max_dt=60.0),
                                   IterationInterval(5))
sim.output_writers["fields"] = HDF5Writer(
    outputs={"T": "T", "w": "w"}, filename="wind_mixing.h5",
    schedule=TimeInterval(600.0))


def validate():
    """CI physics check: surface cooling extracts the prescribed heat —
    the mean temperature drops by exactly QT·t/Lz."""
    import jax.numpy as jnp

    def mean_T(s):
        # volume-weighted mean over the stretched grid
        g = model.grid
        dz = jnp.broadcast_to(g.dz(None), g.shape)
        sx, sy, sz = g.interior_slices
        T = s.tracers["T"][sx, sy, sz]
        d = dz[sx, sy, sz]
        return float(jnp.sum(T * d) / jnp.sum(d))

    T0 = mean_T(sim.state)
    sim.stop_time = 300.0
    sim.run()
    T1 = mean_T(sim.state)
    t = float(sim.state.clock.time)
    expected = -QT * t / Lz
    assert np.isfinite(T1)
    # the bottom GradientBC also conducts a little heat, so the budget
    # closes only approximately
    assert abs((T1 - T0) - expected) < 0.3 * abs(expected), \
        (T1 - T0, expected)


if __name__ == "__main__":
    sim.run()
    print(f"done: {sim!r}")

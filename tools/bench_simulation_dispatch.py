"""Dispatch-amortization check (VERDICT r4 Weak #5 / ask 6): the C48
global ocean stepped through ``Simulation.run`` (which batches steps
into ``lax.fori_loop`` windows between schedule hits) should be within
1.2x of the raw windowed ``bench.py BENCH_CONFIG=cs_global`` number.

Prints both ms/step figures and the ratio."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as bench_mod  # noqa: E402 (reuses the cs_global builder)
from oceananigans_tpu.simulation import Simulation  # noqa: E402

STEPS = int(os.environ.get("BENCH_STEPS", "200"))


def build():
    """The bench cs_global model/state (same code path)."""
    import importlib
    # _cs_global builds inline; replicate its config here via the module
    src = bench_mod._cs_global.__code__
    # simplest: call the builder with inner=0-like by refactoring would
    # be invasive — instead rebuild the model exactly as bench does
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, FluxBC,
    )
    from oceananigans_tpu.buoyancy import SeawaterBuoyancy
    from oceananigans_tpu.grids.cubed_sphere_grid import (
        ConformalCubedSphereGrid,
    )
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereHydrostaticModel,
    )
    from oceananigans_tpu.models.hydrostatic import (
        SplitExplicitFreeSurface,
    )
    N = int(os.environ.get("BENCH_N", "48"))
    Nz = int(os.environ.get("BENCH_NZ", "16"))
    grid = ConformalCubedSphereGrid((N, Nz), z=(-4000.0, 0.0),
                                    radius=6.37122e6, halo=3)

    def continents(lam, phi):
        land = np.abs(phi) > 65.0
        ridge = 1500.0 * np.exp(-((lam - 30.0) ** 2 + phi ** 2) / 400.0)
        return np.where(land, 100.0, -4000.0 + ridge)

    model = CubedSphereHydrostaticModel(
        grid, bathymetry=continents,
        buoyancy=SeawaterBuoyancy(),
        free_surface=SplitExplicitFreeSurface(substeps=20),
        boundary_conditions={
            "u": FieldBoundaryConditions(top=FluxBC(
                lambda lam, phi, t: -1e-4 * jnp.cos(
                    2 * jnp.deg2rad(phi)))),
        },
        tracers=())
    state = model.initial_state(
        T=lambda lam, phi, z: 5.0 + 20.0 * np.cos(np.deg2rad(phi)) ** 2
        * np.exp(z / 800.0), S=35.0)
    return model, state


def main():
    model, state = build()
    dt = 300.0

    # raw windowed step (the bench.py pattern)
    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def window(st):
        return jax.lax.fori_loop(0, STEPS,
                                 lambda i, s: model.step(s, dt), st)

    import copy
    st = jax.block_until_ready(window(jax.tree_util.tree_map(
        jnp.copy, state)))
    t0 = time.perf_counter()
    st = jax.block_until_ready(window(st))
    float(np.asarray(st.eta).ravel()[0])
    raw = (time.perf_counter() - t0) / STEPS

    # through Simulation.run (default NaN-checker schedule -> 100-step
    # windows)
    sim = Simulation(model, state, dt=dt, stop_iteration=STEPS)
    sim.initialize()
    t0 = time.perf_counter()
    sim.run()
    jax.block_until_ready(sim.state.eta)
    simt = (time.perf_counter() - t0) / STEPS

    # second run (warm caches): restart clock via fresh sim on the
    # final state
    sim2 = Simulation(model, sim.state, dt=dt,
                      stop_iteration=int(sim.state.clock.iteration)
                      + STEPS)
    sim2.initialized = True
    sim2._stepn_cache = sim._stepn_cache
    sim2._step1 = sim._step1
    t0 = time.perf_counter()
    sim2.run()
    jax.block_until_ready(sim2.state.eta)
    simt2 = (time.perf_counter() - t0) / STEPS

    print(f"raw windowed:        {raw*1e3:7.2f} ms/step")
    print(f"Simulation.run cold: {simt*1e3:7.2f} ms/step")
    print(f"Simulation.run warm: {simt2*1e3:7.2f} ms/step "
          f"(ratio {simt2/raw:.2f}x)")


if __name__ == "__main__":
    main()

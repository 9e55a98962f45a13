"""Cubed-sphere models driven through the main Simulation stack
(run/batched windows/callbacks/wizard/writers/checkpoint pickup) —
reference capability: ``multi_region_models.jl`` +
``multi_region_output_writers.jl`` (the MultiRegion cubed sphere plugs
into the same Simulation/OutputWriter machinery as flat grids)."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Callback, Checkpointer, HDF5Writer, IterationInterval, Simulation,
    TimeInterval, TimeStepWizard,
)
from oceananigans_tpu.grids.cubed_sphere_grid import (
    ConformalCubedSphereGrid,
)
from oceananigans_tpu.models.cubed_sphere import (
    CubedSphereHydrostaticModel, CubedSphereShallowWaterModel,
    panel_vector_components,
)
from oceananigans_tpu.models.hydrostatic import SplitExplicitFreeSurface


def _grid(N=8, nz=3):
    return ConformalCubedSphereGrid((N, nz), z=(-1000.0, 0.0),
                                    radius=6.37122e6)


def _bump(grid):
    g = grid.panel_grid
    H = g.Hx
    N = grid.N_panel
    nx, ny, _ = g.shape
    e = np.zeros((6, nx, ny, 1))
    e[:, H:H + N, H:H + N, 0] = np.exp(
        -((grid.lam_cc - 30.0) ** 2 + grid.phi_cc ** 2) / 400.0)
    return jnp.asarray(e)


def test_simulation_runs_cubed_sphere_hydrostatic(tmp_path):
    """sim.run() drives the cubed-sphere hydrostatic model with batched
    step windows, a progress callback, a TimeStepWizard, and an HDF5
    writer whose output carries the stacked-panel fields + curvilinear
    coordinates."""
    grid = _grid()
    model = CubedSphereHydrostaticModel(
        grid, free_surface=SplitExplicitFreeSurface(substeps=8))
    state = model.initial_state(eta=_bump(grid),
                                b=lambda lam, phi, z: 1e-5 * z)

    sim = Simulation(model, state=state, dt=600.0, stop_iteration=12)
    seen = []
    sim.callbacks["progress"] = Callback(
        lambda s: seen.append(int(s.state.clock.iteration)),
        IterationInterval(4))
    sim.callbacks["wizard"] = Callback(
        TimeStepWizard(cfl=0.3, max_change=1.1, max_dt=900.0),
        IterationInterval(4))
    out = str(tmp_path / "cs_fields.h5")
    sim.output_writers["fields"] = HDF5Writer(
        {"eta": "eta", "u": "u", "b": "b"}, out,
        schedule=IterationInterval(6))
    sim.run()

    assert int(sim.state.clock.iteration) == 12
    assert seen and seen[-1] >= 8
    assert np.isfinite(np.asarray(sim.state.eta)).all()
    with h5py.File(out, "r") as f:
        eta = np.asarray(f["fields/eta"])
        assert eta.shape[1:] == (6, grid.N_panel, grid.N_panel, 1)
        assert np.asarray(f["grid/x"]).size == 6 * grid.N_panel ** 2
        assert f["times"].shape[0] >= 2


def test_cubed_sphere_checkpoint_pickup(tmp_path):
    """Restart from a checkpoint reproduces the uninterrupted cubed-
    sphere run exactly (persistent barotropic U/V state included)."""
    def build():
        grid = _grid()
        return grid, CubedSphereHydrostaticModel(
            grid, free_surface=SplitExplicitFreeSurface(substeps=8))

    grid, model = build()
    state0 = model.initial_state(eta=_bump(grid),
                                 b=lambda lam, phi, z: 1e-5 * z)
    sim = Simulation(model, state=state0, dt=600.0, stop_iteration=10)
    ckpt = Checkpointer(dirname=str(tmp_path / "ckpts"),
                        schedule=IterationInterval(5))
    sim.output_writers["ckpt"] = ckpt
    sim.run()
    final = sim.state

    grid2, model2 = build()
    template = model2.initial_state()
    restored = ckpt.restore(template, path=ckpt._path(5))
    assert int(restored.clock.iteration) == 5
    sim2 = Simulation(model2, state=restored, dt=600.0,
                      stop_iteration=10)
    sim2.run()

    np.testing.assert_array_equal(np.asarray(final.eta),
                                  np.asarray(sim2.state.eta))
    np.testing.assert_array_equal(np.asarray(final.u),
                                  np.asarray(sim2.state.u))
    np.testing.assert_array_equal(np.asarray(final.U),
                                  np.asarray(sim2.state.U))


def test_simulation_runs_cubed_sphere_shallow_water():
    """The cubed-sphere shallow-water model runs under Simulation with
    a TimeInterval schedule (batched windows align onto it)."""
    grid = ConformalCubedSphereGrid((8, 1), z=(-1.0, 0.0),
                                    radius=6.37122e6)
    model = CubedSphereShallowWaterModel(grid)
    axis = np.array([0.0, 0.0, 1.0])
    u0, v0 = panel_vector_components(
        grid, lambda pts: 10.0 * np.cross(axis, pts))
    state = model.initial_state(u=u0, v=v0, h=8000.0)
    sim = Simulation(model, state=state, dt=200.0, stop_time=2000.0)
    ticks = []
    sim.callbacks["t"] = Callback(
        lambda s: ticks.append(float(s.state.clock.time)),
        TimeInterval(1000.0))
    sim.run()
    assert abs(float(sim.state.clock.time) - 2000.0) < 1e-6
    assert np.isfinite(np.asarray(sim.state.h)).all()
    assert any(abs(t - 1000.0) < 1e-6 for t in ticks)

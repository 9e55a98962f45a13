"""Simulation driver, schedules, writers, checkpointing tests
(reference test groups: simulation, time_stepping; SURVEY.md §4)."""

import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    Bounded, Callback, Centered, Checkpointer, Flat, HDF5Writer,
    IterationInterval, NonhydrostaticModel, Periodic, RectilinearGrid,
    ScalarDiffusivity, Simulation, SpecifiedTimes, TimeInterval,
    TimeStepWizard, load_field_time_series,
)
from oceananigans_tpu.fields import interior


def small_model():
    grid = RectilinearGrid(size=(8, 8), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    return NonhydrostaticModel(grid=grid, advection=Centered(2),
                               tracers=("c",),
                               closure=ScalarDiffusivity(nu=1e-3,
                                                         kappa=1e-3))


def test_run_to_stop_time():
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_time=0.1)
    sim.run()
    assert abs(float(sim.state.clock.time) - 0.1) < 1e-10
    assert sim.stop_reason == "stop_time reached"


def test_run_to_stop_iteration():
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_iteration=7)
    sim.run()
    assert int(sim.state.clock.iteration) == 7


def test_callback_schedule_counts():
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_iteration=10)
    count = {"n": 0}
    sim.callbacks["counter"] = Callback(
        lambda s: count.__setitem__("n", count["n"] + 1),
        IterationInterval(2))
    sim.run()
    # initialize() actuates at iteration 0, then iterations 2,4,6,8,10
    assert count["n"] == 6


def test_time_interval_alignment():
    """dt must shrink so the run lands exactly on TimeInterval actuations."""
    model = small_model()
    sim = Simulation(model, dt=0.03, stop_time=0.2)
    times = []
    sim.callbacks["rec"] = Callback(
        lambda s: times.append(float(s.state.clock.time)),
        TimeInterval(0.05))
    sim.run()
    expected = [0.0, 0.05, 0.10, 0.15, 0.20]
    np.testing.assert_allclose(sorted(set(np.round(times, 10))), expected,
                               atol=1e-9)


def test_hdf5_writer_and_reader(tmp_path):
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_time=0.05)
    path = str(tmp_path / "out.h5")
    sim.output_writers["fields"] = HDF5Writer(
        outputs={"u": "u", "c": "c",
                 "ke": lambda m, s: np.asarray(
                     interior(m.grid, 0.5 * (s.u ** 2 + s.v ** 2)))},
        filename=path, schedule=TimeInterval(0.01))
    sim.state = model.initial_state(
        c=lambda x, y, z: jnp.sin(2 * np.pi * x))
    sim.run()
    with h5py.File(path, "r") as f:
        times = np.asarray(f["times"])
        assert len(times) == 6  # t = 0.0 .. 0.05
        assert f["fields"]["u"].shape == (6, 8, 1, 8)
        assert f["fields"]["ke"].shape[0] == 6
        assert f["grid"].attrs["Nx"] == 8
    fts = load_field_time_series(path, "c")
    assert len(fts) == 6
    mid = fts.at_time(0.005)
    np.testing.assert_allclose(mid, 0.5 * (fts[0] + fts[1]), atol=1e-7)


def test_checkpoint_restart_bitwise(tmp_path):
    """Restarting from a checkpoint must reproduce the uninterrupted run
    exactly (AB2 tendency history included) — the reference's
    checkpoint/pickup contract (checkpointer.jl:20-26)."""
    def build():
        grid = RectilinearGrid(size=(8, 8), x=(0.0, 1.0), z=(-1.0, 0.0),
                               topology=(Periodic, Flat, Bounded))
        return NonhydrostaticModel(grid=grid, advection=Centered(2),
                                   tracers=("c",),
                                   timestepper="QuasiAdamsBashforth2")

    model = build()
    state0 = model.initial_state(c=lambda x, y, z: jnp.sin(2 * np.pi * x),
                                 u=lambda x, y, z: jnp.cos(2 * np.pi * x))

    # uninterrupted run: 10 steps
    sim = Simulation(model, state=state0, dt=0.01, stop_iteration=10)
    ckpt = Checkpointer(dirname=str(tmp_path / "ckpts"),
                        schedule=IterationInterval(5))
    sim.output_writers["ckpt"] = ckpt
    final = sim.run()

    # restart from iteration 5
    model2 = build()
    template = model2.initial_state()
    restored = ckpt.restore(template,
                            path=ckpt._path(5))
    assert int(restored.clock.iteration) == 5
    sim2 = Simulation(model2, state=restored, dt=0.01, stop_iteration=10)
    final2 = sim2.run()

    np.testing.assert_array_equal(np.asarray(final.u), np.asarray(final2.u))
    np.testing.assert_array_equal(np.asarray(final.tracers["c"]),
                                  np.asarray(final2.tracers["c"]))


def test_time_step_wizard():
    model = small_model()
    sim = Simulation(model, dt=1.0, stop_iteration=3)
    sim.state = model.initial_state(u=1.0)
    sim.callbacks["wizard"] = Callback(
        TimeStepWizard(cfl=0.5, max_change=np.inf, min_change=0.0),
        IterationInterval(1))
    sim.initialize()
    # dx = 1/8, |u| = 1 -> advective timescale 1/8; dt -> 1/16
    assert abs(sim.dt - 1 / 16) < 1e-6


def test_run_batches_steps():
    """With only iteration-based schedules, the driver must advance in
    multi-step compiled windows (VERDICT r1 weak #3): the default
    NaN checker on IterationInterval(100) allows 100-step windows, so a
    250-iteration run needs at most a handful of dispatches."""
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_iteration=250)
    windows = []
    orig = sim._aligned_steps
    sim._aligned_steps = lambda: (windows.append(orig()), windows[-1])[1]
    sim.run()
    assert int(sim.state.clock.iteration) == 250
    assert max(n for n, _ in windows) >= 100
    assert len(windows) <= 4


def test_time_step_wizard_diffusive_cfl():
    """diffusive_cfl must bound dt by Δmin²/ν_max (reference
    time_step_wizard.jl:5-14 + cell_diffusion_timescale)."""
    grid = RectilinearGrid(size=(8, 8), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                closure=ScalarDiffusivity(nu=1.0))
    sim = Simulation(model, dt=1.0, stop_iteration=1)
    sim.state = model.initial_state(u=1.0)
    wiz = TimeStepWizard(cfl=0.5, diffusive_cfl=0.1, max_change=np.inf,
                         min_change=0.0)
    wiz(sim)
    # dx = dz = 1/8, nu = 1: tau_d = (1/8)^2; diffusive dt = 0.1/64,
    # which binds below the advective 0.5 * 1/8
    assert abs(sim.dt - 0.1 / 64) < 1e-8


def test_hdf5_with_halos(tmp_path):
    """HDF5Writer(with_halos=True) stores the full halo-extended arrays
    (reference jld2_writer.jl with_halos)."""
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_iteration=1)
    path = str(tmp_path / "halos.h5")
    sim.output_writers["f"] = HDF5Writer(
        outputs={"u": "u"}, filename=path,
        schedule=IterationInterval(1), with_halos=True)
    sim.run()
    with h5py.File(path, "r") as f:
        assert f["fields"]["u"].shape[1:] == tuple(sim.state.u.shape)


def test_nan_checker_halts():
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_iteration=5)
    bad = sim.state.u.at[:].set(jnp.nan)
    sim.state = sim.state.__class__(**{**sim.state.__dict__, "u": bad})
    sim.callbacks["nan_checker"].schedule = IterationInterval(1)
    with pytest.raises(RuntimeError, match="NaN found"):
        sim.run()


def test_specified_times_schedule():
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_time=0.1)
    hits = []
    sim.callbacks["rec"] = Callback(
        lambda s: hits.append(float(s.state.clock.time)),
        SpecifiedTimes(0.025, 0.075))
    sim.run()
    assert any(abs(h - 0.025) < 1e-9 for h in hits)
    assert any(abs(h - 0.075) < 1e-9 for h in hits)


def test_step_timer_and_trace(tmp_path):
    """Profiling utilities (SURVEY §5): StepTimer reports ms/step via a
    schedule callback; jax.profiler trace context captures a trace."""
    import os

    from oceananigans_tpu.utils.profiling import StepTimer, trace

    grid = RectilinearGrid(size=(16, 16), x=(0, 1), y=(0, 1),
                           topology=(Periodic, Periodic, Flat), halo=1)
    model = NonhydrostaticModel(grid=grid)
    state = model.initial_state(
        u=lambda x, y, z: np.sin(2 * np.pi * x))
    sim = Simulation(model, state=state, dt=1e-3, stop_iteration=20)
    lines = []
    sim.callbacks["t"] = Callback(StepTimer(printer=lines.append),
                                  IterationInterval(10))
    with trace(tmp_path / "trace"):
        sim.run()
    assert any("ms/step" in ln for ln in lines)
    assert os.listdir(tmp_path / "trace")


def test_callback_callsites():
    """Callback callsites (reference src/Oceananigans.jl:186-188 +
    callback.jl): UpdateStateCallsite fires before TimeStepCallsite
    callbacks; a TendencyCallsite callback is traced into the step as a
    pure G-dict transform."""
    from oceananigans_tpu import (
        TendencyCallsite, TimeStepCallsite, UpdateStateCallsite,
    )

    order = []
    model = small_model()

    def add_c_source(grid, state, G):
        G = dict(G)
        G["c"] = G["c"] + 1e-3
        return G

    sim = Simulation(model, dt=0.01, stop_iteration=4)
    sim.callbacks["upd"] = Callback(lambda s: order.append("upd"),
                                    IterationInterval(1),
                                    callsite=UpdateStateCallsite)
    sim.callbacks["ts"] = Callback(lambda s: order.append("ts"),
                                   IterationInterval(1),
                                   callsite=TimeStepCallsite)
    sim.callbacks["tend"] = Callback(add_c_source,
                                     callsite=TendencyCallsite)
    state0 = sim.state
    c0 = float(jnp.mean(interior(model.grid, state0.tracers["c"])))
    sim.run()
    # ordering within each actuation: update_state before time_step
    pairs = [order[i:i + 2] for i in range(0, len(order), 2)]
    assert all(p == ["upd", "ts"] for p in pairs if len(p) == 2)
    # the traced tendency source injected c at 1e-3 per unit time
    c1 = float(jnp.mean(interior(model.grid, sim.state.tracers["c"])))
    t1 = float(sim.state.clock.time)
    np.testing.assert_allclose(c1 - c0, 1e-3 * t1, rtol=1e-5)


def test_boundary_adjacent_mean_diagnostic():
    from oceananigans_tpu.diagnostics import boundary_adjacent_mean
    from oceananigans_tpu.fields import set_field
    grid = RectilinearGrid(size=(8, 8, 8), extent=(3.0, 4.0, 5.0),
                           topology=(Periodic, Periodic, Bounded))
    c = set_field(grid, lambda x, y, z: jnp.sin(2 * jnp.pi * y / 4.0))
    m = boundary_adjacent_mean(grid, c, "east")
    assert abs(float(m)) < 1e-7
    c2 = set_field(grid, lambda x, y, z: z)
    np.testing.assert_allclose(float(boundary_adjacent_mean(grid, c2,
                                                            "top")),
                               -5.0 / 16, rtol=1e-6)


def test_datetime_clock():
    """DateTime-capable clock (reference clock.jl time::DateTime): the
    traced scalar stays in seconds; the calendar origin is static pytree
    metadata surviving jit."""
    import datetime
    import jax
    model = small_model()
    t0 = datetime.datetime(2021, 3, 1, 12, 0, 0)
    state = model.initial_state(time=t0,
                                u=lambda x, y, z: 0.01 * jnp.sin(x))
    step = jax.jit(lambda s: model.step(s, 30.0))
    for _ in range(3):
        state = step(state)
    assert state.clock.date == t0 + datetime.timedelta(seconds=90)
    # epoch-less clocks report no date
    s2 = model.initial_state()
    assert s2.clock.date is None

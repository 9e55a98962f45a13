"""NetCDF writer, FieldTimeSeries forcing, windowed time average, logger
(reference test groups: simulation / output writers / field time series)."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    AveragedTimeInterval, Bounded, Centered, Flat, HDF5Writer, Periodic,
    RectilinearGrid, Simulation, TimeInterval,
)
from oceananigans_tpu.fields import interior
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.output import FieldTimeSeries, NetCDFWriter, \
    WindowedTimeAverage


def small_model(tracers=("c",)):
    grid = RectilinearGrid(size=(8, 8), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    return NonhydrostaticModel(grid=grid, tracers=tracers)


def test_netcdf_writer(tmp_path):
    model = small_model()
    sim = Simulation(model, dt=0.01, stop_time=0.03)
    sim.state = model.initial_state(c=lambda x, y, z: jnp.sin(2 * np.pi * x))
    path = str(tmp_path / "out.nc")
    sim.output_writers["nc"] = NetCDFWriter(
        outputs={"c": "c"}, filename=path, schedule=TimeInterval(0.01),
        global_attributes={"title": "test"})
    sim.run()
    with h5py.File(path) as f:
        assert f.attrs["Conventions"] == "CF-1.8"
        assert f.attrs["title"] == "test"
        assert f["c"].shape[0] == 4          # t = 0.00 .. 0.03
        # netCDF-4 dimension scales attached
        assert f["c"].dims[0][0] == f["time"]
        assert f["c"].dims[1][0] == f["x"]


def test_field_time_series_forcing():
    """A tracer forced by a stored time series relaxes as prescribed:
    F(t) interpolates linearly between snapshots."""
    model = small_model()
    grid = model.grid
    # series: F = 1 at t=0 -> F = 3 at t=1 (uniform in space)
    times = np.array([0.0, 1.0])
    data = np.stack([np.full(tuple(grid.N), 1.0),
                     np.full(tuple(grid.N), 3.0)])
    fts = FieldTimeSeries(times, data)
    model2 = NonhydrostaticModel(grid=grid, tracers=("c",),
                                 forcing={"c": fts})
    state = model2.initial_state()
    dt = 0.05
    step = jax.jit(lambda s: model2.step(s, dt))
    for _ in range(10):   # to t = 0.5; mean F over [0, 0.5] = 1.5
        state = step(state)
    c = float(np.asarray(interior(grid, state.tracers["c"])).mean())
    # ∫F dt = ∫(1+2t)dt = t + t² = 0.5 + 0.25 = 0.75 (RK3 in time, small err)
    np.testing.assert_allclose(c, 0.75, rtol=0.02)


def test_windowed_time_average(tmp_path):
    """An AveragedTimeInterval output records the trailing window mean."""
    model = small_model(tracers=())
    sim = Simulation(model, dt=0.01, stop_time=0.2)
    wta = WindowedTimeAverage(
        lambda m, s: np.array([float(s.clock.time)]))
    path = str(tmp_path / "avg.h5")
    sim.output_writers["avg"] = HDF5Writer(
        outputs={"tmean": wta}, filename=path,
        schedule=AveragedTimeInterval(0.1, window=0.05))
    sim.run()
    with h5py.File(path) as f:
        vals = np.asarray(f["fields"]["tmean"]).ravel()
    # the actuation at t=0.1 averaged times in (0.05, 0.1] -> ~0.075+dt/2
    assert len(vals) >= 2
    assert 0.05 < vals[1] < 0.11


def test_logger():
    import logging
    from oceananigans_tpu.utils.logger import get_logger
    log = get_logger("test_oc", level=logging.DEBUG)
    log.info("hello from the logger")   # should not raise
    assert log.handlers


def test_fts_backends_agree(tmp_path):
    """OnDisk and windowed InMemory backends return the same data as the
    fully-in-memory reader (reference field_time_series.jl:34-70)."""
    from oceananigans_tpu import IterationInterval, load_field_time_series
    from oceananigans_tpu.output import InMemory, OnDisk

    model = small_model()
    sim = Simulation(model, dt=0.01, stop_iteration=8)
    path = str(tmp_path / "series.h5")
    sim.output_writers["f"] = HDF5Writer(
        outputs={"c": "c"}, filename=path, schedule=IterationInterval(1))
    sim.state = model.initial_state(
        c=lambda x, y, z: jnp.sin(2 * np.pi * x) * jnp.exp(z))
    sim.run()

    full = load_field_time_series(path, "c")
    disk = load_field_time_series(path, "c", backend=OnDisk())
    win = load_field_time_series(path, "c", backend=InMemory(3))
    assert len(full) == len(disk) == len(win) == 9
    assert win.data is None and disk.data is None  # nothing preloaded
    for i in (0, 4, 8, 2, 7):   # exercise window reloads out of order
        np.testing.assert_array_equal(full[i], disk[i])
        np.testing.assert_array_equal(full[i], win[i])
    t = 0.033
    np.testing.assert_allclose(full.at_time(t), win.at_time(t), atol=1e-7)
    np.testing.assert_allclose(full.at_time(t), disk.at_time(t), atol=1e-7)


def test_file_splitting_by_size(tmp_path):
    """FileSizeLimit splits output into _part2, _part3... files
    (reference jld2_writer.jl file_splitting)."""
    from oceananigans_tpu import IterationInterval
    from oceananigans_tpu.output import FileSizeLimit, load_field_time_series
    import os

    model = small_model()
    base = str(tmp_path / "split.h5")
    sim = Simulation(model, dt=0.01, stop_iteration=12)
    sim.output_writers["f"] = HDF5Writer(
        outputs={"c": "c", "u": "u"}, filename=base,
        schedule=IterationInterval(1),
        file_splitting=FileSizeLimit(20_000))
    sim.run()
    parts = sorted(p for p in os.listdir(tmp_path) if p.startswith("split"))
    assert len(parts) >= 2, parts
    # every part is a readable series and together they cover 13 writes
    total = 0
    for p in parts:
        fts = load_field_time_series(str(tmp_path / p), "c")
        assert len(fts) >= 1
        total += len(fts)
    assert total == 13

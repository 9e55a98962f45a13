"""SplitRungeKutta3 (SSP Shu-Osher) timestepper for the hydrostatic
model (reference ``split_hydrostatic_runge_kutta_3.jl``)."""

import jax
import numpy as np
import pytest

from oceananigans_tpu import Bounded, Periodic, RectilinearGrid
from oceananigans_tpu.advection import WENO, BoundPreserving
from oceananigans_tpu.models import HydrostaticFreeSurfaceModel
from oceananigans_tpu.models.hydrostatic import ExplicitFreeSurface


def test_split_rk3_bound_preserving_tracer():
    """Convex SSP combinations + BoundPreserving advection keep a [0,1]
    tracer within bounds to machine precision (the property quasi-AB2
    cannot guarantee)."""
    grid = RectilinearGrid(size=(64, 1, 4), x=(0, 1e6), y=(0, 1e5),
                           z=(-1000, 0),
                           topology=(Periodic, Periodic, Bounded),
                           halo=3)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ExplicitFreeSurface(), tracers=("c",),
        tracer_advection=BoundPreserving(WENO(5)),
        timestepper="split_rk3")
    state = model.initial_state(
        u=lambda x, y, z: 0.5 + 0 * x,
        c=lambda x, y, z: np.where(np.abs(x - 5e5) < 1e5, 1.0, 0.0))
    m0 = float(np.asarray(grid.interior(state.tracers["c"])).mean())
    step = jax.jit(lambda s: model.step(s, 30.0))
    s = state
    for _ in range(200):
        s = step(s)
    s = jax.block_until_ready(s)
    ci = np.asarray(grid.interior(s.tracers["c"]))
    assert np.isfinite(ci).all()
    assert ci.min() > -1e-12 and ci.max() < 1.0 + 1e-12
    # mass conserved under advection (vs the discrete initial mass)
    np.testing.assert_allclose(ci.mean(), m0, rtol=1e-9)


def test_split_rk3_matches_ab2_on_gravity_wave():
    """Both steppers propagate a linear surface gravity wave with the
    same speed (c = sqrt(g H)); split_rk3 stays within a few % of the
    AB2 solution over a short run."""
    grid = RectilinearGrid(size=(64, 1, 4), x=(0, 1e5), y=(0, 1e4),
                           z=(-100, 0),
                           topology=(Periodic, Periodic, Bounded),
                           halo=3)

    def run(ts):
        model = HydrostaticFreeSurfaceModel(
            grid=grid, free_surface=ExplicitFreeSurface(),
            timestepper=ts)
        state = model.initial_state(
            eta=lambda x, y: 0.1 * np.sin(2 * np.pi * x / 1e5))
        step = jax.jit(lambda s: model.step(s, 5.0))
        s = state
        for _ in range(100):
            s = step(s)
        return np.asarray(jax.block_until_ready(s).eta)[:, :, 0]

    e_rk3 = run("split_rk3")
    e_ab2 = run("quasi_ab2")
    assert np.isfinite(e_rk3).all()
    denom = np.abs(e_ab2).max()
    assert np.abs(e_rk3 - e_ab2).max() / denom < 0.05


def test_split_rk3_rejects_zstar():
    from oceananigans_tpu.models.hydrostatic import ZStar
    grid = RectilinearGrid(size=(8, 1, 4), x=(0, 1), y=(0, 1),
                           z=(-1, 0),
                           topology=(Periodic, Periodic, Bounded),
                           halo=2)
    with pytest.raises(ValueError):
        HydrostaticFreeSurfaceModel(grid=grid, timestepper="split_rk3",
                                    vertical_coordinate=ZStar())

"""Dtype discipline: a float32 model must stay float32 under
``jax_enable_x64`` (the conftest enables x64 globally), and float64 models
must stay float64. Guards the round-1 bug where a ``np.float64`` scalar
(``SplitExplicitFreeSurface.fractional_step``) promoted the whole
split-explicit scan carry. Reference: the Julia package is parametric in
FT throughout (``src/Grids/grid_utils.jl``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import Bounded, Flat, Periodic, RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.buoyancy import BuoyancyTracer
from oceananigans_tpu.models import (
    HydrostaticFreeSurfaceModel, NonhydrostaticModel, ShallowWaterModel,
)
from oceananigans_tpu.models.hydrostatic import (
    ExplicitFreeSurface, ImplicitFreeSurface, SplitExplicitFreeSurface,
)


def _assert_all_dtype(tree, dtype, label):
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            assert leaf.dtype == np.dtype(dtype), (
                f"{label}: leaf has dtype {leaf.dtype}, wanted {dtype}")


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_nonhydrostatic_dtype_stable(dtype):
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded),
                           dtype=dtype)
    model = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                tracers=("b",), buoyancy=BuoyancyTracer())
    state = model.initial_state(b=lambda x, y, z: 0.01 * z)
    out = jax.jit(lambda s: model.step(s, 1e-3))(state)
    _assert_all_dtype(out, dtype, "nonhydrostatic")


@pytest.mark.parametrize("fs", [ExplicitFreeSurface(),
                                SplitExplicitFreeSurface(substeps=8),
                                ImplicitFreeSurface()])
@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_hydrostatic_dtype_stable(fs, dtype):
    grid = RectilinearGrid(size=(8, 8, 4), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded),
                           dtype=dtype)
    model = HydrostaticFreeSurfaceModel(grid=grid, free_surface=fs,
                                        tracers=("b",),
                                        buoyancy=BuoyancyTracer())
    state = model.initial_state(
        b=lambda x, y, z: 1e-5 * z,
        eta=lambda x, y: 0.01 * jnp.sin(2 * np.pi * x))
    out = jax.jit(lambda s: model.step(s, 0.05))(state)
    _assert_all_dtype(out, dtype, f"hydrostatic/{fs!r}")


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_shallow_water_dtype_stable(dtype):
    grid = RectilinearGrid(size=(8, 8), extent=(1.0, 1.0),
                           topology=(Periodic, Periodic, Flat),
                           dtype=dtype)
    model = ShallowWaterModel(grid=grid, gravitational_acceleration=9.81)
    state = model.initial_state(h=1.0)
    out = jax.jit(lambda s: model.step(s, 1e-3))(state)
    _assert_all_dtype(out, dtype, "shallow_water")

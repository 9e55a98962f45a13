"""Fused Pallas kernels inside the explicit-halo distributed step.

STATUS round-2 gap #5: under GSPMD the Pallas kernels are auto-disabled,
but the ``shard_map`` path runs the LOCAL model per shard — each shard's
block is exactly a single-chip halo-extended array, so the fused kernels
apply unchanged. These tests run them (interpret mode, via
``config.pallas_interpret``) on the 8-virtual-device CPU mesh and check
the distributed-fused step matches the serial XLA step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from oceananigans_tpu import (
    BuoyancyTracer, Centered, NonhydrostaticModel, RectilinearGrid, WENO,
)
from oceananigans_tpu.config import config
from oceananigans_tpu.grids.base import Bounded, Periodic
from oceananigans_tpu.parallel import DistributedStep


@pytest.fixture
def pallas_interpret():
    config.pallas_interpret = True
    yield
    config.pallas_interpret = False


def _run(make_serial, make_fused, grid, ic, steps=3, dt=1e-3):
    model = make_serial(grid)
    state = model.initial_state(**ic)
    step = jax.jit(lambda s: model.step(s, dt))
    s_serial = state
    for _ in range(steps):
        s_serial = step(s_serial)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("x", "y"))
    dstep = DistributedStep(make_fused, grid, mesh)
    assert dstep.lmodel.fused_kernels, (
        "local model did not engage a fused kernel: "
        f"{dstep.lmodel.fused_kernels!r}")
    f = dstep.step_fn()
    sl = dstep.to_local_state(state)
    for _ in range(steps):
        sl = f(sl, dt)
    final = dstep.from_local_state(sl)
    return s_serial, final


def test_dist_step_with_centered2_kernel(pallas_interpret):
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))

    def serial(g):
        return NonhydrostaticModel(grid=g, advection=Centered(2),
                                   fused_kernels=False)

    def fused(g):
        return NonhydrostaticModel(grid=g, advection=Centered(2),
                                   fused_kernels=True)

    ic = dict(u=lambda x, y, z: 0.1 * jnp.sin(2 * np.pi * x)
              * jnp.cos(2 * np.pi * y),
              v=lambda x, y, z: 0.05 * jnp.cos(2 * np.pi * y))
    s_serial, final = _run(serial, fused, grid, ic)
    for name in ("u", "v", "w"):
        a = np.asarray(grid.interior(getattr(s_serial, name)))
        b = np.asarray(grid.interior(jnp.asarray(getattr(final, name))))
        np.testing.assert_allclose(b, a, atol=2e-13, err_msg=name)


def test_weno5_kernel_inside_shard_map(pallas_interpret):
    """The WENO-5 momentum kernel runs per shard inside ``shard_map``
    (full-step interpret-mode lowering overflows CPU thread stacks, so
    this exercises the kernel-in-shard mechanism directly; the full
    distributed step is the same composition as the Centered(2) test)."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from oceananigans_tpu.boundary_conditions import (
        fill_halo_regions, regularize_field_boundary_conditions,
    )
    from oceananigans_tpu.fields import LOC_C, LOC_U, LOC_V, LOC_W
    from oceananigans_tpu.ops.pallas_weno import (
        weno5_available, weno5_momentum_tendency,
    )
    from oceananigans_tpu.advection import div_vu, div_vv, div_vw

    scheme = WENO(5)
    # one shard's local grid: periodic everywhere, halo 3. float32: the
    # kernel's approx-reciprocal path is f32 (like the real TPU VPU).
    lgrid = RectilinearGrid(size=(8, 8, 8), extent=(0.5, 1.0, 1.0),
                            topology=(Periodic, Periodic, Periodic), halo=3,
                            dtype="float32")
    assert weno5_available(lgrid, scheme)

    rng = np.random.default_rng(3)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("x", "y"))
    spec = P("x", None, None)

    def local_fields():
        out = []
        for loc in (LOC_U, LOC_V, LOC_W):
            bcs = regularize_field_boundary_conditions(None, lgrid, loc)
            a = fill_halo_regions(
                jnp.asarray(rng.standard_normal(lgrid.shape),
                            jnp.float32), lgrid, bcs, loc)
            out.append(a)
        return out

    # two independent local blocks stacked on the sharded axis
    blocks = [local_fields() for _ in range(2)]
    u = jnp.concatenate([b[0] for b in blocks], axis=0)
    v = jnp.concatenate([b[1] for b in blocks], axis=0)
    w = jnp.concatenate([b[2] for b in blocks], axis=0)
    u, v, w = (jax.device_put(a, NamedSharding(mesh, spec))
               for a in (u, v, w))

    def body(u, v, w):
        return weno5_momentum_tendency(lgrid, u, v, w,
                                       epsilon=scheme.epsilon)

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=(spec,) * 3,
                          out_specs=(spec,) * 3, check_vma=False))
    Gu, Gv, Gw = f(u, v, w)

    S = lgrid.interior_slices
    n = lgrid.shape[0]
    for k, (ul, vl, wl) in enumerate(blocks):
        ref = (-div_vu(lgrid, scheme, ul, vl, wl),
               -div_vv(lgrid, scheme, ul, vl, wl),
               -div_vw(lgrid, scheme, ul, vl, wl))
        for got, want, name in zip((Gu, Gv, Gw), ref, "uvw"):
            g_blk = got[k * n:(k + 1) * n][S]
            # rtol bounded by the interpret-mode approx-reciprocal
            # emulation (~1e-4); the on-chip kernel matches to ~1e-7
            np.testing.assert_allclose(
                np.asarray(g_blk), np.asarray(want[S]), rtol=1e-3,
                atol=1e-4, err_msg=f"block {k} G{name}")

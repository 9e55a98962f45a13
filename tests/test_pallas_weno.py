"""Fused WENO-5 momentum-tendency Pallas kernel vs the XLA path.

Runs in interpret mode on CPU (the conftest's virtual-device mesh);
tolerance is loosened to 3e-5 because interpret mode emulates the VPU
fast-reciprocal more crudely than the hardware (on-chip error vs the XLA
path measures <= 2e-7 relative — see ops/pallas_weno.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import Bounded, Periodic, RectilinearGrid
from oceananigans_tpu.advection import WENO, Centered, div_vu, div_vv, div_vw
from oceananigans_tpu.ops.pallas_weno import (
    weno5_available, weno5_momentum_tendency,
)

TOL = 3e-5


def _periodic_fields(N, halo=3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for k in range(3):
        a = rng.standard_normal((N, N, N)).astype(np.float32)
        full = np.zeros((N + 2 * halo,) * 3, np.float32)
        full[(slice(halo, -halo),) * 3] = a
        for ax in range(3):
            idx = [slice(None)] * 3
            src = [slice(None)] * 3
            idx[ax] = slice(0, halo)
            src[ax] = slice(N, N + halo)
            full[tuple(idx)] = full[tuple(src)]
            idx[ax] = slice(N + halo, N + 2 * halo)
            src[ax] = slice(halo, 2 * halo)
            full[tuple(idx)] = full[tuple(src)]
        out.append(jnp.asarray(full))
    return out


def test_weno5_kernel_matches_xla_path():
    N = 16
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 2.0, 3.0),
                           topology=(Periodic,) * 3, halo=(3, 3, 3),
                           dtype="float32")
    sch = WENO(5)
    assert weno5_available(grid, sch)
    u, v, w = _periodic_fields(N)
    ref = (-div_vu(grid, sch, u, v, w), -div_vv(grid, sch, u, v, w),
           -div_vw(grid, sch, u, v, w))
    got = weno5_momentum_tendency(grid, u, v, w, interpret=True)
    ii = (slice(3, -3),) * 3
    for name, a, b in zip(("Gu", "Gv", "Gw"), ref, got):
        a = np.asarray(a)[ii]
        b = np.asarray(b)[ii]
        err = np.abs(a - b).max() / np.abs(a).max()
        assert err < TOL, (name, err)


def test_weno5_kernel_tile_sizes_agree():
    N = 16
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic,) * 3, halo=(3, 3, 3),
                           dtype="float32")
    u, v, w = _periodic_fields(N, seed=3)
    ii = (slice(3, -3),) * 3
    base = weno5_momentum_tendency(grid, u, v, w, tile_x=1, interpret=True)
    for tx in (2, 4):
        got = weno5_momentum_tendency(grid, u, v, w, tile_x=tx,
                                      interpret=True)
        for a, b in zip(base, got):
            np.testing.assert_allclose(np.asarray(a)[ii], np.asarray(b)[ii],
                                       rtol=2e-6, atol=1e-7)


def test_weno5_tracer_kernel_matches_xla_path():
    from oceananigans_tpu.advection import div_Uc
    from oceananigans_tpu.ops.pallas_weno import weno5_tracer_tendencies
    N = 16
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 2.0, 3.0),
                           topology=(Periodic,) * 3, halo=(3, 3, 3),
                           dtype="float32")
    sch = WENO(5)
    u, v, w = _periodic_fields(N)
    c1, c2 = _periodic_fields(N, seed=7)[:2]
    got = weno5_tracer_tendencies(grid, u, v, w, {"a": c1, "b": c2},
                                  interpret=True)
    ii = (slice(3, -3),) * 3
    for name, c in (("a", c1), ("b", c2)):
        ref = np.asarray(-div_Uc(grid, sch, u, v, w, c))[ii]
        b = np.asarray(got[name])[ii]
        err = np.abs(ref - b).max() / np.abs(ref).max()
        assert err < TOL, (name, err)


def test_weno5_availability_gate():
    g_ok = RectilinearGrid(size=(16, 16, 128), extent=(1, 1, 1),
                           topology=(Bounded, Periodic, Periodic),
                           halo=(3, 3, 0), dtype="float32")
    assert weno5_available(g_ok, WENO(5))
    assert not weno5_available(g_ok, WENO(7))       # order
    assert not weno5_available(g_ok, Centered(2))   # scheme
    assert not weno5_available(g_ok, WENO(5, bounds=(0.0, 1.0)))
    g_thin_halo = RectilinearGrid(size=(16, 16, 128), extent=(1, 1, 1),
                                  topology=(Bounded, Periodic, Periodic),
                                  halo=(1, 3, 0), dtype="float32")
    assert not weno5_available(g_thin_halo, WENO(5))
    # halo-free non-tile-aligned periodic lane axis
    g_misaligned = RectilinearGrid(size=(16, 16, 100), extent=(1, 1, 1),
                                   topology=(Bounded, Periodic, Periodic),
                                   halo=(3, 3, 0), dtype="float32")
    assert not weno5_available(g_misaligned, WENO(5))
    # stretched grid -> tables -> XLA path
    import numpy as _np
    zf = -_np.cos(_np.linspace(0, _np.pi / 2, 129))
    g_str = RectilinearGrid(size=(16, 16, 128),
                            x=(0.0, 1.0), y=(0.0, 1.0), z=zf,
                            topology=(Bounded, Periodic, Bounded),
                            halo=(3, 3, 3), dtype="float32")
    assert not weno5_available(g_str, WENO(5).bind_grid(g_str))


def test_model_dispatches_weno5_kernel_tag():
    from oceananigans_tpu.models import NonhydrostaticModel
    g = RectilinearGrid(size=(16, 16, 128), extent=(1, 1, 1),
                        topology=(Bounded, Periodic, Periodic),
                        halo=(3, 0, 0), dtype="float32")
    m = NonhydrostaticModel(grid=g, advection=WENO(5), fused_kernels=True)
    assert m.fused_kernels == "weno5"
    m2 = NonhydrostaticModel(grid=g, advection=WENO(5),
                             fused_kernels=False)
    assert m2.fused_kernels is False
    # auto never engages Pallas on CPU (the XLA path is the reference)
    m3 = NonhydrostaticModel(grid=g, advection=WENO(5),
                             fused_kernels="auto")
    assert m3.fused_kernels in (False, "weno5")
    if jax.default_backend() == "cpu":
        assert m3.fused_kernels is False


def test_weno5_ab2_fused_step_matches_plain():
    """The fused WENO-5 tendency+AB2 kernel (weno5_ab2_update, direct
    HBM slab stores, G buffers aliased) reproduces the tendency-kernel +
    AB2-axpy path over several full steps."""
    import jax

    from oceananigans_tpu import (
        Bounded, Periodic, RectilinearGrid, WENO,
    )
    from oceananigans_tpu.config import config
    from oceananigans_tpu.models import NonhydrostaticModel
    from oceananigans_tpu.ops.pallas_weno import weno5_ab2_available

    grid = RectilinearGrid(size=(16, 16, 128), extent=(1.0, 1.0, 1.0),
                           topology=(Bounded, Periodic, Periodic),
                           halo=(3, 0, 0), dtype="float32")
    assert weno5_ab2_available(grid, WENO(5))
    m_fused = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                  fused_kernels=True,
                                  timestepper="QuasiAdamsBashforth2")
    m_plain = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                  fused_kernels=False,
                                  timestepper="QuasiAdamsBashforth2")
    assert m_fused.fused_ab2_weno
    assert not m_plain.fused_ab2_weno

    def init(m):
        return m.initial_state(
            u=lambda x, y, z: 0.1 * jnp.sin(4 * np.pi * x)
            * jnp.cos(2 * np.pi * y),
            v=lambda x, y, z: 0.1 * jnp.cos(2 * np.pi * x)
            * jnp.sin(6 * np.pi * z))

    dt = jnp.float32(1e-3)
    old = config.pallas_interpret
    config.pallas_interpret = True
    try:
        sf, sp = init(m_fused), init(m_plain)
        step_f = jax.jit(lambda s: m_fused.step(s, dt))
        step_p = jax.jit(lambda s: m_plain.step(s, dt))
        for _ in range(4):
            sf = step_f(sf)
            sp = step_p(sp)
    finally:
        config.pallas_interpret = old
    ii = grid.interior_slices
    floor = float(np.abs(np.asarray(sp.u)).max())
    # 2e-4 relative: the WENO-Z nonlinear weights amplify the kernel's
    # ~1e-7-relative evaluation differences (reassociation + the
    # on-chip fast-reciprocal contract) across 4 steps of feedback
    for name in ("u", "v", "w", "Gu", "Gv", "Gw"):
        a = np.asarray(getattr(sf, name))[ii]
        b = np.asarray(getattr(sp, name))[ii]
        scale = max(float(np.abs(b).max()), floor)
        assert np.abs(a - b).max() / scale < 2e-4, name


def test_weno5_science_ab2_fused_step_matches_plain():
    """The WENO SCIENCE fused kernel (weno5_science_ab2_update:
    momentum + f-plane + BuoyancyTracer + WENO tracer advections + AB2
    in one pass) reproduces the plain path over several steps."""
    import jax

    from oceananigans_tpu import (
        Bounded, BuoyancyTracer, FPlane, Periodic, RectilinearGrid, WENO,
    )
    from oceananigans_tpu.config import config
    from oceananigans_tpu.models import NonhydrostaticModel

    grid = RectilinearGrid(size=(16, 16, 128), extent=(1.0, 1.0, 1.0),
                           topology=(Bounded, Periodic, Periodic),
                           halo=(3, 0, 0), dtype="float32")

    def build(fused):
        return NonhydrostaticModel(
            grid=grid, advection=WENO(5), fused_kernels=fused,
            timestepper="QuasiAdamsBashforth2",
            coriolis=FPlane(f=1e-2), buoyancy=BuoyancyTracer(),
            tracers=("b", "c"))

    m_fused = build(True)
    m_plain = build(False)
    assert m_fused.fused_ab2_weno_science
    assert not m_fused.fused_ab2_weno
    assert not m_plain.fused_ab2_weno_science

    def init(m):
        return m.initial_state(
            u=lambda x, y, z: 0.1 * jnp.sin(4 * np.pi * x)
            * jnp.cos(2 * np.pi * y),
            v=lambda x, y, z: 0.1 * jnp.cos(2 * np.pi * x)
            * jnp.sin(6 * np.pi * z),
            b=lambda x, y, z: 0.01 * jnp.sin(2 * np.pi * z)
            + 0.001 * jnp.cos(2 * np.pi * x),
            c=lambda x, y, z: jnp.cos(2 * np.pi * y)
            * jnp.sin(2 * np.pi * x))

    dt = jnp.float32(1e-3)
    old = config.pallas_interpret
    config.pallas_interpret = True
    try:
        sf, sp = init(m_fused), init(m_plain)
        step_f = jax.jit(lambda s: m_fused.step(s, dt))
        step_p = jax.jit(lambda s: m_plain.step(s, dt))
        for _ in range(4):
            sf = step_f(sf)
            sp = step_p(sp)
    finally:
        config.pallas_interpret = old
    ii = grid.interior_slices
    floor = float(np.abs(np.asarray(sp.u)).max())
    for name in ("u", "v", "w", "Gu", "Gv", "Gw"):
        a = np.asarray(getattr(sf, name))[ii]
        b = np.asarray(getattr(sp, name))[ii]
        scale = max(float(np.abs(b).max()), floor)
        assert np.abs(a - b).max() / scale < 2e-4, name
    for name in ("b", "c"):
        a = np.asarray(sf.tracers[name])[ii]
        bb = np.asarray(sp.tracers[name])[ii]
        assert np.abs(a - bb).max() / np.abs(bb).max() < 2e-4, name

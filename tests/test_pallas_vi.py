"""Fused vector-invariant momentum-tendency Pallas kernel
(``ops/pallas_vi.py``) against the XLA whole-array path, in interpret
mode (the on-chip path shares the trace; only the Mosaic lowering
differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import Bounded, Periodic, RectilinearGrid
from oceananigans_tpu.boundary_conditions import (
    fill_halo_regions, regularize_field_boundary_conditions,
)
from oceananigans_tpu.fields import LOC_U, LOC_V, LOC_W
from oceananigans_tpu.models.hydrostatic import (
    CrossAndSelfUpwinding, VectorInvariant, WENOVectorInvariant,
)
from oceananigans_tpu.ops.pallas_vi import (
    vi_available, vi_halo_x, vi_momentum_tendency,
)


def _fields(grid, seed=3):
    rng = np.random.default_rng(seed)

    def mk(loc):
        a = jnp.asarray(rng.standard_normal(grid.shape))
        bcs = regularize_field_boundary_conditions(None, grid, loc)
        return fill_halo_regions(a, grid, bcs, loc)

    return mk(LOC_U), mk(LOC_V), mk(LOC_W)


def _check(vi, grid, tol=1e-12):
    u, v, w = _fields(grid)
    gu, gv = jax.jit(lambda u, v, w: vi_momentum_tendency(
        grid, vi, u, v, w, interpret=True))(u, v, w)
    S = grid.interior_slices
    for a, b in ((gu, vi.u_tendency(grid, u, v, w)),
                 (gv, vi.v_tendency(grid, u, v, w))):
        err = float(jnp.max(jnp.abs(a[S] - b[S])))
        scale = float(jnp.max(jnp.abs(b[S])))
        assert err / scale < tol, err / scale


@pytest.mark.parametrize("stencil", ["velocity", "default"])
def test_vi_kernel_matches_xla_bounded(stencil):
    """Reference-default WENOVectorInvariant (WENO-9 vorticity, WENO-5
    elsewhere, OnlySelfUpwinding) on an all-bounded grid."""
    vi = WENOVectorInvariant(vorticity_stencil=stencil)
    grid = RectilinearGrid(size=(16, 12, 8), extent=(1.0, 2.0, 0.5),
                           topology=(Bounded, Bounded, Bounded), halo=6,
                           dtype="float64")
    assert vi_available(grid, vi)
    assert vi_halo_x(vi) == 5
    _check(vi, grid)


def test_vi_kernel_matches_xla_order5_halofree():
    """Uniform order 5, halo-free periodic y/z tile-aligned layout (the
    in-register roll wrap IS the periodic boundary)."""
    vi = WENOVectorInvariant(order=5)
    grid = RectilinearGrid(size=(12, 16, 128), extent=(1.0, 2.0, 0.5),
                           topology=(Bounded, Periodic, Periodic),
                           halo=(4, 0, 0), dtype="float64")
    assert vi_available(grid, vi)
    _check(vi, grid)


def test_vi_availability_gate():
    grid = RectilinearGrid(size=(16, 12, 8), extent=(1.0, 2.0, 0.5),
                           topology=(Bounded, Bounded, Bounded), halo=6,
                           dtype="float64")
    # string (conserving) schemes stay on the XLA path
    assert not vi_available(grid, VectorInvariant())
    # cross-and-self upwinding is not fused
    assert not vi_available(
        grid, WENOVectorInvariant(upwinding=CrossAndSelfUpwinding()))
    # insufficient x halo
    small = RectilinearGrid(size=(16, 12, 8), extent=(1.0, 2.0, 0.5),
                            topology=(Bounded, Bounded, Bounded), halo=4,
                            dtype="float64")
    assert not vi_available(small, WENOVectorInvariant())
    assert vi_available(small, WENOVectorInvariant(order=5))
    # stretched grids stay on the XLA path
    stretched = RectilinearGrid(
        size=(16, 12, 8), x=(0.0, 1.0), y=(0.0, 2.0),
        z=lambda k: -0.5 * (1 - k / 8) ** 1.3,
        topology=(Bounded, Bounded, Bounded), halo=6, dtype="float64")
    assert not vi_available(stretched, WENOVectorInvariant())


def test_hydrostatic_model_fused_gate_off_on_cpu():
    """The model resolves fused_kernels="auto" to False on CPU."""
    from oceananigans_tpu.models import HydrostaticFreeSurfaceModel

    grid = RectilinearGrid(size=(16, 12, 8), extent=(1.0, 2.0, 0.5),
                           topology=(Bounded, Bounded, Bounded), halo=6,
                           dtype="float64")
    model = HydrostaticFreeSurfaceModel(
        grid=grid, momentum_advection=WENOVectorInvariant(),
        tracers=("b",))
    assert model.fused_kernels is False


def test_tracer_kernel_matches_div_Uc():
    """Generic-order fused tracer advection (``ops/pallas_tracer``)
    equals −div_Uc for orders 5/7/9 (interpret mode, f64)."""
    from oceananigans_tpu import WENO
    from oceananigans_tpu.advection import div_Uc
    from oceananigans_tpu.fields import LOC_C
    from oceananigans_tpu.ops.pallas_tracer import (
        tracer_fusion_available, weno_tracer_tendencies,
    )

    for order, halo in ((5, 3), (7, 4)):
        sch = WENO(order)
        grid = RectilinearGrid(size=(16, 12, 8), extent=(1.0, 2.0, 0.5),
                               topology=(Bounded, Bounded, Bounded),
                               halo=halo + 1, dtype="float64")
        assert tracer_fusion_available(grid, sch)
        u, v, w = _fields(grid, seed=7)
        rng = np.random.default_rng(11)
        bcs = regularize_field_boundary_conditions(None, grid, LOC_C)
        cs = {}
        for name in ("T", "S"):
            a = jnp.asarray(rng.standard_normal(grid.shape))
            cs[name] = fill_halo_regions(a, grid, bcs, LOC_C)
        got = jax.jit(lambda u, v, w, cs: weno_tracer_tendencies(
            grid, sch, u, v, w, cs, interpret=True))(u, v, w, cs)
        S = grid.interior_slices
        for name in cs:
            ref = -div_Uc(grid, sch, u, v, w, cs[name])
            err = float(jnp.max(jnp.abs(got[name][S] - ref[S])))
            assert err / float(jnp.max(jnp.abs(ref[S]))) < 1e-12


def test_hydrostatic_fused_step_matches_xla():
    """A full hydrostatic step with both fused kernels forced on (CPU
    interpret mode) matches the XLA path to f64 roundoff — validates the
    model wiring, not just the kernels."""
    import dataclasses

    from oceananigans_tpu import WENO
    from oceananigans_tpu.models import (
        HydrostaticFreeSurfaceModel, SplitExplicitFreeSurface,
    )

    grid = RectilinearGrid(size=(16, 12, 8), extent=(1e5, 2e5, 1e3),
                           topology=(Bounded, Bounded, Bounded), halo=6,
                           dtype="float64")

    def build(fused):
        return HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=WENOVectorInvariant(),
            tracer_advection=WENO(7), tracers=("T",),
            free_surface=SplitExplicitFreeSurface(substeps=8),
            fused_kernels=fused)

    m_x = build(False)
    m_f = build(True)
    assert m_f.fused_kernels and m_f.fused_tracer
    state = m_x.initial_state(
        u=lambda x, y, z: 0.1 * jnp.sin(2 * np.pi * x / 1e5),
        v=lambda x, y, z: 0.05 * jnp.cos(np.pi * y / 2e5),
        T=lambda x, y, z: 10.0 + 1e-3 * z)
    dt = 30.0
    s_x = jax.jit(lambda s: m_x.step(s, dt))(state)
    s_f = jax.jit(lambda s: m_f.step(s, dt))(state)
    S = grid.interior_slices
    for a, b in ((s_f.u, s_x.u), (s_f.v, s_x.v),
                 (s_f.tracers["T"], s_x.tracers["T"])):
        err = float(jnp.max(jnp.abs(a[S] - b[S])))
        scale = float(jnp.max(jnp.abs(b[S]))) or 1.0
        assert err / scale < 1e-11, err / scale


def test_nonhydrostatic_fused_tracer_step_matches_xla():
    """Nonhydrostatic WENO(7) tracers route through the generic fused
    kernel when forced on; a full step matches the XLA path (f64)."""
    from oceananigans_tpu import WENO
    from oceananigans_tpu.models import NonhydrostaticModel

    grid = RectilinearGrid(size=(16, 12, 8), extent=(1.0, 2.0, 0.5),
                           topology=(Bounded, Bounded, Bounded), halo=4,
                           dtype="float64")

    def build(fused):
        return NonhydrostaticModel(grid=grid, advection=WENO(7),
                                   tracers=("c",),
                                   timestepper="QuasiAdamsBashforth2",
                                   fused_kernels=fused)

    m_x = build(False)
    m_f = build(True)
    assert m_f.fused_tracer and not m_f.fused_kernels
    state = m_x.initial_state(
        u=lambda x, y, z: 0.1 * jnp.sin(2 * np.pi * x),
        c=lambda x, y, z: jnp.cos(np.pi * y))
    s_x = jax.jit(lambda s: m_x.step(s, 1e-3))(state)
    s_f = jax.jit(lambda s: m_f.step(s, 1e-3))(state)
    S = grid.interior_slices
    err = float(jnp.max(jnp.abs(s_f.tracers["c"][S] - s_x.tracers["c"][S])))
    assert err < 1e-13, err


def test_vi_kernel_matches_xla_latlon():
    """Lat-lon grid: the sphere's curvature metrics become broadcast
    y-profiles in VMEM; the kernel matches the XLA path on a rotating-
    sphere sector (f64, interpret)."""
    from oceananigans_tpu import LatitudeLongitudeGrid

    vi = WENOVectorInvariant()
    grid = LatitudeLongitudeGrid(size=(24, 16, 8), longitude=(-30.0, 30.0),
                                 latitude=(15.0, 55.0), z=(-1000.0, 0.0),
                                 halo=6, dtype="float64")
    assert vi_available(grid, vi)
    _check(vi, grid)


def test_tracer_kernel_matches_div_Uc_latlon():
    """Fused tracer advection on a lat-lon grid (curvature metrics as
    VMEM profiles) equals −div_Uc (f64, interpret)."""
    from oceananigans_tpu import LatitudeLongitudeGrid, WENO
    from oceananigans_tpu.advection import div_Uc
    from oceananigans_tpu.fields import LOC_C
    from oceananigans_tpu.ops.pallas_tracer import (
        tracer_fusion_available, weno_tracer_tendencies,
    )

    sch = WENO(7)
    grid = LatitudeLongitudeGrid(size=(24, 16, 8), longitude=(-30.0, 30.0),
                                 latitude=(15.0, 55.0), z=(-1000.0, 0.0),
                                 halo=5, dtype="float64")
    assert tracer_fusion_available(grid, sch)
    u, v, w = _fields(grid, seed=9)
    rng = np.random.default_rng(13)
    bcs = regularize_field_boundary_conditions(None, grid, LOC_C)
    c = fill_halo_regions(jnp.asarray(rng.standard_normal(grid.shape)),
                          grid, bcs, LOC_C)
    got = jax.jit(lambda u, v, w, c: weno_tracer_tendencies(
        grid, sch, u, v, w, {"T": c}, interpret=True))(u, v, w, c)
    S = grid.interior_slices
    ref = -div_Uc(grid, sch, u, v, w, c)
    err = float(jnp.max(jnp.abs(got["T"][S] - ref[S])))
    assert err / float(jnp.max(jnp.abs(ref[S]))) < 1e-12


def test_tracer_kernel_transposed_layout_matches_div_Uc():
    """The (z, y, x) slab-over-z TRANSPOSED layout of the fused tracer
    kernel (round-5 lane-major relayout for nz ≈ 60 configs) equals
    −div_Uc for orders 5/7 (interpret mode, f64), forced AND via the
    auto-preference on an nz-thin grid."""
    from oceananigans_tpu import WENO
    from oceananigans_tpu.advection import div_Uc
    from oceananigans_tpu.fields import LOC_C
    from oceananigans_tpu.ops.pallas_tracer import (
        tracer_fusion_available, transposed_layout_preferred,
        weno_tracer_tendencies,
    )

    for order, halo in ((5, 3), (7, 4)):
        sch = WENO(order)
        grid = RectilinearGrid(size=(16, 12, 8), extent=(1.0, 2.0, 0.5),
                               topology=(Bounded, Bounded, Bounded),
                               halo=halo + 1, dtype="float64")
        assert tracer_fusion_available(grid, sch)
        u, v, w = _fields(grid, seed=3)
        rng = np.random.default_rng(5)
        bcs = regularize_field_boundary_conditions(None, grid, LOC_C)
        cs = {}
        for name in ("T", "S"):
            a = jnp.asarray(rng.standard_normal(grid.shape))
            cs[name] = fill_halo_regions(a, grid, bcs, LOC_C)
        got = jax.jit(lambda u, v, w, cs: weno_tracer_tendencies(
            grid, sch, u, v, w, cs, interpret=True,
            layout="zyx"))(u, v, w, cs)
        S = grid.interior_slices
        for name in cs:
            ref = -div_Uc(grid, sch, u, v, w, cs[name])
            err = float(jnp.max(jnp.abs(got[name][S] - ref[S])))
            assert err / float(jnp.max(jnp.abs(ref[S]))) < 1e-12

    # the auto gate prefers the transposed layout for the realistic
    # nz-thin configuration (x lanes pad 4%, z lanes would pad 88%)
    g2 = RectilinearGrid(size=(360, 160, 60), extent=(4e7, 2e7, 4e3),
                         topology=(Periodic, Bounded, Bounded),
                         halo=4, dtype="float32")
    assert transposed_layout_preferred(g2, WENO(7))


@pytest.mark.parametrize("stencil", ["velocity", "default"])
def test_vi_kernel_transposed_layout_matches_xla(stencil):
    """The TRANSPOSED (z, y, x) VI kernel (round-5 lane-major relayout
    for nz-thin realistic configs) matches the XLA path at f64
    roundoff."""
    from oceananigans_tpu.ops.pallas_vi import (
        vi_momentum_tendency_zyx, vi_transposed_layout_preferred,
    )
    vi = WENOVectorInvariant(vorticity_stencil=stencil)
    grid = RectilinearGrid(size=(16, 12, 8), extent=(1.0, 2.0, 0.5),
                           topology=(Bounded, Bounded, Bounded), halo=6,
                           dtype="float64")
    u, v, w = _fields(grid)
    gu, gv = jax.jit(lambda u, v, w: vi_momentum_tendency_zyx(
        grid, vi, u, v, w, interpret=True))(u, v, w)
    S = grid.interior_slices
    for a, b in ((gu, vi.u_tendency(grid, u, v, w)),
                 (gv, vi.v_tendency(grid, u, v, w))):
        err = float(jnp.max(jnp.abs(a[S] - b[S])))
        scale = float(jnp.max(jnp.abs(b[S])))
        assert err / scale < 1e-12, err / scale

    # the realistic hydro config prefers the transposed layout
    g2 = RectilinearGrid(size=(360, 160, 60), extent=(4e7, 2e7, 4e3),
                         topology=(Periodic, Bounded, Bounded),
                         halo=(6, 6, 4), dtype="float32")
    assert vi_transposed_layout_preferred(g2, WENOVectorInvariant())


def test_hydrostatic_step_transposed_vi_matches_xla():
    """Full hydrostatic step with the TRANSPOSED VI + tracer kernels
    engaged (nz-thin grid, fused forced, CPU interpret) matches the XLA
    path to f64 roundoff — validates the model wiring."""
    import dataclasses

    from oceananigans_tpu import WENO
    from oceananigans_tpu.models import (
        HydrostaticFreeSurfaceModel, SplitExplicitFreeSurface,
    )
    from oceananigans_tpu.ops.pallas_vi import (
        vi_transposed_layout_preferred,
    )

    grid = RectilinearGrid(size=(116, 16, 6), extent=(1e5, 2e5, 1e3),
                           topology=(Periodic, Bounded, Bounded),
                           halo=(6, 6, 4), dtype="float64")
    vi = WENOVectorInvariant()
    assert vi_transposed_layout_preferred(grid, vi)

    def build(fused):
        return HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=WENOVectorInvariant(),
            tracer_advection=WENO(7), tracers=("T",),
            free_surface=SplitExplicitFreeSurface(substeps=8),
            fused_kernels=fused)

    mf = build(True)
    mx = build(False)
    assert mf.fused_kernels and mf.fused_tracer
    state = mf.initial_state(
        u=lambda x, y, z: 0.1 * jnp.sin(2 * np.pi * x / 1e5),
        T=lambda x, y, z: 20.0 + 8e-4 * z)
    sf = mf.step(state, 60.0)
    sx_ = mx.step(state, 60.0)
    H = grid.H
    # compare the OWNED ranges (interior cells + the bounded-axis shared
    # faces); halo zones outside them carry layout-dependent junk until
    # the next fill
    Su = (slice(H[0], H[0] + grid.N[0]), slice(H[1], H[1] + grid.N[1]),
          slice(H[2], H[2] + grid.N[2]))
    Sv = (Su[0], slice(H[1], H[1] + grid.N[1] + 1), Su[2])
    vel_scale = float(np.abs(np.asarray(sx_.u)).max())
    for name, S_ in (("u", Su), ("v", Sv), ("eta", (Su[0], Su[1],
                                                    slice(None)))):
        a = np.asarray(getattr(sf, name))[S_]
        b = np.asarray(getattr(sx_, name))[S_]
        scale = max(np.abs(b).max(), vel_scale)
        assert np.abs(a - b).max() / scale < 1e-12, (
            name, np.abs(a - b).max() / scale)
    aT = np.asarray(sf.tracers["T"])[Su]
    bT = np.asarray(sx_.tracers["T"])[Su]
    assert np.abs(aT - bT).max() / np.abs(bT).max() < 1e-12

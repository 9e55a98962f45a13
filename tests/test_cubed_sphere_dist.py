"""Explicit-halo distributed cubed sphere vs the serial model.

The mirror-rank ppermute path (`parallel/cubed_sphere_shard.py`) must
reproduce the serial `CubedSphereShallowWaterModel` step exactly (every
block window evolves like the same window of the serial panel frame),
with a bounded number of collectives independent of the tracer-advection
order (reference: `cubed_sphere_partitions.jl` sub-panel partitioning
with explicit device-to-device fills)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu.advection import Centered, WENO
from oceananigans_tpu.grids.cubed_sphere_grid import (
    ConformalCubedSphereGrid,
)
from oceananigans_tpu.models.cubed_sphere import (
    CubedSphereShallowWaterModel, panel_vector_components,
)
from oceananigans_tpu.parallel.cubed_sphere_shard import (
    CubedSphereDistributedSW,
)


def _setup(tracer_advection=None, bathymetry=None, N=16, halo=None):
    grid = ConformalCubedSphereGrid((N, 1), z=(-1.0, 0.0), radius=6.4e6,
                                    halo=halo)
    model = CubedSphereShallowWaterModel(
        grid, tracers=("c",),
        tracer_advection=tracer_advection or Centered(2),
        bathymetry=bathymetry)
    # solid-body rotation about a tilted axis (exercises every panel
    # edge orientation)
    axis = np.array([0.3, 0.2, 1.0])
    u0, v0 = panel_vector_components(
        grid, lambda pts: 20.0 * np.cross(axis / np.linalg.norm(axis),
                                          pts))
    state = model.initial_state(
        u=u0, v=v0, h=8000.0,
        c=lambda lam, phi, z: np.exp(-((lam - 30) / 25) ** 2
                                     - (phi / 25) ** 2))
    return grid, model, state


def _compare(model, dsw, state, n_steps=5, dt=30.0):
    bstate = dsw.to_local_state(state)
    sstate = state
    for _ in range(n_steps):
        sstate = jax.jit(model.step)(sstate, dt)
        bstate = dsw.step(bstate, dt)
    dstate = dsw.from_local_state(bstate)
    g = model.grid.panel_grid
    sx, sy, _ = g.interior_slices
    for name in ("u", "v", "h"):
        a = np.asarray(getattr(sstate, name))[:, sx, sy]
        b = np.asarray(getattr(dstate, name))[:, sx, sy]
        np.testing.assert_allclose(b, a, rtol=1e-13, atol=1e-13,
                                   err_msg=name)
    a = np.asarray(sstate.tracers["c"])[:, sx, sy]
    b = np.asarray(dstate.tracers["c"])[:, sx, sy]
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14,
                               err_msg="c")


def test_panelwise_r1_matches_serial():
    """R=1, one panel per device (6 of the 8 virtual devices)."""
    grid, model, state = _setup()
    dsw = CubedSphereDistributedSW(model, R=1, panels=6)
    _compare(model, dsw, state)


def test_subpanel_r2_matches_serial():
    """Sub-panel partition: panels=2, R=2 (8 devices, 3 panels each
    split 2x2 per device group). halo=3 covers the WENO(5) stencil
    reach so the serial and block frames wrap identically."""
    grid, model, state = _setup(tracer_advection=WENO(5), halo=3)
    dsw = CubedSphereDistributedSW(model, R=2, panels=2)
    _compare(model, dsw, state)


def test_subpanel_with_bathymetry():
    grid, model, state = _setup(
        bathymetry=lambda lam, phi: 500.0 * np.exp(-(phi / 30) ** 2))
    dsw = CubedSphereDistributedSW(model, R=2, panels=2)
    _compare(model, dsw, state, n_steps=3)


def _collectives(dsw, state, dt=30.0):
    bstate = dsw.to_local_state(state)
    import re
    txt = jax.jit(lambda s, d: dsw.step(s, d)).lower(
        bstate, dt).compile().as_text()
    ops = {}
    for op in ("collective-permute", "all-gather", "all-reduce",
               "all-to-all"):
        ops[op] = len(re.findall(rf'\b{op}(?:-start)?\(', txt))
    return ops


def test_bounded_collectives():
    """Collectives/step are bounded, all-gather-free, and independent of
    the tracer-advection order (the GSPMD gather path's cost grows with
    R; this path's does not)."""
    counts = {}
    for scheme, R, panels in ((Centered(2), 2, 2), (WENO(5), 2, 2)):
        grid, model, state = _setup(tracer_advection=scheme, halo=3)
        dsw = CubedSphereDistributedSW(model, R=R, panels=panels)
        counts[repr(scheme)] = _collectives(dsw, state)
    vals = list(counts.values())
    for ops in vals:
        assert ops["all-gather"] == 0, ops
        assert ops["all-to-all"] == 0, ops
        assert 0 < ops["collective-permute"] <= 120, ops
    assert vals[0]["collective-permute"] == vals[1]["collective-permute"]


def test_mass_and_tracer_conservation():
    grid, model, state = _setup()
    dsw = CubedSphereDistributedSW(model, R=2, panels=2)
    bstate = dsw.to_local_state(state)
    m0 = float(model.total_mass(dsw.from_local_state(bstate)))
    c0 = float(model.total_tracer(dsw.from_local_state(bstate), "c"))
    for _ in range(10):
        bstate = dsw.step(bstate, 30.0)
    final = dsw.from_local_state(bstate)
    assert abs(float(model.total_mass(final)) / m0 - 1) < 1e-13
    # c is advected in concentration form, so sum(c h Az) drifts at the
    # truncation level when h evolves (the serial model drifts by the
    # SAME amount — the bitwise-match tests above pin that); this is a
    # smoke bound, not a machine-precision invariant
    assert abs(float(model.total_tracer(final, "c")) / c0 - 1) < 1e-4


def test_rejects_bad_partitions():
    grid, model, state = _setup(N=16)
    with pytest.raises(ValueError):
        CubedSphereDistributedSW(model, R=3, panels=2)   # 16 % 3
    with pytest.raises(ValueError):
        CubedSphereDistributedSW(model, R=1, panels=4)   # 6 % 4
    with pytest.raises(ValueError):
        CubedSphereDistributedSW(model, R=8, panels=1)   # nloc <= halo


# ---------------------------------------------------------------------------
# Hydrostatic cubed sphere on the explicit path
# ---------------------------------------------------------------------------

def _hydro_setup(closure=None, forcing=None, N=16, nz=6, halo=None):
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereHydrostaticModel,
    )
    a = 6.37122e6
    grid = ConformalCubedSphereGrid((N, nz), z=(-1000.0, 0.0), radius=a,
                                    halo=halo)
    model = CubedSphereHydrostaticModel(grid, closure=closure,
                                        forcing=forcing)

    def eta0(lam, phi, z):
        r = np.deg2rad(phi) ** 2 \
            + np.deg2rad(((lam + 180) % 360) - 180) ** 2
        return np.exp(-r / 0.02) + 0 * z

    g = grid.panel_grid
    e0 = grid.set_tracer(eta0)[..., g.Hz:g.Hz + 1]
    state = model.initial_state(eta=e0, b=lambda lam, phi, z: 1e-5 * z)
    return grid, model, state


def _hydro_compare(model, dhy, state, n_steps=3, dt=150.0, rtol=1e-12):
    bstate = dhy.to_local_state(state)
    sstate = state
    sstep = jax.jit(model.step)
    for _ in range(n_steps):
        sstate = sstep(sstate, dt)
        bstate = dhy.step(bstate, dt)
    dstate = dhy.from_local_state(bstate)
    g = model.grid.panel_grid
    sx, sy, sz = g.interior_slices
    for name in ("u", "v"):
        a = np.asarray(getattr(sstate, name))[:, sx, sy, sz]
        b = np.asarray(getattr(dstate, name))[:, sx, sy, sz]
        np.testing.assert_allclose(b, a, rtol=rtol, atol=1e-15,
                                   err_msg=name)
    a = np.asarray(sstate.eta)[:, sx, sy]
    b = np.asarray(dstate.eta)[:, sx, sy]
    np.testing.assert_allclose(b, a, rtol=rtol, atol=1e-13,
                               err_msg="eta")
    for n in model.tracer_names:
        a = np.asarray(sstate.tracers[n])[:, sx, sy, sz]
        b = np.asarray(dstate.tracers[n])[:, sx, sy, sz]
        np.testing.assert_allclose(b, a, rtol=rtol, atol=1e-14,
                                   err_msg=n)


def test_hydrostatic_subpanel_matches_serial():
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    grid, model, state = _hydro_setup()
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    _hydro_compare(model, dhy, state)


def test_hydrostatic_dist_closure_and_forcing():
    """Vertically-implicit closure (column Thomas solve) + coordinate
    forcing, block-local on the explicit path."""
    from oceananigans_tpu.closures import VerticalScalarDiffusivity
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    grid, model, state = _hydro_setup(
        closure=VerticalScalarDiffusivity(nu=1e-2, kappa=1e-2),
        # jnp ops: on the explicit path the forcing coordinates are
        # traced shard_map arguments (numpy constants on the serial path)
        forcing={"b": lambda lam, phi, z, t:
                 1e-9 * jnp.cos(jnp.deg2rad(phi)) + 0 * z + 0 * t})
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    _hydro_compare(model, dhy, state)


def test_hydrostatic_dist_conservation():
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    grid, model, state = _hydro_setup()
    dhy = CubedSphereDistributedHydrostatic(model, R=1, panels=6)
    b = dhy.to_local_state(state)
    v0 = float(model.total_volume(state))
    b0 = float(model.total_tracer(state, "b"))
    for _ in range(10):
        b = dhy.step(b, 150.0)
    final = dhy.from_local_state(b)
    eta = np.asarray(final.eta)
    assert np.isfinite(eta).all()
    assert abs(float(model.total_volume(final)) - v0) \
        < 1e-9 * max(abs(v0), 1e12) + 1.0
    assert abs(float(model.total_tracer(final, "b")) / b0 - 1) < 1e-12


def test_hydrostatic_dist_split_explicit_matches_serial():
    """Split-explicit free surface on the mirror-rank path: the whole
    barotropic substep scan (per-substep eta block exchange + edge-flux
    sync) runs inside the shard_map and matches the serial stacked-panel
    model bitwise-tightly at R=1 and R=2."""
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereHydrostaticModel,
    )
    from oceananigans_tpu.models.hydrostatic import SplitExplicitFreeSurface
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    a = 6.37122e6
    grid = ConformalCubedSphereGrid((16, 6), z=(-1000.0, 0.0), radius=a)
    model = CubedSphereHydrostaticModel(
        grid, free_surface=SplitExplicitFreeSurface(substeps=12))

    def eta0(lam, phi, z):
        r = np.deg2rad(phi) ** 2 \
            + np.deg2rad(((lam + 180) % 360) - 180) ** 2
        return np.exp(-r / 0.02) + 0 * z

    g = grid.panel_grid
    e0 = grid.set_tracer(eta0)[..., g.Hz:g.Hz + 1]
    state = model.initial_state(eta=e0, b=lambda lam, phi, z: 1e-5 * z)
    for R, panels in ((1, 6), (2, 2)):
        dhy = CubedSphereDistributedHydrostatic(model, R=R, panels=panels)
        _hydro_compare(model, dhy, state, n_steps=3, dt=2000.0)


def test_hydrostatic_dist_implicit_matches_serial():
    """Implicit (CG with psum-reduced Az-weighted dots) free surface on
    the mirror-rank path matches serial at solver tolerance."""
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereHydrostaticModel,
    )
    from oceananigans_tpu.models.hydrostatic import ImplicitFreeSurface
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    a = 6.37122e6
    grid = ConformalCubedSphereGrid((16, 6), z=(-1000.0, 0.0), radius=a)
    model = CubedSphereHydrostaticModel(
        grid, free_surface=ImplicitFreeSurface(solver_method="cg"))

    def eta0(lam, phi, z):
        r = np.deg2rad(phi) ** 2 \
            + np.deg2rad(((lam + 180) % 360) - 180) ** 2
        return np.exp(-r / 0.02) + 0 * z

    g = grid.panel_grid
    e0 = grid.set_tracer(eta0)[..., g.Hz:g.Hz + 1]
    state = model.initial_state(eta=e0, b=lambda lam, phi, z: 1e-5 * z)
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    _hydro_compare(model, dhy, state, n_steps=3, dt=2000.0, rtol=1e-8)


def test_hydrostatic_dist_split_explicit_bounded_collectives():
    """Mirror-rank collective bounds for the split-explicit hydrostatic
    step at R=1 and R=2 (VERDICT round-2 item 6): counts are asserted on
    REAL compiled HLO, must not contain all-gathers, and must not depend
    on the tracer-advection order."""
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereHydrostaticModel,
    )
    from oceananigans_tpu.models.hydrostatic import SplitExplicitFreeSurface
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    import re
    a = 6.37122e6

    def build(order, R, panels):
        grid = ConformalCubedSphereGrid((16, 6), z=(-1000.0, 0.0),
                                        radius=a, halo=3)
        model = CubedSphereHydrostaticModel(
            grid, tracer_advection=(Centered(2) if order == 2
                                    else WENO(5)),
            free_surface=SplitExplicitFreeSurface(substeps=12))
        g = grid.panel_grid
        e0 = grid.set_tracer(
            lambda lam, phi, z: np.exp(-(np.deg2rad(phi) ** 2
                                         + np.deg2rad(((lam + 180) % 360)
                                                      - 180) ** 2) / 0.02)
            + 0 * z)[..., g.Hz:g.Hz + 1]
        state = model.initial_state(eta=e0,
                                    b=lambda lam, phi, z: 1e-5 * z)
        dhy = CubedSphereDistributedHydrostatic(model, R=R, panels=panels)
        bstate = dhy.to_local_state(state)
        txt = jax.jit(lambda s, d: dhy.step(s, d)).lower(
            bstate, 2000.0).compile().as_text().lower()
        ops = {}
        for op in ("collective-permute", "all-gather", "all-reduce",
                   "all-to-all"):
            ops[op] = len(re.findall(rf'\b{op}(?:-start)?\(', txt))
        return ops

    counts = {}
    for order, R, panels in ((2, 1, 6), (2, 2, 2), (5, 2, 2)):
        counts[(order, R)] = build(order, R, panels)
    # no all-gathers on the mirror-rank path, ever
    for ops in counts.values():
        assert ops["all-gather"] == 0, counts
        assert ops["all-to-all"] == 0, counts
        assert 0 < ops["collective-permute"] <= 400, counts
    # advection order must not change the collective count (fixed
    # exchange tables, not stencil-width-dependent halos)
    assert counts[(2, 2)]["collective-permute"] \
        == counts[(5, 2)]["collective-permute"], counts
    # R=2 rides more mirrors than R=1, but boundedly (< 3x)
    assert counts[(2, 2)]["collective-permute"] \
        <= 3 * counts[(2, 1)]["collective-permute"], counts


def test_hydrostatic_dist_global_ocean_matches_serial():
    """The realistic-ocean configuration — immersed bathymetry, seawater
    T/S buoyancy, wind-stress + heat-flux boundary conditions, momentum
    forcing, split-explicit free surface — on the mirror-rank path at
    R=1 and R=2 matches the serial stacked-panel model (reference
    multi_region_models.jl regionalizes exactly these types)."""
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, FluxBC,
    )
    from oceananigans_tpu.buoyancy import SeawaterBuoyancy
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereHydrostaticModel,
    )
    from oceananigans_tpu.models.hydrostatic import (
        SplitExplicitFreeSurface,
    )
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    a = 6.37122e6
    grid = ConformalCubedSphereGrid((16, 4), z=(-1000.0, 0.0), radius=a)

    def bathy(lam, phi):
        land = np.abs(phi) > 62.0
        return np.where(land, 50.0,
                        -1000.0 + 400.0 * np.exp(-((lam - 30.0) ** 2
                                                   + phi ** 2) / 600.0))

    model = CubedSphereHydrostaticModel(
        grid,
        bathymetry=bathy,
        buoyancy=SeawaterBuoyancy(),
        free_surface=SplitExplicitFreeSurface(substeps=8),
        boundary_conditions={
            "u": FieldBoundaryConditions(top=FluxBC(
                lambda lam, phi, t: -8e-5
                * jnp.sin(jnp.deg2rad(2 * phi)))),
            "T": FieldBoundaryConditions(top=FluxBC(
                lambda lam, phi, t: 1e-5
                * jnp.cos(jnp.deg2rad(phi))))},
        forcing={"v": lambda lam, phi, z, t:
                 1e-9 * jnp.cos(jnp.deg2rad(phi)) + 0 * z + 0 * t},
        tracers=())
    state = model.initial_state(
        T=lambda lam, phi, z: 15.0 + 10.0 * np.cos(np.deg2rad(phi))
        * np.exp(z / 500.0), S=35.0)
    for R, panels in ((1, 6), (2, 2)):
        dhy = CubedSphereDistributedHydrostatic(model, R=R,
                                                panels=panels)
        _hydro_compare(model, dhy, state, n_steps=3, dt=300.0)


def test_hydrostatic_dist_prescribed_velocities():
    """PrescribedVelocityFields mode on the mirror-rank path: frozen
    momentum, advected tracer, serial match."""
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereHydrostaticModel, panel_vector_components,
    )
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    a = 6.37122e6
    grid = ConformalCubedSphereGrid((16, 2), z=(-1000.0, 0.0), radius=a)
    model = CubedSphereHydrostaticModel(
        grid, tracers=("c",), buoyancy=None, prescribed_velocities=True)
    u, v = panel_vector_components(
        grid, lambda P: np.cross(np.array([0.0, 0.0, 10.0 / a]), P * a))
    nz = grid.panel_grid.shape[2]
    u3 = jnp.broadcast_to(u, (6, *u.shape[1:3], nz))
    v3 = jnp.broadcast_to(v, (6, *v.shape[1:3], nz))
    state = model.initial_state(
        u=u3, v=v3,
        c=lambda lam, phi, z: np.exp(-((lam - 90) ** 2 + phi ** 2) / 300))
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    _hydro_compare(model, dhy, state, n_steps=4, dt=600.0)
    # momentum really is frozen
    b = dhy.to_local_state(state)
    for _ in range(4):
        b = dhy.step(b, 600.0)
    final = dhy.from_local_state(b)
    g = grid.panel_grid
    sx, sy, sz = g.interior_slices
    np.testing.assert_allclose(
        np.asarray(final.u)[:, sx, sy, sz],
        np.asarray(state.u)[:, sx, sy, sz], atol=1e-13)


def test_hydrostatic_dist_closure_with_bathymetry_matches_serial():
    """Closure + immersed bathymetry together on the mirror-rank path:
    the distributed panel_closure must compute w from the wet-MASKED
    velocities exactly like the serial model (regression for the
    round-4 review finding: the unmasked mirror values fed the
    continuity cumsum and broke the 1e-12 serial match)."""
    from oceananigans_tpu.closures import SmagorinskyLilly
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereHydrostaticModel,
    )
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    a = 6.37122e6
    grid = ConformalCubedSphereGrid((16, 4), z=(-1000.0, 0.0), radius=a)

    def bathy(lam, phi):
        return np.where(np.abs(phi) > 60.0, 50.0,
                        -1000.0 + 400.0 * np.exp(
                            -((lam - 30.0) ** 2 + phi ** 2) / 600.0))

    model = CubedSphereHydrostaticModel(
        grid, bathymetry=bathy, closure=SmagorinskyLilly())
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 0.5 * np.exp(
            -(np.deg2rad(phi) ** 2
              + np.deg2rad(((lam + 180) % 360) - 180) ** 2) / 0.02)
        + 0 * z)[..., g.Hz:g.Hz + 1]
    state = model.initial_state(eta=eta0,
                                b=lambda lam, phi, z: 1e-5 * z)
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    _hydro_compare(model, dhy, state, n_steps=2, dt=150.0)

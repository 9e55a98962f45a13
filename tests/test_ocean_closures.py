"""Ocean closure tests: CATKE, Ri-based, Leith, GM/Redi
(reference turbulence_closures test group)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    Bounded, BuoyancyTracer, Centered, Flat, Periodic, RectilinearGrid,
)
from oceananigans_tpu.closures_ocean import (
    CATKEVerticalDiffusivity, IsopycnalSkewSymmetricDiffusivity,
    LeithEnstrophyDiffusivity, RiBasedVerticalDiffusivity,
)
from oceananigans_tpu.fields import field_integral, interior
from oceananigans_tpu.models import HydrostaticFreeSurfaceModel, NonhydrostaticModel
from oceananigans_tpu.models import SplitExplicitFreeSurface


def column_grid(Nz=32):
    return RectilinearGrid(size=(Nz,), z=(-100.0, 0.0),
                           topology=(Flat, Flat, Bounded))


def test_ri_based_mixes_unstable_column():
    """An unstably stratified column must mix toward uniform buoyancy."""
    grid = column_grid()
    model = NonhydrostaticModel(
        grid=grid, advection=None, tracers=("b",),
        buoyancy=BuoyancyTracer(),
        closure=RiBasedVerticalDiffusivity(convective_kappa=1.0))
    # unstable: buoyancy increases downward
    state = model.initial_state(b=lambda x, y, z: -1e-4 * z)
    b0 = np.asarray(interior(grid, state.tracers["b"])).ravel()
    var0 = np.var(b0)
    step = jax.jit(lambda s: model.step(s, 60.0))
    for _ in range(200):
        state = step(state)
    b1 = np.asarray(interior(grid, state.tracers["b"])).ravel()
    assert np.var(b1) < 0.2 * var0     # mixed toward uniform
    np.testing.assert_allclose(b1.mean(), b0.mean(), rtol=1e-10)


def test_ri_based_preserves_stable_column():
    grid = column_grid()
    model = NonhydrostaticModel(
        grid=grid, advection=None, tracers=("b",),
        buoyancy=BuoyancyTracer(),
        closure=RiBasedVerticalDiffusivity(minimum_kappa=0.0))
    state = model.initial_state(b=lambda x, y, z: 1e-4 * z)
    b0 = np.asarray(interior(grid, state.tracers["b"])).ravel()
    step = jax.jit(lambda s: model.step(s, 60.0))
    for _ in range(50):
        state = step(state)
    b1 = np.asarray(interior(grid, state.tracers["b"])).ravel()
    # stable, shear-free: Ri -> inf, step -> 0, nothing happens
    np.testing.assert_allclose(b1, b0, atol=1e-8)


def test_catke_free_convection_deepens_mixed_layer():
    """Surface-cooled column: CATKE must generate TKE and deepen the mixed
    layer (the canonical CATKE validation)."""
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, FluxBC,
    )
    grid = column_grid(Nz=32)
    Qb = 1e-7   # destabilizing surface buoyancy flux
    model = NonhydrostaticModel(
        grid=grid, advection=None, tracers=("b",),
        buoyancy=BuoyancyTracer(),
        closure=CATKEVerticalDiffusivity(),
        boundary_conditions={"b": FieldBoundaryConditions(top=FluxBC(Qb))})
    assert "e" in model.tracer_names
    N2_0 = 1e-5
    state = model.initial_state(b=lambda x, y, z: N2_0 * z, e=1e-7)
    dt = 60.0
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(300):   # 5 hours
        state = step(state)
    b = np.asarray(interior(grid, state.tracers["b"])).ravel()
    e = np.asarray(interior(grid, state.tracers["e"])).ravel()
    z = np.asarray(grid.znodes())
    assert np.all(np.isfinite(b)) and np.all(np.isfinite(e))
    # TKE was generated near the surface
    assert e[-5:].max() > 1e-6
    # mixed layer formed: near-surface stratification much weaker than N2_0
    dbdz_surface = (b[-1] - b[-6]) / (z[-1] - z[-6])
    assert dbdz_surface < 0.5 * N2_0


def test_leith_dissipates_2d_turbulence():
    grid = RectilinearGrid(size=(64, 64), x=(0, 2 * np.pi),
                           y=(0, 2 * np.pi),
                           topology=(Periodic, Periodic, Flat))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                closure=LeithEnstrophyDiffusivity(C=2.0))
    state = model.initial_state(
        u=lambda x, y, z: jnp.sin(3 * x) * jnp.cos(5 * y),
        v=lambda x, y, z: -jnp.cos(4 * x) * jnp.sin(2 * y))
    ke0 = float(field_integral(grid, state.u ** 2 + state.v ** 2))
    step = jax.jit(lambda s: model.step(s, 2e-3))
    for _ in range(100):
        state = step(state)
    ke1 = float(field_integral(grid, state.u ** 2 + state.v ** 2))
    assert np.isfinite(ke1)
    assert ke1 < ke0  # Leith viscosity dissipates


def test_gm_redi_operator_diffuses_along_isopycnals():
    """Integrate ∂t c = −∇·F_GM/Redi with a frozen buoyancy field: tracer
    content is conserved, the front spreads, and — the key isopycnal
    property — a tracer that is a function of b alone (c = b) feels
    (almost) no Redi flux while a cross-isopycnal tracer does."""
    from oceananigans_tpu.boundary_conditions import fill_halo_regions
    from oceananigans_tpu.fields import set_field

    grid = RectilinearGrid(size=(32, 32), y=(0.0, 1e5), z=(-1000.0, 0.0),
                           topology=(Flat, Periodic, Bounded))
    closure = IsopycnalSkewSymmetricDiffusivity(kappa_redi=500.0,
                                                kappa_gm=500.0,
                                                maximum_slope=2e-2,
                                                kappa_z=0.0)
    # periodic-compatible front (a linear-in-y front would be
    # discontinuous across the periodic seam)
    N2, amp = 1e-5, 1e-3
    b = set_field(grid,
                  lambda x, y, z: N2 * z + amp * jnp.sin(2 * np.pi * y / 1e5))
    b = fill_halo_regions(b, grid)
    c = set_field(grid, lambda x, y, z: jnp.cos(2 * np.pi * y / 1e5))
    c = fill_halo_regions(c, grid)
    diff = {"b": b}
    dt = 3600.0

    @jax.jit
    def advance(c):
        Gc = closure.tracer_flux_divergence(grid, "c", c, {"b": b, "c": c},
                                            diff)
        c = c + dt * Gc
        return fill_halo_regions(c, grid)

    c0 = np.asarray(interior(grid, c))
    cint0 = float(field_integral(grid, c))
    for _ in range(50):
        c = advance(c)
    c1 = np.asarray(interior(grid, c))
    assert np.all(np.isfinite(c1))
    # conservative: drift tiny relative to the tracer content scale |c|·V
    np.testing.assert_allclose(float(field_integral(grid, c)), cint0,
                               atol=1e-6 * 1e5 * 1000 * 1e-9)
    assert np.abs(c1 - c0).max() > 1e-3   # front evolves

    # isopycnal invariance: under PURE Redi (κ_GM = 0) a tracer aligned
    # with isopycnals (c ≡ b) is invariant; GM by design changes b (it
    # releases available potential energy)
    redi = IsopycnalSkewSymmetricDiffusivity(kappa_redi=500.0, kappa_gm=0.0,
                                             maximum_slope=2e-2, kappa_z=0.0)
    cb = b
    cb0 = np.asarray(interior(grid, cb))

    @jax.jit
    def advance_b(cb):
        Gc = redi.tracer_flux_divergence(grid, "cb", cb,
                                         {"b": b, "cb": cb}, diff)
        cb = cb + dt * Gc
        return fill_halo_regions(cb, grid)

    for _ in range(50):
        cb = advance_b(cb)
    cb1 = np.asarray(interior(grid, cb))
    rel_change_aligned = (np.abs(cb1 - cb0).max()
                          / np.abs(cb0 - cb0.mean()).max())
    assert rel_change_aligned < 1e-5   # exact up to wall-taper residue


def test_k_epsilon_convection():
    """k-ε: an unstably-stratified column generates TKE and mixes
    (reference TKEDissipationVerticalDiffusivity: the stratified
    displacement dissipation floor + stability functions bootstrap
    shear-free convection from the TKE floor alone)."""
    from oceananigans_tpu.closures_ocean import (
        TKEDissipationVerticalDiffusivity,
    )
    grid = column_grid(Nz=32)
    model = NonhydrostaticModel(
        grid=grid, advection=None, tracers=("b",),
        buoyancy=BuoyancyTracer(),
        closure=TKEDissipationVerticalDiffusivity())
    assert {"e", "eps"} <= set(model.tracer_names)
    state = model.initial_state(b=lambda x, y, z: -1e-5 * z,  # unstable
                                e=1e-6, eps=1e-9)
    b0 = np.asarray(interior(grid, state.tracers["b"])).ravel()
    step = jax.jit(lambda s: model.step(s, 60.0))
    for _ in range(300):
        state = step(state)
    b1 = np.asarray(interior(grid, state.tracers["b"])).ravel()
    e1 = np.asarray(interior(grid, state.tracers["e"])).ravel()
    assert np.all(np.isfinite(b1)) and np.all(np.isfinite(e1))
    assert e1.max() > 1e-5                      # TKE generated
    assert np.var(b1) < 0.7 * np.var(b0)        # mixing happened
    np.testing.assert_allclose(b1.mean(), b0.mean(), rtol=1e-9)


def test_k_epsilon_stability_function_constants():
    """The derived Umlauf-Burchard constants match the reference's
    documented values (tke_dissipation_stability_functions.jl: 𝕊u₀ is
    computed from the log-layer equilibrium and ≈ 0.53; the free-
    convection αᴺmin is negative)."""
    from oceananigans_tpu.closures_ocean import VariableStabilityFunctions
    sf = VariableStabilityFunctions()
    np.testing.assert_allclose(sf.Su0, 0.533, atol=5e-3)
    aN_min = sf.minimum_stratification_number(0.73)
    assert -3.0 < aN_min < -1.5
    # neutral log-layer: Su(aN=0, aM=aMmax-ish equilibrium) stays positive
    # and bounded; clamps keep 𝕊 finite at the realizability edges
    import jax.numpy as jnp
    aN = jnp.asarray([aN_min, 0.0, 100.0])
    aM = jnp.clip(jnp.asarray([0.0, 10.0, 1e6]), 0.0,
                  sf.maximum_shear_number(aN))
    Su, Sc = sf.momentum_and_tracer(aN, aM)
    assert bool(jnp.all(jnp.isfinite(Su))) and bool(jnp.all(Su > 0))
    assert bool(jnp.all(jnp.isfinite(Sc))) and bool(jnp.all(Sc > 0))


def test_k_epsilon_stable_column_stays_quiet():
    """A stably-stratified resting column must stay essentially
    unmixed: the dissipation floor keeps diffusivities at background
    levels (no spurious mixing — Umlauf & Burchard realizability)."""
    from oceananigans_tpu.closures_ocean import (
        TKEDissipationVerticalDiffusivity,
    )
    grid = column_grid(Nz=32)
    model = NonhydrostaticModel(
        grid=grid, advection=None, tracers=("b",),
        buoyancy=BuoyancyTracer(),
        closure=TKEDissipationVerticalDiffusivity())
    state = model.initial_state(b=lambda x, y, z: 1e-5 * z,  # stable
                                e=1e-6, eps=1e-9)
    b0 = np.asarray(interior(grid, state.tracers["b"])).ravel()
    step = jax.jit(lambda s: model.step(s, 60.0))
    for _ in range(100):
        state = step(state)
    b1 = np.asarray(interior(grid, state.tracers["b"])).ravel()
    # buoyancy profile essentially unchanged (kappa stays ~ floor level)
    assert np.abs(b1 - b0).max() < 5e-3 * np.abs(b0).max()


def test_dynamic_smagorinsky_runs():
    """Dynamic Smagorinsky: coefficient adapts; laminar shear gives a much
    smaller cs² than the standard 0.16² and the model stays stable."""
    from oceananigans_tpu import DynamicSmagorinsky
    import jax.numpy as jnp
    grid = RectilinearGrid(size=(16, 16, 16), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                closure=DynamicSmagorinsky())
    rng = np.random.default_rng(2)
    state = model.initial_state(
        u=0.1 * rng.standard_normal((16, 16, 16)),
        v=0.1 * rng.standard_normal((16, 16, 16)))
    step = jax.jit(lambda s: model.step(s, 1e-3))
    for _ in range(10):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.u)))
    d = model.closure.compute_diffusivities(model.grid, state.u, state.v,
                                            state.w, state.tracers, None)
    cs2 = np.asarray(d["cs2"])
    assert np.all(cs2 >= 0.0) and np.all(cs2 <= 0.25)
    assert cs2.max() > 0.0   # turbulence-like field -> nonzero coefficient


def test_catke_free_convection_matches_sqrt_law():
    """Full-formulation CATKE under destabilizing surface buoyancy flux:
    mixed-layer depth follows h = sqrt(2 ∫Jᵇ dt / N²) (reference
    calibration target for ``catke_vertical_diffusivity.jl``)."""
    from oceananigans_tpu import FieldBoundaryConditions, FluxBC
    from oceananigans_tpu.closures_ocean import CATKEVerticalDiffusivity
    from oceananigans_tpu.models.hydrostatic import ExplicitFreeSurface

    N2b, Jb = 1e-5, 1e-7
    grid = RectilinearGrid(size=(1, 1, 64), x=(0, 1), y=(0, 1),
                           z=(-128, 0),
                           topology=(Periodic, Periodic, Bounded), halo=1)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ExplicitFreeSurface(),
        buoyancy=BuoyancyTracer(), closure=CATKEVerticalDiffusivity(),
        boundary_conditions={"b": FieldBoundaryConditions(top=FluxBC(Jb))},
        tracers=("b", "e"))
    state = model.initial_state(b=lambda x, y, z: N2b * z)
    dt = 120.0
    step = jax.jit(lambda s: model.step(s, dt))
    s = state
    for _ in range(int(12 * 3600 / dt)):
        s = step(s)
    b = np.asarray(grid.interior(s.tracers["b"]))[0, 0, :]
    zc = np.asarray(grid.zC).reshape(-1)[grid.Hz:grid.Hz + 64]
    # mixed-layer depth: deepest cell whose b is within 10% of the
    # surface (well-mixed) value
    b_sfc = b[-1]
    mixed = np.abs(b - b_sfc) < 0.1 * abs(b_sfc)
    h = -zc[mixed].min()
    h_theory = np.sqrt(2 * Jb * 12 * 3600 / N2b)   # 29.4 m
    assert abs(h - h_theory) / h_theory < 0.25


def test_catke_wind_stress_injects_tke_and_mixes():
    """Surface momentum flux drives the Cᵂu★ u★³ TKE injection and
    shear mixing of momentum."""
    from oceananigans_tpu import FieldBoundaryConditions, FluxBC
    from oceananigans_tpu.closures_ocean import CATKEVerticalDiffusivity
    from oceananigans_tpu.models.hydrostatic import ExplicitFreeSurface

    tau = -1e-4        # kinematic stress m²/s² (negative = eastward wind)
    grid = RectilinearGrid(size=(1, 1, 32), x=(0, 1), y=(0, 1),
                           z=(-64, 0),
                           topology=(Periodic, Periodic, Bounded), halo=1)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ExplicitFreeSurface(),
        buoyancy=BuoyancyTracer(), closure=CATKEVerticalDiffusivity(),
        boundary_conditions={
            "u": FieldBoundaryConditions(top=FluxBC(tau))},
        tracers=("b", "e"))
    state = model.initial_state(b=lambda x, y, z: 1e-5 * z)
    step = jax.jit(lambda s: model.step(s, 60.0))
    s = state
    for _ in range(240):                    # 4 hours
        s = step(s)
    e = np.asarray(grid.interior(s.tracers["e"]))[0, 0, :]
    u = np.asarray(grid.interior(s.u))[0, 0, :]
    assert np.isfinite(e).all() and np.isfinite(u).all()
    # TKE is surface-intensified and of order u★² = |τ|
    assert e[-1] > 1e-6
    assert e[-1] > 10 * e[8]
    # momentum has mixed below the top cell
    assert abs(u[-4]) > 1e-3

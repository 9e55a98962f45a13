"""Realistic-ocean physics on the cubed sphere (VERDICT round-3 asks
2/3/6): immersed bathymetry, seawater T/S buoyancy, surface/bottom flux
boundary conditions, momentum forcing, WENO vector-invariant momentum,
and prescribed velocities.

Reference counterparts: ``multi_region_models.jl:35-45`` (regionalized
GridFittedBottom / FieldBoundaryConditions / PrescribedVelocityFields /
VectorInvariant), ``multi_region_grid.jl:190-198``
(ImmersedMultiRegionGrid), ``multi_region_boundary_conditions.jl:1-62``
(wind stress / heat-flux fills), ``seawater_buoyancy.jl:11``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu.boundary_conditions import (
    FieldBoundaryConditions, FluxBC,
)
from oceananigans_tpu.buoyancy import (
    LinearEquationOfState, SeawaterBuoyancy,
)
from oceananigans_tpu.grids.cubed_sphere_grid import (
    ConformalCubedSphereGrid,
)
from oceananigans_tpu.models.cubed_sphere import (
    CubedSphereHydrostaticModel,
)
from oceananigans_tpu.models.hydrostatic import (
    SplitExplicitFreeSurface, WENOVectorInvariant,
)

A_EARTH = 6.37122e6


def _grid(N=8, Nz=4, depth=1000.0, halo=3):
    return ConformalCubedSphereGrid((N, Nz), z=(-depth, 0.0),
                                    radius=A_EARTH, halo=halo)


def _two_continents(lam, phi):
    """Idealized bathymetry: 1000 m ocean with two polar-ish land caps
    and a mid-latitude ridge."""
    land = (np.abs(phi) > 65.0)
    ridge = 600.0 * np.exp(-((lam - 30.0) ** 2 + phi ** 2) / 400.0)
    bottom = -1000.0 + ridge
    return np.where(land, 100.0, bottom)


# ---------------------------------------------------------------------------
# Immersed bathymetry
# ---------------------------------------------------------------------------

def test_cs_bathymetry_masks_and_depths():
    grid = _grid()
    model = CubedSphereHydrostaticModel(grid, bathymetry=_two_continents)
    g = grid.panel_grid
    sx, sy, sz = g.interior_slices
    wet = model._wet_c[:, sx, sy, sz]
    assert 0.0 < wet.mean() < 1.0          # both land and ocean exist
    # land columns have zero depth; open-ocean columns the full 1000 m
    Hc = model._Hc[:, sx, sy, 0]
    assert Hc.min() == 0.0
    assert abs(Hc.max() - 1000.0) < 1e-9
    # face depth equals the min of the adjacent columns (grid-fitted)
    assert model._Hu.max() <= model._Hc.max() + 1e-12


def test_cs_bathymetry_rest_state_stays_at_rest():
    """Uniform stratification over bathymetry: pressure gradients vanish
    at every wet face, so the state must stay at rest (the immersed
    analog of test_hydrostatic_cubed_sphere_rest_state_exact)."""
    grid = _grid()
    model = CubedSphereHydrostaticModel(grid, bathymetry=_two_continents)
    N2 = 1e-5
    state = model.initial_state(b=lambda lam, phi, z: N2 * z)
    step = jax.jit(lambda s: model.step(s, 600.0))
    for _ in range(10):
        state = step(state)
    assert float(jnp.max(jnp.abs(state.u))) < 1e-12
    assert float(jnp.max(jnp.abs(state.v))) < 1e-12
    assert float(jnp.max(jnp.abs(state.eta))) < 1e-12


def test_cs_bathymetry_tracer_conservation_split_explicit():
    """Advection + split-explicit free surface over bathymetry conserve
    total tracer content and total volume to roundoff."""
    grid = _grid()
    model = CubedSphereHydrostaticModel(
        grid, bathymetry=_two_continents,
        free_surface=SplitExplicitFreeSurface(substeps=8),
        tracers=("c",), buoyancy=None)
    u0 = 0.5
    import numpy as _np
    from oceananigans_tpu.models.cubed_sphere import (
        panel_vector_components,
    )
    u, v = panel_vector_components(
        grid, lambda P: _np.cross(_np.array([0.0, 0.0, u0 / A_EARTH]),
                                  P * A_EARTH))
    nz = grid.panel_grid.shape[2]
    u3 = jnp.broadcast_to(u, (6, *u.shape[1:3], nz))
    v3 = jnp.broadcast_to(v, (6, *v.shape[1:3], nz))
    state = model.initial_state(
        u=u3, v=v3,
        c=lambda lam, phi, z: np.exp(-((lam - 90) ** 2 + phi ** 2) / 500))
    c0 = float(model.total_tracer(state, "c"))
    vol0 = float(model.total_volume(state))
    step = jax.jit(lambda s: model.step(s, 600.0))
    for _ in range(12):
        state = step(state)
    c1 = float(model.total_tracer(state, "c"))
    vol1 = float(model.total_volume(state))
    assert np.isfinite(np.asarray(state.u)).all()
    assert abs(c1 - c0) < 1e-9 * max(abs(c0), 1.0)
    # eta integrates the edge-synced, wet-masked transport divergence
    scale = float(model.ocean_volume())
    assert abs(vol1 - vol0) < 1e-12 * scale


# ---------------------------------------------------------------------------
# Seawater buoyancy (T, S)
# ---------------------------------------------------------------------------

def test_cs_seawater_buoyancy_drives_flow():
    grid = _grid()
    eos = LinearEquationOfState(thermal_expansion=2e-4,
                                haline_contraction=7.8e-4)
    model = CubedSphereHydrostaticModel(
        grid, buoyancy=SeawaterBuoyancy(equation_of_state=eos),
        tracers=())
    assert set(model.tracer_names) >= {"T", "S"}
    # a warm equatorial anomaly over uniform S must start a flow
    state = model.initial_state(
        T=lambda lam, phi, z: 10.0
        + 2.0 * np.exp(-(lam ** 2 + phi ** 2) / 200.0),
        S=35.0)
    T0 = float(model.total_tracer(state, "T"))
    step = jax.jit(lambda s: model.step(s, 600.0))
    for _ in range(10):
        state = step(state)
    assert float(jnp.max(jnp.abs(state.u))) > 1e-8
    assert np.isfinite(np.asarray(state.u)).all()
    assert abs(float(model.total_tracer(state, "T")) - T0) \
        < 1e-9 * abs(T0)


def test_cs_seawater_uniform_TS_stays_at_rest():
    """Horizontally uniform T(z), S: exact rest state through the
    seawater pressure integral."""
    grid = _grid()
    model = CubedSphereHydrostaticModel(
        grid, buoyancy=SeawaterBuoyancy(), tracers=())
    state = model.initial_state(
        T=lambda lam, phi, z: 10.0 + 0.003 * z, S=35.0)
    step = jax.jit(lambda s: model.step(s, 600.0))
    for _ in range(5):
        state = step(state)
    assert float(jnp.max(jnp.abs(state.u))) < 1e-12


# ---------------------------------------------------------------------------
# Surface / bottom flux boundary conditions
# ---------------------------------------------------------------------------

def test_cs_wind_stress_accelerates_surface():
    """A constant u top flux −τ accelerates the surface cell at τ/Δz_top
    (reference apply_flux_bcs sign convention)."""
    grid = _grid(Nz=4, depth=400.0)
    tau = 1e-4                      # kinematic stress m²/s²
    model = CubedSphereHydrostaticModel(
        grid, rotation_rate=0.0, tracers=(), buoyancy=None,
        boundary_conditions={
            "u": FieldBoundaryConditions(top=FluxBC(-tau))})
    state = model.initial_state()
    dt = 60.0
    nsteps = 5
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(nsteps):
        state = step(state)
    g = grid.panel_grid
    sx, sy, _ = g.interior_slices
    dz_top = 400.0 / 4
    u_surf = np.asarray(state.u)[:, sx, sy, g.Hz + g.Nz - 1]
    expect = tau / dz_top * dt * nsteps
    # pressure-gradient feedback is tiny over 5 minutes; 5% bracket
    med = np.median(u_surf[np.abs(u_surf) > 0])
    assert abs(med - expect) < 0.05 * expect, (med, expect)


def test_cs_heat_flux_budget_exact():
    """d/dt ∫T dV equals the integrated surface flux to roundoff."""
    grid = _grid(Nz=3, depth=300.0)
    Q = 2e-4                        # T flux (out of the ocean, K m/s)
    model = CubedSphereHydrostaticModel(
        grid, tracers=("T",), buoyancy=None,
        boundary_conditions={
            "T": FieldBoundaryConditions(top=FluxBC(Q))})
    state = model.initial_state(T=10.0)
    T0 = float(model.total_tracer(state, "T"))
    dt = 300.0
    n = 4
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(n):
        state = step(state)
    T1 = float(model.total_tracer(state, "T"))
    from oceananigans_tpu import Center
    g = grid.panel_grid
    sx, sy, _ = g.interior_slices
    Az_total = float(6 * jnp.sum(g.Az(Center, Center)[sx, sy, :1]))
    expect = -Q * Az_total * dt * n
    assert abs((T1 - T0) - expect) < 1e-9 * abs(expect), \
        ((T1 - T0), expect)


def test_cs_quadratic_bottom_drag_decelerates():
    grid = _grid(Nz=3, depth=300.0)
    Cd = 2.5e-3

    def drag(lam, phi, t, u):
        return -Cd * u * jnp.abs(u)

    model = CubedSphereHydrostaticModel(
        grid, rotation_rate=0.0, tracers=(), buoyancy=None,
        boundary_conditions={
            "u": FieldBoundaryConditions(
                bottom=FluxBC(drag, field_dependencies=("u",)))})
    import numpy as _np
    from oceananigans_tpu.models.cubed_sphere import (
        panel_vector_components,
    )
    u0 = 1.0
    u, v = panel_vector_components(
        grid, lambda P: _np.cross(_np.array([0.0, 0.0, u0 / A_EARTH]),
                                  P * A_EARTH))
    nz = grid.panel_grid.shape[2]
    u3 = jnp.broadcast_to(u, (6, *u.shape[1:3], nz))
    v3 = jnp.broadcast_to(v, (6, *v.shape[1:3], nz))
    state = model.initial_state(u=u3, v=v3)

    def ke(s):
        return float(jnp.sum(s.u ** 2 + s.v ** 2))

    ke0 = ke(state)
    step = jax.jit(lambda s: model.step(s, 600.0))
    for _ in range(10):
        state = step(state)
    assert ke(state) < ke0
    assert np.isfinite(np.asarray(state.u)).all()


def test_cs_momentum_forcing():
    """Body forcing of u spins the ocean up from rest."""
    grid = _grid(Nz=2, depth=200.0)
    model = CubedSphereHydrostaticModel(
        grid, rotation_rate=0.0, tracers=(), buoyancy=None,
        forcing={"u": lambda lam, phi, z, t:
                 1e-6 * jnp.cos(jnp.deg2rad(phi))})
    state = model.initial_state()
    step = jax.jit(lambda s: model.step(s, 300.0))
    for _ in range(5):
        state = step(state)
    assert float(jnp.max(jnp.abs(state.u))) > 1e-4 * 0.5
    assert np.isfinite(np.asarray(state.u)).all()


# ---------------------------------------------------------------------------
# WENO vector-invariant momentum
# ---------------------------------------------------------------------------

def _balanced_state(grid, model, u0, Omega, g_grav, depth):
    """Geostrophically balanced solid-body rotation (the hydrostatic
    analog of Williamson test 2): u = Ω̂×r u0, gη = −(aΩu0 + u0²/2)sin²φ."""
    import numpy as _np
    from oceananigans_tpu.models.cubed_sphere import (
        panel_vector_components,
    )
    u, v = panel_vector_components(
        grid, lambda P: _np.cross(_np.array([0.0, 0.0, u0 / A_EARTH]),
                                  P * A_EARTH))
    nz = grid.panel_grid.shape[2]
    u3 = jnp.broadcast_to(u, (6, *u.shape[1:3], nz))
    v3 = jnp.broadcast_to(v, (6, *v.shape[1:3], nz))
    g = grid.panel_grid
    eta = grid.set_tracer(
        lambda lam, phi, z: -(A_EARTH * Omega * u0 + 0.5 * u0 ** 2)
        * np.sin(np.deg2rad(phi)) ** 2 / g_grav + 0 * z)
    eta = eta[..., g.Hz:g.Hz + 1]
    return model.initial_state(u=u3, v=v3, eta=eta)


def test_cs_weno_vi_less_dissipative_than_hybrid():
    """On the geostrophically balanced solid-body state (smooth, steady)
    all KE loss is scheme dissipation: the WENO vector-invariant scheme
    must lose much less than the hybrid UB1/UB3 upwinding at equal
    resolution (the reason eddy-resolving global runs need it —
    reference WENOVectorInvariant, vector_invariant_advection.jl).
    The corner band (identical in both) is shrunk to width 2."""
    N = 16
    u0, Omega, g_grav, depth = 20.0, 7.292e-5, 9.80616, 1000.0
    losses = {}
    for name, adv in (("hybrid", None),
                      ("weno", WENOVectorInvariant(order=5))):
        grid = _grid(N=N, Nz=1, depth=depth, halo=4)
        model = CubedSphereHydrostaticModel(
            grid, momentum_advection=adv, rotation_rate=Omega,
            gravitational_acceleration=g_grav,
            tracers=(), buoyancy=None, corner_upwind_width=2)
        state = _balanced_state(grid, model, u0, Omega, g_grav, depth)
        g = grid.panel_grid
        sx, sy, sz = g.interior_slices

        def ke(s):
            return float(jnp.sum(s.u[:, sx, sy, sz] ** 2
                                 + s.v[:, sx, sy, sz] ** 2))

        ke0 = ke(state)
        step = jax.jit(lambda s, m=model: m.step(s, 600.0))
        for _ in range(72):                 # half a day
            state = step(state)
        losses[name] = 1.0 - ke(state) / ke0
        assert np.isfinite(np.asarray(state.u)).all(), name
    # WENO-VI must dissipate less than half of what the hybrid does
    assert losses["weno"] < 0.5 * losses["hybrid"], losses


def test_cs_weno_vi_requires_halo():
    grid = _grid(N=8, halo=3)
    with pytest.raises(ValueError, match="halo"):
        CubedSphereHydrostaticModel(
            grid, momentum_advection=WENOVectorInvariant(order=5),
            tracers=(), buoyancy=None)


# ---------------------------------------------------------------------------
# Prescribed velocities
# ---------------------------------------------------------------------------

def test_cs_prescribed_velocities_freeze_momentum():
    grid = _grid(Nz=2)
    model = CubedSphereHydrostaticModel(
        grid, tracers=("c",), buoyancy=None,
        prescribed_velocities=True)
    import numpy as _np
    from oceananigans_tpu.models.cubed_sphere import (
        panel_vector_components,
    )
    u0 = 10.0
    u, v = panel_vector_components(
        grid, lambda P: _np.cross(_np.array([0.0, 0.0, u0 / A_EARTH]),
                                  P * A_EARTH))
    nz = grid.panel_grid.shape[2]
    u3 = jnp.broadcast_to(u, (6, *u.shape[1:3], nz))
    v3 = jnp.broadcast_to(v, (6, *v.shape[1:3], nz))
    state = model.initial_state(
        u=u3, v=v3,
        c=lambda lam, phi, z: np.exp(-((lam - 90) ** 2 + phi ** 2) / 300))
    u_init = np.asarray(state.u).copy()
    c_init = np.asarray(state.tracers["c"]).copy()
    c0 = float(model.total_tracer(state, "c"))
    step = jax.jit(lambda s: model.step(s, 600.0))
    for _ in range(10):
        state = step(state)
    np.testing.assert_allclose(np.asarray(state.u), u_init, atol=1e-13)
    assert abs(float(model.total_tracer(state, "c")) - c0) \
        < 1e-9 * max(abs(c0), 1.0)
    # the tracer actually moved under the frozen flow
    assert float(np.max(np.abs(np.asarray(state.tracers["c"])
                               - c_init))) > 1e-4


# ---------------------------------------------------------------------------
# The whole stack together: a global-ocean configuration
# ---------------------------------------------------------------------------

def test_cs_global_ocean_configuration():
    """Continents + wind stress + surface heat flux + T/S buoyancy +
    split-explicit free surface + vertically-implicit closure — the
    reference's realistic-global-ocean configuration
    (multi_region_models.jl) in one model. 10 steps: finite, volume
    conserved, T budget consistent with the surface flux."""
    from oceananigans_tpu.closures import (
        ConvectiveAdjustmentVerticalDiffusivity,
    )
    grid = _grid(N=8, Nz=4, depth=1000.0)
    tau0 = 1e-4

    def wind(lam, phi, t):
        return -tau0 * jnp.sin(jnp.deg2rad(2 * phi))

    def heat(lam, phi, t):
        return 1e-5 * jnp.cos(jnp.deg2rad(phi))

    model = CubedSphereHydrostaticModel(
        grid,
        bathymetry=_two_continents,
        buoyancy=SeawaterBuoyancy(),
        closure=ConvectiveAdjustmentVerticalDiffusivity(
            convective_kappa_z=0.1, background_kappa_z=1e-5),
        free_surface=SplitExplicitFreeSurface(substeps=10),
        boundary_conditions={
            "u": FieldBoundaryConditions(top=FluxBC(wind)),
            "T": FieldBoundaryConditions(top=FluxBC(heat))},
        tracers=())
    state = model.initial_state(
        T=lambda lam, phi, z: 15.0 + 10.0 * np.cos(np.deg2rad(phi))
        * np.exp(z / 500.0), S=35.0)
    vol0 = float(model.total_volume(state))
    step = jax.jit(lambda s: model.step(s, 600.0))
    for _ in range(10):
        state = step(state)
    for f in (state.u, state.v, state.eta, state.tracers["T"],
              state.tracers["S"]):
        assert np.isfinite(np.asarray(f)).all()
    # the wind did work
    assert float(jnp.max(jnp.abs(state.u))) > 1e-6
    # volume to roundoff
    scale = float(model.ocean_volume())
    assert abs(float(model.total_volume(state)) - vol0) < 1e-12 * scale
    # salt is exactly conserved (no S flux)
    # (T changes by exactly the heat flux; S by nothing)
    # S content:
    # recompute via model.total_tracer
    # initial S = 35 everywhere wet
    S1 = float(model.total_tracer(state, "S"))
    S0 = 35.0 * float(model.ocean_volume())
    assert abs(S1 - S0) < 1e-9 * abs(S0)


# ---------------------------------------------------------------------------
# Quasi-AB2 stepping on the cubed sphere
# ---------------------------------------------------------------------------

def _ab2_setup(free_surface=None):
    grid = _grid(N=8, Nz=3, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        free_surface=free_surface)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 0.5 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                         / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    state = model.initial_state(eta=eta0,
                                b=lambda lam, phi, z: 1e-5 * z)
    return grid, model, state


def test_cs_ab2_conserves_and_converges_to_rk3():
    """The quasi-AB2 cubed-sphere step conserves volume/tracer to
    roundoff and agrees with RK3 at O(dt²) on a short gravity-wave
    run (both are ≥2nd-order in time)."""
    grid, model, state = _ab2_setup()
    vol0 = float(model.total_volume(state))
    b0 = float(model.total_tracer(state, "b"))
    step = jax.jit(lambda s: model.step(s, 300.0))
    s = state
    for _ in range(12):
        s = step(s)
    assert np.isfinite(np.asarray(s.eta)).all()
    scale = float(model.ocean_volume())
    assert abs(float(model.total_volume(s)) - vol0) < 1e-12 * scale
    assert abs(float(model.total_tracer(s, "b")) - b0) \
        < 1e-9 * max(abs(b0), 1.0)

    # cross-stepper agreement at small dt
    model_rk = CubedSphereHydrostaticModel(grid)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 0.5 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                         / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    s_rk = model_rk.initial_state(eta=eta0,
                                  b=lambda lam, phi, z: 1e-5 * z)
    s_ab = state
    dt = 60.0
    step_rk = jax.jit(lambda s: model_rk.step(s, dt))
    step_ab = jax.jit(lambda s: model.step(s, dt))
    for _ in range(20):
        s_rk = step_rk(s_rk)
        s_ab = step_ab(s_ab)
    sx, sy, _ = g.interior_slices
    a = np.asarray(s_ab.eta)[:, sx, sy]
    b = np.asarray(s_rk.eta)[:, sx, sy]
    scale = np.abs(b).max()
    assert np.abs(a - b).max() < 0.02 * scale, np.abs(a - b).max()


def test_cs_ab2_checkpoint_restart_exact(tmp_path):
    """AB2 restart reproduces the uninterrupted run bitwise: the
    tendency history (Gu/Gv/Geta/Gtracers) is part of the checkpointed
    state (reference checkpointer.jl:20-26 AB2 continuity)."""
    from oceananigans_tpu import Checkpointer, IterationInterval, Simulation

    grid, model, state = _ab2_setup()
    sim = Simulation(model, state=state, dt=300.0, stop_iteration=8)
    ckpt = Checkpointer(dirname=str(tmp_path / "ck"),
                        schedule=IterationInterval(4))
    sim.output_writers["ckpt"] = ckpt
    sim.run()
    final = sim.state

    grid2, model2, _ = _ab2_setup()
    template = model2.initial_state()
    restored = ckpt.restore(template, path=ckpt._path(4))
    assert int(restored.clock.iteration) == 4
    sim2 = Simulation(model2, state=restored, dt=300.0, stop_iteration=8)
    sim2.run()
    np.testing.assert_array_equal(np.asarray(final.eta),
                                  np.asarray(sim2.state.eta))
    np.testing.assert_array_equal(np.asarray(final.u),
                                  np.asarray(sim2.state.u))
    np.testing.assert_array_equal(np.asarray(final.Gu),
                                  np.asarray(sim2.state.Gu))


def test_cs_ab2_split_explicit_dist_matches_serial():
    """AB2 + split-explicit on the mirror-rank distributed path matches
    the serial model at R=2."""
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    grid = _grid(N=16, Nz=3, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        free_surface=SplitExplicitFreeSurface(substeps=8))
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 0.5 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                         / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    state = model.initial_state(eta=eta0,
                                b=lambda lam, phi, z: 1e-5 * z)
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    bstate = dhy.to_local_state(state)
    sstate = state
    sstep = jax.jit(lambda s: model.step(s, 300.0))
    for _ in range(3):
        sstate = sstep(sstate)
        bstate = dhy.step(bstate, 300.0)
    dstate = dhy.from_local_state(bstate)
    sx, sy, sz = g.interior_slices
    np.testing.assert_allclose(
        np.asarray(dstate.eta)[:, sx, sy],
        np.asarray(sstate.eta)[:, sx, sy], rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(dstate.u)[:, sx, sy, sz],
        np.asarray(sstate.u)[:, sx, sy, sz], rtol=1e-12, atol=1e-15)


# ---------------------------------------------------------------------------
# ZStar vertical coordinate on the cubed sphere
# ---------------------------------------------------------------------------

def test_cs_zstar_tracer_conservation_and_uniformity():
    """ZStar on the cubed sphere (AB2 + split-explicit): with a
    large-amplitude sloshing free surface (a) the σ-weighted tracer
    content is conserved to roundoff, and (b) a UNIFORM tracer stays
    exactly uniform (the column stretch advects the grid with the
    water — the defining z-star property; reference
    z_star_vertical_spacing.jl, mirroring the flat
    test_zstar_tracer_conservation)."""
    from oceananigans_tpu.models.hydrostatic import ZStar

    grid = _grid(N=8, Nz=4, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=ZStar(),
        free_surface=SplitExplicitFreeSurface(substeps=12),
        tracers=("c",), buoyancy=None)
    g = grid.panel_grid
    # 50 m bump on a 1000 m ocean: sigma reaches 1.05
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 50.0 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                          / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    state = model.initial_state(
        eta=eta0,
        c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(np.deg2rad(phi)))

    c0 = float(model.total_tracer(state, "c"))
    step = jax.jit(lambda s: model.step(s, 300.0))
    s = state
    for _ in range(20):
        s = step(s)
    assert np.isfinite(np.asarray(s.tracers["c"])).all()
    c1 = float(model.total_tracer(s, "c"))
    assert abs(c1 - c0) < 1e-11 * abs(c0), (c1, c0)
    # the free surface is genuinely moving
    sx, sy, _ = g.interior_slices
    assert np.abs(np.asarray(s.eta)[:, sx, sy]).max() > 5.0

    # (b) uniform tracer stays uniform under the EXPLICIT free surface
    # (η and the tracer fluxes then evolve from the same AB2-weighted
    # transport divergence, so σc telescopes pointwise; the
    # split-explicit filtered η differs from the AB2 η at O(Δt²),
    # which would show as a matching O(1e-4) uniformity residual)
    from oceananigans_tpu.models.hydrostatic import (
        ExplicitFreeSurface, ZStar as _ZS,
    )
    model_e = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=_ZS(),
        free_surface=ExplicitFreeSurface(),
        tracers=("c",), buoyancy=None)
    su = model_e.initial_state(eta=eta0, c=1.0)
    step_e = jax.jit(lambda s: model_e.step(s, 300.0))
    for _ in range(20):
        su = step_e(su)
    sz = g.interior_slices[2]
    cu = np.asarray(su.tracers["c"])[:, sx, sy, sz]
    assert np.abs(cu - 1.0).max() < 1e-10, np.abs(cu - 1.0).max()


def test_cs_zstar_requires_ab2():
    from oceananigans_tpu.models.hydrostatic import ZStar

    grid = _grid(N=8, Nz=2)
    with pytest.raises(ValueError, match="ZStar"):
        CubedSphereHydrostaticModel(grid, vertical_coordinate=ZStar())


def test_cs_zstar_dist_matches_serial():
    """ZStar + AB2 + split-explicit on the mirror-rank distributed path
    matches the serial stacked-panel model at R=2."""
    from oceananigans_tpu.models.hydrostatic import ZStar
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    grid = _grid(N=16, Nz=3, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=ZStar(),
        free_surface=SplitExplicitFreeSurface(substeps=8),
        tracers=("c",), buoyancy=None)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 40.0 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                          / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    state = model.initial_state(
        eta=eta0, c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(
            np.deg2rad(phi)))
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    bstate = dhy.to_local_state(state)
    sstate = state
    sstep = jax.jit(lambda s: model.step(s, 300.0))
    for _ in range(3):
        sstate = sstep(sstate)
        bstate = dhy.step(bstate, 300.0)
    dstate = dhy.from_local_state(bstate)
    sx, sy, sz = g.interior_slices
    np.testing.assert_allclose(
        np.asarray(dstate.eta)[:, sx, sy],
        np.asarray(sstate.eta)[:, sx, sy], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dstate.tracers["c"])[:, sx, sy, sz],
        np.asarray(sstate.tracers["c"])[:, sx, sy, sz],
        rtol=1e-12, atol=1e-13)


def test_cs_corner_filter_conserves_and_stabilizes():
    """The corner-band filter's flux-form center smoothing conserves the
    Az-weighted volume/tracer content exactly (within-panel telescoping
    fluxes) while damping the corner velocity noise."""
    grid = _grid(N=16, Nz=3, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, free_surface=SplitExplicitFreeSurface(substeps=8),
        tracers=("c",), buoyancy=None, corner_filter=0.005)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 5.0 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                         / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    state = model.initial_state(
        eta=eta0, c=lambda lam, phi, z: 1.0 + np.cos(np.deg2rad(phi)))
    vol0 = float(model.total_volume(state))
    c0 = float(model.total_tracer(state, "c"))
    step = jax.jit(lambda s: model.step(s, 300.0))
    for _ in range(10):
        state = step(state)
    assert np.isfinite(np.asarray(state.u)).all()
    scale = float(model.ocean_volume())
    assert abs(float(model.total_volume(state)) - vol0) < 1e-12 * scale
    assert abs(float(model.total_tracer(state, "c")) - c0) \
        < 1e-10 * abs(c0)


def test_cs_zstar_over_bathymetry_uniform_and_conserving():
    """ZStar + immersed bathymetry on the cubed sphere (round-5 ask 1):
    a uniform tracer over continents + ridge stays uniform to roundoff
    under the explicit FS (wet-column σ everywhere), and the σ-weighted
    content conserves."""
    from oceananigans_tpu.models.hydrostatic import (
        ExplicitFreeSurface, ZStar,
    )
    grid = _grid(N=12, Nz=4, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=ZStar(), bathymetry=_two_continents,
        free_surface=ExplicitFreeSurface(),
        tracers=("c",), buoyancy=None)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 20.0 * np.exp(-((lam + 60) ** 2
                                            + (phi - 10) ** 2) / 400.0)
        + 0 * z)[..., g.Hz:g.Hz + 1]
    # land columns carry no eta
    eta0 = eta0 * jnp.asarray(model._wet2_c, eta0.dtype)
    state = model.initial_state(eta=eta0, c=1.0)
    c0 = float(model.total_tracer(state, "c"))
    step = jax.jit(lambda s: model.step(s, 100.0))
    s = state
    for _ in range(10):
        s = step(s)
    assert np.isfinite(np.asarray(s.u)).all()
    c1 = float(model.total_tracer(s, "c"))
    assert abs(c1 - c0) < 1e-11 * abs(c0)
    sx, sy, sz = g.interior_slices
    cu = np.asarray(s.tracers["c"])[:, sx, sy, sz]
    wet = np.asarray(model._wet_c, bool)[:, sx, sy, sz]
    assert np.abs(cu[wet] - 1.0).max() < 1e-11, np.abs(cu[wet] - 1.0).max()
    # the free surface is genuinely moving over the wet columns
    assert np.abs(np.asarray(s.eta)[:, sx, sy]).max() > 1.0


def test_cs_zstar_bathymetry_dist_matches_serial():
    """ZStar + bathymetry + AB2 + split-explicit on the mirror-rank
    distributed path matches the serial stacked-panel model at R=2."""
    from oceananigans_tpu.models.hydrostatic import ZStar
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    grid = _grid(N=16, Nz=3, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=ZStar(), bathymetry=_two_continents,
        free_surface=SplitExplicitFreeSurface(substeps=8),
        tracers=("c",), buoyancy=None)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 40.0 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                          / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    eta0 = eta0 * jnp.asarray(model._wet2_c, eta0.dtype)
    state = model.initial_state(
        eta=eta0, c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(
            np.deg2rad(phi)))
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    bstate = dhy.to_local_state(state)
    sstate = state
    sstep = jax.jit(lambda s: model.step(s, 300.0))
    for _ in range(3):
        sstate = sstep(sstate)
        bstate = dhy.step(bstate, 300.0)
    dstate = dhy.from_local_state(bstate)
    sx, sy, sz = g.interior_slices
    np.testing.assert_allclose(
        np.asarray(dstate.eta)[:, sx, sy],
        np.asarray(sstate.eta)[:, sx, sy], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dstate.tracers["c"])[:, sx, sy, sz],
        np.asarray(sstate.tracers["c"])[:, sx, sy, sz],
        rtol=1e-12, atol=1e-13)


def test_cs_corner_filter_zstar_conserves():
    """corner_filter composes with ZStar (round-5 ask 2 fallback): the
    filter smooths the σ-weighted content, so ∫ σ c dV and ∫ Az η stay
    conserved to roundoff."""
    from oceananigans_tpu.models.hydrostatic import ZStar
    grid = _grid(N=16, Nz=3, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=ZStar(), corner_filter=0.005,
        free_surface=SplitExplicitFreeSurface(substeps=8),
        tracers=("c",), buoyancy=None)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 40.0 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                          / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    state = model.initial_state(
        eta=eta0, c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(
            np.deg2rad(phi)))
    c0 = float(model.total_tracer(state, "c"))
    sx, sy, _ = g.interior_slices
    Az = np.asarray(g.Az("c", "c"))[sx, sy, 0]
    vol0 = float((np.asarray(state.eta)[:, sx, sy, 0] * Az).sum())
    step = jax.jit(lambda s: model.step(s, 300.0))
    s = state
    for _ in range(5):
        s = step(s)
    assert np.isfinite(np.asarray(s.u)).all()
    c1 = float(model.total_tracer(s, "c"))
    vol1 = float((np.asarray(s.eta)[:, sx, sy, 0] * Az).sum())
    assert abs(c1 - c0) < 1e-11 * abs(c0)
    eta_scale = float(np.abs(np.asarray(s.eta)[:, sx, sy, 0] * Az).sum())
    assert abs(vol1 - vol0) < 1e-11 * eta_scale


def test_cs_corner_filter_dist_matches_serial():
    """corner_filter on the mirror-rank distributed hydrostatic path
    matches the serial stacked-panel model at R=2 (round-5 ask 2
    fallback: the flagship distributed run is now protectable)."""
    from oceananigans_tpu.models.hydrostatic import ZStar
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    grid = _grid(N=16, Nz=3, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=ZStar(), corner_filter=0.005,
        bathymetry=_two_continents,
        free_surface=SplitExplicitFreeSurface(substeps=8),
        tracers=("c",), buoyancy=None)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 40.0 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                          / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    eta0 = eta0 * jnp.asarray(model._wet2_c, eta0.dtype)
    state = model.initial_state(
        eta=eta0, c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(
            np.deg2rad(phi)))
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    bstate = dhy.to_local_state(state)
    sstate = state
    sstep = jax.jit(lambda s: model.step(s, 300.0))
    for _ in range(3):
        sstate = sstep(sstate)
        bstate = dhy.step(bstate, 300.0)
    dstate = dhy.from_local_state(bstate)
    sx, sy, sz = g.interior_slices
    np.testing.assert_allclose(
        np.asarray(dstate.eta)[:, sx, sy],
        np.asarray(sstate.eta)[:, sx, sy], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dstate.tracers["c"])[:, sx, sy, sz],
        np.asarray(sstate.tracers["c"])[:, sx, sy, sz],
        rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(dstate.u)[:, sx, sy, sz],
        np.asarray(sstate.u)[:, sx, sy, sz], rtol=1e-11, atol=1e-12)


def test_cs_sw_corner_filter_dist_matches_serial():
    """corner_filter on the distributed SHALLOW-WATER wrapper matches
    the serial model at R=2."""
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereShallowWaterModel,
    )
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedSW,
    )
    grid = _grid(N=16, Nz=1, depth=1000.0)
    model = CubedSphereShallowWaterModel(
        grid, gravitational_acceleration=9.81, corner_filter=0.005)
    g = grid.panel_grid
    h0 = grid.set_tracer(
        lambda lam, phi, z: 1000.0 + 40.0 * np.exp(
            -((lam - 30) ** 2 + phi ** 2) / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    state = model.initial_state(h=h0)
    dsw = CubedSphereDistributedSW(model, R=2, panels=2)
    bstate = dsw.to_local_state(state)
    sstate = state
    sstep = jax.jit(lambda s: model.step(s, 200.0))
    for _ in range(3):
        sstate = sstep(sstate)
        bstate = dsw.step(bstate, 200.0)
    dstate = dsw.from_local_state(bstate)
    sx, sy, _ = g.interior_slices
    np.testing.assert_allclose(
        np.asarray(dstate.h)[:, sx, sy],
        np.asarray(sstate.h)[:, sx, sy], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dstate.u)[:, sx, sy],
        np.asarray(sstate.u)[:, sx, sy], rtol=1e-11, atol=1e-12)


def test_cs_smagorinsky_coastal_wall_budget_closes():
    """Horizontal (Smagorinsky-class) diffusive fluxes are zeroed
    through cubed-sphere coastal walls (round-5 ask 3; reference
    ``conditional_differences.jl``): with continents + ridge and a flow
    striking the coasts, the tracer budget closes to roundoff-scale
    (the former STATUS gap 2 leak is gone). The tiny residual is the
    panel-seam diffusive-flux truncation mismatch, not a wall leak."""
    from oceananigans_tpu.closures import SmagorinskyLilly
    a = 6.37122e6
    grid = _grid(N=12, Nz=4, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, bathymetry=_two_continents, closure=SmagorinskyLilly(),
        tracers=("c",), buoyancy=None)
    from oceananigans_tpu.models.cubed_sphere import (
        panel_vector_components,
    )
    u, v = panel_vector_components(
        grid, lambda P: np.cross(np.array([0.0, 0.0, 10.0 / a]), P * a))
    nz = grid.panel_grid.shape[2]
    u3 = np.broadcast_to(np.asarray(u), u.shape[:3] + (nz,))
    v3 = np.broadcast_to(np.asarray(v), v.shape[:3] + (nz,))
    state = model.initial_state(
        u=u3, v=v3,
        c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(np.deg2rad(phi)))
    c0 = float(model.total_tracer(state, "c"))
    # dt respects the EXPLICIT vertical-diffusion limit dz^2/(2 nu)
    step = jax.jit(lambda s: model.step(s, 10.0))
    for _ in range(20):
        state = step(state)
    assert bool(np.isfinite(np.asarray(state.u)).all())
    c1 = float(model.total_tracer(state, "c"))
    assert abs(c1 - c0) / abs(c0) < 1e-9, abs(c1 - c0) / abs(c0)


def test_cs_partial_cell_bottom_basic():
    """PartialCellBottom on the cubed sphere (round-5 ask 7; reference
    ``partial_cell_bottom.jl:11`` + ``multi_region_models.jl:45``):
    fractional bottom-cell heights refine the wet-column depths between
    the staircase (GridFittedBottom) values."""
    from oceananigans_tpu.immersed import (
        GridFittedBottom, PartialCellBottom,
    )
    grid = _grid(N=12, Nz=4, depth=1000.0)

    def ridge(lam, phi):
        return -1000.0 + 400.0 * np.exp(-((lam - 30.0) ** 2 + phi ** 2)
                                        / 400.0)

    m_pcb = CubedSphereHydrostaticModel(
        grid, bathymetry=PartialCellBottom(ridge), tracers=("c",),
        buoyancy=None)
    m_gfb = CubedSphereHydrostaticModel(
        grid, bathymetry=GridFittedBottom(ridge), tracers=("c",),
        buoyancy=None)
    Hp = np.asarray(m_pcb._Hc)
    Hg = np.asarray(m_gfb._Hc)
    assert (Hp > 0).all()
    # partial depths track the true depth much closer than staircase
    g = grid.panel_grid
    sx, sy, _ = g.interior_slices
    lam = m_pcb._lam_c[..., 0]
    true_H = -ridge(lam, m_pcb._phi_c[..., 0])
    err_p = np.abs(Hp[:, :, :, 0] - true_H)[:, sx, sy].max()
    err_g = np.abs(Hg[:, :, :, 0] - true_H)[:, sx, sy].max()
    assert err_p < 0.21 * 250.0 + 1e-6     # within min_frac*dz
    assert err_p < 0.5 * err_g
    # a short run stays finite and conserves the fractional content
    state = m_pcb.initial_state(
        c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(np.deg2rad(phi)))
    c0 = float(m_pcb.total_tracer(state, "c"))
    step = jax.jit(lambda s: m_pcb.step(s, 100.0))
    for _ in range(5):
        state = step(state)
    assert np.isfinite(np.asarray(state.u)).all()
    c1 = float(m_pcb.total_tracer(state, "c"))
    assert abs(c1 - c0) < 1e-11 * abs(c0)


def test_cs_partial_cell_zstar_uniform_tracer():
    """ZStar over PartialCellBottom: a uniform tracer stays uniform to
    roundoff under the explicit FS (the fractional thicknesses ride the
    scaled-metric channel; the dia-surface cancellation is exact)."""
    from oceananigans_tpu.immersed import PartialCellBottom
    from oceananigans_tpu.models.hydrostatic import (
        ExplicitFreeSurface, ZStar,
    )
    grid = _grid(N=12, Nz=4, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=ZStar(),
        bathymetry=PartialCellBottom(
            lambda lam, phi: -1000.0 + 400.0 * np.exp(
                -((lam - 30.0) ** 2 + phi ** 2) / 400.0)),
        free_surface=ExplicitFreeSurface(), tracers=("c",),
        buoyancy=None)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 20.0 * np.exp(-((lam + 60) ** 2
                                            + (phi - 10) ** 2) / 400.0)
        + 0 * z)[..., g.Hz:g.Hz + 1]
    state = model.initial_state(eta=eta0, c=1.0)
    c0 = float(model.total_tracer(state, "c"))
    step = jax.jit(lambda s: model.step(s, 100.0))
    s = state
    for _ in range(10):
        s = step(s)
    assert np.isfinite(np.asarray(s.u)).all()
    sx, sy, sz = g.interior_slices
    cu = np.asarray(s.tracers["c"])[:, sx, sy, sz]
    wet = np.asarray(model._wet_c, bool)[:, sx, sy, sz]
    assert np.abs(cu[wet] - 1.0).max() < 1e-11, np.abs(cu[wet] - 1.0).max()
    c1 = float(model.total_tracer(s, "c"))
    assert abs(c1 - c0) < 1e-11 * abs(c0)


def test_cs_partial_cell_rest_over_slope():
    """Resting state with uniform buoyancy over a partial-cell slope:
    the partial-cell pressure-gradient slope correction keeps spurious
    velocities at truncation level (pressure consistency)."""
    from oceananigans_tpu.buoyancy import BuoyancyTracer
    from oceananigans_tpu.immersed import PartialCellBottom
    grid = _grid(N=12, Nz=4, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid,
        bathymetry=PartialCellBottom(
            lambda lam, phi: -1000.0 + 400.0 * np.exp(
                -((lam - 30.0) ** 2 + phi ** 2) / 400.0)),
        tracers=("b",), buoyancy=BuoyancyTracer())
    state = model.initial_state(b=1e-2)     # constant buoyancy
    step = jax.jit(lambda s: model.step(s, 100.0))
    s = state
    for _ in range(10):
        s = step(s)
    umax = float(np.abs(np.asarray(s.u)).max())
    assert np.isfinite(umax)
    # with b = const the pressure force is irrotational: spurious flow
    # stays at discretization level (measured ~0 with the slope term)
    assert umax < 1e-4, umax


def test_cs_partial_cell_dist_matches_serial():
    """PartialCellBottom + ZStar + split-explicit on the mirror-rank
    distributed path matches the serial model at R=2."""
    from oceananigans_tpu.immersed import PartialCellBottom
    from oceananigans_tpu.models.hydrostatic import ZStar
    from oceananigans_tpu.parallel.cubed_sphere_shard import (
        CubedSphereDistributedHydrostatic,
    )
    grid = _grid(N=16, Nz=3, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, timestepper="QuasiAdamsBashforth2",
        vertical_coordinate=ZStar(),
        bathymetry=PartialCellBottom(
            lambda lam, phi: -1000.0 + 400.0 * np.exp(
                -((lam - 30.0) ** 2 + phi ** 2) / 400.0)),
        free_surface=SplitExplicitFreeSurface(substeps=8),
        tracers=("c",), buoyancy=None)
    g = grid.panel_grid
    eta0 = grid.set_tracer(
        lambda lam, phi, z: 40.0 * np.exp(-((lam - 30) ** 2 + phi ** 2)
                                          / 400.0) + 0 * z
    )[..., g.Hz:g.Hz + 1]
    state = model.initial_state(
        eta=eta0, c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(
            np.deg2rad(phi)))
    dhy = CubedSphereDistributedHydrostatic(model, R=2, panels=2)
    bstate = dhy.to_local_state(state)
    sstate = state
    sstep = jax.jit(lambda s: model.step(s, 300.0))
    for _ in range(3):
        sstate = sstep(sstate)
        bstate = dhy.step(bstate, 300.0)
    dstate = dhy.from_local_state(bstate)
    sx, sy, sz = g.interior_slices
    np.testing.assert_allclose(
        np.asarray(dstate.eta)[:, sx, sy],
        np.asarray(sstate.eta)[:, sx, sy], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dstate.tracers["c"])[:, sx, sy, sz],
        np.asarray(sstate.tracers["c"])[:, sx, sy, sz],
        rtol=1e-12, atol=1e-13)


def test_cs_weno_vi_split_explicit_no_buoyancy():
    """WENOVectorInvariant + split-explicit FS + no buoyancy: the VI
    potential term degenerates to a scalar zero (round-5 regression —
    dx_f used to crash on the float)."""
    grid = _grid(N=16, Nz=2, halo=6)
    model = CubedSphereHydrostaticModel(
        grid, momentum_advection=WENOVectorInvariant(),
        free_surface=SplitExplicitFreeSurface(substeps=4),
        tracers=(), buoyancy=None)
    state = model.initial_state(
        eta=grid.set_tracer(
            lambda lam, phi, z: 10.0 * np.cos(np.deg2rad(phi)) + 0 * z
        )[..., grid.panel_grid.Hz:grid.panel_grid.Hz + 1])
    s = model.step(state, 100.0)
    assert np.isfinite(np.asarray(s.u)).all()


def test_cs_grid_fitted_boundary_mask():
    """GridFittedBoundary (arbitrary 3-D solid mask) on the cubed sphere
    (reference grid_fitted_boundary.jl:9 + multi_region_models.jl:44):
    solid cells stay dry, tracer content over the fluid conserves."""
    from oceananigans_tpu.immersed import GridFittedBoundary

    def mask(lam, phi, z):
        # polar caps (all depths) + a mid-depth equatorial ring pocket
        caps = np.abs(phi) > 65.0
        ring = (np.abs(phi) < 8.0) & (np.abs(lam - 30.0) < 20.0) \
            & (z < -250.0) & (z > -600.0)
        return caps | ring

    grid = _grid(N=12, Nz=4, depth=1000.0)
    model = CubedSphereHydrostaticModel(
        grid, bathymetry=GridFittedBoundary(mask), tracers=("c",),
        buoyancy=None)
    g = grid.panel_grid
    assert model._wet_c is not None
    # some interior solid cells exist at mid depth
    sx, sy, sz = g.interior_slices
    wet = np.asarray(model._wet_c)[:, sx, sy, sz]
    assert (wet == 0).any() and (wet == 1).any()
    state = model.initial_state(
        c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(np.deg2rad(phi)),
        eta=grid.set_tracer(
            lambda lam, phi, z: 5.0 * np.cos(np.deg2rad(3 * lam))
            + 0 * z)[..., g.Hz:g.Hz + 1] * jnp.asarray(
                model._wet2_c, jnp.float64))
    c0 = float(model.total_tracer(state, "c"))
    step = jax.jit(lambda s: model.step(s, 100.0))
    s = state
    for _ in range(10):
        s = step(s)
    assert np.isfinite(np.asarray(s.u)).all()
    c1 = float(model.total_tracer(s, "c"))
    assert abs(c1 - c0) < 1e-11 * abs(c0)
    # solid cells carry the free-slip mirror of the bottom-most wet
    # value (fill_state_halos contract), so don't assert zeros there;
    # instead the WET-masked transports through solid faces vanish in
    # the flux assembly (exercised by the conservation check above)


def test_cs_partial_zstar_checkpoint_restart_exact(tmp_path):
    """AB2 restart is bitwise with the full round-5 stack: ZStar +
    PartialCellBottom + corner_filter (the tendency history and
    persistent transports checkpoint; the static fraction metrics
    rebuild from the model)."""
    from oceananigans_tpu import Checkpointer, IterationInterval, Simulation
    from oceananigans_tpu.immersed import PartialCellBottom
    from oceananigans_tpu.models.hydrostatic import ZStar

    def build():
        grid = _grid(N=12, Nz=4, depth=1000.0)
        model = CubedSphereHydrostaticModel(
            grid, timestepper="QuasiAdamsBashforth2",
            vertical_coordinate=ZStar(), corner_filter=0.005,
            bathymetry=PartialCellBottom(
                lambda lam, phi: -1000.0 + 400.0 * np.exp(
                    -((lam - 30.0) ** 2 + phi ** 2) / 400.0)),
            free_surface=SplitExplicitFreeSurface(substeps=8),
            tracers=("c",), buoyancy=None)
        g = grid.panel_grid
        eta0 = grid.set_tracer(
            lambda lam, phi, z: 20.0 * np.exp(
                -((lam + 60) ** 2 + (phi - 10) ** 2) / 400.0) + 0 * z
        )[..., g.Hz:g.Hz + 1]
        state = model.initial_state(
            eta=eta0, c=lambda lam, phi, z: 1.0 + 0.5 * np.cos(
                np.deg2rad(phi)))
        return model, state

    model, state = build()
    sim = Simulation(model, state=state, dt=100.0, stop_iteration=8)
    ckpt = Checkpointer(dirname=str(tmp_path / "ck"),
                        schedule=IterationInterval(4))
    sim.output_writers["ckpt"] = ckpt
    sim.run()
    final = sim.state

    model2, template = build()
    restored = ckpt.restore(template, path=ckpt._path(4))
    assert int(restored.clock.iteration) == 4
    sim2 = Simulation(model2, state=restored, dt=100.0, stop_iteration=8)
    sim2.run()
    for nm in ("eta", "u", "v", "U", "Gu"):
        np.testing.assert_array_equal(
            np.asarray(getattr(final, nm)),
            np.asarray(getattr(sim2.state, nm)), err_msg=nm)
    np.testing.assert_array_equal(
        np.asarray(final.tracers["c"]),
        np.asarray(sim2.state.tracers["c"]))


def test_cs_partial_cell_fixed_z_uniform_below_surface():
    """FIXED-z + PartialCellBottom: the thickness-consistent continuity
    (round-5 self-review fix) keeps a uniform tracer as clean at the
    partial bottom cells as the binary GridFittedBottom baseline —
    partial cells add NO anomaly on top of the (tiny, pre-existing)
    panel-edge flux-sync residual, which is identical for both. (The
    surface layer absorbs the free-surface volume change in any
    fixed-z model.)"""
    from oceananigans_tpu.immersed import PartialCellBottom

    def ridge(lam, phi):
        return -1000.0 + 400.0 * np.exp(-((lam - 30.0) ** 2 + phi ** 2)
                                        / 400.0)

    def run(bath):
        grid = _grid(N=12, Nz=4, depth=1000.0)
        model = CubedSphereHydrostaticModel(
            grid, bathymetry=bath,
            free_surface=SplitExplicitFreeSurface(substeps=8),
            tracers=("c",), buoyancy=None)
        g = grid.panel_grid
        eta0 = grid.set_tracer(
            lambda lam, phi, z: 10.0 * np.exp(
                -((lam + 60) ** 2 + (phi - 10) ** 2) / 400.0) + 0 * z
        )[..., g.Hz:g.Hz + 1]
        state = model.initial_state(eta=eta0, c=1.0)
        step = jax.jit(lambda s: model.step(s, 100.0))
        s = state
        for _ in range(10):
            s = step(s)
        sx, sy, sz = g.interior_slices
        cu = np.asarray(s.tracers["c"])[:, sx, sy, sz]
        wet = np.asarray(model._wet_c, bool)[:, sx, sy, sz]
        d = np.where(wet, np.abs(cu - 1.0), 0.0)
        return d[:, :, :, :-1].max()      # sub-surface deviation

    d_partial = run(PartialCellBottom(ridge))
    d_binary = run(ridge)
    # parity with the binary baseline AND small in absolute terms (the
    # round-5 edge-synced ω leaves ~4e-9/10 steps, identical in both —
    # measured; was ~7e-7 with the panel-local ω)
    assert d_partial < max(2.0 * d_binary, 1e-10), (d_partial, d_binary)
    assert d_partial < 2e-8, d_partial

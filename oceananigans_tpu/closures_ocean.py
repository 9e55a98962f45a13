"""Ocean boundary-layer and mesoscale closures: CATKE, Ri-based, Leith,
isopycnal (GM/Redi).

Reference: ``src/TurbulenceClosures/turbulence_closure_implementations/``
(SURVEY.md §2.13) — ``TKEBasedVerticalDiffusivities/`` (CATKE, 9 files),
``ri_based_vertical_diffusivity.jl``, ``leith_enstrophy_diffusivity.jl``,
``isopycnal_skew_symmetric_diffusivity.jl`` +
``isopycnal_rotation_tensor_components.jl``.

These are compact TPU-native implementations of the same closure physics:
everything is a branch-free array expression; the vertical-implicit path
reuses the batched Thomas solver.
"""

from __future__ import annotations

import jax.numpy as jnp

from oceananigans_tpu.closures import (
    AbstractClosure, VerticallyImplicitTimeDiscretization,
    _div_c_fluxes, _div_u_fluxes, _div_v_fluxes, _div_w_fluxes,
)
from oceananigans_tpu.grids.base import Center, Face
from oceananigans_tpu.ops.operators import (
    dx_f, dy_f, dz_c, dz_f, ix_c, ix_f, iy_c, iy_f, iz_c, iz_f,
)

__all__ = ["CATKEVerticalDiffusivity", "RiBasedVerticalDiffusivity",
           "LeithEnstrophyDiffusivity", "IsopycnalSkewSymmetricDiffusivity",
           "TKEDissipationVerticalDiffusivity"]


def _shear_squared_ccf(grid, u, v):
    """|∂z u|² at (c,c,f)."""
    uz = ix_c(dz_f(u)) / grid.dz(Face)
    vz = iy_c(dz_f(v)) / grid.dz(Face)
    return uz * uz + vz * vz


def _richardson_ccf(grid, u, v, tracers, buoyancy):
    from oceananigans_tpu.buoyancy import buoyancy_frequency
    N2 = buoyancy_frequency(grid, buoyancy, tracers)
    S2 = _shear_squared_ccf(grid, u, v)
    return N2 / jnp.maximum(S2, 1e-14)


class RiBasedVerticalDiffusivity(AbstractClosure):
    """Richardson-number-dependent vertical ν/κ (reference
    ``ri_based_vertical_diffusivity.jl``):

    κ = κ₀ · step(Ri) + κᶜᵃ · (N² < 0), with a smooth tanh step
    ``step(Ri) = (1 − tanh((Ri − Ri₀)/δ))/2`` clamped to [0, 1].
    """

    time_discretization = VerticallyImplicitTimeDiscretization

    def __init__(self, nu_0=0.7, kappa_0=0.5, Ri_0=0.1, Ri_delta=0.4,
                 convective_kappa=1.0, minimum_kappa=1e-5):
        self.nu_0 = float(nu_0)
        self.kappa_0 = float(kappa_0)
        self.Ri_0 = float(Ri_0)
        self.Ri_delta = float(Ri_delta)
        self.convective_kappa = float(convective_kappa)
        self.minimum_kappa = float(minimum_kappa)

    def compute_diffusivities(self, grid, u, v, w, tracers, buoyancy):
        from oceananigans_tpu.buoyancy import buoyancy_frequency
        Ri = _richardson_ccf(grid, u, v, tracers, buoyancy)
        N2 = buoyancy_frequency(grid, buoyancy, tracers)
        step = 0.5 * (1.0 - jnp.tanh((Ri - self.Ri_0) / self.Ri_delta))
        conv = jnp.where(N2 < 0, self.convective_kappa, 0.0)
        kappa = self.kappa_0 * step + conv + self.minimum_kappa
        nu = self.nu_0 * step + conv + self.minimum_kappa
        return {"kappa_z_ccf": kappa, "nu_z_ccf": nu}

    def momentum_flux_divergences(self, grid, u, v, w, tracers,
                                  diffusivities, include_implicit=True):
        if not include_implicit:
            return 0.0, 0.0, 0.0
        nu = diffusivities["nu_z_ccf"]
        fxz = ix_f(nu) * dz_f(u) / grid.dz(Face)
        fyz = iy_f(nu) * dz_f(v) / grid.dz(Face)
        fzz = iz_c(nu) * dz_c(w) / grid.dz(Center)
        zero = jnp.zeros_like(u)
        return (_div_u_fluxes(grid, zero, zero, fxz),
                _div_v_fluxes(grid, zero, zero, fyz),
                _div_w_fluxes(grid, zero, zero, fzz))

    def tracer_flux_divergence(self, grid, name, c, tracers, diffusivities,
                               include_implicit=True):
        if not include_implicit:
            return jnp.zeros_like(c)
        kz = diffusivities["kappa_z_ccf"]
        fz = kz * dz_f(c) / grid.dz(Face)
        zero = jnp.zeros_like(c)
        return _div_c_fluxes(grid, zero, zero, fz)

    def vertical_nu(self, grid, diffusivities):
        return diffusivities["nu_z_ccf"]

    def vertical_kappa(self, grid, diffusivities, name):
        return diffusivities["kappa_z_ccf"]

    def __repr__(self):
        return (f"RiBasedVerticalDiffusivity(ν₀={self.nu_0}, "
                f"κ₀={self.kappa_0})")


class CATKEVerticalDiffusivity(AbstractClosure):
    """CATKE: prognostic turbulent-kinetic-energy closure (reference
    ``TKEBasedVerticalDiffusivities/catke_vertical_diffusivity.jl``).

    Diffusivities: κ_q = ℓ_q √e with mixing length ℓ_q blending a
    stable-stratification cap (C^b √(e)/N), a convective length, and the
    distance-limited scale; TKE evolves by shear production, buoyancy flux,
    dissipation (C^D e^{3/2}/ℓ), and its own vertical transport. The TKE
    equation's sources are handled explicitly here; vertical diffusion of
    (u, v, tracers, e) is implicit.
    """

    time_discretization = VerticallyImplicitTimeDiscretization
    required_tracers = ("e",)

    def __init__(self, C_l=0.4, C_stab=0.6, C_conv=1.0, C_D=2.91,
                 Pr_t=1.0, Pr_e=1.0, minimum_tke=1e-9,
                 minimum_kappa=1e-5, maximum_kappa=1.0):
        self.C_l = float(C_l)            # von-Karman-like length coefficient
        self.C_stab = float(C_stab)      # stable stratification cap coeff
        self.C_conv = float(C_conv)      # convective length coeff
        self.C_D = float(C_D)            # dissipation coefficient
        self.Pr_t = float(Pr_t)
        self.Pr_e = float(Pr_e)
        self.minimum_tke = float(minimum_tke)
        self.minimum_kappa = float(minimum_kappa)
        self.maximum_kappa = float(maximum_kappa)

    # -- mixing length at (c,c,f) ----------------------------------------
    def _mixing_length(self, grid, e_ccf, N2):
        # distance from boundaries (z-based wall distance)
        zf = jnp.broadcast_to(grid.zF, grid.shape)
        z_bottom = -grid.Lz
        d_bottom = jnp.abs(zf - z_bottom)
        d_top = jnp.abs(zf)
        d_wall = jnp.minimum(d_bottom, d_top)
        sqrt_e = jnp.sqrt(jnp.maximum(e_ccf, self.minimum_tke))
        # stable cap: C_stab √e / N
        N = jnp.sqrt(jnp.maximum(N2, 1e-14))
        l_stable = self.C_stab * sqrt_e / N
        l = self.C_l * jnp.minimum(d_wall, l_stable)
        # convective: use the wall distance scaled by C_conv where N²<0
        l = jnp.where(N2 < 0, self.C_conv * self.C_l * d_wall, l)
        # floor at a fraction of the local grid spacing: dissipation
        # ε ∝ e^{3/2}/ℓ must not blow up at near-wall faces
        dz_local = jnp.broadcast_to(grid.dz(Face), grid.shape)
        return jnp.maximum(l, 0.25 * dz_local)

    def compute_diffusivities(self, grid, u, v, w, tracers, buoyancy):
        from oceananigans_tpu.buoyancy import buoyancy_frequency
        e = tracers["e"]
        e_ccf = iz_f(e)
        N2 = (buoyancy_frequency(grid, buoyancy, tracers)
              if buoyancy is not None else jnp.zeros_like(e_ccf))
        l = self._mixing_length(grid, e_ccf, N2)
        sqrt_e = jnp.sqrt(jnp.maximum(e_ccf, self.minimum_tke))
        ku = jnp.clip(l * sqrt_e, self.minimum_kappa, self.maximum_kappa)
        return {"nu_z_ccf": ku,
                "kappa_z_ccf": jnp.clip(ku / self.Pr_t, self.minimum_kappa,
                                        self.maximum_kappa),
                "kappa_e_ccf": jnp.clip(ku / self.Pr_e, self.minimum_kappa,
                                        self.maximum_kappa),
                "mixing_length_ccf": l, "N2_ccf": N2,
                "shear_production_ccf": ku * _shear_squared_ccf(grid, u, v)}

    def momentum_flux_divergences(self, grid, u, v, w, tracers,
                                  diffusivities, include_implicit=True):
        if not include_implicit:
            return 0.0, 0.0, 0.0
        nu = diffusivities["nu_z_ccf"]
        fxz = ix_f(nu) * dz_f(u) / grid.dz(Face)
        fyz = iy_f(nu) * dz_f(v) / grid.dz(Face)
        zero = jnp.zeros_like(u)
        return (_div_u_fluxes(grid, zero, zero, fxz),
                _div_v_fluxes(grid, zero, zero, fyz),
                jnp.zeros_like(w))

    def tracer_flux_divergence(self, grid, name, c, tracers, diffusivities,
                               include_implicit=True):
        e = tracers["e"]
        if name == "e":
            # TKE sources are explicit even when diffusion is implicit:
            # shear production + buoyancy flux − dissipation
            kc = diffusivities["kappa_z_ccf"]
            N2 = diffusivities["N2_ccf"]
            l = diffusivities["mixing_length_ccf"]
            P = diffusivities["shear_production_ccf"]
            wb = -kc * N2
            e_ccf = jnp.maximum(iz_f(e), self.minimum_tke)
            # dissipation linearized about e (∝ e, not e^{3/2}) so it can
            # only decay e toward zero, never overshoot it negative
            decay_rate = self.C_D * jnp.sqrt(e_ccf) / l
            eps = decay_rate * iz_f(e)
            source_ccf = P + wb - eps
            # TKE sources exist only at interior z-faces (wall faces carry
            # no turbulent flux; reference evaluates e sources at interior
            # cells only)
            k_idx = jnp.arange(grid.shape[2]).reshape(1, 1, -1)
            in_faces = (k_idx > grid.Hz) & (k_idx < grid.Hz + grid.Nz)
            source_ccf = jnp.where(in_faces, source_ccf, 0.0)
            return iz_c(source_ccf)
        if not include_implicit:
            return jnp.zeros_like(c)
        kz = diffusivities["kappa_z_ccf"]
        fz = kz * dz_f(c) / grid.dz(Face)
        zero = jnp.zeros_like(c)
        return _div_c_fluxes(grid, zero, zero, fz)

    def vertical_nu(self, grid, diffusivities):
        return diffusivities["nu_z_ccf"]

    def vertical_kappa(self, grid, diffusivities, name):
        if name == "e":
            return diffusivities["kappa_e_ccf"]
        return diffusivities["kappa_z_ccf"]

    def __repr__(self):
        return f"CATKEVerticalDiffusivity(C_D={self.C_D})"


class TKEDissipationVerticalDiffusivity(AbstractClosure):
    """k-ε vertical closure: two prognostic tracers — TKE ``e`` and its
    dissipation rate ``eps`` (reference
    ``TKEDissipationVerticalDiffusivities/`` k-epsilon implementation).

    ν = C_μ e²/ε, κ = ν/σ; e and ε evolve by shear production P,
    buoyancy flux B, and dissipation:
        ∂t e = P + B − ε + transport
        ∂t ε = (ε/e)(C₁ P + C₃ B − C₂ ε) + transport
    with the standard Launder-Spalding constants.
    """

    time_discretization = VerticallyImplicitTimeDiscretization
    required_tracers = ("e", "eps")

    def __init__(self, C_mu=0.09, C1=1.44, C2=1.92, C3_stable=-0.65,
                 C3_unstable=1.44, sigma_k=1.0, sigma_e=1.3, Pr_t=1.0,
                 minimum_tke=1e-9, minimum_eps=1e-12,
                 minimum_kappa=1e-5, maximum_kappa=1.0):
        self.C_mu = float(C_mu)
        self.C1 = float(C1)
        self.C2 = float(C2)
        self.C3_stable = float(C3_stable)
        self.C3_unstable = float(C3_unstable)
        self.sigma_k = float(sigma_k)
        self.sigma_e = float(sigma_e)
        self.Pr_t = float(Pr_t)
        self.minimum_tke = float(minimum_tke)
        self.minimum_eps = float(minimum_eps)
        self.minimum_kappa = float(minimum_kappa)
        self.maximum_kappa = float(maximum_kappa)

    def compute_diffusivities(self, grid, u, v, w, tracers, buoyancy):
        from oceananigans_tpu.buoyancy import buoyancy_frequency
        e = jnp.maximum(iz_f(tracers["e"]), self.minimum_tke)
        eps = jnp.maximum(iz_f(tracers["eps"]), self.minimum_eps)
        nu = jnp.clip(self.C_mu * e * e / eps, self.minimum_kappa,
                      self.maximum_kappa)
        N2 = (buoyancy_frequency(grid, buoyancy, tracers)
              if buoyancy is not None else jnp.zeros_like(e))
        S2 = _shear_squared_ccf(grid, u, v)
        return {"nu_z_ccf": nu,
                "kappa_z_ccf": jnp.clip(nu / self.Pr_t, self.minimum_kappa,
                                        self.maximum_kappa),
                "e_ccf": e, "eps_ccf": eps, "N2_ccf": N2,
                "P_ccf": nu * S2,
                "B_ccf": -(nu / self.Pr_t) * N2}

    def momentum_flux_divergences(self, grid, u, v, w, tracers,
                                  diffusivities, include_implicit=True):
        if not include_implicit:
            return 0.0, 0.0, 0.0
        nu = diffusivities["nu_z_ccf"]
        fxz = ix_f(nu) * dz_f(u) / grid.dz(Face)
        fyz = iy_f(nu) * dz_f(v) / grid.dz(Face)
        zero = jnp.zeros_like(u)
        return (_div_u_fluxes(grid, zero, zero, fxz),
                _div_v_fluxes(grid, zero, zero, fyz),
                jnp.zeros_like(w))

    def _interior_faces_mask(self, grid):
        k = jnp.arange(grid.shape[2]).reshape(1, 1, -1)
        return (k > grid.Hz) & (k < grid.Hz + grid.Nz)

    def tracer_flux_divergence(self, grid, name, c, tracers, diffusivities,
                               include_implicit=True):
        mask = self._interior_faces_mask(grid)
        if name == "e":
            P = diffusivities["P_ccf"]
            B = diffusivities["B_ccf"]
            eps = diffusivities["eps_ccf"]
            src = jnp.where(mask, P + B - eps, 0.0)
            return iz_c(src)
        if name == "eps":
            e = diffusivities["e_ccf"]
            eps = diffusivities["eps_ccf"]
            P = diffusivities["P_ccf"]
            B = diffusivities["B_ccf"]
            C3 = jnp.where(B > 0, self.C3_unstable, self.C3_stable)
            src = (eps / e) * (self.C1 * P + C3 * B - self.C2 * eps)
            return iz_c(jnp.where(mask, src, 0.0))
        if not include_implicit:
            return jnp.zeros_like(c)
        kz = diffusivities["kappa_z_ccf"]
        fz = kz * dz_f(c) / grid.dz(Face)
        zero = jnp.zeros_like(c)
        return _div_c_fluxes(grid, zero, zero, fz)

    def vertical_nu(self, grid, diffusivities):
        return diffusivities["nu_z_ccf"]

    def vertical_kappa(self, grid, diffusivities, name):
        if name == "e":
            return diffusivities["nu_z_ccf"] / self.sigma_k
        if name == "eps":
            return diffusivities["nu_z_ccf"] / self.sigma_e
        return diffusivities["kappa_z_ccf"]

    def __repr__(self):
        return f"TKEDissipationVerticalDiffusivity(Cμ={self.C_mu})"


class LeithEnstrophyDiffusivity(AbstractClosure):
    """2-D Leith horizontal eddy viscosity ν = (C Δ/π)³ |∇ζ| (reference
    ``leith_enstrophy_diffusivity.jl``)."""

    def __init__(self, C=1.0):
        self.C = float(C)

    def compute_diffusivities(self, grid, u, v, w, tracers, buoyancy):
        from oceananigans_tpu.ops.operators import vorticity_z_ff
        zeta = vorticity_z_ff(grid, u, v)
        dzx = ix_c(dx_f(iy_c(zeta))) / grid.dx(Center, Center)
        dzy = iy_c(dy_f(ix_c(zeta))) / grid.dy(Center, Center)
        grad_z = jnp.sqrt(dzx * dzx + dzy * dzy)
        delta = jnp.sqrt(grid.dx(Center, Center) * grid.dy(Center, Center))
        nu = (self.C * delta / jnp.pi) ** 3 * grad_z
        return {"nu_e": nu}

    def momentum_flux_divergences(self, grid, u, v, w, tracers,
                                  diffusivities, include_implicit=True):
        from oceananigans_tpu.closures import _laplacian_momentum_divs
        return _laplacian_momentum_divs(grid, diffusivities["nu_e"], u, v, w,
                                        include_z=False)

    def tracer_flux_divergence(self, grid, name, c, tracers, diffusivities,
                               include_implicit=True):
        from oceananigans_tpu.closures import _laplacian_tracer_div
        return _laplacian_tracer_div(grid, diffusivities["nu_e"], c,
                                     include_z=False)

    def vertical_nu(self, grid, diffusivities):
        return 0.0

    def vertical_kappa(self, grid, diffusivities, name):
        return 0.0

    def __repr__(self):
        return f"LeithEnstrophyDiffusivity(C={self.C})"


class IsopycnalSkewSymmetricDiffusivity(AbstractClosure):
    """Gent-McWilliams + Redi: along-isopycnal tracer diffusion (symmetric,
    κ_R) and eddy-induced skew flux (antisymmetric, κ_GM) in the small-
    slope approximation with slope clipping (reference
    ``isopycnal_skew_symmetric_diffusivity.jl`` +
    ``isopycnal_rotation_tensor_components.jl``).

    Tracer flux (small slope):
        Fx = −κ_R ∂x c − (κ_R − κ_GM) Sx ∂z c
        Fy = −κ_R ∂y c − (κ_R − κ_GM) Sy ∂z c
        Fz = −(κ_R + κ_GM)(Sx ∂x c + Sy ∂y c) − κ_R |S|² ∂z c − κ_z ∂z c
    with slopes Sx = −∂x b / ∂z b, Sy = −∂y b / ∂z b clipped at
    ``maximum_slope``.
    """

    def __init__(self, kappa_redi=1000.0, kappa_gm=1000.0,
                 maximum_slope=1e-2, kappa_z=1e-5):
        self.kappa_redi = float(kappa_redi)
        self.kappa_gm = float(kappa_gm)
        self.maximum_slope = float(maximum_slope)
        self.kappa_z = float(kappa_z)

    def compute_diffusivities(self, grid, u, v, w, tracers, buoyancy):
        b = buoyancy.buoyancy_ccc(grid, tracers)
        return {"b": b}

    def momentum_flux_divergences(self, grid, u, v, w, tracers,
                                  diffusivities, include_implicit=True):
        return 0.0, 0.0, 0.0

    def _taper(self, Sx, Sy):
        """Gerdes-Köberle-Willebrand slope taper min(1, (Smax/|S|)²)."""
        smax = self.maximum_slope
        S2 = Sx * Sx + Sy * Sy
        return jnp.minimum(1.0, smax * smax / jnp.maximum(S2, 1e-30))

    def tracer_flux_divergence(self, grid, name, c, tracers, diffusivities,
                               include_implicit=True):
        """Fluxes assembled AT each face with identical stencils for the
        slope (from b) and the tracer gradients, so a tracer aligned with
        isopycnals (c ≡ b) feels exactly-zero Redi flux by algebraic
        cancellation — the discrete analog of the rotation-tensor property
        (reference isopycnal_rotation_tensor_components.jl)."""
        kR, kG = self.kappa_redi, self.kappa_gm
        b = diffusivities["b"]
        floor = 1e-12

        def grads_at_xface(q):
            qx = dx_f(q) / grid.dx(Face, Center)
            qz = ix_f(iz_c(dz_f(q) / grid.dz(Face)))
            return qx, qz

        def grads_at_yface(q):
            qy = dy_f(q) / grid.dy(Face, Center)
            qz = iy_f(iz_c(dz_f(q) / grid.dz(Face)))
            return qy, qz

        def grads_at_zface(q):
            qz = dz_f(q) / grid.dz(Face)
            qx = iz_f(ix_c(dx_f(q) / grid.dx(Face, Center)))
            qy = iz_f(iy_c(dy_f(q) / grid.dy(Face, Center)))
            return qx, qy, qz

        # The GKW taper multiplies the COMPLETE slope-dependent term (raw
        # slopes inside): tapered regions degrade gracefully to horizontal
        # diffusion while the Redi c≡b cancellation inside the taper factor
        # stays exact.

        # x-face flux
        bx, bzx = grads_at_xface(b)
        Sx_f = -bx / jnp.maximum(bzx, floor)
        tx = self._taper(Sx_f, 0.0)
        cx, czx = grads_at_xface(c)
        fx = kR * cx + tx * (kR - kG) * Sx_f * czx

        # y-face flux
        by, bzy = grads_at_yface(b)
        Sy_f = -by / jnp.maximum(bzy, floor)
        ty = self._taper(0.0, Sy_f)
        cy, czy = grads_at_yface(c)
        fy = kR * cy + ty * (kR - kG) * Sy_f * czy

        # z-face flux: slopes from the same z-face stencils; at wall faces
        # dz_f(b) -> 0 via mirror halos, slopes blow up, and the taper
        # drives the slope terms to zero automatically
        bxz, byz, bz = grads_at_zface(b)
        Sxz = -bxz / jnp.maximum(bz, floor)
        Syz = -byz / jnp.maximum(bz, floor)
        tz = self._taper(Sxz, Syz)
        cxz, cyz, cz = grads_at_zface(c)
        fz = (tz * ((kR + kG) * (Sxz * cxz + Syz * cyz)
                    + kR * (Sxz * Sxz + Syz * Syz) * cz)
              + self.kappa_z * cz)
        return _div_c_fluxes(grid, fx, fy, fz)

    def vertical_nu(self, grid, diffusivities):
        return 0.0

    def vertical_kappa(self, grid, diffusivities, name):
        return 0.0

    def __repr__(self):
        return (f"IsopycnalSkewSymmetricDiffusivity(κ_R={self.kappa_redi}, "
                f"κ_GM={self.kappa_gm})")

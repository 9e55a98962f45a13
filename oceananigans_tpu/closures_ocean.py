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
    dx_f, dy_f, dz_c, dz_f, ix_c, ix_f, iy_c, iy_f, iz_c, iz_f, shift,
)

__all__ = ["CATKEVerticalDiffusivity", "CATKEMixingLength",
           "CATKEEquation", "RiBasedVerticalDiffusivity",
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


import dataclasses


@dataclasses.dataclass(frozen=True)
class CATKEMixingLength:
    """Mixing-length parameters (reference ``catke_mixing_length.jl:15-37``,
    same names romanized, same calibrated defaults)."""
    Cs: float = 1.131     # surface distance coefficient
    Cb: float = 0.28      # bottom distance coefficient
    Csp: float = 0.505    # sheared convective plume coefficient
    CRi_delta: float = 1.02   # stability function width
    CRi0: float = 0.254       # stability function lower Ri
    Chi_u: float = 0.242
    Clo_u: float = 0.361
    Cun_u: float = 0.370
    Cc_u: float = 3.705
    Ce_u: float = 0.0
    Chi_c: float = 0.098
    Clo_c: float = 0.369
    Cun_c: float = 0.572
    Cc_c: float = 4.793
    Ce_c: float = 0.112
    Chi_e: float = 0.548
    Clo_e: float = 7.863
    Cun_e: float = 1.447
    Cc_e: float = 3.642
    Ce_e: float = 0.0


@dataclasses.dataclass(frozen=True)
class CATKEEquation:
    """TKE-equation parameters (reference ``catke_equation.jl:7-17``)."""
    Chi_D: float = 0.579
    Clo_D: float = 1.604
    Cun_D: float = 0.923
    Cc_D: float = 3.254
    Ce_D: float = 0.0
    CW_ustar: float = 3.179   # surface shear-driven TKE flux coefficient
    CW_wdelta: float = 0.383  # surface convective TKE flux coefficient
    CW_eps: float = 1.0


class CATKEVerticalDiffusivity(AbstractClosure):
    """CATKE: prognostic-TKE vertical closure with the reference's FULL
    mixing-length formulation (``catke_vertical_diffusivity.jl``,
    ``catke_mixing_length.jl``, ``catke_equation.jl``):

    - per-quantity stability functions σ(Ri) (piecewise-linear between
      the unstable, low-Ri, and high-Ri coefficients),
    - stable length ℓ★ = σ · min(Cˢ·depth, Cᵇ·height-above-bottom,
      w★/√N²⁺),
    - convective (Deardorff) and entrainment lengths driven by the
      surface buoyancy flux Jᵇ with the sheared-convection reduction,
    - dissipation ε = ω e with ω = √e/ℓᴰ (its own coefficient set) and
      fast damping of negative e,
    - surface TKE flux J_e = −(Cᵂu★ u★³ + CᵂwΔ wΔ³) from the momentum
      and buoyancy surface fluxes.

    The models pass the top flux-BC values via ``top_fluxes``; without
    them the convective/entrainment machinery reduces to zero (pure
    shear turbulence), matching the reference with no surface forcing.
    """

    time_discretization = VerticallyImplicitTimeDiscretization
    required_tracers = ("e",)
    wants_top_fluxes = True

    def __init__(self, mixing_length=None, tke_equation=None,
                 maximum_viscosity=float("inf"),
                 maximum_tracer_diffusivity=float("inf"),
                 minimum_tke=1e-9,
                 minimum_convective_buoyancy_flux=1e-11,
                 negative_tke_damping_time_scale=60.0):
        self.mixing_length = mixing_length or CATKEMixingLength()
        self.tke_equation = tke_equation or CATKEEquation()
        self.maximum_viscosity = float(maximum_viscosity)
        self.maximum_tracer_diffusivity = float(maximum_tracer_diffusivity)
        self.minimum_tke = float(minimum_tke)
        self.Jb_eps = float(minimum_convective_buoyancy_flux)
        self.neg_damping = float(negative_tke_damping_time_scale)

    # ------------------------------------------------------------------
    def _sigma(self, Ri, Cun, Clo, Chi):
        """σ(Ri): Cun for Ri<0; for Ri>=0, Clo → Chi over the step
        [CRi0, CRi0+CRiδ] (reference ``scale``/``step``)."""
        ml = self.mixing_length
        t = jnp.clip((Ri - ml.CRi0) / ml.CRi_delta, 0.0, 1.0)
        sp = Clo + (Chi - Clo) * t
        return jnp.where(Ri < 0, Cun, sp)

    def _stable_length(self, sigma, w_star, N2, d_up, d_down):
        big = jnp.asarray(1e20, w_star.dtype)
        lN = jnp.where(N2 > 0, w_star / jnp.sqrt(jnp.maximum(N2, 1e-30)),
                       big)
        d = jnp.minimum(d_up, d_down)
        return sigma * jnp.minimum(d, lN)

    def _convective_length(self, Cc, Ce, w_star, S2, N2, N2_above, Jb,
                           depth):
        ml = self.mixing_length
        Jb_tot = Jb + self.Jb_eps
        lc = Cc * w_star ** 3 / Jb_tot
        Rif = depth * w_star * S2 / Jb_tot    # flux Richardson number
        lc = jnp.maximum((1.0 - ml.Csp * Rif) * lc, 0.0)
        le = Ce * Jb / (w_star * N2 + self.Jb_eps)
        convecting = (Jb > self.Jb_eps) & (N2 < 0)
        entraining = (Jb > self.Jb_eps) & (N2 > 0) & (N2_above < 0)
        return jnp.where(convecting, lc,
                         jnp.where(entraining, le, 0.0))

    def _lengths_at(self, grid, e_loc, N2, S2, Ri, Jb, z, coeffs):
        """Mixing length for one quantity at one vertical location.
        ``coeffs`` = (Cun, Clo, Chi, Cc, Ce)."""
        Cun, Clo, Chi, Cc, Ce = coeffs
        ml = self.mixing_length
        w_star = jnp.sqrt(jnp.maximum(e_loc, 0.0))
        depth = jnp.maximum(-z, 0.0)                  # surface at z = 0
        habove = jnp.maximum(z + grid.Lz, 0.0)
        sigma = self._sigma(Ri, Cun, Clo, Chi)
        l_star = self._stable_length(sigma, w_star, N2,
                                     ml.Cs * depth, ml.Cb * habove)
        N2_above = shift(N2, 1, 2)
        lh = self._convective_length(Cc, Ce, w_star, S2, N2, N2_above,
                                     Jb, depth)
        return jnp.minimum(grid.Lz, jnp.maximum(l_star, lh))

    # ------------------------------------------------------------------
    def compute_diffusivities(self, grid, u, v, w, tracers, buoyancy,
                              top_fluxes=None):
        from oceananigans_tpu.buoyancy import buoyancy_frequency
        top_fluxes = top_fluxes or {}
        e = tracers["e"]
        e_ccf = iz_f(e)
        N2_ccf = (buoyancy_frequency(grid, buoyancy, tracers)
                  if buoyancy is not None else jnp.zeros_like(e_ccf))
        S2_ccf = _shear_squared_ccf(grid, u, v)
        Ri_ccf = N2_ccf / jnp.maximum(S2_ccf, 1e-20)
        Jb = top_fluxes.get("b")
        Jb = jnp.zeros((), e.dtype) if Jb is None else jnp.asarray(Jb)
        Jb = jnp.maximum(Jb, 0.0)      # only destabilizing flux convects

        ml = self.mixing_length
        zF = jnp.broadcast_to(grid.zF, grid.shape)
        ell_u = self._lengths_at(grid, e_ccf, N2_ccf, S2_ccf, Ri_ccf, Jb,
                                 zF, (ml.Cun_u, ml.Clo_u, ml.Chi_u,
                                      ml.Cc_u, ml.Ce_u))
        ell_c = self._lengths_at(grid, e_ccf, N2_ccf, S2_ccf, Ri_ccf, Jb,
                                 zF, (ml.Cun_c, ml.Clo_c, ml.Chi_c,
                                      ml.Cc_c, ml.Ce_c))
        ell_e = self._lengths_at(grid, e_ccf, N2_ccf, S2_ccf, Ri_ccf, Jb,
                                 zF, (ml.Cun_e, ml.Clo_e, ml.Chi_e,
                                      ml.Cc_e, ml.Ce_e))
        w_star_ccf = jnp.sqrt(jnp.maximum(e_ccf, self.minimum_tke))
        ku = jnp.minimum(ell_u * w_star_ccf, self.maximum_viscosity)
        kc = jnp.minimum(ell_c * w_star_ccf,
                         self.maximum_tracer_diffusivity)
        ke = jnp.minimum(ell_e * w_star_ccf,
                         self.maximum_tracer_diffusivity)

        # dissipation rate at cell centers (its own coefficient set)
        te = self.tke_equation
        N2_ccc = iz_c(N2_ccf)
        S2_ccc = iz_c(S2_ccf)
        Ri_ccc = N2_ccc / jnp.maximum(S2_ccc, 1e-20)
        zC = jnp.broadcast_to(grid.zC, grid.shape)
        # the dissipation stability function DIVIDES the stable length
        # (reference ``dissipation_length_scaleᶜᶜᶜ``: ℓ★ = ℓ★/σᴰ)
        sigma_D = self._sigma(Ri_ccc, te.Cun_D, te.Clo_D, te.Chi_D)
        w_star_ccc = jnp.sqrt(jnp.maximum(e, 0.0))
        depth_c = jnp.maximum(-zC, 0.0)
        habove_c = jnp.maximum(zC + grid.Lz, 0.0)
        l_star_D = self._stable_length(1.0 / sigma_D, w_star_ccc, N2_ccc,
                                       ml.Cs * depth_c,
                                       ml.Cb * habove_c)
        lh_D = self._convective_length(te.Cc_D, te.Ce_D, w_star_ccc,
                                       S2_ccc, N2_ccc,
                                       shift(N2_ccc, 1, 2), Jb, depth_c)
        ell_D = jnp.minimum(grid.Lz, jnp.maximum(l_star_D, lh_D))
        omega = jnp.where(
            e < 0, 1.0 / self.neg_damping,
            jnp.sqrt(jnp.abs(e)) / jnp.maximum(ell_D, 1e-10))

        # surface TKE flux from the momentum/buoyancy surface fluxes
        tau_x = top_fluxes.get("u")
        tau_y = top_fluxes.get("v")
        zero2d = jnp.zeros((), e.dtype)
        tx = zero2d if tau_x is None else jnp.asarray(tau_x)
        ty = zero2d if tau_y is None else jnp.asarray(tau_y)
        u_star = (tx ** 2 + ty ** 2) ** 0.25
        dz_top = jnp.asarray(grid.dz(Center)).reshape(-1)[grid.Hz
                                                          + grid.Nz - 1]
        wdelta3 = jnp.maximum(Jb, 0.0) * dz_top
        J_e = -(te.CW_ustar * u_star ** 3 + te.CW_wdelta * wdelta3)

        return {"nu_z_ccf": ku, "kappa_z_ccf": kc, "kappa_e_ccf": ke,
                "mixing_length_ccf": ell_u, "N2_ccf": N2_ccf,
                "shear_production_ccf": ku * S2_ccf,
                "dissipation_rate_ccc": omega,
                "tke_top_flux": J_e, "dz_top": dz_top}

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
            kc = diffusivities["kappa_z_ccf"]
            N2 = diffusivities["N2_ccf"]
            P = diffusivities["shear_production_ccf"]
            wb = -kc * N2
            k_idx = jnp.arange(grid.shape[2]).reshape(1, 1, -1)
            in_faces = (k_idx > grid.Hz) & (k_idx < grid.Hz + grid.Nz)
            source_ccf = jnp.where(in_faces, P + wb, 0.0)
            src = iz_c(source_ccf)
            src = src - diffusivities["dissipation_rate_ccc"] * e
            # surface TKE injection into the top interior cell
            J_e = diffusivities["tke_top_flux"]
            dz_top = diffusivities["dz_top"]
            top_cell = (k_idx == grid.Hz + grid.Nz - 1)
            src = src + jnp.where(top_cell, -J_e / dz_top, 0.0)
            return src
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
        return "CATKEVerticalDiffusivity(reference coefficient set)"


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

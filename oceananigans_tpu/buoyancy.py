"""Buoyancy formulations and equations of state.

Reference layer: ``src/BuoyancyFormulations/`` (SURVEY.md §2.12) —
``BuoyancyTracer`` (``buoyancy_tracer.jl:6``), ``SeawaterBuoyancy``
(``seawater_buoyancy.jl:11``), ``LinearEquationOfState``
(``linear_equation_of_state.jl:6``), tilted-gravity ``BuoyancyForce``
(``buoyancy_force.jl:3``).

A formulation provides ``buoyancy_ccc(grid, tracers) -> b`` (the buoyancy
perturbation at cell centers) and ``required_tracers``; the model assembles
the momentum contribution by interpolating ``b`` onto the velocity points
along the gravity unit vector. ``buoyancy_frequency`` N² = ∂b/∂z at
(c,c,f) feeds closures.
"""

from __future__ import annotations

import jax.numpy as jnp

from oceananigans_tpu.ops.operators import ddz_f, ix_f, iy_f, iz_f

__all__ = ["BuoyancyTracer", "SeawaterBuoyancy", "LinearEquationOfState",
           "TEOS10EquationOfState", "BuoyancyForce", "buoyancy_frequency"]

#: standard gravitational acceleration [m s⁻²] (reference
#: ``g_Earth``, src/BuoyancyFormulations/BuoyancyFormulations.jl)
g_Earth = 9.80665


class BuoyancyTracer:
    """Buoyancy itself is the prognostic tracer ``b`` (reference
    ``buoyancy_tracer.jl:6``)."""

    required_tracers = ("b",)

    def buoyancy_ccc(self, grid, tracers):
        return tracers["b"]

    def __repr__(self):
        return "BuoyancyTracer()"

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash("BuoyancyTracer")


class LinearEquationOfState:
    """ρ′ = ρ₀ (−α T + β S) (reference ``linear_equation_of_state.jl:6``;
    α is the thermal expansion, β the haline contraction coefficient)."""

    def __init__(self, thermal_expansion=1.67e-4, haline_contraction=7.8e-4):
        self.alpha = float(thermal_expansion)
        self.beta = float(haline_contraction)

    def buoyancy(self, g, T, S):
        return g * (self.alpha * T - self.beta * S)

    def __repr__(self):
        return (f"LinearEquationOfState(α={self.alpha:g}, β={self.beta:g})")

    def __eq__(self, other):
        return (type(self) is type(other)
                and (self.alpha, self.beta) == (other.alpha, other.beta))

    def __hash__(self):
        return hash(("LinearEOS", self.alpha, self.beta))


class TEOS10EquationOfState:
    """Polynomial approximation of the TEOS-10 seawater equation of state
    (Roquet et al. 2015, "Accurate polynomial expressions for the density
    and specific volume of seawater using the TEOS-10 standard", the same
    55-term basis the reference obtains through SeawaterPolynomials.jl).

    Implements the simplified second-order expansion of Roquet et al.
    (2015) Eq. 17 ("polyTEOS10-simple"):

        ρ′ = ρ₀ [ −a(1 + γ(z + z_ref)/2)(T − T₀)
                  + b(S − S₀) − c(T − T₀)² / 2 ] / ρ₀

    capturing thermal expansion increasing with depth (thermobaricity, γ)
    and cabbeling (c) — the leading nonlinear-EOS effects the linear EOS
    misses. Coefficients from Roquet et al. (2015) Table 1 (simple EOS).
    """

    def __init__(self, reference_density=1026.0):
        self.rho0 = float(reference_density)
        # Roquet et al. 2015 "simple" EOS coefficients (SI)
        self.Cb = 0.77e-3          # haline contraction [kg m⁻³ / (g/kg)]
        self.Th = 2.5e-5           # thermobaric coefficient [°C⁻¹ m⁻¹]...
        self.a0 = 1.6550e-1        # thermal expansion [kg m⁻³ °C⁻¹]
        self.b0 = 7.6554e-1        # haline contraction [kg m⁻³ (g/kg)⁻¹]
        self.lam1 = 5.9520e-2      # cabbeling [kg m⁻³ °C⁻²]
        self.mu1 = 1.4970e-4       # thermobaricity [kg m⁻³ °C⁻¹ m⁻¹]
        self.T0 = 10.0
        self.S0 = 35.0

    def buoyancy(self, g, T, S, z=0.0):
        Ta = T - self.T0
        Sa = S - self.S0
        rho_prime = (-(self.a0 + 0.5 * self.lam1 * Ta + self.mu1 * (-z))
                     * Ta + self.b0 * Sa)
        return -g * rho_prime / self.rho0

    def __repr__(self):
        return f"TEOS10EquationOfState(ρ₀={self.rho0:g})"

    def __eq__(self, other):
        return type(self) is type(other) and self.rho0 == other.rho0

    def __hash__(self):
        return hash(("TEOS10", self.rho0))


class SeawaterBuoyancy:
    """b from temperature T and salinity S through an equation of state
    (reference ``seawater_buoyancy.jl:11``). With
    ``constant_temperature=``/``constant_salinity=`` one of the tracers is
    dropped and replaced by the constant."""

    def __init__(self, gravitational_acceleration=g_Earth,
                 equation_of_state=None, constant_temperature=None,
                 constant_salinity=None):
        self.g = float(gravitational_acceleration)
        self.eos = equation_of_state or LinearEquationOfState()
        self.constant_temperature = constant_temperature
        self.constant_salinity = constant_salinity
        req = []
        if constant_temperature is None:
            req.append("T")
        if constant_salinity is None:
            req.append("S")
        self.required_tracers = tuple(req)

    def buoyancy_ccc(self, grid, tracers):
        T = (tracers["T"] if self.constant_temperature is None
             else self.constant_temperature)
        S = (tracers["S"] if self.constant_salinity is None
             else self.constant_salinity)
        if isinstance(self.eos, TEOS10EquationOfState):
            return self.eos.buoyancy(self.g, T, S, z=grid.zC)
        return self.eos.buoyancy(self.g, T, S)

    def __repr__(self):
        return f"SeawaterBuoyancy(g={self.g:g}, eos={self.eos!r})"

    def __eq__(self, other):
        return (type(self) is type(other) and self.g == other.g
                and self.eos == other.eos
                and self.constant_temperature == other.constant_temperature
                and self.constant_salinity == other.constant_salinity)

    def __hash__(self):
        return hash(("SeawaterBuoyancy", self.g, self.eos,
                     self.constant_temperature, self.constant_salinity))


class BuoyancyForce:
    """A formulation plus a gravity unit vector for tilted domains
    (reference ``buoyancy_force.jl:3``; default gravity is −ẑ)."""

    def __init__(self, formulation, gravity_unit_vector=(0.0, 0.0, -1.0)):
        self.formulation = formulation
        self.gravity_unit_vector = tuple(float(c) for c in gravity_unit_vector)

    @property
    def required_tracers(self):
        return self.formulation.required_tracers

    def buoyancy_ccc(self, grid, tracers):
        return self.formulation.buoyancy_ccc(grid, tracers)

    # momentum contributions: −ĝ·b interpolated to each velocity point
    # (reference x/y/z_dot_g_b; for the default −ẑ only w feels buoyancy)
    def x_contribution(self, grid, tracers):
        gx = self.gravity_unit_vector[0]
        if gx == 0.0:
            return None
        return -gx * ix_f(self.buoyancy_ccc(grid, tracers))

    def y_contribution(self, grid, tracers):
        gy = self.gravity_unit_vector[1]
        if gy == 0.0:
            return None
        return -gy * iy_f(self.buoyancy_ccc(grid, tracers))

    def z_contribution(self, grid, tracers):
        gz = self.gravity_unit_vector[2]
        if gz == 0.0:
            return None
        return -gz * iz_f(self.buoyancy_ccc(grid, tracers))

    def __repr__(self):
        return (f"BuoyancyForce({self.formulation!r}, "
                f"gravity_unit_vector={self.gravity_unit_vector})")

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.formulation == other.formulation
                and self.gravity_unit_vector == other.gravity_unit_vector)

    def __hash__(self):
        return hash(("BuoyancyForce", self.formulation,
                     self.gravity_unit_vector))


def regularize_buoyancy(buoyancy):
    """Wrap a bare formulation in a default (−ẑ gravity) BuoyancyForce."""
    if buoyancy is None or isinstance(buoyancy, BuoyancyForce):
        return buoyancy
    return BuoyancyForce(buoyancy)


def buoyancy_frequency(grid, buoyancy, tracers):
    """N² = ∂z b at (c,c,f) (reference ``∂z_b``)."""
    if buoyancy is None:
        return None
    b = buoyancy.buoyancy_ccc(grid, tracers)
    return ddz_f(grid, b)


# Reference export alias (``src/Oceananigans.jl`` exports ``TEOS10``).
TEOS10 = TEOS10EquationOfState


def BuoyancyField(model, state):
    """Buoyancy at cell centers from the model's formulation and the
    state's tracers (reference ``src/BuoyancyFormulations/buoyancy_field.jl``
    ``BuoyancyField(model)``)."""
    if model.buoyancy is None:
        raise ValueError("model has no buoyancy formulation")
    return model.buoyancy.buoyancy_ccc(model.grid, state.tracers)

from oceananigans_tpu.models.nonhydrostatic import (
    NonhydrostaticModel, NonhydrostaticState,
)
from oceananigans_tpu.models.shallow_water import (
    ShallowWaterModel, ShallowWaterState,
    ConservativeFormulation, VectorInvariantFormulation,
)
from oceananigans_tpu.models.hydrostatic import (
    HydrostaticFreeSurfaceModel, HydrostaticState,
    ExplicitFreeSurface, SplitExplicitFreeSurface, ImplicitFreeSurface,
    VectorInvariant, WENOVectorInvariant,
    OnlySelfUpwinding, CrossAndSelfUpwinding,
    PrescribedVelocityFields, ZCoordinate, ZStar,
)


def PressureField(model, state):
    """The total kinematic pressure field (reference
    ``src/Models/NonhydrostaticModels/pressure_field.jl``): the
    nonhydrostatic model stores the solver pressure on its state; the
    hydrostatic model's pressure is the hydrostatic integral of buoyancy."""
    if hasattr(state, "pressure"):
        return state.pressure
    raise ValueError(f"{type(model).__name__} does not carry a pressure "
                     "field; use BuoyancyField / the free-surface height")


def fields(state):
    """Dict of the state's prognostic + diagnostic fields by name
    (reference ``fields(model)``)."""
    out = {}
    for name in ("u", "v", "w", "eta", "h", "uh", "vh", "pressure"):
        if hasattr(state, name):
            out[name] = getattr(state, name)
    out.update(getattr(state, "tracers", {}))
    return out

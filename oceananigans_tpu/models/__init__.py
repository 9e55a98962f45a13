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

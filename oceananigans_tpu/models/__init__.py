from oceananigans_tpu.models.nonhydrostatic import (
    NonhydrostaticModel, NonhydrostaticState,
)
from oceananigans_tpu.models.hydrostatic import (
    HydrostaticFreeSurfaceModel, HydrostaticState,
    ExplicitFreeSurface, SplitExplicitFreeSurface, VectorInvariant,
    PrescribedVelocityFields,
)

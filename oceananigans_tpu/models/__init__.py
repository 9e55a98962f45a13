from oceananigans_tpu.models.nonhydrostatic import (
    NonhydrostaticModel, NonhydrostaticState,
)

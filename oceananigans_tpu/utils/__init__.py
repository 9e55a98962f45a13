from oceananigans_tpu.utils.units import *  # noqa: F401,F403
from oceananigans_tpu.utils.pretty import prettytime, prettysummary  # noqa: F401

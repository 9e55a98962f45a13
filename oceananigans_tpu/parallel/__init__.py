from oceananigans_tpu.parallel.distributed import (
    Partition, Distributed, shard_state, sharded_step_fn,
)
from oceananigans_tpu.parallel.halo_exchange import (
    halo_exchange, halo_exchange_spec,
)
from oceananigans_tpu.parallel.distributed_fft import (
    DistributedFFTPoissonSolver,
)
from oceananigans_tpu.parallel.shard_step import (
    DistributedModel, DistributedStep, dist_fill_halos,
)
from oceananigans_tpu.parallel.cubed_sphere_shard import (
    CubedSphereDistributedSW,
)

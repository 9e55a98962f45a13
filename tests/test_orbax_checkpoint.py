"""Orbax sharded checkpoint/restore: bitwise restart on an 8-device
virtual mesh (capability parity with ``checkpointer.jl`` extended to
the distributed case)."""

import jax
import numpy as np

from oceananigans_tpu import Periodic, RectilinearGrid
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.output import OrbaxCheckpointer
from oceananigans_tpu.parallel.distributed import (
    Distributed, Partition, shard_state, sharded_step_fn,
)


def test_orbax_sharded_bitwise_restart(tmp_path):
    grid = RectilinearGrid(size=(16, 16, 8), x=(0, 1), y=(0, 1),
                           z=(0, 1),
                           topology=(Periodic, Periodic, Periodic),
                           halo=(0, 0, 1))
    model = NonhydrostaticModel(grid=grid)
    dist = Distributed(Partition(x=4, y=2))
    state = model.initial_state(
        u=lambda x, y, z: np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y))
    state = shard_state(dist, state)
    step = sharded_step_fn(model, dist, 0.01)

    for _ in range(3):
        state = step(state)
    state = jax.block_until_ready(state)

    ckpt = OrbaxCheckpointer(dirname=str(tmp_path / "orbax"))

    class _Sim:
        pass

    sim = _Sim()
    sim.state = state
    ckpt.write(sim)

    # keep stepping the original
    s_cont = state
    for _ in range(3):
        s_cont = step(s_cont)
    s_cont = jax.block_until_ready(s_cont)

    # restore into a sharded template and continue
    template = shard_state(dist, model.initial_state())
    s_rest = ckpt.restore(template)
    # shardings survive the round trip
    assert s_rest.u.sharding.is_equivalent_to(state.u.sharding,
                                              s_rest.u.ndim)
    np.testing.assert_array_equal(np.asarray(s_rest.u),
                                  np.asarray(state.u))
    for _ in range(3):
        s_rest = step(s_rest)
    s_rest = jax.block_until_ready(s_rest)

    # bitwise-identical continuation (incl. AB2 tendency history)
    np.testing.assert_array_equal(np.asarray(s_cont.u),
                                  np.asarray(s_rest.u))
    np.testing.assert_array_equal(np.asarray(s_cont.w),
                                  np.asarray(s_rest.w))
    assert int(s_rest.clock.iteration) == 6

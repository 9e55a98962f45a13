import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from oceananigans_tpu import RectilinearGrid, Periodic, Bounded
from oceananigans_tpu.solvers.matmul_poisson import MatmulPoissonSolver

N = 256
grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                       topology=(Bounded, Periodic, Periodic),
                       halo=(1, 0, 0), dtype="float32")
xs = (np.arange(N) + 0.5) / N
X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
rhs_np = (np.cos(np.pi*4*X)*np.sin(2*np.pi*3*Y)
          + 0.3*np.sin(2*np.pi*7*Y)*np.sin(2*np.pi*5*Z)).astype(np.float32)
rhs = jnp.asarray(rhs_np)
solver = MatmulPoissonSolver(grid)

def make_solve(prec):
    def apply_p(x, axis, transpose):
        T = solver.T[axis]
        if T is None:
            return x
        M = (T.T if transpose else T).astype(np.dtype(x.dtype))
        sub = "ai,ijk->ajk" if axis == 0 else (
            "aj,ijk->iak" if axis == 1 else "ak,ijk->ija")
        return jnp.einsum(sub, M, x, precision=prec)
    def solve(r):
        x = r
        for a in range(3):
            x = apply_p(x, a, False)
        x = x * solver.inv_lam.astype(x.dtype)
        for a in range(3):
            x = apply_p(x, a, True)
        return x
    return solve

import sys
which = sys.argv[1]
prec = {"hi": lax.Precision.HIGHEST, "h": lax.Precision.HIGH,
        "d": lax.Precision.DEFAULT}[which]
solve = make_solve(prec)
f = jax.jit(lambda r: jax.lax.fori_loop(
    0, 10, lambda i, x: solve(jnp.roll(x, 1, 0)), r).sum())
t0 = time.time(); float(f(rhs))
print(f"compile {time.time()-t0:.0f}s", flush=True)
best = 1e9
for k in range(3):
    t0 = time.perf_counter(); float(f(rhs*(1+k*1e-6)))
    best = min(best, (time.perf_counter()-t0)/10)
phi = np.asarray(jax.jit(solve)(rhs), np.float64)
np.save(f"/tmp/prec_{which}.npy", phi)
print(f"{which}: {best*1e3:.2f} ms", flush=True)

"""Preconditioned conjugate gradient on arrays (any pytree of arrays).

Reference: ``src/Solvers/conjugate_gradient_solver.jl:9,160``. Global dot
products are ``jnp.sum``; under the sharded path they lower to ``psum`` over
the mesh automatically. Fixed-iteration + tolerance early-exit via
``lax.while_loop`` keeps the whole solve inside one jitted computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dot(x, y):
    leaves_x = jax.tree_util.tree_leaves(x)
    leaves_y = jax.tree_util.tree_leaves(y)
    return sum(jnp.sum(a * b) for a, b in zip(leaves_x, leaves_y))


def conjugate_gradient(A, b, x0, *, preconditioner=None, maxiter=100,
                       reltol=1e-7, abstol=0.0, dot=None):
    """Solve ``A(x) = b`` for SPD linear operator ``A`` (a function).

    ``dot`` overrides the inner product — inside an explicit-halo
    ``shard_map`` pass a psum-reduced dot so the Krylov scalars are
    GLOBAL (the default ``jnp.sum`` would be per-shard there).

    Returns ``(x, iterations, residual_norm)``.
    """
    if preconditioner is None:
        preconditioner = lambda r: r
    _dot = globals()["_dot"] if dot is None else dot

    r0 = jax.tree_util.tree_map(lambda bi, Ai: bi - Ai, b, A(x0))
    z0 = preconditioner(r0)
    rz0 = _dot(r0, z0)
    bnorm = jnp.sqrt(_dot(b, b))
    tol2 = jnp.maximum(reltol * bnorm, abstol) ** 2

    def cond(carry):
        _, r, _, _, it, _ = carry
        return jnp.logical_and(it < maxiter, _dot(r, r) > tol2)

    def body(carry):
        x, r, p, rz, it, _ = carry
        Ap = A(p)
        # breakdown-safe divisions: once the Krylov process stalls at
        # the dtype's precision floor (p·Ap or rz underflow — routine in
        # float32), take a zero step instead of producing inf/NaN
        pAp = _dot(p, Ap)
        alpha = jnp.where(pAp != 0, rz / jnp.where(pAp == 0, 1.0, pAp),
                          0.0)
        x = jax.tree_util.tree_map(lambda xi, pi: xi + alpha * pi, x, p)
        r = jax.tree_util.tree_map(lambda ri, Api: ri - alpha * Api, r, Ap)
        z = preconditioner(r)
        rz_new = _dot(r, z)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz == 0, 1.0, rz),
                         0.0)
        p = jax.tree_util.tree_map(lambda zi, pi: zi + beta * pi, z, p)
        return (x, r, p, rz_new, it + 1, jnp.sqrt(_dot(r, r)))

    init = (x0, r0, z0, rz0, jnp.zeros((), jnp.int32), jnp.sqrt(_dot(r0, r0)))
    x, r, _, _, it, res = jax.lax.while_loop(cond, body, init)
    return x, it, jnp.sqrt(_dot(r, r))

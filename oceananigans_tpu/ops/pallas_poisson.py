"""Fused middle stage of the eigenbasis-matmul Poisson solve.

The MatmulPoissonSolver (``solvers/matmul_poisson.py``) runs six einsums
plus an eigenvalue scale; each einsum is a full HBM round trip, so the
solve is bandwidth-bound even though the matmuls barely load the MXU.
This kernel fuses the four MIDDLE stages — forward y-transform, forward
z-transform, eigenvalue scale, inverse z, inverse y — into ONE pass:
each program streams a (TI, Ny, Nz) x-slab into VMEM, runs four
(N×N)·(N×N) MXU matmuls per x-plane (contractions over the sublane/lane
axes are the natural matmul orientations; only the x-axis contraction
needs the full extent, which stays outside as two einsums), applies the
1/λ scale from three 1-D eigenvalue vectors broadcast in-VMEM (the 3-D
inverse-eigenvalue array never touches HBM), and writes the slab back.
HBM traffic for the middle of the solve drops 5× (one read + one write
instead of four round trips plus the λ⁻¹ read).

Reference capability: ``fft_based_poisson_solver.jl`` (eigenfunction
Poisson solve); the fusion itself has no reference analog — cuFFT plans
are already fused internally, this is the TPU-native equivalent.
"""

from __future__ import annotations

from functools import partial

import jax

from oceananigans_tpu.config import config as _config
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_middle_solve", "fused_middle_available"]

_HI = lax.Precision.HIGHEST


def fused_middle_available(solver, dtype) -> bool:
    """True when the fused kernel can replace the middle four einsums:
    three non-flat transform axes, float32 data (TPU matmul path), and a
    non-CPU backend (the einsum path stays for CPU / x64 runs)."""
    if jax.default_backend() == "cpu":
        return False
    if np.dtype(dtype) != np.float32:
        return False
    return all(T is not None for T in solver.T)


def _kernel(lamx_ref, x_ref, ey_ref, ez_ref, lyz_ref, out_ref, *, TI):
    Ey = ey_ref[:]
    Ez = ez_ref[:]
    lyz = lyz_ref[:]
    dt = x_ref.dtype
    # lamx is the FULL vector in SMEM (TPU rank-1 blocks must cover the
    # array or tile by 128); index it by program id.
    base = pl.program_id(0) * TI
    for ii in range(TI):
        M = x_ref[ii]                                       # (Ny, Nz)
        # forward y: contract j (major axis of the plane)
        Yf = jnp.dot(Ey, M, precision=_HI, preferred_element_type=dt)
        # forward z: contract k (lane axis) with Ez rows
        Zf = lax.dot_general(Yf, Ez, (((1,), (1,)), ((), ())),
                             precision=_HI, preferred_element_type=dt)
        # eigenvalue scale; λ sums to exactly 0 only at the (0,0,0) mode,
        # which the solver zeroes (zero-mean gauge)
        ls = lamx_ref[base + ii] + lyz
        inv = jnp.where(ls == 0.0, 0.0,
                        1.0 / jnp.where(ls == 0.0, 1.0, ls))
        Zs = Zf * inv
        # inverse z: Zs[b, z'] Ez[z', k] -> (b, k)
        Z2 = jnp.dot(Zs, Ez, precision=_HI, preferred_element_type=dt)
        # inverse y: sum_b Ey[b, j] Z2[b, k] -> (j, k)
        out_ref[ii] = lax.dot_general(Ey, Z2, (((0,), (0,)), ((), ())),
                                      precision=_HI,
                                      preferred_element_type=dt)


def fused_middle_solve(x, Ey, Ez, lamx, lamy, lamz, tile_i=8,
                       interpret=False):
    """Apply (Ey ⊗ Ez)ᵀ diag(λ⁻¹) (Ey ⊗ Ez) per x-plane of ``x``.

    ``x`` is the x-transformed RHS, shape (Nx, Ny, Nz); ``Ey``/``Ez`` are
    the orthonormal basis-row matrices; ``lam*`` the per-axis 1-D
    eigenvalue arrays (numpy). Returns the scaled spectral array still in
    x-spectral space (caller applies the inverse x-transform).
    """
    Nx, Ny, Nz = x.shape
    TI = tile_i
    while TI > 1 and Nx % TI:
        TI //= 2
    dt = x.dtype
    lamx_a = jnp.asarray(np.asarray(lamx, np.float32), dt)
    lyz = jnp.asarray(np.asarray(lamy, np.float64)[:, None]
                      + np.asarray(lamz, np.float64)[None, :], dt)
    Ey_a = jnp.asarray(np.asarray(Ey), dt)
    Ez_a = jnp.asarray(np.asarray(Ez), dt)

    kern = partial(_kernel, TI=TI)
    return pl.pallas_call(
        kern,
        grid=(Nx // TI,),
        in_specs=[
            pl.BlockSpec((Nx,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TI, Ny, Nz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, Ny), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nz, Nz), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ny, Nz), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TI, Ny, Nz), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nx, Ny, Nz), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(lamx_a, x, Ey_a, Ez_a, lyz)

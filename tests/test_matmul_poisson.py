"""MXU eigenbasis-matmul Poisson solver (TPU-default path): must agree
with the FFT solver to machine precision on every topology mix."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import Bounded, Flat, Periodic, RectilinearGrid
from oceananigans_tpu.solvers.fft_poisson import FFTPoissonSolver
from oceananigans_tpu.solvers.matmul_poisson import MatmulPoissonSolver


def _check(topology, size):
    kw = {}
    if topology[1] != Flat:
        kw["y"] = (0.0, 0.7)
    grid = RectilinearGrid(size=size, x=(0.0, 1.0), z=(0.0, 0.5),
                           topology=topology, halo=1, **kw)
    rhs = np.random.default_rng(1).standard_normal(
        tuple(grid.N[a] for a in range(3)))
    rhs -= rhs.mean()
    a = np.asarray(FFTPoissonSolver(grid).solve(jnp.asarray(rhs)))
    b = np.asarray(MatmulPoissonSolver(grid).solve(jnp.asarray(rhs)))
    a = a - a.mean()
    b = b - b.mean()
    assert np.abs(a - b).max() < 1e-13 * max(1.0, np.abs(a).max() * 100)


def test_matmul_poisson_ppb():
    _check((Periodic, Periodic, Bounded), (16, 12, 8))


def test_matmul_poisson_pbb():
    _check((Periodic, Bounded, Bounded), (16, 12, 8))


def test_matmul_poisson_all_periodic():
    _check((Periodic, Periodic, Periodic), (16, 12, 8))


def test_matmul_poisson_2d():
    _check((Bounded, Flat, Bounded), (16, 8))


def test_fused_middle_matches_einsum_path():
    """The fused Pallas middle stage (y/z transforms + λ⁻¹ scale in one
    VMEM pass, ``ops/pallas_poisson.py``) equals the six-einsum path in
    interpret mode, including a tile-size-fallback shape."""
    import jax

    for size in ((32, 16, 128), (24, 16, 128)):
        grid = RectilinearGrid(size=size, extent=(1.0, 2.0, 3.0),
                               topology=(Bounded, Periodic, Periodic),
                               halo=(1, 0, 0), dtype="float32")
        s = MatmulPoissonSolver(grid)
        rng = np.random.default_rng(3)
        rhs = jnp.asarray(rng.standard_normal(size).astype(np.float32))
        rhs = rhs - jnp.mean(rhs)
        s.fused = False
        ref = jax.jit(s.solve)(rhs)
        s.fused = "interpret"
        got = jax.jit(s.solve)(rhs)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 1e-5, (size, err)


def test_matmul_poisson_single_mode_exact():
    """A discrete Laplacian eigenmode solves exactly: φ = rhs/λ."""
    N = 32
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded),
                           halo=(0, 0, 1))
    xs = (np.arange(N) + 0.5) / N
    X, _, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    d = 1.0 / N
    mode = np.sin(2 * np.pi * 3 * X) * np.cos(np.pi * 4 * Z)
    lam = -(2 / d ** 2) * ((1 - np.cos(2 * np.pi * 3 / N))
                           + (1 - np.cos(np.pi * 4 / N)))
    phi = np.asarray(MatmulPoissonSolver(grid).solve(jnp.asarray(mode)))
    np.testing.assert_allclose(phi, mode / lam, atol=1e-11)

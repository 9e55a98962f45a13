"""Solver tests (reference test/test_poisson_solvers.jl,
test_batched_tridiagonal_solver.jl): verify by applying the discrete
operator to the solution and comparing with the RHS."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    RectilinearGrid, Periodic, Bounded, Flat, fill_halo_regions,
)
from oceananigans_tpu.fields import LOC_C, with_interior, new_field
from oceananigans_tpu.ops import operators as op
from oceananigans_tpu.solvers import (
    FFTPoissonSolver, FourierTridiagonalPoissonSolver,
    conjugate_gradient, dct2, idct2, tridiagonal_solve,
)


def test_dct_roundtrip_and_matrix():
    rng = np.random.default_rng(0)
    for N in (8, 15, 16):
        x = jnp.asarray(rng.standard_normal((3, N, 2)))
        X = dct2(x, axis=1)
        # explicit O(N^2) DCT-II
        n = np.arange(N)
        M = 2 * np.cos(np.pi * np.outer(np.arange(N), 2 * n + 1) / (2 * N))
        expect = np.einsum("kn,ano->ako", M, np.asarray(x))
        assert np.allclose(np.asarray(X), expect, atol=1e-10)
        assert np.allclose(np.asarray(idct2(X, axis=1)), np.asarray(x),
                           atol=1e-12)


def test_tridiagonal_solve_random():
    rng = np.random.default_rng(1)
    n = 17
    batch = (4, 3)
    a = rng.standard_normal((*batch, n)) * 0.1
    c = rng.standard_normal((*batch, n)) * 0.1
    b = 2.0 + rng.random((*batch, n))  # diagonally dominant
    x_true = rng.standard_normal((*batch, n))
    d = b * x_true
    d[..., 1:] += a[..., 1:] * x_true[..., :-1]
    d[..., :-1] += c[..., :-1] * x_true[..., 1:]
    x = tridiagonal_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                          jnp.asarray(d), axis=-1)
    assert np.allclose(np.asarray(x), x_true, atol=1e-10)


def _laplacian_residual(grid, phi_int, rhs_int):
    """max |∇²φ − rhs| over the interior, using the model operators."""
    phi = with_interior(grid, new_field(grid), phi_int)
    phi = fill_halo_regions(phi, grid, loc=LOC_C)
    lap = op.laplacian_ccc(grid, phi)
    return float(jnp.max(jnp.abs(grid.interior(lap) - rhs_int)))


def _random_zero_mean_rhs(grid, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.standard_normal(tuple(grid.N))
    return jnp.asarray(r - r.mean())


@pytest.mark.parametrize("topo", [
    (Periodic, Periodic, Periodic),
    (Periodic, Periodic, Bounded),
    (Periodic, Bounded, Bounded),
    (Bounded, Bounded, Bounded),
])
def test_fft_poisson_solver_3d(topo):
    grid = RectilinearGrid(size=(16, 8, 12), extent=(1.0, 0.7, 2.0),
                           topology=topo)
    solver = FFTPoissonSolver(grid)
    rhs = _random_zero_mean_rhs(grid)
    phi = solver.solve(rhs)
    assert _laplacian_residual(grid, phi, rhs) < 1e-9
    # zero-mean gauge
    assert abs(float(jnp.mean(phi))) < 1e-10


def test_fft_poisson_solver_2d():
    grid = RectilinearGrid(size=(32, 32), extent=(1.0, 1.0),
                           topology=(Periodic, Bounded, Flat))
    solver = FFTPoissonSolver(grid)
    rhs = _random_zero_mean_rhs(grid, 3)
    phi = solver.solve(rhs)
    assert _laplacian_residual(grid, phi, rhs) < 1e-9


@pytest.mark.parametrize("topo_h", [
    (Periodic, Periodic),
    (Periodic, Bounded),
    (Bounded, Bounded),
])
def test_fourier_tridiagonal_on_stretched_z(topo_h):
    N = 16
    zfaces = -np.cos(np.linspace(0, np.pi / 2, N + 1))  # clustered near z=0
    grid = RectilinearGrid(size=(8, 8, N), x=(0, 1), y=(0, 1), z=zfaces,
                           topology=(*topo_h, Bounded))
    assert not grid.z_regular
    solver = FourierTridiagonalPoissonSolver(grid)
    # compatibility on a stretched grid is volume-weighted (like the real
    # projection RHS, which satisfies the discrete divergence theorem)
    rng = np.random.default_rng(4)
    r = rng.standard_normal(tuple(grid.N))
    dz = np.asarray(grid.dz()).ravel()[grid.Hz:grid.Hz + N]
    r -= (r * dz).sum() / (dz.sum() * grid.Nx * grid.Ny)
    rhs = jnp.asarray(r)
    phi = solver.solve(rhs)
    assert _laplacian_residual(grid, phi, rhs) < 1e-8


def test_fourier_tridiagonal_matches_fft_on_regular_grid():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1))
    rhs = _random_zero_mean_rhs(grid, 5)
    p1 = FFTPoissonSolver(grid).solve(rhs)
    p2 = FourierTridiagonalPoissonSolver(grid).solve(rhs)
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-9)


def test_conjugate_gradient_poisson():
    grid = RectilinearGrid(size=(16, 16), extent=(1, 1),
                           topology=(Periodic, Periodic, Flat))

    def A(phi_int):
        phi = with_interior(grid, new_field(grid), phi_int)
        phi = fill_halo_regions(phi, grid, loc=LOC_C)
        return -grid.interior(op.laplacian_ccc(grid, phi))

    rhs = -_random_zero_mean_rhs(grid, 6)
    x0 = jnp.zeros(tuple(grid.N))
    x, it, res = conjugate_gradient(A, rhs, x0, maxiter=500, reltol=1e-10)
    assert float(res) < 1e-8 * float(jnp.linalg.norm(rhs.ravel()))
    # compare against the FFT solve
    fft_phi = FFTPoissonSolver(grid).solve(-rhs)
    x = x - jnp.mean(x)
    assert np.allclose(np.asarray(x), np.asarray(fft_phi), atol=1e-6)

"""Heptadiagonal stencil-matrix solver + MatrixImplicitFreeSurface
(reference ``heptadiagonal_iterative_solver.jl:12``,
``matrix_implicit_free_surface_solver.jl:18``)."""

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, LatitudeLongitudeGrid, Periodic, RectilinearGrid,
)
from oceananigans_tpu.models import HydrostaticFreeSurfaceModel
from oceananigans_tpu.models.hydrostatic import ImplicitFreeSurface
from oceananigans_tpu.solvers.matrix_solver import (
    HeptadiagonalIterativeSolver, StencilMatrix,
)


def test_stencil_matrix_poisson_1d():
    """A(x) with uniform conductance reproduces the discrete Laplacian,
    and CG recovers a known solution."""
    n = 32
    ax = jnp.ones((n, 1, 1))
    A = StencilMatrix(ax=ax, extra=-0.1, periodic=(True, False, False))
    x = jnp.asarray(
        np.sin(2 * np.pi * np.arange(n) / n)).reshape(n, 1, 1)
    b = A(x)
    solver = HeptadiagonalIterativeSolver(A, maxiter=200, reltol=1e-13)
    x2, it, res = solver.solve(b)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-10)


def _run(method, grid):
    model = HydrostaticFreeSurfaceModel(
        grid=grid,
        free_surface=ImplicitFreeSurface(solver_method=method,
                                         maxiter=500, reltol=1e-12))
    state = model.initial_state(
        eta=lambda x, y: 0.1 * np.sin(2 * np.pi * x / 1e5)
        * np.cos(np.pi * y / 5e4))
    step = jax.jit(lambda s: model.step(s, 50.0))
    s = state
    for _ in range(10):
        s = step(s)
    return np.asarray(jax.block_until_ready(s).eta)


def test_matrix_free_surface_matches_fft_and_cg():
    grid = RectilinearGrid(size=(32, 16, 4), x=(0, 1e5), y=(0, 5e4),
                           z=(-100, 0),
                           topology=(Periodic, Bounded, Bounded), halo=3)
    e_fft = _run("fft", grid)
    e_mx = _run("matrix", grid)
    assert np.abs(e_mx - e_fft).max() < 1e-12


def test_matrix_free_surface_latlon():
    grid = LatitudeLongitudeGrid(size=(32, 16, 4), longitude=(0, 30),
                                 latitude=(10, 40), z=(-500, 0), halo=3)
    e_cg = _run("cg", grid)
    e_mx = _run("matrix", grid)
    assert np.abs(e_mx - e_cg).max() < 1e-13


def test_spai_preconditioner_reduces_iterations():
    """The Neumann-polynomial stencil approximate inverse (reference
    SPAI option, sparse_approximate_inverse.jl) must converge in fewer
    CG iterations than Jacobi on an anisotropic conductance problem."""
    import numpy as np
    rng = np.random.default_rng(3)
    nx, ny = 48, 48
    ax = jnp.asarray(1.0 + 0.5 * rng.random((nx, ny, 1)))
    ay = 30.0 * jnp.asarray(1.0 + 0.5 * rng.random((nx, ny, 1)))
    A = StencilMatrix(ax=ax, ay=ay, extra=-0.3,
                      periodic=(True, True, False))
    b = jnp.asarray(rng.standard_normal((nx, ny, 1)))
    x_j, it_j, res_j = HeptadiagonalIterativeSolver(
        A, maxiter=500, reltol=1e-10).solve(b)
    x_s, it_s, res_s = HeptadiagonalIterativeSolver(
        A, maxiter=500, reltol=1e-10, preconditioner="spai").solve(b)
    # both converge to the same solution
    np.testing.assert_allclose(np.asarray(A(x_s)), np.asarray(b),
                               atol=1e-6 * float(jnp.abs(b).max()))
    assert int(it_s) < int(it_j), (int(it_s), int(it_j))

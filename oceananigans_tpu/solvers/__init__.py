from oceananigans_tpu.solvers.transforms import dct2, idct2
from oceananigans_tpu.solvers.tridiagonal import tridiagonal_solve
from oceananigans_tpu.solvers.fft_poisson import (
    FFTPoissonSolver, poisson_eigenvalues,
)
from oceananigans_tpu.solvers.fourier_tridiagonal import (
    FourierTridiagonalPoissonSolver,
)
from oceananigans_tpu.solvers.conjugate_gradient import conjugate_gradient
from oceananigans_tpu.solvers.pressure_solver import make_pressure_solver

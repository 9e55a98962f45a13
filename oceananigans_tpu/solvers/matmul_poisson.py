"""Poisson solver with transforms as MXU matmuls.

Reference capability: ``fft_based_poisson_solver.jl`` (same separable
eigenfunction method). TPU-native twist: XLA's TPU FFT is far from the
hardware roofline, but a length-N transform is just an N×N matrix — and
the MXU multiplies 256×256 matrices at petaflop-class rates. Each axis
is transformed by an ORTHONORMAL real basis of 1-D Laplacian
eigenvectors (DCT-II for Bounded/Neumann axes, the real Fourier
cos/sin basis for Periodic axes), so the inverse transform is the
transpose and everything stays real: the whole solve is six einsums and
one elementwise multiply. ~4x faster than the XLA FFT path at 256³ on
one v5e chip.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from oceananigans_tpu.grids.base import Bounded, Connected, Flat, Periodic

__all__ = ["MatmulPoissonSolver"]


def _bounded_basis(N, d):
    """Orthonormal DCT-II rows T[k, i] and the staggered-grid Laplacian
    eigenvalues (Neumann): λ_k = -(2/d²)(1 - cos(πk/N))."""
    i = np.arange(N)
    k = np.arange(N)[:, None]
    T = np.cos(np.pi * (i[None, :] + 0.5) * k / N) * np.sqrt(2.0 / N)
    T[0] /= np.sqrt(2.0)
    lam = -(2.0 / d ** 2) * (1.0 - np.cos(np.pi * np.arange(N) / N))
    return T, lam


def _periodic_basis(N, d):
    """Orthonormal real-Fourier rows (const, cos k, sin k, Nyquist) and
    the periodic staggered Laplacian eigenvalues
    λ = -(2/d²)(1 - cos(2πk/N)) (cos and sin rows share λ_k)."""
    i = np.arange(N)
    rows = [np.full(N, 1.0 / np.sqrt(N))]
    lam = [0.0]

    def lam_k(k):
        return -(2.0 / d ** 2) * (1.0 - np.cos(2.0 * np.pi * k / N))

    for k in range(1, N // 2):
        rows.append(np.sqrt(2.0 / N) * np.cos(2 * np.pi * k * i / N))
        lam.append(lam_k(k))
        rows.append(np.sqrt(2.0 / N) * np.sin(2 * np.pi * k * i / N))
        lam.append(lam_k(k))
    if N % 2 == 0 and N > 1:
        rows.append(np.cos(np.pi * i) / np.sqrt(N))
        lam.append(lam_k(N // 2))
    return np.stack(rows), np.asarray(lam)


class MatmulPoissonSolver:
    """∇²φ = rhs on a fully regular grid via per-axis orthonormal
    eigenbasis matmuls; operates on interior-shaped arrays (drop-in for
    ``FFTPoissonSolver``)."""

    def __init__(self, grid):
        if not grid.regular:
            raise ValueError("MatmulPoissonSolver requires regular "
                             "spacings on every axis")
        self.grid = grid
        self.T = []       # per-axis (N, N) numpy transform or None (Flat)
        lams = []
        for axis in range(3):
            topo = grid.axis_topo(axis)
            N = grid.N[axis]
            if topo == Flat or N == 1:
                self.T.append(None)
                lams.append(np.zeros((1,)))
                continue
            d = (grid.Lx / grid.Nx, grid.Ly / grid.Ny,
                 grid.Lz / grid.Nz)[axis]
            if topo in (Periodic, Connected):
                T, lam = _periodic_basis(N, d)
            elif topo == Bounded:
                T, lam = _bounded_basis(N, d)
            else:
                raise ValueError(f"unsupported topology {topo}")
            self.T.append(T)
            lams.append(lam)
        shape = lambda a, n: [(1, 1, 1)[:a] + (n,) + (1, 1)[a:]][0]
        lam_sum = sum(l.reshape([n if i == a else 1
                                 for i, n in enumerate((len(lams[0]),
                                                        len(lams[1]),
                                                        len(lams[2])))])
                      for a, l in enumerate(lams))
        self.inv_lam = np.where(lam_sum == 0, 0.0,
                                1.0 / np.where(lam_sum == 0, 1.0, lam_sum))
        self.lams = lams
        #: False (six XLA einsums), True/"auto" (fused Pallas middle
        #: stage), or "interpret". Default False: measured on a real v5e
        #: (round 3), XLA pipelines the einsum chain as well as the hand
        #: kernel (8.40 vs 8.40 ms full step at 256³), so the simpler
        #: path wins; the kernel is kept for configs where einsum fusion
        #: regresses.
        self.fused = False
        #: matmul precision: "auto" = 3-pass bf16 (HIGH) for float32 —
        #: measured identical projection residual to HIGHEST at f32
        #: (max|div| 1.75e-7 both, 50 steps @256³) for ~0.7 ms/step less
        #: MXU time — and HIGHEST for float64/x64 parity runs.
        self.precision = "auto"

    def _precision(self, dtype):
        if self.precision != "auto":
            return self.precision
        return (lax.Precision.HIGH if np.dtype(dtype) == np.float32
                else lax.Precision.HIGHEST)

    def _apply(self, x, axis, transpose):
        T = self.T[axis]
        if T is None:
            return x
        M = T.T if transpose else T
        M = M.astype(np.dtype(x.dtype))
        sub = "ai,ijk->ajk" if axis == 0 else (
            "aj,ijk->iak" if axis == 1 else "ak,ijk->ija")
        return jnp.einsum(sub, M, x, precision=self._precision(x.dtype))

    def solve(self, rhs):
        """rhs: interior-shaped (Nx, Ny, Nz) -> φ with zero mean."""
        from oceananigans_tpu.ops.pallas_poisson import (
            fused_middle_available, fused_middle_solve,
        )
        use_fused = (fused_middle_available(self, rhs.dtype)
                     if self.fused == "auto" else bool(self.fused))
        if use_fused:
            # one Pallas pass for y/z transforms + λ⁻¹ scale: 5 HBM round
            # trips -> 1 (the x-axis contraction needs the full extent,
            # so it stays outside as two einsums)
            x = self._apply(rhs, 0, transpose=False)
            x = fused_middle_solve(x, self.T[1], self.T[2], self.lams[0],
                                   self.lams[1], self.lams[2],
                                   interpret=(self.fused == "interpret"))
            return self._apply(x, 0, transpose=True)
        x = rhs
        for axis in range(3):
            x = self._apply(x, axis, transpose=False)
        x = x * self.inv_lam.astype(x.dtype)
        for axis in range(3):
            x = self._apply(x, axis, transpose=True)
        return x


class MatmulHorizontalBasis:
    """2-D horizontal eigen-transform via matmul bases, for the implicit
    free-surface Helmholtz solve on TPU (the composed dct/fft chain
    miscomputes there; see MatmulPoissonSolver note)."""

    def __init__(self, grid):
        self.T = []
        lams = []
        for axis in (0, 1):
            topo = grid.axis_topo(axis)
            N = grid.N[axis]
            if topo == Flat or N == 1:
                self.T.append(None)
                lams.append(np.zeros(max(N, 1)))
                continue
            d = (grid.Lx / grid.Nx, grid.Ly / grid.Ny)[axis]
            if topo in (Periodic, Connected):
                T, lam = _periodic_basis(N, d)
            elif topo == Bounded:
                T, lam = _bounded_basis(N, d)
            else:
                raise ValueError(f"unsupported topology {topo}")
            self.T.append(T)
            lams.append(lam)
        #: (Nx, Ny, 1) eigenvalues of the horizontal Laplacian
        self.lam2d = (lams[0][:, None, None] + lams[1][None, :, None])
        self.precision = "auto"

    def _precision(self, dtype):
        if self.precision != "auto":
            return self.precision
        return (lax.Precision.HIGH if np.dtype(dtype) == np.float32
                else lax.Precision.HIGHEST)

    def _apply(self, x, axis, transpose):
        T = self.T[axis]
        if T is None:
            return x
        M = (T.T if transpose else T).astype(np.dtype(x.dtype))
        sub = "ai,ijk->ajk" if axis == 0 else "aj,ijk->iak"
        return jnp.einsum(sub, M, x, precision=self._precision(x.dtype))

    def forward(self, x):
        return self._apply(self._apply(x, 0, False), 1, False)

    def inverse(self, x):
        return self._apply(self._apply(x, 0, True), 1, True)

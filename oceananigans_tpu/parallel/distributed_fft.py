"""Distributed pencil-transpose FFT Poisson solver.

Reference: ``src/DistributedComputations/distributed_fft_based_poisson_
solver.jl:10-80`` — transform z, transpose z→y (pack → MPI.Alltoallv! →
unpack), transform y, transpose y→x, transform x, divide by eigenvalues,
reverse. TPU-native: the transposes are ``jax.lax.all_to_all`` collectives
inside ``shard_map`` over the (x, y) mesh — the Ulysses-style re-sharding
that rides the ICI torus; z stays local throughout the vertical (DCT)
transform, matching the reference's constraint
(``distributed_fft_based_poisson_solver.jl:49-51``).

The GSPMD path (jit the serial solver on sharded arrays and let XLA insert
the resharding) is the default in the models; this explicit version is the
hand-scheduled alternative for when the compiler's collective placement is
suboptimal, and the building block for future Pallas-fused transpose+FFT
stages.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from oceananigans_tpu.grids.base import Bounded, Flat, Periodic

__all__ = ["DistributedFFTPoissonSolver",
           "DistributedFourierTridiagonalSolver"]


class DistributedFFTPoissonSolver:
    """∇²φ = rhs on a fully-regular grid, rhs sharded P("x", "y", None).

    Per-axis ORTHONORMAL-BASIS MATMULS (the ``MatmulPoissonSolver``
    bases — real-Fourier rows on Periodic axes, DCT-II rows on Bounded
    ones) replace the fft/dct transforms: all-real arithmetic, correct
    on ANY topology mix (the earlier fft-only version silently used the
    wrong basis on Bounded x/y), no composed-FFT TPU miscompile risk,
    and the contractions ride the MXU.

    Layout dance (local shapes, mesh (px, py)):
        (Nx/px, Ny/py, Nz)  --Tz (local)-->  same
        --all_to_all "y" (split z, concat y)--> (Nx/px, Ny, Nz/py)
        --Ty--> --all_to_all "x" (split y, concat x)--> (Nx, Ny/px, Nz/py)
        --Tx--> eigen-divide --> reverse everything.
    """

    def __init__(self, grid, mesh: Mesh):
        from oceananigans_tpu.solvers.matmul_poisson import (
            _bounded_basis, _periodic_basis,
        )
        if not grid.regular:
            raise ValueError("needs regular spacings on every axis")
        self.grid = grid
        self.mesh = mesh
        self.px = mesh.shape["x"]
        self.py = mesh.shape["y"]
        Nx, Ny, Nz = grid.N
        if Nx % self.px or Ny % self.py or Nz % self.py or Ny % self.px:
            raise ValueError(
                f"interior sizes {grid.N} must divide the pencil layouts "
                f"of mesh ({self.px}, {self.py})")
        self.topo = tuple(grid.axis_topo(ax) for ax in range(3))
        self.T = []
        lams = []
        for axis in range(3):
            topo = self.topo[axis]
            N = grid.N[axis]
            d = (grid.Lx / grid.Nx, grid.Ly / grid.Ny,
                 grid.Lz / grid.Nz)[axis] if topo != Flat else 1.0
            if topo == Flat or N == 1:
                self.T.append(None)
                lams.append(np.zeros((1,)))
            elif topo == Periodic:
                T, lam = _periodic_basis(N, d)
                self.T.append(T)
                lams.append(lam)
            elif topo == Bounded:
                T, lam = _bounded_basis(N, d)
                self.T.append(T)
                lams.append(lam)
            else:
                raise ValueError(f"unsupported topology {topo} on a "
                                 "distributed axis")
        self.lam_x, self.lam_y, self.lam_z = lams

    def local_solve(self, r):
        """The per-shard solve body: call INSIDE an existing
        ``shard_map`` over this mesh (e.g. as the preconditioner of a
        distributed CG). ``r`` is the shard's local interior block."""
        return self._local_solve(r)

    def solve(self, rhs):
        """rhs: GLOBAL interior-shaped array sharded (or shardable) over
        the mesh. Returns φ with zero mean, same sharding."""
        spec = P("x", "y", None)
        out = shard_map(self._local_solve, mesh=self.mesh, in_specs=spec,
                        out_specs=spec)(rhs)
        return out.astype(rhs.dtype)

    def _local_solve(self, r):
        px, py = self.px, self.py
        Nx, Ny, Nz = self.grid.N
        lam_x, lam_y, lam_z = self.lam_x, self.lam_y, self.lam_z
        Tx, Ty, Tz = self.T

        def apply_T(a, T, axis, transpose):
            if T is None:
                return a
            M = T.T if transpose else T
            M = M.astype(np.dtype(a.dtype))
            sub = ("ai,ijk->ajk", "aj,ijk->iak", "ak,ijk->ija")[axis]
            return jnp.einsum(sub, M, a,
                              precision=jax.lax.Precision.HIGHEST)

        # --- forward z (local) ---
        r = apply_T(r, Tz, 2, transpose=False)
        # --- z -> y transpose over the 'y' mesh axis ---
        if py > 1:
            r = jax.lax.all_to_all(r, "y", split_axis=2, concat_axis=1,
                                   tiled=True)
        r = apply_T(r, Ty, 1, transpose=False)
        # --- y -> x transpose over the 'x' mesh axis ---
        if px > 1:
            r = jax.lax.all_to_all(r, "x", split_axis=1, concat_axis=0,
                                   tiled=True)
        r = apply_T(r, Tx, 0, transpose=False)

        # --- eigenvalue division in (Nx, Ny/px, Nz/py) layout ---
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        ny_l = Ny // px
        nz_l = Nz // py
        # numpy tables sliced dynamically by the shard index (embedded
        # as literals — never trace-time device arrays)
        ly = jax.lax.dynamic_slice(lam_y, (ix * ny_l,), (ny_l,))
        lz = jax.lax.dynamic_slice(lam_z, (iy * nz_l,), (nz_l,))
        lam = (lam_x.reshape(-1, 1, 1)
               + ly.reshape(1, -1, 1) + lz.reshape(1, 1, -1))
        inv = jnp.where(lam == 0, 0.0, 1.0 / jnp.where(lam == 0, 1.0,
                                                       lam))
        r = r * inv.astype(r.dtype)

        # --- reverse ---
        r = apply_T(r, Tx, 0, transpose=True)
        if px > 1:
            r = jax.lax.all_to_all(r, "x", split_axis=0, concat_axis=1,
                                   tiled=True)
        r = apply_T(r, Ty, 1, transpose=True)
        if py > 1:
            r = jax.lax.all_to_all(r, "y", split_axis=1, concat_axis=2,
                                   tiled=True)
        r = apply_T(r, Tz, 2, transpose=True)
        return r


class DistributedFourierTridiagonalSolver:
    """∇²φ = rhs with STRETCHED z over an (x, y) mesh (reference
    ``src/DistributedComputations/distributed_fft_tridiagonal_solver.jl``):
    horizontal eigen-transforms via pencil ``all_to_all`` transposes that
    keep the FULL z column local, then the batched Thomas solve per
    horizontal mode, exactly like the serial
    :class:`~oceananigans_tpu.solvers.fourier_tridiagonal.FourierTridiagonalPoissonSolver`.

    The horizontal transforms are ORTHONORMAL-BASIS MATMULS (the
    ``MatmulPoissonSolver`` bases) rather than fft/dct: all-real
    arithmetic with no composed fft→dct chain (which miscompiles on the
    TPU backend — see ``solvers/matmul_poisson.py``), and the
    contractions ride the MXU.

    Layout dance (local shapes, mesh (px, py)):
        (Nx/px, Ny/py, Nz)
        --all_to_all "y" (split x, concat y)--> (Nx/(px·py), Ny, Nz)
        --transform y--> --undo-->
        --all_to_all "x" (split y, concat x)--> (Nx, Ny/(px·py), Nz)
        --transform x--> tridiagonal z --> reverse everything.
    Needs Nx/px divisible by py and Ny/py divisible by px.
    """

    def __init__(self, grid, mesh: Mesh):
        from oceananigans_tpu.solvers.fourier_tridiagonal import (
            FourierTridiagonalPoissonSolver,
        )
        from oceananigans_tpu.solvers.matmul_poisson import (
            _bounded_basis, _periodic_basis,
        )
        if not (grid.x_regular and grid.y_regular):
            raise ValueError("x and y must be regular")
        if grid.axis_topo(2) != Bounded:
            raise ValueError("z must be Bounded (stretched allowed)")
        self.grid = grid
        self.mesh = mesh
        self.px = mesh.shape["x"]
        self.py = mesh.shape["y"]
        Nx, Ny, Nz = grid.N
        if (Nx % self.px or Ny % self.py
                or (Nx // self.px) % max(self.py, 1)
                or (Ny // self.py) % max(self.px, 1)):
            raise ValueError(
                f"interior sizes {grid.N} must divide the pencil layouts "
                f"of mesh ({self.px}, {self.py})")
        # reuse the serial solver's vertical tridiagonal setup
        self._serial = FourierTridiagonalPoissonSolver(grid)
        self.T = []
        lams = []
        for axis in (0, 1):
            topo = grid.axis_topo(axis)
            N = grid.N[axis]
            d = (grid.Lx / grid.Nx, grid.Ly / grid.Ny)[axis] \
                if topo != Flat else 1.0
            if topo == Flat or N == 1:
                self.T.append(None)
                lams.append(np.zeros((1,)))
            elif topo == Periodic:
                T, lam = _periodic_basis(N, d)
                self.T.append(T)
                lams.append(lam)
            elif topo == Bounded:
                T, lam = _bounded_basis(N, d)
                self.T.append(T)
                lams.append(lam)
            else:
                raise ValueError(f"unsupported topology {topo}")
        self.lam_x, self.lam_y = lams

    def solve(self, rhs):
        from jax import lax as _lax

        mesh = self.mesh
        px, py = self.px, self.py
        Nx, Ny, Nz = self.grid.N
        lam_x, lam_y = self.lam_x, self.lam_y
        Tx, Ty = self.T
        az_t = self._serial.az
        cz_t = self._serial.cz
        dzc_t = self._serial.dzc
        from oceananigans_tpu.solvers.tridiagonal import tridiagonal_solve

        def apply_T(a, T, axis, transpose):
            if T is None:
                return a
            M = T.T if transpose else T
            M = M.astype(np.dtype(a.dtype))
            sub = "ai,ijk->ajk" if axis == 0 else "aj,ijk->iak"
            return jnp.einsum(sub, M, a,
                              precision=jax.lax.Precision.HIGHEST)

        spec = P("x", "y", None)

        @partial(shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
        def _solve(r):
            rdt = r.dtype
            # --- y transform with full y locally (z untouched) ---
            if py > 1:
                r = jax.lax.all_to_all(r, "y", split_axis=0, concat_axis=1,
                                       tiled=True)
            r = apply_T(r, Ty, 1, transpose=False)
            if py > 1:
                r = jax.lax.all_to_all(r, "y", split_axis=1, concat_axis=0,
                                       tiled=True)
            # --- x transform with full x locally ---
            if px > 1:
                r = jax.lax.all_to_all(r, "x", split_axis=1, concat_axis=0,
                                       tiled=True)
            r = apply_T(r, Tx, 0, transpose=False)

            # --- tridiagonal solve along the LOCAL full-z columns ---
            ix = jax.lax.axis_index("x")
            iy = jax.lax.axis_index("y")
            ny_l = Ny // py
            ny_ll = ny_l // px if px > 1 else ny_l
            off_y = iy * ny_l + ix * ny_ll
            ly = jax.lax.dynamic_slice(lam_y, (off_y,), (ny_ll,))
            lam_h = (lam_x.reshape(-1, 1, 1)
                     + ly.reshape(1, -1, 1)).astype(r.dtype)
            zero = r[:1, :1, :1] * 0
            az = zero + az_t.astype(zero.dtype)
            cz = zero + cz_t.astype(zero.dtype)
            dzc = zero + dzc_t.astype(zero.dtype)
            b = -(az + cz) + lam_h * dzc
            singular_col = lam_h == 0
            col_mean = (jnp.sum(r * dzc, axis=2, keepdims=True)
                        / jnp.sum(dzc))
            r = jnp.where(singular_col, r - col_mean, r)
            d = r * dzc
            k0 = jnp.arange(Nz).reshape(1, 1, Nz) == 0
            b = jnp.where(singular_col & k0, 1.0, b)
            czs = jnp.where(singular_col & k0, 0.0, cz)
            d = jnp.where(singular_col & k0, 0.0, d)
            phi = tridiagonal_solve(az, b, czs, d, axis=2)

            # --- reverse (mirror the forward transposes) ---
            phi = apply_T(phi, Tx, 0, transpose=True)
            if px > 1:
                phi = jax.lax.all_to_all(phi, "x", split_axis=0,
                                         concat_axis=1, tiled=True)
            if py > 1:
                phi = jax.lax.all_to_all(phi, "y", split_axis=0,
                                         concat_axis=1, tiled=True)
            phi = apply_T(phi, Ty, 1, transpose=True)
            if py > 1:
                phi = jax.lax.all_to_all(phi, "y", split_axis=1,
                                         concat_axis=0, tiled=True)
            # remove the volume mean (gauge), globally via psum
            w = dzc / jnp.sum(dzc)
            local = jnp.sum(jnp.mean(phi, axis=(0, 1), keepdims=True) * w)
            gmean = jax.lax.pmean(jax.lax.pmean(local, "x"), "y")
            return (phi - gmean).astype(rdt)

        return _solve(rhs)

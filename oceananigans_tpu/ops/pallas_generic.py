"""Generic Pallas wrapper: run ANY whole-array advection tendency inside
an x-windowed TPU kernel.

The advection library (``advection.py``) is written as whole-array
expressions over ``shift``s, which trace equally well inside a Pallas
kernel body: axis-0 shifts become static window slices and axis-1/2
shifts lower to in-VMEM rolls. This wrapper DMAs (TX + 2H)-row slabs of
u, v, w into VMEM and evaluates the SAME ``div_vu/div_vv/div_vw`` code
on them — so every scheme (WENO included) gets a fused single-pass
variant for free, bitwise-identical to the XLA path (validated on-chip:
diff 0.0 at 256³ WENO-5).

Status: EXPERIMENTAL, off by default. Measured at 256³ WENO-5 on one
v5e: fused 25.0 ms vs 18.0 ms for the XLA path — Mosaic's generic roll
lowering plus the (TX+2H)/TX window read amplification currently lose
to XLA's fusion for high-order schemes. The Centered(2) production
kernel (``pallas_kernels.py``) remains the hand-scheduled fast path.
Kept as the substrate for a software-pipelined ring-buffer version.

Requirements: regular rectilinear grid; axis 0 halo >= scheme halo;
axes 1/2 periodic halo-free with tile-aligned extents (%8 / %128) or
halo >= scheme halo.
"""

from __future__ import annotations

from functools import partial

import jax

from oceananigans_tpu.config import config as _config
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_momentum_tendency"]


class _RegularMetricProxy:
    """Scalar metrics of a regular grid (window slabs can't carry the
    full-extent metric arrays)."""

    def __init__(self, g):
        self._dx = g.Lx / g.Nx if g.N[0] > 1 else 1.0
        self._dy = g.Ly / g.Ny if g.N[1] > 1 else 1.0
        self._dz = g.Lz / g.Nz if g.N[2] > 1 else 1.0

    def dx(self, *a):
        return self._dx

    def dy(self, *a):
        return self._dy

    def dz(self, *a):
        return self._dz

    def Ax(self, *a):
        return self._dy * self._dz

    def Ay(self, *a):
        return self._dx * self._dz

    def Az(self, *a):
        return self._dx * self._dy

    def V(self, *a):
        return self._dx * self._dy * self._dz


def fused_momentum_tendency(grid, scheme, u, v, w, tile_x=1,
                            interpret=False):
    """(Gu, Gv, Gw) = −∇·(𝐯⊗𝐯) with ``scheme`` on a regular grid, in
    one Pallas pass. Inputs are halo-extended with halos filled; output
    axis-0 halo rows are zero."""
    from oceananigans_tpu.advection import div_vu, div_vv, div_vw

    if not grid.regular:
        raise ValueError("fused_momentum_tendency needs a regular grid")
    H = grid.H[0]
    if H < scheme.required_halo:
        raise ValueError("axis-0 halo smaller than the scheme stencil")
    nx, ny, nz = u.shape
    pgrid = _RegularMetricProxy(grid)

    def kernel(u_hbm, v_hbm, w_hbm, gu, gv, gw, u_s, v_s, w_s, sems, *,
               TX):
        i = pl.program_id(0)
        x0 = i * TX
        cps = []
        for src, dst, k in ((u_hbm, u_s, 0), (v_hbm, v_s, 1),
                            (w_hbm, w_s, 2)):
            cp = pltpu.make_async_copy(src.at[pl.ds(x0, TX + 2 * H)],
                                       dst, sems.at[k])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        us, vs, ws = u_s[:], v_s[:], w_s[:]
        P = slice(H, H + TX)
        gu[:] = -div_vu(pgrid, scheme, us, vs, ws)[P]
        gv[:] = -div_vv(pgrid, scheme, us, vs, ws)[P]
        gw[:] = -div_vw(pgrid, scheme, us, vs, ws)[P]

    TX = tile_x
    while TX > 1 and (nx - 2 * H) % TX:
        TX //= 2
    gx = (nx - 2 * H) // TX
    out_shape = [jax.ShapeDtypeStruct((gx * TX, ny, nz), u.dtype)] * 3
    out_spec = pl.BlockSpec((TX, ny, nz), index_map=lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    gu, gv, gw = pl.pallas_call(
        partial(kernel, TX=TX),
        grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((TX + 2 * H, ny, nz), u.dtype)] * 3
        + [pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(u, v, w)

    def embed(g):
        return jnp.zeros((nx, ny, nz), u.dtype).at[H:H + gx * TX].set(g)

    return embed(gu), embed(gv), embed(gw)

"""Pallas TPU kernels for the roofline-critical stencil passes.

The whole-array XLA path materializes many intermediates per tendency
(each shifted flux product risks its own HBM round trip when fusion
breaks); this kernel computes the full momentum tendency in ONE pass:
read u, v, w once (tile + 1-ring halo, DMA'd HBM→VMEM), write Gu, Gv, Gw
once — the hand-fused equivalent of the reference's per-point
``compute_Gu!`` kernels (``nonhydrostatic_tendency_kernel_functions.jl:
47-78``) scheduled for the TPU memory hierarchy.

Implemented: fused Centered(2) momentum-advection tendency on a regular
rectilinear grid (the benchmark configuration). Tiles span (TX, TY) in the
horizontal with the full z-column; inputs stay in ANY/HBM space and each
program DMAs its (TX+2, TY+2, nz) window into VMEM scratch, so the
overlapping halo reads never round-trip through extra HBM buffers.
Requires halo >= 1 on non-flat axes (halos pre-filled by the caller).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["centered2_momentum_tendency", "pallas_available"]


def pallas_available(grid, advection) -> bool:
    """True when the fused kernel applies: regular rectilinear grid,
    Centered(2) advection, halo >= 1 on every non-flat axis, 3-D."""
    from oceananigans_tpu.advection import Centered
    from oceananigans_tpu.grids.rectilinear import RectilinearGrid
    if not (type(grid) is RectilinearGrid and grid.regular):
        return False
    if not (isinstance(advection, Centered) and advection.order == 2):
        return False
    for axis in range(3):
        if grid.N[axis] > 1 and grid.H[axis] < 1:
            return False
    return all(n > 1 for n in grid.N)


def _zm(a):
    """a[k-1] along z (wraps; z halo rows absorb the wrap junk)."""
    return jnp.roll(a, 1, axis=2)


def _zp(a):
    """a[k+1] along z."""
    return jnp.roll(a, -1, axis=2)


def _kernel(u_hbm, v_hbm, w_hbm, gu_ref, gv_ref, gw_ref,
            u_w, v_w, w_w, sems, *, TX, TY, inv_dx, inv_dy, inv_dz):
    i = pl.program_id(0)
    j = pl.program_id(1)
    x0 = i * TX
    y0 = j * TY

    cps = []
    for src, dst, s in ((u_hbm, u_w, 0), (v_hbm, v_w, 1), (w_hbm, w_w, 2)):
        cp = pltpu.make_async_copy(
            src.at[pl.ds(x0, TX + 2), pl.ds(y0, TY + 2), :],
            dst, sems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    u = u_w[:]
    v = v_w[:]
    w = w_w[:]

    P = slice(1, TX + 1)    # output cells in window x-coords
    Q = slice(1, TY + 1)
    u_c = u[P, Q]
    v_c = v[P, Q]
    w_c = w[P, Q]

    # ---------------- Gu at (f,c,c) ----------------
    fxx_r = 0.25 * (u_c + u[2:TX + 2, Q]) ** 2
    fxx_l = 0.25 * (u[0:TX, Q] + u_c) ** 2
    gu = -(fxx_r - fxx_l) * inv_dx
    # Fxy at (f,f): ℑx_f(v) ℑy_f(u), y-faces q = 1..TY+1
    QF = slice(1, TY + 2)
    vbar = 0.5 * (v[0:TX, QF] + v[P, QF])
    ubar = 0.5 * (u[P, 0:TY + 1] + u[P, QF])
    fxy = vbar * ubar
    gu = gu - (fxy[:, 1:] - fxy[:, :-1]) * inv_dy
    # Fxz at (f,c,f): ℑx_f(w) ℑz_f(u)
    wbar = 0.5 * (w[0:TX, Q] + w_c)
    fxz = wbar * 0.5 * (_zm(u_c) + u_c)
    gu = gu - (_zp(fxz) - fxz) * inv_dz
    gu_ref[:] = gu

    # ---------------- Gv at (c,f,c) ----------------
    fyy_r = 0.25 * (v_c + v[P, 2:TY + 2]) ** 2
    fyy_l = 0.25 * (v[P, 0:TY] + v_c) ** 2
    gv = -(fyy_r - fyy_l) * inv_dy
    PF = slice(1, TX + 2)
    ubar_v = 0.5 * (u[PF, 0:TY] + u[PF, Q])
    vbar_v = 0.5 * (v[0:TX + 1, Q] + v[PF, Q])
    fyx = ubar_v * vbar_v
    gv = gv - (fyx[1:, :] - fyx[:-1, :]) * inv_dx
    wbar_v = 0.5 * (w[P, 0:TY] + w_c)
    fyz = wbar_v * 0.5 * (_zm(v_c) + v_c)
    gv = gv - (_zp(fyz) - fyz) * inv_dz
    gv_ref[:] = gv

    # ---------------- Gw at (c,c,f) ----------------
    fzz_r = 0.25 * (w_c + _zp(w_c)) ** 2
    fzz_l = 0.25 * (_zm(w_c) + w_c) ** 2
    gw = -(fzz_r - fzz_l) * inv_dz
    ubar_w = 0.5 * (_zm(u[PF, Q]) + u[PF, Q])
    wxbar = 0.5 * (w[0:TX + 1, Q] + w[PF, Q])
    fzx = ubar_w * wxbar
    gw = gw - (fzx[1:, :] - fzx[:-1, :]) * inv_dx
    vbar_w = 0.5 * (_zm(v[P, QF]) + v[P, QF])
    wybar = 0.5 * (w[P, 0:TY + 1] + w[P, QF])
    fzy = vbar_w * wybar
    gw = gw - (fzy[:, 1:] - fzy[:, :-1]) * inv_dy
    gw_ref[:] = gw


def centered2_momentum_tendency(grid, u, v, w, tile=(8, 128),
                                interpret=False):
    """(Gu, Gv, Gw) = -div(𝐯 ⊗ 𝐯) with Centered(2) fluxes on a regular
    rectilinear grid, fused in one Pallas pass. Inputs are full
    halo-extended arrays with halos already filled. Output halo rows/cols
    are garbage (overwritten by the caller's next halo fill)."""
    nx, ny, nz = u.shape
    TX, TY = tile
    while TX > 1 and (nx - 2) % TX:
        TX //= 2
    while TY > 1 and (ny - 2) % TY:
        TY //= 2
    gx = (nx - 2) // TX
    gy = (ny - 2) // TY
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    kern = partial(_kernel, TX=TX, TY=TY, inv_dx=inv_dx, inv_dy=inv_dy,
                   inv_dz=inv_dz)
    out_shape = [jax.ShapeDtypeStruct((gx * TX, gy * TY, nz), u.dtype)] * 3
    out_spec = pl.BlockSpec((TX, TY, nz), index_map=lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    gu, gv, gw = pl.pallas_call(
        kern,
        grid=(gx, gy),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TX + 2, TY + 2, nz), u.dtype),
            pltpu.VMEM((TX + 2, TY + 2, nz), u.dtype),
            pltpu.VMEM((TX + 2, TY + 2, nz), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(u, v, w)

    # embed the interior result back into halo-extended arrays (halo ring
    # zeroed; the caller refills halos before any consumer reads them)
    def embed(g):
        full = jnp.zeros((nx, ny, nz), u.dtype)
        return full.at[1:1 + gx * TX, 1:1 + gy * TY, :].set(g)

    return embed(gu), embed(gv), embed(gw)

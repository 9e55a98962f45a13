"""Fused Pallas kernel for the shallow-water RK3 stage.

The XLA whole-array path materializes each rolled intermediate of the
conservative-form tendencies as its own HBM round trip at 8192² (2-D
rolls do not fuse the way 3-D stencil chains do), costing ~35 ms/stage.
This kernel computes the full stage — (Guh, Gvh, Gh) with Centered(2)
conservative fluxes + the g h ∂h gradient, AND the RK3 update
``new = old + a·G + b·G⁻`` — in ONE HBM pass: read (uh, vh, h, G⁻),
write (uh', vh', h', G). The hand-fused equivalent of the reference's
``solution_and_tracer_tendencies.jl`` + ``rk3_substep_shallow_water_
model.jl`` kernels scheduled for the TPU memory hierarchy.

Layout contract (mirrors ops/pallas_kernels.py): fields are (nx, ny)
after squeezing the Flat z axis; x is the DMA-sliced slab axis, y the
lane axis. The y axis must be halo-free periodic with ny % 128 == 0
(in-register roll wraps ARE the boundary). The x halo must be a
multiple of 8 and ≥ 8 so every slab window offset is sublane-aligned;
windows carry 8 extra rows per side, and x-shifts are in-VMEM sublane
rolls whose wrap junk never reaches the owned output rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oceananigans_tpu.config import config as _config

__all__ = ["sw_fused_available", "sw_rk3_stage"]

PAD = 8     # aligned window slack per side (needs only 2; 8 aligns DMA)


def sw_fused_available(grid, model) -> bool:
    """True when the fused SW stage kernel applies: regular rectilinear
    Flat-z grid, ConservativeFormulation, Centered(2) momentum +
    Centered(2)-or-no tracer advection with no tracers, no Coriolis /
    bathymetry / forcing / flux BCs, x halo a multiple of 8 (≥ 8),
    halo-free periodic tile-aligned y."""
    from oceananigans_tpu.advection import Centered
    from oceananigans_tpu.grids.base import Flat, Periodic
    from oceananigans_tpu.grids.rectilinear import RectilinearGrid
    from oceananigans_tpu.models.shallow_water import (
        ConservativeFormulation,
    )
    g = grid
    if not (type(g) is RectilinearGrid and g.regular):
        return False
    if g.axis_topo(2) is not Flat and g.axis_topo(2) != Flat:
        return False
    if model.formulation != ConservativeFormulation:
        return False
    ma = model.momentum_advection
    if not (isinstance(ma, Centered) and ma.order == 2):
        return False
    if model.coriolis is not None or model.tracer_names:
        return False
    b = getattr(model, "bathymetry", 0.0)
    if not (jnp.ndim(b) == 0 and float(b) == 0.0):
        return False
    if any(f is not None for f in model.forcings.values()):
        return False
    for name in ("uh", "vh", "h"):
        for axis in range(2):
            for bc in model.bcs[name].sides(axis):
                if (bc is not None and bc.classification == "flux"
                        and bc.condition is not None):
                    return False
    if g.H[0] != PAD:
        # the kernel hard-codes the owned-interior start at row PAD
        # (ADVICE r4: with H[0] > PAD it would treat true halo rows as
        # interior, correct only by the accident of the trailing fill)
        return False
    # the slab tiling needs an 8-divisible interior x extent
    # (sw_rk3_stage raises otherwise)
    if g.N[0] <= 1 or g.N[0] % 8:
        return False
    if g.N[1] <= 1 or g.H[1] != 0 or g.axis_topo(1) != Periodic \
            or (g.N[1] % 128):
        return False
    return True


def _sw_body(U, V, h, *, g_grav, inv_dx, inv_dy):
    """Stage tendencies on a full VMEM window; valid except the 2
    outermost x rows (callers own rows are ≥ PAD in)."""
    def xm(a):
        return pltpu.roll(a, 1, 0)

    def xp(a):
        return pltpu.roll(a, a.shape[0] - 1, 0)

    def ym(a):
        return pltpu.roll(a, 1, 1)

    def yp(a):
        return pltpu.roll(a, a.shape[1] - 1, 1)

    h_fc = 0.5 * (h + xm(h))
    h_cf = 0.5 * (h + ym(h))
    u = U / h_fc
    v = V / h_cf
    # x-momentum: ∇·(𝐮 uh) + g h ∂x h  (solution_and_tracer_tendencies.jl)
    fxx = 0.5 * (xp(u) + u) * 0.5 * (xp(U) + U)         # (c,c)
    fxy = 0.5 * (v + xm(v)) * 0.5 * (U + ym(U))         # (f,f)
    guh = -((fxx - xm(fxx)) * inv_dx + (yp(fxy) - fxy) * inv_dy) \
        - g_grav * h_fc * (h - xm(h)) * inv_dx
    # y-momentum
    fyx = 0.5 * (u + ym(u)) * 0.5 * (V + xm(V))         # (f,f)
    fyy = 0.5 * (yp(v) + v) * 0.5 * (yp(V) + V)         # (c,c)
    gvh = -((xp(fyx) - fyx) * inv_dx + (fyy - ym(fyy)) * inv_dy) \
        - g_grav * h_cf * (h - ym(h)) * inv_dy
    # mass: −∇·(U, V)
    gh = -((xp(U) - U) * inv_dx + (yp(V) - V) * inv_dy)
    return guh, gvh, gh


def _sw_kernel(coef_ref, U_hbm, V_hbm, h_hbm, gup_hbm, gvp_hbm, ghp_hbm,
               un_hbm, vn_hbm, hn_hbm, gu_hbm, gv_hbm, gh_hbm,
               U_s, V_s, h_s, gup_s, gvp_s, ghp_s,
               un_s, vn_s, hn_s, gu_s, gv_s, gh_s, isems, osems,
               *, TX, g_grav, inv_dx, inv_dy):
    i = pl.program_id(0)
    x0 = i * TX     # owned interior rows [x0+PAD, x0+PAD+TX) in HBM
                    # (the caller passes arrays whose row 0 is the
                    # first halo row; interior starts at row H = PAD)

    cps = []
    for src, dst, s, lo, n in (
            (U_hbm, U_s, 0, x0, TX + 2 * PAD),
            (V_hbm, V_s, 1, x0, TX + 2 * PAD),
            (h_hbm, h_s, 2, x0, TX + 2 * PAD),
            (gup_hbm, gup_s, 3, x0 + PAD, TX),
            (gvp_hbm, gvp_s, 4, x0 + PAD, TX),
            (ghp_hbm, ghp_s, 5, x0 + PAD, TX)):
        cp = pltpu.make_async_copy(src.at[pl.ds(lo, n)], dst, isems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    gu, gv, gh = _sw_body(U_s[:], V_s[:], h_s[:], g_grav=g_grav,
                          inv_dx=inv_dx, inv_dy=inv_dy)
    a = coef_ref[0]
    b = coef_ref[1]
    P = slice(PAD, PAD + TX)
    un_s[:] = U_s[P] + a * gu[P] + b * gup_s[:]
    vn_s[:] = V_s[P] + a * gv[P] + b * gvp_s[:]
    hn_s[:] = h_s[P] + a * gh[P] + b * ghp_s[:]
    gu_s[:] = gu[P]
    gv_s[:] = gv[P]
    gh_s[:] = gh[P]

    ocps = []
    for src, dst, s in ((un_s, un_hbm, 0), (vn_s, vn_hbm, 1),
                        (hn_s, hn_hbm, 2), (gu_s, gu_hbm, 3),
                        (gv_s, gv_hbm, 4), (gh_s, gh_hbm, 5)):
        cp = pltpu.make_async_copy(src, dst.at[pl.ds(x0 + PAD, TX)],
                                   osems.at[s])
        cp.start()
        ocps.append(cp)
    for cp in ocps:
        cp.wait()


def sw_rk3_stage(grid, uh, vh, h, Guh_prev, Gvh_prev, Gh_prev, a, b,
                 gravitational_acceleration, tile_x=64, interpret=False):
    """One fused shallow-water RK3 stage.

    Inputs are full halo-extended (nx, ny, 1) fields with halos filled;
    returns ``(uh', vh', h', Guh, Gvh, Gh)`` with
    ``q' = q + a·G + b·G⁻``. Output halo rows of the updated fields are
    UNWRITTEN (the next stage's fill overwrites them); the G outputs
    recycle G⁻'s buffers."""
    nx, ny, _ = uh.shape

    def squeeze(q):
        return q.reshape(nx, ny)

    U, V, H = squeeze(uh), squeeze(vh), squeeze(h)
    Gu_p = squeeze(Guh_prev)
    Gv_p = squeeze(Gvh_prev)
    Gh_p = squeeze(Gh_prev)
    if ny % 128:
        raise ValueError("fused SW kernel needs 128-aligned y")
    TX = tile_x
    while TX > 8 and (nx - 2 * PAD) % TX:
        TX //= 2
    if (nx - 2 * PAD) % TX:
        raise ValueError(f"interior x extent {nx - 2 * PAD} not "
                         f"tileable by 8")
    gx = (nx - 2 * PAD) // TX
    inv_dx = float(grid.Nx / grid.Lx)
    inv_dy = float(grid.Ny / grid.Ly)

    coef = jnp.stack([jnp.asarray(a, U.dtype), jnp.asarray(b, U.dtype)])
    kern = partial(_sw_kernel, TX=TX,
                   g_grav=float(gravitational_acceleration),
                   inv_dx=inv_dx, inv_dy=inv_dy)
    out_shape = [jax.ShapeDtypeStruct((nx, ny), U.dtype)] * 6
    win = pltpu.VMEM((TX + 2 * PAD, ny), U.dtype)
    slab = pltpu.VMEM((TX, ny), U.dtype)
    outs = pl.pallas_call(
        kern,
        grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_shape=out_shape,
        scratch_shapes=[win, win, win, slab, slab, slab,
                        slab, slab, slab, slab, slab, slab,
                        pltpu.SemaphoreType.DMA((6,)),
                        pltpu.SemaphoreType.DMA((6,))],
        input_output_aliases={4: 3, 5: 4, 6: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(coef, U, V, H, Gu_p, Gv_p, Gh_p)

    def expand(q):
        return q.reshape(nx, ny, 1)

    return tuple(expand(o) for o in outs)

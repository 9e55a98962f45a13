"""Pallas TPU kernels for the roofline-critical stencil passes.

The whole-array XLA path materializes many intermediates per tendency
(each shifted flux product risks its own HBM round trip when fusion
breaks); this kernel computes the full momentum tendency in ONE pass:
read u, v, w once, write Gu, Gv, Gw once — the hand-fused equivalent of
the reference's per-point ``compute_Gu!`` kernels
(``nonhydrostatic_tendency_kernel_functions.jl:47-78``) scheduled for the
TPU memory hierarchy.

Layout notes: fields are (x, y, z) with z in the lane dimension, so DMA
windows slice ONLY the leading x axis (Mosaic requires lane/sublane-
aligned slices); each program owns a (TX, ny, nz) slab, reads a
(TX+2, ny, nz) window, and handles y/z shifts with in-VMEM rolls (the
wrap rows land in halo slots that the caller's next halo fill overwrites).
Requires halo >= 1 on non-flat axes; halos pre-filled by the caller.
"""

from __future__ import annotations

from functools import partial

import jax

from oceananigans_tpu.config import config as _config
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["centered2_momentum_tendency", "pallas_available",
           "pressure_correction", "correction_available",
           "centered2_ab2_update", "ab2_fused_available",
           "centered2_science_ab2_update"]


def pallas_available(grid, advection) -> bool:
    """True when the fused kernel applies: regular rectilinear grid,
    Centered(2) advection, 3-D, and per-axis halo compatibility:
    axis 0 (the DMA-sliced slab axis) needs halo >= 1; axes 1 and 2
    are handled with in-VMEM rolls, which need either halo >= 1 (wrap
    junk lands in halos) or a PERIODIC halo-free layout (the roll wrap
    IS the periodic boundary — exact). The fastest configuration is
    (Bounded/periodic + halo 1, Periodic + halo 0, Periodic + halo 0):
    slice shapes then align to the (8, 128) Mosaic tiling with no
    padding."""
    from oceananigans_tpu.advection import Centered
    from oceananigans_tpu.grids.base import Periodic as _P
    from oceananigans_tpu.grids.rectilinear import RectilinearGrid
    if not (type(grid) is RectilinearGrid and grid.regular):
        return False
    if not (isinstance(advection, Centered) and advection.order == 2):
        return False
    if grid.H[0] < 1:
        return False
    for axis, tile in ((1, 8), (2, 128)):
        if grid.N[axis] <= 1 or grid.H[axis] >= 1:
            continue
        # halo-free axis: the in-VMEM roll must wrap at the TRUE extent,
        # so the axis must be periodic AND already aligned to the Mosaic
        # tile (otherwise the roll wraps through the alignment padding)
        n_tot = grid.N[axis] + 2 * grid.H[axis]
        if grid.axis_topo(axis) != _P or n_tot % tile:
            return False
    return all(n > 1 for n in grid.N)


def _centered2_body(u, v, w, *, TX, inv_dx, inv_dy, inv_dz):
    """Centered-2 momentum tendencies (Gu, Gv, Gw) for the TX interior
    x-rows of a (TX+2)-row VMEM window; shared by the tendency-only and
    the fused tendency+AB2 kernels."""

    def ym(a):    # a[j-1] (wraps into halo rows — junk there is fine)
        return pltpu.roll(a, 1, 1)

    def yp(a):    # a[j+1]  (pltpu.roll takes non-negative shifts)
        return pltpu.roll(a, a.shape[1] - 1, 1)

    def zm(a):
        return pltpu.roll(a, 1, 2)

    def zp(a):
        return pltpu.roll(a, a.shape[2] - 1, 2)

    P = slice(1, TX + 1)    # output x-cells within the window
    u_c = u[P]
    v_c = v[P]
    w_c = w[P]
    u_xm = u[0:TX]
    u_xp = u[2:TX + 2]
    v_xm = v[0:TX]
    w_xm = w[0:TX]

    # ---------------- Gu at (f,c,c) ----------------
    fxx_r = 0.25 * (u_c + u_xp) ** 2
    fxx_l = 0.25 * (u_xm + u_c) ** 2
    gu = -(fxx_r - fxx_l) * inv_dx
    # Fxy at (f,f,c): ℑx_f(v) ℑy_f(u); y-divergence dy_c: F[j+1]-F[j]
    vbar = 0.5 * (v_xm + v_c)
    fxy = vbar * 0.5 * (ym(u_c) + u_c)
    gu = gu - (yp(fxy) - fxy) * inv_dy
    # Fxz at (f,c,f): ℑx_f(w) ℑz_f(u)
    wbar = 0.5 * (w_xm + w_c)
    fxz = wbar * 0.5 * (zm(u_c) + u_c)
    gu = gu - (zp(fxz) - fxz) * inv_dz

    # ---------------- Gv at (c,f,c) ----------------
    fyy_r = 0.25 * (v_c + yp(v_c)) ** 2
    fyy_l = 0.25 * (ym(v_c) + v_c) ** 2
    gv = -(fyy_r - fyy_l) * inv_dy
    # Fyx at (f,f,c) for x-faces p=1..TX+1: ℑy_f(u) ℑx_f(v)
    ubar = 0.5 * (ym(u[0:TX + 1]) + u[0:TX + 1])
    # careful: x-face p needs u[p]; faces p = 1..TX+1 -> u[1:TX+2]
    ubar = 0.5 * (ym(u[1:TX + 2]) + u[1:TX + 2])
    vxbar = 0.5 * (v[0:TX + 1] + v[1:TX + 2])
    fyx = ubar * vxbar
    gv = gv - (fyx[1:] - fyx[:-1]) * inv_dx
    wbar_v = 0.5 * (ym(w_c) + w_c)
    fyz = wbar_v * 0.5 * (zm(v_c) + v_c)
    gv = gv - (zp(fyz) - fyz) * inv_dz

    # ---------------- Gw at (c,c,f) ----------------
    fzz_r = 0.25 * (w_c + zp(w_c)) ** 2
    fzz_l = 0.25 * (zm(w_c) + w_c) ** 2
    gw = -(fzz_r - fzz_l) * inv_dz
    ubar_w = 0.5 * (zm(u[1:TX + 2]) + u[1:TX + 2])
    wxbar = 0.5 * (w[0:TX + 1] + w[1:TX + 2])
    fzx = ubar_w * wxbar
    gw = gw - (fzx[1:] - fzx[:-1]) * inv_dx
    vbar_w = 0.5 * (zm(v_c) + v_c)
    wybar = 0.5 * (ym(w_c) + w_c)
    fzy = vbar_w * wybar
    gw = gw - (yp(fzy) - fzy) * inv_dy
    return gu, gv, gw


def _kernel(u_hbm, v_hbm, w_hbm, gu_ref, gv_ref, gw_ref,
            u_s, v_s, w_s, sems, *, TX, inv_dx, inv_dy, inv_dz):
    i = pl.program_id(0)
    x0 = i * TX

    cps = []
    for src, dst, s in ((u_hbm, u_s, 0), (v_hbm, v_s, 1), (w_hbm, w_s, 2)):
        cp = pltpu.make_async_copy(src.at[pl.ds(x0, TX + 2)], dst,
                                   sems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    gu, gv, gw = _centered2_body(u_s[:], v_s[:], w_s[:], TX=TX,
                                 inv_dx=inv_dx, inv_dy=inv_dy,
                                 inv_dz=inv_dz)
    gu_ref[:] = gu
    gv_ref[:] = gv
    gw_ref[:] = gw


def _ab2_kernel(coef_ref, u_hbm, v_hbm, w_hbm, gum_hbm, gvm_hbm, gwm_hbm,
                un_hbm, vn_hbm, wn_hbm, gu_hbm, gv_hbm, gw_hbm,
                u_s, v_s, w_s, gum_s, gvm_s, gwm_s,
                un_s, vn_s, wn_s, gu_s, gv_s, gw_s, isems, osems,
                *, TX, inv_dx, inv_dy, inv_dz):
    """Fused Centered-2 tendency + quasi-AB2 velocity update with direct
    HBM slab stores: u' = u + a·G + b·G⁻ (a = Δt(3/2+χ), b = −Δt(1/2+χ)),
    one read of (u, v, w, G⁻) and one write of (u', G) per step — the
    separate AB2 axpy pass and the interior-embed copies of the
    tendency-only kernel disappear."""
    i = pl.program_id(0)
    x0 = i * TX

    cps = []
    for src, dst, s, lo, n in (
            (u_hbm, u_s, 0, x0, TX + 2),
            (v_hbm, v_s, 1, x0, TX + 2),
            (w_hbm, w_s, 2, x0, TX + 2),
            (gum_hbm, gum_s, 3, x0 + 1, TX),
            (gvm_hbm, gvm_s, 4, x0 + 1, TX),
            (gwm_hbm, gwm_s, 5, x0 + 1, TX)):
        cp = pltpu.make_async_copy(src.at[pl.ds(lo, n)], dst, isems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    gu, gv, gw = _centered2_body(u_s[:], v_s[:], w_s[:], TX=TX,
                                 inv_dx=inv_dx, inv_dy=inv_dy,
                                 inv_dz=inv_dz)
    a = coef_ref[0]
    b = coef_ref[1]
    P = slice(1, TX + 1)
    un_s[:] = u_s[P] + a * gu + b * gum_s[:]
    vn_s[:] = v_s[P] + a * gv + b * gvm_s[:]
    wn_s[:] = w_s[P] + a * gw + b * gwm_s[:]
    gu_s[:] = gu
    gv_s[:] = gv
    gw_s[:] = gw

    ocps = []
    for src, dst, s in ((un_s, un_hbm, 0), (vn_s, vn_hbm, 1),
                        (wn_s, wn_hbm, 2), (gu_s, gu_hbm, 3),
                        (gv_s, gv_hbm, 4), (gw_s, gw_hbm, 5)):
        cp = pltpu.make_async_copy(src, dst.at[pl.ds(x0 + 1, TX)],
                                   osems.at[s])
        cp.start()
        ocps.append(cp)
    for cp in ocps:
        cp.wait()


def correction_available(grid) -> bool:
    """True when the fused pressure-correction kernel applies: the same
    layout constraints as the tendency kernel (regular rectilinear,
    halo >= 1 on the slab axis, rollable y/z axes), minus the advection-
    scheme requirement — the correction stencil is scheme-independent."""
    from oceananigans_tpu.grids.base import Periodic as _P
    from oceananigans_tpu.grids.rectilinear import RectilinearGrid
    if not (type(grid) is RectilinearGrid and grid.regular):
        return False
    if grid.H[0] < 1:
        return False
    for axis, tile in ((1, 8), (2, 128)):
        if grid.N[axis] <= 1 or grid.H[axis] >= 1:
            continue
        n_tot = grid.N[axis] + 2 * grid.H[axis]
        if grid.axis_topo(axis) != _P or n_tot % tile:
            return False
    return all(n > 1 for n in grid.N)


def _corr_kernel(dt_ref, p_hbm, u_hbm, v_hbm, w_hbm,
                 u_ref, v_ref, w_ref, p_s, u_s, v_s, w_s, sems,
                 *, TX, inv_dx, inv_dy, inv_dz):
    i = pl.program_id(0)
    x0 = i * TX

    cps = []
    for src, dst, s, lo, n in ((p_hbm, p_s, 0, x0, TX + 1),
                               (u_hbm, u_s, 1, x0 + 1, TX),
                               (v_hbm, v_s, 2, x0 + 1, TX),
                               (w_hbm, w_s, 3, x0 + 1, TX)):
        cp = pltpu.make_async_copy(src.at[pl.ds(lo, n)], dst, sems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    dt = dt_ref[0]
    p = p_s[:]
    p_c = p[1:TX + 1]
    gx = (p_c - p[0:TX]) * inv_dx
    # y/z differences via rolls (wrap junk lands in halo rows, or IS the
    # periodic boundary on halo-free periodic axes)
    gy = (p_c - pltpu.roll(p_c, 1, 1)) * inv_dy
    gz = (p_c - pltpu.roll(p_c, 1, 2)) * inv_dz
    u_ref[:] = u_s[:] - dt * gx
    v_ref[:] = v_s[:] - dt * gy
    w_ref[:] = w_s[:] - dt * gz


def pressure_correction(grid, p, u, v, w, dt, tile_x=8, interpret=False):
    """(u, v, w) -= dt * grad(p) fused in one Pallas pass: read p (with
    its x-halo window) and u, v, w once, write the corrected velocities
    once. ``p`` is the full halo-extended pressure with halos already
    filled. Output halo rows are junk (the caller's next halo fill
    overwrites them). Replaces three XLA gradient+update passes
    (reference ``pressure_correction.jl`` `_pressure_correct_velocities!`)."""
    nx, ny0, nz0 = u.shape
    ny = -(-ny0 // 8) * 8
    nz = -(-nz0 // 128) * 128
    if grid.H[1] == 0 and ny != ny0:
        raise ValueError("halo-free periodic axis 1 must be a multiple "
                         "of 8")
    if grid.H[2] == 0 and nz != nz0:
        raise ValueError("halo-free periodic axis 2 must be a multiple "
                         "of 128")
    if (ny, nz) != (ny0, nz0):
        pad = ((0, 0), (0, ny - ny0), (0, nz - nz0))
        p = jnp.pad(p, pad)
        u = jnp.pad(u, pad)
        v = jnp.pad(v, pad)
        w = jnp.pad(w, pad)
    TX = tile_x
    while TX > 1 and (nx - 2) % TX:
        TX //= 2
    gx = (nx - 2) // TX
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    kern = partial(_corr_kernel, TX=TX, inv_dx=inv_dx, inv_dy=inv_dy,
                   inv_dz=inv_dz)
    out_shape = [jax.ShapeDtypeStruct((gx * TX, ny, nz), u.dtype)] * 3
    out_spec = pl.BlockSpec((TX, ny, nz), index_map=lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dt_arr = jnp.asarray(dt, u.dtype).reshape(1)
    un, vn, wn = pl.pallas_call(
        kern,
        grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TX + 1, ny, nz), u.dtype),
            pltpu.VMEM((TX, ny, nz), u.dtype),
            pltpu.VMEM((TX, ny, nz), u.dtype),
            pltpu.VMEM((TX, ny, nz), u.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(dt_arr, p, u, v, w)

    def embed(gout):
        full = jnp.zeros((nx, ny0, nz0), u.dtype)
        return full.at[1:1 + gx * TX].set(gout[:, :ny0, :nz0])

    return embed(un), embed(vn), embed(wn)


def centered2_momentum_tendency(grid, u, v, w, tile_x=None,
                                interpret=False):
    """(Gu, Gv, Gw) = -div(𝐯 ⊗ 𝐯) with Centered(2) fluxes on a regular
    rectilinear grid, fused in one Pallas pass. Inputs are full
    halo-extended arrays with halos already filled. Output halo rows are
    junk (overwritten by the caller's next halo fill)."""
    nx, ny0, nz0 = u.shape
    # Mosaic DMA slices must be aligned to the (sublane=8, lane=128) tiling
    # of the last two dims: pad y and z up (the pad rows are junk the
    # stencil rolls wrap through; outputs are cropped back). Halo-free
    # periodic axes must be pad-free: their roll wrap IS the boundary.
    ny = -(-ny0 // 8) * 8
    nz = -(-nz0 // 128) * 128
    if grid.H[1] == 0 and ny != ny0:
        raise ValueError("halo-free periodic axis 1 must be a multiple "
                         "of 8")
    if grid.H[2] == 0 and nz != nz0:
        raise ValueError("halo-free periodic axis 2 must be a multiple "
                         "of 128")
    if tile_x is None:
        # largest tile whose declared scratch + output blocks stay well
        # inside the chip's VMEM (measured on v5e at 256³: TX=8 beats
        # TX=1 — bigger slabs amortize the per-program DMA and window
        # overlap)
        budget = 48 * 1024 * 1024
        tile_x = 8
        while tile_x > 1 and (3 * (tile_x + 2) + 3 * tile_x) \
                * ny * nz * u.dtype.itemsize > budget:
            tile_x //= 2
    if (ny, nz) != (ny0, nz0):
        pad = ((0, 0), (0, ny - ny0), (0, nz - nz0))
        u = jnp.pad(u, pad)
        v = jnp.pad(v, pad)
        w = jnp.pad(w, pad)
    TX = tile_x
    while TX > 1 and (nx - 2) % TX:
        TX //= 2
    gx = (nx - 2) // TX
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    kern = partial(_kernel, TX=TX, inv_dx=inv_dx, inv_dy=inv_dy,
                   inv_dz=inv_dz)
    out_shape = [jax.ShapeDtypeStruct((gx * TX, ny, nz), u.dtype)] * 3
    out_spec = pl.BlockSpec((TX, ny, nz), index_map=lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vmem_bytes = (3 * (TX + 2) + 3 * TX) * ny * nz * u.dtype.itemsize
    gu, gv, gw = pl.pallas_call(
        kern,
        grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TX + 2, ny, nz), u.dtype),
            pltpu.VMEM((TX + 2, ny, nz), u.dtype),
            pltpu.VMEM((TX + 2, ny, nz), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(u, v, w)

    # embed the interior result back into the halo-extended x-range and
    # crop the alignment padding (the x halo ring is junk; the caller
    # refills halos before any consumer)
    def embed(g):
        full = jnp.zeros((nx, ny0, nz0), u.dtype)
        return full.at[1:1 + gx * TX].set(g[:, :ny0, :nz0])

    return embed(gu), embed(gv), embed(gw)


def ab2_fused_available(grid, advection) -> bool:
    """True when the fused tendency+AB2 kernel applies: everything
    ``pallas_available`` needs PLUS pad-free (8, 128) alignment of the
    full y/z extents — the kernel writes its slabs straight to the
    full-shaped HBM outputs, so there is no crop step to absorb
    alignment padding."""
    if not pallas_available(grid, advection):
        return False
    ny = grid.N[1] + 2 * grid.H[1]
    nz = grid.N[2] + 2 * grid.H[2]
    return ny % 8 == 0 and nz % 128 == 0


def _science_kernel(T, buoy_idx, refs, *, TX, inv_dx, inv_dy, inv_dz):
    """Fused Centered-2 science step: momentum tendency + f-plane
    Coriolis + buoyancy-tracer forcing + T tracer advections + quasi-AB2
    updates of every prognostic field, one HBM pass.

    ``refs`` layout: [coef(SMEM: a, b, f)] + HBM inputs
    [u, v, w, c×T, Gu⁻, Gv⁻, Gw⁻, Gc⁻×T] + HBM outputs
    [u', v', w', c'×T, Gu, Gv, Gw, Gc×T] + scratch
    [win(u, v, w, c×T), slab(G⁻ ×(3+T)), slab(out ×(6+2T)), isems,
    osems].
    """
    nin = 3 + T
    coef_ref = refs[0]
    hbm_in = refs[1:1 + 2 * nin]
    hbm_out = refs[1 + 2 * nin:1 + 4 * nin]
    rest = refs[1 + 4 * nin:]
    wins = rest[:nin]
    gprev_s = rest[nin:2 * nin]
    outs_s = rest[2 * nin:4 * nin]
    isems, osems = rest[4 * nin], rest[4 * nin + 1]

    i = pl.program_id(0)
    x0 = i * TX

    cps = []
    for s, (src, dst) in enumerate(zip(hbm_in[:nin], wins)):
        cp = pltpu.make_async_copy(src.at[pl.ds(x0, TX + 2)], dst,
                                   isems.at[s])
        cp.start()
        cps.append(cp)
    for s, (src, dst) in enumerate(zip(hbm_in[nin:], gprev_s)):
        cp = pltpu.make_async_copy(src.at[pl.ds(x0 + 1, TX)], dst,
                                   isems.at[nin + s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    u = wins[0][:]
    v = wins[1][:]
    w = wins[2][:]
    gu, gv, gw = _centered2_body(u, v, w, TX=TX, inv_dx=inv_dx,
                                 inv_dy=inv_dy, inv_dz=inv_dz)

    def ym(a):
        return pltpu.roll(a, 1, 1)

    def yp(a):
        return pltpu.roll(a, a.shape[1] - 1, 1)

    def zm(a):
        return pltpu.roll(a, 1, 2)

    def zp(a):
        return pltpu.roll(a, a.shape[2] - 1, 2)

    P = slice(1, TX + 1)
    a_c = coef_ref[0]
    b_c = coef_ref[1]
    f = coef_ref[2]

    # f-plane Coriolis: Gu += f ℑxᶠ(ℑyᶜ v), Gv −= f ℑyᶠ(ℑxᶜ u)
    # (face j sits between centers j−1 and j: ℑ_c = (q + q[+1])/2,
    # ℑ_f = (q[−1] + q)/2 — reference f_plane.jl:8)
    iyc_v = 0.5 * (v + yp(v))
    gu = gu + f * 0.5 * (iyc_v[0:TX] + iyc_v[1:TX + 1])
    ixc_u = 0.5 * (u[1:TX + 1] + u[2:TX + 2])
    gv = gv - f * 0.5 * (ym(ixc_u) + ixc_u)

    # buoyancy tracer: Gw += ℑzᶠ(b) (BuoyancyTracer, gravity −ẑ)
    if buoy_idx is not None:
        b_c3 = wins[3 + buoy_idx][:][P]
        gw = gw + 0.5 * (zm(b_c3) + b_c3)

    gcs = []
    for t in range(T):
        c = wins[3 + t][:]
        c_c = c[P]
        # x-faces p = 1..TX+1: u[p]·ℑxᶠ(c)[p]
        fx = u[1:TX + 2] * 0.5 * (c[0:TX + 1] + c[1:TX + 2])
        gc = -(fx[1:] - fx[:-1]) * inv_dx
        fy = v[P] * 0.5 * (ym(c_c) + c_c)
        gc = gc - (yp(fy) - fy) * inv_dy
        fz = w[P] * 0.5 * (zm(c_c) + c_c)
        gc = gc - (zp(fz) - fz) * inv_dz
        gcs.append(gc)

    news = [u[P] + a_c * gu + b_c * gprev_s[0][:],
            v[P] + a_c * gv + b_c * gprev_s[1][:],
            w[P] + a_c * gw + b_c * gprev_s[2][:]]
    for t in range(T):
        news.append(wins[3 + t][:][P] + a_c * gcs[t]
                    + b_c * gprev_s[3 + t][:])
    gs = [gu, gv, gw] + gcs
    for s_ref, val in zip(outs_s, news + gs):
        s_ref[:] = val

    ocps = []
    for s, (src, dst) in enumerate(zip(outs_s, hbm_out)):
        cp = pltpu.make_async_copy(src, dst.at[pl.ds(x0 + 1, TX)],
                                   osems.at[s])
        cp.start()
        ocps.append(cp)
    for cp in ocps:
        cp.wait()


def centered2_science_ab2_update(grid, u, v, w, tracers, Gu_prev,
                                 Gv_prev, Gw_prev, Gc_prev, a, b,
                                 f=0.0, buoyancy_tracer=None,
                                 tile_x=None, interpret=False):
    """Fused Centered-2 SCIENCE step: momentum tendency + f-plane
    Coriolis + BuoyancyTracer forcing + tracer advection + quasi-AB2
    update of every prognostic field in ONE HBM pass — the round-3
    ``centered2_ab2_update`` extended from the bare benchmark
    configuration to the buoyancy+Coriolis+tracer configuration real
    runs use (reference tendency assembly
    ``nonhydrostatic_tendency_kernel_functions.jl:47-78`` + AB2
    ``quasi_adams_bashforth_2.jl:128-154``).

    ``tracers``/``Gc_prev``: name-keyed dicts (insertion order fixes the
    kernel operand order); ``buoyancy_tracer``: tracer name entering Gw,
    or None. Returns ``(u', v', w', {c'}, Gu, Gv, Gw, {Gc})``. Same
    layout contract as ``centered2_ab2_update`` (halos pre-filled,
    output halo rows unwritten/stale, pad-free (8, 128) y/z).
    """
    names = list(tracers)
    T = len(names)
    buoy_idx = names.index(buoyancy_tracer) \
        if buoyancy_tracer is not None else None
    nx, ny, nz = u.shape
    if ny % 8 or nz % 128:
        raise ValueError("fused AB2 kernel needs (8,128)-aligned y/z")
    if tile_x is None:
        budget = 64 * 1024 * 1024
        tile_x = 8
        nin = 3 + T
        while tile_x > 1 and (nin * (tile_x + 2) + 3 * nin * tile_x) \
                * ny * nz * u.dtype.itemsize > budget:
            tile_x //= 2
    TX = tile_x
    while TX > 1 and (nx - 2) % TX:
        TX //= 2
    gx = (nx - 2) // TX
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    nin = 3 + T
    coef = jnp.stack([jnp.asarray(a, u.dtype), jnp.asarray(b, u.dtype),
                      jnp.asarray(f, u.dtype)])

    def kern(*refs):
        _science_kernel(T, buoy_idx, refs, TX=TX, inv_dx=inv_dx,
                        inv_dy=inv_dy, inv_dz=inv_dz)

    out_shape = [jax.ShapeDtypeStruct((nx, ny, nz), u.dtype)] * (2 * nin)
    win = pltpu.VMEM((TX + 2, ny, nz), u.dtype)
    slab = pltpu.VMEM((TX, ny, nz), u.dtype)
    # the G⁻ inputs recycle as the G outputs (disjoint rows per program)
    aliases = {1 + nin + k: nin + k for k in range(nin)}
    ins = [u, v, w] + [tracers[n] for n in names] \
        + [Gu_prev, Gv_prev, Gw_prev] + [Gc_prev[n] for n in names]
    outs = pl.pallas_call(
        kern,
        grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * nin),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * nin),
        out_shape=out_shape,
        scratch_shapes=[win] * nin + [slab] * nin + [slab] * (2 * nin)
        + [pltpu.SemaphoreType.DMA((2 * nin,)),
           pltpu.SemaphoreType.DMA((2 * nin,))],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(coef, *ins)
    un, vn, wn = outs[0], outs[1], outs[2]
    cn = {n: outs[3 + t] for t, n in enumerate(names)}
    gu, gv, gw = outs[nin], outs[nin + 1], outs[nin + 2]
    gc = {n: outs[nin + 3 + t] for t, n in enumerate(names)}
    return un, vn, wn, cn, gu, gv, gw, gc


def centered2_ab2_update(grid, u, v, w, Gu_prev, Gv_prev, Gw_prev,
                         a, b, tile_x=8, interpret=False):
    """Fused Centered-2 momentum tendency + quasi-AB2 update.

    Returns ``(u', v', w', Gu, Gv, Gw)`` with
    ``u' = u + a·Gu + b·Gu_prev`` (caller passes a = Δt(3/2+χ),
    b = −Δt(1/2+χ); Euler first step folds into the coefficients) — the
    reference's `ab2_step_field!` kernel
    (``quasi_adams_bashforth_2.jl:128-154``) fused with `compute_Gu!`
    into one HBM pass. Interior x-rows are stored directly into the
    full-shaped outputs; the x-halo rows of the velocity outputs are
    UNWRITTEN (the caller's trailing halo fill overwrites them) and the
    G outputs alias G_prev's buffers, so their halo rows carry the
    previous step's (unused) halo values.
    """
    nx, ny, nz = u.shape
    if ny % 8 or nz % 128:
        raise ValueError("fused AB2 kernel needs (8,128)-aligned y/z")
    TX = tile_x
    while TX > 1 and (nx - 2) % TX:
        TX //= 2
    gx = (nx - 2) // TX
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    coef = jnp.stack([jnp.asarray(a, u.dtype), jnp.asarray(b, u.dtype)])
    kern = partial(_ab2_kernel, TX=TX, inv_dx=inv_dx, inv_dy=inv_dy,
                   inv_dz=inv_dz)
    out_shape = [jax.ShapeDtypeStruct((nx, ny, nz), u.dtype)] * 6
    win = pltpu.VMEM((TX + 2, ny, nz), u.dtype)
    slab = pltpu.VMEM((TX, ny, nz), u.dtype)
    return pl.pallas_call(
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
        # G⁻ buffers are recycled as the G outputs (same rows read then
        # written by the same program; programs touch disjoint rows)
        input_output_aliases={4: 3, 5: 4, 6: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(coef, u, v, w, Gu_prev, Gv_prev, Gw_prev)

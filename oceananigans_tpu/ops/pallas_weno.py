"""Fused WENO-5 momentum-tendency Pallas kernel (the roofline kernel).

The XLA whole-array WENO path materializes dozens of shifted intermediates
per tendency; this kernel computes all three momentum tendencies in ONE
HBM pass: read u, v, w once, write Gu, Gv, Gw once, with the entire
WENO-Z reconstruction (sub-stencil values, Jiang-Shu smoothness
indicators, nonlinear weights, upwind selection) evaluated on VMEM slabs.
Hand-fused equivalent of the reference's per-point ``compute_Gu!`` kernels
with WENO fluxes (``nonhydrostatic_tendency_kernel_functions.jl:47-78`` +
``weno_interpolants.jl``), scheduled for the TPU memory hierarchy.

Layout contract (same as ``pallas_kernels.centered2_momentum_tendency``):
fields are (x, y, z) with z in the lane dimension; each program owns a
(TX, ny, nz) output slab and DMAs a (TX + 6, ny, nz) window (WENO-5 needs
3 halo rows each side on the sliced axis). y/z shifts are in-VMEM rolls:
on halo-free periodic axes the roll wrap IS the boundary (exact); on
halo >= 3 axes the wrap junk lands in halo slots the caller's next halo
fill overwrites.

Numerics match the XLA path (``advection.WENO(5)``) to float32 roundoff:
identical coefficients, identical WENO-Z weight formula
(tau = |b0 - b2|, alpha = gamma (1 + (tau/(b+eps))^2)); only the
operation order inside fused multiply-adds may differ.
"""

from __future__ import annotations

from functools import partial

import jax

from oceananigans_tpu.config import config as _config
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["weno5_momentum_tendency", "weno5_tracer_tendencies",
           "weno5_available"]

H = 3   # WENO-5 buffer width


def weno5_available(grid, advection) -> bool:
    """True when the fused kernel applies: regular rectilinear grid,
    plain WENO(5) advection (no stretched tables, no bounds), 3-D, and
    per-axis halo compatibility: axis 0 (the DMA-sliced slab axis) needs
    halo >= 3; axes 1 and 2 need either halo >= 3 (roll wrap junk lands
    in halos) or a PERIODIC halo-free tile-aligned layout (the roll wrap
    IS the periodic boundary — exact)."""
    from oceananigans_tpu.advection import WENO
    from oceananigans_tpu.grids.base import Periodic as _P
    from oceananigans_tpu.grids.rectilinear import RectilinearGrid
    if not (type(grid) is RectilinearGrid and grid.regular):
        return False
    if not (type(advection) is WENO and advection.order == 5
            and advection.bounds is None
            and getattr(advection, "_tables", None) is None):
        return False
    if grid.H[0] < H:
        return False
    for axis, tile in ((1, 8), (2, 128)):
        if grid.N[axis] <= 1 or grid.H[axis] >= H:
            continue
        n_tot = grid.N[axis] + 2 * grid.H[axis]
        if grid.axis_topo(axis) != _P or grid.H[axis] != 0 or n_tot % tile:
            return False
    return all(n > 1 for n in grid.N)


def _recip(x):
    """Reciprocal via the VPU's fast approximate-reciprocal instruction
    plus one Newton-Raphson step: relative error ~1e-8, an order of
    magnitude inside the kernel's 1e-6 match budget, and far cheaper
    than the multi-pass exact f32 divide (the WENO-Z weights need 8
    reciprocals per flux point — the kernel's hottest operation)."""
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _weno_face(s, U, eps):
    """Upwind-selected WENO-5 face value from the 6 taps ``s[-3..2]``
    (n = offset from the target face; o already folded in). Matches the
    XLA path (``WENO._onesided`` with/without reflect + the upwind
    select) to roundoff.

    Both one-sided reconstructions are computed jointly with their
    algebraically-shared pieces factored once: under the reflection
    n -> -1-n the right-biased sub-stencil polynomials satisfy
    q1R == q2L and q2R == q1L (only q0R is new), the Jiang-Shu
    curvature terms (a - 2b + c)^2 coincide pairwise across sides, and
    the middle-stencil (a - c)^2 terms are equal up to sign. This cuts
    the flux-point operation count by ~40% vs two independent
    evaluations (which neither XLA nor Mosaic CSE can discover: the
    identities hold under tap reversal, not syntactically)."""
    c1, c2 = 13.0 / 12.0, 0.25
    # sub-stencil values (4 distinct polynomials serve both sides)
    q0L = (2 / 6) * s[-3] + (-7 / 6) * s[-2] + (11 / 6) * s[-1]
    q1L = (-1 / 6) * s[-2] + (5 / 6) * s[-1] + (2 / 6) * s[0]
    q2L = (2 / 6) * s[-1] + (5 / 6) * s[0] + (-1 / 6) * s[1]
    q0R = (11 / 6) * s[0] + (-7 / 6) * s[1] + (2 / 6) * s[2]
    # smoothness indicators: curvature terms shared across sides
    d3 = (s[-3] - 2 * s[-2] + s[-1]) ** 2
    d2 = (s[-2] - 2 * s[-1] + s[0]) ** 2
    d1 = (s[-1] - 2 * s[0] + s[1]) ** 2
    d0 = (s[0] - 2 * s[1] + s[2]) ** 2
    b0L = c1 * d3 + c2 * (s[-3] - 4 * s[-2] + 3 * s[-1]) ** 2
    b1L = c1 * d2 + c2 * (s[-2] - s[0]) ** 2
    b2L = c1 * d1 + c2 * (3 * s[-1] - 4 * s[0] + s[1]) ** 2
    b0R = c1 * d0 + c2 * (s[2] - 4 * s[1] + 3 * s[0]) ** 2
    b1R = c1 * d1 + c2 * (s[1] - s[-1]) ** 2
    b2R = c1 * d2 + c2 * (3 * s[0] - 4 * s[-1] + s[-2]) ** 2

    def combine(b0, b1, b2, q0, q1, q2):
        # ratio capped exactly as WENO._z_alphas: f32 (tau/(b+eps))**2
        # overflows to inf for dimensional fields (beta ~ 1e14, eps 1e-8)
        # and the normalization would return inf/inf = NaN
        cap = 1e12 if jnp.result_type(b0) == jnp.float32 else 1e60
        tau = jnp.abs(b0 - b2)
        r0 = jnp.minimum(tau * _recip(b0 + eps), cap)
        r1 = jnp.minimum(tau * _recip(b1 + eps), cap)
        r2 = jnp.minimum(tau * _recip(b2 + eps), cap)
        a0 = (1 / 10) * (1.0 + r0 * r0)
        a1 = (6 / 10) * (1.0 + r1 * r1)
        a2 = (3 / 10) * (1.0 + r2 * r2)
        return (a0 * q0 + a1 * q1 + a2 * q2) * _recip(a0 + a1 + a2)

    left = combine(b0L, b1L, b2L, q0L, q1L, q2L)
    right = combine(b0R, b1R, b2R, q0R, q2L, q1L)
    # no U == 0 average branch: the face value is always multiplied by
    # U, so the zero-velocity branch contributes U * anything == 0 to
    # the flux exactly as the XLA path's 0.5 (L + R) does
    return jnp.where(U > 0, left, right)


def _weno5_body(u, v, w, *, TX, inv_dx, inv_dy, inv_dz, eps):
    """WENO-5 momentum tendencies (gu, gv, gw) for the TX interior
    x-rows of a (TX + 2H)-row VMEM window; shared by the tendency-only
    and the fused tendency+AB2 kernels."""

    def yn(a, n):   # a[j+n] in y (sublane) — roll wrap = periodic/halo junk
        return pltpu.roll(a, (a.shape[1] - n) % a.shape[1], 1)

    def zn(a, n):   # a[k+n] in z (lane)
        return pltpu.roll(a, (a.shape[2] - n) % a.shape[2], 2)

    C = slice(H, TX + H)          # output cells within the window
    u_c, v_c, w_c = u[C], v[C], w[C]

    # ------------------------------------------------------------------
    # Gu at (f,c,c)
    # ------------------------------------------------------------------
    # x-flux at centers c in [H-1, H+TX): F = ix_c(u) * weno_x(u, o=1)
    n_c = TX + 1
    Uadv = 0.5 * (u[H - 1:H - 1 + n_c] + u[H:H + n_c])
    taps = {m: u[H - 1 + m: H - 1 + m + n_c] for m in range(-2, 4)}
    fxx = Uadv * _weno_face({n: taps[n + 1] for n in range(-3, 3)},
                            Uadv, eps)
    gu = -(fxx[1:] - fxx[:-1]) * inv_dx
    # y-flux at (f,f,c): ix_f(v) * weno_y(u, o=0); dy_c: F[j+1] - F[j]
    Vadv = 0.5 * (v[H - 1:H - 1 + TX] + v_c)
    fxy = Vadv * _weno_face({n: yn(u_c, n) for n in range(-3, 3)},
                            Vadv, eps)
    gu = gu - (yn(fxy, 1) - fxy) * inv_dy
    # z-flux at (f,c,f): ix_f(w) * weno_z(u, o=0); dz_c: F[k+1] - F[k]
    Wadv = 0.5 * (w[H - 1:H - 1 + TX] + w_c)
    fxz = Wadv * _weno_face({n: zn(u_c, n) for n in range(-3, 3)},
                            Wadv, eps)
    gu = gu - (zn(fxz, 1) - fxz) * inv_dz

    # ------------------------------------------------------------------
    # Gv at (c,f,c)
    # ------------------------------------------------------------------
    # x-flux at x-faces f in [H, H+TX]: F = iy_f(u) * weno_x(v, o=0)
    n_f = TX + 1
    u_f = u[H:H + n_f]
    Uadv = 0.5 * (yn(u_f, -1) + u_f)
    taps = {n: v[H + n: H + n + n_f] for n in range(-3, 3)}
    fyx = Uadv * _weno_face(taps, Uadv, eps)
    gv = -(fyx[1:] - fyx[:-1]) * inv_dx
    # y-flux at centers: iy_c(v) * weno_y(v, o=1); dy_f: F[j] - F[j-1]
    Vadv = 0.5 * (v_c + yn(v_c, 1))
    fyy = Vadv * _weno_face({n: yn(v_c, n + 1) for n in range(-3, 3)},
                            Vadv, eps)
    gv = gv - (fyy - yn(fyy, -1)) * inv_dy
    # z-flux at (c,f,f): iy_f(w) * weno_z(v, o=0); dz_c
    Wadv = 0.5 * (yn(w_c, -1) + w_c)
    fyz = Wadv * _weno_face({n: zn(v_c, n) for n in range(-3, 3)},
                            Wadv, eps)
    gv = gv - (zn(fyz, 1) - fyz) * inv_dz

    # ------------------------------------------------------------------
    # Gw at (c,c,f)
    # ------------------------------------------------------------------
    # x-flux at x-faces: F = iz_f(u) * weno_x(w, o=0)
    Uadv = 0.5 * (zn(u_f, -1) + u_f)
    taps = {n: w[H + n: H + n + n_f] for n in range(-3, 3)}
    fzx = Uadv * _weno_face(taps, Uadv, eps)
    gw = -(fzx[1:] - fzx[:-1]) * inv_dx
    # y-flux at (c,f,f): iz_f(v) * weno_y(w, o=0); dy_c
    Vadv = 0.5 * (zn(v_c, -1) + v_c)
    fzy = Vadv * _weno_face({n: yn(w_c, n) for n in range(-3, 3)},
                            Vadv, eps)
    gw = gw - (yn(fzy, 1) - fzy) * inv_dy
    # z-flux at z-centers: iz_c(w) * weno_z(w, o=1); dz_f: F[k] - F[k-1]
    Wadv = 0.5 * (w_c + zn(w_c, 1))
    fzz = Wadv * _weno_face({n: zn(w_c, n + 1) for n in range(-3, 3)},
                            Wadv, eps)
    gw = gw - (fzz - zn(fzz, -1)) * inv_dz
    return gu, gv, gw


def _kernel(u_hbm, v_hbm, w_hbm, gu_ref, gv_ref, gw_ref,
            u_s, v_s, w_s, sems, *, TX, inv_dx, inv_dy, inv_dz, eps):
    i = pl.program_id(0)
    x0 = i * TX

    cps = []
    for src, dst, s in ((u_hbm, u_s, 0), (v_hbm, v_s, 1), (w_hbm, w_s, 2)):
        cp = pltpu.make_async_copy(src.at[pl.ds(x0, TX + 2 * H)], dst,
                                   sems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    gu, gv, gw = _weno5_body(u_s[:], v_s[:], w_s[:], TX=TX,
                             inv_dx=inv_dx, inv_dy=inv_dy,
                             inv_dz=inv_dz, eps=eps)
    gu_ref[:] = gu
    gv_ref[:] = gv
    gw_ref[:] = gw


def _weno_ab2_kernel(coef_ref, u_hbm, v_hbm, w_hbm,
                     gum_hbm, gvm_hbm, gwm_hbm,
                     un_hbm, vn_hbm, wn_hbm, gu_hbm, gv_hbm, gw_hbm,
                     u_s, v_s, w_s, gum_s, gvm_s, gwm_s,
                     un_s, vn_s, wn_s, gu_s, gv_s, gw_s, isems, osems,
                     *, TX, inv_dx, inv_dy, inv_dz, eps):
    """Fused WENO-5 tendency + quasi-AB2 velocity update with direct
    HBM slab stores (the WENO analog of ``_ab2_kernel`` in
    ops/pallas_kernels.py): one read of (u, v, w, G⁻), one write of
    (u', G) — the separate AB2 axpy pass and the interior-embed copies
    of the tendency-only kernel disappear."""
    i = pl.program_id(0)
    x0 = i * TX

    cps = []
    for src, dst, s, lo, n in (
            (u_hbm, u_s, 0, x0, TX + 2 * H),
            (v_hbm, v_s, 1, x0, TX + 2 * H),
            (w_hbm, w_s, 2, x0, TX + 2 * H),
            (gum_hbm, gum_s, 3, x0 + H, TX),
            (gvm_hbm, gvm_s, 4, x0 + H, TX),
            (gwm_hbm, gwm_s, 5, x0 + H, TX)):
        cp = pltpu.make_async_copy(src.at[pl.ds(lo, n)], dst, isems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    gu, gv, gw = _weno5_body(u_s[:], v_s[:], w_s[:], TX=TX,
                             inv_dx=inv_dx, inv_dy=inv_dy,
                             inv_dz=inv_dz, eps=eps)
    a = coef_ref[0]
    b = coef_ref[1]
    C = slice(H, TX + H)
    un_s[:] = u_s[C] + a * gu + b * gum_s[:]
    vn_s[:] = v_s[C] + a * gv + b * gvm_s[:]
    wn_s[:] = w_s[C] + a * gw + b * gwm_s[:]
    gu_s[:] = gu
    gv_s[:] = gv
    gw_s[:] = gw

    ocps = []
    for src, dst, s in ((un_s, un_hbm, 0), (vn_s, vn_hbm, 1),
                        (wn_s, wn_hbm, 2), (gu_s, gu_hbm, 3),
                        (gv_s, gv_hbm, 4), (gw_s, gw_hbm, 5)):
        cp = pltpu.make_async_copy(src, dst.at[pl.ds(x0 + H, TX)],
                                   osems.at[s])
        cp.start()
        ocps.append(cp)
    for cp in ocps:
        cp.wait()


def _weno_ab2_pipelined_kernel(coef_ref, u_hbm, v_hbm, w_hbm,
                               gum_hbm, gvm_hbm, gwm_hbm,
                               un_hbm, vn_hbm, wn_hbm,
                               gu_hbm, gv_hbm, gw_hbm,
                               u_s, v_s, w_s, gum_s, gvm_s, gwm_s,
                               un_s, vn_s, wn_s, gu_s, gv_s, gw_s,
                               isems, osems,
                               *, NCH, TX, inv_dx, inv_dy, inv_dz, eps):
    """Double-buffered ``_weno_ab2_kernel``: one kernel invocation walks
    all NCH x-slabs in a fori_loop, prefetching slab i+1's inputs while
    computing slab i and draining slab i's output copies under slab
    i+1/i+2's compute (pallas_guide.md double-buffering pattern). The
    serial copy->wait->compute->copy chain of the per-program variant
    cost ~1 ms/step of exposed DMA at 256-cubed.

    Scratch buffers hold two slots stacked on the x axis:
    windows (2*(TX+2H), ny, nz), slabs (2*TX, ny, nz); the DMA
    semaphore arrays are (2, 6)-shaped [slot, operand]."""
    W = TX + 2 * H

    def in_dmas(slot, ci):
        x0 = ci * TX
        cps = []
        for k, (src, dst, rows, lo) in enumerate((
                (u_hbm, u_s, W, x0), (v_hbm, v_s, W, x0),
                (w_hbm, w_s, W, x0),
                (gum_hbm, gum_s, TX, x0 + H),
                (gvm_hbm, gvm_s, TX, x0 + H),
                (gwm_hbm, gwm_s, TX, x0 + H))):
            cps.append(pltpu.make_async_copy(
                src.at[pl.ds(lo, rows)],
                dst.at[pl.ds(slot * rows, rows)], isems.at[slot, k]))
        return cps

    def out_dmas(slot, ci):
        x0 = ci * TX
        cps = []
        for k, (src, dst) in enumerate((
                (un_s, un_hbm), (vn_s, vn_hbm), (wn_s, wn_hbm),
                (gu_s, gu_hbm), (gv_s, gv_hbm), (gw_s, gw_hbm))):
            cps.append(pltpu.make_async_copy(
                src.at[pl.ds(slot * TX, TX)],
                dst.at[pl.ds(x0 + H, TX)], osems.at[slot, k]))
        return cps

    for cp in in_dmas(0, 0):
        cp.start()

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)
        nxt = jax.lax.rem(ci + 1, 2)

        @pl.when(ci + 1 < NCH)
        def _prefetch():
            for cp in in_dmas(nxt, ci + 1):
                cp.start()

        for cp in in_dmas(slot, ci):
            cp.wait()

        win = pl.ds(slot * W, W)
        gu, gv, gw = _weno5_body(u_s[win], v_s[win], w_s[win], TX=TX,
                                 inv_dx=inv_dx, inv_dy=inv_dy,
                                 inv_dz=inv_dz, eps=eps)
        a = coef_ref[0]
        b = coef_ref[1]
        C = pl.ds(slot * W + H, TX)
        S = pl.ds(slot * TX, TX)

        # the output copies issued two slabs ago reused this slot's out
        # buffers; drain them before overwriting
        @pl.when(ci >= 2)
        def _drain():
            for cp in out_dmas(slot, ci - 2):
                cp.wait()

        un_s[S] = u_s[C] + a * gu + b * gum_s[S]
        vn_s[S] = v_s[C] + a * gv + b * gvm_s[S]
        wn_s[S] = w_s[C] + a * gw + b * gwm_s[S]
        gu_s[S] = gu
        gv_s[S] = gv
        gw_s[S] = gw
        for cp in out_dmas(slot, ci):
            cp.start()

    jax.lax.fori_loop(0, NCH, body, None, unroll=False)

    @pl.when(NCH >= 2)
    def _drain_penultimate():
        for cp in out_dmas(jax.lax.rem(NCH - 2, 2), NCH - 2):
            cp.wait()
    for cp in out_dmas(jax.lax.rem(NCH - 1, 2), NCH - 1):
        cp.wait()


def _weno_science_kernel(T, buoy_idx, f, refs, *, TX, inv_dx, inv_dy,
                         inv_dz, eps):
    """Fused WENO-5 SCIENCE step: momentum tendency + f-plane Coriolis +
    BuoyancyTracer forcing + T WENO-5 tracer advections + quasi-AB2
    update of every prognostic field, one HBM pass (the WENO analog of
    ``_science_kernel`` in ops/pallas_kernels.py). ``f`` and
    ``buoy_idx`` are compile-time (static model config).

    ``refs``: [coef(SMEM: a, b)] + HBM in [u, v, w, c×T, G⁻×(3+T)] +
    HBM out [u', v', w', c'×T, G×(3+T)] + scratch [win×(3+T),
    slab×(3+T) G⁻, slab×2(3+T) out, isems, osems].
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
        cp = pltpu.make_async_copy(src.at[pl.ds(x0, TX + 2 * H)], dst,
                                   isems.at[s])
        cp.start()
        cps.append(cp)
    for s, (src, dst) in enumerate(zip(hbm_in[nin:], gprev_s)):
        cp = pltpu.make_async_copy(src.at[pl.ds(x0 + H, TX)], dst,
                                   isems.at[nin + s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    u = wins[0][:]
    v = wins[1][:]
    w = wins[2][:]
    gu, gv, gw = _weno5_body(u, v, w, TX=TX, inv_dx=inv_dx,
                             inv_dy=inv_dy, inv_dz=inv_dz, eps=eps)

    def yn(a, n):
        return pltpu.roll(a, (a.shape[1] - n) % a.shape[1], 1)

    def zn(a, n):
        return pltpu.roll(a, (a.shape[2] - n) % a.shape[2], 2)

    C = slice(H, TX + H)
    if f != 0.0:
        # f-plane: Gu += f ℑxᶠ(ℑyᶜ v), Gv −= f ℑyᶠ(ℑxᶜ u)
        vv = 0.5 * (v + yn(v, 1))
        gu = gu + f * 0.5 * (vv[H - 1:H - 1 + TX] + vv[H:H + TX])
        uu = 0.5 * (u[H:H + TX] + u[H + 1:H + TX + 1])
        gv = gv - f * 0.5 * (yn(uu, -1) + uu)
    if buoy_idx is not None:
        b_c = wins[3 + buoy_idx][:][C]
        gw = gw + 0.5 * (zn(b_c, -1) + b_c)

    n_f = TX + 1
    u_f = u[H:H + n_f]
    v_c, w_c = v[C], w[C]
    gcs = []
    for t in range(T):
        c = wins[3 + t][:]
        taps = {n: c[H + n: H + n + n_f] for n in range(-3, 3)}
        fx = u_f * _weno_face(taps, u_f, eps)
        gc = -(fx[1:] - fx[:-1]) * inv_dx
        c_c = c[C]
        fy = v_c * _weno_face({n: yn(c_c, n) for n in range(-3, 3)},
                              v_c, eps)
        gc = gc - (yn(fy, 1) - fy) * inv_dy
        fz = w_c * _weno_face({n: zn(c_c, n) for n in range(-3, 3)},
                              w_c, eps)
        gc = gc - (zn(fz, 1) - fz) * inv_dz
        gcs.append(gc)

    a = coef_ref[0]
    b = coef_ref[1]
    news = [u[C] + a * gu + b * gprev_s[0][:],
            v[C] + a * gv + b * gprev_s[1][:],
            w[C] + a * gw + b * gprev_s[2][:]]
    for t in range(T):
        news.append(wins[3 + t][:][C] + a * gcs[t]
                    + b * gprev_s[3 + t][:])
    for s_ref, val in zip(outs_s, news + [gu, gv, gw] + gcs):
        s_ref[:] = val

    ocps = []
    for s, (src, dst) in enumerate(zip(outs_s, hbm_out)):
        cp = pltpu.make_async_copy(src, dst.at[pl.ds(x0 + H, TX)],
                                   osems.at[s])
        cp.start()
        ocps.append(cp)
    for cp in ocps:
        cp.wait()


def weno5_science_ab2_update(grid, u, v, w, tracers, Gu_prev, Gv_prev,
                             Gw_prev, Gc_prev, a, b, f=0.0,
                             buoyancy_tracer=None, epsilon=1e-8,
                             tile_x=None, interpret=False):
    """Fused WENO-5 SCIENCE step: momentum + f-plane Coriolis +
    BuoyancyTracer + WENO-5 tracer advections + quasi-AB2 update of
    every prognostic field in ONE HBM pass. Same contract as
    ``centered2_science_ab2_update`` (ops/pallas_kernels.py)."""
    names = list(tracers)
    T = len(names)
    buoy_idx = names.index(buoyancy_tracer) \
        if buoyancy_tracer is not None else None
    nx, ny, nz = u.shape
    if ny % 8 or nz % 128:
        raise ValueError("fused WENO AB2 kernel needs (8,128)-aligned "
                         "y/z")
    nin = 3 + T
    if tile_x is None:
        budget = 64 * 1024 * 1024
        tile_x = 8
        while tile_x > 1 and (nin * (tile_x + 2 * H) + 3 * nin * tile_x) \
                * ny * nz * u.dtype.itemsize > budget:
            tile_x //= 2
    TX = tile_x
    while TX > 1 and (nx - 2 * H) % TX:
        TX //= 2
    gx = (nx - 2 * H) // TX
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    coef = jnp.stack([jnp.asarray(a, u.dtype), jnp.asarray(b, u.dtype)])

    def kern(*refs):
        _weno_science_kernel(T, buoy_idx, float(f), refs, TX=TX,
                             inv_dx=inv_dx, inv_dy=inv_dy,
                             inv_dz=inv_dz, eps=float(epsilon))

    out_shape = [jax.ShapeDtypeStruct((nx, ny, nz), u.dtype)] * (2 * nin)
    win = pltpu.VMEM((TX + 2 * H, ny, nz), u.dtype)
    slab = pltpu.VMEM((TX, ny, nz), u.dtype)
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


def science_kernel_fits(grid, n_tracers, halo=3, itemsize=4) -> bool:
    """Would the fused science kernel's VMEM slabs fit the budget even
    at the smallest tile (tile_x = 1)? The model gates must include
    this bound: without it a many-tracer configuration fails at COMPILE
    time inside the jitted step with no XLA fallback (ADVICE r4).
    ``halo``: the x-window halo (3 for WENO-5, 1 for Centered-2)."""
    ny = grid.N[1] + 2 * grid.H[1]
    nz = grid.N[2] + 2 * grid.H[2]
    ny = -(-ny // 8) * 8
    nz = -(-nz // 128) * 128
    nin = 3 + int(n_tracers)
    need = (nin * (1 + 2 * halo) + 3 * nin) * ny * nz * itemsize
    return need <= 64 * 1024 * 1024


def weno5_ab2_available(grid, advection) -> bool:
    """Everything ``weno5_available`` needs PLUS pad-free (8, 128)
    alignment of the full y/z extents (direct full-shape HBM stores)."""
    if not weno5_available(grid, advection):
        return False
    ny = grid.N[1] + 2 * grid.H[1]
    nz = grid.N[2] + 2 * grid.H[2]
    return ny % 8 == 0 and nz % 128 == 0


def weno5_ab2_update(grid, u, v, w, Gu_prev, Gv_prev, Gw_prev, a, b,
                     epsilon=1e-8, tile_x=8, interpret=False):
    """Fused WENO-5 momentum tendency + quasi-AB2 update.

    Returns ``(u', v', w', Gu, Gv, Gw)`` with
    ``u' = u + a·Gu + b·Gu_prev`` — same contract as
    ``centered2_ab2_update`` (halos pre-filled; the velocity outputs'
    x-halo rows are unwritten; the G outputs alias G_prev's buffers)."""
    nx, ny, nz = u.shape
    if ny % 8 or nz % 128:
        raise ValueError("fused WENO AB2 kernel needs (8,128)-aligned "
                         "y/z")
    TX = tile_x
    while TX > 1 and (nx - 2 * H) % TX:
        TX //= 2
    gx = (nx - 2 * H) // TX
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    coef = jnp.stack([jnp.asarray(a, u.dtype), jnp.asarray(b, u.dtype)])
    kern = partial(_weno_ab2_pipelined_kernel, NCH=gx, TX=TX,
                   inv_dx=inv_dx, inv_dy=inv_dy, inv_dz=inv_dz,
                   eps=float(epsilon))
    out_shape = [jax.ShapeDtypeStruct((nx, ny, nz), u.dtype)] * 6
    # two slots stacked on the x axis (double buffering)
    win = pltpu.VMEM((2 * (TX + 2 * H), ny, nz), u.dtype)
    slab = pltpu.VMEM((2 * TX, ny, nz), u.dtype)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_shape=out_shape,
        scratch_shapes=[win, win, win, slab, slab, slab,
                        slab, slab, slab, slab, slab, slab,
                        pltpu.SemaphoreType.DMA((2, 6)),
                        pltpu.SemaphoreType.DMA((2, 6))],
        input_output_aliases={4: 3, 5: 4, 6: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(coef, u, v, w, Gu_prev, Gv_prev, Gw_prev)


def weno5_momentum_tendency(grid, u, v, w, epsilon=1e-8, tile_x=None,
                            interpret=False):
    """(Gu, Gv, Gw) = -div(v (x) v) with WENO-5 upwinded fluxes on a
    regular rectilinear grid, fused in one Pallas pass. Inputs are full
    halo-extended arrays with halos already filled; output halo rows are
    junk (overwritten by the caller's next halo fill). Matches the XLA
    path (``div_vu``/``div_vv``/``div_vw`` with ``WENO(5)``) to float32
    roundoff."""
    nx, ny0, nz0 = u.shape
    ny = -(-ny0 // 8) * 8
    nz = -(-nz0 // 128) * 128
    if grid.H[1] == 0 and ny != ny0:
        raise ValueError("halo-free periodic axis 1 must be a multiple "
                         "of 8")
    if grid.H[2] == 0 and nz != nz0:
        raise ValueError("halo-free periodic axis 2 must be a multiple "
                         "of 128")
    if tile_x is None:
        # largest tile whose declared blocks stay well inside VMEM
        # (measured on v5e at 256³: TX=8 is fastest — bigger slabs
        # amortize the per-program DMA and the (TX+6)/TX window overlap)
        budget = 48 * 1024 * 1024
        tile_x = 8
        while tile_x > 1 and (3 * (tile_x + 2 * H) + 3 * tile_x) \
                * ny * nz * u.dtype.itemsize > budget:
            tile_x //= 2
    if (ny, nz) != (ny0, nz0):
        pad = ((0, 0), (0, ny - ny0), (0, nz - nz0))
        u = jnp.pad(u, pad)
        v = jnp.pad(v, pad)
        w = jnp.pad(w, pad)
    TX = tile_x
    while TX > 1 and (nx - 2 * H) % TX:
        TX //= 2
    gx = (nx - 2 * H) // TX
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    kern = partial(_kernel, TX=TX, inv_dx=inv_dx, inv_dy=inv_dy,
                   inv_dz=inv_dz, eps=float(epsilon))
    out_shape = [jax.ShapeDtypeStruct((gx * TX, ny, nz), u.dtype)] * 3
    out_spec = pl.BlockSpec((TX, ny, nz), index_map=lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    gu, gv, gw = pl.pallas_call(
        kern,
        grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TX + 2 * H, ny, nz), u.dtype),
            pltpu.VMEM((TX + 2 * H, ny, nz), u.dtype),
            pltpu.VMEM((TX + 2 * H, ny, nz), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(u, v, w)

    def embed(g):
        full = jnp.zeros((nx, ny0, nz0), u.dtype)
        return full.at[H:H + gx * TX].set(g[:, :ny0, :nz0])

    return embed(gu), embed(gv), embed(gw)


def _tracer_kernel(*refs, TX, NT, inv_dx, inv_dy, inv_dz, eps):
    u_hbm, v_hbm, w_hbm = refs[:3]
    c_hbms = refs[3:3 + NT]
    g_refs = refs[3 + NT:3 + 2 * NT]
    scratches = refs[3 + 2 * NT:3 + 2 * NT + 3 + NT]
    sems = refs[-1]
    i = pl.program_id(0)
    x0 = i * TX

    cps = []
    for s, (src, dst) in enumerate(zip((u_hbm, v_hbm, w_hbm) + c_hbms,
                                       scratches)):
        cp = pltpu.make_async_copy(src.at[pl.ds(x0, TX + 2 * H)], dst,
                                   sems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    u = scratches[0][:]
    v = scratches[1][:]
    w = scratches[2][:]

    def yn(a, n):
        return pltpu.roll(a, (a.shape[1] - n) % a.shape[1], 1)

    def zn(a, n):
        return pltpu.roll(a, (a.shape[2] - n) % a.shape[2], 2)

    C = slice(H, TX + H)
    n_f = TX + 1
    u_f = u[H:H + n_f]          # u at x-faces [H, H+TX]
    v_c, w_c = v[C], w[C]
    for t in range(NT):
        c = scratches[3 + t][:]
        # x-flux at x-faces f in [H, H+TX]: u * weno_x(c, o=0); dx_c
        taps = {n: c[H + n: H + n + n_f] for n in range(-3, 3)}
        fx = u_f * _weno_face(taps, u_f, eps)
        gc = -(fx[1:] - fx[:-1]) * inv_dx
        c_c = c[C]
        # y-flux at y-faces: v * weno_y(c, o=0); dy_c: F[j+1] - F[j]
        fy = v_c * _weno_face({n: yn(c_c, n) for n in range(-3, 3)},
                              v_c, eps)
        gc = gc - (yn(fy, 1) - fy) * inv_dy
        # z-flux at z-faces: w * weno_z(c, o=0); dz_c: F[k+1] - F[k]
        fz = w_c * _weno_face({n: zn(c_c, n) for n in range(-3, 3)},
                              w_c, eps)
        gc = gc - (zn(fz, 1) - fz) * inv_dz
        g_refs[t][:] = gc


def weno5_tracer_tendencies(grid, u, v, w, tracers, epsilon=1e-8,
                            tile_x=None, interpret=False):
    """``{name: -div(v c)}`` with WENO-5 upwinded fluxes for every tracer
    in ``tracers`` (dict name -> halo-extended array), fused in one
    Pallas pass that reads the velocities ONCE for all tracers. Same
    layout contract and availability conditions as
    ``weno5_momentum_tendency`` (use ``weno5_available``); matches the
    XLA ``div_Uc`` path to float32 roundoff."""
    names = list(tracers)
    NT = len(names)
    if NT == 0:
        return {}
    nx, ny0, nz0 = u.shape
    ny = -(-ny0 // 8) * 8
    nz = -(-nz0 // 128) * 128
    if grid.H[1] == 0 and ny != ny0:
        raise ValueError("halo-free periodic axis 1 must be a multiple "
                         "of 8")
    if grid.H[2] == 0 and nz != nz0:
        raise ValueError("halo-free periodic axis 2 must be a multiple "
                         "of 128")
    if tile_x is None:
        budget = 48 * 1024 * 1024
        tile_x = 8
        while tile_x > 1 and ((3 + NT) * (tile_x + 2 * H) + NT * tile_x) \
                * ny * nz * u.dtype.itemsize > budget:
            tile_x //= 2
    arrs = [u, v, w] + [tracers[n] for n in names]
    if (ny, nz) != (ny0, nz0):
        pad = ((0, 0), (0, ny - ny0), (0, nz - nz0))
        arrs = [jnp.pad(a, pad) for a in arrs]
    TX = tile_x
    while TX > 1 and (nx - 2 * H) % TX:
        TX //= 2
    gx = (nx - 2 * H) // TX
    inv_dx = float(grid.Nx / grid.Lx) if grid.N[0] > 1 else 0.0
    inv_dy = float(grid.Ny / grid.Ly) if grid.N[1] > 1 else 0.0
    inv_dz = float(grid.Nz / grid.Lz) if grid.N[2] > 1 else 0.0

    kern = partial(_tracer_kernel, TX=TX, NT=NT, inv_dx=inv_dx,
                   inv_dy=inv_dy, inv_dz=inv_dz, eps=float(epsilon))
    out_shape = [jax.ShapeDtypeStruct((gx * TX, ny, nz), u.dtype)] * NT
    out_spec = pl.BlockSpec((TX, ny, nz), index_map=lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (3 + NT),
        out_specs=[out_spec] * NT,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((TX + 2 * H, ny, nz), u.dtype)
                        ] * (3 + NT) + [pltpu.SemaphoreType.DMA((3 + NT,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret or _config.pallas_interpret,
    )(*arrs)
    if NT == 1:
        outs = (outs,) if not isinstance(outs, (list, tuple)) else outs

    def embed(g):
        full = jnp.zeros((nx, ny0, nz0), u.dtype)
        return full.at[H:H + gx * TX].set(g[:, :ny0, :nz0])

    return {n: embed(g) for n, g in zip(names, outs)}

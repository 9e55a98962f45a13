"""Operator correctness (reference test/test_operators.jl):
difference/interpolation identities and convergence of derivatives."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    RectilinearGrid, Periodic, Bounded, Flat, Center, Face,
    fill_halo_regions, set_field,
)
from oceananigans_tpu.fields import LOC_C, LOC_U, LOC_W
from oceananigans_tpu.ops import operators as op


def periodic_line(N=64):
    return RectilinearGrid(size=(N,), x=(0, 1), topology=(Periodic, Flat, Flat))


def test_difference_and_interp_identities():
    g = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1),
                        topology=(Periodic, Periodic, Periodic))
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal(g.shape))
    c = fill_halo_regions(c, g, loc=LOC_C)
    # δx_f then sum over a periodic ring telescopes to zero
    d = op.dx_f(c)
    sx, sy, sz = g.interior_slices
    assert np.allclose(np.asarray(jnp.sum(d[sx, sy, sz], axis=0)), 0, atol=1e-12)
    # interpolating twice = 1/4 (f[i-1] + 2f[i] + f[i+1])
    ii = op.ix_c(op.ix_f(c))
    expect = 0.25 * (op.shift(c, -1, 0) + 2 * c + op.shift(c, 1, 0))
    assert np.allclose(np.asarray(ii[sx, sy, sz]),
                       np.asarray(expect[sx, sy, sz]))


def test_derivative_second_order_convergence():
    errs = []
    for N in (32, 64, 128):
        g = periodic_line(N)
        c = set_field(g, lambda x, y, z: jnp.sin(2 * np.pi * x))
        c = fill_halo_regions(c, g, loc=LOC_C)
        dcdx = op.ddx_f(g, c)
        expect = 2 * np.pi * jnp.cos(2 * np.pi * g.xF)
        errs.append(float(jnp.max(jnp.abs(g.interior(dcdx - expect)))))
    order = np.log2(errs[0] / errs[1]), np.log2(errs[1] / errs[2])
    assert all(o > 1.9 for o in order), (errs, order)


def test_divergence_of_rotational_field_is_zero():
    # u = -dψ/dy on x-faces, v = +dψ/dx on y-faces with ψ at corners (f,f)
    # => discretely divergence-free by construction
    g = RectilinearGrid(size=(32, 32), extent=(1, 1),
                        topology=(Periodic, Periodic, Flat))
    psi = set_field(g, lambda x, y, z:
                    jnp.sin(2 * np.pi * x) * jnp.sin(4 * np.pi * y),
                    loc=(Face, Face, Center))
    psi = fill_halo_regions(psi, g, loc=(Face, Face, Center))
    u = -op.dy_c(psi) / g.dy(Center, Face)
    v = op.dx_c(psi) / g.dx(Center, Face)
    u = fill_halo_regions(u, g, loc=LOC_U)
    v = fill_halo_regions(v, g, loc=(Center, Face, Center))
    div = op.divergence_ccc(g, u, v, jnp.zeros_like(u))
    assert float(jnp.max(jnp.abs(g.interior(div)))) < 1e-10


def test_laplacian_eigenfunction():
    g = RectilinearGrid(size=(64, 64), extent=(1, 1),
                        topology=(Periodic, Periodic, Flat))
    c = set_field(g, lambda x, y, z: jnp.cos(2 * np.pi * x) *
                  jnp.cos(2 * np.pi * y))
    c = fill_halo_regions(c, g, loc=LOC_C)
    lap = op.laplacian_ccc(g, c)
    # discrete eigenvalue of the 5-point Laplacian
    h = 1 / 64
    lam = -4 / h ** 2 * (np.sin(np.pi * h) ** 2 + np.sin(np.pi * h) ** 2)
    assert np.allclose(np.asarray(g.interior(lap)),
                       lam * np.asarray(g.interior(c)), rtol=1e-8)


def test_flat_axes_zero_differences():
    g = RectilinearGrid(size=(8,), x=(0, 1), topology=(Periodic, Flat, Flat))
    c = set_field(g, lambda x, y, z: x)
    assert float(jnp.max(jnp.abs(op.dy_f(c)))) == 0.0
    assert float(jnp.max(jnp.abs(op.dz_c(c)))) == 0.0


def test_vorticity_of_solid_body_rotation():
    # u = -Ω y, v = Ω x => ζ = 2Ω everywhere
    g = RectilinearGrid(size=(16, 16), x=(-1, 1), y=(-1, 1),
                        topology=(Periodic, Periodic, Flat))
    Om = 0.7
    u = set_field(g, lambda x, y, z: -Om * y, loc=LOC_U)
    v = set_field(g, lambda x, y, z: Om * x, loc=(Center, Face, Center))
    u = fill_halo_regions(u, g, loc=LOC_U)
    v = fill_halo_regions(v, g, loc=(Center, Face, Center))
    zeta = op.vorticity_z_ff(g, u, v)
    # interior away from the periodic seam (x=±1 wrap breaks linearity)
    z_in = np.asarray(g.interior(zeta))[1:-1, 1:-1]
    assert np.allclose(z_in, 2 * Om, rtol=1e-12)

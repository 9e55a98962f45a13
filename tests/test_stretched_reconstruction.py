"""Stretched-grid reconstruction coefficient tables (reference:
nonuniform branches of ``src/Advection/reconstruction_coefficients.jl``).
Uniform coefficients on a smoothly stretched grid plateau at 2nd order;
per-face tables restore the design order."""

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import Flat, Periodic, RectilinearGrid
from oceananigans_tpu.advection import Centered, WENO, div_Uc
from oceananigans_tpu.boundary_conditions import fill_halo_regions


def _err(N, scheme):
    r = np.linspace(0, 1, N + 1)
    x_faces = r + 0.15 * np.sin(2 * np.pi * r) / (2 * np.pi)
    grid = RectilinearGrid(size=(N,), x=np.asarray(x_faces),
                           topology=(Periodic, Flat, Flat), halo=4)
    if hasattr(scheme, "bind_grid"):
        scheme = scheme.bind_grid(grid)
    xF = np.asarray(grid.xF).reshape(-1)
    prim = -np.cos(2 * np.pi * xF) / (2 * np.pi)
    cavg = np.zeros(grid.shape[0])
    cavg[:-1] = np.diff(prim) / np.diff(xF)
    u = fill_halo_regions(jnp.ones(grid.shape), grid)
    c = fill_halo_regions(jnp.asarray(cavg).reshape(grid.shape), grid)
    G = div_Uc(grid, scheme, u, jnp.zeros_like(u), jnp.zeros_like(u), c)
    Gi = np.asarray(grid.interior(G)).ravel()
    sx = grid.interior_slices[0]
    i0, i1 = sx.start, sx.stop
    exact = (np.sin(2 * np.pi * xF[i0 + 1:i1 + 1])
             - np.sin(2 * np.pi * xF[i0:i1])) \
        / (xF[i0 + 1:i1 + 1] - xF[i0:i1])
    return np.abs(Gi - exact).max()


def _rate(scheme_factory):
    e1 = _err(32, scheme_factory())
    e2 = _err(64, scheme_factory())
    return np.log2(e1 / e2)


def test_centered4_stretched_is_fourth_order():
    assert _rate(lambda: Centered(4)) > 3.5


def test_weno5_stretched_is_fifth_order():
    assert _rate(lambda: WENO(5)) > 4.5


def test_uniform_tables_noop_on_regular_grid():
    """bind_grid on a regular grid returns the scheme unchanged, and a
    model on a stretched grid picks up the tables automatically."""
    from oceananigans_tpu import Bounded
    from oceananigans_tpu.models import NonhydrostaticModel

    g_reg = RectilinearGrid(size=(8,), x=(0, 1),
                            topology=(Periodic, Flat, Flat), halo=3)
    sch = Centered(4)
    assert sch.bind_grid(g_reg) is sch

    z = -np.cos(np.linspace(0, np.pi, 9)) * 0.5 - 0.5   # cheb-stretched
    g_str = RectilinearGrid(size=(8, 8), x=(0, 1), z=np.asarray(z),
                            topology=(Periodic, Flat, Bounded), halo=3)
    model = NonhydrostaticModel(grid=g_str, advection=Centered(4))
    assert getattr(model.advection, "_tables", None)
    assert (2, 0) in model.advection._tables     # z axis tabulated
    assert (2, 1) in model.advection._tables     # face->center too


def test_o1_face_to_center_stretched_is_fourth_order():
    """The o=1 (face-located data → centers) target, used by the
    momentum flux assemblies, also gets per-point tables."""
    def errs(N, bind):
        r = np.linspace(0, 1, N + 1)
        xf = r + 0.15 * np.sin(2 * np.pi * r) / (2 * np.pi)
        grid = RectilinearGrid(size=(N,), x=np.asarray(xf),
                               topology=(Periodic, Flat, Flat), halo=4)
        sch = Centered(4)
        if bind:
            sch = sch.bind_grid(grid)
        xC = np.asarray(grid.xC).reshape(-1)
        prim = -np.cos(2 * np.pi * xC) / (2 * np.pi)
        u = np.zeros(grid.shape[0])
        u[1:] = np.diff(prim) / np.diff(xC)
        u[0] = u[grid.N[0]]
        val = np.asarray(sch.reconstruct(
            jnp.asarray(u).reshape(grid.shape), 0, 1)).ravel()
        sx = grid.interior_slices[0]
        return np.abs(val[sx] - np.sin(2 * np.pi * xC)[sx]).max()

    e_uni = [errs(N, False) for N in (32, 64)]
    e_tab = [errs(N, True) for N in (32, 64)]
    assert np.log2(e_uni[0] / e_uni[1]) < 3.0       # uniform plateaus
    assert np.log2(e_tab[0] / e_tab[1]) > 3.5       # tables restore 4th

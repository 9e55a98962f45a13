"""Intrinsic <-> extrinsic vector rotation on curvilinear grids.

Reference: ``src/Operators/vector_rotation_operators.jl``.
"""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import RectilinearGrid, TripolarGrid
from oceananigans_tpu.grids.orthogonal import (
    RotatedLatitudeLongitudeGrid, extrinsic_vector, intrinsic_vector,
    rotation_angles,
)


def test_identity_on_rectilinear():
    g = RectilinearGrid(size=(4, 4, 4), x=(0, 1), y=(0, 1), z=(0, 1))
    cos, sin = rotation_angles(g)
    assert cos == 1.0 and sin == 0.0
    u, v = jnp.ones((4, 4, 4)), 2 * jnp.ones((4, 4, 4))
    ui, vi = intrinsic_vector(g, u, v)
    np.testing.assert_array_equal(np.asarray(ui), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(v))


def test_tripolar_southern_rows_are_latlon_aligned():
    """South of the fold the tripolar grid IS lat-lon, so θ ≈ 0 — and j
    increases northward, so the geographic north vector maps to +y."""
    g = TripolarGrid(size=(32, 24, 1), southernmost_latitude=-80.0,
                     z=(-1.0, 0.0), halo=2)
    cos, sin = rotation_angles(g)
    cos = np.asarray(cos)[:, :, 0]
    sin = np.asarray(sin)[:, :, 0]
    sx, sy, _ = g.interior_slices
    # southernmost interior rows: nearly lat-lon (this TripolarGrid
    # blends toward the Murray coordinates gradually, so the frames
    # align only approximately even in the south)
    rows = slice(sy.start, sy.start + 2)
    assert np.abs(cos[sx, rows] - 1.0).max() < 1e-4
    assert np.abs(sin[sx, rows]).max() < 5e-3


def test_roundtrip_and_norm_preservation_rotated_grid():
    g = RotatedLatitudeLongitudeGrid(size=(16, 16, 1), longitude=(-40, 40),
                                     latitude=(-30, 30), z=(-1.0, 0.0),
                                     north_pole=(180.0, 30.0), halo=2)
    cos, sin = rotation_angles(g)
    sx, sy, _ = g.interior_slices
    # the rotated pole makes the frames genuinely differ somewhere
    assert np.abs(np.asarray(sin)[sx, sy]).max() > 0.1
    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.standard_normal(g.shape))
    ve = jnp.asarray(rng.standard_normal(g.shape))
    ui, vi = intrinsic_vector(g, ue, ve)
    ue2, ve2 = extrinsic_vector(g, ui, vi)
    S = (sx, sy, slice(None))
    np.testing.assert_allclose(np.asarray(ue2[S]), np.asarray(ue[S]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(ve2[S]), np.asarray(ve[S]),
                               atol=1e-12)
    n1 = np.asarray(ue ** 2 + ve ** 2)[S]
    n2 = np.asarray(ui ** 2 + vi ** 2)[S]
    np.testing.assert_allclose(n2, n1, rtol=1e-12)


def test_rotation_matches_rotated_grid_geometry():
    """On a RotatedLatitudeLongitudeGrid the intrinsic x-direction is the
    rotated-east direction; check the computed angle against the analytic
    bearing of the rotated-east unit vector at a few interior centers."""
    np_pole = (180.0, 40.0)
    g = RotatedLatitudeLongitudeGrid(size=(24, 24, 1), longitude=(-50, 50),
                                     latitude=(-40, 40), z=(-1.0, 0.0),
                                     north_pole=np_pole, halo=2)
    cos, sin = rotation_angles(g)
    cos = np.asarray(cos)[:, :, 0]
    sin = np.asarray(sin)[:, :, 0]

    # analytic: differentiate the geographic coords along the grid's x
    # at fixed rotated latitude using the grid's own cc nodes (second
    # order): tan θ = dφ/ds_x term vs dλ cos φ term
    lam = np.asarray(g.lamCC)[:, :, 0]
    phi = np.asarray(g.phiCC)[:, :, 0]
    sx, sy, _ = g.interior_slices
    ii = [sx.start + 4, sx.start + 12, sx.start + 19]
    jj = [sy.start + 4, sy.start + 12, sy.start + 19]
    for i in ii:
        for j in jj:
            dlam = (lam[i + 1, j] - lam[i - 1, j] + 540) % 360 - 180
            dphi = phi[i + 1, j] - phi[i - 1, j]
            east = dlam * np.cos(np.deg2rad(phi[i, j]))
            north = dphi
            r = np.hypot(east, north)
            # grid x-direction expressed in (east, north) must equal
            # (cosθ, sinθ)...
            assert abs(east / r - cos[i, j]) < 5e-3, (i, j)
            assert abs(north / r - sin[i, j]) < 5e-3, (i, j)
            # ...equivalently, the geographic vector pointing along
            # grid-x maps to (1, 0) in the intrinsic frame
            ui = (east / r) * cos[i, j] + (north / r) * sin[i, j]
            vi = -(east / r) * sin[i, j] + (north / r) * cos[i, j]
            assert abs(ui - 1.0) < 1e-4 and abs(vi) < 5e-3, (i, j, ui, vi)

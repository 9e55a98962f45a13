"""LatitudeLongitudeGrid: spherical-polar C-grid with curvature metrics.

Reference: ``src/Grids/latitude_longitude_grid.jl:3`` and the metric
definitions in ``src/Operators/spacings_and_areas_and_volumes.jl``. The
horizontal metrics are separable products of 1-D factors
(``Δx = R cosφ Δλ``, ``Az = R² Δλ Δ(sinφ)``); we store the 1-D factors and
let XLA fuse the broadcast-product into consuming stencils, instead of
materializing 2-D metric arrays like the reference's
``precompute_metrics=true`` path.
"""

from __future__ import annotations

import numpy as np

from oceananigans_tpu.config import config
from oceananigans_tpu.grids.base import (
    AbstractGrid, Bounded, Center, Flat, Periodic,
    broadcastable, generate_coordinate, register_grid,
)

#: mean Earth radius [m] (reference ``src/Grids/Grids.jl`` `R_Earth`)
R_EARTH = 6_371_000.0


class LatitudeLongitudeGrid(AbstractGrid):
    """Spherical shell C-grid on (longitude λ [deg], latitude φ [deg], z [m]).

    ``longitude=(λW, λE)`` (periodic when spanning 360°, else bounded),
    ``latitude=(φS, φN)`` (bounded), ``z`` like RectilinearGrid. Stretched
    specs (face arrays / callables) are accepted per axis.
    """

    def __init__(self, size, longitude=None, latitude=None, z=None,
                 radius=R_EARTH, topology=None, halo=None, dtype=None):
        if dtype is None:
            dtype = config.float_dtype
        dtype = np.dtype(dtype)
        if halo is None:
            halo = config.halo

        if topology is None:
            lon_span = (longitude[1] - longitude[0]
                        if isinstance(longitude, tuple) else None)
            TX = Periodic if (lon_span is not None
                              and abs(lon_span - 360.0) < 1e-10) else Bounded
            topology = (TX, Bounded, Bounded)

        if len(size) == 2 and topology[2] == Flat:
            size = (size[0], size[1], 1)
        Nx, Ny, Nz = size

        lamF, lamC, dlamC, dlamF, lam_reg, Lx = generate_coordinate(
            longitude, Nx, min(halo, Nx), topology[0], np.float64)
        phiF, phiC, dphiC, dphiF, phi_reg, Ly = generate_coordinate(
            latitude, Ny, min(halo, Ny), topology[1], np.float64)
        zF, zC, dzC, dzF, z_reg, Lz = generate_coordinate(
            z, Nz, (0 if topology[2] == Flat else min(halo, Nz)),
            topology[2], np.float64)

        deg = np.pi / 180.0
        # 1-D metric factors (float64 on host, cast at the end)
        dx_lam_C = radius * deg * dlamC          # R Δλ at centers  (i)
        dx_lam_F = radius * deg * dlamF          # R Δλ at faces    (i)
        # |cos φ| mirrors halo rows beyond the poles (φ > 90° ghosts of a
        # pole-reaching grid), floored so pole-row divisions stay finite
        # (reference: polar_boundary_condition.jl handles the pole rows)
        cos_floor = 1e-4
        cos_C = np.maximum(np.abs(np.cos(deg * phiC)), cos_floor)
        cos_F = np.maximum(np.abs(np.cos(deg * phiF)), cos_floor)
        dy_C = radius * deg * dphiC              # R Δφ at centers  (j)
        dy_F = radius * deg * dphiF              # R Δφ at faces    (j)
        # Δ(sinφ) factors for exact spherical areas Az = R² Δλ Δsinφ
        # (reference Azᶜᶜᵃ, spacings_and_areas_and_volumes.jl)
        sinF = np.sin(deg * phiF)
        sinC = np.sin(deg * phiC)
        dsin_C = np.empty_like(sinC)             # at centers: sinφF[j+1]-sinφF[j]
        dsin_C[:-1] = sinF[1:] - sinF[:-1]
        dsin_C[-1] = dsin_C[-2]
        dsin_F = np.empty_like(sinC)             # at faces: sinφC[j]-sinφC[j-1]
        dsin_F[1:] = sinC[1:] - sinC[:-1]
        dsin_F[0] = dsin_F[1]
        # polar halo rows: keep areas positive (ghosts over the pole)
        floor_C = cos_floor * deg * np.abs(dphiC)
        floor_F = cos_floor * deg * np.abs(dphiF)
        dsin_C = np.maximum(np.abs(dsin_C), floor_C)
        dsin_F = np.maximum(np.abs(dsin_F), floor_F)

        s = object.__setattr__
        s(self, "Nx", int(Nx)); s(self, "Ny", int(Ny)); s(self, "Nz", int(Nz))
        s(self, "Hx", min(halo, Nx)); s(self, "Hy", min(halo, Ny))
        s(self, "Hz", 0 if topology[2] == Flat else min(halo, Nz))
        s(self, "topology", tuple(topology))
        s(self, "radius", float(radius))
        s(self, "x_regular", bool(lam_reg)); s(self, "y_regular", bool(phi_reg))
        s(self, "z_regular", bool(z_reg))
        s(self, "Lx", float(Lx)); s(self, "Ly", float(Ly)); s(self, "Lz", float(Lz))

        def bx(a): return broadcastable(a.astype(dtype), 0)
        def by(a): return broadcastable(a.astype(dtype), 1)
        def bz(a): return broadcastable(a.astype(dtype), 2)

        s(self, "lamF", bx(lamF)); s(self, "lamC", bx(lamC))
        s(self, "phiF", by(phiF)); s(self, "phiC", by(phiC))
        s(self, "zF", bz(zF)); s(self, "zC", bz(zC))
        s(self, "dzC_", bz(dzC)); s(self, "dzF_", bz(dzF))
        s(self, "dxlamC", bx(dx_lam_C)); s(self, "dxlamF", bx(dx_lam_F))
        s(self, "cosC", by(cos_C)); s(self, "cosF", by(cos_F))
        s(self, "dyC_", by(dy_C)); s(self, "dyF_", by(dy_F))
        s(self, "dsinC", by(dsin_C)); s(self, "dsinF", by(dsin_F))

    # node queries reuse base via aliases
    @property
    def xF(self): return self.lamF
    @property
    def xC(self): return self.lamC
    @property
    def yF(self): return self.phiF
    @property
    def yC(self): return self.phiC

    # ---- metrics ---------------------------------------------------------
    def dx(self, lx=Center, ly=Center):
        dlam = self.dxlamC if lx == Center else self.dxlamF
        cphi = self.cosC if ly == Center else self.cosF
        return dlam * cphi

    def dy(self, ly=Center, lx=Center):
        return self.dyC_ if ly == Center else self.dyF_

    def dz(self, lz=Center):
        return self.dzC_ if lz == Center else self.dzF_

    def Az(self, lx, ly, lz=None):
        dlam = self.dxlamC if lx == Center else self.dxlamF
        dsin = self.dsinC if ly == Center else self.dsinF
        return self.radius * dlam * dsin

    def __repr__(self):
        return (f"LatitudeLongitudeGrid(size=({self.Nx}, {self.Ny}, "
                f"{self.Nz}), topology={self.topology}, radius={self.radius:g})")


register_grid(
    LatitudeLongitudeGrid,
    data_fields=["lamF", "lamC", "phiF", "phiC", "zF", "zC", "dzC_", "dzF_",
                 "dxlamC", "dxlamF", "cosC", "cosF", "dyC_", "dyF_",
                 "dsinC", "dsinF"],
    meta_fields=["Nx", "Ny", "Nz", "Hx", "Hy", "Hz", "topology", "radius",
                 "x_regular", "y_regular", "z_regular", "Lx", "Ly", "Lz"],
)

"""RectilinearGrid: Cartesian staggered grid, regular or stretched per axis.

Reference: ``src/Grids/rectilinear_grid.jl`` (struct at :1-23). The reference
encodes per-axis regularity in type parameters (``XRegularRG`` aliases,
:41-58) for solver dispatch; here they are plain boolean static flags
(``x_regular``...) consulted at trace time.
"""

from __future__ import annotations

import numpy as np

from oceananigans_tpu.config import config
from oceananigans_tpu.grids.base import (
    AbstractGrid, Bounded, Center, Flat, Periodic,
    broadcastable, generate_coordinate, register_grid,
)


def _expand_per_axis(values, topology, what):
    """Distribute a user tuple over the non-Flat axes (the reference lets
    users write ``size=(Nx, Ny)`` for a 2-D grid with one Flat axis,
    ``src/Grids/input_validation.jl``)."""
    non_flat = [i for i, t in enumerate(topology) if t != Flat]
    if not isinstance(values, (tuple, list)):
        values = (values,)
    if len(values) != len(non_flat):
        raise ValueError(f"{what}={values} does not match the {len(non_flat)} "
                         f"non-flat axes of topology {topology}")
    full = [None, None, None]
    for i, v in zip(non_flat, values):
        full[i] = v
    return tuple(full)


class RectilinearGrid(AbstractGrid):
    """Cartesian C-grid.

    Per-axis coordinate specs (``x=``, ``y=``, ``z=``) are a 2-tuple
    ``(left, right)`` (regular spacing), an array of ``N+1`` faces, or a
    callable ``i -> face`` (stretched); ``extent=(Lx, Ly, Lz)`` is shorthand
    for ``x=(0, Lx), y=(0, Ly), z=(-Lz, 0)``. Flat axes are dropped from
    ``size``/``extent``, mirroring the reference constructor.
    """

    def __init__(self, size, x=None, y=None, z=None, extent=None,
                 topology=None, halo=None, dtype=None):
        if topology is None:
            topology = (Periodic, Periodic, Bounded)
        if dtype is None:
            dtype = config.float_dtype
        dtype = np.dtype(dtype)
        if halo is None:
            halo = config.halo

        if extent is not None:
            exts = _expand_per_axis(extent, topology, "extent")
            x = (0.0, exts[0]) if exts[0] is not None else None
            y = (0.0, exts[1]) if exts[1] is not None else None
            z = (-exts[2], 0.0) if exts[2] is not None else None

        sizes = _expand_per_axis(size, topology, "size")
        specs = [x, y, z]
        for axis, (name, topo) in enumerate(zip("xyz", topology)):
            if topo != Flat and specs[axis] is None:
                raise ValueError(f"missing coordinate spec {name}= for "
                                 f"non-flat axis {axis}")

        halos = (tuple(halo) if isinstance(halo, (tuple, list))
                 else (halo, halo, halo))
        Ns, Hs, regs, Ls, coords = [], [], [], [], []
        for axis in range(3):
            topo = topology[axis]
            N = 1 if topo == Flat else sizes[axis]
            H = 0 if topo == Flat else min(halos[axis], N)
            F, C, dC, dF, regular, L = generate_coordinate(
                specs[axis], N, H, topo, dtype)
            Ns.append(int(N))
            Hs.append(int(H))
            regs.append(bool(regular))
            Ls.append(float(L))
            coords.append((broadcastable(F, axis), broadcastable(C, axis),
                           broadcastable(dC, axis), broadcastable(dF, axis)))

        s = object.__setattr__
        s(self, "Nx", Ns[0]); s(self, "Ny", Ns[1]); s(self, "Nz", Ns[2])
        s(self, "Hx", Hs[0]); s(self, "Hy", Hs[1]); s(self, "Hz", Hs[2])
        s(self, "topology", tuple(topology))
        s(self, "x_regular", regs[0]); s(self, "y_regular", regs[1])
        s(self, "z_regular", regs[2])
        s(self, "Lx", Ls[0]); s(self, "Ly", Ls[1]); s(self, "Lz", Ls[2])
        s(self, "xF", coords[0][0]); s(self, "xC", coords[0][1])
        s(self, "dxC_", coords[0][2]); s(self, "dxF_", coords[0][3])
        s(self, "yF", coords[1][0]); s(self, "yC", coords[1][1])
        s(self, "dyC_", coords[1][2]); s(self, "dyF_", coords[1][3])
        s(self, "zF", coords[2][0]); s(self, "zC", coords[2][1])
        s(self, "dzC_", coords[2][2]); s(self, "dzF_", coords[2][3])

    # ---- metrics ---------------------------------------------------------
    def dx(self, lx=Center, ly=Center):
        return self.dxC_ if lx == Center else self.dxF_

    def dy(self, ly=Center, lx=Center):
        return self.dyC_ if ly == Center else self.dyF_

    def dz(self, lz=Center):
        return self.dzC_ if lz == Center else self.dzF_

    @property
    def regular(self):
        return self.x_regular and self.y_regular and self.z_regular

    def __repr__(self):
        tx, ty, tz = self.topology
        return (f"RectilinearGrid(size=({self.Nx}, {self.Ny}, {self.Nz}), "
                f"topology=({tx}, {ty}, {tz}), halo={self.H}, "
                f"extent=({self.Lx:g}, {self.Ly:g}, {self.Lz:g}))")


register_grid(
    RectilinearGrid,
    data_fields=["xF", "xC", "dxC_", "dxF_", "yF", "yC", "dyC_", "dyF_",
                 "zF", "zC", "dzC_", "dzF_"],
    meta_fields=["Nx", "Ny", "Nz", "Hx", "Hy", "Hz", "topology",
                 "x_regular", "y_regular", "z_regular", "Lx", "Ly", "Lz"],
)

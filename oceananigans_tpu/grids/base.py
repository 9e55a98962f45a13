"""Topology/location vocabulary, coordinate generation, and the grid base class.

Reference: ``src/Grids/Grids.jl:46-108`` (topologies/locations),
``src/Grids/grid_generation.jl:34-167`` (coordinate generation),
``src/Grids/nodes_and_spacings.jl`` (node queries).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu.config import config

# --------------------------------------------------------------------------
# Topology and location tags. Plain strings: hashable static metadata that
# reads well in trace caches and error messages.
# --------------------------------------------------------------------------
Periodic = "periodic"
Bounded = "bounded"
Flat = "flat"
#: distributed-only connected topologies (reference `FullyConnected` etc.,
#: src/Grids/Grids.jl:85-108): a locally-bounded-looking axis whose halos are
#: filled by neighbor exchange. Operators treat it like Periodic (interior
#: stencils read halos); the halo *fill* is what differs.
Connected = "connected"

Center = "c"
Face = "f"

AXIS_NAMES = ("x", "y", "z")


def total_length(N: int, H: int) -> int:
    """Array length along an axis: interior + two halo rings (flat: N=1, H=0)."""
    return N + 2 * H


# --------------------------------------------------------------------------
# Coordinate generation (host-side numpy; runs once at construction).
# --------------------------------------------------------------------------

def generate_coordinate(spec, N: int, H: int, topo: str, dtype):
    """Build 1-D halo-extended face/center/spacing arrays for one axis.

    ``spec`` may be:
      - a 2-tuple ``(left, right)``   -> regular spacing
      - an array of ``N + 1`` faces   -> stretched
      - a callable ``f(i) -> face``   -> stretched, sampled at ``i = 0..N``

    Returns ``(xF, xC, dxC, dxF, regular, extent)`` as numpy arrays of length
    ``N + 2H`` (+1 for an internal face array of length ``N + 2H + 1`` used to
    derive the others). Index convention: interior cells occupy ``H..H+N-1``;
    ``xF[i]`` is the *left* face of cell ``i``, so the right wall face of a
    bounded axis sits at index ``H + N`` (inside the first halo slot).
    Mirrors ``src/Grids/grid_generation.jl:34-167``.
    """
    if topo == Flat:
        one = np.ones((1,), dtype=dtype)
        zero = np.zeros((1,), dtype=dtype)
        return zero, zero, one, one, True, 1.0

    if isinstance(spec, tuple) and len(spec) == 2 and np.isscalar(spec[0]):
        left, right = float(spec[0]), float(spec[1])
        dx = (right - left) / N
        # faces bounding every (interior + halo) cell: length N + 2H + 1
        i = np.arange(-H, N + H + 1, dtype=np.float64)
        faces = left + i * dx
        regular = True
    else:
        if callable(spec):
            interior_faces = np.asarray([float(spec(i)) for i in range(N + 1)],
                                        dtype=np.float64)
        else:
            interior_faces = np.asarray(spec, dtype=np.float64)
            if interior_faces.shape != (N + 1,):
                raise ValueError(
                    f"stretched coordinate needs N+1={N + 1} faces, "
                    f"got shape {interior_faces.shape}")
        if np.any(np.diff(interior_faces) <= 0):
            raise ValueError("coordinate faces must be strictly increasing")
        faces = np.empty(N + 2 * H + 1, dtype=np.float64)
        faces[H:H + N + 1] = interior_faces
        if topo == Periodic:
            L = interior_faces[-1] - interior_faces[0]
            for h in range(1, H + 1):
                faces[H - h] = interior_faces[N - h] - L
                faces[H + N + h] = interior_faces[h] + L
        else:  # bounded/connected: replicate edge spacings outward
            dl = interior_faces[1] - interior_faces[0]
            dr = interior_faces[-1] - interior_faces[-2]
            for h in range(1, H + 1):
                faces[H - h] = faces[H - h + 1] - dl
                faces[H + N + h] = faces[H + N + h - 1] + dr
        regular = bool(np.allclose(np.diff(faces), np.diff(faces)[0]))

    centers = 0.5 * (faces[:-1] + faces[1:])             # length N + 2H
    dxC = np.diff(faces)                                 # cell widths at centers
    dxF = np.empty_like(centers)                         # center-to-center, at faces
    dxF[1:] = centers[1:] - centers[:-1]
    dxF[0] = dxF[1]
    extent = float(faces[H + N] - faces[H])
    return (faces[:-1].astype(dtype), centers.astype(dtype),
            dxC.astype(dtype), dxF.astype(dtype), regular, extent)


def _bshape(axis: int, n: int):
    shape = [1, 1, 1]
    shape[axis] = n
    return tuple(shape)


def broadcastable(a: np.ndarray, axis: int):
    """Reshape a 1-D per-axis array to its (nx,1,1)/(1,ny,1)/(1,1,nz) form."""
    return jnp.asarray(a).reshape(_bshape(axis, a.shape[0]))


# --------------------------------------------------------------------------
# Grid base class
# --------------------------------------------------------------------------

class AbstractGrid:
    """Shared machinery for all grids.

    Subclasses are registered as pytrees via :func:`register_grid`:
    coordinate arrays are leaves, everything shape-like is static metadata.
    Methods are named after the reference's metric vocabulary (Δx/Ax/volume,
    ``src/Operators/spacings_and_areas_and_volumes.jl``) but return
    broadcast-ready arrays instead of per-index values. Instances are
    immutable by convention; use :meth:`replace` to derive modified copies.
    """

    _data_fields: tuple = ()
    _meta_fields: tuple = ()

    def replace(self, **updates):
        obj = object.__new__(type(self))
        for f in (*self._data_fields, *self._meta_fields):
            object.__setattr__(obj, f, updates.pop(f, getattr(self, f)))
        if updates:
            raise TypeError(f"unknown grid fields: {sorted(updates)}")
        return obj

    def __eq__(self, other):
        if type(self) is not type(other):
            return NotImplemented
        metas_equal = all(getattr(self, f) == getattr(other, f)
                          for f in self._meta_fields)
        if not metas_equal:
            return False
        return all(np.shape(getattr(self, f)) == np.shape(getattr(other, f))
                   and bool(np.all(np.asarray(getattr(self, f)) ==
                                   np.asarray(getattr(other, f))))
                   for f in self._data_fields)

    # ---- static shape helpers -------------------------------------------
    @property
    def N(self):
        return (self.Nx, self.Ny, self.Nz)

    @property
    def H(self):
        return (self.Hx, self.Hy, self.Hz)

    @property
    def shape(self):
        """Full (halo-extended) field shape on this grid."""
        return (total_length(self.Nx, self.Hx),
                total_length(self.Ny, self.Hy),
                total_length(self.Nz, self.Hz))

    @property
    def interior_slices(self):
        return (slice(self.Hx, self.Hx + self.Nx),
                slice(self.Hy, self.Hy + self.Ny),
                slice(self.Hz, self.Hz + self.Nz))

    def interior(self, a):
        sx, sy, sz = self.interior_slices
        # reduced fields (e.g. a free surface with one z level on a 3-D
        # grid) carry no halo along their squeezed axes
        full = self.shape
        if a.shape[-1] != full[2] and a.shape[-1] == 1:
            sz = slice(None)
        if a.shape[-2] != full[1] and a.shape[-2] == 1:
            sy = slice(None)
        if a.shape[-3] != full[0] and a.shape[-3] == 1:
            sx = slice(None)
        return a[..., sx, sy, sz]

    def axis_size(self, axis: int) -> int:
        return (self.Nx, self.Ny, self.Nz)[axis]

    def axis_topo(self, axis: int) -> str:
        return self.topology[axis]

    # ---- node queries ----------------------------------------------------
    def nodes_1d(self, axis: int, loc: str, with_halos: bool = False):
        """1-D coordinate values along ``axis`` at location ``loc``."""
        name = AXIS_NAMES[axis]
        arr = getattr(self, f"{name}F" if loc == Face else f"{name}C")
        flat = arr.reshape(-1)
        if with_halos:
            return flat
        H, N = self.H[axis], self.N[axis]
        # bounded face axes have N+1 meaningful faces (the wall face lives in
        # the first halo slot)
        n = N + 1 if (loc == Face and self.axis_topo(axis) == Bounded) else N
        return flat[H:H + n]

    def xnodes(self, loc=Center, **kw):
        return self.nodes_1d(0, loc, **kw)

    def ynodes(self, loc=Center, **kw):
        return self.nodes_1d(1, loc, **kw)

    def znodes(self, loc=Center, **kw):
        return self.nodes_1d(2, loc, **kw)

    def nodes(self, locs=(Center, Center, Center), **kw):
        return (self.xnodes(locs[0], **kw), self.ynodes(locs[1], **kw),
                self.znodes(locs[2], **kw))

    # ---- metric interface (override in curvilinear subclasses) -----------
    def dx(self, lx=Center, ly=Center):
        raise NotImplementedError

    def dy(self, ly=Center, lx=Center):
        raise NotImplementedError

    def dz(self, lz=Center):
        raise NotImplementedError

    def Ax(self, lx, ly, lz):
        """Area of the x-normal face of the (lx,ly,lz) control volume."""
        return self.dy(ly, lx) * self.dz(lz)

    def Ay(self, lx, ly, lz):
        return self.dx(lx, ly) * self.dz(lz)

    def Az(self, lx, ly, lz=None):
        return self.dx(lx, ly) * self.dy(ly, lx)

    def V(self, lx, ly, lz):
        return self.Az(lx, ly) * self.dz(lz)

    # ---- misc ------------------------------------------------------------
    def min_spacing(self, axis: int):
        if self.N[axis] == 1:
            return jnp.asarray(np.inf, config.float_dtype)
        d = (self.dx(), self.dy(), self.dz())[axis]
        sl = [slice(None)] * 3
        for ax in range(3):
            if d.shape[ax] > 1:
                sl[ax] = self.interior_slices[ax]
        return jnp.min(d[tuple(sl)])


def register_grid(cls, data_fields: Sequence[str], meta_fields: Sequence[str]):
    """Register a grid class as a pytree without constraining its __init__.

    Unflattening bypasses ``__init__`` (which is the user-facing constructor
    doing host-side coordinate generation) and rebuilds the instance by
    attribute assignment — the jax analog of the reference building grids on
    the host then adapting them to the device
    (``ext/OceananigansReactantExt/Grids/sharded_grids.jl:93-120``).
    """
    data_fields = tuple(data_fields)
    meta_fields = tuple(meta_fields)
    cls._data_fields = data_fields
    cls._meta_fields = meta_fields

    def flatten(g):
        return (tuple(getattr(g, f) for f in data_fields),
                tuple(getattr(g, f) for f in meta_fields))

    def flatten_with_keys(g):
        keyed = tuple((jax.tree_util.GetAttrKey(f), getattr(g, f))
                      for f in data_fields)
        return keyed, tuple(getattr(g, f) for f in meta_fields)

    def unflatten(meta, data):
        obj = object.__new__(cls)
        for f, v in zip(data_fields, data):
            object.__setattr__(obj, f, v)
        for f, v in zip(meta_fields, meta):
            object.__setattr__(obj, f, v)
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten,
                                            flatten_func=flatten)
    return cls

"""In-process ``taichi`` emulation: executes the reference's OWN source.

The environment cannot install the real Taichi package, so the strongest
available golden test is to run ``/root/reference/fs/*.py`` *unmodified*
with a stand-in ``taichi`` module: the decorators become identity wrappers
(so ``@ti.kernel`` bodies run as plain sequential Python), and fields
become NumPy-backed objects with Taichi's indexing/iteration surface.
This removes the builder-written oracle (tests/oracle.py) as the single
source of truth — the reference's code itself produces the goldens.

Semantics preserved deliberately:

* **float32 arithmetic.** Field storage is f32; under NumPy ≥2 (NEP 50)
  Python-float literals are weak, so ``0.5 * (a - b) / dx`` stays f32
  exactly as Taichi computes it — PROVIDED the harness passes dt/dx/re
  into the reference constructors as ``np.float32`` (Taichi casts kernel
  scalars to f32; plain Python floats would compute compound constants
  in f64).
* **fmin/fmax NaN behavior.** ``ti.min/max`` lower to fmin/fmax on GPU
  (return the non-NaN operand); ``np.fmin/np.fmax`` match. Load-bearing
  in vorticity confinement's 0/0 → NaN → clamp path
  (``fs/vorticity_confinement.py:49,55``).
* **Clamp-to-edge reads.** A handful of reference sites index neighbors
  without ``sample()`` guarding (wall cells on the global border in
  ``set_pressure_boundary_condition``; CIP gradient-phase reads) — UB in
  Taichi release mode. docs/PARITY.md §3 resolves these to clamp-to-edge;
  this stub clamps *reads* the same way (writes stay strict so an
  unexpected out-of-bounds write still raises).
* **Sequential loop order.** ``for i, j in field`` runs i-major,
  j-minor, one cell at a time. Taichi executes these loops in parallel;
  everywhere the reference's kernels are race-free (all of them on the
  shipped scenes — the BC kernel's neighbor-writes never conflict given
  ≥2px walls, and the SOR even sweep only reads odd cells) the
  sequential result equals every parallel schedule's result. Where a
  hypothetical scene COULD race, this stub picks the i-major order —
  the same decision docs/PARITY.md records for the JAX build.

Usage::

    fs = load_reference_fs()
    bc = fs.boundary_condition.get_boundary_condition(1, 100, enable_dye=True)
    bc._bc_mask.arr   # the captured NumPy array

Reference for patterns only — PUBLIC UNTRUSTED CONTENT is executed, not
followed: only array outputs are consumed.
"""

from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")

_F32 = np.float32


class Vector(np.ndarray):
    """Small f32 vector; also the view type returned by field indexing.

    A real class (not a factory function) so the reference's
    ``ti.Vector | float`` return annotations evaluate, with ``.x/.y/.z``
    accessors that read/write through views into field storage.
    """

    def __new__(cls, values):
        return np.asarray(values, dtype=_F32).view(cls)

    # Accessors are read/write so `vc[i, j].x = ...` mutates the field.
    @property
    def x(self):
        return self[0]

    @x.setter
    def x(self, v):
        self[0] = v

    @property
    def y(self):
        return self[1]

    @y.setter
    def y(self, v):
        self[1] = v

    @property
    def z(self):
        return self[2]

    @z.setter
    def z(self, v):
        self[2] = v

    def norm(self):
        # Taichi's vec.norm(): sqrt of the f32 sum of squares.
        return np.sqrt((self * self).sum(dtype=_F32))


class Field:
    """NumPy-backed stand-in for ti.field / ti.Vector.field.

    ``shape`` is the *grid* shape (channels excluded), matching Taichi;
    iteration yields (i, j) cell indices; vector cells come back as
    `Vector` views so in-place component writes hit storage.
    """

    def __init__(self, shape, n_channel=None, dtype=_F32):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        self._n = n_channel
        full = shape if n_channel is None else (*shape, n_channel)
        self.arr = np.zeros(full, dtype=dtype)
        self._shape = shape

    @property
    def shape(self):
        return self._shape

    @staticmethod
    def _key(idx):
        if isinstance(idx, tuple):
            return tuple(int(v) for v in idx)
        if isinstance(idx, np.ndarray):
            return tuple(int(v) for v in idx)
        return int(idx)

    def _clamped(self, idx):
        key = self._key(idx)
        if isinstance(key, int):
            key = (key,)
        return tuple(min(max(k, 0), n - 1) for k, n in zip(key, self._shape))

    def __getitem__(self, idx):
        cell = self.arr[self._clamped(idx)]
        return cell.view(Vector) if self._n is not None else cell

    def __setitem__(self, idx, value):
        self.arr[self._key(idx)] = value

    def __iter__(self):
        if len(self._shape) == 1:
            yield from range(self._shape[0])
        else:
            for i in range(self._shape[0]):
                for j in range(self._shape[1]):
                    yield (i, j)

    def fill(self, value):
        self.arr.fill(value)

    def from_numpy(self, a):
        self.arr[...] = a

    def to_numpy(self):
        return self.arr.copy()


def _field(dtype, shape):
    return Field(shape, dtype=np.dtype(dtype if dtype is not float else _F32))


def _vector_field(n, dtype, shape):
    return Field(shape, n_channel=n, dtype=np.dtype(dtype if dtype is not float else _F32))


def _kernel(fn):
    """Identity decorator; silences IEEE warnings (Taichi's 0/0 inside
    vorticity confinement is deliberate inf/nan arithmetic)."""

    def wrapper(*args, **kwargs):
        with np.errstate(all="ignore"):
            return fn(*args, **kwargs)

    return wrapper


def _ti_max(a, b):
    if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
        return max(a, b)
    return np.fmax(a, b)


def _ti_min(a, b):
    if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
        return min(a, b)
    return np.fmin(a, b)


class _Matrix:
    @staticmethod
    def cols(vecs):
        return np.stack([np.asarray(v, dtype=_F32) for v in vecs], axis=1)


def make_taichi_stub() -> types.ModuleType:
    ti = types.ModuleType("taichi")
    ti.data_oriented = lambda cls: cls
    ti.kernel = _kernel
    ti.func = lambda fn: fn
    ti.static = lambda x: x
    ti.template = lambda: None
    ti.f32 = np.float32
    ti.i32 = np.int32
    ti.u8 = np.uint8
    ti.field = _field
    ti.Vector = Vector
    Vector.field = staticmethod(_vector_field)
    ti.Matrix = _Matrix
    ti.Field = Field
    ti.max = _ti_max
    ti.min = _ti_min
    ti.abs = np.abs
    ti.sqrt = np.sqrt
    ti.floor = np.floor
    ti.atan2 = np.arctan2
    return ti


class _FS(types.SimpleNamespace):
    pass


_cache: _FS | None = None


def load_reference_fs() -> _FS:
    """Import the reference's ``fs`` package under the stub (cached).

    Installs the stub as ``sys.modules['taichi']`` (nothing else in this
    environment imports taichi) and puts /root/reference on sys.path.
    """
    global _cache
    if _cache is not None:
        return _cache
    sys.modules["taichi"] = make_taichi_stub()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    mods = {}
    for name in (
        "differentiation",
        "double_buffer",
        "boundary_condition",
        "advection",
        "pressure_updater",
        "vorticity_confinement",
        "solver",
        "visualization",
        "fluid_simulator",
    ):
        mods[name] = importlib.import_module(f"fs.{name}")
    _cache = _FS(**mods)
    return _cache

"""Grid sharding over a TPU device mesh (GSPMD path).

The reference is strictly single-device (SURVEY.md §2.3); scale-out here
is spatial domain decomposition: every (…, X, Y) field and scene array is
sharded along X over a 1-D ``jax.sharding.Mesh``. The step functions are
pure ``jnp`` stencils, so GSPMD auto-partitions them — each shifted-slice
read at a shard boundary lowers to a neighbor exchange (collective-permute
over ICI), i.e. halo exchange without hand-written communication. The
widest stencil (Kawamura-Kuwahara) needs a halo of 2, which XLA derives
itself from the slice widths.

An explicit ``shard_map`` + ``lax.ppermute`` halo path for Pallas kernels
lives in :mod:`fluid2d_tpu.parallel.halo`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_leaf", "shard_pytree", "shard_simulator"]


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first `n_devices` (default: all). Raises if
    fewer devices exist than requested — a silently smaller mesh makes
    'sharded == single-device' checks vacuously pass."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            msg = f"requested {n_devices} devices, only {len(devices)} available"
            raise ValueError(msg)
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("x",))


def _spec_for(leaf, mesh: Mesh) -> P:
    """Shard the X axis (second-to-last) of grid arrays; replicate scalars."""
    if getattr(leaf, "ndim", 0) < 2:
        return P()
    if leaf.shape[-2] % mesh.devices.size != 0:
        return P()  # uneven grids stay replicated (not used by any scene size)
    return P(*([None] * (leaf.ndim - 2)), "x", None)


def shard_leaf(leaf, mesh: Mesh):
    return jax.device_put(leaf, NamedSharding(mesh, _spec_for(leaf, mesh)))


def shard_pytree(tree, mesh: Mesh):
    """device_put every array leaf with an X-sharded (or replicated) spec."""
    return jax.tree.map(lambda leaf: shard_leaf(leaf, mesh), tree)


def shard_simulator(sim, n_devices: int | None = None) -> Mesh:
    """Shard a :class:`FluidSimulator`'s state and scene in place.

    GSPMD auto-partitioning applies to plain XLA ops — a Pallas
    custom-call on sharded arrays under plain jit has no SPMD
    partitioning rule. So this path pins ``kernels="xla"`` (unless the
    user forced pallas explicitly); for fused kernels under sharding use
    the explicit ghost-window path
    (:func:`fluid2d_tpu.parallel.halo.make_sharded_run_halo`), which runs
    the kernels per-shard inside ``shard_map``.
    """
    import dataclasses

    from fluid2d_tpu.models.simulator import make_run_fn

    mesh = make_mesh(n_devices)
    if sim.cfg.kernels == "auto":
        sim.cfg = dataclasses.replace(sim.cfg, kernels="xla")
        sim._run = make_run_fn(sim.cfg)
    sim.state = shard_pytree(sim.state, mesh)
    sim.scene = shard_pytree(sim.scene, mesh)
    return mesh

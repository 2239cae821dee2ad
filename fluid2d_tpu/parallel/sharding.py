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


def shard_simulator(sim, n_devices: int | None = None, path: str = "auto") -> Mesh:
    """Shard a :class:`FluidSimulator`'s state and scene in place.

    Two routes:

    * ``"halo"`` — the production path: explicit ghost-window
      decomposition (:func:`fluid2d_tpu.parallel.halo.make_sharded_run_halo`),
      ONE ppermute exchange per step, the fused Pallas phase kernels run
      per-shard inside ``shard_map``.
    * ``"gspmd"`` — XLA auto-partitioning of the plain-jnp step. A Pallas
      custom-call on sharded arrays under plain jit has no SPMD
      partitioning rule, so this route pins ``kernels="xla"`` (~3×
      slower CIP steps on TPU).

    ``"auto"`` picks halo whenever the grid splits into slabs wide enough
    for the ghost depth, else falls back to gspmd. The chosen route is
    printed (it changes the performance profile materially) and recorded
    as ``sim.shard_path``.
    """
    import dataclasses

    from fluid2d_tpu.models.simulator import make_run_fn

    mesh = make_mesh(n_devices)
    n_dev = mesh.devices.size

    if path in ("auto", "halo"):
        from fluid2d_tpu.parallel.halo import ghost_width, make_sharded_run_halo

        h = ghost_width(sim.cfg)
        x_rows = sim.state.p.shape[-2]
        if x_rows % n_dev == 0 and x_rows // n_dev >= 2 * h:
            sim._run = make_sharded_run_halo(sim.cfg, mesh)
            sim.state = shard_pytree(sim.state, mesh)
            sim.scene = shard_pytree(sim.scene, mesh)
            sim.shard_path = "halo"
            print(f"sharding: ghost-window halo path over {n_dev} devices "
                  f"(ghost width {h}, fused kernels per-shard)")
            return mesh
        if path == "halo":
            msg = (f"halo path needs X={x_rows} to split into ≥{2 * h}-row "
                   f"slabs across {n_dev} devices")
            raise ValueError(msg)
        print(f"sharding: grid X={x_rows} too small for {2 * h}-row ghost slabs "
              f"on {n_dev} devices; falling back to GSPMD (kernels=xla, slower)")

    if sim.cfg.kernels == "auto":
        sim.cfg = dataclasses.replace(sim.cfg, kernels="xla")
        sim._run = make_run_fn(sim.cfg)
    sim.state = shard_pytree(sim.state, mesh)
    sim.scene = shard_pytree(sim.scene, mesh)
    sim.shard_path = "gspmd"
    return mesh

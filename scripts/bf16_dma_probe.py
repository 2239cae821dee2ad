"""Can Mosaic's make_async_copy move bf16 row slices at 8-row offsets?

The sliding-window kernels' fetch geometry (`_slide_fetch`,
ops/pallas_stencil.py) issues HBM→VMEM copies whose dynamic row starts
are multiples of 8 (`_slide_tail_start`: tin·T + 8) — tile-aligned for
f32's (8, 128) VMEM tiling, but NOT for bf16's (16, 128). This probe
answers, on the real chip, each alignment question the bf16 extension
of those kernels depends on (VERDICT r4 item #2):

  1. HBM→VMEM row-slice copy, start ≡ 8 (mod 16), bf16 — the tail DMA.
  2. VMEM→VMEM 16-row copy at a multiple-of-8 start, bf16 — the head
     (overlap) DMA when the tile t is a multiple of 16.
  3. An 8-row shifted in-VMEM store of a bf16 window — the ti==0
     realign (`win_ref[s,:,8:,:] = win_ref[s,:,:rows-8,:]`).

Usage: python scripts/bf16_dma_probe.py  (runs on the TPU; each case
prints ok/compile-error so a partial failure still reports the rest).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _case(name, fn):
    try:
        out = fn()
        ok = bool(np.isfinite(np.asarray(out, np.float32)).all())
        print(f"{name}: ok (finite={ok})")
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).splitlines()[0][:160]
        print(f"{name}: FAIL — {type(e).__name__}: {msg}")
        return False


def probe(dtype=jnp.bfloat16, rows=256, cols=256, t=16):
    dt = jnp.dtype(dtype)
    x = jnp.arange(rows * cols, dtype=jnp.float32).reshape(rows, cols)
    x = (x * 1e-4).astype(dt)

    def k_tail(x_ref, o_ref, win, sem):
        # rows [8, 8+t): start ≡ 8 (mod 16) — the tail-DMA shape.
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(8, t), :], win, sem)
        cp.start()
        cp.wait()
        o_ref[...] = win[...].astype(jnp.float32)

    def k_head(x_ref, o_ref, win, sem, sem2):
        # full fetch then a VMEM→VMEM copy at an 8-row offset.
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, t + 16), :], win, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(
            win.at[pl.ds(8, 16), :], win.at[pl.ds(0, 16), :], sem2
        )
        cp2.start()
        cp2.wait()
        o_ref[...] = win[: t, :].astype(jnp.float32)

    def k_realign(x_ref, o_ref, win, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, t + 16), :], win, sem)
        cp.start()
        cp.wait()
        win[8:, :] = win[: t + 8, :]
        o_ref[...] = win[: t, :].astype(jnp.float32)

    common = dict(
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((t, cols), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, cols), jnp.float32),
    )

    r = {}
    r["tail (HBM row slice @ start 8)"] = _case(
        f"{dt.name} tail (HBM slice @8)",
        functools.partial(
            jax.jit(pl.pallas_call(
                k_tail,
                scratch_shapes=[pltpu.VMEM((t, cols), dt), pltpu.SemaphoreType.DMA],
                **common,
            )), x),
    )
    r["head (VMEM copy @8)"] = _case(
        f"{dt.name} head (VMEM→VMEM @8)",
        functools.partial(
            jax.jit(pl.pallas_call(
                k_head,
                scratch_shapes=[pltpu.VMEM((t + 16, cols), dt),
                                pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
                **common,
            )), x),
    )
    r["realign (8-row shifted store)"] = _case(
        f"{dt.name} realign (win[8:]=win[:-8])",
        functools.partial(
            jax.jit(pl.pallas_call(
                k_realign,
                scratch_shapes=[pltpu.VMEM((t + 16, cols), dt),
                                pltpu.SemaphoreType.DMA],
                **common,
            )), x),
    )
    return r


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    for dt in (jnp.float32, jnp.bfloat16):
        print(f"--- {jnp.dtype(dt).name} ---")
        probe(dt)

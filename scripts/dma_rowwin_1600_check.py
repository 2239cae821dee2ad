"""Feasibility check: manual make_async_copy of a FULL-LANE row window
at lane width 1600 (not a multiple of 128).

docs/BENCH.md "Known constraints" records that manual row-slice DMAs
need (8,128)-aligned slice shapes, which a 1600-lane grid cannot give —
but that finding came from 2-D windows that slice the lane dimension.
A full-width row window ref.at[ds_r, :] never slices lanes, so the
constraint may not bite. This runs one copy and checks the bytes.

Run ON THE TPU:  python scripts/dma_rowwin_1600_check.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def main() -> None:
    y = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    x, t, h = 3200, 32, 8
    rows = t + 2 * h

    n_t = x // t

    def kernel(src_hbm, out_ref, win_ref, sem):
        i = pl.program_id(0)
        # Multiply by h LAST so Mosaic can prove 8-row alignment.
        rs = jnp.clip(i * (t // h) - 1, 0, (x - t) // h - 2) * h
        cp = pltpu.make_async_copy(src_hbm.at[pl.ds(rs, rows), :], win_ref, sem)
        cp.start()
        cp.wait()
        # Realign the two edge tiles in place (zero interior cost).
        @pl.when(i == 0)
        def _():
            win_ref[h:, :] = win_ref[: rows - h, :]
            win_ref[:h, :] = jnp.repeat(win_ref[h : h + 1, :], h, axis=0)

        @pl.when(i == n_t - 1)
        def _():
            win_ref[: rows - h, :] = win_ref[h:, :]
            win_ref[rows - h :, :] = jnp.repeat(
                win_ref[rows - h - 1 : rows - h, :], h, axis=0
            )

        out_ref[...] = win_ref[h : h + t, :] * 2.0

    call = pl.pallas_call(
        kernel,
        grid=(x // t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((t, y), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x, y), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, y), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    a = jnp.asarray(np.arange(x * y, dtype=np.float32).reshape(x, y))
    try:
        out = np.asarray(jax.jit(call)(a))
        ok = np.array_equal(out, 2.0 * np.asarray(a))
        print(f"lane width {y}: copy ran, values {'OK' if ok else 'WRONG'}")
    except Exception as e:  # noqa: BLE001 — feasibility check
        print(f"lane width {y}: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]})")


if __name__ == "__main__":
    main()

"""Minimal library usage: simulate, render, dump, checkpoint, resume.

    python examples/basic_run.py [--cpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from fluid2d_tpu import FluidSimulator
from fluid2d_tpu.utils.io import write_png
from fluid2d_tpu.utils.viz import to_image

out = Path("output/example_basic")

# The reference's default configuration: CIP + dye + vorticity confinement.
sim = FluidSimulator.create(bc_num=2, resolution=200, scheme="cip")

sim.step(1500)  # one compiled lax.scan — no host round-trips
print(f"at step {sim.step_count}")

# Render each visualization mode (same colormaps/scales as the reference).
for vis, name in enumerate(("norm", "pressure", "vorticity", "dye")):
    write_png(out / f"{name}.png", to_image(sim._render(sim.state, sim.scene, vis)))

# Reference-layout field dump + full-state checkpoint & resume.
fields = sim.field_to_numpy()
print({k: v.shape for k, v in fields.items()},
      "max|v| =", float(np.abs(fields["v"]).max()))
sim.save(out / "ckpt.npz")
resumed = FluidSimulator.load(out / "ckpt.npz")
resumed.step(100)
print(f"resumed and advanced to step {resumed.step_count}; frames in {out}/")

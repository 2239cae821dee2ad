"""Numerical operators: stencils, advection schemes, CIP, pressure,
vorticity confinement, limiters — full-array JAX (with Pallas variants
for the hot kernels in :mod:`fluid2d_tpu.ops.pallas_kernels`)."""

"""Visualization, IO/checkpointing, metrics, and profiling utilities."""

"""One-shot user-facing notes for silent behavior changes.

The shard dispatcher prints which route it picked because the choice
changes the performance profile materially
(:func:`fluid2d_tpu.parallel.sharding.shard_simulator`); this module
gives every other slow-path / fallback decision the same voice. Notes
fire at Python level (trace time for jitted code), deduplicated per
process so a retrace doesn't spam.
"""

from __future__ import annotations

__all__ = ["note_once", "reset_notes"]

_seen: set[str] = set()


def note_once(msg: str) -> None:
    """Print ``note: <msg>`` the first time this exact message appears."""
    if msg not in _seen:
        _seen.add(msg)
        print(f"note: {msg}")


def reset_notes() -> None:
    """Forget previously printed notes (test isolation)."""
    _seen.clear()

"""The trusted device-settle primitive, in ONE place.

Through the dev TPU tunnel ``jax.block_until_ready`` can return WITHOUT
waiting (measured 0.2 ms "block" vs 422 ms fetch for the same program),
so the only trustworthy sync point is a data-dependent ``device_get``.
Used by ``bench.py``, the perf harnesses, and the executor's settle path
— fix the semantics here, not in per-site copies.
"""

from __future__ import annotations

import jax
import numpy as np


def settle(tree) -> None:
    """Block until the device work producing ``tree`` has retired, by
    fetching one tail element of its first array leaf (~1 RTT). With
    state-donation chains the last step's output transitively depends on
    every prior step, so one tiny fetch settles a whole timed window."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ndim") and getattr(leaf, "size", 0):
            np.asarray(leaf[..., -1:] if leaf.ndim else leaf)
            return

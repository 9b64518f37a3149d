"""Gather/scatter-free candidate compaction for burst detectors.

The shared trick behind the WLAN and ZigBee batched receivers
(``models/wlan/rx.py detect_candidates``, ``models/zigbee/zigbee.py
_rx_program``): a boolean event mask over a long capture is reduced to at
most ``kmax`` (position, payload…) records with NO ``jnp.nonzero`` /
gather — a masked per-block reduction pulls one record per fixed-size
block and one ``lax.sort`` packs occupied blocks to the front.  On v5e a
``jnp.nonzero`` compaction of a 3.8 M-sample mask measured ~35 ms of flat
scatter time; this form runs at dispatch cost.

Correctness hinges on the AT-MOST-ONE-EVENT-PER-BLOCK invariant: the
masked position sum of a block holding two events is garbage.
:func:`suppress_recent` establishes it by keeping only events whose
preceding ``window`` samples are event-free (one prefix-sum, no loop) —
with ``window >= block`` every block holds at most one survivor.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

#: sort key for empty blocks — larger than any sample position.
#: A plain Python int on purpose: a module-level ``jnp`` scalar would be
#: materialized on whatever backend is active when this module first
#: imports (which can be mid-trace, inside another program's jit), and a
#: device constant closed over by several jitted callers breaks their
#: compiled-program signatures (observed as XLA "supplied N buffers but
#: expected M" across the suite).
EMPTY = 2**30


def suppress_recent(mask: jnp.ndarray, window: int) -> jnp.ndarray:
    """Keep only mask positions with NO earlier True in ``[i-window, i-1]``.

    Collapses a run of consecutive (or near-consecutive) detections to its
    first sample: the WLAN STF's ~100 double-crossings or a ZigBee
    preamble's sidelobe chains become one leader each."""
    f = mask.astype(jnp.int32)
    n = f.shape[-1]
    p = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(f)])
    p_lag = jnp.concatenate([jnp.zeros(window, jnp.int32), p])[:n]
    return jnp.logical_and(mask, (p[:n] - p_lag) == 0)


def compact_mask(
    mask: jnp.ndarray,
    block: int,
    kmax: int,
    payload: Sequence[jnp.ndarray] = (),
) -> Tuple[jnp.ndarray, ...]:
    """Compact a (at-most-one-True-per-``block``) mask to ``kmax`` records.

    Returns ``(key, *payload_sorted)`` where ``key[k]`` is the sample
    position of the k-th event in ascending order (``EMPTY`` sentinel for
    absent slots, always shape ``[kmax]``) and each payload array is the
    event's value from the matching position (0 in empty slots).  Payload
    arrays must be at least as long as the blocked span of ``mask``."""
    n = mask.shape[-1]
    nb = n // block
    m = nb * block
    m2 = mask[:m].reshape(nb, block)
    iota = jnp.arange(m, dtype=jnp.int32).reshape(nb, block)
    has = jnp.any(m2, axis=1)
    pos_b = jnp.sum(jnp.where(m2, iota, 0), axis=1)  # [nb]
    key = jnp.where(has, pos_b, EMPTY)
    cols = [key]
    for arr in payload:
        a2 = arr[:m].reshape(nb, block)
        cols.append(jnp.sum(jnp.where(m2, a2, 0), axis=1))
    if nb < kmax:
        # short captures have fewer blocks than requested candidates:
        # pad with empty sentinels so outputs are always [kmax]
        pad = kmax - nb
        cols[0] = jnp.concatenate([cols[0], jnp.full(pad, EMPTY, jnp.int32)])
        cols[1:] = [
            jnp.concatenate([c, jnp.zeros(pad, c.dtype)]) for c in cols[1:]
        ]
    sorted_cols = jax.lax.sort(tuple(cols), num_keys=1)
    return tuple(c[:kmax] for c in sorted_cols)

"""Multi-chip scaling: mesh/sharding helpers and halo-exchange collectives.

The reference has no collectives at all (SURVEY.md §2.5) — its scaling story
is async tasks on cores plus network edges between processes. The TPU-native
replacement (BASELINE.json north star): shard channels and time blocks over a
``jax.sharding.Mesh`` with ``shard_map``, exchange overlap-save filter
boundary samples via ``ppermute``, regroup channelizer outputs via
``all_gather``; ICI carries the halos.
"""

from futuresdr_tpu.parallel.halo import (
    halo_left,
    packed_stream_halo,
    ring_carry,
)
from futuresdr_tpu.parallel.mesh import make_mesh

__all__ = ["halo_left", "packed_stream_halo", "ring_carry", "make_mesh"]

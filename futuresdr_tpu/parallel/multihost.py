"""Multi-host (N≥2 processes) distribution tier.

The reference is strictly single-process — its inter-process story is ZMQ/
TCP stream edges (SURVEY §2.5). The TPU-native replacement is
``jax.distributed``: every host runs the same program, a global mesh spans
all hosts' devices, and XLA inserts the collectives — halo exchanges ride
the ICI inside a host and the DCN between hosts, with no framework-level
transport code at all.

Mesh convention: axis 0 = ``dcn`` (one row per host/process, the slow
boundary), axis 1 = ``ici`` (that host's chips). The flagship bank maps
time shards onto ``dcn`` (overlap-save halos cross hosts once per step)
and channel shards onto ``ici`` (all-gathers stay on-chip interconnect) —
exactly the "lay out shardings so collectives ride ICI, not DCN" recipe.

Proven on multi-process CPU (``tests/test_multihost.py`` spawns real
processes with ``jax.distributed.initialize``); the same code runs on a
pod slice by changing only the coordinator address.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def init_multihost(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_count: Optional[int] = None,
) -> None:
    """Join the multi-host job (wraps ``jax.distributed.initialize``).

    On CPU test rigs pass ``local_device_count`` to carve N virtual
    devices per process; on real TPU hosts leave it ``None`` (the runtime
    discovers local chips)."""
    import jax

    if local_device_count is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local_device_count))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )


def make_host_chip_mesh():
    """Global 2D mesh: (hosts → ``dcn``) × (chips/host → ``ici``).

    Devices are grouped by owning process so the inner axis is always
    intra-host (ICI) and the outer axis always crosses hosts (DCN)."""
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    per_host = len(devs) // n_proc
    grid = np.array(devs).reshape(n_proc, per_host)
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def make_multihost_bank_step(cfg, mesh):
    """The flagship 1024-ch bank over a host×chip mesh: time shards on
    ``dcn`` (halo ppermute crosses the host boundary once per stage),
    channel shards on ``ici``."""
    from futuresdr_tpu.models.pfb_fm_bank import make_sharded_bank_step_2d

    return make_sharded_bank_step_2d(
        cfg, mesh, ch_axis=ICI_AXIS, time_axis=DCN_AXIS
    )


def global_iq_array(mesh, x: np.ndarray):
    """Build the globally-sharded wideband input from identical host data
    (every process holds the same ``x``; each contributes its time
    slice, replicated over the ``ici`` axis)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from futuresdr_tpu.ops import cplx

    sharding = NamedSharding(mesh, P(DCN_AXIS))
    re = np.ascontiguousarray(x.real.astype(np.float32))
    im = np.ascontiguousarray(x.imag.astype(np.float32))

    def mk(arr):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return cplx.CArray(mk(re), mk(im))


def gather_to_host(x) -> np.ndarray:
    """Fetch a (possibly sharded) global array fully onto every host."""
    from jax.experimental import multihost_utils

    from futuresdr_tpu.ops import cplx

    if isinstance(x, cplx.CArray):
        re = multihost_utils.process_allgather(x.re, tiled=True)
        im = multihost_utils.process_allgather(x.im, tiled=True)
        return re + 1j * im
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))

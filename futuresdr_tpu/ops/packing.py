"""Packing integers into float32 fetch buffers — TPU-safely.

Multi-leaf device fetches cost one round-trip per fresh leaf through
tunneled backends, so receiver fronts pack their outputs into ONE f32
buffer. Integer values must NOT ride a plain ``bitcast_convert_type``:
an int32 below 2^23 bitcasts to a float32 DENORMAL, and TPU hardware
may flush denormals to zero anywhere XLA happens to fuse the value
through an arithmetic op (observed: identical packing code preserved
indices in one program and zeroed them in another). The encoding here
sets bit 30 after a +1 bias, so every payload lands in the normal
range [2.0, 4.0) and ``-1`` sentinels stay representable:

    device:  bitcast((v + 1) | 0x40000000)
    host:    (bits & 0x3FFFFFFF) - 1

Exact and NaN/Inf-free for v in [-1, 2^30 − 2^23 − 2] (≈1.06e9 —
every array index and sentinel we pack; beyond that the biased bits
enter the exponent-0xFF band, whose NaN payloads hardware may
canonicalize — the same hazard class as the denormal flush).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_int_f32(v):
    """Device: int array → f32 array with the same bits, denormal-safe."""
    b = (v.astype(jnp.int32) + 1) | jnp.int32(0x40000000)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


_backend_ok: "bool | None" = None  # None = unchecked


def _check_backend() -> None:
    """Once per process: round-trip known values through a real device
    program. The CPU test mesh preserves denormals, so only a live
    backend can prove the encoding survives — this catches a future
    backend/compiler that mangles the biased range, loudly. A failure
    is CACHED and re-raised on every later unpack (marking the check
    passed before running it would let a caught first failure silently
    hand corrupt indices to every subsequent receiver fetch)."""
    global _backend_ok
    probe = np.array(
        [-1, 0, 1, 12345, (1 << 24) + 7, (1 << 29) + 123], np.int32
    )

    @jax.jit
    def rt(v):
        return pack_int_f32(v) * jnp.float32(1.0)  # force through an op

    got = _unpack_raw(np.asarray(jax.device_get(rt(probe))))
    if not np.array_equal(got, probe):  # pragma: no cover - backend bug
        _backend_ok = False
        raise RuntimeError(
            f"packed-int fetch round-trip failed on this backend: "
            f"sent {probe.tolist()}, got {got.tolist()} — the packing "
            "encoding is being mangled (denormal flush or float "
            "canonicalization); receiver fetches would be corrupt"
        )
    _backend_ok = True


def _unpack_raw(a: np.ndarray) -> np.ndarray:
    bits = np.ascontiguousarray(a).view(np.uint32)
    return (bits & np.uint32(0x3FFFFFFF)).astype(np.int64).astype(
        np.int32
    ) - 1


def unpack_int_f32(a: np.ndarray) -> np.ndarray:
    """Host: the f32 slice of a fetched buffer → int32 values."""
    if _backend_ok is None:
        _check_backend()
    elif _backend_ok is False:  # pragma: no cover - backend bug
        raise RuntimeError(
            "packed-int encoding previously failed its backend "
            "round-trip check in this process; fetches are corrupt"
        )
    bits = np.ascontiguousarray(a).view(np.uint32)
    return (bits & np.uint32(0x3FFFFFFF)).astype(np.int64).astype(
        np.int32
    ) - 1

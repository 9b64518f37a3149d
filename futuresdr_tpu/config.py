"""Layered runtime configuration.

Parity: ``src/runtime/config.rs:51-119`` — the reference layers
``~/.config/futuresdr/config.toml`` → project ``config.toml`` → env
(``FUTURESDR_*``) → programmatic ``config::set``. We keep the same layering
with env prefix ``FUTURESDR_TPU_``.

Typed keys (defaults mirror ``config.rs:180-210`` where meaningful; TPU-only
keys replace CPU ring-buffer knobs):

================== ========= =====================================================
key                default   meaning
================== ========= =====================================================
chunk_size         32768     items per compiled step on the base-rate edge
                             (replaces ``buffer_size`` bytes of the ring buffers)
steps_per_call     auto      chunks fused into one device dispatch via lax.scan.
                             "auto" (default): the executor picks K itself for
                             device-source pipelines with no per-chunk host
                             interactivity (K = clamp(auto_batch_items/chunk,
                             4, auto_batch_max_k) — measured 2x at flagship
                             4.2M-sample chunks, 4-9x at small chunks); any
                             graph with host sources, message edges, tickers
                             or live drivers keeps K=1. An explicit integer
                             always overrides (set 1 for latency-sensitive
                             control loops — see docs/book/latency.md)
queue_size         8192      host-side bounded queue depth (source/sink staging)
precision          highest   matmul/conv precision for DSP paths (60 dB SNR target)
fir_dtype          float32   branch-FIR input dtype; bfloat16 = 1.74x faster
                             bank channelizer at 70 dB isolation (f32: 93.5)
channelizer_fft    mixed_radix  PFB branch FFT backend; dft_bf16 = one dense
                             [M,M] bf16 DFT matmul, 1.63x whole-bank at 68 dB
settle_every_steps 32        on no-fetch graphs (all sinks device_reduce),
                             keep a completion marker every N steps and
                             pace dispatch once a 16-marker window fills —
                             bounds the async dispatch queue at ~16·N steps
                             (unbounded dispatch measured ~700 MB/min host
                             RSS growth)
ctrlport_enable    False     start the REST control port with the runtime
ctrlport_bind      127.0.0.1:1337   control port bind address
log_level          info      tracing level
frontend_path      None      static files dir served by the control port
================== ========= =====================================================
"""

from __future__ import annotations

import os
import threading
from pathlib import Path
from typing import Any, Dict, Optional

try:  # python >= 3.11
    import tomllib as _toml
except ImportError:  # pragma: no cover
    _toml = None

ENV_PREFIX = "FUTURESDR_TPU_"

_DEFAULTS: Dict[str, Any] = {
    "chunk_size": 32768,
    "steps_per_call": "auto",
    "queue_size": 8192,
    "precision": "highest",
    "fir_dtype": "float32",
    "channelizer_fft": "mixed_radix",
    "settle_every_steps": 32,
    "ctrlport_enable": False,
    "ctrlport_bind": "127.0.0.1:1337",
    "log_level": "info",
    "frontend_path": None,
}

_lock = threading.Lock()
_store: Optional[Dict[str, Any]] = None


def _coerce(key: str, value: Any) -> Any:
    default = _DEFAULTS.get(key)
    if isinstance(default, bool):
        if isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
        return bool(value)
    if isinstance(default, int) and not isinstance(default, bool):
        return int(value)
    return value


def _load_toml(path: Path) -> Dict[str, Any]:
    if _toml is None or not path.is_file():
        return {}
    try:
        with open(path, "rb") as f:
            return dict(_toml.load(f))
    except Exception:
        return {}


def _build() -> Dict[str, Any]:
    store = dict(_DEFAULTS)
    # layer 1: user config
    home = Path(os.environ.get("XDG_CONFIG_HOME", Path.home() / ".config"))
    store.update(_load_toml(home / "futuresdr_tpu" / "config.toml"))
    # layer 2: project config (cwd)
    store.update(_load_toml(Path.cwd() / "config.toml"))
    # layer 3: environment
    for k, v in os.environ.items():
        if k.startswith(ENV_PREFIX):
            key = k[len(ENV_PREFIX):].lower()
            store[key] = _coerce(key, v)
    return store


def _ensure() -> Dict[str, Any]:
    global _store
    with _lock:
        if _store is None:
            _store = _build()
        return _store


def get(key: str, default: Any = None) -> Any:
    """Read a config value (typed keys + misc map, like ``config::config()``)."""
    store = _ensure()
    if key in store:
        return store[key]
    return default


def set(key: str, value: Any) -> None:  # noqa: A001 - parity with config::set
    """Programmatic override (layer 4, highest priority)."""
    store = _ensure()
    with _lock:
        store[key] = _coerce(key, value) if key in _DEFAULTS else value


def reload() -> None:
    """Drop the cached store; next access re-reads files/env (test helper)."""
    global _store
    with _lock:
        _store = None


def snapshot() -> Dict[str, Any]:
    return dict(_ensure())

"""Mesh execution for a composed flowgraph: ``Runtime(mesh=...)``.

The round-5 tier (``runtime/mesh.py``): compose ordinary blocks, hand the
Runtime a ``jax.sharding.Mesh``, and the compiled step runs under
``shard_map`` — every stream edge time-sharded, block state reconstructed
at shard boundaries automatically (suffix re-run + one ring ppermute per
step), NCO phases positioned per shard via the affine protocol.

Run on the real chip (mesh of 1) or on a virtual CPU mesh:

    python examples/sharded_flowgraph.py            # devices present
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_flowgraph.py        # 8 virtual shards

Parity anchor: the reference hands every composed graph its full
concurrency machinery automatically (src/runtime/scheduler/smol.rs:108);
here that machinery is the device mesh.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np
from jax.sharding import Mesh

from futuresdr_tpu import Flowgraph, Runtime
from futuresdr_tpu.blocks import (
    Fir,
    QuadratureDemod,
    VectorSink,
    VectorSource,
    XlatingFir,
)
from futuresdr_tpu.dsp import firdes, windows


def build(x):
    """An FM-receiver-shaped chain: down-mix + decimate, discriminate,
    audio low-pass — NCO state + two FIR histories across shards."""
    fg = Flowgraph()
    src = VectorSource(x.copy())
    xl = XlatingFir(firdes.lowpass(0.08, windows.hamming(64)), 4, 100e3, 1e6)
    demod = QuadratureDemod(1.0)
    audio = Fir.decimating(
        firdes.lowpass(0.1, windows.hamming(32)), 2, dtype=np.float32
    )
    snk = VectorSink(np.float32)
    fg.stream(src, xl)
    fg.stream(xl, demod)
    fg.stream(demod, audio)
    fg.stream(audio, snk)
    return fg, snk


def main():
    rng = np.random.default_rng(0)
    n = 1 << 17
    # an FM tone at +100 kHz in 1 MS/s wideband noise
    t = np.arange(n) / 1e6
    phase = 2 * np.pi * 100e3 * t + 3.0 * np.cumsum(
        np.sin(2 * np.pi * 1e3 * t)
    ) / 1e6 * 2 * np.pi * 5e3
    x = (
        np.exp(1j * phase) + 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    ).astype(np.complex64)

    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("time",))
    print(f"mesh: {len(devices)} × {devices[0].platform}")

    fg_ref, snk_ref = build(x)
    Runtime(chunk_size=1 << 14).run(fg_ref)

    fg, snk = build(x)
    Runtime(chunk_size=1 << 14, mesh=mesh).run(fg)

    a, b = snk_ref.data(), snk.data()
    err = float(np.max(np.abs(a - b)))
    print(f"audio samples: {b.shape[0]}  max|mesh − single-device| = {err:.2e}")
    assert a.shape == b.shape and err < 2e-5
    print("sharded flowgraph == single-device ✔")


if __name__ == "__main__":
    main()

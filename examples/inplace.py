"""In-place processing via buffer donation (circuit-buffer parity).

Parity: the reference's ``examples/inplace`` — a pipeline whose buffers
circulate source → apply → sink → back to source (`connect!(fg, src < snk)`,
``buffer/circuit.rs``), so the apply stage mutates in place instead of
allocating. The TPU-native equivalent (SURVEY.md §2.4 mapping) is XLA
**buffer donation**: `donate_argnums` lets the compiler write each chunk's
output over its input allocation, which is also how the executor donates
every block's carried state on every step.

This demo times the same +1 chain with and without donation and checks
bit-exact results, then runs the flowgraph form (donation is automatic).

Run:  python examples/inplace.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import Apply, VectorSink, VectorSource  # noqa: E402

ITEMS = 1 << 24  # 16M int32 = 64 MiB per buffer
STAGES = 4


def _chain(x):
    for _ in range(STAGES):
        x = x + 1
    return x


def _time(fn, x, label: str) -> None:
    y = fn(x)  # compile
    np.asarray(y[-1:])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        y = fn(y)
    np.asarray(y[-1:])
    dt = (time.perf_counter() - t0) / reps
    gbps = ITEMS * 4 / dt / 1e9
    print(f"{label:12s}: {dt * 1e3:7.2f} ms/pass  ({gbps:.1f} GB/s effective)")


def main() -> None:
    x0 = jax.numpy.arange(ITEMS, dtype=jax.numpy.int32)

    _time(jax.jit(_chain), jax.numpy.array(x0), "out-of-place")
    _time(jax.jit(_chain, donate_argnums=(0,)), jax.numpy.array(x0), "donated")

    # flowgraph form: VectorSource -> Apply(+1) -> VectorSink; the executor
    # donates all carried state automatically
    n = 1 << 20
    orig = np.arange(n, dtype=np.int32)
    fg = Flowgraph()
    snk = VectorSink(np.int32)
    connect(
        fg,
        VectorSource(orig),
        Apply(lambda v: v + 1, np.int32, np.int32),
        snk,
    )
    Runtime(chunk_size=1 << 16).run(fg)
    out = snk.data()
    assert out.shape == orig.shape and np.array_equal(out, orig + 1)
    print(f"flowgraph: {n} items through Apply(+1), bit-exact  OK")


if __name__ == "__main__":
    main()

"""Stream fan-out to several sinks (parity: examples/multi.rs).

VectorSource → StreamDuplicator×3 → three VectorSinks; every sink must
see the identical 20k random samples. Times the run like the reference.

Run:  python examples/multi.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    StreamDuplicator,
    VectorSink,
    VectorSource,
)


def main() -> None:
    n_items = 20_000
    orig = np.random.default_rng(0).random(n_items).astype(np.float32)

    fg = Flowgraph()
    src = VectorSource(orig)
    dup = StreamDuplicator(3, dtype=np.float32)
    snks = [VectorSink(dtype=np.float32) for _ in range(3)]
    fg.stream(src, dup)
    for i, snk in enumerate(snks):
        fg.stream(dup, snk, src_port=i)

    t0 = time.perf_counter()
    Runtime(chunk_size=4096).run(fg)
    dt = time.perf_counter() - t0

    for snk in snks:
        v = snk.data()
        assert len(v) == n_items and np.array_equal(v, orig)
    print(f"all 3 sinks identical ({n_items} items) in {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""End-to-end chunk latency CDF.

Parity: ``perf/null_rand_latency`` / ``perf/fir_latency`` — the reference
tags samples with LTTng tracepoints and plots per-sample latency CDFs.
Here the equivalent observable is chunk latency: wall time from a chunk
entering ``host_produce`` to its delivery at ``host_consume``, measured
through the full executor (device dispatch pipeline included).

Run:  python perf/latency.py [--chunk 32768] [--stages 4] [--steps 200]
Prints CSV percentiles: p50,p90,p99,max (ms).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import Fir  # noqa: E402
from futuresdr_tpu.runtime.block import Block, PortSpec  # noqa: E402


class StampSource(Block):
    def __init__(self):
        super().__init__()
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_out = (1,)
        self.stamps = []

    def host_produce(self, n, port=0):
        self.stamps.append(time.perf_counter())
        return np.zeros(n, np.complex64)


class StampSink(Block):
    def __init__(self):
        super().__init__()
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.rate_in = (1,)
        self.stamps = []

    def host_consume(self, arr, tags, port=0):
        self.stamps.append(time.perf_counter())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    src, snk = StampSource(), StampSink()
    fg = Flowgraph()
    chain = [src]
    for _ in range(args.stages):
        chain.append(Fir(rng.standard_normal(64).astype(np.float32)))
    chain.append(snk)
    connect(fg, *chain)
    Runtime(chunk_size=args.chunk).run(fg, max_steps=args.steps)

    n = min(len(src.stamps), len(snk.stamps))
    lat = (
        np.asarray(snk.stamps[:n]) - np.asarray(src.stamps[:n])
    ) * 1e3
    lat = lat[5:]  # drop compile/warmup
    print("chunk,stages,steps,p50_ms,p90_ms,p99_ms,max_ms")
    print(
        f"{args.chunk},{args.stages},{len(lat)},"
        f"{np.percentile(lat, 50):.3f},{np.percentile(lat, 90):.3f},"
        f"{np.percentile(lat, 99):.3f},{np.max(lat):.3f}"
    )


if __name__ == "__main__":
    main()

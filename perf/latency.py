"""End-to-end chunk latency CDF + operating-curve sweep.

Parity: ``perf/null_rand_latency`` / ``perf/fir_latency`` — the reference
tags samples with LTTng tracepoints and plots per-sample latency CDFs.
Here the equivalent observable is chunk latency: wall time from a chunk
entering ``host_produce`` to its delivery at ``host_consume``, measured
through the full executor (device dispatch pipeline included).

Run:  python perf/latency.py [--chunk 32768] [--stages 4] [--steps 200]
Prints CSV percentiles: p50,p90,p99,max (ms) plus throughput.

Sweep mode (the latency *operating curve* — chunk size × pipeline depth):

    python perf/latency.py --sweep

emits one CSV row per (chunk, max_inflight) so an operating point can be
chosen per use case: interactive GUIs want small chunks and
``max_inflight=1`` (lowest p50, throughput-limited by per-dispatch RTT),
bulk decode wants big chunks and depth 2+ (throughput at the cost of
pipeline-depth latency). See docs/book/latency.md for the measured curve
and recommendations.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, connect  # noqa: E402
from futuresdr_tpu.blocks import Fir  # noqa: E402
from futuresdr_tpu.runtime.block import Block, PortSpec  # noqa: E402
from futuresdr_tpu.runtime.executor import Executor  # noqa: E402


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


def run_config(chunk: int, stages: int, steps: int, max_inflight: int):
    """One measurement: returns (p50, p90, p99, max) ms + MS/s."""
    rng = np.random.default_rng(0)
    src, snk = StampSource(), StampSink()
    fg = Flowgraph()
    chain = [src]
    for _ in range(stages):
        chain.append(Fir(rng.standard_normal(64).astype(np.float32)))
    chain.append(snk)
    connect(fg, *chain)
    if steps <= 6:
        raise SystemExit("--steps must exceed the 5-chunk warmup (+1)")
    ex = Executor(
        fg, chunk_size=chunk, max_inflight=max_inflight, max_steps=steps
    )
    ex.running = True
    try:
        ex.run_loop()
    finally:
        ex.running = False
    if ex.error:
        raise ex.error
    n = min(len(src.stamps), len(snk.stamps))
    lat = (np.asarray(snk.stamps[:n]) - np.asarray(src.stamps[:n])) * 1e3
    lat = lat[5:]  # drop compile/warmup
    # steady-state wall clock from the SAME stamps the percentiles use:
    # timing run_loop would fold jit compile + the warmup chunks into the
    # throughput column while the latency columns exclude them
    wall = snk.stamps[n - 1] - src.stamps[5]
    rate = chunk * (n - 6) / max(wall, 1e-9) / 1e6
    return (
        float(np.percentile(lat, 50)),
        float(np.percentile(lat, 90)),
        float(np.percentile(lat, 99)),
        float(np.max(lat)),
        rate,
        len(lat),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--inflight", type=int, default=2)
    ap.add_argument(
        "--sweep",
        action="store_true",
        help="chunk-size x max_inflight operating-curve sweep",
    )
    args = ap.parse_args()

    print(
        "chunk,max_inflight,stages,steps,p50_ms,p90_ms,p99_ms,max_ms,MSps",
        flush=True,
    )
    if args.sweep:
        configs = [
            (c, q)
            for c in (2048, 8192, 32768, 131072, 524288)
            for q in (1, 2, 4)
        ]
    else:
        configs = [(args.chunk, args.inflight)]
    for chunk, q in configs:
        p50, p90, p99, mx, rate, n = run_config(
            chunk, args.stages, args.steps, q
        )
        print(
            f"{chunk},{q},{args.stages},{n},"
            f"{p50:.3f},{p90:.3f},{p99:.3f},{mx:.3f},{rate:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

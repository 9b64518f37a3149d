"""Throughput sweep harness: pipes × stages, Copy and FIR variants.

Parity: ``perf/null/null.rs:13-120`` (P parallel source→stageⁿ→sink pipes,
CSV of samples/elapsed) and ``perf/fir/fir.rs:31-60`` (64 random taps per
stage). The reference sweeps schedulers × buffer types; here the equivalent
axis is the fused-XLA executor's chunk size.

The reference's third variant — ``perf/null_rand`` with ``CopyRand``
(each work() call copies a RANDOM number of items to stress scheduler
wakeups and partial-buffer paths) — has no analogue by design: the SDF
compiler fixes every block's per-step item count at compile time, so
there is no variable work quantum, no partial-buffer path, and no
scheduler to stress. The corresponding robustness surface here is the
short-FINAL-chunk valid-count machinery, covered by
tests/test_rate_properties.py's random-chain properties instead.

Run:  python perf/sweep.py [--kind copy|fir] [--pipes 1 2 4] \\
          [--stages 1 2 4 8] [--samples 100000000] [--chunk 262144]
Prints CSV: kind,pipes,stages,chunk,samples,elapsed_s,gsps
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, connect  # noqa: E402
from futuresdr_tpu.blocks import Copy, Fir, NullSink, NullSource  # noqa: E402
from futuresdr_tpu.runtime.executor import (  # noqa: E402
    Executor,
    _enable_compile_cache,
)


def build(kind: str, pipes: int, stages: int, seed: int = 0) -> Flowgraph:
    rng = np.random.default_rng(seed)
    fg = Flowgraph()
    for _ in range(pipes):
        chain = [NullSource(np.complex64)]
        for _ in range(stages):
            if kind == "copy":
                chain.append(Copy(np.complex64))
            else:
                taps = rng.standard_normal(64).astype(np.float32)
                chain.append(Fir(taps))
        chain.append(NullSink(np.complex64))
        connect(fg, *chain)
    return fg


def run_one(kind: str, pipes: int, stages: int, samples: int, chunk: int):
    fg = build(kind, pipes, stages)
    ex = Executor(fg, chunk_size=chunk)
    per_step = ex.cfg.out_chunks[0][0]  # NullSource chunk
    steps = max(1, samples // (per_step * pipes))
    # warmup (trace + compile) on the SAME executor: each Executor owns its
    # jitted step, so measuring a fresh instance times a re-trace (~0.7 s),
    # not the stream
    ex.max_steps = 2
    ex.running = True
    ex.run_loop()
    # measured: steady state on the warm step
    ex.max_steps = steps
    t0 = time.perf_counter()
    ex.run_loop()
    dt = time.perf_counter() - t0
    total = per_step * steps * pipes
    return total, dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["copy", "fir", "both"], default="both")
    ap.add_argument("--pipes", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--stages", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--samples", type=int, default=200_000_000)
    ap.add_argument("--chunk", type=int, nargs="+", default=[1 << 22])
    ap.add_argument(
        "--steps-per-call",
        type=int,
        default=1,
        help="fuse K chunks per dispatch via lax.scan (the small-chunk "
        "dispatch-amortization lever; K=32-64 measured ~9x at 4k chunks)",
    )
    args = ap.parse_args()
    if args.steps_per_call > 1:
        from futuresdr_tpu import config

        config.set("steps_per_call", args.steps_per_call)

    _enable_compile_cache()
    kinds = ["copy", "fir"] if args.kind == "both" else [args.kind]
    print("kind,pipes,stages,chunk,samples,elapsed_s,gsps")
    for kind in kinds:
        for p in args.pipes:
            for s in args.stages:
                for chunk in args.chunk:
                    total, dt = run_one(kind, p, s, args.samples, chunk)
                    print(
                        f"{kind},{p},{s},{chunk},{total},{dt:.4f},"
                        f"{total / dt / 1e9:.4f}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()

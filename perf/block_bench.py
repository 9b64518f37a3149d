"""Per-block micro-benchmarks via the Mocker harness.

Parity: ``benches/apply.rs`` + ``benches/flowgraph.rs`` (criterion over
Mocker-driven single blocks and a small flowgraph). Reports items/s for
each block's jitted apply, measured on whatever backend JAX resolves
(the real chip by default; CPU with ``--cpu``).

Run: ``python perf/block_bench.py [--cpu] [--chunk N]``
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_block(make_block, chunk: int, complex_in: bool = True):
    import jax

    from futuresdr_tpu.ops import cplx
    from futuresdr_tpu.runtime.mocker import Mocker

    rng = np.random.default_rng(0)
    if complex_in:
        data = (
            rng.standard_normal(chunk) + 1j * rng.standard_normal(chunk)
        ).astype(np.complex64)
    else:
        data = rng.standard_normal(chunk).astype(np.float32)

    b = make_block()
    # jitted state+apply loop (what the fused step runs per block)
    state = b.make_state([chunk], [chunk])
    x = cplx.from_numpy(data)

    def step(state, x):
        return b.apply(state, (x,), {})

    step_j = jax.jit(step)

    from futuresdr_tpu.utils.sync import settle as sync

    st, ys, _aux = step_j(state, x)
    sync(ys)
    iters = 16
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            # thread the state so dispatches chain (identical independent
            # dispatches could otherwise overlap or dedupe server-side)
            st, ys, _aux = step_j(st, x)
        sync(ys)
        dt = time.perf_counter() - t0
        if dt > 0.5:
            return chunk * iters / dt
        iters *= 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chunk", type=int, default=1 << 20)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from futuresdr_tpu.blocks import Apply, Fft, Fir, MovingAvg
    from futuresdr_tpu.dsp import firdes, windows
    from futuresdr_tpu.runtime.executor import _enable_compile_cache

    _enable_compile_cache()
    taps64 = firdes.lowpass(0.2, windows.hamming(64)).astype(np.float32)

    cases = [
        ("Apply(x*conj(x))", lambda: Apply(lambda x: x * x.conj()), True),
        ("Fir(64 taps)", lambda: Fir(taps64), True),
        ("Fft(1024)", lambda: Fft(1024), True),
        ("MovingAvg(64)", lambda: MovingAvg(64), False),
    ]
    print("block,chunk,items_per_s")
    for name, mk, cplx_in in cases:
        try:
            rate = bench_block(mk, args.chunk, cplx_in)
            print(f"{name},{args.chunk},{rate:.3e}", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"{name},{args.chunk},ERROR:{exc}", flush=True)


if __name__ == "__main__":
    main()

"""Mesh-tier overhead curve: the composed bank through Runtime(mesh=...)
vs the single-device Executor, PAIRED per round, across chunk sizes.

The mesh tier's per-step costs are the suffix state-reconstruction
re-run, the ring ppermute, and the shard_map wrapper; all are fixed-ish
per step, so their relative cost falls with chunk size. This harness
puts numbers on that curve (the generic-tier analogue of
perf/sharded_overhead.py's hand-built-layout measurements).

    python perf/mesh_overhead.py            # real chip, mesh of 1
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python perf/mesh_overhead.py --devices 8   # virtual mesh
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np
from jax.sharding import Mesh

from futuresdr_tpu import config
from futuresdr_tpu.blocks import (
    Fir,
    NullSink,
    PfbChannelizer,
    QuadratureDemod,
    ResidentSource,
)
from futuresdr_tpu.blocks.pfb import default_channelizer_taps
from futuresdr_tpu.dsp import firdes, windows
from futuresdr_tpu.runtime.executor import Executor, _enable_compile_cache
from futuresdr_tpu.runtime.flowgraph import Flowgraph


def build_runner(n_ch, decim, chunk, mesh):
    rng = np.random.default_rng(0)
    x = (
        (rng.standard_normal(chunk) + 1j * rng.standard_normal(chunk)) * 0.1
    ).astype(np.complex64)
    ataps = firdes.lowpass(0.4 / decim, windows.hamming(32))
    fg = Flowgraph()
    ch = PfbChannelizer(n_ch, taps=default_channelizer_taps(n_ch, 8))
    fg.stream(ResidentSource(x), ch)
    for k in range(n_ch):
        d = QuadratureDemod(1.0, name=f"qd{k}")
        f = Fir.decimating(ataps, decim, dtype=np.float32, name=f"fir{k}")
        fg.stream(ch, d, src_port=k)
        fg.stream(d, f)
        fg.stream(f, NullSink(np.float32, name=f"ns{k}"))
    ex = Executor(fg, chunk_size=chunk, mesh=mesh)

    def run(n):
        ex.max_steps = n
        ex.running = True
        try:
            ex.run_loop()
        finally:
            ex.running = False

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--n-ch", type=int, default=1024)
    ap.add_argument("--decim", type=int, default=8)
    ap.add_argument("--rs", default="512,1024,2048,4096")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    _enable_compile_cache()

    devs = jax.devices()[: args.devices]
    mesh = Mesh(np.array(devs), ("time",))
    print(f"# mesh: {len(devs)} × {devs[0].platform}", file=sys.stderr)

    for r in (int(v) for v in args.rs.split(",")):
        chunk = r * args.n_ch
        run_s = build_runner(args.n_ch, args.decim, chunk, None)
        run_m = build_runner(args.n_ch, args.decim, chunk, mesh)
        run_s(4)
        run_m(4)  # warm both (compile + donated shapes)
        ratios = []
        it = 8
        for _ in range(args.reps):
            while True:
                t0 = time.perf_counter()
                run_s(it)
                dt_s = time.perf_counter() - t0
                if dt_s > 0.4:
                    break
                it *= 2
            t0 = time.perf_counter()
            run_m(it)
            dt_m = time.perf_counter() - t0
            ratios.append(dt_s / dt_m)
        ratios.sort()
        med = ratios[len(ratios) // 2]
        gs = it * chunk / dt_s / 1e9
        print(
            f"r={r:5d} ({chunk/1e6:5.1f}M samp/step): single {gs:6.2f} GS/s,"
            f" mesh/single = {med:.3f}"
            f"  (overhead {100 * (1 - med):+.1f}%)"
            f"  ratios {' '.join(f'{q:.2f}' for q in ratios)}"
        )


if __name__ == "__main__":
    main()

"""Mesh-tier stability soak: the composed 1024-ch bank under
Runtime(mesh=...) streaming continuously (default 3 minutes).

    python perf/mesh_soak.py [--minutes 3]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time
import numpy as np, jax
from jax.sharding import Mesh
from futuresdr_tpu.blocks import (
    Fir, NullSink, PfbChannelizer, QuadratureDemod, ResidentSource,
)
from futuresdr_tpu.blocks.pfb import default_channelizer_taps
from futuresdr_tpu.dsp import firdes, windows
from futuresdr_tpu.runtime.executor import Executor, _enable_compile_cache
from futuresdr_tpu.runtime.flowgraph import Flowgraph
import resource

ap = argparse.ArgumentParser()
ap.add_argument("--minutes", type=float, default=3.0)
args = ap.parse_args()

_enable_compile_cache()
M, D, r = 1024, 8, 2048
chunk = r * M
rng = np.random.default_rng(0)
x = ((rng.standard_normal(chunk) + 1j * rng.standard_normal(chunk)) * 0.1).astype(np.complex64)
ataps = firdes.lowpass(0.4 / D, windows.hamming(32))
fg = Flowgraph()
ch = PfbChannelizer(M, taps=default_channelizer_taps(M, 8))
fg.stream(ResidentSource(x), ch)
for k in range(M):
    d = QuadratureDemod(1.0, name=f"q{k}")
    f = Fir.decimating(ataps, D, dtype=np.float32, name=f"f{k}")
    fg.stream(ch, d, src_port=k)
    fg.stream(d, f)
    fg.stream(f, NullSink(np.float32, name=f"n{k}"))
mesh = Mesh(np.array(jax.devices()[:1]), ("time",))
ex = Executor(fg, chunk_size=chunk, mesh=mesh)

def run(n):
    ex.max_steps = n
    ex.running = True
    try:
        ex.run_loop()
    finally:
        ex.running = False

run(8)
rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
t_end = time.monotonic() + 60.0 * args.minutes
steps = 0
t0 = time.monotonic()
while time.monotonic() < t_end:
    run(64)
    steps += 64
dt = time.monotonic() - t0
rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
print(f"mesh soak: {steps} steps, {steps*chunk/dt/1e9:.2f} GS/s mean, rss {rss0:.0f}->{rss1:.0f} MB over {dt:.0f}s")
assert steps * chunk / dt / 1e9 > 2.0
print("MESH SOAK OK")

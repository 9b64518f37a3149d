import time
import numpy as np, jax, jax.numpy as jnp
from futuresdr_tpu import config
from futuresdr_tpu.runtime.executor import _enable_compile_cache
_enable_compile_cache()
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.fir import conv1d_valid
from futuresdr_tpu.dsp import firdes, windows

taps = firdes.lowpass(0.2, windows.hamming(64)).astype(np.float32)
rng = np.random.default_rng(0)
n = 1 << 22
x = cplx.from_numpy((rng.standard_normal(n) + 1j*rng.standard_normal(n)).astype(np.complex64))

def timeit():
    f = jax.jit(lambda xx: conv1d_valid(xx, jnp.asarray(taps)))
    y = f(x); jax.block_until_ready(y)
    iters = 8
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(x)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        if dt > 1.0:
            return n*iters/dt/1e9, y
        iters *= 2

config.set("fir_dtype", "float32")
g32, y32 = timeit()
config.set("fir_dtype", "bfloat16")
g16, y16 = timeit()
rel = float(jnp.linalg.norm(y16.re - y32.re) / jnp.linalg.norm(y32.re))
print(f"64-tap complex FIR 4M samples: f32 {g32:.2f} GS/s  bf16 {g16:.2f} GS/s ({g16/g32:.2f}x)  rel err {rel:.1e}")
config.set("fir_dtype", "float32")

import time
import numpy as np, jax, jax.numpy as jnp
from futuresdr_tpu import config
from futuresdr_tpu.runtime.executor import _enable_compile_cache
_enable_compile_cache()
config.set("fft_precision", "high")
from futuresdr_tpu.models.pfb_fm_bank import BankConfig, _design, example_args
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import CArray
from futuresdr_tpu.ops.fir import conv1d_valid_branches, fir_decimate
from futuresdr_tpu.ops.fft import fft_c
from futuresdr_tpu.ops.demod import quadrature_demod

cfg = BankConfig(n_ch=1024, taps_per_ch=8, audio_decim=8, audio_taps=32)
branch_taps, audio_taps = _design(cfg)
M, L = cfg.n_ch, int(branch_taps.shape[-1])
r = 512
state, x = example_args(cfg, r=r)
pfb_st, last, ah = state
n = x.shape[-1]

def timeit(f, *args):
    g = jax.jit(f)
    out = g(*args); jax.block_until_ready(out)
    iters = 8
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if dt > 0.7:
            return dt / iters
        iters *= 2

# stage 1: reshape + branch FIR
def s1(x, st):
    xb = cplx.apply1(lambda t: t.reshape(r, M).T, x)
    ext = cplx.concat([st, xb], axis=-1)
    return conv1d_valid_branches(ext, branch_taps)
t1 = timeit(s1, x, pfb_st)

# stage 2: + FFT
def s2(x, st):
    v = s1(x, st)
    return fft_c(cplx.apply1(lambda t: t.T, v), axis=-1)
t2 = timeit(s2, x, pfb_st)

# stage 3: + demod
def s3(x, st, last):
    y = s2(x, st)
    z = cplx.apply1(lambda t: t.T, y)
    _, a = quadrature_demod(z, last, 1.0)
    return a
t3 = timeit(s3, x, pfb_st, last)

# stage 4: + audio decim (full pipeline)
def s4(x, st, last, ah):
    a = s3(x, st, last)
    _, audio = fir_decimate(a, audio_taps, cfg.audio_decim, ah)
    return audio
t4 = timeit(s4, x, pfb_st, last, ah)

print(f"branchFIR {t1*1e3:.2f} ms | +FFT {t2*1e3:.2f} (fft {1e3*(t2-t1):.2f}) | "
      f"+demod {t3*1e3:.2f} (demod {1e3*(t3-t2):.2f}) | full {t4*1e3:.2f} (audio {1e3*(t4-t3):.2f})")
print(f"implied full-step throughput {n/t4/1e9:.2f} GS/s")

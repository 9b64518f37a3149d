import time
import numpy as np, jax, jax.numpy as jnp
from futuresdr_tpu import config
from futuresdr_tpu.runtime.executor import _enable_compile_cache
_enable_compile_cache()
from futuresdr_tpu.models.pfb_fm_bank import BankConfig, make_bank_step, example_args
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.blocks.pfb import default_channelizer_taps
from futuresdr_tpu.ops.pfb import analysis_branch_taps, pfb_channelize

cfg = BankConfig()
M = cfg.n_ch

def throughput():
    _, step = make_bank_step(cfg)
    state, x = example_args(cfg, r=512)
    n = x.shape[-1]
    sj = jax.jit(step, donate_argnums=(0,))
    state, a = sj(state, x); jax.block_until_ready(a)
    iters = 8
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            state, a = sj(state, x)
        jax.block_until_ready(a)
        dt = time.perf_counter() - t0
        if dt > 1.0:
            return iters * n / dt / 1e9
        iters *= 2

def isolation():
    proto = default_channelizer_taps(M, cfg.taps_per_ch)
    G = jnp.asarray(analysis_branch_taps(proto, M).astype(np.float32))
    n = np.arange(64 * M)
    k = 137
    x = cplx.from_numpy(np.exp(2j*np.pi*(k/M)*n).astype(np.complex64))
    f = jax.jit(lambda xx: pfb_channelize(xx, G, M)[1])
    y = cplx.to_numpy(f(x))
    pwr = np.mean(np.abs(y[16:])**2, axis=0)
    return 10*np.log10(pwr[k] / np.max(np.delete(pwr, k)))

config.set("fir_dtype", "bfloat16")
for fftp in ("high", "default"):
    config.set("fft_precision", fftp)
    gs = throughput(); iso = isolation()
    print(f"fir=bf16 fft={fftp}: {gs:.2f} GS/s  isolation {iso:.1f} dB", flush=True)

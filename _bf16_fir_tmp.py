import time
import numpy as np, jax, jax.numpy as jnp
from futuresdr_tpu import config
from futuresdr_tpu.runtime.executor import _enable_compile_cache
_enable_compile_cache()
from futuresdr_tpu.models.pfb_fm_bank import BankConfig, _design
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.fir import conv1d_valid_branches, _shift_stack, _rev_taps_const
from futuresdr_tpu.blocks.pfb import default_channelizer_taps
from futuresdr_tpu.ops.pfb import analysis_branch_taps, pfb_channelize

cfg = BankConfig()
branch_taps, _ = _design(cfg)
M, L = 1024, int(branch_taps.shape[-1])
R = 512
rng = np.random.default_rng(0)
ext = cplx.from_numpy((rng.standard_normal((M, L-1+R)) + 1j*rng.standard_normal((M, L-1+R))).astype(np.complex64))
W = _rev_taps_const(np.asarray(branch_taps))

def cur(ext):
    return conv1d_valid_branches(ext, branch_taps)

def bf16(ext_re, ext_im):
    w16 = W.astype(jnp.bfloat16)
    vr = _shift_stack(ext_re.astype(jnp.bfloat16), L, R)
    vi = _shift_stack(ext_im.astype(jnp.bfloat16), L, R)
    yr = jnp.einsum('pt,ptn->pn', w16, vr, preferred_element_type=jnp.float32)
    yi = jnp.einsum('pt,ptn->pn', w16, vi, preferred_element_type=jnp.float32)
    return yr, yi

def timeit(f, *args):
    g = jax.jit(f)
    out = g(*args); jax.block_until_ready(out)
    iters = 16
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if dt > 0.7:
            return dt/iters
        iters *= 2

t_cur = timeit(cur, ext)
t_b = timeit(bf16, ext.re, ext.im)
ya = jax.jit(cur)(ext)
yr, yi = jax.jit(bf16)(ext.re, ext.im)
rel = float(jnp.sqrt(jnp.mean((ya.re - yr)**2) / jnp.mean(ya.re**2)))
print(f"f32 {t_cur*1e3:.3f} ms  bf16 {t_b*1e3:.3f} ms ({t_cur/t_b:.2f}x)  rel err {rel:.2e}")

# channel isolation with a bf16 front end: tone test at 1024 ch
G16 = jnp.asarray(np.asarray(branch_taps), jnp.float32)
n = np.arange(64*M)
k = 137
x = cplx.from_numpy(np.exp(2j*np.pi*(k/M)*n).astype(np.complex64))
def chan_bf16(xx):
    # patch: quantize taps+input to bf16 inside the standard channelizer math
    xb = cplx.apply1(lambda t: t.reshape(64, M).T.astype(jnp.bfloat16).astype(jnp.float32), xx)
    st = cplx.czeros((M, L-1))
    ext2 = cplx.concat([st, xb], axis=-1)
    vr = _shift_stack(ext2.re.astype(jnp.bfloat16), L, 64)
    vi = _shift_stack(ext2.im.astype(jnp.bfloat16), L, 64)
    w16 = W.astype(jnp.bfloat16)
    yr = jnp.einsum('pt,ptn->pn', w16, vr, preferred_element_type=jnp.float32)
    yi = jnp.einsum('pt,ptn->pn', w16, vi, preferred_element_type=jnp.float32)
    from futuresdr_tpu.ops.fft import fft_c
    v = cplx.CArray(yr.T, yi.T)
    return fft_c(v, axis=-1)
y = cplx.to_numpy(jax.jit(chan_bf16)(x))
pwr = np.mean(np.abs(y[16:])**2, axis=0)
iso = 10*np.log10(pwr[k]/np.max(np.delete(pwr, k)))
print(f"bf16 branch-FIR channel isolation: {iso:.1f} dB (target 60)")

import time
import numpy as np, jax, jax.numpy as jnp
from futuresdr_tpu import config
from futuresdr_tpu.runtime.executor import _enable_compile_cache
_enable_compile_cache()
config.set("fft_precision", "high")
config.set("fir_dtype", "bfloat16")
from futuresdr_tpu.models.pfb_fm_bank import BankConfig, _design
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import CArray
from futuresdr_tpu.ops.fir import conv1d_valid_branches, fir_decimate
from futuresdr_tpu.ops.fft import fft_c
from futuresdr_tpu.ops.demod import quadrature_demod

cfg = BankConfig()
branch_taps, audio_taps = _design(cfg)
M, L = cfg.n_ch, int(branch_taps.shape[-1])
r = 512
Ta = cfg.audio_taps
Ha = -(-(Ta - 1) // cfg.audio_decim) * cfg.audio_decim
rng = np.random.default_rng(0)
n = r * M
x = cplx.from_numpy((rng.standard_normal(n) + 1j*rng.standard_normal(n)).astype(np.complex64))
state = (cplx.czeros((M, L-1)), cplx.czeros((M, 1)), jnp.zeros((M, Ha), jnp.float32))

# DFT matrix (forward, unnormalized) as bf16 with f32 accum
k = np.arange(M, dtype=np.float64)
ang = -2*np.pi*np.outer(k, k)/M
D_re = jnp.asarray(np.cos(ang), jnp.bfloat16)
D_im = jnp.asarray(np.sin(ang), jnp.bfloat16)

def step_fftvariant(state, x, use_dft):
    pfb_st, last, ah = state
    xb = cplx.apply1(lambda t: t.reshape(r, M).T, x)
    ext = cplx.concat([pfb_st, xb], axis=-1)
    v = conv1d_valid_branches(ext, branch_taps)  # [M, r]
    new_st = ext[:, ext.shape[-1]-(L-1):]
    vt = cplx.apply1(lambda t: t.T, v)  # [r, M]
    if use_dft:
        a16 = vt.re.astype(jnp.bfloat16); b16 = vt.im.astype(jnp.bfloat16)
        yre = jnp.matmul(a16, D_re, preferred_element_type=jnp.float32) - \
              jnp.matmul(b16, D_im, preferred_element_type=jnp.float32)
        yim = jnp.matmul(a16, D_im, preferred_element_type=jnp.float32) + \
              jnp.matmul(b16, D_re, preferred_element_type=jnp.float32)
        y = CArray(yre, yim)
    else:
        y = fft_c(vt, axis=-1)
    z = cplx.apply1(lambda t: t.T, y)
    last2, a = quadrature_demod(z, last, cfg.demod_gain)
    ah2, audio = fir_decimate(a, audio_taps, cfg.audio_decim, ah)
    return (new_st, last2, ah2), audio

def timeit(f):
    g = jax.jit(f, donate_argnums=(0,))
    st = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), state)
    st, out = g(st, x); jax.block_until_ready(out)
    iters = 8
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            st, out = g(st, x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if dt > 1.0:
            return n*iters/dt/1e9
        iters *= 2

gs_fft = timeit(lambda s_, x_: step_fftvariant(s_, x_, False))
gs_dft = timeit(lambda s_, x_: step_fftvariant(s_, x_, True))
print(f"mixed-radix fft: {gs_fft:.2f} GS/s   dense bf16 DFT matmul: {gs_dft:.2f} GS/s ({gs_dft/gs_fft:.2f}x)")

# isolation with dense bf16 DFT (bf16 FIR too)
n2 = 64*M
kk = 137
xt = cplx.from_numpy(np.exp(2j*np.pi*(kk/M)*np.arange(n2)).astype(np.complex64))
def chan(xx, use_dft):
    xb = cplx.apply1(lambda t: t.reshape(64, M).T, xx)
    ext = cplx.concat([cplx.czeros((M, L-1)), xb], axis=-1)
    v = conv1d_valid_branches(ext, branch_taps)
    vt = cplx.apply1(lambda t: t.T, v)
    if use_dft:
        a16 = vt.re.astype(jnp.bfloat16); b16 = vt.im.astype(jnp.bfloat16)
        return CArray(jnp.matmul(a16, D_re, preferred_element_type=jnp.float32) -
                      jnp.matmul(b16, D_im, preferred_element_type=jnp.float32),
                      jnp.matmul(a16, D_im, preferred_element_type=jnp.float32) +
                      jnp.matmul(b16, D_re, preferred_element_type=jnp.float32))
    return fft_c(vt, axis=-1)
y = cplx.to_numpy(jax.jit(lambda xx: chan(xx, True))(xt))
pwr = np.mean(np.abs(y[16:])**2, axis=0)
print(f"dense bf16 DFT isolation: {10*np.log10(pwr[kk]/np.max(np.delete(pwr, kk))):.1f} dB")

"""Batched soft Viterbi decoding on device (rate-1/2 convolutional codes).

Parity: ``examples/wlan/src/viterbi_decoder.rs`` (the reference's SSE
hard-decision decoder) — redesigned for TPU. The reference decodes one
frame at a time with hand-written SIMD ACS; here the add-compare-select
recursion runs as a ``lax.scan`` over time with the 2^(K-1) states AND a
whole batch of frames vectorized per step, so a dense capture's frames
decode in one device program and only decoded bits ever cross D2H (the
per-frame LLR fetch previously dominated dense-capture decode time on
PCIe/tunnel-limited hosts).

Two scans: forward ACS emitting per-step decision words, then a reverse
traceback scan following the surviving predecessor chain.  Metrics are
f32 and unnormalized — branch costs are bounded by the LLR clip, so the
worst-case drift over a WLAN frame (~5e4) stays far above f32 resolution
at that magnitude (~5e-3) relative to the LLR quantum.

TPU-first forms (measured on v5e through the dev tunnel, where gather ops
carry a large flat per-program cost):

* **No gathers anywhere.**  The K=7 predecessor permutation
  ``pred0[s] = (s & 31) << 1`` is a strided slice + tile; traceback
  selections (``dec[b, s]``, table rows) are one-hot contractions against
  an iota — comparisons and matmuls, the ops TPUs vectorize natively.
* **Radix-r time collapsing** (``radix`` argument): r trellis steps fold
  into one scan iteration by enumerating all 2^r input words per end
  state — per-step work grows ~2^r but the sequential step count drops
  r×, which wins when scan steps are latency-bound rather than
  FLOP-bound (they are: each step touches only [B, 64] floats).

Convention matches ``models/wlan/viterbi.py``: state = last K-1 input
bits, newest at the MSB; LLR > 0 favors bit 1; branch cost for expected
channel bit ``e`` with LLR ``l`` is ``e ? -l : +l`` (lower = better).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _tables(K: int, g0: int, g1: int):
    ns = 1 << (K - 1)
    out = np.zeros((2, ns, 2), dtype=np.uint8)
    for s in range(ns):
        for b in (0, 1):
            reg = (b << (K - 1)) | s
            out[b, s, 0] = bin(reg & g0).count("1") & 1
            out[b, s, 1] = bin(reg & g1).count("1") & 1
    n = np.arange(ns)
    bit_of = (n >> (K - 2)).astype(np.int32)
    pred0 = ((n & ((ns >> 1) - 1)) << 1).astype(np.int32)
    pred1 = (pred0 | 1).astype(np.int32)
    e0 = out[bit_of, pred0].astype(np.float32)  # [ns, 2]
    e1 = out[bit_of, pred1].astype(np.float32)
    # branch cost = sgn·llr summed over the two channel bits
    sgn0 = 1.0 - 2.0 * e0
    sgn1 = 1.0 - 2.0 * e1
    return bit_of, pred0, pred1, sgn0, sgn1


def _radix_tables(K: int, g0: int, g1: int, r: int):
    """Collapsed r-step trellis: for every end state s, the 2^r
    (predecessor, input word) pairs reaching it, with the 2r channel-bit
    signs along the way and the r chronological input bits."""
    ns = 1 << (K - 1)
    step_out = np.zeros((2, ns, 2), np.uint8)
    nxt = np.zeros((ns, 2), np.int32)
    for s in range(ns):
        for b in (0, 1):
            reg = (b << (K - 1)) | s
            step_out[b, s, 0] = bin(reg & g0).count("1") & 1
            step_out[b, s, 1] = bin(reg & g1).count("1") & 1
            nxt[s, b] = (b << (K - 2)) | (s >> 1)
    nw = 1 << r
    buckets: dict = {s: [] for s in range(ns)}
    for p in range(ns):
        for w in range(nw):
            s0 = p
            outs = []
            bits = [(w >> (r - 1 - j)) & 1 for j in range(r)]  # chronological
            for b in bits:
                outs.extend(step_out[b, s0])
                s0 = nxt[s0, b]
            buckets[int(s0)].append((p, bits, outs))
    pred = np.zeros((ns, nw), np.int32)
    sgn = np.zeros((ns, nw, 2 * r), np.float32)
    wordbits = np.zeros((ns, nw, r), np.float32)
    for s in range(ns):
        assert len(buckets[s]) == nw
        for c, (p, bits, outs) in enumerate(buckets[s]):
            pred[s, c] = p
            wordbits[s, c] = bits
            sgn[s, c] = [1.0 - 2.0 * e for e in outs]
    return pred, sgn, wordbits


@lru_cache(maxsize=None)
def make_batch_viterbi_soft(
    K: int = 7, g0: int = 0o133, g1: int = 0o171, radix: int = 1
):
    """Returns jitted ``decode(llrs[B, T, 2] f32) -> bits[B, T] uint8``.

    Zero LLRs are erasures (punctured or beyond-frame positions): every
    branch gets the same cost there, so metrics freeze and traceback
    through the tail region still follows the best true-frame path.

    ``radix`` collapses that many trellis steps per scan iteration
    (T must be divisible by it; WLAN's n_dbps are all multiples of 12,
    so radix 1/2/3/4/6 always divide a whole-frame T).
    """
    if radix == 1:
        return _make_radix1(K, g0, g1)
    return _make_radixr(K, g0, g1, radix)


def _make_radix1(K: int, g0: int, g1: int):
    bit_of, pred0, pred1, sgn0, sgn1 = _tables(K, g0, g1)
    ns = 1 << (K - 1)
    # factory-cached constants stay NUMPY: jnp.asarray here would cache
    # a tracer if the factory is first invoked inside an active trace
    # (lru_cache gotcha); numpy embeds per-trace instead
    s0c, s1c = sgn0, sgn1
    half = ns >> 1
    # sanity: the K=7 predecessor structure the strided forms rely on
    assert np.array_equal(pred0, np.tile(np.arange(half) * 2, 2))
    assert np.array_equal(bit_of, (np.arange(ns) >= half).astype(np.int32))

    def decode(llrs: jnp.ndarray) -> jnp.ndarray:
        b = llrs.shape[0]

        def fwd(metric, lt):  # metric [B, ns], lt [B, 2]
            bm0 = lt[:, 0:1] * s0c[:, 0] + lt[:, 1:2] * s0c[:, 1]
            bm1 = lt[:, 0:1] * s1c[:, 0] + lt[:, 1:2] * s1c[:, 1]
            # metric[:, pred0] = even states tiled twice; pred1 = odd —
            # strided slices instead of a gather
            ev = jnp.concatenate([metric[:, 0::2]] * 2, axis=1)
            od = jnp.concatenate([metric[:, 1::2]] * 2, axis=1)
            m0 = ev + bm0
            m1 = od + bm1
            take1 = m1 < m0
            return jnp.where(take1, m1, m0), take1

        init = jnp.full((b, ns), 1e6, jnp.float32).at[:, 0].set(0.0)
        metric, decs = jax.lax.scan(
            fwd, init, jnp.swapaxes(llrs.astype(jnp.float32), 0, 1)
        )  # decs: [T, B, ns] bool
        # argmin via min + first-match (gather-free)
        iota = jnp.arange(ns, dtype=jnp.int32)
        mn = jnp.min(metric, axis=-1, keepdims=True)
        s = jnp.min(
            jnp.where(metric <= mn, iota[None, :], ns), axis=-1
        ).astype(jnp.int32)  # [B]

        def back(s, dec_t):  # dec_t [B, ns] bool
            oh = iota[None, :] == s[:, None]  # [B, ns]
            d = jnp.sum(jnp.where(oh, dec_t, False), axis=1)
            bit = (s >= half).astype(jnp.uint8)
            p0 = (s & (half - 1)) << 1
            s2 = jnp.where(d, p0 | 1, p0)
            return s2, bit

        _, bits = jax.lax.scan(back, s, decs, reverse=True)  # [T, B]
        return jnp.swapaxes(bits, 0, 1)

    return jax.jit(decode)


def _make_radixr(K: int, g0: int, g1: int, r: int):
    pred, sgn, wordbits = _radix_tables(K, g0, g1, r)
    ns = 1 << (K - 1)
    nw = 1 << r
    # one-hot predecessor-selection matrix: P[p, s*nw + c] = (pred[s,c]==p)
    P = np.zeros((ns, ns * nw), np.float32)
    for s in range(ns):
        for c in range(nw):
            P[pred[s, c], s * nw + c] = 1.0
    # numpy on purpose — see _make_radix1's factory-constant note
    Pc = P
    sgnc = sgn  # [ns, nw, 2r]
    wordc = wordbits  # [ns, nw, r] (0/1 floats)
    predf = pred.astype(np.float32)  # [ns, nw]

    def decode(llrs: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = llrs.shape
        assert t % r == 0, f"T={t} not divisible by radix {r}"
        nt = t // r
        blocks = llrs.astype(jnp.float32).reshape(b, nt, 2 * r)

        def fwd(metric, lt):  # metric [B, ns], lt [B, 2r]
            # predecessor metrics for every (end state, word): one matmul.
            # HIGHEST precision is load-bearing: metrics grow to ~5e4
            # while decision margins sit at the LLR quantum — the TPU
            # default bf16 matmul (8-bit mantissa) rounds those margins
            # away entirely (measured: 0/40 frames decode on chip)
            pm = jnp.matmul(
                metric, Pc, precision=jax.lax.Precision.HIGHEST
            ).reshape(-1, ns, nw)  # [B, ns, nw]
            bm = jnp.einsum(
                "bj,scj->bsc",
                lt,
                sgnc,
                precision=jax.lax.Precision.HIGHEST,
            )  # [B, ns, nw]
            m = pm + bm
            mn = jnp.min(m, axis=-1)  # [B, ns]
            # winning word index, first-match, gather-free
            iw = jnp.arange(nw, dtype=jnp.int32)
            c = jnp.min(
                jnp.where(m <= mn[..., None], iw, nw), axis=-1
            ).astype(jnp.int32)  # [B, ns]
            return mn, c

        init = jnp.full((b, ns), 1e6, jnp.float32).at[:, 0].set(0.0)
        metric, decs = jax.lax.scan(
            fwd, init, jnp.swapaxes(blocks, 0, 1)
        )  # decs: [NT, B, ns] int32
        iota = jnp.arange(ns, dtype=jnp.int32)
        mn = jnp.min(metric, axis=-1, keepdims=True)
        s = jnp.min(
            jnp.where(metric <= mn, iota[None, :], ns), axis=-1
        ).astype(jnp.int32)  # [B]

        iw = jnp.arange(nw, dtype=jnp.int32)

        def back(s, dec_t):  # dec_t [B, ns] int32
            ohs = (iota[None, :] == s[:, None]).astype(jnp.float32)  # [B,ns]
            c = jnp.sum(
                jnp.where(ohs > 0, dec_t.astype(jnp.float32), 0.0), axis=1
            ).astype(jnp.int32)  # [B]
            ohc = (iw[None, :] == c[:, None]).astype(jnp.float32)  # [B,nw]
            # bits[b] = wordbits[s_b, c_b, :], pred the same way
            rows = jnp.einsum("bs,scr->bcr", ohs, wordc)  # [B, nw, r]
            bits = jnp.einsum("bc,bcr->br", ohc, rows)  # [B, r]
            pr = jnp.einsum("bs,sc->bc", ohs, predf)  # [B, nw]
            s2 = jnp.sum(ohc * pr, axis=-1).astype(jnp.int32)
            return s2, bits.astype(jnp.uint8)

        _, bits = jax.lax.scan(back, s, decs, reverse=True)  # [NT, B, r]
        return jnp.swapaxes(bits, 0, 1).reshape(b, t)

    return jax.jit(decode)

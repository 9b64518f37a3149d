"""Scan feed-mode A/B: how K-chunk batching feeds its operands.

The r4 diagnosis (NOTES "Scan feed modes") found that `lax.scan` over a
STACKED ``[K, n]`` operand loses ~40% of the whole fused-bank step at
4.2M-sample chunks. This harness isolated the mechanism (2026-08-20
chip session, paired medians):

  scan_xs       9.00 GS/s  lax.scan over the stacked operand
  unrolled      8.15       K unrolled calls, STATIC stacked[k] indexing
  unrolled_sep 13.55       K unrolled calls, K SEPARATE operands
  operand      14.75       scan re-feeding ONE loop-invariant chunk
                           (ceiling: no per-iteration operand handling)

Static indexing is NO better than the dynamic slice (0.90x) — the cost
is that ANY slice in front of a pallas_call (whose operands must be
materialized buffers) is a full HBM copy of the chunk, ~34 MB/iter here.
K separate operands are already materialized buffers: 1.50x over the
stacked scan, 92% of the ceiling. The executor's host-fed batches above
``scan_unroll_min_chunk`` therefore dispatch through
``CompiledFlowgraph.make_unrolled_step`` with per-chunk operands and
never build the stacked array.

Usage: python perf/scan_feed_ab.py [--k 4] [--r 4096] [--rounds 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--r", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--min-s", type=float, default=0.5)
    args = ap.parse_args()

    from futuresdr_tpu.models.pfb_fm_bank import (
        BankConfig,
        example_args,
        make_bank_step_fused,
    )
    from futuresdr_tpu.ops import cplx
    from futuresdr_tpu.runtime.executor import _enable_compile_cache
    from futuresdr_tpu.utils.sync import settle

    _enable_compile_cache()
    cfg = BankConfig(n_ch=1024, taps_per_ch=8, audio_decim=8, audio_taps=32)
    K, r = args.k, args.r
    init_f, step = make_bank_step_fused(cfg, tile_rows=128)
    _, x = example_args(cfg, r=r)
    n = K * r * cfg.n_ch  # wideband samples per dispatch

    # K distinct chunks stacked on the leading axis (device-resident)
    rng = np.random.default_rng(1)
    xs_np = (
        rng.standard_normal((K, r * cfg.n_ch))
        + 1j * rng.standard_normal((K, r * cfg.n_ch))
    ).astype(np.complex64)
    xs = jax.device_put(cplx.from_numpy(xs_np))
    x = jax.device_put(x)

    def scan_xs(state, xs):
        def body(c, xk):
            c, a = step(c, xk)
            return c, a

        return jax.lax.scan(body, state, xs)

    def unrolled(state, xs):
        import jax.numpy as jnp
        from jax import tree_util as jtu

        outs = []
        for k in range(K):
            state, a = step(state, jtu.tree_map(lambda t: t[k], xs))
            outs.append(a)
        return state, jtu.tree_map(lambda *ts: jnp.stack(ts), *outs)

    def operand(state, x):
        def body(c, _):
            c, a = step(c, x)
            return c, a

        return jax.lax.scan(body, state, None, length=K)

    def unrolled_sep(state, xs_tuple):
        # K SEPARATE operands — Python tuple indexing, no XLA slice at
        # all: each chunk is already a materialized buffer the kernel
        # can consume directly
        import jax.numpy as jnp
        from jax import tree_util as jtu

        outs = []
        for k in range(K):
            state, a = step(state, xs_tuple[k])
            outs.append(a)
        return state, jtu.tree_map(lambda *ts: jnp.stack(ts), *outs)

    xs_sep = jax.device_put(
        tuple(cplx.from_numpy(xs_np[k]) for k in range(K))
    )

    variants = {
        "scan_xs": (jax.jit(scan_xs, donate_argnums=(0,)), xs),
        "unrolled": (jax.jit(unrolled, donate_argnums=(0,)), xs),
        "unrolled_sep": (jax.jit(unrolled_sep, donate_argnums=(0,)), xs_sep),
        "operand": (jax.jit(operand, donate_argnums=(0,)), x),
    }
    states = {name: init_f() for name in variants}

    for name, (fn, arg) in variants.items():  # compile + warm (2 calls)
        t0 = time.perf_counter()
        for _ in range(2):
            states[name], audio = fn(states[name], arg)
        settle(audio)
        print(f"# {name}: warm {time.perf_counter() - t0:.1f}s")

    results: dict = {name: [] for name in variants}
    for rnd in range(args.rounds):
        for name, (fn, arg) in variants.items():
            iters = 2
            while True:
                t0 = time.perf_counter()
                for _ in range(iters):
                    states[name], audio = fn(states[name], arg)
                settle(audio)
                dt = time.perf_counter() - t0
                if dt > args.min_s:
                    break
                iters *= 2
            gsps = n * iters / dt / 1e9
            results[name].append(gsps)
            print(f"round {rnd}: {name:9s} {gsps:7.3f} GS/s")

    print()
    meds = {}
    for name, vals in results.items():
        vals = sorted(vals)
        meds[name] = vals[len(vals) // 2]
        print(
            f"{name:9s} median {meds[name]:7.3f} GS/s  "
            f"range [{vals[0]:.3f}, {vals[-1]:.3f}]"
        )
    print(
        f"unrolled/scan_xs = {meds['unrolled'] / meds['scan_xs']:.2f}x   "
        f"unrolled_sep/scan_xs = {meds['unrolled_sep'] / meds['scan_xs']:.2f}x   "
        f"unrolled_sep/operand = {meds['unrolled_sep'] / meds['operand']:.2f}x"
    )


if __name__ == "__main__":
    main()

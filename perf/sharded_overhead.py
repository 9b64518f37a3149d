"""Overlap-save exchange overhead % — the BASELINE.json metric.

Runs the 1024-ch PFB + FM bank step twice on an N-device mesh: once with
the real packed-ppermute halo exchange and once with the exchange replaced
by local zeros (same compute including the boundary-tail recompute, no
communication), and reports the step-time difference as exchange
overhead %.

All bank variants now move EVERY halo through one wrap-around ppermute
per step (``parallel.halo.packed_stream_halo``) — the r2 design used
3 ppermutes + 3 psums per step and measured 19.9–31.7%.

On this container only a virtual CPU mesh is available
(--xla_force_host_platform_device_count); run on a real slice for ICI
numbers — the harness is mesh-agnostic.

Run:  python perf/sharded_overhead.py [--devices 8] [--r 2048]
      [--variant 1d|2d|partial|fused|fused2d]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--r", type=int, default=2048, help="channelized steps")
    ap.add_argument(
        "--variant",
        choices=["1d", "2d", "partial", "fused", "fused2d", "fusedpartial"],
        default="1d",
        help="mesh layout / kernel variant",
    )
    ap.add_argument(
        "--real",
        action="store_true",
        help="use the real attached devices instead of a virtual CPU mesh",
    )
    args = ap.parse_args()

    import jax

    if args.real:
        if len(jax.devices()) < args.devices:
            print(
                f"# --real but only {len(jax.devices())} devices",
                file=sys.stderr,
            )
            sys.exit(1)
    else:
        # default: virtual CPU mesh, configured BEFORE any backend init
        # (env vars are not enough on containers whose sitecustomize pins
        # a TPU backend at interpreter start)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
        print(
            f"# {args.devices}-device virtual CPU mesh (pass --real on an "
            "actual slice for ICI numbers)",
            file=sys.stderr,
        )

    from futuresdr_tpu.models.pfb_fm_bank import (
        BankConfig,
        make_sharded_bank_step,
        make_sharded_bank_step_2d,
        make_sharded_bank_step_2d_fused,
        make_sharded_bank_step_2d_partial,
        make_sharded_bank_step_fused,
    )
    from futuresdr_tpu.ops import cplx
    from futuresdr_tpu.parallel import make_mesh

    cfg = BankConfig()
    if args.variant in ("1d", "fused"):
        mesh = make_mesh((args.devices,), ("time",))
        mk = (
            make_sharded_bank_step_fused
            if args.variant == "fused"
            else make_sharded_bank_step
        )
        builder = lambda: mk(cfg, mesh)  # noqa: E731
    else:
        mesh = make_mesh((2, args.devices // 2), ("ch", "time"))
        from futuresdr_tpu.models.pfb_fm_bank import (
            make_sharded_bank_step_2d_partial_fused,
        )

        mk = {
            "2d": make_sharded_bank_step_2d,
            "partial": make_sharded_bank_step_2d_partial,
            "fused2d": make_sharded_bank_step_2d_fused,
            "fusedpartial": make_sharded_bank_step_2d_partial_fused,
        }[args.variant]
        builder = lambda: mk(cfg, mesh)  # noqa: E731
    n = args.r * cfg.n_ch
    rng = np.random.default_rng(0)
    x = cplx.from_numpy(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
    )

    import futuresdr_tpu.models.pfb_fm_bank as bank_mod
    import futuresdr_tpu.parallel.halo as halo_mod

    def timed(step, carry):
        f = jax.jit(step)
        c, a = f(carry, x)
        jax.block_until_ready(a)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            c, a = f(c, x)
        jax.block_until_ready(a)
        return (time.perf_counter() - t0) / iters

    init, step = builder()
    t_real = timed(step, init())

    # no-comm variant: identical pack/unpack compute (each shard "receives"
    # its OWN tails — keeps the boundary-tail recompute live so XLA cannot
    # dead-code-eliminate it from the baseline), only the ppermute removed
    import jax.numpy as jnp

    orig = halo_mod.packed_stream_halo
    try:

        def fake_packed(tails, axis_name, carry):
            shapes = [t.shape for t in tails]
            sizes = [int(np.prod(s)) for s in shapes]
            buf = jnp.concatenate([t.reshape(-1) for t in tails])
            idx = jax.lax.axis_index(axis_name)
            used = jnp.where(idx == 0, carry, buf)
            received, off = [], 0
            for s, sz in zip(shapes, sizes):
                received.append(used[off : off + sz].reshape(s))
                off += sz
            return received, buf

        halo_mod.packed_stream_halo = fake_packed
        bank_mod.packed_stream_halo = fake_packed
        init2, step2 = builder()
        t_local = timed(step2, init2())
    finally:
        halo_mod.packed_stream_halo = orig
        bank_mod.packed_stream_halo = orig

    overhead = (t_real - t_local) / t_real * 100.0
    plat = jax.devices()[0].platform
    if args.variant == "partial":
        print(
            "# note: partial variant's all_gather is algorithmic, not a "
            "halo — it stays in the no-comm baseline",
            file=sys.stderr,
        )
    print(
        "variant,devices,platform,r,step_real_ms,step_nocomm_ms,"
        "exchange_overhead_pct"
    )
    print(
        f"{args.variant},{args.devices},{plat},{args.r},{t_real*1e3:.3f},"
        f"{t_local*1e3:.3f},{overhead:.2f}"
    )


if __name__ == "__main__":
    main()

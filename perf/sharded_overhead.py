"""Overlap-save exchange overhead % — the BASELINE.json metric.

Runs the 1024-ch PFB + FM bank step twice on an N-device mesh: once with
the real ppermute halo exchanges and once with the halos replaced by
local zeros (same compute, no communication), and reports the step-time
difference as exchange overhead %.

On this container only a virtual CPU mesh is available
(--xla_force_host_platform_device_count); run on a real slice for ICI
numbers — the harness is mesh-agnostic.

Run:  python perf/sharded_overhead.py [--devices 8] [--r 512]
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
    ap.add_argument("--r", type=int, default=512, help="channelized steps")
    ap.add_argument(
        "--variant",
        choices=["1d", "2d", "partial"],
        default="1d",
        help="1d time mesh, 2d ch-x-time, or partial-DFT 2d",
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
        make_sharded_bank_step_2d_partial,
    )
    from futuresdr_tpu.ops import cplx
    from futuresdr_tpu.parallel import make_mesh

    cfg = BankConfig()
    if args.variant == "1d":
        mesh = make_mesh((args.devices,), ("time",))
        builder = lambda: make_sharded_bank_step(cfg, mesh)  # noqa: E731
    else:
        mesh = make_mesh((2, args.devices // 2), ("ch", "time"))
        mk = (
            make_sharded_bank_step_2d_partial
            if args.variant == "partial"
            else make_sharded_bank_step_2d
        )
        builder = lambda: mk(cfg, mesh)  # noqa: E731
    n = args.r * cfg.n_ch
    rng = np.random.default_rng(0)
    x = cplx.from_numpy(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
    )

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

    # no-comm variant: halos filled locally (monkeypatched)
    orig_halo, orig_ring = halo_mod.halo_left, halo_mod.ring_carry
    try:
        def fake_halo(x_, h, axis_name, carry=None):
            if h == 0:
                return x_
            zeros = cplx.zeros_like_shape(x_, x_.shape[:-1] + (h,))
            return cplx.concat([zeros, x_], axis=-1)

        def fake_ring(x_, h, axis_name):
            return cplx.apply1(lambda t: t[..., t.shape[-1] - h :], x_)

        halo_mod.halo_left = fake_halo
        halo_mod.ring_carry = fake_ring
        # rebuild with the patched collectives
        import futuresdr_tpu.models.pfb_fm_bank as bank_mod

        bank_mod.halo_left = fake_halo
        bank_mod.ring_carry = fake_ring
        init2, step2 = builder()
        t_local = timed(step2, init2())
    finally:
        halo_mod.halo_left = orig_halo
        halo_mod.ring_carry = orig_ring
        import futuresdr_tpu.models.pfb_fm_bank as bank_mod

        bank_mod.halo_left = orig_halo
        bank_mod.ring_carry = orig_ring

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

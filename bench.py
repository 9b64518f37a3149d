"""Headline benchmark: 1024-channel PFB channelizer + FM demod bank.

Measures wideband IQ samples/s through the full chain (branch-FIR +
channelizer FFT + quadrature demod + audio decimating FIR) on one chip.
BASELINE.json north star: >10 GS/s aggregate on a v5e-16 ⇒ 0.625 GS/s/chip.

Protocol (the shared chip's delivered rate swings ~2.4× between sessions,
so single numbers are noise): every variant is timed as the MEDIAN of 5
repeats of a ≥0.5 s steady-state loop, all within one process. The ladder
(f32 einsum → bf16-FIR+dft_bf16 → fused Pallas kernel) prints to stderr so
regressions are attributable; the headline JSON line reports the best
variant's median.

Env knobs: BENCH_VERBOSE=1 (compile times), BENCH_LADDER=0 (headline
variant only, for quick runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

BASELINE_PER_CHIP_GSPS = 0.625  # 10 GS/s / 16 chips (v5e-16 north star)


def _sync(audio) -> None:
    """One shared trusted settle (~1 RTT ≈ 7% worst-case inflation on a
    >=0.5 s loop — conservative, never optimistic); see utils/sync.py
    for why block_until_ready cannot be used here."""
    from futuresdr_tpu.utils.sync import settle

    settle(audio)


WARM_S = {}  # per-rung compile+warm seconds (reported in the JSON line)
STALLS = {}  # per-rung reps retried on a >3x tenancy/compile stall


def _bench_median(step_j, state, x, n_samples: int, label: str, reps: int = 5):
    t0 = time.perf_counter()
    # warm EVERY call signature twice: call 1 compiles, call 2 runs with a
    # donated (device-resident) state buffer — the shape the timed loop
    # uses. r3's sharded rung showed a 0.030 GS/s first rep (350x below
    # median): a retrace/compile landing inside the "steady-state" window.
    for _ in range(2):
        state, audio = step_j(state, x)
    _sync(audio)
    WARM_S[label] = round(time.perf_counter() - t0, 2)
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# {label}: compile+warm {WARM_S[label]:.1f}s", file=sys.stderr)
    vals = []
    iters = 8
    retried = 0
    for _ in range(reps):
        while True:
            t0 = time.perf_counter()
            for _ in range(iters):
                state, audio = step_j(state, x)
            _sync(audio)
            dt = time.perf_counter() - t0
            if dt > 0.5:
                break
            iters *= 2
        vals.append(n_samples * iters / dt / 1e9)
    # a rep >3x below the running best is a compile-queue/tenancy stall,
    # not steady state (the protocol's claim): retry each such rep ONCE
    # and report the retry count — ranges must reflect the machine, but a
    # stall that big is the shared tunnel, and silently keeping it makes
    # the artifact claim steady-state it didn't measure
    best = max(vals)
    for i, v in enumerate(vals):
        if v < best / 3 and retried < reps:
            t0 = time.perf_counter()
            for _ in range(iters):
                state, audio = step_j(state, x)
            _sync(audio)
            dt = time.perf_counter() - t0
            vals[i] = n_samples * iters / dt / 1e9
            retried += 1
    STALLS[label] = retried
    vals.sort()
    med = vals[len(vals) // 2]
    print(
        f"# {label}: median {med:.3f} GS/s  "
        f"range [{vals[0]:.3f}, {vals[-1]:.3f}] over {reps} reps"
        + (f"  ({retried} stalled rep(s) retried)" if retried else ""),
        file=sys.stderr,
    )
    return state, med


def main() -> None:
    from futuresdr_tpu import config
    from futuresdr_tpu.models.pfb_fm_bank import (
        BankConfig,
        example_args,
        make_bank_step,
        make_bank_step_fused,
    )
    from futuresdr_tpu.runtime.executor import _enable_compile_cache

    _enable_compile_cache()
    cfg = BankConfig(n_ch=1024, taps_per_ch=8, audio_decim=8, audio_taps=32)
    # Chunk size: per-dispatch overhead through this TPU's tunnel measured
    # 200-600 us REGARDLESS of work (a [64,1024]@[1024,1024] matmul costs
    # the same wall time as [4096,1024]@...), so sub-1M-sample chunks
    # measure dispatch latency, not the machine. 2M samples/step (2 ms of
    # stream at 1 GS/s — ordinary SDR buffering) amortizes it; measured
    # scaling r=512/1024/2048/4096 -> 1.2/2.5/4.3/4.9 GS/s medians.
    # Per-rung best chunk (A/B'd on chip 2026-08-18): the einsum pipeline
    # peaks at r=2048 and *degrades* beyond (3.0 GS/s at r=4096 — the f32
    # intermediates spill to HBM), while the fused kernel keeps scaling
    # (6.6 / 13.0 / 11.8 GS/s at r=2048/4096/8192 — VMEM-resident, so
    # bigger grids only amortize dispatch). BENCH_R overrides both.
    r_env = os.environ.get("BENCH_R")
    r = int(r_env) if r_env else 2048
    r_fused = int(r_env) if r_env else 4096
    ladder = os.environ.get("BENCH_LADDER", "1") != "0"
    results = {}

    def _rung(key, label, build):
        # each rung is independent: a compile-queue stall or failure in
        # one must not cost the round its headline JSON line
        try:
            built = build()
            step_j, state, x = built[:3]
            n_samples = built[3] if len(built) > 3 else x.shape[-1]
            _, results[key] = _bench_median(
                step_j, state, x, n_samples, label
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"# {label}: FAILED {type(e).__name__}: {e}", file=sys.stderr)

    # headline rung FIRST: fused Pallas channelizer+demod kernel
    def _build_fused():
        init_f, step_f = make_bank_step_fused(cfg, tile_rows=128)
        _, x = example_args(cfg, r=r_fused)
        return jax.jit(step_f, donate_argnums=(0,)), init_f(), x

    # the same pipeline composed from BLOCKS and run through the full
    # Flowgraph/Executor product surface: ResidentSource → PfbChannelizer
    # → 1024×(QuadratureDemod → Fir.decimating) → 1024×NullSink. The
    # compiler's fusion pass (runtime/fusion.py) canonicalizes the 2·M+1
    # middle blocks onto the fused Pallas kernel and coalesces the sinks;
    # target: >=85% of the raw-step rung above (VERDICT r3 #1 — the
    # framework's abstraction must not cost the flagship rate).
    # ResidentSource (not NullSource) makes the comparison honest: the
    # raw rung re-feeds a device-RESIDENT operand, while NullSource
    # re-materializes its fill in-program each step (+8 B/sample of HBM
    # write traffic on the source path — measured as a consistent
    # 0.66-0.84 paired K=1 ratio where the resident-fed graph runs at
    # parity; under scan the fill is loop-invariant and hoists, which is
    # why the K=4 rung never showed it)
    def _build_flowgraph_runner(label, steps_per_call=1):
        """Composed-bank Executor; returns ``run_steps(n)`` + items/step."""
        from futuresdr_tpu.blocks import (
            Fir,
            NullSink,
            PfbChannelizer,
            QuadratureDemod,
            ResidentSource,
        )
        from futuresdr_tpu.blocks.pfb import default_channelizer_taps
        from futuresdr_tpu.dsp import firdes as _fd
        from futuresdr_tpu.dsp import windows as _win
        from futuresdr_tpu.ops import cplx as _cplx
        from futuresdr_tpu.runtime.flowgraph import Flowgraph

        M, D = cfg.n_ch, cfg.audio_decim
        ataps = _fd.lowpass(0.4 / D, _win.hamming(cfg.audio_taps))
        fg = Flowgraph()
        chan = PfbChannelizer(M, taps=default_channelizer_taps(M, cfg.taps_per_ch))
        _, x_src = example_args(cfg, r=r_fused)
        fg.stream(ResidentSource(_cplx.to_numpy(x_src)), chan)
        for k in range(M):
            d = QuadratureDemod(cfg.demod_gain, name=f"qd{k}")
            f = Fir.decimating(ataps, D, dtype=np.float32, name=f"fir{k}")
            fg.stream(chan, d, src_port=k)
            fg.stream(d, f)
            fg.stream(f, NullSink(np.float32, name=f"ns{k}"))
        from futuresdr_tpu.runtime.executor import Executor

        n_per_step = r_fused * M
        ex = Executor(fg, chunk_size=n_per_step)
        assert any(
            "bank+sinks" in line for line in ex.cfg.fusion_log
        ), "fusion pass did not fire on the composed bank graph"
        widest = max(ex.cfg.edge_items.values())
        if widest != n_per_step:
            print(
                f"# {label}: solved chunk {widest} != {n_per_step}",
                file=sys.stderr,
            )

        def run_steps(n):
            config.set("steps_per_call", steps_per_call)
            config.set("scan_max_chunk", 1 << 24)
            ex.max_steps = n
            ex.running = True
            try:
                ex.run_loop()
            finally:
                ex.running = False

        return run_steps, n_per_step

    # raw fused step and the composed flowgraph (fusion pass) are
    # measured PAIRED — alternating within each round — so the
    # flowgraph_vs_raw ratio is a same-tenancy number (sequential rungs
    # measured it anywhere from 69% to 112% purely on session swings).
    # Two pairings: K=1 (informational — through this tunnel both sides
    # are dispatch-RTT-bound and the ratio still swings 2x within a
    # session) and K=4 scan SATURATED (the honest abstraction-cost
    # number: both sides run at machine rate with ±0.3% noise; the raw
    # side is the loop-invariant-operand scan, the exact feed the
    # executor's device-source scan produces)
    def _paired_raw_vs_flowgraph(reps=5):
        raw_label = "fused pallas channelizer+demod"
        fg_label = "flowgraph/Executor composed bank (fusion pass)"
        step_j, state, x = _build_fused()
        n_raw = x.shape[-1]
        run_fg, n_fg = _build_flowgraph_runner(fg_label)

        t0 = time.perf_counter()
        for _ in range(2):
            state, audio = step_j(state, x)
        _sync(audio)
        WARM_S[raw_label] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        run_fg(4)
        WARM_S[fg_label] = round(time.perf_counter() - t0, 2)

        def time_raw(iters):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(iters):
                state, audio = step_j(state, x)
            _sync(audio)
            return time.perf_counter() - t0

        def time_fg(iters):
            t0 = time.perf_counter()
            run_fg(iters)
            return time.perf_counter() - t0

        return _paired_rounds(
            time_raw, n_raw, raw_label, time_fg, n_fg, fg_label, reps
        )

    def _paired_rounds(time_a, n_a, label_a, time_b, n_b, label_b, reps):
        """Alternate A and B within each round; per-side adaptive iters,
        the stall-retry rule on each side, ratio = median of per-round
        b/a ratios. Returns (median_a, median_b, ratio)."""
        a_vals, b_vals, ratios = [], [], []
        it = {"a": 8, "b": 8}
        sides = (
            ("a", time_a, n_a, a_vals),
            ("b", time_b, n_b, b_vals),
        )
        for _ in range(reps):
            for key, fn, n_per, vals in sides:
                while True:
                    dt = fn(it[key])
                    if dt > 0.5:
                        break
                    it[key] *= 2
                vals.append(n_per * it[key] / dt / 1e9)
            ratios.append(b_vals[-1] / a_vals[-1])
        # same stall-retry rule as every other rung (the protocol field
        # promises it): a rep >3x below its side's best is a tunnel
        # stall — retime that SIDE once and recompute the round's ratio
        for (key, fn, n_per, vals), label in zip(
            sides, (label_a, label_b)
        ):
            retried = 0
            best = max(vals)
            for i, v in enumerate(vals):
                if v < best / 3 and retried < reps:
                    vals[i] = n_per * it[key] / fn(it[key]) / 1e9
                    ratios[i] = b_vals[i] / a_vals[i]
                    retried += 1
            STALLS[label] = retried
        for label, vals in ((label_a, a_vals), (label_b, b_vals)):
            v = sorted(vals)
            print(
                f"# {label}: median {v[len(v) // 2]:.3f} GS/s  "
                f"range [{v[0]:.3f}, {v[-1]:.3f}] over {reps} paired reps"
                + (
                    f"  ({STALLS[label]} stalled rep(s) retried)"
                    if STALLS[label]
                    else ""
                ),
                file=sys.stderr,
            )
        r_s = sorted(ratios)
        ratio = r_s[len(r_s) // 2]
        print(
            f"# {label_b} / {label_a} per-round ratios: "
            f"{' '.join(f'{q:.2f}' for q in ratios)} -> median {ratio:.2f}",
            file=sys.stderr,
        )
        av, bv = sorted(a_vals), sorted(b_vals)
        return av[len(av) // 2], bv[len(bv) // 2], ratio

    def _paired_scan4(reps=5, K=4):
        raw_label = "raw fused step + K=4 scan (operand form)"
        fg_label = "flowgraph/Executor + steps_per_call=4 scan"
        init_f, step_f = make_bank_step_fused(cfg, tile_rows=128)
        _, x = example_args(cfg, r=r_fused)

        def scanned(carry, x):
            def body(c, _):
                c, a = step_f(c, x)
                return c, a

            return jax.lax.scan(body, carry, None, length=K)

        raw_j = jax.jit(scanned, donate_argnums=(0,))
        state = init_f()
        run_fg, n_fg = _build_flowgraph_runner(fg_label, steps_per_call=4)
        t0 = time.perf_counter()
        for _ in range(2):
            state, audio = raw_j(state, x)
        _sync(audio)
        WARM_S[raw_label] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        run_fg(8)
        WARM_S[fg_label] = round(time.perf_counter() - t0, 2)
        n_raw = K * x.shape[-1]

        def time_raw(iters):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(iters):
                state, audio = raw_j(state, x)
            _sync(audio)
            return time.perf_counter() - t0

        def time_fg(iters):
            t0 = time.perf_counter()
            run_fg(iters)
            return time.perf_counter() - t0

        return _paired_rounds(
            time_raw, n_raw, raw_label, time_fg, n_fg, fg_label, reps
        )

    ratio_k1 = ratio_sat = None
    try:
        (
            results["fused_pallas"],
            results["flowgraph_fused"],
            ratio_k1,
        ) = _paired_raw_vs_flowgraph()
    except Exception as e:  # noqa: BLE001 - report and continue
        print(
            f"# paired raw/flowgraph rungs: FAILED {type(e).__name__}: {e}",
            file=sys.stderr,
        )
        _rung("fused_pallas", "fused pallas channelizer+demod", _build_fused)

    # same composed graph with steps_per_call=4: the executor scans 4
    # chunks per dispatch, amortizing the per-dispatch tunnel overhead
    # that still binds even 4 ms steps (r4 measured ~2x over K=1 — the
    # framework's own executor is the fastest path to the kernel).
    # Paired against the raw step's own K=4 operand scan: the saturated
    # abstraction-cost ratio.
    try:
        (
            results["fused_scan4_raw"],
            results["flowgraph_fused_scan4"],
            ratio_sat,
        ) = _paired_scan4()
    except Exception as e:  # noqa: BLE001 - report and continue
        print(
            f"# flowgraph_fused_scan4: FAILED {type(e).__name__}: {e}",
            file=sys.stderr,
        )
    finally:
        config.set("steps_per_call", 1)

    # the north-star SHARDED config on a mesh of 1 (the one real chip):
    # same fused kernel inside shard_map + packed-ppermute halo machinery —
    # bounds the sharding-wrapper cost vs the rung above (VERDICT r2 #1)
    def _build_fused_sharded():
        from futuresdr_tpu.models.pfb_fm_bank import (
            make_sharded_bank_step_fused,
        )
        from futuresdr_tpu.parallel import make_mesh

        mesh = make_mesh((1,), ("time",), devices=jax.devices()[:1])
        init_c, step = make_sharded_bank_step_fused(
            cfg, mesh, tile_rows=128, interpret=False
        )
        _, x = example_args(cfg, r=r_fused)
        return jax.jit(step, donate_argnums=(0,)), init_c(), x

    if ladder:
        _rung(
            "fused_sharded_mesh1",
            "fused kernel sharded (shard_map, 1-device mesh)",
            _build_fused_sharded,
        )

        # the north-star sharded config SATURATED: lax.scan over K=4
        # chunks per dispatch (the same amortization the executor's
        # steps_per_call applies) — the per-chip rate the multi-chip
        # deployment would deliver once dispatch stops being the limit
        def _build_fused_sharded_scan():
            from futuresdr_tpu.models.pfb_fm_bank import (
                make_sharded_bank_step_fused,
            )
            from futuresdr_tpu.parallel import make_mesh

            K = 4
            mesh = make_mesh((1,), ("time",), devices=jax.devices()[:1])
            init_c, step = make_sharded_bank_step_fused(
                cfg, mesh, tile_rows=128, interpret=False
            )

            # operand form, NOT a stacked-xs scan: slicing a [K, n]
            # operand per iteration measured ~40% slower at 4.2M-sample
            # chunks (8.8 vs 14.8 GS/s, r4 diagnosis) — the same chunk
            # re-fed each iteration is the honest saturated-rate harness
            # (matches the executor's device-source scan, which has no
            # stacked operand at all)
            def scanned(carry, x):
                def body(c, _):
                    c, a = step(c, x)
                    return c, a

                return jax.lax.scan(body, carry, None, length=K)

            _, x = example_args(cfg, r=r_fused)
            return (
                jax.jit(scanned, donate_argnums=(0,)),
                init_c(),
                x,
                K * x.shape[-1],
            )

        _rung(
            "fused_sharded_scan4",
            "fused sharded mesh-1 + K=4 scan (saturated north-star)",
            _build_fused_sharded_scan,
        )

        def _build_einsum(fir_dtype, fft):
            def build():
                config.set("fft_precision", "high")
                config.set("fir_dtype", fir_dtype)
                config.set("channelizer_fft", fft)
                _, step = make_bank_step(cfg)
                state, x = example_args(cfg, r=r)
                return jax.jit(step, donate_argnums=(0,)), state, x

            return build

        _rung(
            "f32_mixed_radix",
            "f32 einsum + mixed-radix FFT",
            _build_einsum("float32", "mixed_radix"),
        )
        _rung(
            "bf16_dft",
            "bf16 FIR + dft_bf16",
            _build_einsum("bfloat16", "dft_bf16"),
        )

    if not results:
        raise SystemExit("every bench rung failed — see stderr")
    best = max(results, key=results.get)
    gsps = results[best]
    # efficiency at the measured rate, from the r3 roofline model (NOTES
    # "Fused-kernel roofline"): MXU work = 4 bf16 [R,M]@[M,M] matmuls =
    # 8·M FLOPs/wideband sample; HBM traffic ≈ 20 B/sample (x in 8,
    # a out+reread 12, audio rows ~0.5). v5e-1 peaks: ~197 Tbf16FLOP/s,
    # ~819 GB/s. The kernel is VPU-pipeline-bound, so neither hits 100%.
    V5E_BF16_TFLOPS = 197.0
    V5E_HBM_GBS = 819.0
    flops_per_sample = 8.0 * cfg.n_ch
    bytes_per_sample = 20.0
    out = {
        "metric": "pfb1024_fm_bank_samples_per_s_per_chip",
        "value": round(gsps, 4),
        "unit": "GS/s",
        "vs_baseline": round(gsps / BASELINE_PER_CHIP_GSPS, 3),
        "variant": best,
        "mfu_pct": round(
            100.0 * gsps * flops_per_sample / (V5E_BF16_TFLOPS * 1e3), 1
        ),
        "hbm_pct": round(
            100.0 * gsps * bytes_per_sample / V5E_HBM_GBS, 1
        ),
        "ladder": {k: round(v, 4) for k, v in results.items()},
        "warm_s": WARM_S,
        "stalled_reps_retried": {k: v for k, v in STALLS.items() if v},
        "protocol": "median of 5 x >=0.5s steady-state loops (2-call "
        "warm first; a rep >3x below best is a tunnel stall, retried "
        "once and counted); "
        f"chunk r={r} einsum rungs / r={r_fused} fused "
        f"({r_fused * 1024 / 1e6:.1f}M samples/step)",
    }
    # medians of PER-ROUND interleaved ratios — same-tenancy pairing,
    # not a quotient of two independently-noisy medians. The SATURATED
    # (K=4 scan) ratio is the abstraction-cost number; the K=1 ratio is
    # informational (dispatch-RTT-bound on both sides through this
    # tunnel, it swings 2x within a session even paired)
    if ratio_sat is not None:
        out["flowgraph_vs_raw_pct"] = round(100.0 * ratio_sat, 1)
    if ratio_k1 is not None:
        out["flowgraph_vs_raw_k1_pct"] = round(100.0 * ratio_k1, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

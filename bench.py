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
RANGES = {}  # per-rung [lo, hi] over the reps — the ladder honesty field:
# every official rung must be saturated enough that range <= ~10% of
# median (the r4 verdict: unsaturated rungs swung 1.9-3.5x on tenancy
# and meant nothing; they are gone from the ladder)


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
    RANGES[label] = [round(vals[0], 4), round(vals[-1], 4)]
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

    # key → stderr label, for the ladder_range field
    _RUNG_LABELS = {
        "fused_scan4_raw": "raw fused step + K=4 scan (operand form)",
        "flowgraph_fused_scan4": (
            "flowgraph/Executor DEFAULT config (auto steps_per_call)"
        ),
        "fused_sharded_scan4": "hand-built sharded bank + K=4 scan",
        "flowgraph_sharded_scan4": (
            "flowgraph/Executor mesh-1 (default config)"
        ),
        "f32_scan4": "f32 einsum + mixed-radix FFT (K=4 scan)",
        "bf16_scan4": "bf16 FIR + dft_bf16 (K=4 scan)",
    }

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
    def _build_flowgraph_runner(label, steps_per_call=None, mesh=None):
        """Composed-bank Executor; returns ``run_steps(n)`` + items/step.

        ``steps_per_call=None`` leaves the DEFAULT config untouched — the
        executor's auto gate picks K itself (r5: the default-config path
        must deliver the saturated rate without manual tuning).
        ``mesh`` compiles the same composed graph through the mesh tier
        (runtime/mesh.py)."""
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
        ex = Executor(fg, chunk_size=n_per_step, mesh=mesh)
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
            if steps_per_call is not None:
                config.set("steps_per_call", steps_per_call)
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
    # Both sides run SATURATED (K=4): the raw side as the loop-invariant-
    # operand scan (the exact feed the executor's device-source scan
    # produces), the flowgraph side at DEFAULT config — the executor's
    # auto steps_per_call gate must reach the machine rate without any
    # tuning (r5; the r4 artifact's K=1 73.8% row was the cost of the
    # old opt-in default). Unsaturated K=1 rungs are gone from the
    # ladder entirely: their r4 ranges spanned 1.9-3.5x on tenancy and
    # invited mis-citation (ladder honesty rule, see RANGES).

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
            RANGES[label] = [round(v[0], 4), round(v[-1], 4)]
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

    def _op_scan(step_f, K=4):
        """Operand-form K-step scan: the same chunk re-fed each
        iteration. NOT a stacked-xs scan — slicing a [K, n] operand per
        iteration measured ~40% slower at 4.2M-sample chunks (8.8 vs
        14.8 GS/s, r4 diagnosis); the loop-invariant operand matches the
        executor's device-source scan, which has no stacked operand."""

        def scanned(carry, x):
            def body(c, _):
                c, a = step_f(c, x)
                return c, a

            return jax.lax.scan(body, carry, None, length=K)

        return jax.jit(scanned, donate_argnums=(0,))

    def _paired_fg(raw_j, state, x, raw_label, fg_label, K, fg_kw, reps=5):
        """Paired rounds: a raw K-step scan vs a flowgraph runner."""
        run_fg, n_fg = _build_flowgraph_runner(fg_label, **fg_kw)
        t0 = time.perf_counter()
        for _ in range(2):
            state, audio = raw_j(state, x)
        _sync(audio)
        WARM_S[raw_label] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        run_fg(2 * K)
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

    def _paired_scan4(reps=5, K=4):
        raw_label = "raw fused step + K=4 scan (operand form)"
        fg_label = "flowgraph/Executor DEFAULT config (auto steps_per_call)"
        init_f, step_f = make_bank_step_fused(cfg, tile_rows=128)
        _, x = example_args(cfg, r=r_fused)
        return _paired_fg(
            _op_scan(step_f, K), init_f(), x, raw_label, fg_label, K, {}, reps
        )

    def _paired_sharded_scan4(reps=5, K=4):
        """The r5 mesh tier vs the hand-built sharded step, paired: the
        composed flowgraph compiled with mesh= (runtime/mesh.py — auto
        state reconstruction, one ppermute carry) against
        make_sharded_bank_step_fused's hand-written halo math, both on a
        1-device mesh (the one real chip), both saturated."""
        from futuresdr_tpu.models.pfb_fm_bank import (
            make_sharded_bank_step_fused,
        )
        from futuresdr_tpu.parallel import make_mesh

        raw_label = "hand-built sharded bank + K=4 scan"
        fg_label = "flowgraph/Executor mesh-1 (default config)"
        mesh = make_mesh((1,), ("time",), devices=jax.devices()[:1])
        init_c, step = make_sharded_bank_step_fused(
            cfg, mesh, tile_rows=128, interpret=False
        )
        _, x = example_args(cfg, r=r_fused)
        return _paired_fg(
            _op_scan(step, K),
            init_c(),
            x,
            raw_label,
            fg_label,
            K,
            {"mesh": mesh},
            reps,
        )

    ratio_sat = ratio_sharded = None
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
        def _build_raw_scan4():
            init_f, step_f = make_bank_step_fused(cfg, tile_rows=128)
            _, x = example_args(cfg, r=r_fused)
            return _op_scan(step_f), init_f(), x, 4 * x.shape[-1]

        _rung(
            "fused_scan4_raw",
            "raw fused step + K=4 scan (operand form)",
            _build_raw_scan4,
        )
    finally:
        config.set("steps_per_call", "auto")

    try:
        (
            results["fused_sharded_scan4"],
            results["flowgraph_sharded_scan4"],
            ratio_sharded,
        ) = _paired_sharded_scan4()
    except Exception as e:  # noqa: BLE001 - report and continue
        print(
            f"# flowgraph_sharded_scan4: FAILED {type(e).__name__}: {e}",
            file=sys.stderr,
        )
    finally:
        config.set("steps_per_call", "auto")

    if ladder:
        # einsum reference rungs, SATURATED like every other ladder rung
        # (r4's unsaturated forms ranged 1.5x-1.7x on tenancy — useless
        # as published numbers)
        def _build_einsum_scan4(fir_dtype, fft, K=4):
            def build():
                config.set("fft_precision", "high")
                config.set("fir_dtype", fir_dtype)
                config.set("channelizer_fft", fft)
                _, step = make_bank_step(cfg)
                state, x = example_args(cfg, r=r)
                return _op_scan(step, K), state, x, K * x.shape[-1]

            return build

        _rung(
            "f32_scan4",
            "f32 einsum + mixed-radix FFT (K=4 scan)",
            _build_einsum_scan4("float32", "mixed_radix"),
        )
        _rung(
            "bf16_scan4",
            "bf16 FIR + dft_bf16 (K=4 scan)",
            _build_einsum_scan4("bfloat16", "dft_bf16"),
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
        # ladder honesty: per-rung [lo, hi] over the reps — every
        # official rung is a SATURATED (K=4 scan) form; the r4
        # unsaturated K=1 rungs (fused_pallas, flowgraph_fused,
        # fused_sharded_mesh1) spanned 1.9-3.5x on tenancy and are gone
        "ladder_range": {
            k: RANGES[label]
            for k, label in _RUNG_LABELS.items()
            if k in results and label in RANGES
        },
        "warm_s": WARM_S,
        "stalled_reps_retried": {k: v for k, v in STALLS.items() if v},
        "protocol": "median of 5 x >=0.5s steady-state loops (2-call "
        "warm first; a rep >3x below best is a tunnel stall, retried "
        "once and counted); every rung saturated via K=4 operand scan; "
        f"chunk r={r} einsum rungs / r={r_fused} fused "
        f"({r_fused * 1024 / 1e6:.1f}M samples/step)",
    }
    # medians of PER-ROUND interleaved ratios — same-tenancy pairing,
    # not a quotient of two independently-noisy medians. Both ratios
    # are DEFAULT-config flowgraph sides (auto steps_per_call): the
    # abstraction must deliver the machine rate without tuning.
    if ratio_sat is not None:
        out["flowgraph_vs_raw_pct"] = round(100.0 * ratio_sat, 1)
    if ratio_sharded is not None:
        out["flowgraph_sharded_vs_hand_pct"] = round(
            100.0 * ratio_sharded, 1
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

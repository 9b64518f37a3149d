"""1024-channel PFB + FM demod bank — the flagship pipeline as an app.

Synthesizes a wideband multicarrier capture (FM stations on a channel
grid), runs the BASELINE.json headline pipeline, and writes selected
channels' demodulated audio to WAV.

Run:  python examples/channelizer_bank.py [--channels 12 77 500] [--seconds 1.0]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from futuresdr_tpu.models.pfb_fm_bank import (  # noqa: E402
    BankConfig,
    make_bank_step,
    make_bank_step_fused,
    make_sharded_bank_step_fused,
)
from futuresdr_tpu.ops import cplx  # noqa: E402


def synth_wideband(
    cfg: BankConfig,
    n: int,
    stations: dict,
    fs_wideband: float,
    offset: int = 0,
) -> np.ndarray:
    """FM stations: {channel_index: audio_freq_hz} on the channel grid.

    Closed-form FM phase (∫dev·sin = −dev/ω·cos), so blocks generated at
    any absolute sample ``offset`` are phase-continuous — no per-step
    discontinuity clicks in the demodulated audio."""
    t = (offset + np.arange(n)) / fs_wideband
    fs_ch = fs_wideband / cfg.n_ch
    dev = 0.25 * fs_ch
    x = np.zeros(n, np.complex64)
    for ch, fa in stations.items():
        phase = (
            2 * np.pi * (ch / cfg.n_ch) * fs_wideband * t
            - (dev / fa) * np.cos(2 * np.pi * fa * t)
        )
        x += np.exp(1j * phase).astype(np.complex64)
    return (x / max(len(stations), 1)).astype(np.complex64)


def run_flowgraph_variant(args, cfg, fs_wideband, fs_audio,
                          r_per_step, n_steps, n_pre, stations,
                          mesh=None):
    """The same bank COMPOSED FROM BLOCKS, run through the Executor.

    The compiler's fusion pass (runtime/fusion.py) rewrites the
    PfbChannelizer + 1024×(QuadratureDemod → Fir) chain onto the fused
    Pallas kernel, so this path runs within ~10% of the raw-step
    variants above — the framework's abstraction at the flagship rate."""
    import numpy as np_

    from futuresdr_tpu.blocks import Fir, NullSink, QuadratureDemod, VectorSink
    from futuresdr_tpu.blocks.pfb import PfbChannelizer, default_channelizer_taps
    from futuresdr_tpu.dsp import firdes, windows
    from futuresdr_tpu.runtime.block import Block, PortSpec
    from futuresdr_tpu.runtime.executor import Executor
    from futuresdr_tpu.runtime.flowgraph import Flowgraph

    M, D = cfg.n_ch, cfg.audio_decim
    step_samples = r_per_step * M

    class SynthSource(Block):
        """Host source replaying the phase-continuous synth blocks."""

        def __init__(self):
            super().__init__("wideband")
            self.stream_outputs = [PortSpec("out", np_.complex64)]
            self.rate_out = (1,)
            self._blocks = [
                synth_wideband(cfg, step_samples, stations, fs_wideband,
                               offset=s * step_samples)
                for s in range(n_pre)
            ]
            self._i = 0

        def host_produce(self, n, port=0):
            if self._i >= n_steps:
                return None
            b = self._blocks[self._i % n_pre]
            self._i += 1
            return b

        def host_state(self):
            return {"i": self._i}

    fg = Flowgraph()
    chan = PfbChannelizer(M, taps=default_channelizer_taps(M, cfg.taps_per_ch))
    fg.stream(SynthSource(), chan)
    ataps = firdes.lowpass(0.4 / D, windows.hamming(cfg.audio_taps))
    keep = set(args.channels)
    sinks = {}
    for k in range(M):
        d = QuadratureDemod(cfg.demod_gain, name=f"qd{k}")
        f = Fir.decimating(ataps, D, dtype=np_.float32, name=f"fir{k}")
        fg.stream(chan, d, src_port=k)
        fg.stream(d, f)
        if k in keep:
            snk = VectorSink(np_.float32, name=f"audio{k}")
            sinks[k] = snk
            fg.stream(f, snk)
        else:
            fg.stream(f, NullSink(np_.float32, name=f"ns{k}"))
    ex = Executor(fg, chunk_size=step_samples, mesh=mesh)
    print("fusion:", ex.cfg.fusion_log or "(did not fire)")
    if mesh is not None:
        print(f"mesh: {len(mesh.devices.ravel())} device(s) — the same"
              " composed graph under shard_map (runtime/mesh.py)")
    t0 = time.time()
    ex.running = True
    try:
        ex.run_loop()
    finally:
        ex.running = False
    if ex.error:
        raise ex.error
    dt = time.time() - t0
    total = n_steps * step_samples
    print(
        f"processed {total/1e6:.0f} MS wideband in {dt:.2f}s "
        f"({total/dt/1e9:.2f} GS/s through the Flowgraph/Executor)"
    )
    import wave

    for ch, snk in sinks.items():
        data = snk.data().astype(np_.float64)
        data = data / (np_.max(np_.abs(data)) + 1e-9)
        pcm = (data * 32767).astype(np_.int16)
        path = f"{args.out_prefix}{ch}.wav"
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(int(fs_audio))
            w.writeframes(pcm.tobytes())
        print(f"wrote {path} ({len(pcm)/fs_audio:.2f}s @ {fs_audio:.0f} Hz)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, nargs="+", default=[12, 500, 900])
    ap.add_argument("--seconds", type=float, default=0.5)
    ap.add_argument("--out-prefix", default="bank_ch")
    ap.add_argument(
        "--variant",
        choices=[
            "auto", "einsum", "fused", "sharded", "flowgraph",
            "flowgraph-mesh",
        ],
        default="auto",
        help="einsum pipeline, fused Pallas kernel (the bench headline), "
        "the fused kernel sharded over every attached device (the "
        "north-star multi-chip config), or the COMPOSED block graph "
        "(PfbChannelizer + per-channel QuadratureDemod/Fir through the "
        "Flowgraph/Executor — the compiler's fusion pass canonicalizes "
        "it onto the same Pallas kernel); auto = fused on TPU",
    )
    args = ap.parse_args()

    cfg = BankConfig()
    fs_wideband = 1024 * 250e3  # 256 MS/s aggregate
    fs_audio = fs_wideband / cfg.n_ch / cfg.audio_decim

    r_per_step = 512
    step_samples = r_per_step * cfg.n_ch
    n_steps = max(1, int(args.seconds * fs_wideband / step_samples))
    n_pre = min(n_steps, 4)
    # quantize audio tones to the block-reuse period so the synth stays
    # phase-continuous when blocks wrap
    quantum = fs_wideband / (n_pre * step_samples)
    stations = {
        ch: max(1, round(400.0 * (1 + i) / quantum)) * quantum
        for i, ch in enumerate(args.channels)
    }
    print({ch: round(f, 1) for ch, f in stations.items()})

    on_tpu = jax.devices()[0].platform == "tpu"
    variant = args.variant
    if variant == "auto":
        variant = "fused" if on_tpu else "einsum"
    if variant == "flowgraph":
        return run_flowgraph_variant(args, cfg, fs_wideband, fs_audio,
                                     r_per_step, n_steps, n_pre, stations)
    if variant == "flowgraph-mesh":
        # the composed graph through the PRODUCT sharding tier
        import numpy as _np
        from jax.sharding import Mesh

        mesh = Mesh(_np.array(jax.devices()), ("time",))
        return run_flowgraph_variant(args, cfg, fs_wideband, fs_audio,
                                     r_per_step, n_steps, n_pre, stations,
                                     mesh=mesh)
    if variant == "einsum":
        init_state, step = make_bank_step(cfg)
    elif variant == "fused":
        init_state, step = make_bank_step_fused(cfg, interpret=not on_tpu)
    else:  # the north-star sharded config over every attached device
        from futuresdr_tpu.parallel import make_mesh

        mesh = make_mesh((len(jax.devices()),), ("time",))
        init_state, step = make_sharded_bank_step_fused(cfg, mesh)
    print(f"variant: {variant}")
    step_j = jax.jit(step, donate_argnums=(0,))
    state = init_state()

    audio_out = {ch: [] for ch in args.channels}
    blocks = [
        cplx.from_numpy(
            synth_wideband(
                cfg, step_samples, stations, fs_wideband, offset=s * step_samples
            )
        )
        for s in range(n_pre)
    ]
    t0 = time.time()
    total = 0
    for s in range(n_steps):
        state, audio = step_j(state, blocks[s % n_pre])
        a = np.asarray(audio)
        for ch in args.channels:
            audio_out[ch].append(a[ch])
        total += step_samples
    dt = time.time() - t0
    print(
        f"processed {total/1e6:.0f} MS wideband in {dt:.2f}s "
        f"({total/dt/1e9:.2f} GS/s incl. host synth)"
    )

    import wave

    for ch in args.channels:
        data = np.concatenate(audio_out[ch])
        data = data / (np.max(np.abs(data)) + 1e-9)
        pcm = (data * 32767).astype(np.int16)
        path = f"{args.out_prefix}{ch}.wav"
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(int(fs_audio))
            w.writeframes(pcm.tobytes())
        print(f"wrote {path} ({len(pcm)/fs_audio:.2f}s @ {fs_audio:.0f} Hz)")


if __name__ == "__main__":
    main()

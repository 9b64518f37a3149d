"""GUI demo — drives every prophecy-parity component at once.

Parity target: the reference's ``examples/spectrum`` + ``examples/egui``
workflow where the prophecy web GUI (crates/prophecy) shows the live
flowgraph, spectrum/waterfall, a constellation, and retune controls.

One runtime, one flowgraph, three live surfaces:

* spectrum chain  : SignalSource(tone, retunable) + noise → FFT →
                    |·|² dB → WebSocket :9001 (f32 frames)
* constellation   : noisy QPSK symbols → WebSocket :9003 (complex64 =
                    interleaved I/Q f32)
* control plane   : REST port :1337 serving the GUI (futuresdr_tpu/gui)
                    with FlowgraphCanvas / FlowgraphTable / PmtEditor —
                    retune the tone from the browser while watching the
                    spectrum move.

Run:  python examples/gui_demo.py  → open http://127.0.0.1:1337/
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, config, connect  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    Apply,
    Fft,
    SignalSource,
    Throttle,
    WebsocketSink,
)
from futuresdr_tpu.dsp import windows  # noqa: E402
from futuresdr_tpu.ops import cplx  # noqa: E402


def _qpsk_source(n: int, snr_db: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sym = (
        (2 * rng.integers(0, 2, n) - 1) + 1j * (2 * rng.integers(0, 2, n) - 1)
    ) / np.sqrt(2)
    noise = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ) / np.sqrt(2)
    return (sym + noise * 10 ** (-snr_db / 20)).astype(np.complex64)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bind", default="127.0.0.1:1337")
    ap.add_argument("--fft", type=int, default=2048)
    ap.add_argument("--sample-rate", type=float, default=3.2e6)
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="run on CPU (skip the TPU compile queue for GUI work)",
    )
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    config.set("ctrlport_enable", True)
    config.set("ctrlport_bind", args.bind)

    fg = Flowgraph()

    # --- spectrum chain (examples/spectrum parity) ---
    src = SignalSource(300e3, args.sample_rate, name="tone")
    rng = np.random.default_rng(1)
    noise_re = rng.standard_normal(1 << 16).astype(np.float32) * 0.02
    noise_im = rng.standard_normal(1 << 16).astype(np.float32) * 0.02

    def add_noise(x):
        n = x.shape[-1]
        reps = -(-n // noise_re.shape[0])
        nr = jnp.tile(jnp.asarray(noise_re), reps)[:n]
        ni = jnp.tile(jnp.asarray(noise_im), reps)[:n]
        return cplx.CArray(x.re + nr, x.im + ni)

    noisy = Apply(add_noise, name="AddNoise")
    fft = Fft(args.fft, shift=True, window=windows.hann(args.fft))
    mag = Apply(
        lambda x: (10.0 * jnp.log10(x.abs2() + 1e-20)).astype(jnp.float32),
        in_dtype=np.complex64,
        out_dtype=np.float32,
        name="MagDb",
    )
    # pace the post-FFT stream to ~10 spectrum frames/s for the GUI
    throttle = Throttle(10.0 * args.fft, dtype=np.float32)
    ws_spec = WebsocketSink(port=9001, dtype=np.float32)
    connect(fg, src, noisy, fft, mag, throttle, ws_spec)

    # --- constellation chain ---
    from futuresdr_tpu.blocks import VectorSource

    symbols = _qpsk_source(1 << 20, snr_db=18.0)
    sym_src = VectorSource(np.tile(symbols, 8), name="qpsk")
    sym_throttle = Throttle(20_000, dtype=np.complex64)
    ws_const = WebsocketSink(port=9003, dtype=np.complex64)
    connect(fg, sym_src, sym_throttle, ws_const)

    rt = Runtime(chunk_size=1 << 14)
    handle = rt.start(fg)
    print(f"GUI:        http://{args.bind}/")
    print(f"spectrum:   ws://127.0.0.1:{ws_spec.port}  (fft={args.fft})")
    print(f"constell.:  ws://127.0.0.1:{ws_const.port}")
    print("retune: PmtEditor → block 'tone' → handler 'freq' → e.g. 8e5")
    try:
        time.sleep(args.seconds)
    except KeyboardInterrupt:
        pass
    handle.stop()
    handle.wait()


if __name__ == "__main__":
    main()

"""Decode throughput of every modem family vs its real-time rate.

Dense multi-frame captures, warmed compile, host-synced timing (process()
returns decoded host frames, so each rep is settled by construction).
Prints MS/s and x-real-time per modem; every frame must decode.

Run:  python perf/modem_bench.py [--modems adsb,zigbee,lora,m17] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


RESIDENT = False  # --resident: upload once, time decode from device IQ
SCALE = 1  # --scale: frame-count multiplier (amortizes fixed RTT costs)
STREAM = 0  # --stream N: decode N capture-chunks through process_stream


def _time_reps(name, rx_factory, sig, n_frames, fs_hz, reps, resident_ok=True):
    n_samples = len(sig)
    feed = sig
    if RESIDENT and resident_ok:
        from futuresdr_tpu.ops import cplx

        bucket = -(-len(sig) // 16384) * 16384
        x = np.concatenate(
            [sig, np.zeros(bucket - len(sig), np.complex64)]
        )
        feed = cplx.from_numpy(x)
        name += "(resident)"
    rx_factory().process(feed)  # warm/compile with identical shapes
    best = 0.0
    n_chunks = max(1, STREAM)
    for _ in range(reps):
        rx = rx_factory()
        t0 = time.perf_counter()
        if STREAM:
            # pipelined stream mode (StreamingReceiver): chunk i+1's
            # device program dispatches before chunk i's fetch+decode
            frames = [
                f
                for out in rx.process_stream(feed for _ in range(n_chunks))
                for f in out
            ]
        else:
            frames = rx.process(feed)
        dt = time.perf_counter() - t0
        # per-frame CRC flag: LoRa/ZigBee use .crc_ok, ADS-B .crc_passed,
        # M17 .lsf_crc_ok — never default a missing flag to True
        def _ok(f):
            for attr in ("crc_ok", "crc_passed", "lsf_crc_ok"):
                if hasattr(f, attr):
                    return bool(getattr(f, attr))
            if hasattr(f, "command"):  # keyfob: decoded command = ok
                return f.command is not None
            raise AttributeError(f"{type(f).__name__} has no CRC flag")

        ok = sum(1 for f in frames if _ok(f))
        assert ok >= n_frames * n_chunks, (
            f"{name}: {ok}/{n_frames * n_chunks} decoded"
        )
        best = max(best, n_samples * n_chunks / dt / 1e6)
    rt = fs_hz / 1e6
    if STREAM:
        name += f"(stream x{n_chunks})"
        n_frames *= n_chunks
        n_samples *= n_chunks
    print(
        f"{name}: {best:.2f} MS/s  ({best / rt:.0f}x real-time @ "
        f"{rt:.3g} MS/s, {n_frames} frames, {n_samples/1e6:.2f} M samples)",
        flush=True,
    )


def bench_adsb(reps):
    from futuresdr_tpu.models.adsb.adsb import (
        AdsbReceiver,
        SAMPLE_RATE,
        callsign_me,
        encode_df17,
        synthesize_frame,
    )

    rng = np.random.default_rng(0)
    parts = []
    n = 200 * SCALE
    for i in range(n):
        bits = encode_df17(0x400000 + i, callsign_me(f"TPU{i % 100:02d}A"))
        parts.append(synthesize_frame(bits, pad=800))
    sig = np.concatenate(parts)
    sig = sig + (0.003 * rng.standard_normal(len(sig))).astype(np.float32)

    _time_reps(
        "adsb",
        lambda: AdsbReceiver(max_frames_per_chunk=max(256, 2 * n)),
        sig, n, SAMPLE_RATE, reps,
    )


def bench_zigbee(reps):
    from futuresdr_tpu.models.zigbee.zigbee import (
        ZigbeeReceiver,
        make_phy_frame,
        modulate,
    )

    n = 100 * SCALE
    parts = []
    for i in range(n):
        payload = bytes(f"zigbee frame {i:03d} payload!".encode())
        parts.append(modulate(make_phy_frame(payload), pad=120))
    sig = np.concatenate(parts)
    _time_reps(
        "zigbee",
        lambda: ZigbeeReceiver(max_frames_per_chunk=max(128, 2 * n)),
        sig, n, 4_000_000, reps,
    )


def bench_lora(reps):
    from futuresdr_tpu.models.lora.phy import (
        LoraConfig,
        LoraReceiver,
        modulate_frame,
    )

    cfg = LoraConfig(sf=7, cr=1)
    n = 20 * SCALE
    parts = []
    for i in range(n):
        payload = bytes(f"lora payload number {i:02d}".encode())
        parts.append(np.zeros(3 * cfg.n + 17, np.complex64))
        parts.append(modulate_frame(cfg, payload))
    parts.append(np.zeros(5 * cfg.n, np.complex64))
    sig = np.concatenate(parts)
    _time_reps(
        "lora(sf7)", lambda: LoraReceiver(cfg), sig, n, 125_000, reps
    )


def bench_m17(reps):
    from futuresdr_tpu.models.m17.phy import (
        M17Receiver,
        make_lsf,
        modulate_transmission,
    )

    lsf = make_lsf("TPU-1", "N0CALL")
    n = 60 * SCALE
    payloads = [bytes([i % 251] * 16) for i in range(n)]
    sig = modulate_transmission(lsf, payloads)
    _time_reps("m17", M17Receiver, sig, n, 48_000, reps, resident_ok=False)


def bench_keyfob(reps):
    from futuresdr_tpu.models.keyfob import (
        PREAMBLE,
        RATE,
        KeyfobReceiver,
        synthesize,
    )

    n = 30
    suffixes = ["11010101", "11100011", "10111001"]  # Close/Open/Trunk
    parts = []
    for i in range(n):
        bits = "0110" + PREAMBLE + "01100110" + suffixes[i % 3]
        parts.append(synthesize(bits, pad=1500))
    sig = np.concatenate(parts)
    _time_reps(
        "keyfob", KeyfobReceiver, sig, n, RATE, reps,
        resident_ok=False,
    )


def bench_rattlegram(reps):
    from futuresdr_tpu.models.rattlegram.exact import (
        RATE,
        ExactDecoder,
        encode_exact,
    )

    n = 6
    parts = []
    for i in range(n):
        audio = encode_exact(
            bytes(f"rattlegram frame number {i:02d}!".encode()),
            call_sign=b"TPU1",
        )
        parts.append(audio.astype(np.float32))
        parts.append(np.zeros(RATE // 4, np.float32))
    sig = np.concatenate(parts)

    _time_reps(
        "rattlegram", ExactDecoder, sig, n, RATE, reps, resident_ok=False
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--modems", default="adsb,zigbee,lora,m17,keyfob,rattlegram"
    )
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--cpu", action="store_true", help="force CPU (correctness check)"
    )
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument(
        "--stream",
        type=int,
        default=0,
        metavar="N",
        help="decode N copies of the capture as a pipelined chunk stream "
        "(process_stream) instead of one process() call",
    )
    ap.add_argument(
        "--resident",
        action="store_true",
        help="upload IQ once; time decode from device-resident samples "
        "(adsb/zigbee; the deployable number on tunnel-limited hosts)",
    )
    args = ap.parse_args()
    global RESIDENT, SCALE, STREAM
    RESIDENT = args.resident
    SCALE = args.scale
    STREAM = args.stream
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    for m in args.modems.split(","):
        globals()[f"bench_{m.strip()}"](args.reps)


if __name__ == "__main__":
    main()

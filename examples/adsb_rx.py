"""ADS-B receiver + aircraft tracker app.

Parity: ``examples/adsb/src/bin/listen_adsb.rs`` — IQ in (4 MS/s cf32
file, or a built-in synthetic demo), decoded Mode S frames feed the
aircraft tracker, which prints the register (callsign, position,
velocity per ICAO).

Run:  python examples/adsb_rx.py [capture.cf32]

With ``--serve`` the app runs as a live flowgraph instead (parity:
the reference's web map at http://127.0.0.1:1337/ — ``examples/adsb/
dist/``): receiver sink → TrackerBlock message edge, control port
serving the aircraft map page; open http://127.0.0.1:1337/adsb.html.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu.models.adsb.adsb import (  # noqa: E402
    AdsbReceiver,
    callsign_me,
    encode_df17,
    position_me,
    synthesize_frame,
    velocity_me,
)
from futuresdr_tpu.models.adsb.tracker import Tracker, cpr_encode  # noqa: E402


def demo_signal() -> np.ndarray:
    """Two aircraft: ident + even/odd position + velocity each."""
    rng = np.random.default_rng(0)
    parts = []
    for icao, cs, lat, lon, alt, vx, vy in [
        (0x3C6444, "DLH9TA", 48.35, 11.78, 37000, -120, 300),
        (0x4840D6, "KLM1023", 52.2572, 4.7, 24000, 250, 80),
    ]:
        for bits in (
            encode_df17(icao, callsign_me(cs)),
            encode_df17(
                icao, position_me(*cpr_encode(lat, lon, False), alt, False)
            ),
            encode_df17(
                icao, position_me(*cpr_encode(lat, lon, True), alt, True)
            ),
            encode_df17(icao, velocity_me(vx, vy, 0)),
        ):
            parts.append(synthesize_frame(bits, amplitude=1.0, pad=400))
    sig = np.concatenate(parts)
    noise = 0.02 * (
        rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
    ).astype(np.complex64)
    return (sig + noise).astype(np.complex64)


def serve(iq: np.ndarray) -> None:
    """Live map app: throttled IQ → receiver sink → TrackerBlock, with
    the control port serving /adsb.html (reference web-map parity)."""
    from futuresdr_tpu import Flowgraph, Runtime
    from futuresdr_tpu.blocks import FramedReceiverSink, Throttle, VectorSource
    from futuresdr_tpu.models.adsb.tracker import TrackerBlock
    from futuresdr_tpu.runtime.ctrl_port import ControlPort
    from futuresdr_tpu.types.pmt import Pmt

    fg = Flowgraph()
    src = VectorSource(iq, repeat=True)
    thr = Throttle(4e6)  # pace at the capture rate so the map evolves
    sink = FramedReceiverSink(
        AdsbReceiver(),
        overlap=4096,
        process_size=1 << 16,
        emit=lambda f: Pmt.any_(f) if f.crc_passed else None,
    )
    tracker = TrackerBlock(prune_after=120.0)
    for b in (src, thr, sink, tracker):
        fg.add(b)
    fg.stream(src, thr)
    fg.stream(thr, sink)
    fg.message(sink, "frames", tracker, "in")

    cp = ControlPort(bind="127.0.0.1:1337")
    h = Runtime(chunk_size=1 << 16).start(fg)
    cp.register(h)
    print(f"aircraft map: http://127.0.0.1:{cp.port}/adsb.html")
    try:
        h.wait()
    except KeyboardInterrupt:
        h.stop()
        h.wait(timeout=20)
    finally:
        cp.shutdown()


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--serve"]
    if args:
        iq = np.fromfile(args[0], dtype=np.complex64)
        print(f"read {len(iq)} samples from {args[0]}")
    else:
        iq = demo_signal()
        print(f"demo capture: {len(iq)} samples, 2 synthetic aircraft")

    if "--serve" in sys.argv[1:]:
        serve(iq)
        return

    rx = AdsbReceiver()
    frames = rx.process(iq)
    tracker = Tracker()
    for f in frames:
        tracker.update(f)

    print(f"{len(frames)} CRC-clean frames -> {len(tracker.register)} aircraft")
    for icao, rec in sorted(tracker.register.items()):
        line = f"  {icao:06X}  {rec.callsign or '--------':8s}"
        if rec.positions:
            p = rec.positions[-1]
            line += (
                f"  {p['lat']:+9.4f} {p['lon']:+9.4f}"
                f"  {p['altitude_ft'] or 0:>6d} ft"
            )
        if rec.velocities:
            v = rec.velocities[-1]
            line += f"  {v['ground_speed_kt']:5.0f} kt @ {v['heading_deg']:3.0f}°"
        print(line)


if __name__ == "__main__":
    main()

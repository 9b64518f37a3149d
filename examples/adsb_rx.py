"""ADS-B receiver + aircraft tracker app.

Parity: ``examples/adsb/src/bin/listen_adsb.rs`` — IQ in (4 MS/s cf32
file, or a built-in synthetic demo), decoded Mode S frames feed the
aircraft tracker, which prints the register (callsign, position,
velocity per ICAO).

Run:  python examples/adsb_rx.py [capture.cf32]
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


def main() -> None:
    if len(sys.argv) > 1:
        iq = np.fromfile(sys.argv[1], dtype=np.complex64)
        print(f"read {len(iq)} samples from {sys.argv[1]}")
    else:
        iq = demo_signal()
        print(f"demo capture: {len(iq)} samples, 2 synthetic aircraft")

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

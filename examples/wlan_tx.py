"""WLAN 802.11a/g transmitter app.

Parity: ``examples/wlan/src/bin/tx.rs`` — encodes MAC frames to a
complex64 IQ file (20 MS/s) instead of a seify hardware sink.

Run:  python examples/wlan_tx.py out.cf32 --mcs qpsk12 --count 10
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu.models.wlan import encode_frame, make_mac_frame  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--mcs", default="bpsk12")
    ap.add_argument("--count", type=int, default=10)
    ap.add_argument("--gap", type=int, default=5000)
    args = ap.parse_args()

    chunks = []
    for i in range(args.count):
        psdu = make_mac_frame(f"FutureSDR-TPU frame {i}".encode(), seq=i)
        chunks.append(encode_frame(psdu, args.mcs, scrambler_seed=1 + i % 127))
        chunks.append(np.zeros(args.gap, np.complex64))
    iq = np.concatenate(chunks).astype(np.complex64)
    iq.tofile(args.out)
    print(f"wrote {len(iq)} samples ({args.count} frames, {args.mcs})")


if __name__ == "__main__":
    main()

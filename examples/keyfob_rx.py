"""Car keyfob OOK receiver CLI (parity: examples/keyfob main.rs).

Synthesizes a Manchester-OOK keyfob burst (or loads IQ from a file),
runs the envelope/threshold device pass + edge decoder, and prints the
decoded command — the reference's rtl-sdr front-end replaced by file/
synthetic ingest (no radio hardware in this environment).

Run:  python examples/keyfob_rx.py [--command Open] [--noise 0.05]
      python examples/keyfob_rx.py --iq capture.c64  (complex64 @250kS/s)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu.models.keyfob import (  # noqa: E402
    COMMANDS,
    PREAMBLE,
    KeyfobReceiver,
    synthesize,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--command", default="Open", choices=list(COMMANDS.values()))
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--iq", help="complex64 IQ file at 250 kS/s")
    args = ap.parse_args()

    if args.iq:
        sig = np.fromfile(args.iq, np.complex64)
    else:
        suffix = {v: k for k, v in COMMANDS.items()}[args.command]
        bits = "0110" + PREAMBLE + "01100110" + suffix
        sig = synthesize(bits)
        rng = np.random.default_rng(1)
        sig = sig + args.noise * (
            rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig))
        ).astype(np.complex64)

    frames = KeyfobReceiver().process(sig)
    if not frames:
        print("no frames detected")
        return
    for f in frames:
        print(f"bits {f.bits} -> command: {f.command or 'unknown'}")


if __name__ == "__main__":
    main()

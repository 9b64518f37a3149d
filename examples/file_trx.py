"""File TX → file RX roundtrip (parity: examples/file-trx).

Encodes messages with a chosen modem into an IQ capture file, then decodes
the file back — the loopback workflow the reference's file-trx example
demonstrates.

Run:  python examples/file_trx.py --modem wlan  "hello world"
      python examples/file_trx.py --modem lora  "hello world"
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("message", nargs="?", default="hello from file-trx")
    ap.add_argument("--modem", choices=["wlan", "lora"], default="wlan")
    ap.add_argument("--file", default=None, help="IQ capture path (cf32)")
    args = ap.parse_args()

    path = args.file or tempfile.mktemp(suffix=".cf32")
    msg = args.message.encode()

    if args.modem == "wlan":
        from futuresdr_tpu.models.wlan import (
            WlanReceiver,
            encode_frame,
            make_mac_frame,
        )

        psdu = make_mac_frame(msg)
        iq = np.concatenate(
            [
                np.zeros(1000, np.complex64),
                encode_frame(psdu, "qpsk12"),
                np.zeros(1000, np.complex64),
            ]
        )
        iq.tofile(path)
        frames = WlanReceiver().process(np.fromfile(path, np.complex64))
        ok = any(f.crc_ok and f.psdu == psdu for f in frames)
    else:
        from futuresdr_tpu.models.lora import (
            LoraConfig,
            LoraReceiver,
            modulate_frame,
        )

        cfg = LoraConfig(sf=8, cr=4)
        iq = np.concatenate(
            [
                np.zeros(1000, np.complex64),
                modulate_frame(cfg, msg),
                np.zeros(1000, np.complex64),
            ]
        )
        iq.tofile(path)
        frames = LoraReceiver(cfg).process(np.fromfile(path, np.complex64))
        ok = any(f.crc_ok and f.payload == msg for f in frames)

    print(f"capture: {path} ({len(iq)} samples)")
    print(f"decoded: {'OK' if ok else 'FAILED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

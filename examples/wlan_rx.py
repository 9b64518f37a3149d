"""WLAN 802.11a/g receiver app.

Parity: ``examples/wlan/src/bin/rx.rs`` — IQ in (file or UDP instead of
seify hardware), decoded MAC frames printed and forwarded as UDP blobs +
WebSocket Pmts.

Run:  python examples/wlan_rx.py capture.cf32 [--udp 127.0.0.1:55555]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import BlobToUdp, FileSource, MessagePipe  # noqa: E402
from futuresdr_tpu.models.wlan.blocks import WlanRxSink  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("capture", help="complex64 IQ capture at 20 MS/s")
    ap.add_argument("--udp", default=None, help="host:port for frame blobs")
    args = ap.parse_args()

    fg = Flowgraph()
    src = FileSource(args.capture, np.complex64)
    rx = WlanRxSink()
    connect(fg, src, rx)
    pipe = MessagePipe()
    fg.add(pipe)
    fg.message(rx, "rx_frames", pipe, "in")
    if args.udp:
        host, _, port = args.udp.partition(":")
        udp = BlobToUdp(host, int(port))
        fg.add(udp)
        fg.message(rx, "rx_frames", udp, "in")

    Runtime(chunk_size=1 << 17).run(fg)
    n = 0
    while not pipe.queue.empty():
        blob = pipe.queue.get().to_py()
        n += 1
        print(f"received frame ({len(blob)} bytes)")
    ok = sum(1 for f in rx.frames if f.crc_ok)
    print(f"{len(rx.frames)} frames detected, {ok} CRC ok")


if __name__ == "__main__":
    main()

"""Two flowgraphs linked by a ZeroMQ PUB/SUB edge (GNU Radio interop).

Parity: the reference's ``examples/zeromq`` — a TX flowgraph publishes IQ
on a PUB socket, an independent RX flowgraph subscribes and processes it.
The wire format (raw little-endian item bytes per message) matches GNU
Radio's zeromq blocks, so either side can be swapped for a GR flowgraph.

Run:  python examples/zeromq_trx.py
"""

from __future__ import annotations

import sys
import threading
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    Apply,
    Head,
    SignalSource,
    VectorSink,
)
from futuresdr_tpu.blocks.zeromq import PubSink, SubSource  # noqa: E402

N = 1 << 16
FS = 1e6
F0 = 50e3


def main() -> None:
    # TX: 50 kHz tone -> PUB socket (random port)
    pub = PubSink("tcp://127.0.0.1:*")
    tx = Flowgraph()
    connect(
        tx,
        SignalSource(F0, sample_rate=FS, amplitude=0.7),
        Head(N, np.complex64),
        pub,
    )
    print(f"TX publishing on {pub.address}")

    # RX: SUB socket -> magnitude -> sink
    sub = SubSource(pub.address)
    rx = Flowgraph()
    snk = VectorSink(np.float32)
    connect(
        rx,
        sub,
        Head(N, np.complex64),
        Apply(lambda v: v.abs(), np.complex64, np.float32),
        snk,
    )

    rx_thread = threading.Thread(
        target=lambda: Runtime(chunk_size=8192).run(rx), daemon=True
    )
    rx_thread.start()
    # let the SUB handshake settle — a PUB socket silently drops messages
    # published before the subscription is established (slow-joiner)
    threading.Event().wait(0.5)
    Runtime(chunk_size=8192).run(tx)
    # TX done; RX finishes when it has its N samples
    rx_thread.join(timeout=30)
    sub.close()

    y = snk.data()
    print(f"RX received {len(y)} samples over ZMQ")
    amp = float(np.mean(y)) if len(y) else 0.0
    print(f"mean |iq| = {amp:.3f} (sent 0.7)")
    assert len(y) == N and abs(amp - 0.7) < 0.05
    print("OK")


if __name__ == "__main__":
    main()

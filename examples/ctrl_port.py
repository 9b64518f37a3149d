"""Control-port handler RPC demo (parity: examples/ctrl-port.rs).

A message-only block exposes ``myhandler`` (returns-and-increments a
counter, ctrl-port.rs:36-45); the runtime starts the REST control port
and the script exercises every route the reference README curls:
flowgraph JSON, block JSON, handler call via GET and via POST with a
serde-tagged Pmt body.

Run:  python examples/ctrl_port.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from urllib.request import Request, urlopen

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, config  # noqa: E402
from futuresdr_tpu.blocks import NullSink, SignalSource, Throttle  # noqa: E402
from futuresdr_tpu.runtime.block import Block, message_handler  # noqa: E402
from futuresdr_tpu.runtime.ctrl_port import global_ctrl_port  # noqa: E402
from futuresdr_tpu.types.pmt import Pmt  # noqa: E402


class CtrlPortDemo(Block):
    """ctrl-port.rs:23-51 — counter starts at 5, handler echoes the Pmt
    and returns the pre-increment value."""

    def __init__(self):
        super().__init__()
        self.counter = 5

    @message_handler("myhandler")
    def myhandler(self, pmt: Pmt) -> Pmt:
        print(f"pmt {pmt.to_py()!r}, counter {self.counter}")
        self.counter += 1
        return Pmt.from_py(self.counter - 1)


def main() -> None:
    config.set("ctrlport_enable", True)
    config.set("ctrlport_bind", "127.0.0.1:0")

    fg = Flowgraph()
    demo = fg.blocks.index(fg.add(CtrlPortDemo()))
    # a small stream plane keeps the graph live while we poke at it
    src = SignalSource(freq=1000.0, sample_rate=48_000.0)
    thr = Throttle(rate=48_000, dtype=np.complex64)
    snk = NullSink(dtype=np.complex64)
    fg.stream(src, thr)
    fg.stream(thr, snk)
    handle = Runtime(chunk_size=4096).start(fg)

    base = f"http://127.0.0.1:{global_ctrl_port().port}"
    print(f"Web GUI: {base}")
    print(f"Flowgraph JSON: curl {base}/api/fg/0/")
    print(f"Block JSON: curl {base}/api/fg/0/block/{demo}/")
    print(f"Handler (GET): curl {base}/api/fg/0/block/{demo}/call/myhandler/")
    time.sleep(0.2)

    desc = json.loads(urlopen(f"{base}/api/fg/0/").read())
    print("blocks:", [b["type_name"] for b in desc["blocks"]])
    blk = json.loads(urlopen(f"{base}/api/fg/0/block/{demo}/").read())
    print("demo block handlers:", blk["message_inputs"])
    for _ in range(2):
        r = json.loads(
            urlopen(f"{base}/api/fg/0/block/{demo}/call/myhandler/").read()
        )
        print("GET call ->", r)
    req = Request(
        f"{base}/api/fg/0/block/{demo}/call/myhandler/",
        data=json.dumps({"U32": 123}).encode(),
        headers={"Content-Type": "application/json"},
    )
    print("POST {U32: 123} ->", json.loads(urlopen(req).read()))

    handle.stop()
    handle.wait(10)


if __name__ == "__main__":
    main()

"""Custom REST routes on the control port.

Parity: ``examples/custom-routes`` (``Runtime::with_custom_routes``,
runtime.rs:74) — user routes merge into the same axum/HTTP server that
serves ``/api/fg/``. Here: start a live flowgraph, add ``/api/tones/``
(GET state, POST retune), and exercise both over HTTP.

Run:  python examples/custom_routes.py
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
from futuresdr_tpu.runtime.ctrl_port import global_ctrl_port  # noqa: E402


def main() -> None:
    config.set("ctrlport_enable", True)
    config.set("ctrlport_bind", "127.0.0.1:0")

    fg = Flowgraph()
    src = SignalSource(freq=1000.0, sample_rate=48_000.0)
    thr = Throttle(rate=48_000, dtype=np.complex64)
    snk = NullSink(dtype=np.complex64)
    fg.stream(src, thr)
    fg.stream(thr, snk)
    handle = Runtime(chunk_size=4096).start(fg)

    cp = global_ctrl_port()
    state = {"retunes": 0}

    def get_tone(_params, _body):
        return {"frequency": round(src.freq, 3), "retunes": state["retunes"]}

    def set_tone(_params, body):
        handle.post(src, "freq", float(body))
        state["retunes"] += 1
        return {"ok": True, "frequency": float(body)}

    cp.add_route("GET", r"/api/tones/?", get_tone)
    cp.add_route("POST", r"/api/tones/?", set_tone)
    base = f"http://127.0.0.1:{cp.port}"
    print(f"control port on {base}")

    time.sleep(0.3)
    print("GET /api/tones/ ->", json.loads(urlopen(f"{base}/api/tones/").read()))
    req = Request(
        f"{base}/api/tones/", data=b"2500.0", headers={"Content-Type": "application/json"}
    )
    print("POST 2500 ->", json.loads(urlopen(req).read()))
    time.sleep(0.2)
    print("GET /api/tones/ ->", json.loads(urlopen(f"{base}/api/tones/").read()))
    print("stats ->", json.loads(urlopen(f"{base}/api/fg/0/stats/").read())["steps"], "steps")
    handle.stop()
    handle.wait(10)


if __name__ == "__main__":
    main()

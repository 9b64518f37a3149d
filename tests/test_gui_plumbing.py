"""End-to-end GUI plumbing: REST retune moves the live WebSocket spectrum.

Headless version of the browser check (prophecy-parity GUI): a SignalSource
→ Fft → mag chain streams to a WebsocketSink while the control port serves
the REST API; posting to the `freq` handler route (what the PmtEditor does)
must move the spectrum peak in the next frames.
"""

import asyncio
import json
import time
import urllib.request

import numpy as np
import pytest

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import Apply, Fft, SignalSource, Throttle, WebsocketSink
from futuresdr_tpu.runtime.ctrl_port import ControlPort

FS, NFFT = 1e6, 1024


def _peak_khz(frame: bytes) -> float:
    spec = np.frombuffer(frame, np.float32).reshape(-1, NFFT)[-1]
    return (int(np.argmax(spec)) - NFFT // 2) * FS / NFFT / 1e3


async def _get_peak(port: int, skip: int = 0) -> float:
    websockets = pytest.importorskip("websockets")
    async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
        for _ in range(skip):
            await asyncio.wait_for(ws.recv(), timeout=20)
        return _peak_khz(await asyncio.wait_for(ws.recv(), timeout=20))


def test_rest_retune_moves_spectrum():
    import jax.numpy as jnp

    cp = ControlPort(bind="127.0.0.1:0")
    try:
        fg = Flowgraph()
        src = SignalSource(100e3, FS, name="tone")
        ws_sink = WebsocketSink(port=0, dtype=np.float32)
        connect(
            fg,
            src,
            Fft(NFFT, shift=True),
            Apply(
                lambda x: (10.0 * jnp.log10(x.abs2() + 1e-20)).astype(
                    jnp.float32
                ),
                in_dtype=np.complex64,
                out_dtype=np.float32,
            ),
            Throttle(40.0 * NFFT, dtype=np.float32),  # ~40 frames/s
            ws_sink,
        )
        h = Runtime(chunk_size=NFFT * 8).start(fg)
        fg_id = cp.register(h)
        time.sleep(0.3)

        p0 = asyncio.run(_get_peak(ws_sink.port))
        assert abs(p0 - 100.0) < 2.0, p0

        req = urllib.request.Request(
            f"http://127.0.0.1:{cp.port}/api/fg/{fg_id}/block/0/call/freq/",
            data=json.dumps(250e3).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert urllib.request.urlopen(req).status == 200
        p1 = asyncio.run(_get_peak(ws_sink.port, skip=2))
        assert abs(p1 - 250.0) < 2.0, p1

        h.stop()
        h.wait(timeout=20)
    finally:
        cp.shutdown()


def test_gui_js_wiring_static():
    """No JS runtime ships in this environment, so statically verify the
    GUI's wiring instead: every DOM id app.js looks up exists in
    index.html, and every REST path shape it fetches is one the control
    port actually routes."""
    import re
    from pathlib import Path

    gui = Path(__file__).resolve().parent.parent / "futuresdr_tpu" / "gui"
    js = (gui / "app.js").read_text()

    for js_name, html_name in (
        ("app.js", "index.html"),
        ("adsb.js", "adsb.html"),
    ):
        page_js = (gui / js_name).read_text()
        html = (gui / html_name).read_text()
        ids_used = set(re.findall(r'\$\("([a-zA-Z0-9_]+)"\)', page_js))
        ids_defined = set(re.findall(r'id="([a-zA-Z0-9_]+)"', html))
        missing = ids_used - ids_defined
        assert not missing, f"{js_name} references undefined DOM ids: {missing}"

    # API shapes used by the JS (template params normalized away)
    api_calls = set(re.findall(r'/api/fg[^"`\s)]*', js))
    norm = {re.sub(r"\$\{[^}]*\}", "X", p).rstrip("`") for p in api_calls}
    expected = {
        "/api/fg/",
        "/api/fg/X/",
        "/api/fg/X/stats/",
        "/api/fg/X/block/X/call/X/",
    }
    assert norm == expected, f"unexpected API shapes in app.js: {norm}"

    # and the control port really serves those shapes
    from futuresdr_tpu import Flowgraph, Runtime, connect
    from futuresdr_tpu.blocks import Head, NullSink, SignalSource, Throttle
    import json
    import urllib.request

    fg = Flowgraph()
    connect(
        fg,
        SignalSource(1e3, 48e3, kind="sin"),
        Throttle(48e3, dtype=np.float32),
        Head(1 << 20, np.float32),
        NullSink(np.float32),
    )
    cp = ControlPort(bind="127.0.0.1:0")
    h = Runtime(chunk_size=4096).start(fg)
    fg_id = cp.register(h)
    assert fg_id == 0
    try:
        base = f"http://127.0.0.1:{cp.port}"
        ids = json.load(urllib.request.urlopen(f"{base}/api/fg/", timeout=10))
        assert ids == [0]
        desc = json.load(
            urllib.request.urlopen(f"{base}/api/fg/0/", timeout=10)
        )
        assert {"blocks", "stream_edges"} <= set(desc)
        stats = json.load(
            urllib.request.urlopen(f"{base}/api/fg/0/stats/", timeout=10)
        )
        # the keys pollStats renders must exist in the stats route
        assert {"steps", "samples_per_s", "elapsed_s"} <= set(stats)
        req = urllib.request.Request(
            f"{base}/api/fg/0/block/0/call/freq/",
            data=json.dumps(2e3).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        json.load(urllib.request.urlopen(req, timeout=10))
    finally:
        h.stop()
        h.wait(timeout=30)
        cp.shutdown()

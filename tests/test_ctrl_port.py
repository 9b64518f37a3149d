"""Control port + remote client round-trip.

Parity: ``src/runtime/ctrl_port.rs`` routes and the ``futuresdr-remote``
client usage (``crates/remote/src/remote.rs``)."""

import time

import numpy as np

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import Copy, NullSink, SignalSource
from futuresdr_tpu.remote import Remote
from futuresdr_tpu.runtime.ctrl_port import ControlPort


def test_ctrl_port_describe_and_call():
    cp = ControlPort(bind="127.0.0.1:0")
    try:
        fg = Flowgraph()
        src = SignalSource(100e3, 1e6, name="osc")
        snk = NullSink(np.complex64)
        connect(fg, src, Copy(np.complex64), snk)
        h = Runtime(chunk_size=8192).start(fg)
        fg_id = cp.register(h)
        time.sleep(0.2)

        r = Remote(f"http://127.0.0.1:{cp.port}")
        fgs = r.flowgraphs()
        assert [f.id for f in fgs] == [fg_id]
        desc = fgs[0].describe()
        assert [b["instance_name"] for b in desc["blocks"]] == [
            "osc",
            "Copy",
            "NullSink",
        ]
        assert len(desc["stream_edges"]) == 2

        blk = fgs[0].block("osc")
        assert blk is not None
        assert "freq" in blk.message_inputs
        reply = blk.call("freq", 250e3.__float__())
        assert reply == "Ok"  # tagged Pmt serde (pmt.rs parity)
        h.stop()
        h.wait(timeout=10)
        assert snk.n_received > 0
    finally:
        cp.shutdown()


def test_ctrl_port_custom_route_and_404():
    import json
    from urllib.error import HTTPError
    from urllib.request import urlopen

    cp = ControlPort(bind="127.0.0.1:0")
    try:
        cp.add_route("GET", r"/my/route/", lambda g, b: {"hello": "world"})
        with urlopen(f"http://127.0.0.1:{cp.port}/my/route/") as resp:
            assert json.loads(resp.read()) == {"hello": "world"}
        try:
            urlopen(f"http://127.0.0.1:{cp.port}/api/fg/99/")
            raise AssertionError("expected 404")
        except HTTPError as e:
            assert e.code == 404
    finally:
        cp.shutdown()


def test_ctrl_port_serves_gui():
    from urllib.request import urlopen

    cp = ControlPort(bind="127.0.0.1:0")
    try:
        with urlopen(f"http://127.0.0.1:{cp.port}/") as r:
            body = r.read().decode()
            assert r.headers["Content-Type"] == "text/html"
            assert "waterfall" in body.lower() or "spectrum" in body.lower()
        # path traversal must 404
        from urllib.error import HTTPError

        try:
            urlopen(f"http://127.0.0.1:{cp.port}/../config.py")
            raise AssertionError("expected 404")
        except HTTPError as e:
            assert e.code == 404
    finally:
        cp.shutdown()


def test_ctrl_port_serves_gui_app():
    """The prophecy-parity app bundle (app.js/style.css) is served, and
    describe exposes the feedback flag the FlowgraphCanvas styles."""
    from urllib.request import urlopen

    cp = ControlPort(bind="127.0.0.1:0")
    try:
        with urlopen(f"http://127.0.0.1:{cp.port}/app.js") as r:
            body = r.read().decode()
            assert "FlowgraphCanvas" in body
            assert "ConstellationSink" in body
            assert "PmtEditor" in body
        with urlopen(f"http://127.0.0.1:{cp.port}/style.css") as r:
            assert "fbedge" in r.read().decode()
    finally:
        cp.shutdown()


def test_describe_feedback_edge_flag():
    import numpy as np

    from futuresdr_tpu import Flowgraph
    from futuresdr_tpu.blocks import Apply, Combine, VectorSink, VectorSource

    fg = Flowgraph()
    src = VectorSource(np.zeros(64, np.float32))
    add = Combine(lambda p, q: p + q, a_dtype=np.float32)
    gain = Apply(lambda v: 0.5 * v, in_dtype=np.float32)
    snk = VectorSink(np.float32)
    for b in (src, add, gain, snk):
        fg.add(b)
    fg.stream(src, add, dst_port=0)
    fg.stream(add, gain)
    fg.close_circuit(gain, add, dst_port=1, delay=3)
    fg.stream(add, snk)
    d = fg.describe()
    fbs = [e for e in d.stream_edges if e.feedback]
    assert len(fbs) == 1 and fbs[0].feedback == 3


def test_ctrl_port_snapshot_route(tmp_path):
    """POST /api/fg/{id}/snapshot/ checkpoints a live graph to a path."""
    import json
    from urllib.request import Request, urlopen

    from futuresdr_tpu.blocks import Throttle

    cp = ControlPort(bind="127.0.0.1:0")
    try:
        fg = Flowgraph()
        src = SignalSource(100e3, 1e6, name="osc")
        snk = NullSink(np.complex64)
        connect(fg, src, Throttle(2e6, dtype=np.complex64), snk)
        h = Runtime(chunk_size=8192).start(fg)
        fg_id = cp.register(h)
        time.sleep(0.2)

        path = tmp_path / "live.ckpt"
        req = Request(
            f"http://127.0.0.1:{cp.port}/api/fg/{fg_id}/snapshot/",
            data=json.dumps({"path": str(path)}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urlopen(req) as resp:
            assert json.loads(resp.read())["path"] == str(path)
        assert path.exists() and path.stat().st_size > 0
        h.stop()
        h.wait(timeout=10)
    finally:
        cp.shutdown()


def test_ctrl_port_seify_config_and_terminate():
    """The new seify ports work over REST exactly like local handlers:
    a remote `config` call returns the settings map, and a remote
    `terminate` ends the flowgraph (remote.rs-style control)."""
    from futuresdr_tpu.blocks.seify import Builder

    cp = ControlPort(bind="127.0.0.1:0")
    try:
        src = (
            Builder("driver=dummy")
            .frequency(5e8)
            .sample_rate(1e6)
            .build_source()
        )
        src.instance_name = "sdr"
        fg = Flowgraph()
        snk = NullSink(np.complex64)
        connect(fg, src, snk)
        h = Runtime(chunk_size=8192).start(fg)
        fg_id = cp.register(h)
        time.sleep(0.2)

        r = Remote(f"http://127.0.0.1:{cp.port}")
        blk = r.flowgraphs()[0].block("sdr")
        assert blk is not None
        cfg = blk.call("config", 0)["MapStrPmt"]  # tagged Pmt serde
        assert cfg["freq"] == {"F64": 5e8}
        assert cfg["sample_rate"] == {"F64": 1e6}
        blk.call("terminate", None)
        h.wait(timeout=10)  # EOS cascade from the remote terminate
        assert fg_id is not None
    finally:
        try:
            h.stop()
        except Exception:
            pass
        cp.shutdown()

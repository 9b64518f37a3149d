"""Message blocks, Selector, TagDebug, and network blocks.

Parity: ``src/blocks/message_*.rs`` behaviors, ``selector.rs``,
``tag_debug.rs``, TCP/UDP/zmq loopback usage as in the reference examples.
"""

import threading
import time

import numpy as np

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import (
    Head,
    MessageAnnotator,
    MessageApply,
    MessageBurst,
    MessageCopy,
    MessagePipe,
    MessageSink,
    MessageSource,
    NullSink,
    NullSource,
    Selector,
    SignalSource,
    TcpSink,
    TcpSource,
    UdpSource,
    VectorSink,
    VectorSource,
)
from futuresdr_tpu.types.pmt import Pmt


# ---- message blocks --------------------------------------------------------


def test_message_chain_copy_apply_sink():
    fg = Flowgraph()
    src = MessageSource({"v": 1}, interval=0.02, count=5)
    cp = MessageCopy()
    ap = MessageApply(lambda p: {"v": p.to_py()["v"] + 1})
    snk = MessageSink()
    for b in (src, cp, ap, snk):
        fg.add(b)
    fg.message(src, "out", cp, "in")
    fg.message(cp, "out", ap, "in")
    fg.message(ap, "out", snk, "in")
    Runtime().run(fg)
    assert len(snk.received) == 5
    assert all(p.to_py()["v"] == 2 for p in snk.received)


def test_message_burst_and_pipe():
    burst = MessageBurst("ping", 3)
    pipe = MessagePipe()
    fg = Flowgraph()
    fg.add(burst)
    fg.add(pipe)
    fg.message(burst, "out", pipe, "in")
    from futuresdr_tpu.runtime.executor import Executor

    connect(fg, NullSource(np.complex64), Head(1000, np.complex64), NullSink(np.complex64))
    ex = Executor(fg, chunk_size=1024)
    burst.call_handler("in", Pmt.from_py(None))
    ex.running = True
    ex.run_loop()
    got = []
    while not pipe.queue.empty():
        got.append(pipe.queue.get().to_py())
    assert got == ["ping", "ping", "ping"]


def test_message_annotator():
    ann = MessageAnnotator({"src": "rx1"}, key="data")
    snk = MessageSink()
    fg = Flowgraph()
    fg.add(ann)
    fg.add(snk)
    fg.message(ann, "out", snk, "in")
    fg.blocks  # wiring happens in executor; call handler directly
    from futuresdr_tpu.runtime.executor import Executor

    connect(fg, NullSource(np.complex64), Head(1000, np.complex64), NullSink(np.complex64))
    ex = Executor(fg, chunk_size=1024)
    ann.call_handler("in", Pmt.from_py(42))
    ex.running = True
    ex.run_loop()
    assert snk.received[0].to_py() == {"src": "rx1", "data": 42}


# ---- selector --------------------------------------------------------------


def test_selector_routes_and_retunes():
    a = np.full(4096, 1.0, np.float32)
    b = np.full(4096, 2.0, np.float32)
    fg = Flowgraph()
    sel = Selector(2, 2, np.float32)
    s0, s1 = VectorSink(np.float32), VectorSink(np.float32)
    fg.stream(VectorSource(a), sel, dst_port=0)
    fg.stream(VectorSource(b), sel, dst_port=1)
    fg.stream(sel, s0, src_port=0)
    fg.stream(sel, s1, src_port=1)
    sel.call_handler("input_index", Pmt.from_py(1))
    Runtime(chunk_size=1024).run(fg)
    assert np.all(s0.data() == 2.0)  # routed input 1 → output 0
    assert np.all(s1.data() == 0.0)  # unselected output is zeros


# ---- network ---------------------------------------------------------------


def test_tcp_loopback():
    data = np.arange(20_000, dtype=np.float32)
    snk_tcp = TcpSink(listen=True, dtype=np.float32)
    port = snk_tcp.bound_port

    received = []

    def reader():
        import socket

        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        buf = b""
        while len(buf) < data.nbytes:
            chunk = s.recv(1 << 16)
            if not chunk:
                break
            buf += chunk
        received.append(np.frombuffer(buf, np.float32))
        s.close()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    fg = Flowgraph()
    connect(fg, VectorSource(data), snk_tcp)
    Runtime(chunk_size=4096).run(fg)
    t.join(timeout=10)
    assert received and np.array_equal(received[0], data)


def test_udp_source_receives():
    import socket

    src = UdpSource(dtype=np.float32)
    port = src.bound_port
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, src, Head(2048, np.float32), snk)
    rt = Runtime(chunk_size=1024)
    h = rt.start(fg)
    payload = np.arange(4096, dtype=np.float32)
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for i in range(0, 4096, 256):
        s.sendto(payload[i : i + 256].tobytes(), ("127.0.0.1", port))
        time.sleep(0.005)
    h.wait(timeout=30)
    got = snk.data()
    assert len(got) == 2048
    assert np.array_equal(got, payload[:2048])


def test_zmq_pub_sub_loopback():
    from futuresdr_tpu.blocks.zeromq import PubSink, SubSource

    pub = PubSink("tcp://127.0.0.1:*", np.float32)
    sub = SubSource(pub.address, np.float32)
    time.sleep(0.2)  # let SUB connect before publishing (zmq slow joiner)

    data = np.arange(30_000, dtype=np.float32)

    fg_rx = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg_rx, sub, Head(10_000, np.float32), snk)
    h = Runtime(chunk_size=2048).start(fg_rx)

    fg_tx = Flowgraph()
    connect(fg_tx, VectorSource(data), pub)
    time.sleep(0.3)
    Runtime(chunk_size=2048).run(fg_tx)
    h.wait(timeout=30)
    got = snk.data()
    assert len(got) == 10_000
    # SUB may join mid-stream; verify contiguity from first received value
    start = int(got[0])
    assert np.array_equal(got, data[start : start + 10_000])


def test_websocket_sink_streams():
    import asyncio

    from futuresdr_tpu.blocks import WebsocketSink

    ws = WebsocketSink(port=0, dtype=np.float32)
    got = []

    async def client():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{ws.port}") as conn:
            msg = await asyncio.wait_for(conn.recv(), timeout=20)
            got.append(np.frombuffer(msg, np.float32))

    t = threading.Thread(target=lambda: asyncio.run(client()), daemon=True)
    t.start()
    time.sleep(0.3)
    fg = Flowgraph()
    connect(fg, SignalSource(1000.0, 48000.0, kind="sin"), Head(48_000, np.float32), ws)
    Runtime(chunk_size=4096).run(fg)
    t.join(timeout=20)
    assert got and got[0].size > 0


def test_websocket_sink_blocking_mode_delivers_every_chunk():
    """mode="blocking" (ref WebsocketSinkMode::Blocking/FixedBlocking,
    websocket_sink.rs:256): every chunk reaches a connected client before
    the next step dispatches — a deliberately slow reader sees the full
    lossless stream, where fixed-dropping would drop frames."""
    import asyncio

    from futuresdr_tpu.blocks import WebsocketSink

    ws = WebsocketSink(port=0, dtype=np.float32, mode="blocking")
    got = []
    total = 32_768
    chunk = 4096

    async def client():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{ws.port}") as conn:
            n = 0
            while n < total:
                msg = await asyncio.wait_for(conn.recv(), timeout=30)
                got.append(np.frombuffer(msg, np.float32))
                n += got[-1].size
                await asyncio.sleep(0.02)  # slow consumer

    t = threading.Thread(target=lambda: asyncio.run(client()), daemon=True)
    t.start()
    time.sleep(0.3)
    fg = Flowgraph()
    connect(
        fg,
        VectorSource(np.arange(total, dtype=np.float32)),
        ws,
    )
    Runtime(chunk_size=chunk).run(fg)
    t.join(timeout=30)
    stream = np.concatenate(got) if got else np.zeros(0, np.float32)
    assert stream.size == total
    assert np.array_equal(stream, np.arange(total, dtype=np.float32))


def test_websocket_sink_rejects_bad_mode():
    import pytest

    from futuresdr_tpu.blocks import WebsocketSink

    with pytest.raises(ValueError):
        WebsocketSink(port=0, mode="nope")


def test_framed_receiver_sink_lora():
    """Generic FramedReceiverSink runs any modem receiver in a flowgraph;
    frames straddling the process window dedup/complete via overlap."""
    import numpy as np
    from futuresdr_tpu import Flowgraph, Runtime
    from futuresdr_tpu.blocks import FramedReceiverSink, VectorSource
    from futuresdr_tpu.models.lora import (
        LoraConfig,
        LoraReceiver,
        modulate_frame,
    )

    cfg = LoraConfig(sf=7, cr=1)
    iq1 = modulate_frame(cfg, b"frame one")
    iq2 = modulate_frame(cfg, b"frame two!")
    gap = np.zeros(3000, np.complex64)
    sig = np.concatenate([gap, iq1, gap, iq2, gap]).astype(np.complex64)

    fg = Flowgraph()
    src = VectorSource(sig)
    # small window forces both frames to straddle process boundaries
    snk = FramedReceiverSink(
        LoraReceiver(cfg), overlap=len(iq1) + 256, process_size=4096
    )
    fg.stream(src, snk)
    Runtime().run(fg)
    payloads = sorted(f.payload for f in snk.frames if f.crc_ok)
    assert payloads == [b"frame one", b"frame two!"]


def test_profiler_trace_writes_perfetto():
    """utils.trace captures a jax profiler trace around a flowgraph run
    (the reference's samply/LTTng observability workflow)."""
    import tempfile
    from pathlib import Path

    import numpy as np

    from futuresdr_tpu import Flowgraph, Runtime
    from futuresdr_tpu.blocks import Apply, VectorSink, VectorSource
    from futuresdr_tpu.utils import trace

    d = tempfile.mkdtemp()
    fg = Flowgraph()
    src = VectorSource(np.arange(8192, dtype=np.complex64))
    b = Apply(lambda x: x * 2.0)
    snk = VectorSink(dtype=np.complex64)
    fg.stream(src, b)
    fg.stream(b, snk)
    with trace(d):
        Runtime().run(fg)
    produced = list(Path(d).rglob("*"))
    assert any(p.is_file() for p in produced), produced

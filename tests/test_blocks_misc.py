"""Message blocks, Selector, TagDebug, and network blocks.

Parity: ``src/blocks/message_*.rs`` behaviors, ``selector.rs``,
``tag_debug.rs``, TCP/UDP/zmq loopback usage as in the reference examples.
"""

import threading
import time

import pytest

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


def test_drop_policy_parse_parity():
    # string forms the reference accepts (selector.rs:25-49)
    from futuresdr_tpu.blocks.stream import DropPolicy

    for s in ("same", "same-rate", "SAME", "SAME_RATE", "sameRate"):
        assert DropPolicy.parse(s) == DropPolicy.SAME_RATE
    for s in ("none", "NoDrop", "NO_DROP", "no-drop"):
        assert DropPolicy.parse(s) == DropPolicy.NO_DROP
    for s in ("all", "DropAll", "drop-all", "DROP_ALL"):
        assert DropPolicy.parse(s) == DropPolicy.DROP_ALL
    try:
        DropPolicy.parse("bogus")
        assert False
    except ValueError:
        pass


def _sel_step(m, sel, a_chunk, b_chunk):
    m.input(0, a_chunk).input(1, b_chunk).run()


def test_selector_same_rate_drops_unselected():
    # semantics of selector.rs DropPolicy::SameRate: while input 0 is
    # selected, input 1's samples are consumed and lost; after a switch
    # only NEW input-1 samples appear
    from futuresdr_tpu.blocks.stream import DropPolicy
    from futuresdr_tpu.runtime.mocker import Mocker

    sel = Selector(2, 1, np.float32, drop_policy=DropPolicy.SAME_RATE)
    m = Mocker(sel)
    a = [np.full(16, 10.0 + i, np.float32) for i in range(4)]
    b = [np.full(16, 20.0 + i, np.float32) for i in range(4)]
    _sel_step(m, sel, a[0], b[0])
    _sel_step(m, sel, a[1], b[1])
    m.post("input_index", 1)
    _sel_step(m, sel, a[2], b[2])
    _sel_step(m, sel, a[3], b[3])
    out = m.output(0).reshape(4, 16)
    assert np.all(out[0] == 10.0) and np.all(out[1] == 11.0)
    # b[0], b[1] were dropped; switch shows b[2] onward
    assert np.all(out[2] == 22.0) and np.all(out[3] == 23.0)


def test_selector_drop_policies_distinguished():
    """One switch sequence, all three policies (selector.rs:199-210):

    - SameRate consumes unselected chunks each step → switch shows live;
    - NoDrop buffers them → switch replays the backlog oldest-first;
    - DropAll buffers while unselected but DRAINS the backlog at the
      switch (``consume(usize::MAX)``) → switch shows live, and the
      flushed chunk count is observable via ``selector_flushed`` aux.
    """
    from futuresdr_tpu.blocks.stream import DropPolicy
    from futuresdr_tpu.runtime.mocker import Mocker

    outs = {}
    flushed_at_switch = {}
    for pol in (
        DropPolicy.SAME_RATE,
        DropPolicy.NO_DROP,
        DropPolicy.DROP_ALL,
    ):
        sel = Selector(2, 1, np.float32, drop_policy=pol, hold_chunks=4)
        m = Mocker(sel)
        a = [np.full(8, 10.0 + i, np.float32) for i in range(4)]
        b = [np.full(8, 20.0 + i, np.float32) for i in range(4)]
        _sel_step(m, sel, a[0], b[0])
        _sel_step(m, sel, a[1], b[1])
        m.post("input_index", 1)
        _sel_step(m, sel, a[2], b[2])
        flushed_at_switch[pol] = sel.last_aux.get("selector_flushed")
        _sel_step(m, sel, a[3], b[3])
        outs[pol] = m.output(0).reshape(4, 8)[:, 0].tolist()
    assert outs[DropPolicy.SAME_RATE] == [10.0, 11.0, 22.0, 23.0]
    # DropAll: b0/b1 were buffered, then drained at the switch → live out
    assert outs[DropPolicy.DROP_ALL] == [10.0, 11.0, 22.0, 23.0]
    assert int(flushed_at_switch[DropPolicy.DROP_ALL]) == 2
    # NoDrop: the backlog survives the switch and replays in order
    assert outs[DropPolicy.NO_DROP] == [10.0, 11.0, 20.0, 21.0]
    assert flushed_at_switch[DropPolicy.SAME_RATE] is None
    assert flushed_at_switch[DropPolicy.NO_DROP] is None


def test_selector_no_drop_holds_unselected_samples():
    # semantics of selector.rs DropPolicy::NoDrop: unselected samples are
    # NOT lost — after switching, buffered chunks come out in arrival
    # order before live ones
    from futuresdr_tpu.blocks.stream import DropPolicy
    from futuresdr_tpu.runtime.mocker import Mocker

    sel = Selector(2, 1, np.float32, drop_policy=DropPolicy.NO_DROP,
                   hold_chunks=4)
    m = Mocker(sel)
    a = [np.full(16, 10.0 + i, np.float32) for i in range(5)]
    b = [np.full(16, 20.0 + i, np.float32) for i in range(5)]
    _sel_step(m, sel, a[0], b[0])  # emit a0; hold b0
    _sel_step(m, sel, a[1], b[1])  # emit a1; hold b1
    m.post("input_index", 1)
    _sel_step(m, sel, a[2], b[2])  # emit b0 (oldest); hold b2, a2
    _sel_step(m, sel, a[3], b[3])  # emit b1; hold b3, a3
    _sel_step(m, sel, a[4], b[4])  # emit b2; hold b4, a4
    out = m.output(0).reshape(5, 16)
    assert np.all(out[0] == 10.0) and np.all(out[1] == 11.0)
    assert np.all(out[2] == 20.0)  # b0 survived while unselected
    assert np.all(out[3] == 21.0)
    assert np.all(out[4] == 22.0)


def test_selector_no_drop_ring_overflow_drops_newest():
    # bounded-memory stand-in for reference backpressure: once the hold
    # ring is full, new unselected chunks are dropped (oldest kept)
    from futuresdr_tpu.blocks.stream import DropPolicy
    from futuresdr_tpu.runtime.mocker import Mocker

    sel = Selector(2, 1, np.float32, drop_policy=DropPolicy.NO_DROP,
                   hold_chunks=2)
    m = Mocker(sel)
    a = np.full(8, 1.0, np.float32)
    for i in range(4):  # b0..b3 offered; ring keeps b0, b1
        _sel_step(m, sel, a, np.full(8, 20.0 + i, np.float32))
    m.post("input_index", 1)
    _sel_step(m, sel, a, np.full(8, 30.0, np.float32))  # emit b0
    _sel_step(m, sel, a, np.full(8, 31.0, np.float32))  # emit b1
    _sel_step(m, sel, a, np.full(8, 32.0, np.float32))  # emit live-queued 30
    out = m.output(0).reshape(7, 8)
    assert np.all(out[4] == 20.0) and np.all(out[5] == 21.0)
    assert np.all(out[6] == 30.0)


def test_selector_no_drop_complex_roundtrip():
    from futuresdr_tpu.blocks.stream import DropPolicy
    from futuresdr_tpu.runtime.mocker import Mocker

    sel = Selector(2, 1, np.complex64, drop_policy=DropPolicy.NO_DROP,
                   hold_chunks=2)
    m = Mocker(sel)
    a = np.full(8, 1 + 1j, np.complex64)
    b = np.full(8, 2 - 3j, np.complex64)
    _sel_step(m, sel, a, b)
    m.post("input_index", 1)
    _sel_step(m, sel, a, b)
    out = m.output(0).reshape(2, 8)
    assert np.allclose(out[0], 1 + 1j)
    assert np.allclose(out[1], 2 - 3j)  # held b chunk emitted after switch


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


def test_apply_into_iter_variable_counts():
    """Variable expansion: per-item counts aux + host_compact recover the
    exact reference stream (applyintoiter.rs) without worst-case padding."""
    import jax.numpy as jnp

    from futuresdr_tpu.blocks import ApplyIntoIter
    from futuresdr_tpu.runtime.mocker import Mocker

    # item v expands to v copies of itself (v in 0..4), capacity n=4
    def fn(x):
        k = x.shape[-1]
        y = jnp.broadcast_to(x[:, None], (k, 4))
        return y, x.astype(jnp.int32)

    blk = ApplyIntoIter(fn, n=4, in_dtype=np.float32, variable=True)
    x = jnp.asarray(np.array([2, 0, 3, 1], np.float32))
    _, outs, aux = blk.apply((), [x], blk.params())
    out = np.asarray(outs[0])
    np.testing.assert_array_equal(aux["counts"], [2, 0, 3, 1])
    got = ApplyIntoIter.host_compact(out, aux["counts"])
    np.testing.assert_array_equal(got, [2, 2, 3, 3, 3, 1])
    # padding slots are zeroed on device
    assert np.count_nonzero(out) == 6


def test_filter_host_compact():
    from futuresdr_tpu.blocks import Filter

    chunk = np.array([1.0, 0.0, 3.0, 0.0], np.float32)
    mask = np.array([True, False, True, False])
    np.testing.assert_array_equal(
        Filter.host_compact(chunk, mask), [1.0, 3.0]
    )


def test_resident_source_emits_same_buffer_each_step():
    """ResidentSource: the pre-uploaded buffer (cycled/trimmed to the
    solved chunk) is emitted unchanged every step through the params
    cache — the fair bench upstream vs a loop-invariant raw operand."""
    from futuresdr_tpu import Flowgraph, connect
    from futuresdr_tpu.blocks import Apply, Head, ResidentSource, VectorSink
    from futuresdr_tpu.runtime.executor import Executor

    x = (np.arange(100) + 1j * np.arange(100)).astype(np.complex64) / 100
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(
        fg,
        ResidentSource(x),
        Apply(lambda v: v * 2.0),
        Head(260, np.complex64),
        snk,
    )
    ex = Executor(fg, chunk_size=80)
    n = max(ex.cfg.edge_items.values())
    h = ex.start()
    h.wait(30)
    got = snk.data()
    want_chunk = 2 * np.resize(x, n)
    want = np.resize(np.tile(want_chunk, -(-260 // n)), 260)
    np.testing.assert_allclose(got, want[: len(got)], atol=1e-6)


from futuresdr_tpu.blocks import Delay  # noqa: E402


def test_delay_skip_negative():
    """Delay(n<0) drops the first |n| samples (delay.rs State::Skip)."""
    x = np.arange(1, 30001, dtype=np.float32)
    for k in (3, 64, 500):
        fg = Flowgraph()
        snk = VectorSink(np.float32)
        connect(fg, VectorSource(x.copy()), Delay(-k, dtype=np.float32), snk)
        Runtime(chunk_size=4096).run(fg)
        y = snk.data()
        ref = x[k:]
        m = min(len(y), len(ref))
        assert m > 0
        np.testing.assert_array_equal(y[:m], ref[:m])


def test_delay_skip_after_filter_transient():
    """Skip composes with an upstream transient: the trim absorbs both
    the filter's latency and the skip."""
    from futuresdr_tpu.blocks import Fir
    from futuresdr_tpu.dsp import firdes, windows

    rng = np.random.default_rng(3)
    x = rng.standard_normal(40_000).astype(np.float32)
    taps = firdes.lowpass(0.2, windows.hamming(21))
    k = 40
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(
        fg,
        VectorSource(x.copy()),
        Fir(taps, dtype=np.float32),
        Delay(-k, dtype=np.float32),
        snk,
    )
    Runtime(chunk_size=4096).run(fg)
    y = snk.data()
    ref = np.convolve(x, taps, mode="valid")[k:]
    m = min(len(y), len(ref))
    assert m > 30_000
    np.testing.assert_allclose(y[:m], ref[:m], atol=2e-5)


def test_delay_new_value_port():
    """delay.rs new_value parity: {"pad": bool, "value": n} accumulates
    onto the current shift pre-compile; locked once compiled; unlocked
    after the run finishes."""
    from futuresdr_tpu.types.pmt import Pmt

    d = Delay(10, dtype=np.float32)
    assert d.call_handler("new_value", Pmt.from_py(None)).to_py() == 10
    d.call_handler("new_value", Pmt.from_py({"pad": False, "value": 25}))
    assert d.n == -15 and d.state_suffix_in == (15,)
    d.call_handler("new_value", Pmt.from_py({"pad": True, "value": 15}))
    assert d.n == 0

    x = np.arange(1, 10001, dtype=np.float32)
    d2 = Delay(0, dtype=np.float32)
    d2.call_handler("new_value", Pmt.from_py({"pad": False, "value": 8}))
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(x.copy()), d2, snk)
    Runtime(chunk_size=1024).run(fg)
    y = snk.data()
    np.testing.assert_array_equal(y[: len(y)], x[8 : 8 + len(y)])
    # Runtime.run released the lock: stop-adjust-run-again works
    d2.call_handler("new_value", Pmt.from_py({"pad": True, "value": 3}))
    assert d2.n == -5
    d2._rate_locked = True  # what a live Executor sets at compile
    with pytest.raises(RuntimeError):
        d2.call_handler("new_value", Pmt.from_py({"pad": True, "value": 1}))
    d2._rate_locked = False
    with pytest.raises(ValueError):
        d2.call_handler("new_value", Pmt.from_py([1, 2]))


def test_rate_lock_lifecycle():
    """The rate lock is executor-lifetime: held from compile through
    max_steps batch pauses of a live Executor (its cfg stays valid),
    released by Runtime.run even when the run RAISES."""
    from futuresdr_tpu.runtime.executor import Executor

    x = np.arange(1, 50_001, dtype=np.float32)
    d = Delay(-8, dtype=np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(x.copy()), d, snk)
    ex = Executor(fg, chunk_size=2048, max_steps=2)
    # locked at COMPILE time, before any step ran
    with pytest.raises(RuntimeError):
        d.call_handler("new_value", Pmt.from_py({"pad": True, "value": 1}))
    ex.running = True
    ex.run_loop()
    # batch pause: the executor (and its compiled cfg) is still live
    with pytest.raises(RuntimeError):
        d.call_handler("new_value", Pmt.from_py({"pad": True, "value": 1}))

    # an ERRORED Runtime.run must still release the lock
    class Boom(VectorSink):
        def host_consume(self, arr, tags, port=0):
            raise OSError("disk full")

    d2 = Delay(-8, dtype=np.float32)
    fg2 = Flowgraph()
    connect(fg2, VectorSource(x.copy()), d2, Boom(np.float32))
    with pytest.raises(OSError):
        Runtime(chunk_size=2048).run(fg2)
    d2.call_handler("new_value", Pmt.from_py({"pad": True, "value": 3}))
    assert d2.n == -5

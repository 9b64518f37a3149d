"""Runtime integration tests on full graphs.

Parity: ``tests/flowgraph.rs`` (exact-output Vector fixtures, 10M random
samples, multi-sink fan-out, lifecycle), ``tests/connect_error.rs``,
``tests/fir.rs``, ``tests/moving_avg.rs``, ``tests/apply.rs``,
``tests/combine.rs``, ``tests/split.rs``, ``tests/tag.rs``.
"""

import numpy as np
import pytest

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import (
    Apply,
    Combine,
    Copy,
    Delay,
    Fir,
    Head,
    MovingAvg,
    NullSink,
    NullSource,
    SignalSource,
    Split,
    StreamDeinterleaver,
    VectorSink,
    VectorSource,
)
from futuresdr_tpu.runtime.compiler import RateError, compile_flowgraph
from futuresdr_tpu.runtime.flowgraph import ConnectError
from futuresdr_tpu.runtime.tags import ItemTag, Tag


def run(fg, chunk=4096, **kw):
    return Runtime(chunk_size=chunk).run(fg, **kw)


# ---- flowgraph.rs parity ---------------------------------------------------


def test_linear_copy_exact():
    data = np.arange(100_000, dtype=np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(data), Copy(np.float32), snk)
    run(fg)
    assert np.array_equal(snk.data(), data)


def test_ten_million_random_samples():
    # parity: tests/flowgraph.rs:150-174
    rng = np.random.default_rng(1)
    data = rng.standard_normal(10_000_000).astype(np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(data), Copy(np.float32), snk)
    run(fg, chunk=1 << 18)
    assert np.array_equal(snk.data(), data)


def test_multi_sink_fanout():
    # parity: tests/flowgraph.rs:176-209 — one output port, two readers
    data = np.arange(10_000, dtype=np.float32)
    fg = Flowgraph()
    src = VectorSource(data)
    s1, s2 = VectorSink(np.float32), VectorSink(np.float32)
    c = Copy(np.float32)
    fg.stream(src, c)
    fg.stream(c, s1)
    fg.stream(c, s2)
    run(fg)
    assert np.array_equal(s1.data(), data)
    assert np.array_equal(s2.data(), data)


def test_partial_final_chunk():
    # length deliberately not a multiple of any chunk size
    data = np.arange(12_345, dtype=np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(data), Copy(np.float32), snk)
    run(fg, chunk=4096)
    assert np.array_equal(snk.data(), data)


def test_start_stop_lifecycle():
    # parity: tests/flowgraph.rs:98-117 — stop a running graph
    fg = Flowgraph()
    snk = NullSink(np.complex64)
    connect(fg, NullSource(np.complex64), Copy(np.complex64), snk)
    rt = Runtime(chunk_size=8192)
    handle = rt.start(fg)
    import time

    time.sleep(0.3)
    handle.stop()
    handle.wait(timeout=10)
    assert not handle.running
    assert snk.n_received > 0


def test_head_limits_items():
    fg = Flowgraph()
    snk = NullSink(np.complex64)
    connect(
        fg, NullSource(np.complex64), Head(100_000, np.complex64), snk
    )
    run(fg, chunk=8192)
    assert snk.n_received == 100_000


# ---- connect_error.rs parity -----------------------------------------------


def test_connect_dtype_mismatch():
    fg = Flowgraph()
    src = VectorSource(np.arange(10, dtype=np.float32))
    with pytest.raises(ConnectError):
        fg.stream(src, Copy(np.complex64))


def test_connect_double_input():
    fg = Flowgraph()
    a = VectorSource(np.arange(10, dtype=np.float32))
    b = VectorSource(np.arange(10, dtype=np.float32))
    c = Copy(np.float32)
    fg.stream(a, c)
    with pytest.raises(ConnectError):
        fg.stream(b, c)


def test_unconnected_input_rejected():
    fg = Flowgraph()
    fg.add(Copy(np.float32))
    with pytest.raises(RateError):
        compile_flowgraph(fg)


def test_bad_port_name():
    fg = Flowgraph()
    src = VectorSource(np.arange(10, dtype=np.float32))
    with pytest.raises(ConnectError):
        fg.stream(src, Copy(np.float32), src_port="nonexistent")


# ---- apply/combine/split parity --------------------------------------------


def test_apply_chain():
    data = np.arange(1000, dtype=np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(
        fg,
        VectorSource(data),
        Apply(lambda x: x * 2.0, np.float32),
        Apply(lambda x: x + 1.0, np.float32),
        snk,
    )
    run(fg, chunk=256)
    assert np.allclose(snk.data(), data * 2 + 1)


def test_combine_two_streams():
    a = np.arange(5000, dtype=np.float32)
    b = np.arange(5000, dtype=np.float32) * 10
    fg = Flowgraph()
    sa, sb = VectorSource(a), VectorSource(b)
    add = Combine(lambda x, y: x + y, np.float32)
    snk = VectorSink(np.float32)
    fg.stream(sa, add, dst_port=0)
    fg.stream(sb, add, dst_port=1)
    fg.stream(add, snk)
    run(fg, chunk=1024)
    assert np.allclose(snk.data(), a + b)


def test_split_two_outputs():
    data = np.arange(4000, dtype=np.float32)
    fg = Flowgraph()
    sp = Split(lambda x: (x * 2, x * 3), np.float32)
    s1, s2 = VectorSink(np.float32), VectorSink(np.float32)
    fg.stream(VectorSource(data), sp)
    fg.stream(sp, s1, src_port=0)
    fg.stream(sp, s2, src_port=1)
    run(fg, chunk=512)
    assert np.allclose(s1.data(), data * 2)
    assert np.allclose(s2.data(), data * 3)


def test_deinterleave():
    data = np.arange(8000, dtype=np.float32)
    fg = Flowgraph()
    d = StreamDeinterleaver(2, np.float32)
    s0, s1 = VectorSink(np.float32), VectorSink(np.float32)
    fg.stream(VectorSource(data), d)
    fg.stream(d, s0, src_port=0)
    fg.stream(d, s1, src_port=1)
    run(fg, chunk=512)
    assert np.array_equal(s0.data(), data[0::2])
    assert np.array_equal(s1.data(), data[1::2])


# ---- fir.rs / moving_avg.rs parity ----------------------------------------


def test_fir_matches_reference_valid_conv():
    rng = np.random.default_rng(2)
    taps = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal(100_000).astype(np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(x), Fir(taps, dtype=np.float32), snk)
    run(fg, chunk=8192)
    # reference: out[k] = Σ_t in[k+t]·taps[T-1-t]  (fir.rs:77-88)
    ref = np.convolve(x, taps, mode="valid").astype(np.float32)
    got = snk.data()
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-3


def test_fir_complex_stream():
    rng = np.random.default_rng(3)
    taps = rng.standard_normal(31).astype(np.float32)
    x = (rng.standard_normal(20_000) + 1j * rng.standard_normal(20_000)).astype(
        np.complex64
    )
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(x), Fir(taps), snk)
    run(fg, chunk=4096)
    ref = np.convolve(x, taps, mode="valid").astype(np.complex64)
    assert np.max(np.abs(snk.data() - ref)) < 1e-3


def test_fir_decimating():
    rng = np.random.default_rng(4)
    taps = rng.standard_normal(32).astype(np.float32)
    x = rng.standard_normal(50_000).astype(np.float32)
    q = 4
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(x), Fir.decimating(taps, q, np.float32), snk)
    run(fg, chunk=8192)
    full = np.convolve(x, taps, mode="valid")
    # first full-window output is at input phase ceil((T-1)/q)*q
    import math

    m0 = math.ceil((len(taps) - 1) / q)
    ref = full[m0 * q - (len(taps) - 1) :: q].astype(np.float32)
    got = snk.data()
    n = min(len(got), len(ref))
    assert n > 10_000
    assert np.max(np.abs(got[:n] - ref[:n])) < 1e-3


def test_moving_avg():
    x = np.arange(1000, dtype=np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(x), MovingAvg(10, np.float32), snk)
    run(fg, chunk=100)
    ref = np.convolve(x, np.full(10, 0.1), mode="valid").astype(np.float32)
    got = snk.data()
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-4


def test_delay_prepends_zeros():
    x = np.arange(1, 1001, dtype=np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(x), Delay(7, np.float32), snk)
    run(fg, chunk=128)
    got = snk.data()
    assert np.array_equal(got[:7], np.zeros(7))
    assert np.array_equal(got[7:], x[: len(got) - 7])


# ---- multirate graph: rate solver ------------------------------------------


def test_rate_solver_resampling_chain():
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(60_000) + 1j * rng.standard_normal(60_000)).astype(
        np.complex64
    )
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(x), Fir.resampling(3, 5), snk)
    run(fg, chunk=8192)
    assert len(snk.data()) > 0.9 * len(x) * 3 / 5 - 100


def test_signal_source_tone():
    fg = Flowgraph()
    fs = 48_000.0
    snk = VectorSink(np.complex64)
    connect(
        fg,
        SignalSource(1000.0, fs),
        Head(48_000, np.complex64),
        snk,
    )
    run(fg, chunk=4096)
    y = snk.data()
    assert len(y) == 48_000
    t = np.arange(len(y)) / fs
    ref = np.exp(2j * np.pi * 1000.0 * t)
    assert np.max(np.abs(y - ref)) < 1e-3


# ---- tags (tag.rs parity) --------------------------------------------------


def test_tags_pass_through():
    data = np.arange(10_000, dtype=np.float32)
    tags = [
        ItemTag(0, Tag.id(7)),
        ItemTag(5000, Tag.string("mid")),
        ItemTag(9999, Tag.named_usize("n", 42)),
    ]
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(
        fg, VectorSource(data, tags=tags), Copy(np.float32), snk
    )
    run(fg, chunk=1024)
    got = snk.tags()
    assert [(t.index, t.tag.kind.value) for t in got] == [
        (0, "Id"),
        (5000, "String"),
        (9999, "NamedUsize"),
    ]


def test_tags_from_both_combine_inputs_survive():
    # PROPAGATE must merge tags from EVERY input port (reference behavior:
    # blocks/apply.rs:116-121 generalized) — a Combine used to silently
    # drop port-1 tags.
    a = np.zeros(6000, dtype=np.float32)
    b = np.zeros(6000, dtype=np.float32)
    ta = [ItemTag(100, Tag.string("a"))]
    tb = [ItemTag(200, Tag.string("b")), ItemTag(100, Tag.string("b100"))]
    fg = Flowgraph()
    sa, sb = VectorSource(a, tags=ta), VectorSource(b, tags=tb)
    add = Combine(lambda x, y: x + y, np.float32)
    snk = VectorSink(np.float32)
    fg.stream(sa, add, dst_port=0)
    fg.stream(sb, add, dst_port=1)
    fg.stream(add, snk)
    run(fg, chunk=1024)
    got = [(t.index, t.tag.value) for t in snk.tags()]
    # sorted by index; equal indices keep input-port order (port 0 first)
    assert got == [(100, "a"), (100, "b100"), (200, "b")]


def test_tags_rescale_across_decimation():
    data = np.zeros(8000, dtype=np.float32)
    tags = [ItemTag(4000, Tag.id(1))]
    taps = np.ones(1, dtype=np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(
        fg,
        VectorSource(data, tags=tags),
        Fir.decimating(taps, 4, np.float32),
        snk,
    )
    run(fg, chunk=1024)
    got = snk.tags()
    assert len(got) == 1
    assert got[0].index == 1000


# ---- messages / handle -----------------------------------------------------


def test_handle_call_retunes_signal_source():
    import time

    fg = Flowgraph()
    fs = 1_000_000.0
    src = SignalSource(100e3, fs)
    snk = NullSink(np.complex64)
    connect(fg, src, Copy(np.complex64), snk)
    rt = Runtime(chunk_size=8192)
    h = rt.start(fg)
    time.sleep(0.2)
    reply = h.call(src, "freq", 200e3)
    assert reply is not None
    time.sleep(0.1)
    h.stop()
    h.wait(timeout=10)
    assert snk.n_received > 0


def test_message_edge_routes_between_blocks():
    from futuresdr_tpu.runtime.block import Block, message_handler
    from futuresdr_tpu.types.pmt import Pmt

    received = []

    class Receiver(Block):
        @message_handler("in")
        def handler(self, pmt):
            received.append(pmt.to_py())
            return Pmt.ok()

    class Poster(Block):
        def __init__(self):
            super().__init__()
            self.message_outputs = ["out"]

    fg = Flowgraph()
    p, r = Poster(), Receiver()
    fg.add(p)
    fg.add(r)
    fg.message(p, "out", r, "in")
    ex_fg = fg  # wire via executor
    from futuresdr_tpu.runtime.executor import Executor

    # message-only graphs have no stream edges; wire a trivial stream pair
    snk = NullSink(np.complex64)
    connect(fg, NullSource(np.complex64), Head(10_000, np.complex64), snk)
    ex = Executor(fg, chunk_size=4096)
    p.post("out", Pmt.from_py(123))
    ex.running = True
    ex.run_loop()
    assert received == [123]


# ---- error propagation (bad_block.rs / fail.rs parity) ---------------------


def test_block_error_propagates():
    class BadBlock(Apply):
        def __init__(self):
            super().__init__(lambda x: x, np.float32)

        def host_limit(self, port, valid):
            raise ValueError("boom")

    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(
        fg,
        VectorSource(np.arange(100, dtype=np.float32)),
        BadBlock(),
        snk,
    )
    rt = Runtime(chunk_size=64)
    h = rt.start(fg)
    with pytest.raises(ValueError):
        h.wait(timeout=10)


def test_head_delivers_exact_n_after_transient():
    """Head(n) budget must not be consumed by upstream transient items
    (which the sink trims): exactly n items reach the sink."""
    rng = np.random.default_rng(11)
    taps = rng.standard_normal(64).astype(np.float32)
    x = rng.standard_normal(50_000).astype(np.float32)
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(
        fg,
        VectorSource(x),
        Fir(taps, dtype=np.float32),
        Head(1000, np.float32),
        snk,
    )
    run(fg, chunk=4096)
    assert len(snk.data()) == 1000


def test_one_finished_source_terminates_graph():
    """A finished input stream terminates the flowgraph even while other
    sources are still live (the reference's BlockDone cascade)."""
    import time

    a = VectorSource(np.ones(5000, np.float32), repeat=True)  # endless
    b = VectorSource(np.ones(20_000, np.float32))  # finite
    add = Combine(lambda x, y: x + y, np.float32)
    snk = VectorSink(np.float32)
    fg = Flowgraph()
    fg.stream(a, add, dst_port=0)
    fg.stream(b, add, dst_port=1)
    fg.stream(add, snk)
    h = Runtime(chunk_size=4096).start(fg)
    h.wait(timeout=30)  # must terminate on its own
    assert len(snk.data()) >= 16_000


def test_tags_preserved_under_scan_batching():
    """Tags ride the K-chunk lax.scan dispatch path identically to
    single-step (per-chunk trim + absolute rebasing in _deliver_batch)."""
    import numpy as np

    from futuresdr_tpu import Flowgraph, Runtime, config
    from futuresdr_tpu.blocks import Apply, VectorSink, VectorSource
    from futuresdr_tpu.runtime.tags import ItemTag

    data = np.arange(50000, dtype=np.complex64)
    tags = [
        ItemTag(5, "a"),
        ItemTag(9000, "b"),
        ItemTag(33333, "c"),
        ItemTag(49999, "d"),
    ]

    def run(k):
        fg = Flowgraph()
        src = VectorSource(data, tags=tags)
        b = Apply(lambda x: x + 1.0)
        snk = VectorSink(dtype=np.complex64)
        fg.stream(src, b)
        fg.stream(b, snk)
        config.set("steps_per_call", k)
        try:
            Runtime(chunk_size=4096).run(fg)
        finally:
            config.set("steps_per_call", "auto")
        return snk.data(), [(t.index, t.tag) for t in snk.tags()]

    d1, t1 = run(1)
    d4, t4 = run(4)
    np.testing.assert_array_equal(d1, d4)
    assert t1 == t4 == [(5, "a"), (9000, "b"), (33333, "c"), (49999, "d")]


def test_to_dot_renders_stream_and_message_edges():
    import numpy as np

    from futuresdr_tpu import Flowgraph, to_dot
    from futuresdr_tpu.blocks import Apply, VectorSink, VectorSource
    from futuresdr_tpu.models.wlan import WlanMac
    from futuresdr_tpu.models.wlan.blocks import WlanTxSource

    fg = Flowgraph()
    mac = WlanMac()
    tx = WlanTxSource()
    snk = VectorSink(dtype=np.complex64)
    fg.message(mac, "tx_frames", tx, "tx")
    fg.stream(tx, snk)
    dot = to_dot(fg)
    assert "digraph" in dot
    assert "WlanMac" in dot and "WlanTxSource" in dot
    assert "style=dashed" in dot and "tx_frames" in dot


def test_closed_loop_feedback_via_message_edge():
    """Feedback loops close through the MESSAGE plane (the reference's
    model too — stream cycles stay rejected by the topo sort): a
    level-measuring sink retunes an upstream gain param each chunk and
    the output level converges to target."""
    import numpy as np

    from futuresdr_tpu import Flowgraph, Runtime
    from futuresdr_tpu.blocks import VectorSource
    from futuresdr_tpu.runtime.block import (
        Block,
        PortSpec,
        message_handler,
    )
    from futuresdr_tpu.types.pmt import Pmt

    class GainStage(Block):
        def __init__(self):
            super().__init__()
            self.stream_inputs = [PortSpec("in", np.float32)]
            self.stream_outputs = [PortSpec("out", np.float32)]
            self.rate_in = (1,)
            self.rate_out = (1,)
            self._params["g"] = np.float32(1.0)

        @message_handler("gain")
        def _g(self, pmt):
            self.set_param("g", np.float32(float(pmt.to_py())))
            return Pmt.ok()

        def apply(self, state, inputs, params):
            return state, [inputs[0] * params["g"]], {}

    class LevelSink(Block):
        def __init__(self, target=1.0):
            super().__init__()
            self.stream_inputs = [PortSpec("in", np.float32)]
            self.rate_in = (1,)
            self.message_outputs = ["gain_out"]
            self.target = target
            self.gain = 1.0
            self.levels = []

        def host_consume(self, arr, tags, port=0):
            lvl = float(np.sqrt(np.mean(arr**2)) + 1e-12)
            self.levels.append(lvl)
            self.gain *= (self.target / lvl) ** 0.5
            self.post("gain_out", Pmt.from_py(self.gain))

    snk = LevelSink()
    g = GainStage()
    fg = Flowgraph()
    src = VectorSource(np.full(400000, 0.05, np.float32))
    fg.stream(src, g)
    fg.stream(g, snk)
    fg.message(snk, "gain_out", g, "gain")  # the feedback edge
    Runtime(chunk_size=8192).run(fg)
    assert abs(snk.levels[-1] - 1.0) < 0.05


def test_nofetch_pacing_bounds_probe_window():
    """No-fetch graphs keep a bounded completion-marker window (the
    dispatch-queue pacing that stops unbounded backend buffering; see
    the 10-minute soak finding in NOTES.md)."""
    from futuresdr_tpu import config
    from futuresdr_tpu.blocks import Fir, NullSink, NullSource
    from futuresdr_tpu.runtime.executor import Executor

    old = config.get("settle_every_steps", 32)
    config.set("settle_every_steps", 2)
    try:
        fg = Flowgraph()
        taps = np.random.default_rng(0).standard_normal(16).astype(np.float32)
        connect(fg, NullSource(np.complex64), Fir(taps), NullSink(np.complex64))
        ex = Executor(fg, chunk_size=4096, max_steps=120)
        ex.running = True
        ex.run_loop()
        assert ex.steps_run == 120
        # window capped at 16 markers + the one being appended
        assert len(ex._probes) <= 17
        snk = fg.blocks[-1]
        assert snk.n_received == 120 * 4096
    finally:
        config.set("settle_every_steps", old)


def test_multi_source_eos_delivers_partial_collection():
    """When one source EOSes, chunks already produced by OTHER sources
    in the same collection pass must still be dispatched and delivered
    (regression: they were silently dropped at flowgraph termination)."""
    xa = np.arange(96, dtype=np.float32)
    xb = np.arange(64, dtype=np.float32) * 10
    fg = Flowgraph()
    a, b = VectorSource(xa), VectorSource(xb)
    s1, s2 = VectorSink(np.float32), VectorSink(np.float32)
    for blk in (a, b, s1, s2):
        fg.add(blk)
    fg.stream(a, s1)
    fg.stream(b, s2)
    Runtime(chunk_size=32).run(fg)
    np.testing.assert_allclose(s2.data(), xb)
    got = s1.data()
    assert len(got) >= 64  # at least everything up to B's EOS point
    np.testing.assert_allclose(got, xa[: len(got)])


def test_custom_tag_synthesis_without_input_tags():
    """A CUSTOM-propagation block with NO input edges (device source)
    must still get its propagate_tags called each chunk so it can
    SYNTHESIZE tags (regression: `or not in_tags` skipped it)."""
    from futuresdr_tpu.runtime.block import Block, PortSpec
    from futuresdr_tpu.runtime.tags import TagPropagation

    class TaggingSource(Block):
        """Emits zeros and one synthesized tag at index 0 per chunk."""

        def __init__(self):
            super().__init__(None)
            self.stream_outputs = [PortSpec("out", np.float32)]
            self.rate_out = (1,)
            self.tag_propagation = TagPropagation.CUSTOM
            self.chunks_seen = 0

        def make_state(self, in_sizes, out_sizes):
            self._n = out_sizes[0]
            return ()

        def apply(self, state, inputs, params):
            import jax.numpy as jnp

            return state, [jnp.zeros((self._n,), jnp.float32)], {}

        def propagate_tags(self, tags_in, in_items, out_items):
            self.chunks_seen += 1
            return [[ItemTag(0, Tag.named_usize("chunk", self.chunks_seen))]]

    src = TaggingSource()
    head = Head(96, np.float32)
    snk = VectorSink(np.float32)
    fg = Flowgraph()
    connect(fg, src, head, snk)
    Runtime(chunk_size=32).run(fg)
    got = snk.tags()
    assert len(got) == 3  # one synthesized tag per 32-item chunk
    assert [t.index for t in got] == [0, 32, 64]
    assert [t.tag.value for t in got] == [1, 2, 3]


def test_direct_params_write_reaches_device():
    """A handler writing ``self._params[...]`` DIRECTLY (not via
    set_param) must still invalidate the executor's device params cache
    (regression for the _params_version retune contract: _params is an
    auto-versioning dict)."""
    from futuresdr_tpu import Flowgraph, Runtime
    from futuresdr_tpu.blocks import VectorSink, VectorSource
    from futuresdr_tpu.runtime.block import (
        Block,
        PortSpec,
        message_handler,
    )
    from futuresdr_tpu.types.pmt import Pmt

    class RawGain(Block):
        def __init__(self):
            super().__init__()
            self.stream_inputs = [PortSpec("in", np.float32)]
            self.stream_outputs = [PortSpec("out", np.float32)]
            self.rate_in = (1,)
            self.rate_out = (1,)
            self._params["g"] = np.float32(1.0)

        @message_handler("gain")
        def _g(self, pmt):
            # deliberately NOT set_param — the out-of-tree style write
            self._params["g"] = np.float32(float(pmt.to_py()))
            return Pmt.ok()

        def apply(self, state, inputs, params):
            return state, [inputs[0] * params["g"]], {}

    g = RawGain()
    v0 = g._params_version
    g._params["probe"] = np.float32(0.0)
    assert g._params_version > v0  # any mutation bumps
    del g._params["probe"]

    src = VectorSource(np.ones(64, np.float32))
    snk = VectorSink(np.float32)
    fg = Flowgraph()
    fg.stream(src, g)
    fg.stream(g, snk)
    rt = Runtime(chunk_size=16)
    h = rt.start(fg)
    h.call(g, "gain", 3.0)
    h.wait()
    out = snk.data()
    assert out.shape == (64,)
    # at least the tail chunks must see the retuned gain
    assert out[-1] == 3.0


def test_auto_steps_per_call_device_source():
    """Default config: the executor picks K itself for device-source
    pipelines (VERDICT r4 #4 — the measured scan-batch win must not
    require reading the latency chapter), and the batched output
    accounting matches K=1 exactly."""
    from futuresdr_tpu import config
    from futuresdr_tpu.blocks import (
        Fir,
        NullSink,
        QuadratureDemod,
        ResidentSource,
    )
    from futuresdr_tpu.runtime.executor import Executor

    x = (
        np.random.default_rng(0).standard_normal(65536) + 0j
    ).astype(np.complex64)

    def run(steps_per_call=None):
        if steps_per_call is not None:
            config.set("steps_per_call", steps_per_call)
        try:
            fg = Flowgraph()
            src = ResidentSource(x)
            f = Fir(np.hamming(33).astype(np.float32))
            d = QuadratureDemod(1.0)
            snk = NullSink(np.float32)
            fg.stream(src, f)
            fg.stream(f, d)
            fg.stream(d, snk)
            ex = Executor(fg, chunk_size=65536, max_steps=8)
            ex.running = True
            ex.run_loop()
            ex.running = False
            return ex.stats()["steps_per_call"], snk.n_received
        finally:
            config.set("steps_per_call", "auto")

    k_auto, n_auto = run()
    assert k_auto == 32  # clamp(ceil(4M/64k)=64, 4, 32)
    k_one, n_one = run(steps_per_call=1)  # explicit override respected
    assert k_one == 1
    assert n_auto == n_one == 8 * 65536


def test_auto_steps_per_call_stays_one_for_interactive_graphs():
    """Host-fed graphs, message edges, tickers and live sources keep
    K=1 under the auto default (batching would trade their control/feed
    granularity for throughput without being asked)."""
    from futuresdr_tpu.blocks import Apply, VectorSink, VectorSource
    from futuresdr_tpu.runtime.executor import Executor

    # host-fed
    fg = Flowgraph()
    src = VectorSource(np.ones(32768, np.float32))
    a = Apply(lambda v: v * 2, in_dtype=np.float32)
    snk = VectorSink(np.float32)
    fg.stream(src, a)
    fg.stream(a, snk)
    ex = Executor(fg, chunk_size=4096)
    ex.running = True
    ex.run_loop()
    ex.running = False
    assert ex.stats()["steps_per_call"] == 1
    assert np.array_equal(snk.data(), np.full(32768, 2.0, np.float32))


def test_auto_k_retune_cooldown_state_machine():
    """The auto-K control-latency cooldown (_note_control_traffic):
    arms ONLY on an actual params-version bump (read-only GUI polls must
    not cost the batching win), caps the budget while armed, decays
    over quiet iterations, and is a no-op for explicit steps_per_call."""
    from futuresdr_tpu.blocks import NullSink, NullSource
    from futuresdr_tpu.runtime.executor import Executor

    fg = Flowgraph()
    connect(fg, NullSource(np.complex64), NullSink(np.complex64))
    ex = Executor(fg, chunk_size=4096)
    ex._msg_cooldown = 0
    ex._ctrl_ver = 10

    # read-only message traffic (version unchanged): never arms
    ex._note_control_traffic(drained=3, ver_now=10, auto_k=True)
    assert ex._msg_cooldown == 0

    # a retune (version bump) arms the 16-iteration window
    ex._note_control_traffic(drained=1, ver_now=11, auto_k=True)
    assert ex._msg_cooldown == 16 and ex._ctrl_ver == 11

    # quiet iterations decay it back to full batching
    for _ in range(16):
        ex._note_control_traffic(drained=0, ver_now=11, auto_k=True)
    assert ex._msg_cooldown == 0

    # explicit steps_per_call (auto_k False): retunes never cap
    ex._note_control_traffic(drained=1, ver_now=12, auto_k=False)
    assert ex._msg_cooldown == 0

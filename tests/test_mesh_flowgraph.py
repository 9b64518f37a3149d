"""Mesh execution for composed flowgraphs (``runtime/mesh.py``).

The r4 verdict's top item: sharding must be part of the product — a user
composing blocks gets shard_map execution from ``Runtime(mesh=...)``, with
state reconstruction at shard boundaries auto-derived from the compiler's
latency calculus (the generalization of the hand-built packed-halo bank
steps in ``models/pfb_fm_bank.py``). Parity anchor: the reference hands
every composed graph its full concurrency machinery automatically
(``src/runtime/scheduler/smol.rs:108-137``); SURVEY §2.5 names
shard_map + ppermute as this framework's collective tier.

All tests run on the 8-device virtual CPU mesh from conftest.
"""

import os
import tempfile

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from futuresdr_tpu import Flowgraph, Runtime, config
from futuresdr_tpu.blocks import (
    Apply,
    Combine,
    Fir,
    Head,
    Iir,
    NullSink,
    PfbChannelizer,
    QuadratureDemod,
    ResidentSource,
    VectorSink,
    VectorSource,
)
from futuresdr_tpu.dsp import firdes, windows
from futuresdr_tpu.runtime.compiler import RateError
from futuresdr_tpu.runtime.executor import Executor


def mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("time",))


def _iq(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * scale
    ).astype(np.complex64)


def _simple_chain(x, taps):
    fg = Flowgraph()
    src = VectorSource(x.copy())
    f = Fir(taps)
    d = QuadratureDemod(2.0)
    snk = VectorSink(np.float32)
    fg.stream(src, f)
    fg.stream(f, d)
    fg.stream(d, snk)
    return fg, snk


def test_mesh_simple_chain_matches_single_device():
    """VectorSource → Fir → QuadratureDemod → VectorSink on the 8-shard
    mesh is BIT-EXACT vs the single-device Executor (stateful blocks:
    FIR history + demod continuity reconstructed at shard boundaries)."""
    x = _iq(1 << 15)
    taps = np.random.default_rng(2).standard_normal(31).astype(np.float32)
    fg1, s1 = _simple_chain(x, taps)
    Runtime(chunk_size=4096).run(fg1)
    ref = s1.data()
    fg2, s2 = _simple_chain(x, taps)
    Runtime(chunk_size=4096, mesh=mesh8()).run(fg2)
    got = s2.data()
    assert ref.shape == got.shape
    assert np.array_equal(ref, got)


def test_mesh_rate_changing_chain():
    """Decimating FIR (rate change + phase-anchored grid) across shard
    boundaries: mesh == single-device."""
    x = _iq(1 << 15, seed=5)
    taps = firdes.lowpass(0.1, windows.hamming(40))

    def build():
        fg = Flowgraph()
        src = VectorSource(x.copy())
        f = Fir.decimating(taps, 4)
        snk = VectorSink(np.complex64)
        fg.stream(src, f)
        fg.stream(f, snk)
        return fg, snk

    fg1, s1 = build()
    Runtime(chunk_size=4096).run(fg1)
    fg2, s2 = build()
    Runtime(chunk_size=4096, mesh=mesh8()).run(fg2)
    assert s1.data().shape == s2.data().shape
    np.testing.assert_allclose(s1.data(), s2.data(), atol=2e-6, rtol=0)


def _bank_graph(x, M, D, audio_taps, sink_cls):
    fg = Flowgraph()
    src = ResidentSource(x.copy())
    ch = PfbChannelizer(M)
    fg.stream(src, ch)
    sinks = []
    for k in range(M):
        d = QuadratureDemod(1.0)
        f = Fir.decimating(audio_taps, D, dtype=np.float32)
        snk = sink_cls(np.float32)
        fg.stream(ch, d, src_port=k)
        fg.stream(d, f)
        fg.stream(f, snk)
        sinks.append(snk)
    return fg, sinks


def test_mesh_composed_bank_through_fusion():
    """THE target graph: composed PfbChannelizer → M×QuadratureDemod →
    M×Fir.decimating, canonicalized by the fusion pass onto the fused
    PfbFmBank kernel, runs on the 8-device mesh numerically equal to the
    single-device Executor — multi-step, so the cross-chunk carry (the
    ppermute wrap edge) is exercised."""
    M, D = 16, 4
    n = M * D * 512
    x = _iq(n, seed=1, scale=0.1)
    audio_taps = firdes.lowpass(0.4 / D, windows.hamming(32))

    fg1, s1 = _bank_graph(x, M, D, audio_taps, VectorSink)
    Runtime(chunk_size=n).run(fg1, max_steps=4)
    assert any(b.type_name == "PfbFmBank" for b in fg1.blocks)  # fused
    fg2, s2 = _bank_graph(x, M, D, audio_taps, VectorSink)
    Runtime(chunk_size=n, mesh=mesh8()).run(fg2, max_steps=4)
    assert any(b.type_name == "PfbFmBank" for b in fg2.blocks)
    for k in range(M):
        a, b = s1[k].data(), s2[k].data()
        assert a.shape == b.shape and a.size > 3 * 512  # 4 chunks - trim
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=0)


def test_mesh_bank_null_sinks_device_reduce():
    """NullSink (device_reduce) under the mesh: the keep-alive scalar is
    psum-reduced instead of concatenated; item accounting matches."""
    M, D = 16, 4
    n = M * D * 256
    x = _iq(n, seed=3, scale=0.1)
    audio_taps = firdes.lowpass(0.4 / D, windows.hamming(32))
    fg1, _ = _bank_graph(x, M, D, audio_taps, NullSink)
    Runtime(chunk_size=n).run(fg1, max_steps=3)
    ref = sum(b.n_received for b in fg1.blocks if isinstance(b, NullSink))
    fg2, _ = _bank_graph(x, M, D, audio_taps, NullSink)
    Runtime(chunk_size=n, mesh=mesh8()).run(fg2, max_steps=3)
    got = sum(b.n_received for b in fg2.blocks if isinstance(b, NullSink))
    assert ref > 0 and got == ref


def test_mesh_scan_batching():
    """steps_per_call=4 (lax.scan over the sharded step) equals the
    unbatched mesh run and the single-device run."""
    x = _iq(1 << 15)
    taps = np.random.default_rng(2).standard_normal(31).astype(np.float32)
    fg1, s1 = _simple_chain(x, taps)
    Runtime(chunk_size=4096).run(fg1)
    ref = s1.data()
    config.set("steps_per_call", 4)
    try:
        fg2, s2 = _simple_chain(x, taps)
        Runtime(chunk_size=4096, mesh=mesh8()).run(fg2)
    finally:
        config.set("steps_per_call", "auto")
    got = s2.data()
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=2e-6, rtol=0)


def test_mesh_snapshot_resume_bit_exact():
    """Snapshot after 3 steps under the mesh, resume in a fresh executor
    on the same mesh: the combined output is bit-identical to an
    uninterrupted single-device run (the carried state IS the ppermute
    carry package — saved and restored like any other state pytree)."""
    x = _iq(1 << 15)
    taps = np.random.default_rng(2).standard_normal(31).astype(np.float32)
    fg1, s1 = _simple_chain(x, taps)
    Runtime(chunk_size=4096).run(fg1)
    ref = s1.data()

    fg3, _ = _simple_chain(x, taps)
    ex = Executor(fg3, chunk_size=4096, mesh=mesh8(), max_steps=3)
    ex.running = True
    ex.run_loop()
    ex.running = False
    path = tempfile.mktemp(suffix=".npz")
    ex.snapshot(path)
    try:
        fg4, s4 = _simple_chain(x, taps)
        ex2 = Executor(fg4, chunk_size=4096, mesh=mesh8(), restore=path)
        ex2.running = True
        ex2.run_loop()
        ex2.running = False
        resumed = s4.data()
        assert ref.shape == resumed.shape
        assert np.array_equal(ref, resumed)
    finally:
        os.unlink(path)


def test_mesh_eos_partial_chunk():
    """A capture that is not a chunk multiple: the padded EOS tail under
    the mesh delivers exactly the single-device output."""
    x = _iq(40000 - 1234, seed=7)
    taps = np.hamming(17).astype(np.float32)

    def run(mesh=None):
        fg = Flowgraph()
        s = VectorSource(x.copy())
        f = Fir(taps)
        k = VectorSink(np.complex64)
        fg.stream(s, f)
        fg.stream(f, k)
        Runtime(chunk_size=4096, mesh=mesh).run(fg)
        return k.data()

    r1, r2 = run(), run(mesh8())
    assert r1.shape == r2.shape
    assert np.array_equal(r1, r2)


def test_mesh_rejects_undeclared_stateful_block():
    """IIR state is not suffix-reconstructable — the mesh compiler must
    refuse with a clear error, not produce wrong numbers."""
    fg = Flowgraph()
    src = VectorSource(np.ones(8192, np.float32))
    ii = Iir([1.0], [1.0, -0.5])
    snk = VectorSink(np.float32)
    fg.stream(src, ii)
    fg.stream(ii, snk)
    with pytest.raises(RateError, match="state_suffix_in"):
        Runtime(chunk_size=4096, mesh=mesh8()).run(fg)


def test_mesh_rejects_feedback_regions():
    fg = Flowgraph()
    src = VectorSource(np.ones(8192, np.float32))
    add = Combine(lambda p, q: p + q, a_dtype=np.float32)
    g = Apply(lambda v: np.float32(0.5) * v, in_dtype=np.float32)
    snk = VectorSink(np.float32)
    fg.stream(src, add, dst_port=0)
    fg.stream(add, g)
    fg.stream(add, snk)
    fg.close_circuit(g, add, dst_port=1, delay=16)
    with pytest.raises(RateError, match="feedback regions"):
        Runtime(chunk_size=4096, mesh=mesh8()).run(fg)


# ---------------------------------------------------------------------------
# Position-affine states (advance_state): NCO-bearing blocks under a mesh
# ---------------------------------------------------------------------------


def test_mesh_fm_receiver_chain():
    """The FM-receiver-shaped chain — XlatingFir (NCO + decimating FIR) →
    QuadratureDemod → Fir.decimating — runs on the 8-shard mesh. The
    NCO accumulator is position-affine: the mesh advances a per-block
    base deterministically and positions each shard's suffix
    reconstruction from it."""
    from futuresdr_tpu.blocks import XlatingFir

    x = _iq(1 << 16, seed=11)
    taps = firdes.lowpass(0.08, windows.hamming(64))
    ataps = firdes.lowpass(0.1, windows.hamming(32))

    def build():
        fg = Flowgraph()
        src = VectorSource(x.copy())
        xl = XlatingFir(taps, 4, 100e3, 1e6)
        d = QuadratureDemod(1.0)
        f = Fir.decimating(ataps, 2, dtype=np.float32)
        snk = VectorSink(np.float32)
        fg.stream(src, xl)
        fg.stream(xl, d)
        fg.stream(d, f)
        fg.stream(f, snk)
        return fg, snk

    fg1, s1 = build()
    Runtime(chunk_size=8192).run(fg1)
    fg2, s2 = build()
    Runtime(chunk_size=8192, mesh=mesh8()).run(fg2)
    assert s1.data().shape == s2.data().shape
    np.testing.assert_allclose(s1.data(), s2.data(), atol=2e-5, rtol=0)


def test_mesh_signal_source_bit_exact():
    """A stateful device SOURCE (SignalSource's NCO) under the mesh:
    each shard computes its oscillator phase directly from the advanced
    base — bit-exact vs single-device across 8 chunks."""
    from futuresdr_tpu.blocks import FreqShift, Head, SignalSource

    def build():
        fg = Flowgraph()
        src = SignalSource(12345.0, 1e6, amplitude=0.7)
        fs = FreqShift(-7000.0, 1e6)
        h = Head(32768, np.complex64)
        snk = VectorSink(np.complex64)
        fg.stream(src, fs)
        fg.stream(fs, h)
        fg.stream(h, snk)
        return fg, snk

    fg1, s1 = build()
    Runtime(chunk_size=4096).run(fg1)
    fg2, s2 = build()
    Runtime(chunk_size=4096, mesh=mesh8()).run(fg2)
    assert s1.data().shape == s2.data().shape == (32768,)
    assert np.array_equal(s1.data(), s2.data())


def test_mesh_retune_phase_continuity():
    """A FreqShift retune between steps under the mesh matches the
    single-device executor exactly: the affine base advances with each
    step's CURRENT dphi, exactly like the carried accumulator."""
    from futuresdr_tpu.blocks import FreqShift

    x = _iq(1 << 14, seed=13)

    def run(mesh=None):
        fg = Flowgraph()
        src = VectorSource(x.copy())
        fs = FreqShift(5000.0, 1e6)
        snk = VectorSink(np.complex64)
        fg.stream(src, fs)
        fg.stream(fs, snk)
        ex = Executor(fg, chunk_size=4096, mesh=mesh, max_steps=2)
        ex.running = True
        ex.run_loop()  # 2 chunks at 5 kHz
        fs.set_param(
            "dphi",
            __import__(
                "futuresdr_tpu.ops.rotator", fromlist=["freq_to_fxp"]
            ).freq_to_fxp(9000.0 / 1e6),
        )
        ex.max_steps = 4
        ex.run_loop()  # remaining chunks at 9 kHz (phase-continuous)
        ex.running = False
        return snk.data()

    a, b = run(), run(mesh8())
    assert a.shape == b.shape
    assert np.array_equal(a, b)


def test_mesh_rejects_aux_producing_blocks():
    """Variable-rate aux (Filter masks etc.) drives host-side
    compaction; sharding it would silently mis-count — the mesh
    compiler must refuse."""
    from futuresdr_tpu.blocks import Filter

    fg = Flowgraph()
    src = VectorSource(np.arange(32768, dtype=np.float32))
    flt = Filter(lambda v: v > 0.5, np.float32)
    snk = VectorSink(np.float32)
    fg.stream(src, flt)
    fg.stream(flt, snk)
    with pytest.raises(RateError, match="aux outputs"):
        Runtime(chunk_size=4096, mesh=mesh8()).run(fg)


def test_mesh_channelizer_synthesizer_roundtrip():
    """PfbChannelizer → PfbSynthesizer (both multi-port, both with
    per-channel window state) under the mesh == single-device."""
    from futuresdr_tpu import config
    from futuresdr_tpu.blocks import PfbSynthesizer

    x = _iq(1 << 15, seed=21, scale=0.3)
    M = 8

    def build():
        fg = Flowgraph()
        src = VectorSource(x.copy())
        ch = PfbChannelizer(M)
        syn = PfbSynthesizer(M)
        snk = VectorSink(np.complex64)
        fg.stream(src, ch)
        for k in range(M):
            fg.stream(ch, syn, src_port=k, dst_port=k)
        fg.stream(syn, snk)
        return fg, snk

    config.set("fusion", False)  # keep the literal two-block chain
    try:
        fg1, s1 = build()
        Runtime(chunk_size=4096).run(fg1)
        fg2, s2 = build()
        Runtime(chunk_size=4096, mesh=mesh8()).run(fg2)
    finally:
        config.set("fusion", True)
    assert s1.data().shape == s2.data().shape
    np.testing.assert_allclose(
        s1.data(), s2.data(), atol=2e-6, rtol=0
    )


@pytest.mark.parametrize("seed", range(6))
def test_mesh_random_graph_fuzz(seed):
    """Property check: random DAGs of shardable blocks (random taps,
    rates, fan-out, NCO frequencies) produce the same output under the
    mesh as single-device. This is the adversarial evidence that the
    suffix/ppermute/affine machinery composes — not just the hand-picked
    chains above."""
    from futuresdr_tpu.blocks import Apply, Copy, FreqShift, MovingAvg

    rng = np.random.default_rng(100 + seed)
    x = _iq(1 << 14, seed=200 + seed)

    def random_chain(fg, up, depth):
        """Grow a random chain from block `up` (complex64 stream)."""
        for _ in range(depth):
            kind = rng.integers(0, 5)
            if kind == 0:
                t = rng.standard_normal(int(rng.integers(5, 48))).astype(
                    np.float32
                )
                b = Fir(t)
            elif kind == 1:
                t = firdes.lowpass(0.2, windows.hamming(24))
                b = Fir.decimating(t, int(rng.integers(2, 4)))
            elif kind == 2:
                b = FreqShift(float(rng.uniform(-2e5, 2e5)), 1e6)
            elif kind == 3:
                b = Copy(np.complex64)
            else:
                b = Apply(lambda v: v * np.complex64(0.5 + 0.5j))
            fg.stream(up, b)
            up = b
        return up

    def build():
        fg = Flowgraph()
        src = VectorSource(x.copy())
        top = random_chain(fg, src, int(rng.integers(1, 4)))
        # fan out into two independent tails, one real-valued
        t1 = random_chain(fg, top, int(rng.integers(1, 3)))
        s1 = VectorSink(np.complex64)
        fg.stream(t1, s1)
        d = QuadratureDemod(1.0)
        fg.stream(top, d)
        m = MovingAvg(int(rng.integers(2, 17)))
        fg.stream(d, m)
        s2 = VectorSink(np.float32)
        fg.stream(m, s2)
        return fg, (s1, s2)

    state = rng.bit_generator.state
    fg1, sinks1 = build()
    rng.bit_generator.state = state  # identical random graph
    fg2, sinks2 = build()
    Runtime(chunk_size=2048).run(fg1)
    try:
        Runtime(chunk_size=2048, mesh=mesh8()).run(fg2)
    except RateError as e:
        # deep decimation chains can make the reconstruction suffix
        # exceed the per-shard segment at this chunk size — that is the
        # designed, clearly-reported limit, not a wrong answer
        assert "state-reconstruction suffix" in str(e)
        return
    for a_s, b_s in zip(sinks1, sinks2):
        a, b = a_s.data(), b_s.data()
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=3e-5, rtol=0)


def test_mesh_spectrum_chain():
    """The spectrum-analyzer front (SignalSource → windowed shifted Fft)
    under the mesh: frame boundaries align with the SDF units, so each
    shard FFTs its own frames — bit-exact vs single-device."""
    from futuresdr_tpu.blocks import Fft, SignalSource

    def build():
        fg = Flowgraph()
        src = SignalSource(100e3, 1e6, amplitude=0.5)
        f = Fft(1024, shift=True, window=np.hanning(1024))
        h = Head(16 * 1024, np.complex64)
        snk = VectorSink(np.complex64)
        fg.stream(src, f)
        fg.stream(f, h)
        fg.stream(h, snk)
        return fg, snk

    fg1, s1 = build()
    Runtime(chunk_size=8192).run(fg1)
    fg2, s2 = build()
    Runtime(chunk_size=8192, mesh=mesh8()).run(fg2)
    a, b = s1.data(), s2.data()
    assert a.shape == b.shape == (16 * 1024,)
    assert np.array_equal(a, b)


def test_mesh_two_sources_combine():
    """Two host sources merging through Combine under the mesh (each
    source's chunk splits independently; the suffix run slices both):
    bit-exact vs single-device, including a rate change after the
    merge."""
    a = _iq(1 << 15, seed=31)
    b = _iq(1 << 15, seed=32)
    taps = firdes.lowpass(0.12, windows.hamming(24))

    def build():
        fg = Flowgraph()
        sa, sb = VectorSource(a.copy()), VectorSource(b.copy())
        add = Combine(lambda p, q: p + 0.5 * q)
        f = Fir.decimating(taps, 2)
        snk = VectorSink(np.complex64)
        fg.stream(sa, add, dst_port=0)
        fg.stream(sb, add, dst_port=1)
        fg.stream(add, f)
        fg.stream(f, snk)
        return fg, snk

    fg1, s1 = build()
    Runtime(chunk_size=4096).run(fg1)
    fg2, s2 = build()
    Runtime(chunk_size=4096, mesh=mesh8()).run(fg2)
    assert s1.data().shape == s2.data().shape
    np.testing.assert_allclose(s1.data(), s2.data(), atol=2e-6, rtol=0)


def test_mesh_deep_inflight_pipeline():
    """max_inflight=4 under the mesh (deep dispatch pipeline, donated
    sharded states) == single-device."""
    x = _iq(1 << 15, seed=41)
    taps = np.hamming(25).astype(np.float32)

    def run(mesh=None):
        fg = Flowgraph()
        s = VectorSource(x.copy())
        f = Fir(taps)
        k = VectorSink(np.complex64)
        fg.stream(s, f)
        fg.stream(f, k)
        Runtime(chunk_size=2048, max_inflight=4, mesh=mesh).run(fg)
        return k.data()

    a, b = run(), run(mesh8())
    assert a.shape == b.shape
    assert np.array_equal(a, b)


def test_mesh_retunable_fir_taps():
    """Retunable-Fir taps are broadcast params under the mesh: output
    equals single-device bit-for-bit, including a taps retune between
    runs (the traced-Toeplitz path shards like any other op)."""
    from futuresdr_tpu.types.pmt import Pmt

    x = _iq(1 << 14, seed=17)
    t_a = firdes.lowpass(0.2, windows.hamming(25))
    t_b = firdes.highpass(0.25, windows.hamming(25))

    def run(mesh=None):
        fg = Flowgraph()
        blk = Fir(t_a, retunable=True)
        snk = VectorSink(np.complex64)
        fg.stream(VectorSource(x.copy()), blk)
        fg.stream(blk, snk)
        ex = Executor(fg, chunk_size=4096, mesh=mesh, max_steps=2)
        ex.running = True
        ex.run_loop()
        blk.call_handler("taps", Pmt.from_py([float(v) for v in t_b]))
        ex.max_steps = 4
        ex.run_loop()
        ex.running = False
        return snk.data()

    a, b = run(), run(mesh8())
    assert a.shape == b.shape
    assert np.array_equal(a, b)


def test_mesh_skip_delay():
    """Negative (skip) Delay under the mesh matches single-device
    (its state is a plain input suffix; the 2|n| trim is sink-side)."""
    from futuresdr_tpu.blocks import Delay

    x = _iq(1 << 14, seed=21)

    def run(mesh=None):
        fg = Flowgraph()
        snk = VectorSink(np.complex64)
        fg.stream(VectorSource(x.copy()), Delay(-96))
        fg.stream(fg.blocks[1], snk)
        Runtime(chunk_size=4096, mesh=mesh).run(fg)
        return snk.data()

    a, b = run(), run(mesh8())
    assert np.array_equal(a, b)
    ref = x[96:]
    m = min(len(a), len(ref))
    np.testing.assert_array_equal(a[:m], ref[:m])
